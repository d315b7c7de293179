"""FRI low-degree testing: prover, folding, verifier.

Mirrors the reference fri crate semantics (fri/src/): commit phase transposes
evaluations into N-column rows, hashes each row into a leaf, Merkle-commits,
draws α and applies the degree-respecting projection (prover/mod.rs:179-239);
the remainder polynomial is committed as hash_elements of its reversed
coefficients; query phase folds positions by `pos % folded_size` preserving
first-occurrence order (folding/mod.rs:159-176).
"""

from .folding import apply_drp, fold_positions, transpose_evaluations
from .options import FriOptions
from .prover import FriProver
from .verifier import (
    DefaultVerifierChannel,
    FriVerifier,
    FriVerifierError,
    map_positions_to_indexes,
)

__all__ = [
    "DefaultVerifierChannel",
    "FriOptions",
    "FriProver",
    "FriVerifier",
    "FriVerifierError",
    "apply_drp",
    "fold_positions",
    "map_positions_to_indexes",
    "transpose_evaluations",
]
