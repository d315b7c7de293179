"""Vector-commitment abstraction.

Mirrors the reference's ``VectorCommitment`` trait
(crypto/src/commitment.rs:28-77): a scheme commits to a vector of digests
and supports single openings, batch (multi) openings, and stateless
verification against the commitment string. ``MerkleTree`` is the one
production implementation, exactly as in the reference (the only
``impl VectorCommitment`` lives in crypto/src/merkle/mod.rs) — but the
prover/verifier talk to this interface, so alternative schemes (e.g. a
salted tree for zero-knowledge) can slot in without touching the pipeline.

Python adaptation notes: associated types collapse to duck-typed values —
``Proof`` is the sibling-digest list of ``open``, ``MultiProof`` is
``BatchMerkleProof`` (both already Serializable via utils.serde); errors
raise instead of returning ``Result``.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Sequence, Tuple


class VectorCommitment(ABC):
    """Commitment to a vector (v_0, ..., v_{n-1}) of leaf digests."""

    @property
    @abstractmethod
    def root(self) -> bytes:
        """The commitment string (crypto/src/commitment.rs:49)."""

    @property
    @abstractmethod
    def domain_len(self) -> int:
        """Length of the committed vector (commitment.rs:52)."""

    @abstractmethod
    def prove(self, index: int) -> Tuple[bytes, List[bytes]]:
        """Opens the value at ``index``: (value, opening proof)
        (commitment.rs:60-63)."""

    @abstractmethod
    def prove_batch(self, indexes: Sequence[int]):
        """Opens the values at ``indexes``: (values, multiproof)
        (commitment.rs:65-68)."""

    # verification is stateless in the reference (commitment.rs:70-77);
    # implementations expose classmethod/staticmethod verifiers:
    #   verify(root, index, value, proof, hasher) -> None or raise
    #   verify_batch(root, indexes, values, multiproof, hasher) -> None or raise
