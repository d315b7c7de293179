"""winterfell_tpu — a TPU-native STARK proving framework.

A from-scratch reimplementation of the capabilities of facebook/winterfell
(the reference Rust STARK prover/verifier), designed TPU-first: the compute
path is JAX/XLA over exact integer field arithmetic (uint64 Goldilocks
kernels, radix-2 NTT, vectorized Rescue-Prime, device Merkle reduction), the
transcript and proof wire format are byte-exact mirrors of the reference, and
multi-chip scaling uses ``jax.sharding`` meshes rather than threads.

Facade mirroring winterfell/src/lib.rs re-exports: prove via a Prover
subclass, verify via :func:`verify`.
"""

from .air import (
    Air,
    AirContext,
    Assertion,
    BatchingMethod,
    EvaluationFrame,
    FieldExtension,
    PartitionOptions,
    ProofOptions,
    TraceInfo,
    TransitionConstraintDegree,
)
from .air.proof import Proof
from .air.security import ConjecturedSecurity, ProvenSecurity
from .crypto.hashers import HASHERS, Blake3_192, Blake3_256, Rp64_256, Sha3_256
from .crypto.merkle import BatchMerkleProof, MerkleTree
from .crypto.random_coin import DefaultRandomCoin
from .math.fields import F62, F64, F128, Field
from .prover import Prover, ProverError, Trace, TraceTable
from .verifier import AcceptableOptions, VerifierError, verify

__version__ = "0.1.0"

__all__ = [
    "AcceptableOptions",
    "Air",
    "AirContext",
    "Assertion",
    "BatchMerkleProof",
    "BatchingMethod",
    "Blake3_192",
    "Blake3_256",
    "ConjecturedSecurity",
    "DefaultRandomCoin",
    "EvaluationFrame",
    "F62",
    "F64",
    "F128",
    "Field",
    "FieldExtension",
    "HASHERS",
    "MerkleTree",
    "PartitionOptions",
    "Proof",
    "ProofOptions",
    "ProvenSecurity",
    "Prover",
    "ProverError",
    "Rp64_256",
    "Sha3_256",
    "Trace",
    "TraceInfo",
    "TraceTable",
    "TransitionConstraintDegree",
    "VerifierError",
    "verify",
]
