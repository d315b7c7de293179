"""Test-only randomness helpers (utils/rand/src/lib.rs:29-116).

Deterministic, seedable generation of field elements for tests and example
setup. The reference's `prng_vector` rejection-samples 32-byte chunks from a
seeded PRNG; we mirror the shape of the API with a ChaCha-free stand-in
(seeded SHA3 stream), which is deterministic and canonical-safe."""

from __future__ import annotations

import hashlib
import random
from typing import List

from ..math.fields import Field


def rand_value(field: Field, rng: random.Random | None = None) -> tuple:
    rng = rng or random.Random()
    return field.rand(rng)


def rand_vector(field: Field, n: int, rng: random.Random | None = None) -> List[tuple]:
    rng = rng or random.Random()
    return [field.rand(rng) for _ in range(n)]


def prng_vector(field: Field, seed: bytes, n: int) -> List[tuple]:
    """Seeded, rejection-sampled element stream (lib.rs:84-98 semantics)."""
    out: List[tuple] = []
    counter = 0
    while len(out) < n:
        if counter > 1000 * n:
            raise RuntimeError("failed to generate enough random field elements")
        chunk = hashlib.sha3_256(seed + counter.to_bytes(8, "little")).digest()
        counter += 1
        elem = field.try_from_random_bytes(chunk[: field.element_bytes])
        if elem is not None:
            out.append(elem)
    return out
