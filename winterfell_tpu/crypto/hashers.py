"""Host-side hash functions with the reference Hasher/ElementHasher semantics.

Mirrors crypto/src/hash/{blake,sha,rescue}/*.rs:

- digests are raw ``bytes`` (ByteDigest) — 32 for *_256, 24 for Blake3_192;
- ``merge`` hashes the 2 concatenated digests; ``merge_with_int`` hashes
  digest ‖ u64 LE (crypto/src/hash/blake/mod.rs:41-46);
- ``hash_elements`` hashes the canonical little-endian bytes of the elements
  (for every reference field the canonical serialization is what ends up
  hashed, whether via IS_CANONICAL raw bytes (f128) or via Serializable
  (f64/f62) — crypto/src/hash/blake/mod.rs:52-66);
- Rescue-Prime Rp64_256 is a 12-element f64 sponge, rate 8 / capacity 4,
  digest = state[4..8], 7 rounds (crypto/src/hash/rescue/rp64_256/mod.rs:23-55)
  with capacity[0] initialized to the absorbed element count.

These run the Fiat–Shamir transcript; bulk row hashing uses the vectorized
device kernels in winterfell_tpu.ops (this module is their oracle).
"""

from __future__ import annotations

import hashlib

from ..math.fields import F64, Field
from .blake3_host import blake3
from .rescue_constants import RP64_256_ARK1, RP64_256_ARK2, RP64_256_MDS

# ================================================================================
# Byte-digest hashers (Blake3, SHA3)
# ================================================================================


class _ByteHasher:
    digest_size: int = 32
    collision_resistance: int = 128
    name: str = ""

    @staticmethod
    def _raw(data: bytes) -> bytes:
        raise NotImplementedError

    @classmethod
    def hash(cls, data: bytes) -> bytes:
        return cls._raw(data)[: cls.digest_size]

    @classmethod
    def merge(cls, d0: bytes, d1: bytes) -> bytes:
        return cls._raw(d0 + d1)[: cls.digest_size]

    @classmethod
    def merge_many(cls, digests) -> bytes:
        return cls._raw(b"".join(digests))[: cls.digest_size]

    @classmethod
    def merge_with_int(cls, seed: bytes, value: int) -> bytes:
        return cls._raw(seed + (value & (1 << 64) - 1).to_bytes(8, "little"))[
            : cls.digest_size
        ]

    @classmethod
    def hash_elements(cls, elements, field: Field) -> bytes:
        return cls._raw(field.elements_to_le_bytes(elements))[: cls.digest_size]


class Blake3_256(_ByteHasher):
    digest_size = 32
    collision_resistance = 128
    name = "blake3_256"
    _raw = staticmethod(blake3)


class Blake3_192(_ByteHasher):
    digest_size = 24
    collision_resistance = 96
    name = "blake3_192"
    _raw = staticmethod(blake3)


class Sha3_256(_ByteHasher):
    digest_size = 32
    collision_resistance = 128
    name = "sha3_256"

    @staticmethod
    def _raw(data: bytes) -> bytes:
        return hashlib.sha3_256(data).digest()


# ================================================================================
# Rescue-Prime Rp64_256 (host scalar version)
# ================================================================================

_P = F64.p
_STATE_WIDTH = 12
_RATE_START = 4
_RATE_WIDTH = 8
_DIGEST_RANGE = slice(4, 8)
_NUM_ROUNDS = 7

ALPHA = 7
INV_ALPHA = 10540996611094048183  # rp64_256/mod.rs:55


def _rp64_sbox(state):
    return [pow(x, ALPHA, _P) for x in state]


def _rp64_inv_sbox(state):
    return [pow(x, INV_ALPHA, _P) for x in state]


def _rp64_mds(state):
    return [
        sum(RP64_256_MDS[i][k] * state[k] for k in range(_STATE_WIDTH)) % _P
        for i in range(_STATE_WIDTH)
    ]


def rp64_permutation(state):
    """Rescue-XLIX permutation (rp64_256/mod.rs:299-319). `state`: 12 ints."""
    state = list(state)
    for r in range(_NUM_ROUNDS):
        state = _rp64_sbox(state)
        state = _rp64_mds(state)
        state = [(s + k) % _P for s, k in zip(state, RP64_256_ARK1[r])]
        state = _rp64_inv_sbox(state)
        state = _rp64_mds(state)
        state = [(s + k) % _P for s, k in zip(state, RP64_256_ARK2[r])]
    return state


def _digest_to_elements(d: bytes):
    return [int.from_bytes(d[8 * i : 8 * i + 8], "little") for i in range(4)]


def _elements_to_digest(elems) -> bytes:
    return b"".join(e.to_bytes(8, "little") for e in elems)


class Rp64_256:
    digest_size = 32
    collision_resistance = 128
    name = "rp64_256"

    @classmethod
    def hash(cls, data: bytes) -> bytes:
        """Byte-string hashing: 7-byte chunks, 1-byte terminator on the last
        (partial) chunk, element count in capacity[0] (rp64_256/mod.rs:123-178)."""
        num_elements = (len(data) + 6) // 7 if len(data) % 7 else len(data) // 7
        state = [0] * _STATE_WIDTH
        state[0] = num_elements % _P
        i = 0
        chunks = [data[j : j + 7] for j in range(0, len(data), 7)]
        for chunk in chunks:
            # NB: the reference compares the RATE index `i` (which resets every
            # 8 absorptions), not the chunk index, against num_elements-1
            # (rp64_256/mod.rs:142-156); replicated for bit-compatibility.
            if i < num_elements - 1:
                buf = chunk + b"\x00"  # non-last branch assumes a full 7-byte chunk
            else:
                buf = chunk + b"\x01" + b"\x00" * (7 - len(chunk))
            v = int.from_bytes(buf, "little")
            state[_RATE_START + i] = (state[_RATE_START + i] + v) % _P
            i += 1
            if i % _RATE_WIDTH == 0:
                state = rp64_permutation(state)
                i = 0
        if i > 0:
            state = rp64_permutation(state)
        return _elements_to_digest(state[_DIGEST_RANGE])

    @classmethod
    def merge(cls, d0: bytes, d1: bytes) -> bytes:
        state = [0] * _STATE_WIDTH
        state[0] = _RATE_WIDTH
        elems = _digest_to_elements(d0) + _digest_to_elements(d1)
        state[_RATE_START : _RATE_START + 8] = elems
        state = rp64_permutation(state)
        return _elements_to_digest(state[_DIGEST_RANGE])

    @classmethod
    def merge_many(cls, digests) -> bytes:
        elems = [e for d in digests for e in _digest_to_elements(d)]
        return cls._hash_base_elements(elems)

    @classmethod
    def merge_with_int(cls, seed: bytes, value: int) -> bytes:
        state = [0] * _STATE_WIDTH
        state[4:8] = _digest_to_elements(seed)
        state[8] = value % _P
        if value < _P:
            state[0] = 5
        else:
            state[9] = value // _P
            state[0] = 6
        state = rp64_permutation(state)
        return _elements_to_digest(state[_DIGEST_RANGE])

    @classmethod
    def hash_elements(cls, elements, field: Field) -> bytes:
        assert field.base is F64, "Rp64_256 hashes f64-based elements only"
        base_elems = [b for e in elements for b in e]
        return cls._hash_base_elements(base_elems)

    @classmethod
    def _hash_base_elements(cls, base_elems) -> bytes:
        state = [0] * _STATE_WIDTH
        state[0] = len(base_elems) % _P
        i = 0
        for e in base_elems:
            state[_RATE_START + i] = (state[_RATE_START + i] + e) % _P
            i += 1
            if i % _RATE_WIDTH == 0:
                state = rp64_permutation(state)
                i = 0
        if i > 0:
            state = rp64_permutation(state)
        return _elements_to_digest(state[_DIGEST_RANGE])


HASHERS = {
    "blake3_256": Blake3_256,
    "blake3_192": Blake3_192,
    "sha3_256": Sha3_256,
    "rp64_256": Rp64_256,
}
