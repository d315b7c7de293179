"""Device SHA3-256 (vectorized Keccak-f[1600]) vs the hashlib oracle."""

import hashlib

import numpy as np
import pytest

from winterfell_tpu.ops import sha3_device as s3


def _hash_rows_oracle(rows_bytes):
    return [hashlib.sha3_256(b).digest() for b in rows_bytes]


def _to_words(rows_bytes, byte_len):
    W = -(-byte_len // 4)
    arr = np.zeros((len(rows_bytes), W), dtype=np.uint32)
    for i, b in enumerate(rows_bytes):
        padded = b + bytes(4 * W - len(b))
        arr[i] = np.frombuffer(padded, dtype="<u4")
    return arr


@pytest.mark.parametrize("byte_len", [32, 64, 128, 136, 200, 352])
def test_sha3_rows_match_hashlib(byte_len):
    """Row lengths covering one to three rate blocks, including the exact
    rate boundary (136 bytes — the pad block must be a fresh block)."""
    rng = np.random.default_rng(byte_len)
    rows = [rng.bytes(byte_len) for _ in range(9)] + [bytes(byte_len)]
    words = _to_words(rows, byte_len)
    got = np.asarray(s3.sha3_hash_words(words, byte_len, 8))
    expected = _hash_rows_oracle(rows)
    for i, e in enumerate(expected):
        assert got[i].astype("<u4").tobytes() == e, i


def test_sha3_merge_matches_hashlib():
    rng = np.random.default_rng(1)
    left = [rng.bytes(32) for _ in range(6)]
    right = [rng.bytes(32) for _ in range(6)]
    got = np.asarray(s3.sha3_merge_rows(
        _to_words(left, 32), _to_words(right, 32)))
    for i in range(6):
        e = hashlib.sha3_256(left[i] + right[i]).digest()
        assert got[i].astype("<u4").tobytes() == e


def test_sha3_merkle_levels():
    rng = np.random.default_rng(2)
    leaves = [rng.bytes(32) for _ in range(8)]
    levels = s3.merkle_levels_sha3(s3.jnp.asarray(_to_words(leaves, 32)))
    # recompute the root on host
    cur = leaves
    while len(cur) > 1:
        cur = [hashlib.sha3_256(cur[i] + cur[i + 1]).digest()
               for i in range(0, len(cur), 2)]
    root = np.asarray(levels[-1])[0].astype("<u4").tobytes()
    assert root == cur[0]
