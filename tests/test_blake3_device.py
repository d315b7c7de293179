"""Oracle tests for the device BLAKE3 row hasher against the pure-Python
host implementation (itself pinned to official vectors)."""

import random

import numpy as np

from winterfell_tpu.crypto.blake3_host import blake3
from winterfell_tpu.math.fields import F64, F128, Field
from winterfell_tpu.ops import blake3_device as b3
from winterfell_tpu.ops import f128 as fd

rng = random.Random(0xB3)


def test_hash_words_single_block():
    """64-byte rows (one block): 4 f128 / 8 f64 elements."""
    m = 7
    words_np = np.array(
        [[rng.randrange(1 << 32) for _ in range(16)] for _ in range(m)],
        dtype=np.uint32)
    got = b3.digests_to_bytes(b3.blake3_hash_words(words_np, 64))
    for i in range(m):
        want = blake3(words_np[i].astype("<u4").tobytes())
        assert got[i] == want


def test_hash_words_multi_block_and_partial():
    """352-byte rows (lamport width 22 x f128): 6 blocks, partial last."""
    m = 5
    byte_len = 352
    need = byte_len // 4
    words_np = np.array(
        [[rng.randrange(1 << 32) for _ in range(need)] for _ in range(m)],
        dtype=np.uint32)
    got = b3.digests_to_bytes(b3.blake3_hash_words(words_np, byte_len))
    for i in range(m):
        want = blake3(words_np[i].astype("<u4").tobytes())
        assert got[i] == want
    # non-word-aligned length is never produced by element rows, but a
    # partial final block (not multiple of 64) is: 40 bytes = 10 words
    words10 = words_np[:, :10]
    got = b3.digests_to_bytes(b3.blake3_hash_words(words10, 40))
    for i in range(m):
        assert got[i] == blake3(words10[i].astype("<u4").tobytes())


def test_merge_rows_256_and_192():
    m = 6
    for w in (8, 6):
        left = np.array(
            [[rng.randrange(1 << 32) for _ in range(w)] for _ in range(m)],
            dtype=np.uint32)
        right = np.array(
            [[rng.randrange(1 << 32) for _ in range(w)] for _ in range(m)],
            dtype=np.uint32)
        got = b3.digests_to_bytes(b3.blake3_merge_rows(left, right))
        for i in range(m):
            want = blake3(left[i].astype("<u4").tobytes()
                          + right[i].astype("<u4").tobytes())[: 4 * w]
            assert got[i] == want


def test_rows_from_u64_matches_element_bytes():
    field = Field(F64, 1)
    m, k = 4, 3
    rows = np.array(
        [[rng.randrange(F64.p) for _ in range(k)] for _ in range(m)],
        dtype=np.uint64)
    words, byte_len = b3.rows_from_u64(rows)
    assert byte_len == 8 * k
    got = b3.digests_to_bytes(b3.blake3_hash_words(np.asarray(words), byte_len))
    for i in range(m):
        elems = [(int(v),) for v in rows[i]]
        want = blake3(field.elements_to_le_bytes(elems))
        assert got[i] == want


def test_rows_from_limbs_matches_element_bytes():
    field = Field(F128, 1)
    m, k = 4, 4
    rows_obj = np.empty((m, k), dtype=object)
    for i in range(m):
        for j in range(k):
            rows_obj[i, j] = rng.randrange(F128.p)
    limbs = fd.to_device(rows_obj)  # (m, k, 4)
    words, byte_len = b3.rows_from_limbs(limbs)
    assert byte_len == 16 * k
    got = b3.digests_to_bytes(b3.blake3_hash_words(np.asarray(words), byte_len))
    for i in range(m):
        elems = [(int(v),) for v in rows_obj[i]]
        want = blake3(field.elements_to_le_bytes(elems))
        assert got[i] == want


def test_merkle_levels():
    m = 16
    leaves = np.array(
        [[rng.randrange(1 << 32) for _ in range(8)] for _ in range(m)],
        dtype=np.uint32)
    levels = b3.merkle_levels_blake3(np.asarray(leaves))
    sizes = sorted(lvl.shape[0] for lvl in levels)
    assert sizes == [1, 2, 4, 8]
    by_size = {lvl.shape[0]: b3.digests_to_bytes(lvl) for lvl in levels}
    leaf_bytes = b3.digests_to_bytes(leaves)
    level8 = [blake3(leaf_bytes[2 * i] + leaf_bytes[2 * i + 1])
              for i in range(8)]
    assert by_size[8] == level8
    level4 = [blake3(level8[2 * i] + level8[2 * i + 1]) for i in range(4)]
    assert by_size[4] == level4
    root = blake3(blake3(level4[0] + level4[1]) + blake3(level4[2] + level4[3]))
    assert by_size[1] == [root]
