"""Vectorized BLAKE3 row hashing on JAX/XLA — the device commitment hasher
for Blake3 proof configs (reference crypto/src/hash/blake/mod.rs wraps the
blake3 crate; this is the TPU-native equivalent).

BLAKE3 is 32-bit-native (u32 adds/xors/rotates), which maps directly onto the
TPU VPU with no emulation: hashing m rows runs the compression function as
(m,)-wide vector ops. Each row here is at most one 1024-byte chunk (up to 64
f128 / 128 f64 elements — covers every in-repo AIR width); the chaining-value
chain over the row's 64-byte blocks is unrolled statically per row width.

Inputs arrive as uint32 WORD arrays. Field-element rows serialize to little-
endian element bytes (crypto/src/hash/blake/mod.rs:52-66 hashes raw canonical
bytes), and both device element layouts are already little-endian 32-bit
words: f64 u64 lanes split lo/hi, f128 limb arrays are the words verbatim —
so conversion is a bitcast + reshape, never a byte shuffle.

Oracle: the pure-Python BLAKE3 in winterfell_tpu.crypto.blake3_host (itself
pinned to the official test vectors in tests/test_hashers_kat.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

_IV = (0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
       0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)

_MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

_CHUNK_START = 1
_CHUNK_END = 2
_ROOT = 8

_BLOCK_WORDS = 16
_BLOCK_LEN = 64


def _rotr(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


@lru_cache(maxsize=None)
def _perm_table() -> np.ndarray:
    """(7, 16) message word index per round: row r is the BLAKE3 permutation
    applied r times."""
    table = np.empty((7, 16), dtype=np.int32)
    idx = np.arange(16)
    for r in range(7):
        table[r] = idx
        idx = idx[np.asarray(_MSG_PERMUTATION)]
    return table


def _compress_rows(cv, m_words, counter: int, block_len: int, flags: int):
    """One BLAKE3 compression vectorized over rows.

    cv: (8, m) uint32 state rows; m_words: (16, m) uint32 message rows.
    Returns the next chaining value as an (8, m) array.

    The 7 rounds run as a fori_loop over a per-round message-index table:
    a fully unrolled 7-round graph triggers pathologically superlinear
    XLA:CPU codegen (minutes for a ~600-op DAG), and the loop keeps compiled
    programs small on every backend — the same discipline as the Rescue
    round scan in ops.goldilocks."""
    m = cv.shape[1]
    zero = jnp.zeros((m,), dtype=jnp.uint32)
    tail = jnp.stack([
        zero + jnp.uint32(_IV[0]), zero + jnp.uint32(_IV[1]),
        zero + jnp.uint32(_IV[2]), zero + jnp.uint32(_IV[3]),
        zero + jnp.uint32(counter & 0xFFFFFFFF),
        zero + jnp.uint32((counter >> 32) & 0xFFFFFFFF),
        zero + jnp.uint32(block_len), zero + jnp.uint32(flags),
    ])
    s = jnp.concatenate([cv, tail], axis=0)  # (16, m)
    table = jnp.asarray(_perm_table())

    def round_body(r, s):
        w = m_words[table[r]]  # (16, m)

        def g(s, a, b, c, d, mx, my):
            sa = s[a] + s[b] + w[mx]
            sd = _rotr(s[d] ^ sa, 16)
            sc = s[c] + sd
            sb = _rotr(s[b] ^ sc, 12)
            sa = sa + sb + w[my]
            sd = _rotr(sd ^ sa, 8)
            sc = sc + sd
            sb = _rotr(sb ^ sc, 7)
            return s.at[a].set(sa).at[b].set(sb).at[c].set(sc).at[d].set(sd)

        s = g(s, 0, 4, 8, 12, 0, 1)
        s = g(s, 1, 5, 9, 13, 2, 3)
        s = g(s, 2, 6, 10, 14, 4, 5)
        s = g(s, 3, 7, 11, 15, 6, 7)
        s = g(s, 0, 5, 10, 15, 8, 9)
        s = g(s, 1, 6, 11, 12, 10, 11)
        s = g(s, 2, 7, 8, 13, 12, 13)
        s = g(s, 3, 4, 9, 14, 14, 15)
        return s

    s = jax.lax.fori_loop(0, 7, round_body, s)
    return s[:8] ^ s[8:16]


def _hash_words_t(words_t, byte_len: int):
    """words_t: (W, m) uint32 (word-major rows, zero-padded past byte_len);
    returns the (8, m) digest of the byte_len-byte rows as one BLAKE3 chunk.
    The chaining chain over the row's 64-byte blocks is unrolled statically
    (block flags and lengths are static per row width)."""
    n_blocks = max(1, -(-byte_len // _BLOCK_LEN))
    assert byte_len <= 1024, "rows larger than one chunk need the tree mode"
    W, m = words_t.shape
    need_pad = n_blocks * _BLOCK_WORDS - W
    if need_pad > 0:
        words_t = jnp.concatenate(
            [words_t, jnp.zeros((need_pad, m), dtype=jnp.uint32)], axis=0)
    iv = np.array(_IV, dtype=np.uint32)[:, None]
    cv = jnp.broadcast_to(jnp.asarray(iv), (8, m))
    for i in range(n_blocks):
        block = words_t[i * _BLOCK_WORDS : (i + 1) * _BLOCK_WORDS]
        flags = 0
        if i == 0:
            flags |= _CHUNK_START
        if i == n_blocks - 1:
            flags |= _CHUNK_END | _ROOT
            blen = byte_len - i * _BLOCK_LEN
        else:
            blen = _BLOCK_LEN
        cv = _compress_rows(cv, block, 0, blen, flags)
    return cv


@partial(jax.jit, static_argnums=(1, 2))
def blake3_hash_words(words, byte_len: int, digest_words: int = 8):
    """words: (m, W) uint32 — each row's little-endian message words, padded
    with zeros past byte_len. Returns (m, digest_words) uint32 digests
    (digest_words = 6 for the truncated Blake3_192 variant)."""
    m, W = words.shape
    need = -(-byte_len // 4)
    assert W >= need
    return _hash_words_t(words.T[:need], byte_len).T[:, :digest_words]


@jax.jit
def blake3_merge_rows(left, right):
    """merge(d0, d1) = blake3(d0 ‖ d1): (m, w),(m, w) uint32 -> (m, w) for
    digest width w in {6, 8} words (a single-block message —
    crypto/src/hash/blake/mod.rs:33-46; the 192-bit variant truncates)."""
    w = left.shape[1]
    msg = jnp.concatenate([left.T, right.T], axis=0)  # (2w, m)
    return _hash_words_t(msg, 8 * w).T[:, :w]


# ================================================================================
# Merkle layer reduction (mirrors ops.goldilocks._merkle_levels_impl)
# ================================================================================


@jax.jit
def _merge_level(level):
    return blake3_merge_rows(level[0::2], level[1::2])


_MERKLE_TAIL = 1 << 10


@jax.jit
def _merkle_tail_impl(leaves):
    levels = []
    current = blake3_merge_rows(leaves[0::2], leaves[1::2])
    levels.append(current)
    while current.shape[0] > 1:
        current = blake3_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def merkle_levels_blake3(leaves):
    """Merkle internal levels from leaf digests (m, 8) uint32: per-level
    shared merge programs down to _MERKLE_TAIL, then one shared tail."""
    levels = []
    current = leaves
    while current.shape[0] > _MERKLE_TAIL:
        current = _merge_level(current)
        levels.append(current)
    if current.shape[0] > 1:
        levels.extend(_merkle_tail_impl(current))
    return tuple(levels)


# ================================================================================
# Element-row -> word-layout adapters
# ================================================================================


def rows_from_u64(rows_u64):
    """(m, k) uint64 f64 element rows -> ((m, 2k) uint32 words, byte_len).
    LE element bytes == [lo32, hi32] word pairs."""
    m, k = rows_u64.shape
    lo = (rows_u64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (rows_u64 >> jnp.uint64(32)).astype(jnp.uint32)
    words = jnp.stack([lo, hi], axis=-1).reshape(m, 2 * k)
    return words, 8 * k


def rows_from_limbs(rows_limbs):
    """(m, k, 4) uint64 f128 limb rows -> ((m, 4k) uint32 words, byte_len).
    Limbs are already the LE 32-bit words of each element."""
    m = rows_limbs.shape[0]
    k = int(np.prod(rows_limbs.shape[1:-1]))
    words = rows_limbs.astype(jnp.uint32).reshape(m, 4 * k)
    return words, 16 * k


def digests_to_bytes(digest_rows) -> list:
    """(m, w) uint32 -> list of 4w-byte digests (LE u32 concatenation)."""
    arr = np.ascontiguousarray(np.asarray(digest_rows).astype("<u4"))
    row_bytes = 4 * arr.shape[1]
    flat = arr.tobytes()
    return [flat[i * row_bytes : (i + 1) * row_bytes]
            for i in range(arr.shape[0])]
