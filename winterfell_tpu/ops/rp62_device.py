"""Rp62_248 (Rescue-Prime over f62, 248-bit packed digests) on JAX/XLA —
the device commitment hasher for f62 configs.

Mirrors the reference's rp62_248 (crypto/src/hash/rescue/rp62_248/mod.rs):
state width 12 over f62, rate = state[0..8), capacity = state[8..12) with the
element count in state[11], 7 rounds, α = 3, digest = state[0..4) packed as
4×62 bits into 31 bytes (digest.rs:36-50).

Everything is vectorized over rows on the f62 limb engine (ops/f62.py —
2×u32 limbs in u64 lanes): the S-box is two multiplies, the inverse S-box a
square-and-multiply chain over INV_ALPHA rolled into fori_loops, and the MDS
a lax.scan over the 12 state columns. Digests travel as (m, 8) uint32 word
rows whose little-endian bytes are exactly the packed digest layout (byte 31
is always zero; the host trims to digest_size = 31).

Exact integer arithmetic throughout — outputs are bit-identical to the host
oracle in crypto/hashers.py (pinned in tests/test_rp62_device.py)."""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..crypto.rescue_jive_rp62_constants import RP62_ARK1, RP62_ARK2, RP62_MDS
from . import f62

P = f62.P
_STATE = 12
_RATE = 8  # state[0..8); capacity [8..12), count at state[11]
INV_ALPHA = 3074416663688030891

_MASK32 = jnp.uint64(0xFFFFFFFF)
_MASK62 = jnp.uint64((1 << 62) - 1)


def _to_limbs(table) -> np.ndarray:
    arr = np.array(table, dtype=object)
    return f62.to_limbs_np(arr)


_MDS_COLS_NP = _to_limbs(RP62_MDS).transpose(1, 0, 2).copy()  # (12, 12, 2): [k] = MDS[:, k]
_ARK_NP = np.stack([_to_limbs(RP62_ARK1), _to_limbs(RP62_ARK2)], axis=1)  # (7, 2, 12, 2)


def _sbox(state):
    x2 = f62.base_mul(state, state)
    return f62.base_mul(x2, state)


# 2-bit windows of INV_ALPHA, most-significant first (62 bits → 31 windows).
# A windowed fori_loop keeps the traced graph at ~5 multiplies instead of the
# ~93 a fully unrolled square-and-multiply would inline per permutation call
# (which made every program embedding the permutation minutes-slow to
# compile); the runtime multiply count is identical.
_INV_WINDOWS = np.array(
    [(INV_ALPHA >> (2 * i)) & 3
     for i in range((INV_ALPHA.bit_length() + 1) // 2)][::-1],
    dtype=np.int32)


def _inv_sbox(state):
    """x^INV_ALPHA (the α = 3 inverse exponent, rp62_248/mod.rs
    apply_inv_sbox) — 2-bit-window square-and-multiply in a fori_loop."""
    x2 = f62.base_mul(state, state)
    x3 = f62.base_mul(x2, state)
    one = jnp.stack([jnp.ones_like(state[..., 0]),
                     jnp.zeros_like(state[..., 0])], axis=-1)
    table = jnp.stack([one, state, x2, x3])  # (4, ..., 2)
    wins = jnp.asarray(_INV_WINDOWS)
    acc = table[wins[0]]

    def body(i, acc):
        acc = f62.base_mul(acc, acc)
        acc = f62.base_mul(acc, acc)
        return f62.base_mul(acc, table[wins[i]])

    return jax.lax.fori_loop(1, len(_INV_WINDOWS), body, acc)


def _mds(state):
    """state (m, 12, 2) → MDS·state via a scan over the 12 columns."""
    mds_cols = jnp.asarray(_MDS_COLS_NP)
    cols = jnp.moveaxis(state, 1, 0)  # (12, m, 2)

    def body(acc, xs):
        col, mds_col = xs  # (m, 2), (12, 2)
        term = f62.base_mul(col[:, None, :], mds_col[None, :, :])
        return f62.base_add(acc, term), None

    acc0 = jnp.zeros_like(state)
    acc, _ = jax.lax.scan(body, acc0, (cols, mds_cols))
    return acc


@jax.jit
def rp62_permutation_rows(state):
    """Vectorized Rescue-XLIX permutation: state (m, 12, 2) limb rows,
    scanned over the 7 rounds."""
    ark = jnp.asarray(_ARK_NP)

    def round_fn(st, ark_r):
        st = _sbox(st)
        st = _mds(st)
        st = f62.base_add(st, jnp.broadcast_to(ark_r[0][None], st.shape))
        st = _inv_sbox(st)
        st = _mds(st)
        st = f62.base_add(st, jnp.broadcast_to(ark_r[1][None], st.shape))
        return st, None

    state, _ = jax.lax.scan(round_fn, state, ark)
    return state


# ================================================================================
# Digest pack / unpack (rp62_248/digest.rs:36-50): 4×62 bits → 31 bytes
# ================================================================================


def _pack_digest(elems):
    """(m, 4, 2) limb digest elements → (m, 8) uint32 packed words (the LE
    byte layout of the 248-bit digest; the final byte is always zero)."""
    v = elems[..., 0] | (elems[..., 1] << jnp.uint64(32))  # (m, 4) u64 lanes
    w = [
        v[:, 0] | (v[:, 1] << jnp.uint64(62)),
        (v[:, 1] >> jnp.uint64(2)) | (v[:, 2] << jnp.uint64(60)),
        (v[:, 2] >> jnp.uint64(4)) | (v[:, 3] << jnp.uint64(58)),
        v[:, 3] >> jnp.uint64(6),
    ]
    words = []
    for wj in w:
        words.append((wj & _MASK32).astype(jnp.uint32))
        words.append((wj >> jnp.uint64(32)).astype(jnp.uint32))
    return jnp.stack(words, axis=1)


def _unpack_digest(words):
    """(m, 8) uint32 packed words → (m, 4, 2) limb digest elements."""
    wl = words.astype(jnp.uint64)
    w = [wl[:, 2 * j] | (wl[:, 2 * j + 1] << jnp.uint64(32)) for j in range(4)]
    v = [
        w[0] & _MASK62,
        ((w[0] >> jnp.uint64(62)) | (w[1] << jnp.uint64(2))) & _MASK62,
        ((w[1] >> jnp.uint64(60)) | (w[2] << jnp.uint64(4))) & _MASK62,
        ((w[2] >> jnp.uint64(58)) | (w[3] << jnp.uint64(6))) & _MASK62,
    ]
    vs = jnp.stack(v, axis=1)  # (m, 4) u64 lanes
    return jnp.stack([vs & _MASK32, vs >> jnp.uint64(32)], axis=-1)


# ================================================================================
# Sponge over element rows (hash_elements semantics — rp62_248/mod.rs)
# ================================================================================


def _traced_limb_cols(like_rows, values):
    """(m, len(values), 2) limb constants derived from a traced input (scatter
    into literal zeros would be constant-folded into embedded arrays)."""
    m = like_rows.shape[0]
    one_t = jnp.uint64(1) + jnp.uint64(0) * like_rows.reshape(-1)[0]
    consts = f62.to_limbs_np(np.array(values, dtype=object))  # (len, 2)
    return jnp.broadcast_to(one_t[None, None, None] * jnp.asarray(consts)[None],
                            (m, len(values), 2))


def _sponge_elem_rows(rows):
    """rows (m, k, 2) f62 element rows → (m, 4, 2) digest elements.
    capacity count state[11] = k mod p; absorb into state[0..8) in chunks of
    8, permuting after each (incl. the final partial chunk)."""
    m, k = rows.shape[0], rows.shape[1]
    first = rows[:, :_RATE]
    pad = _RATE - first.shape[1]
    if pad:
        first = jnp.concatenate(
            [first, _traced_limb_cols(rows, [0] * pad)], axis=1)
    state = jnp.concatenate(
        [first, _traced_limb_cols(rows, [0, 0, 0, k % P])], axis=1)
    state = rp62_permutation_rows(state)
    i = _RATE
    while i < k:
        chunk = rows[:, i : i + _RATE]
        width = chunk.shape[1]
        state = state.at[:, :width].set(
            f62.base_add(state[:, :width], chunk))
        state = rp62_permutation_rows(state)
        i += _RATE
    return state[:, :4]


@partial(jax.jit, static_argnums=(1, 2))
def rp62_hash_words(words, byte_len: int, digest_words: int = 8):
    """Word-interface row hasher (the _DEVICE_HASHERS shape): words (m, 2k)
    uint32 — consecutive limb pairs of k f62 elements — → (m, 8) uint32
    packed digests. byte_len is implied by the width (8 bytes/element)."""
    m, W = words.shape
    assert W % 2 == 0 and byte_len == 4 * W
    rows = words.astype(jnp.uint64).reshape(m, W // 2, 2)
    return _pack_digest(_sponge_elem_rows(rows))


def rp62_combine(digests, digest_words: int, hash_fn):
    """Partitioned-commitment combine (merge_many semantics): unpack every
    chunk digest into its 4 field elements, concatenate, sponge-hash —
    matching the host Rp62_248.merge_many byte-for-byte."""
    elems = jnp.concatenate([_unpack_digest(d) for d in digests], axis=1)
    return _pack_digest(_sponge_elem_rows(elems))


@jax.jit
def rp62_merge_rows(left, right):
    """merge of packed digest pairs: (m, 8),(m, 8) uint32 → (m, 8)
    (rp62_248/mod.rs merge: capacity count = RATE)."""
    l_e = _unpack_digest(left)
    r_e = _unpack_digest(right)
    state = jnp.concatenate(
        [l_e, r_e, _traced_limb_cols(l_e, [0, 0, 0, _RATE])], axis=1)
    state = rp62_permutation_rows(state)
    return _pack_digest(state[:, :4])


# ================================================================================
# Merkle layer reduction (mirrors ops.blake3_device.merkle_levels_blake3)
# ================================================================================


@jax.jit
def _merge_level(level):
    return rp62_merge_rows(level[0::2], level[1::2])


# Rescue merges hold several live state copies per row in fusion temps;
# reduce huge levels in fixed-size slabs through one shared program
_MERGE_SLAB = 1 << 21

_MERKLE_TAIL = 1 << 10


def _merge_level_slabbed(level):
    m = level.shape[0]
    if m <= _MERGE_SLAB:
        return _merge_level(level)
    parts = [_merge_level(level[i : i + _MERGE_SLAB])
             for i in range(0, m, _MERGE_SLAB)]
    return jnp.concatenate(parts, axis=0)


@jax.jit
def _merkle_tail_impl(leaves):
    levels = []
    current = rp62_merge_rows(leaves[0::2], leaves[1::2])
    levels.append(current)
    while current.shape[0] > 1:
        current = rp62_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def merkle_levels_rp62(leaves):
    """Merkle internal levels from packed leaf digests (m, 8) uint32."""
    levels = []
    current = leaves
    while current.shape[0] > _MERKLE_TAIL:
        current = _merge_level_slabbed(current)
        levels.append(current)
    if current.shape[0] > 1:
        levels.extend(_merkle_tail_impl(current))
    return tuple(levels)
