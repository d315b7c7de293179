"""Vectorized RpJive64_256 on JAX/XLA — the device commitment hasher for
Jive proof configs (reference crypto/src/hash/rescue/rp64_256_jive/mod.rs).

Rescue-Prime over f64 with STATE 8: capacity = state[0..4), rate =
state[4..8). ``hash_elements`` is a sponge whose digest is the RATE after
the final permutation (mod.rs:183-206); ``merge`` is the Jive 2-to-1
compression mode — NOT sponge-consistent by design (mod.rs:94-111):
jive(x, y) = Σ_i (initial_i + final_i) over matching halves.

Reuses the Goldilocks field kernels and the Rescue S-box/inv-S-box chains
from ops.goldilocks (α = 7 and INV_ALPHA are shared with Rp64_256); the
8×8 circulant MDS runs as a column scan with small-constant multiplies
(entries ≤ 23 — mds_f64_8x8.rs keeps them in the frequency domain, but at
width 8 the scan body is already tiny).

Oracle: winterfell_tpu.crypto.hashers.RpJive64_256 (sage-KAT-pinned).
"""

from __future__ import annotations

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ..crypto.rescue_jive_rp62_constants import (
    JIVE_ARK1,
    JIVE_ARK2,
    JIVE_MDS,
)
from .goldilocks import (
    _rp_inv_sbox,
    _rp_sbox,
    _traced_const_cols,
    gl_add,
    gl_mul_small,
)

_STATE_WIDTH = 8
_RATE_START = 4
_RATE_WIDTH = 4

_MDS_NP = np.array(JIVE_MDS, dtype=np.uint64)
_ARK1_NP = np.array(JIVE_ARK1, dtype=np.uint64)
_ARK2_NP = np.array(JIVE_ARK2, dtype=np.uint64)


def _jive_mds(state):
    """state (m, 8) → MDS·state via a column scan with mul_small."""
    mds_t = jnp.asarray(_MDS_NP.T.copy())  # (8, 8): row k = MDS[:, k]
    cols = jnp.moveaxis(state, -1, 0)      # (8, m)

    def body(acc, xs):
        col, mds_col = xs
        return gl_add(acc, gl_mul_small(col[:, None], mds_col[None, :])), None

    acc, _ = jax.lax.scan(body, jnp.zeros_like(state), (cols, mds_t))
    return acc


@jax.jit
def jive_permutation_rows(state):
    """Vectorized Rescue-XLIX permutation, state (m, 8) u64, 7 rounds
    (rp64_256_jive/mod.rs:259-296)."""
    ark = jnp.stack([jnp.asarray(_ARK1_NP), jnp.asarray(_ARK2_NP)], axis=1)

    def round_fn(state, ark_r):
        state = _rp_sbox(state)
        state = _jive_mds(state)
        state = gl_add(state, ark_r[0][None, :])
        state = _rp_inv_sbox(state)
        state = _jive_mds(state)
        state = gl_add(state, ark_r[1][None, :])
        return state, None

    state, _ = jax.lax.scan(round_fn, state, ark)
    return state


@jax.jit
def jive_hash_rows(rows):
    """hash_elements of each row: rows (m, k) u64 → digests (m, 4) u64
    (mod.rs:183-206: capacity[0] = 1 iff k not a rate multiple, absorb in
    chunks of 4, trailing pad sets the next rate element to ONE)."""
    m, k = rows.shape
    rem = k % _RATE_WIDTH
    capacity = _traced_const_cols(rows, [1 if rem else 0, 0, 0, 0])
    full = k - rem
    if full:
        state = jnp.concatenate([capacity, rows[:, :_RATE_WIDTH]], axis=1)
    else:
        pad = _traced_const_cols(rows, [0] * (_RATE_WIDTH - rem))
        first = jnp.concatenate([rows[:, :rem], pad], axis=1)
        first = first.at[:, rem].set(first[:, rem] + jnp.uint64(1))
        state = jnp.concatenate([capacity, first], axis=1)
        return jive_permutation_rows(state)[:, _RATE_START:]
    state = jive_permutation_rows(state)
    i = _RATE_WIDTH
    while i < full:
        chunk = rows[:, i : i + _RATE_WIDTH]
        state = state.at[:, _RATE_START:].set(
            gl_add(state[:, _RATE_START:], chunk))
        state = jive_permutation_rows(state)
        i += _RATE_WIDTH
    if rem:
        tail = gl_add(state[:, _RATE_START : _RATE_START + rem],
                      rows[:, full:])
        one = _traced_const_cols(rows, [1])
        parts = [state[:, :_RATE_START], tail, one]
        if rem + 1 < _RATE_WIDTH:
            parts.append(state[:, _RATE_START + rem + 1 :])
        state = jive_permutation_rows(jnp.concatenate(parts, axis=1))
    return state[:, _RATE_START:]


@jax.jit
def jive_merge_rows(left, right):
    """Jive 2-to-1 compression of digest pairs: (m, 4),(m, 4) → (m, 4)
    (mod.rs:94-111 + jive sum)."""
    initial = jnp.concatenate([left, right], axis=1)  # (m, 8)
    final = jive_permutation_rows(initial)
    return gl_add(gl_add(initial[:, :4], initial[:, 4:]),
                  gl_add(final[:, :4], final[:, 4:]))


# ================================================================================
# Merkle layer reduction (mirrors ops.goldilocks._merkle_levels_impl)
# ================================================================================


@jax.jit
def _merge_level(level):
    return jive_merge_rows(level[0::2], level[1::2])


_MERKLE_TAIL = 1 << 10


@jax.jit
def _merkle_tail_impl(leaves):
    levels = []
    current = jive_merge_rows(leaves[0::2], leaves[1::2])
    levels.append(current)
    while current.shape[0] > 1:
        current = jive_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def merkle_levels_jive(leaves):
    """Merkle internal levels from leaf digests (m, 4) u64: per-level shared
    merge programs down to _MERKLE_TAIL, then one shared tail."""
    levels = []
    current = leaves
    while current.shape[0] > _MERKLE_TAIL:
        current = _merge_level(current)
        levels.append(current)
    if current.shape[0] > 1:
        levels.extend(_merkle_tail_impl(current))
    return tuple(levels)
