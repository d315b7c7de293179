"""Goldilocks (f64) field arithmetic, NTT, Rescue-Prime and Merkle kernels on
JAX/XLA — the TPU compute engine.

Design (TPU-first, per the Pallas guide's hardware model):

- Elements are ``uint64`` arrays. The TPU has no native 64-bit integer units;
  XLA lowers u64 arithmetic to 32-bit limb pairs on the VPU. All ops are exact
  integer arithmetic, so results are bit-identical to the host oracle in
  ``winterfell_tpu.math`` regardless of vectorization or sharding.
- Multiplication computes the 128-bit product via 32-bit half-words and
  reduces with the Goldilocks identities 2^64 ≡ 2^32 − 1 and 2^96 ≡ −1
  (mod p). This replaces the reference's Montgomery representation
  (math/src/field/f64/mod.rs:714-731) — Montgomery is an implementation
  detail that never reaches proof bytes, and the direct reduction needs no
  form conversions around the transcript.
- The NTT is an iterative radix-2 DIT over the leading axis: one bit-reversal
  gather, then log2(n) reshape-butterfly stages — static shapes, no
  data-dependent control flow, everything fuses on the VPU.
- Rescue-Prime Rp64_256 (crypto/src/hash/rescue/rp64_256/mod.rs) is
  vectorized over rows: row hashing and the Merkle layer reduction run as
  wide elementwise u64 ops.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import List, Tuple

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ..crypto.rescue_constants import RP64_256_ARK1, RP64_256_ARK2, RP64_256_MDS
from ..math.fields import F64, GOLDILOCKS_P

P = GOLDILOCKS_P
_P64 = jnp.uint64(P)
_MASK32 = jnp.uint64(0xFFFFFFFF)
_EPS = jnp.uint64(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p


# ================================================================================
# Base field ops (uint64 arrays, canonical representation)
# ================================================================================


def gl_add(a, b):
    """(a + b) mod p, branchless (overflow adds 2^32−1, then canonicalize)."""
    s = a + b
    s = s + jnp.where(s < a, _EPS, jnp.uint64(0))
    return jnp.where(s >= _P64, s - _P64, s)


def gl_sub(a, b):
    d = a - b
    return jnp.where(a < b, d - _EPS, d)


def gl_neg(a):
    return jnp.where(a == 0, jnp.uint64(0), _P64 - a)


def _mul_128(a, b):
    """Full 128-bit product of u64 values as (hi, lo) u64 pair."""
    a_lo = a & _MASK32
    a_hi = a >> jnp.uint64(32)
    b_lo = b & _MASK32
    b_hi = b >> jnp.uint64(32)

    t0 = a_lo * b_lo
    t1 = a_lo * b_hi
    t2 = a_hi * b_lo
    t3 = a_hi * b_hi

    # lo 64 bits = t0 + (t1 + t2) << 32  (with carries into hi)
    mid = (t0 >> jnp.uint64(32)) + (t1 & _MASK32) + (t2 & _MASK32)
    lo = (t0 & _MASK32) | (mid << jnp.uint64(32))
    hi = t3 + (t1 >> jnp.uint64(32)) + (t2 >> jnp.uint64(32)) + (mid >> jnp.uint64(32))
    return hi, lo


def _reduce_128(hi, lo):
    """Reduce hi·2^64 + lo mod p via 2^64 ≡ 2^32 − 1, 2^96 ≡ −1."""
    hi_hi = hi >> jnp.uint64(32)
    hi_lo = hi & _MASK32

    t0 = lo - hi_hi
    t0 = jnp.where(lo < hi_hi, t0 - _EPS, t0)
    t1 = hi_lo * _EPS
    t2 = t0 + t1
    t2 = t2 + jnp.where(t2 < t0, _EPS, jnp.uint64(0))
    return jnp.where(t2 >= _P64, t2 - _P64, t2)


def gl_mul(a, b):
    hi, lo = _mul_128(a, b)
    return _reduce_128(hi, lo)


def gl_pow_const(a, e: int):
    """a ** e for a python-int exponent (unrolled square-and-multiply)."""
    result = None
    acc = a
    while e > 0:
        if e & 1:
            result = acc if result is None else gl_mul(result, acc)
        e >>= 1
        if e:
            acc = gl_mul(acc, acc)
    return result if result is not None else jnp.ones_like(a)


# ================================================================================
# Extension field ops: arrays with trailing axis d in {1, 2, 3}
# (reduction polys: quad x² = x − 2, cubic x³ = x + 1 — f64/mod.rs:398-499)
# ================================================================================


def ext_add(a, b):
    return gl_add(a, b)


def ext_sub(a, b):
    return gl_sub(a, b)


def ext_mul(a, b):
    d = a.shape[-1]
    if d == 1:
        return gl_mul(a, b)
    if d == 2:
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        t2 = gl_mul(a1, b1)
        # x² − x + 2 = 0 → x² = x − 2: c0 = a0b0 − 2·t2, c1 = a0b1 + a1b0 + t2
        c0 = gl_sub(gl_mul(a0, b0), gl_add(t2, t2))
        c1 = gl_add(gl_add(gl_mul(a0, b1), gl_mul(a1, b0)), t2)
        return jnp.stack([c0, c1], axis=-1)
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    t0 = gl_mul(a0, b0)
    t1 = gl_add(gl_mul(a0, b1), gl_mul(a1, b0))
    t2 = gl_add(gl_add(gl_mul(a0, b2), gl_mul(a1, b1)), gl_mul(a2, b0))
    t3 = gl_add(gl_mul(a1, b2), gl_mul(a2, b1))
    t4 = gl_mul(a2, b2)
    # x³ − x − 1 = 0 → x³ = x + 1; fold x⁴ = x² + x then x³
    t2p = gl_add(t2, t4)
    t1p = gl_add(t1, gl_add(t3, t4))
    t0p = gl_add(t0, t3)
    return jnp.stack([t0p, t1p, t2p], axis=-1)


def ext_mul_base(a, s):
    """Extension array × base scalars (broadcast over trailing axis)."""
    return gl_mul(a, s[..., None] if s.ndim == a.ndim - 1 else s)


# ================================================================================
# NTT (radix-2 DIT, natural order in/out, leading axis)
# ================================================================================


@lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    perm = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for i in range(logn):
        rev = (rev << 1) | ((perm >> i) & 1)
    return rev


# NTTs at or below this size use the classic unrolled form with per-stage
# constant twiddle vectors (small graphs, no gathers); larger sizes decompose
# via the six-step split so sub-transforms stay below this bound.
_SMALL_NTT = 1 << 13


@lru_cache(maxsize=None)
def _six_step_row_ratios(n: int, a: int, inverse: bool):
    """Host power-series literals (w^m)^{j1} for the doubling construction of
    the (b, a) middle twiddle matrix (m = 1, 2, 4, ...)."""
    b = n // a
    root = F64.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    out = []
    m = 1
    while m < b:
        out.append(_powers_np(pow(root, m, P), a))
        m *= 2
    return tuple(out)


def _ntt_core(x, n: int, inverse: bool):
    """x: (n, ...) u64 → NTT/iNTT without the 1/n scale, natural order in/out.

    Small sizes: unrolled radix-2 DIT with constant per-stage twiddles.
    Large sizes: six-step split n = a·b (the distributed-NTT structure —
    math/src/fft/concurrent.rs:132-171 is the reference's shared-memory
    analogue): view as (b, a), b-point NTTs down the columns, multiply by the
    (b, a) middle twiddle matrix w^(j1·k2), transpose, a-point NTTs, flatten.
    The middle twiddles are rebuilt on device from tiny host literals by
    row-doubling tied to the traced input (so XLA cannot constant-fold the
    chain at compile time); the rebuild costs ~n extra muls ≈ one stage."""
    if n == 1:
        return x
    if n <= _SMALL_NTT:
        return _ntt_small(x, n, inverse)

    rest = x.shape[1:]
    logn = n.bit_length() - 1
    a = 1 << (logn // 2)
    b = n // a

    m = x.reshape((b, a) + rest)
    y = _ntt_core(m, b, inverse)  # (b, a, ...)

    # middle twiddle matrix tied to a traced one (defeats constant folding)
    one_t = jnp.uint64(1) + jnp.uint64(0) * x.reshape(-1)[0]
    tw = jnp.ones((1, a), dtype=jnp.uint64) * one_t
    rows = 1
    for ratio_np in _six_step_row_ratios(n, a, inverse):
        ratio = jnp.asarray(ratio_np)[None, :]
        tw = jnp.concatenate([tw, gl_mul(tw, ratio)], axis=0)
        rows *= 2
    y = gl_mul(y, tw.reshape((b, a) + (1,) * len(rest)))

    z = jnp.swapaxes(y, 0, 1)  # (a, b, ...)
    out = _ntt_core(z, a, inverse)
    return out.reshape((n,) + rest)


@lru_cache(maxsize=None)
def _stage_twiddles_small(n: int, inverse: bool):
    root = F64.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    stages = []
    m = 2
    while m <= n:
        stages.append(_powers_np(pow(root, n // m, P), m // 2))
        m *= 2
    return tuple(stages)


def _ntt_small(x, n: int, inverse: bool):
    """Classic unrolled radix-2 DIT, constant twiddles, natural in/out."""
    rest = x.shape[1:]
    x = x[jnp.asarray(_bitrev_perm(n))]
    for tw_np in _stage_twiddles_small(n, inverse):
        half = tw_np.shape[0]
        mm = 2 * half
        tw = jnp.asarray(tw_np).reshape((1, half) + (1,) * len(rest))
        blk = x.reshape((n // mm, 2, half) + rest)
        u = blk[:, 0]
        v = gl_mul(blk[:, 1], tw)
        x = jnp.concatenate([gl_add(u, v), gl_sub(u, v)], axis=1)
        x = x.reshape((n,) + rest)
    return x


@lru_cache(maxsize=None)
def _powers_np(s: int, n: int, scale: int = 1) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    acc = scale % P
    for i in range(n):
        out[i] = acc
        acc = acc * s % P
    return out


@partial(jax.jit, static_argnums=(1,))
def ntt_evaluate(coeffs, n: int):
    return _ntt_core(coeffs, n, inverse=False)


@partial(jax.jit, static_argnums=(1,))
def ntt_interpolate(evals, n: int):
    coeffs = _ntt_core(evals, n, inverse=True)
    inv_n = pow(n, P - 2, P)
    return gl_mul(coeffs, jnp.uint64(inv_n))


def _scale_by_power_series(coeffs, n: int, s: int, scale: int = 1):
    # host-precomputed literal (lru-cached): pure data in the graph — no
    # in-graph compute chain for XLA's constant folder to evaluate
    powers = jnp.asarray(_powers_np(s, n, scale))
    rest_dims = coeffs.ndim - 1
    return gl_mul(coeffs, powers.reshape((n,) + (1,) * rest_dims))


@partial(jax.jit, static_argnums=(1, 2, 3))
def ntt_evaluate_with_offset(coeffs, n: int, offset: int, blowup: int):
    """Coset LDE, natural order over the n·blowup domain (matches
    winterfell_tpu.math.ntt.evaluate_poly_with_offset).

    Implemented as ONE (n·blowup)-point NTT over offset-scaled, zero-padded
    coefficients — identical values to per-subcoset NTTs, but a single
    uniform program instead of `blowup` inlined transforms (compile time)."""
    big_n = n * blowup
    scaled = _scale_by_power_series(coeffs, n, offset)
    padded = jnp.concatenate(
        [scaled, jnp.zeros((big_n - n,) + coeffs.shape[1:], dtype=jnp.uint64)],
        axis=0)
    return _ntt_core(padded, big_n, inverse=False)


@partial(jax.jit, static_argnums=(1, 2))
def ntt_interpolate_with_offset(evals, n: int, offset: int):
    coeffs = ntt_interpolate(evals, n)
    inv_offset = pow(offset % P, P - 2, P)
    return _scale_by_power_series(coeffs, n, inv_offset)


# ================================================================================
# Inversion and power series
# ================================================================================

_P_MINUS_2_BITS = np.array([((P - 2) >> i) & 1 for i in range(63, -1, -1)],
                           dtype=np.uint64)


def gl_inv(a):
    """a^(p−2) via in-graph square-and-multiply; inv(0) = 0 by Fermat."""
    bits = jnp.asarray(_P_MINUS_2_BITS)

    def body(i, acc):
        acc = gl_mul(acc, acc)
        return jnp.where(bits[i] == 1, gl_mul(acc, a), acc)

    return jax.lax.fori_loop(0, 64, body, jnp.ones_like(a))


def ext_inv(a):
    """Inverse of extension elements (..., d) via the norm trick
    (math/src/field/extensions/*.rs semantics)."""
    d = a.shape[-1]
    if d == 1:
        return gl_inv(a)
    if d == 2:
        # conj(a0 + a1·x) for x² = x − 2 is (a0 + a1) − a1·x  (frobenius)
        a0, a1 = a[..., 0], a[..., 1]
        conj = jnp.stack([gl_add(a0, a1), gl_neg(a1)], axis=-1)
        norm = ext_mul(a, conj)[..., 0]  # lands in the base field
        ninv = gl_inv(norm)
        return ext_mul_base(conj, ninv)
    # cubic: a^(p²+p) = conj1 * conj2, norm = a * that
    conj1 = ext_frobenius(a)
    conj2 = ext_frobenius(conj1)
    cc = ext_mul(conj1, conj2)
    norm = ext_mul(a, cc)[..., 0]
    ninv = gl_inv(norm)
    return ext_mul_base(cc, ninv)


@lru_cache(maxsize=None)
def _frobenius_consts(d: int) -> np.ndarray:
    """Matrix F with frob(a)_j = Σ_i a_i · F[i, j] (images of basis powers)."""
    from ..math.fields import Field

    field = Field(F64, d)
    images = field._frobenius_images()
    out = np.zeros((d, d), dtype=np.uint64)
    for i in range(d):
        for j in range(d):
            out[i, j] = images[i][j]
    return out


def ext_frobenius(a):
    d = a.shape[-1]
    fr = jnp.asarray(_frobenius_consts(d))  # (d, d)
    acc = None
    for i in range(d):
        term = gl_mul(a[..., i : i + 1], fr[i][None, :])
        acc = term if acc is None else gl_add(acc, term)
    return acc


# ================================================================================
# FRI folding (fri/src/folding/mod.rs apply_drp, device version)
# ================================================================================


@partial(jax.jit, static_argnums=(1, 2))
def fri_fold(evaluations, n_fold: int, domain_offset: int, alpha):
    """evaluations (n, d), alpha (d,) → folded (n/N, d). Same math as the
    host apply_drp: per-row N-point iNTT over the row's coset, inverse-offset
    scaling, Horner at α."""
    n, d = evaluations.shape
    rows = n // n_fold
    transposed = evaluations.reshape(n_fold, rows, d)  # [j, i] = evals[i + j*rows]

    coeffs = _ntt_core(transposed, n_fold, inverse=True)
    inv_nf = pow(n_fold, P - 2, P)
    coeffs = gl_mul(coeffs, jnp.uint64(inv_nf))  # (N, rows, d)

    # per-row inverse-offset powers (N, rows), host-precomputed data literal
    inv_off_pows = jnp.asarray(
        _fri_inv_offset_powers(n, n_fold, domain_offset % P))

    result = jnp.zeros((rows, d), dtype=jnp.uint64)
    alpha_b = alpha[None, :]
    scaled = [gl_mul(coeffs[k], inv_off_pows[k][:, None]) for k in range(n_fold)]
    for k in range(n_fold - 1, -1, -1):
        result = ext_add(ext_mul(result, jnp.broadcast_to(alpha_b, result.shape)),
                         scaled[k])
    return result


@lru_cache(maxsize=None)
def _fri_inv_offset_powers(n: int, n_fold: int, domain_offset: int) -> np.ndarray:
    """(N, rows) matrix of ((offset·g^i)^-1)^k for the fri_fold coefficient
    scaling (folding/mod.rs:103-110)."""
    rows = n // n_fold
    g = F64.get_root_of_unity(n.bit_length() - 1)
    inv_offsets = _powers_np(pow(g, P - 2, P), rows, pow(domain_offset, P - 2, P))
    out = np.empty((n_fold, rows), dtype=np.uint64)
    out[0] = 1
    acc = np.ones(rows, dtype=object)
    invs = inv_offsets.astype(object)
    for k in range(1, n_fold):
        acc = acc * invs % P
        out[k] = acc.astype(np.uint64)
    return out


# ================================================================================
# Rescue-Prime Rp64_256, vectorized over rows
# (crypto/src/hash/rescue/rp64_256/mod.rs: state 12, rate 8, digest [4..8),
#  7 rounds, α = 7)
# ================================================================================

_STATE_WIDTH = 12
_RATE_START = 4
_RATE_WIDTH = 8
_NUM_ROUNDS = 7
INV_ALPHA = 10540996611094048183

_MDS_NP = np.array(RP64_256_MDS, dtype=np.uint64)
_ARK1_NP = np.array(RP64_256_ARK1, dtype=np.uint64)
_ARK2_NP = np.array(RP64_256_ARK2, dtype=np.uint64)


def _rp_sbox(state):
    x2 = gl_mul(state, state)
    x4 = gl_mul(x2, x2)
    x6 = gl_mul(x4, x2)
    return gl_mul(x6, state)


def _exp_acc(base, tail, m: int):
    """base^(2^m) · tail — the exp_acc building block of the reference's
    72-multiplication inverse S-box chain (crypto/src/hash/rescue/mod.rs:21)."""
    r = base
    for _ in range(m):
        r = gl_mul(r, r)
    return gl_mul(r, tail)


def _rp_inv_sbox(state):
    """x^INV_ALPHA via the reference's 72-mul addition chain
    (rp64_256/mod.rs apply_inv_sbox): INV_ALPHA =
    0b1001001001001001001001001001000110110110110110110110110110110111."""
    t1 = gl_mul(state, state)            # x^10
    t2 = gl_mul(t1, t1)                  # x^100
    t3 = _exp_acc(t2, t2, 3)             # x^100100
    t4 = _exp_acc(t3, t3, 6)             # x^(100100 repeated)
    t5 = _exp_acc(t4, t4, 12)
    t6 = _exp_acc(t5, t3, 6)
    t7 = _exp_acc(t6, t6, 31)
    a = gl_mul(gl_mul(t7, t7), t6)
    a = gl_mul(a, a)
    a = gl_mul(a, a)
    b = gl_mul(gl_mul(t1, t2), state)
    return gl_mul(a, b)


def _rp_mds(state):
    """state: (m, 12) → MDS·state. 12×12 dot with small constants."""
    mds = jnp.asarray(_MDS_NP)  # (12, 12)
    acc = None
    for k in range(_STATE_WIDTH):
        term = gl_mul(state[:, k : k + 1], mds[:, k][None, :])
        acc = term if acc is None else gl_add(acc, term)
    return acc


@jax.jit
def rp64_permutation_rows(state):
    """Vectorized Rescue-XLIX permutation: state (m, 12) u64, scanned over
    the 7 rounds (rp64_256/mod.rs:299-319)."""
    ark = jnp.stack([jnp.asarray(_ARK1_NP), jnp.asarray(_ARK2_NP)], axis=1)  # (7,2,12)

    def round_fn(state, ark_r):
        state = _rp_sbox(state)
        state = _rp_mds(state)
        state = gl_add(state, ark_r[0][None, :])
        state = _rp_inv_sbox(state)
        state = _rp_mds(state)
        state = gl_add(state, ark_r[1][None, :])
        return state, None

    state, _ = jax.lax.scan(round_fn, state, ark)
    return state


def _traced_const_cols(like_2d, values):
    """(m, len(values)) array of constants derived from a traced input —
    in-place scatters into literal zeros would otherwise be constant-folded
    by XLA into multi-MB embedded arrays (slow compiles, giant executables)."""
    m = like_2d.shape[0]
    one_t = jnp.uint64(1) + jnp.uint64(0) * like_2d.reshape(-1)[0]
    cols = jnp.asarray(np.array(values, dtype=np.uint64))[None, :]
    return jnp.broadcast_to(one_t[None, None] * cols, (m, len(values)))


@jax.jit
def rp64_hash_rows(rows):
    """hash_elements of each row: rows (m, k) u64 → digests (m, 4) u64
    (rp64_256/mod.rs:183-204: capacity[0] = k, absorb in chunks of 8)."""
    m, k = rows.shape
    capacity = _traced_const_cols(rows, [k % P, 0, 0, 0])
    first = rows[:, :_RATE_WIDTH]
    pad = _RATE_WIDTH - first.shape[1]
    if pad:
        first = jnp.concatenate(
            [first, _traced_const_cols(rows, [0] * pad)], axis=1)
    state = jnp.concatenate([capacity, first], axis=1)
    state = rp64_permutation_rows(state)
    i = _RATE_WIDTH
    while i < k:
        chunk = rows[:, i : i + _RATE_WIDTH]
        width = chunk.shape[1]
        state = state.at[:, _RATE_START : _RATE_START + width].set(
            gl_add(state[:, _RATE_START : _RATE_START + width], chunk))
        state = rp64_permutation_rows(state)
        i += _RATE_WIDTH
    return state[:, 4:8]


@jax.jit
def rp64_merge_rows(left, right):
    """merge of digest pairs: (m,4),(m,4) → (m,4) (rp64_256/mod.rs:208-221)."""
    capacity = _traced_const_cols(left, [_RATE_WIDTH, 0, 0, 0])
    state = jnp.concatenate([capacity, left, right], axis=1)
    state = rp64_permutation_rows(state)
    return state[:, 4:8]


@jax.jit
def _merkle_levels_impl(leaves):
    levels = []
    current = rp64_merge_rows(leaves[0::2], leaves[1::2])  # (m/2, 4)
    levels.append(current)
    while current.shape[0] > 1:
        current = rp64_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def merkle_levels_rp64(leaves):
    """Merkle internal levels from leaf digests (m, 4), all on device.

    Returns {size: level_array} where ``level_array`` of shape (size, 4) holds
    heap nodes [size, 2·size) — the reference layout with the root at
    nodes[1] (crypto/src/merkle/mod.rs:344-368). The whole log₂(m)-level
    reduction is ONE jitted program (one compile per tree size), each level a
    vectorized 2-to-1 Rescue merge; arrays stay on device for lazy reads."""
    return {lvl.shape[0]: lvl for lvl in _merkle_levels_impl(leaves)}


def merkle_build_rp64(leaves):
    """Full host-side Merkle node array (m, 4) — used by small trees/tests."""
    m = leaves.shape[0]
    nodes = np.zeros((m, 4), dtype=np.uint64)
    for size, level in merkle_levels_rp64(leaves).items():
        nodes[size : 2 * size] = np.asarray(level)
    return nodes


# ================================================================================
# Host <-> device conversion helpers
# ================================================================================


def to_device(arr_obj: np.ndarray) -> jnp.ndarray:
    """numpy object array of ints -> uint64 device array."""
    return jnp.asarray(arr_obj.astype(np.uint64))


def to_host(arr) -> np.ndarray:
    """uint64 device array -> numpy object array of Python ints."""
    return np.asarray(arr).astype(object)


def digests_to_bytes(digest_rows: np.ndarray) -> List[bytes]:
    """(m, 4) uint64 -> list of 32-byte digests (LE u64 concatenation —
    exactly the ElementDigest byte layout)."""
    arr = np.ascontiguousarray(digest_rows.astype("<u8"))
    flat = arr.tobytes()
    return [flat[i * 32 : (i + 1) * 32] for i in range(arr.shape[0])]
