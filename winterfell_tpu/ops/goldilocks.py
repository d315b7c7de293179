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

Executable-size discipline (the round-1 lesson): every array that scales
with the domain size — six-step middle twiddles, offset power series, FRI
inverse-offset powers — is built ON DEVICE once per (size, value) by tiny
log-doubling programs and then passed into the jitted compute programs as a
runtime ARGUMENT. Nothing big is embedded in any executable and nothing big
crosses the host↔device link; only O(log n) scalar "jump" values do. Long
scalar op chains (inverse S-box addition chain, pow-by-constant, MDS row
accumulation) run as ``lax.fori_loop``/``lax.scan`` so the traced program
stays O(1) in the chain length. Both together keep compiled programs small
(fast remote compiles, small persistent-cache entries, fast warm loads).
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

# Rescue row hashing / Merkle merges route through the hand-written Mosaic
# kernels (ops.pallas_rescue) on TPU — measured 2.0x the XLA-emulated-u64
# jnp path on v5e (2^21-row leaf hash: 2.88 s -> 1.43 s, fresh-input timing).
# The jnp path is the oracle and the fallback everywhere else;
# WINTER_PALLAS=0 forces it for A/B runs.
import os as _os

_USE_PALLAS = _os.environ.get("WINTER_PALLAS", "1") not in ("", "0")


def _pallas_hashing(m: int) -> bool:
    # 8 sublanes x 128-aligned lanes per (8, blk) tile of the per-lane
    # layout; above one 512-lane grid block, m/8 must tile into whole
    # blocks (the kernel grid would silently skip a remainder)
    return (_USE_PALLAS and m % 1024 == 0
            and (m <= 4096 or m % 4096 == 0)
            and jax.default_backend() == "tpu")


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


def gl_mul_small(a, c):
    """a · c mod p where every element of ``c`` is < 2^32 (e.g. the Rescue
    MDS constants — reference mul_small, f64/mod.rs:106). Half the partial
    products of the general multiply."""
    a_lo = a & _MASK32
    a_hi = a >> jnp.uint64(32)
    t0 = a_lo * c  # < 2^64, exact
    t2 = a_hi * c
    mid = (t0 >> jnp.uint64(32)) + (t2 & _MASK32)  # ≤ 2^33
    lo = (t0 & _MASK32) | (mid << jnp.uint64(32))
    hi = (t2 >> jnp.uint64(32)) + (mid >> jnp.uint64(32))
    return _reduce_128(hi, lo)


def _squares(a, k: int):
    """a^(2^k) — fori_loop for long runs so the traced program is O(1)."""
    if k == 0:
        return a
    if k <= 2:
        for _ in range(k):
            a = gl_mul(a, a)
        return a
    return jax.lax.fori_loop(0, k, lambda _, v: gl_mul(v, v), a)


def gl_pow_const(a, e: int):
    """a ** e for a python-int exponent. Square-and-multiply with runs of
    squarings rolled into fori_loops (small programs for e up to 2^32)."""
    if e == 0:
        return jnp.ones_like(a)
    bits = bin(e)[2:]
    result = a
    run = 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            result = gl_mul(_squares(result, run), a)
            run = 0
    if run:
        result = _squares(result, run)
    return result


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
# Device-built constant arrays (power series, six-step middle twiddles)
# ================================================================================


@partial(jax.jit, static_argnums=(2,))
def _build_powers_jit(jumps, scale, n: int):
    """[scale · s^k for k in 0..n) built on device by log-doubling from the
    (log2(n),) "jump" array jumps[j] = s^(2^j). Program is O(log n) ops and
    shared across every (s, scale) pair for a given n."""
    cap = 1 << max((n - 1).bit_length(), 0) if n > 1 else 1
    cur = scale[None]
    m, j = 1, 0
    while m < cap:
        cur = jnp.concatenate([cur, gl_mul(cur, jumps[j])])
        m *= 2
        j += 1
    return cur[:n]


@lru_cache(maxsize=None)
def _power_series_dev(s: int, n: int, scale: int = 1):
    """Device-resident power series [scale·s^k], built once per (s, n, scale)
    and cached for the life of the process. Only O(log n) scalars cross the
    host↔device link. ensure_compile_time_eval keeps the build eager (and the
    cached value concrete) even when first requested mid-trace."""
    logn = max((n - 1).bit_length(), 1)
    jumps = np.empty(logn, dtype=np.uint64)
    acc = s % P
    for j in range(logn):
        jumps[j] = acc
        acc = acc * acc % P
    with jax.ensure_compile_time_eval():
        return _build_powers_jit(jnp.asarray(jumps), jnp.uint64(scale % P), n)


@partial(jax.jit, static_argnums=(1,))
def _build_mid_tw_jit(ratio_rows, b: int):
    """(b, a) six-step middle twiddle matrix w_n^(j1·k2) from the stacked
    ratio rows ratio_rows[r] = [(w^(2^r))^j1 for j1 < a] by row-doubling:
    rows [m, 2m) = rows [0, m) · ratio_r."""
    a = ratio_rows.shape[1]
    tw = jnp.ones((1, a), dtype=jnp.uint64)
    m, r = 1, 0
    while m < b:
        tw = jnp.concatenate([tw, gl_mul(tw, ratio_rows[r][None, :])], axis=0)
        m *= 2
        r += 1
    return tw


@lru_cache(maxsize=None)
def _mid_twiddles_dev(n: int, a: int, inverse: bool):
    """Device-resident (b, a) middle twiddle matrix for the six-step split of
    an n-point NTT; built on device, nothing big uploaded or embedded."""
    b = n // a
    root = F64.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    rows = []
    m = 1
    while m < b:
        rows.append(_power_series_dev(pow(root, m, P), a))
        m *= 2
    with jax.ensure_compile_time_eval():
        return _build_mid_tw_jit(jnp.stack(rows), b)


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
# constant twiddle vectors (small graphs, small literals); larger sizes
# decompose via the six-step split so sub-transforms stay below this bound.
_SMALL_NTT = 1 << 13


@lru_cache(maxsize=None)
def ntt_plan(n: int, inverse: bool):
    """Pytree of device-resident constants for an n-point NTT: None for small
    sizes, else (mid_twiddles, inner_plan, outer_plan). Passed into jitted
    programs as a runtime argument — never embedded in executables."""
    if n <= _SMALL_NTT:
        return None
    logn = n.bit_length() - 1
    a = 1 << (logn // 2)
    b = n // a
    return (_mid_twiddles_dev(n, a, inverse), ntt_plan(b, inverse),
            ntt_plan(a, inverse))


def _shard_six_step(arr, shard):
    """Explicit GSPMD constraint for the six-step intermediates: the (b, a)
    matrix is sharded on its COLUMN axis over the (host × chip) mesh, so the
    per-column sub-NTTs are device-local and the swapaxes between them is
    ONE all-to-all (whose host-axis component is the only DCN traffic of the
    transform) — the distributed-FFT recipe of SURVEY §5.8 / SCALING.md."""
    if shard is None:
        return arr
    from jax.sharding import NamedSharding, PartitionSpec

    mesh, axes = shard
    spec = PartitionSpec(None, axes, *(None,) * (arr.ndim - 2))
    return jax.lax.with_sharding_constraint(arr, NamedSharding(mesh, spec))


def _ntt_core(x, n: int, inverse: bool, plan, shard=None):
    """x: (n, ...) u64 → NTT/iNTT without the 1/n scale, natural order in/out.

    Small sizes: unrolled radix-2 DIT with constant per-stage twiddles.
    Large sizes: six-step split n = a·b (the distributed-NTT structure —
    math/src/fft/concurrent.rs:132-171 is the reference's shared-memory
    analogue): view as (b, a), b-point NTTs down the columns, multiply by the
    (b, a) middle twiddle matrix w^(j1·k2) (a device-built plan argument),
    transpose, a-point NTTs, flatten. ``shard`` (mesh, axes) pins the
    six-step intermediates' shardings for multi-chip runs (see
    _shard_six_step)."""
    if n == 1:
        return x
    if n <= _SMALL_NTT:
        return _ntt_small(x, n, inverse)

    mid_tw, inner_plan, outer_plan = plan
    rest = x.shape[1:]
    b, a = mid_tw.shape

    m = _shard_six_step(x.reshape((b, a) + rest), shard)
    y = _ntt_core(m, b, inverse, inner_plan)  # (b, a, ...)
    # broadcasted elementwise multiply: XLA flattens pure-elementwise ops
    # regardless of logical layout (measured, scripts/f64_layout_ab.py), so
    # no lane-padding tax here; materializing an expanded twiddle array
    # instead OOMed the fused 2^20 commit program
    y = gl_mul(y, mid_tw.reshape((b, a) + (1,) * len(rest)))

    z = _shard_six_step(jnp.swapaxes(y, 0, 1), shard)  # (a, b, ...)
    out = _ntt_core(z, a, inverse, outer_plan)
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
    """Classic unrolled radix-2 DIT, constant twiddles, natural in/out.

    NOTE on layout: do NOT flatten the batch dims around the stage loop —
    an explicit (n, prod(rest)) reshape pins a T(8,128) layout with the
    narrow axis in the lanes (64x padding; an 8 GB HLO temp at 2^23 x 2),
    while XLA's own layout propagation through the unflattened chain stays
    within memory. Measured 2026-08-19; see scripts/f64_layout_ab.py for
    the elementwise-flattening evidence."""
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


# ---- traceable NTT bodies (plans/powers as arguments) -------------------------


def ntt_evaluate_body(coeffs, plan, n: int, shard=None):
    return _ntt_core(coeffs, n, inverse=False, plan=plan, shard=shard)


def ntt_interpolate_body(evals, plan, n: int, shard=None):
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan, shard=shard)
    inv_n = pow(n, P - 2, P)
    return gl_mul(coeffs, jnp.uint64(inv_n))


def ntt_lde_body(coeffs, off_pows, plan, n: int, blowup: int,
                 shard=None):
    """Coset LDE body: scale coeffs by the offset power series (a device
    argument), zero-pad to n·blowup, one big NTT (matches
    winterfell_tpu.math.ntt.evaluate_poly_with_offset value-for-value)."""
    big_n = n * blowup
    rest_dims = coeffs.ndim - 1
    scaled = gl_mul(coeffs, off_pows.reshape((n,) + (1,) * rest_dims))
    padded = jnp.concatenate(
        [scaled, jnp.zeros((big_n - n,) + coeffs.shape[1:], dtype=jnp.uint64)],
        axis=0)
    return _ntt_core(padded, big_n, inverse=False, plan=plan, shard=shard)


def ntt_interp_offset_body(evals, inv_off_pows, plan, n: int, shard=None):
    """iNTT + combined (1/n)·offset^-i scale (the scale is folded into the
    power-series argument — one multiply pass instead of two)."""
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan, shard=shard)
    rest_dims = coeffs.ndim - 1
    return gl_mul(coeffs, inv_off_pows.reshape((n,) + (1,) * rest_dims))


# ---- public jitted wrappers ---------------------------------------------------


@partial(jax.jit, static_argnums=(2,))
def _ntt_evaluate_jit(coeffs, plan, n: int):
    return ntt_evaluate_body(coeffs, plan, n)


def ntt_evaluate(coeffs, n: int):
    return _ntt_evaluate_jit(coeffs, ntt_plan(n, False), n)


@partial(jax.jit, static_argnums=(2,))
def _ntt_interpolate_jit(evals, plan, n: int):
    return ntt_interpolate_body(evals, plan, n)


def ntt_interpolate(evals, n: int):
    return _ntt_interpolate_jit(evals, ntt_plan(n, True), n)


@partial(jax.jit, static_argnums=(3, 4))
def _ntt_lde_jit(coeffs, off_pows, plan, n: int, blowup: int):
    return ntt_lde_body(coeffs, off_pows, plan, n, blowup)


def ntt_evaluate_with_offset(coeffs, n: int, offset: int, blowup: int):
    """Coset LDE, natural order over the n·blowup domain."""
    return _ntt_lde_jit(coeffs, _power_series_dev(offset, n),
                        ntt_plan(n * blowup, False), n, blowup)


@partial(jax.jit, static_argnums=(3,))
def _ntt_interp_offset_jit(evals, inv_off_pows, plan, n: int):
    return ntt_interp_offset_body(evals, inv_off_pows, plan, n)


def interp_offset_powers(n: int, offset: int):
    """Device power series (1/n)·offset^-i used by offset interpolation."""
    inv_offset = pow(offset % P, P - 2, P)
    inv_n = pow(n, P - 2, P)
    return _power_series_dev(inv_offset, n, inv_n)


def ntt_interpolate_with_offset(evals, n: int, offset: int):
    return _ntt_interp_offset_jit(evals, interp_offset_powers(n, offset),
                                  ntt_plan(n, True), n)


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


_BATCH_INV_G = 128  # scan-block width (one full lane tile)


def gl_batch_inv(a):
    """Montgomery batch inversion: prefix/suffix product scans over blocks of
    128 + one Fermat chain on the block totals — ~6 multiplies per element
    instead of gl_inv's ~96 (math/src/field/mod.rs batch_inversion is the
    reference's serial equivalent). Value-identical to gl_inv for EVERY
    input including zeros (zeros are masked to 1 for the scan and restored
    after), so device/host byte-pins are unaffected."""
    shape = a.shape
    flat = a.reshape(-1)
    n = flat.shape[0]
    if n < 2 * _BATCH_INV_G:
        return gl_inv(a)
    pad = (-n) % _BATCH_INV_G
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.ones((pad,), dtype=jnp.uint64)])
    is_zero = flat == 0
    az = jnp.where(is_zero, jnp.uint64(1), flat).reshape(-1, _BATCH_INV_G)
    pref = jax.lax.associative_scan(gl_mul, az, axis=1)
    suff = jax.lax.associative_scan(gl_mul, az, axis=1, reverse=True)
    tinv = gl_batch_inv(pref[:, -1])  # recurse: Fermat only on the tip
    ones_col = jnp.ones((az.shape[0], 1), dtype=jnp.uint64)
    pprev = jnp.concatenate([ones_col, pref[:, :-1]], axis=1)
    snext = jnp.concatenate([suff[:, 1:], ones_col], axis=1)
    inv = gl_mul(gl_mul(pprev, snext), tinv[:, None]).reshape(-1)
    inv = jnp.where(is_zero, jnp.uint64(0), inv)
    if pad:
        inv = inv[:n]
    return inv.reshape(shape)


def ext_batch_inv(a):
    """ext_inv with the norm inverted via gl_batch_inv — for domain-sized
    arrays (the DEEP denominators)."""
    d = a.shape[-1]
    if d == 1:
        return gl_batch_inv(a)
    if d == 2:
        a0, a1 = a[..., 0], a[..., 1]
        conj = jnp.stack([gl_add(a0, a1), gl_neg(a1)], axis=-1)
        norm = ext_mul(a, conj)[..., 0]
        return ext_mul_base(conj, gl_batch_inv(norm))
    conj1 = ext_frobenius(a)
    conj2 = ext_frobenius(conj1)
    cc = ext_mul(conj1, conj2)
    norm = ext_mul(a, cc)[..., 0]
    return ext_mul_base(cc, gl_batch_inv(norm))


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


def fri_fold_body(evaluations, inv_off_pows, alpha, n_fold: int):
    """evaluations (n, d), alpha (d,) → folded (n/N, d). Same math as the
    host apply_drp: per-row N-point iNTT over the row's coset, inverse-offset
    scaling (a device argument), Horner at α."""
    n, d = evaluations.shape
    rows = n // n_fold
    transposed = evaluations.reshape(n_fold, rows, d)  # [j, i] = evals[i + j*rows]

    coeffs = _ntt_core(transposed, n_fold, inverse=True, plan=None)
    inv_nf = pow(n_fold, P - 2, P)
    coeffs = gl_mul(coeffs, jnp.uint64(inv_nf))  # (N, rows, d)

    result = jnp.zeros((rows, d), dtype=jnp.uint64)
    alpha_b = alpha[None, :]
    scaled = [gl_mul(coeffs[k], inv_off_pows[k][:, None]) for k in range(n_fold)]
    for k in range(n_fold - 1, -1, -1):
        result = ext_add(ext_mul(result, jnp.broadcast_to(alpha_b, result.shape)),
                         scaled[k])
    return result


@partial(jax.jit, static_argnums=(3,))
def _fri_fold_jit(evaluations, inv_off_pows, alpha, n_fold: int):
    return fri_fold_body(evaluations, inv_off_pows, alpha, n_fold)


def fri_fold(evaluations, n_fold: int, domain_offset: int, alpha):
    return _fri_fold_jit(
        evaluations,
        fri_inv_offset_powers(evaluations.shape[0], n_fold, domain_offset % P),
        alpha, n_fold)


@partial(jax.jit, static_argnums=(1,))
def _fri_pow_rows_jit(inv_offsets, n_fold: int):
    rows = [jnp.ones_like(inv_offsets)]
    acc = inv_offsets
    for _ in range(1, n_fold):
        rows.append(acc)
        acc = gl_mul(acc, inv_offsets)
    return jnp.stack(rows)


@lru_cache(maxsize=None)
def fri_inv_offset_powers(n: int, n_fold: int, domain_offset: int):
    """(N, rows) device matrix of ((offset·g^i)^-1)^k for the fri_fold
    coefficient scaling (folding/mod.rs:103-110). Built on device."""
    rows = n // n_fold
    g = F64.get_root_of_unity(n.bit_length() - 1)
    inv_offsets = _power_series_dev(pow(g, P - 2, P), rows,
                                    pow(domain_offset % P, P - 2, P))
    with jax.ensure_compile_time_eval():
        return _fri_pow_rows_jit(inv_offsets, n_fold)


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
    72-multiplication inverse S-box chain (crypto/src/hash/rescue/mod.rs:21);
    the squaring run is a fori_loop so the traced program stays small."""
    return gl_mul(_squares(base, m), tail)


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
    """state: (m, 12) → MDS·state. Scan over the 12 columns with mul_small
    (all MDS entries are ≤ 26) — a small traced body instead of an unrolled
    12×(full-multiply) chain. Kept as the readable oracle for the
    frequency-domain version below (tests pin them equal)."""
    mds_t = jnp.asarray(_MDS_NP.T.copy())  # (12, 12): row k = MDS[:, k]
    cols = jnp.moveaxis(state, -1, 0)      # (12, m)

    def body(acc, xs):
        col, mds_col = xs  # (m,), (12,)
        return gl_add(acc, gl_mul_small(col[:, None], mds_col[None, :])), None

    acc0 = jnp.zeros_like(state)
    acc, _ = jax.lax.scan(body, acc0, (cols, mds_t))
    return acc


# The circulant MDS matrix [7, 23, 8, 26, ...] diagonalizes under the DFT, so
# the 12x12 multiply collapses to a Hadamard product in frequency domain where
# the matrix entries are tiny (the matrix was CHOSEN for that), turning 144
# modular multiplies per row into ~100 plain i64 add/shift/small-const ops.
# Same split 3x4 real-FFT factorization and pre-scaled frequency constants as
# the reference (crypto/src/hash/mds/mds_f64_12x12.rs:38-40, itself following
# Nabaglo's Plonky2 kernel), re-derived here as lane-vectorized array ops.
_MDS_FREQ_B1 = (16, 8, 16)
_MDS_FREQ_B2 = ((-1, 2), (-1, 1), (4, 8))
_MDS_FREQ_B3 = (-8, 1, 1)


def _cmul_i64(c):
    """Multiply an (m,) i64 lane by a small constant via shift/add/neg."""
    def mul(x, k=c):
        neg = k < 0
        k = -k if neg else k
        if k == 0:
            return jnp.zeros_like(x)
        out = None
        bit = 0
        while k:
            if k & 1:
                term = x << bit if bit else x
                out = term if out is None else out + term
            k >>= 1
            bit += 1
        return -out if neg else out
    return mul


def _mds12_freq(cols):
    """cols: 12 (m,) int64 lanes (values < 2^32) → 12 (m,) int64 lanes of the
    exact (unreduced) circulant product. Mirrors fft4_real / block1-3 /
    ifft4_real_unreduced (math/src/fft/real_u64.rs:8-45)."""
    def fft4(x0, x1, x2, x3):
        z0, z2 = x0 + x2, x0 - x2
        z1, z3 = x1 + x3, x1 - x3
        return z0 + z1, (z2, -z3), z0 - z1

    u0, u1, u2 = fft4(cols[0], cols[3], cols[6], cols[9])
    u4, u5, u6 = fft4(cols[1], cols[4], cols[7], cols[10])
    u8, u9, u10 = fft4(cols[2], cols[5], cols[8], cols[11])

    # block1: real 3-point cyclic convolution with constant y
    y0, y1, y2 = (_cmul_i64(c) for c in _MDS_FREQ_B1)
    v0 = y0(u0) + y2(u4) + y1(u8)
    v4 = y1(u0) + y0(u4) + y2(u8)
    v8 = y2(u0) + y1(u4) + y0(u8)

    # block2: complex lanes (Karatsuba with constant y)
    (y0r, y0i), (y1r, y1i), (y2r, y2i) = _MDS_FREQ_B2
    x0r, x0i = u1
    x1r, x1i = u5
    x2r, x2i = u9
    x0s, x1s, x2s = x0r + x0i, x1r + x1i, x2r + x2i

    def kprod(xr, xi, xs, yr, yi):
        mr, mi = _cmul_i64(yr)(xr), _cmul_i64(yi)(xi)
        return mr, mi, _cmul_i64(yr + yi)(xs)

    m0 = kprod(x0r, x0i, x0s, y0r, y0i)
    m1 = kprod(x1r, x1i, x1s, y2r, y2i)
    m2 = kprod(x2r, x2i, x2s, y1r, y1i)
    v1 = ((m0[0] - m0[1]) + (m1[2] - m1[0] - m1[1]) + (m2[2] - m2[0] - m2[1]),
          (m0[2] - m0[0] - m0[1]) + (-m1[0] + m1[1]) + (-m2[0] + m2[1]))
    m0 = kprod(x0r, x0i, x0s, y1r, y1i)
    m1 = kprod(x1r, x1i, x1s, y0r, y0i)
    m2 = kprod(x2r, x2i, x2s, y2r, y2i)
    v5 = ((m0[0] - m0[1]) + (m1[0] - m1[1]) + (m2[2] - m2[0] - m2[1]),
          (m0[2] - m0[0] - m0[1]) + (m1[2] - m1[0] - m1[1]) + (-m2[0] + m2[1]))
    m0 = kprod(x0r, x0i, x0s, y2r, y2i)
    m1 = kprod(x1r, x1i, x1s, y1r, y1i)
    m2 = kprod(x2r, x2i, x2s, y0r, y0i)
    v9 = ((m0[0] - m0[1]) + (m1[0] - m1[1]) + (m2[0] - m2[1]),
          (m0[2] - m0[0] - m0[1]) + (m1[2] - m1[0] - m1[1])
          + (m2[2] - m2[0] - m2[1]))

    # block3: real lanes at the Nyquist frequency
    y0, y1, y2 = (_cmul_i64(c) for c in _MDS_FREQ_B3)
    v2 = y0(u2) - y2(u6) - y1(u10)
    v6 = y1(u2) + y0(u6) - y2(u10)
    v10 = y2(u2) + y1(u6) + y0(u10)

    def ifft4(y0, y1, y2):
        z0, z1 = y0 + y2, y0 - y2
        z2, z3 = y1[0], -y1[1]
        return z0 + z2, z1 + z3, z0 - z2, z1 - z3

    s0, s3, s6, s9 = ifft4(v0, v1, v2)
    s1, s4, s7, s10 = ifft4(v4, v5, v6)
    s2, s5, s8, s11 = ifft4(v8, v9, v10)
    return s0, s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11


def _rp_mds_freq(state):
    """state: (m, 12) canonical u64 → MDS·state, canonical. Low/high 32-bit
    halves go through the exact integer frequency-domain convolution
    separately (linearity; no overflow), then one 96-bit Goldilocks reduction
    recombines them (mds_f64_12x12.rs:41-69)."""
    lo = (state & _MASK32).astype(jnp.int64)
    hi = (state >> jnp.uint64(32)).astype(jnp.int64)
    lo_out = [x.astype(jnp.uint64)
              for x in _mds12_freq([lo[..., k] for k in range(12)])]
    hi_out = [x.astype(jnp.uint64)
              for x in _mds12_freq([hi[..., k] for k in range(12)])]

    outs = []
    for l, h in zip(lo_out, hi_out):
        h_shift = h << jnp.uint64(32)
        s_lo = l + h_shift                      # 96-bit value s = lo + hi·2^32
        carry = (s_lo < h_shift).astype(jnp.uint64)
        s_hi = (h >> jnp.uint64(32)) + carry
        z = (s_hi << jnp.uint64(32)) - s_hi     # s_hi·2^32 ≡ s_hi·(2^32−1)+s_hi
        res = s_lo + z
        res = res + jnp.where(res < z, _MASK32, jnp.uint64(0))
        outs.append(jnp.where(res >= _P64, res - _P64, res))
    return jnp.stack(outs, axis=-1)


@jax.jit
def rp64_permutation_rows(state):
    """Vectorized Rescue-XLIX permutation: state (m, 12) u64, scanned over
    the 7 rounds (rp64_256/mod.rs:299-319)."""
    ark = jnp.stack([jnp.asarray(_ARK1_NP), jnp.asarray(_ARK2_NP)], axis=1)  # (7,2,12)

    def round_fn(state, ark_r):
        state = _rp_sbox(state)
        state = _rp_mds_freq(state)
        state = gl_add(state, ark_r[0][None, :])
        state = _rp_inv_sbox(state)
        state = _rp_mds_freq(state)
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
    if _pallas_hashing(m):
        from . import pallas_rescue

        return pallas_rescue.rp64_hash_rows_pallas(rows)
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
    if _pallas_hashing(left.shape[0]):
        from . import pallas_rescue

        return pallas_rescue.rp64_merge_rows_pallas(left, right)
    capacity = _traced_const_cols(left, [_RATE_WIDTH, 0, 0, 0])
    state = jnp.concatenate([capacity, left, right], axis=1)
    state = rp64_permutation_rows(state)
    return state[:, 4:8]


@jax.jit
def _merge_level(level):
    """(m, 4) digests → (m/2, 4) parent digests. One small program per level
    size, shared across every tree (trace/aux/composition/FRI) whose
    reduction passes through that size."""
    return rp64_merge_rows(level[0::2], level[1::2])


# Rescue merges hold ~8 live state copies per row in XLA fusion temps; a
# 2^24-row merge alone approaches single-chip HBM. Merge huge levels in
# fixed-size slabs through one shared compiled program.
_MERGE_SLAB = 1 << 22


def _merge_level_slabbed(level):
    m = level.shape[0]
    if m <= _MERGE_SLAB:
        return _merge_level(level)
    parts = [_merge_level(level[i : i + _MERGE_SLAB])
             for i in range(0, m, _MERGE_SLAB)]
    return jnp.concatenate(parts, axis=0)


# levels at or below this size are reduced by ONE shared unrolled program
# (the same (1024, 4) tail shape for every big tree)
_MERKLE_TAIL = 1 << 10


@jax.jit
def _merkle_tail_impl(leaves):
    levels = []
    current = rp64_merge_rows(leaves[0::2], leaves[1::2])  # (m/2, 4)
    levels.append(current)
    while current.shape[0] > 1:
        current = rp64_merge_rows(current[0::2], current[1::2])
        levels.append(current)
    return tuple(levels)


def _merkle_levels_impl(leaves):
    """Merkle internal levels from leaf digests (m, 4): per-level shared
    merge programs down to _MERKLE_TAIL, then one shared tail program —
    executable bytes are O(log m) small programs reused across all trees,
    instead of one giant fully-unrolled program per tree size."""
    levels = []
    current = leaves
    while current.shape[0] > _MERKLE_TAIL:
        current = _merge_level_slabbed(current)
        levels.append(current)
    if current.shape[0] > 1:
        levels.extend(_merkle_tail_impl(current))
    return tuple(levels)


def merkle_levels_rp64(leaves):
    """Merkle internal levels from leaf digests (m, 4), all on device.

    Returns {size: level_array} where ``level_array`` of shape (size, 4) holds
    heap nodes [size, 2·size) — the reference layout with the root at
    nodes[1] (crypto/src/merkle/mod.rs:344-368). Each level is a vectorized
    2-to-1 Rescue merge; arrays stay on device for lazy reads."""
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
