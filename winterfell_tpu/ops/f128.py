"""f128 field arithmetic and NTT on JAX/XLA — the TPU engine for the
reference's default base field (math/src/field/f128/mod.rs: p = 2^128 −
45·2^40 + 1, TWO_ADICITY = 40, GENERATOR = 3, quad extension x² − x − 1,
cubic unsupported).

Design (TPU-first):

- Elements are uint64 arrays with a trailing LIMB axis of 4, each limb
  holding a 32-bit little-endian digit. The TPU has no 64-bit (let alone
  128-bit) integer units; 32-bit limbs in u64 lanes make every partial
  product exact (u32×u32 → u64) on the VPU with no emulation surprises.
- Multiplication is 4×4 schoolbook into 8 columns of 32-bit half-products
  (column sums < 2^35, no overflow), one carry sweep, then reduction via
  2^128 ≡ 45·2^40 − 1 =: φ (mod p): two φ-folds and a conditional subtract.
  This replaces the reference's u256 Barrett reduction
  (math/src/field/f128/mod.rs:429) with the same canonical result.
- The NTT mirrors winterfell_tpu.ops.goldilocks: unrolled radix-2 DIT with
  constant per-stage twiddles below _SMALL_NTT, a six-step a×b split above
  it, and every domain-sized constant (offset power series, middle twiddle
  matrices) built ON DEVICE by log-doubling and passed into jitted programs
  as runtime arguments — never embedded in executables.

The exact oracle is winterfell_tpu.math (object-dtype Python ints); every
public op here is pinned against it in tests/test_f128_jax.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ..math.fields import F128

P = F128.p
PHI = (45 << 40) - 1  # 2^128 mod p
_MASK32 = jnp.uint64(0xFFFFFFFF)
_P_LIMBS_NP = np.array(
    [(P >> (32 * k)) & 0xFFFFFFFF for k in range(4)], dtype=np.uint64)
_PHI_LIMBS = ((PHI & 0xFFFFFFFF), (PHI >> 32))  # f1 = 0x2CFF (14 bits)

NUM_LIMBS = 4


# ================================================================================
# Host <-> device limb conversion
# ================================================================================


def to_limbs_np(arr_obj: np.ndarray) -> np.ndarray:
    """Object array of ints -> uint64 limb array with trailing axis 4.

    Two object-ufunc passes (mask / shift to u64 halves) beat a per-element
    Python loop ~2.6x; the u32 unpack then runs as cheap native u64 ops."""
    mask64 = (1 << 64) - 1
    lo = np.bitwise_and(arr_obj, mask64).astype(np.uint64)
    hi = np.right_shift(arr_obj, 64).astype(np.uint64)
    out = np.empty(arr_obj.shape + (NUM_LIMBS,), dtype=np.uint64)
    out[..., 0] = lo & np.uint64(0xFFFFFFFF)
    out[..., 1] = lo >> np.uint64(32)
    out[..., 2] = hi & np.uint64(0xFFFFFFFF)
    out[..., 3] = hi >> np.uint64(32)
    return out


def to_device(arr_obj: np.ndarray):
    return jnp.asarray(to_limbs_np(arr_obj))


@jax.jit
def _widen_u32(v):
    return v.astype(jnp.uint64)


def to_device_native(rows: np.ndarray):
    """Native trace rows — (..., 2) little-endian u64 (lo, hi) pairs — to the
    device limb layout. A pure dtype view on the host; the u32→u64 lane widen
    runs on device so only 16 B/element cross the link (the host astype
    doubled the transfer)."""
    v = np.ascontiguousarray(rows).view(np.uint32)
    v = v.reshape(rows.shape[:-1] + (NUM_LIMBS,))
    return _widen_u32(jnp.asarray(v))


def from_limbs_np(limbs: np.ndarray) -> np.ndarray:
    """uint64 limb array (..., 4) -> object array of Python ints."""
    limbs = np.asarray(limbs)
    out = np.zeros(limbs.shape[:-1], dtype=object)
    for k in range(NUM_LIMBS):
        out = out + (limbs[..., k].astype(object) << (32 * k))
    return out


def to_host(arr) -> np.ndarray:
    return from_limbs_np(np.asarray(arr))


def _int_to_limbs(v: int) -> np.ndarray:
    v = int(v) % P
    return np.array([(v >> (32 * k)) & 0xFFFFFFFF for k in range(4)],
                    dtype=np.uint64)


def scalar(v: int):
    """Device (4,) limb vector for a host int."""
    return jnp.asarray(_int_to_limbs(v))


# ================================================================================
# Limb-vector arithmetic (trailing axis = limbs, values < 2^32 in u64 lanes)
# ================================================================================


def _carry_sweep(cols):
    """List of k column sums (< 2^63 each) -> k 32-bit limbs + final carry."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & _MASK32)
        carry = t >> jnp.uint64(32)
    return out, carry


def _add_raw(a, b):
    """Limbwise add of equal-length limb arrays -> (limbs, carry_out)."""
    n = a.shape[-1]
    cols = [a[..., k] + b[..., k] for k in range(n)]
    out, carry = _carry_sweep(cols)
    return jnp.stack(out, axis=-1), carry


def _sub_raw(a, b):
    """a − b limbwise -> (limbs, borrow_out in {0,1})."""
    n = a.shape[-1]
    out = []
    borrow = jnp.zeros_like(a[..., 0])
    for k in range(n):
        t = a[..., k] - b[..., k] - borrow
        out.append(t & _MASK32)
        borrow = t >> jnp.uint64(63)  # negative iff top bit set
    return jnp.stack(out, axis=-1), borrow


def _p_like(a):
    return jnp.asarray(_P_LIMBS_NP).reshape((1,) * (a.ndim - 1) + (4,))


def _cond_sub_p(a):
    """a < 2^128: subtract p once if a ≥ p."""
    diff, borrow = _sub_raw(a, _p_like(a))
    return jnp.where((borrow == 0)[..., None], diff, a)


def f128_add(a, b):
    s, carry = _add_raw(a, b)
    # carry out of 4 limbs means value = 2^128 + s ≡ s + φ (φ < 2^46, s tiny)
    phi = jnp.asarray(_int_to_limbs(PHI)).reshape((1,) * (s.ndim - 1) + (4,))
    s_wrap, _ = _add_raw(s, phi)
    s = jnp.where((carry != 0)[..., None], s_wrap, s)
    return _cond_sub_p(s)


def f128_sub(a, b):
    d, borrow = _sub_raw(a, b)
    d_wrap, _ = _add_raw(d, _p_like(d))
    return jnp.where((borrow != 0)[..., None], d_wrap, d)


def f128_neg(a):
    z = jnp.zeros_like(a)
    return jnp.where(
        jnp.all(a == 0, axis=-1, keepdims=True), z, _sub_raw(_p_like(a), a)[0])


def _mul_limbs_4x4(a, b):
    """Full 256-bit product: (..., 4) × (..., 4) -> list of 8 column sums
    BEFORE the carry sweep (each < 2^35)."""
    ah = [a[..., i] for i in range(4)]
    bh = [b[..., j] for j in range(4)]
    cols = [None] * 8
    for i in range(4):
        for j in range(4):
            pij = ah[i] * bh[j]
            lo = pij & _MASK32
            hi = pij >> jnp.uint64(32)
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hi if cols[k + 1] is None else cols[k + 1] + hi
    return cols


def _mul_phi(h):
    """h (..., k limbs) × φ -> (..., k+2) limbs, exact.

    φ = 45·2^40 − 1, so h·φ = (h·45)·2^40 − h: one 6-bit-constant multiply
    per limb (stays in-lane, < 2^38) plus a 40-bit limb shift and a borrow
    chain — the generic 2-limb schoolbook this replaces cost 2k emulated
    u64 multiplies."""
    k = h.shape[-1]
    c45 = jnp.uint64(45)
    t, carry = _carry_sweep([h[..., i] * c45 for i in range(k)])
    t.append(carry)  # k+1 limbs of h·45 (top limb < 2^6)
    # (h·45) << 40: limb j = (t[j-1] << 8 | t[j-2] >> 24) & mask, j < k+2
    zero = jnp.zeros_like(h[..., 0])
    tt = [zero, zero] + t
    shifted = [
        ((tt[j + 1] << jnp.uint64(8)) | (tt[j] >> jnp.uint64(24))) & _MASK32
        for j in range(k + 2)]
    # subtract h (the "−1" of φ); no borrow out: h·45·2^40 ≥ h
    pad = jnp.zeros(h.shape[:-1] + (2,), dtype=jnp.uint64)
    out, _ = _sub_raw(jnp.stack(shifted, axis=-1),
                      jnp.concatenate([h, pad], axis=-1))
    return out


def _fold_256(cols8):
    """Column sums of a 256-bit product -> canonical 4-limb element."""
    limbs, _ = _carry_sweep(cols8)
    r = jnp.stack(limbs, axis=-1)  # (..., 8)
    lo, hi = r[..., :4], r[..., 4:]

    # fold 1: value = hi·2^128 + lo ≡ hi·φ + lo   (≤ 2^175)
    t = _mul_phi(hi)  # (..., 6)
    pad = jnp.zeros(t.shape[:-1] + (2,), dtype=jnp.uint64)
    t, carry = _add_raw(t, jnp.concatenate([lo, pad], axis=-1))
    # carry == 0: t < 2^175 + 2^128 < 2^176 ≤ 6 limbs

    # fold 2: t = h2·2^128 + l2, h2 < 2^47
    t2 = _mul_phi(t[..., 4:6])  # (..., 4); h2·φ < 2^93
    t2, carry = _add_raw(t2, t[..., :4])
    # carry ∈ {0,1}: wrapped value < 2^93, so adding φ cannot carry again
    phi = jnp.asarray(_int_to_limbs(PHI)).reshape(
        (1,) * (t2.ndim - 1) + (4,))
    t2_wrap, _ = _add_raw(t2, phi)
    t2 = jnp.where((carry != 0)[..., None], t2_wrap, t2)
    return _cond_sub_p(t2)


def f128_mul(a, b):
    return _fold_256(_mul_limbs_4x4(a, b))


def f128_mul_base(a, s):
    """Element array × base scalars with broadcast over the element axes:
    s has the same shape as a minus one non-limb axis."""
    if s.ndim == a.ndim - 1:
        s = s[..., None, :]
    return f128_mul(a, jnp.broadcast_to(s, a.shape))


def _squares(a, k: int):
    if k == 0:
        return a
    if k <= 2:
        for _ in range(k):
            a = f128_mul(a, a)
        return a
    return jax.lax.fori_loop(0, k, lambda _, v: f128_mul(v, v), a)


def f128_pow_const(a, e: int):
    """a ** e for a python-int exponent (square-and-multiply, squaring runs
    as fori_loops so traced programs stay O(log e) with small bodies)."""
    if e == 0:
        return jnp.broadcast_to(
            jnp.asarray(_int_to_limbs(1)).reshape((1,) * (a.ndim - 1) + (4,)),
            a.shape)
    bits = bin(e)[2:]
    result = a
    run = 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            result = f128_mul(_squares(result, run), a)
            run = 0
    if run:
        result = _squares(result, run)
    return result


_P_MINUS_2_BITS = np.array([((P - 2) >> i) & 1 for i in range(127, -1, -1)],
                           dtype=np.uint64)


def f128_inv(a):
    """a^(p−2) by left-to-right square-and-multiply; inv(0) = 0 by Fermat."""
    bits = jnp.asarray(_P_MINUS_2_BITS)
    one = jnp.broadcast_to(
        jnp.asarray(_int_to_limbs(1)).reshape((1,) * (a.ndim - 1) + (4,)),
        a.shape)

    def body(i, acc):
        acc = f128_mul(acc, acc)
        return jnp.where(bits[i] == 1, f128_mul(acc, a), acc)

    return jax.lax.fori_loop(0, 128, body, one)


_BATCH_INV_G = 128


def f128_batch_inv(a):
    """Montgomery batch inversion over limb arrays (..., 4): prefix/suffix
    product scans over blocks of 128 + one Fermat chain on block totals —
    ~6 multiplies/element instead of f128_inv's ~190. Value-identical to
    f128_inv for every input including zeros (masked to 1 for the scan)."""
    shape = a.shape
    flat = a.reshape(-1, NUM_LIMBS)
    n = flat.shape[0]
    if n < 2 * _BATCH_INV_G:
        return f128_inv(a)
    pad = (-n) % _BATCH_INV_G
    one_row = np.zeros((1, NUM_LIMBS), dtype=np.uint64)
    one_row[0, 0] = 1
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(jnp.asarray(one_row),
                                    (pad, NUM_LIMBS))])
    is_zero = jnp.all(flat == 0, axis=-1, keepdims=True)
    az = jnp.where(is_zero, jnp.asarray(one_row), flat)
    az = az.reshape(-1, _BATCH_INV_G, NUM_LIMBS)
    pref = jax.lax.associative_scan(f128_mul, az, axis=1)
    suff = jax.lax.associative_scan(f128_mul, az, axis=1, reverse=True)
    tinv = f128_batch_inv(pref[:, -1])
    ones_col = jnp.broadcast_to(jnp.asarray(one_row)[None],
                                (az.shape[0], 1, NUM_LIMBS))
    pprev = jnp.concatenate([ones_col, pref[:, :-1]], axis=1)
    snext = jnp.concatenate([suff[:, 1:], ones_col], axis=1)
    inv = f128_mul(f128_mul(pprev, snext),
                   jnp.broadcast_to(tinv[:, None], pprev.shape))
    inv = inv.reshape(-1, NUM_LIMBS)
    inv = jnp.where(is_zero, jnp.uint64(0), inv)
    if pad:
        inv = inv[:n]
    return inv.reshape(shape)


# ================================================================================
# Quadratic extension: arrays (..., d, 4), d in {1, 2}; x² = x + 1
# (math/src/field/f128/mod.rs:264-287)
# ================================================================================


def ext_add(a, b):
    return f128_add(a, b)


def ext_sub(a, b):
    return f128_sub(a, b)


def ext_mul(a, b):
    d = a.shape[-2]
    if d == 1:
        return f128_mul(a, b)
    a0, a1 = a[..., 0, :], a[..., 1, :]
    b0, b1 = b[..., 0, :], b[..., 1, :]
    t2 = f128_mul(a1, b1)
    c0 = f128_add(f128_mul(a0, b0), t2)
    c1 = f128_add(f128_add(f128_mul(a0, b1), f128_mul(a1, b0)), t2)
    return jnp.stack([c0, c1], axis=-2)


def ext_frobenius(a):
    """a^p for quad elements via the host-precomputed basis images."""
    from ..math.fields import Field

    d = a.shape[-2]
    if d == 1:
        return a
    images = Field(F128, 2)._frobenius_images()
    img = to_limbs_np(np.array([list(images[1])], dtype=object))[0]  # (2, 4)
    img_dev = jnp.asarray(img)
    a0, a1 = a[..., 0, :], a[..., 1, :]
    x0 = f128_mul(a1, jnp.broadcast_to(img_dev[0], a1.shape))
    x1 = f128_mul(a1, jnp.broadcast_to(img_dev[1], a1.shape))
    c0 = f128_add(a0, x0)
    return jnp.stack([c0, x1], axis=-2)


def ext_inv(a):
    d = a.shape[-2]
    if d == 1:
        return f128_inv(a)
    conj = ext_frobenius(a)
    norm = ext_mul(a, conj)[..., 0, :]  # lands in the base field
    ninv = f128_inv(norm)
    return f128_mul(conj, ninv[..., None, :])


def ext_batch_inv(a):
    """ext_inv with the norm inverted via f128_batch_inv (domain-sized
    arrays, e.g. the DEEP denominators)."""
    d = a.shape[-2]
    if d == 1:
        return f128_batch_inv(a)
    conj = ext_frobenius(a)
    norm = ext_mul(a, conj)[..., 0, :]
    ninv = f128_batch_inv(norm)
    return f128_mul(conj, ninv[..., None, :])


def ext_mul_base(a, s):
    """(..., d, 4) ext × (...,) base scalar limb array (..., 4)."""
    return f128_mul(a, s[..., None, :])


# ================================================================================
# Device-built power series and six-step middle twiddles
# ================================================================================


@partial(jax.jit, static_argnums=(2,))
def _build_powers_jit(jumps, scale, n: int):
    """[scale · s^k for k < n] by log-doubling from jumps[j] = s^(2^j)."""
    cap = 1 << max((n - 1).bit_length(), 0) if n > 1 else 1
    cur = scale[None, :]
    m, j = 1, 0
    while m < cap:
        nxt = f128_mul(cur, jnp.broadcast_to(jumps[j], cur.shape))
        cur = jnp.concatenate([cur, nxt])
        m *= 2
        j += 1
    return cur[:n]


@lru_cache(maxsize=None)
def _power_series_dev(s: int, n: int, scale: int = 1):
    """Device-resident (n, 4) power series [scale·s^k]; O(log n) scalars
    cross the host↔device link."""
    logn = max((n - 1).bit_length(), 1)
    jumps = np.empty((logn, 4), dtype=np.uint64)
    acc = s % P
    for j in range(logn):
        jumps[j] = _int_to_limbs(acc)
        acc = acc * acc % P
    with jax.ensure_compile_time_eval():
        return _build_powers_jit(jnp.asarray(jumps),
                                 jnp.asarray(_int_to_limbs(scale)), n)


@partial(jax.jit, static_argnums=(1,))
def _build_mid_tw_jit(ratio_rows, b: int):
    """(b, a, 4) middle twiddle matrix by row-doubling from stacked ratio
    rows ratio_rows[r] = [(w^(2^r))^j1 for j1 < a]."""
    a = ratio_rows.shape[1]
    one = np.zeros((1, a, 4), dtype=np.uint64)
    one[0, :, 0] = 1
    tw = jnp.asarray(one)
    m, r = 1, 0
    while m < b:
        nxt = f128_mul(tw, jnp.broadcast_to(ratio_rows[r][None], tw.shape))
        tw = jnp.concatenate([tw, nxt], axis=0)
        m *= 2
        r += 1
    return tw


@lru_cache(maxsize=None)
def _mid_twiddles_dev(n: int, a: int, inverse: bool):
    b = n // a
    root = F128.get_root_of_unity(n.bit_length() - 1)
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
# NTT (radix-2 DIT, natural order in/out, leading axis; trailing limb axis)
# ================================================================================


@lru_cache(maxsize=None)
def _bitrev_perm(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    perm = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for i in range(logn):
        rev = (rev << 1) | ((perm >> i) & 1)
    return rev


_SMALL_NTT = 1 << 12

# MXU leaf mode: decompose down to _MXU_LEAF-point DFTs computed as int8
# digit matmuls on the systolic array (ops/ntt_mxu.py) instead of unrolled
# radix-2 VPU butterflies. Measured on v5e (scripts/mxu_ntt_ab.py,
# 2026-08-19): 0.88-0.98x of the radix-2 path — the radix-2 NTT is already
# fast enough that digit recombination dominates, so this stays DEFAULT OFF
# (an available engine, not the production path). WINTER_MXU_NTT=1 enables.
import os as _os

_USE_MXU = _os.environ.get("WINTER_MXU_NTT", "0") not in ("", "0")
_MXU_LEAF = 1 << 7


def _mxu_enabled() -> bool:
    return _USE_MXU


@lru_cache(maxsize=None)
def ntt_plan(n: int, inverse: bool):
    """Pytree of device-resident constants, passed into jitted programs as a
    runtime argument: ("mxu", leaf_digit_matrix) for MXU leaves, None for
    radix-2 leaves, else (mid_twiddles, inner_plan, outer_plan)."""
    if _mxu_enabled() and n <= _MXU_LEAF:
        from . import ntt_mxu

        # a bare int8 array IS the leaf plan (strings can't cross jit)
        return ntt_mxu.leaf_matrix_dev(n, inverse)
    if not _mxu_enabled() and n <= _SMALL_NTT:
        return None
    if n <= 2:  # degenerate tiny transforms: radix-2 path
        return None
    logn = n.bit_length() - 1
    a = 1 << (logn // 2)
    b = n // a
    return (_mid_twiddles_dev(n, a, inverse), ntt_plan(b, inverse),
            ntt_plan(a, inverse))


@lru_cache(maxsize=None)
def _stage_twiddles_small(n: int, inverse: bool):
    root = F128.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    stages = []
    m = 2
    while m <= n:
        w_m = pow(root, n // m, P)
        half = m // 2
        tw = np.empty(half, dtype=object)
        acc = 1
        for j in range(half):
            tw[j] = acc
            acc = acc * w_m % P
        stages.append(to_limbs_np(tw))
        m *= 2
    return tuple(stages)


def _ntt_small(x, n: int, inverse: bool):
    """Unrolled radix-2 DIT with constant per-stage twiddles. x: (n, ..., 4)."""
    rest = x.shape[1:-1]
    x = x[jnp.asarray(_bitrev_perm(n))]
    for tw_np in _stage_twiddles_small(n, inverse):
        half = tw_np.shape[0]
        mm = 2 * half
        tw = jnp.asarray(tw_np).reshape((1, half) + (1,) * len(rest) + (4,))
        blk = x.reshape((n // mm, 2, half) + rest + (4,))
        u = blk[:, 0]
        v = f128_mul(blk[:, 1], jnp.broadcast_to(tw, blk[:, 1].shape))
        x = jnp.concatenate([f128_add(u, v), f128_sub(u, v)], axis=1)
        x = x.reshape((n,) + rest + (4,))
    return x


def _ntt_core(x, n: int, inverse: bool, plan):
    """x: (n, ..., 4) -> NTT/iNTT without the 1/n scale (six-step above the
    leaf size — the same distributed-NTT structure as ops.goldilocks; leaves
    run as MXU digit matmuls when enabled, radix-2 butterflies otherwise)."""
    if n == 1:
        return x
    if plan is not None and not isinstance(plan, tuple):
        # an int8 digit matrix = MXU leaf plan (see ntt_plan)
        from . import ntt_mxu

        return ntt_mxu._leaf_dft_jit(
            x.reshape(n, -1, NUM_LIMBS), plan, n).reshape(x.shape)
    if plan is None and n <= _SMALL_NTT:
        return _ntt_small(x, n, inverse)

    mid_tw, inner_plan, outer_plan = plan
    rest = x.shape[1:-1]
    b, a = mid_tw.shape[0], mid_tw.shape[1]

    m = x.reshape((b, a) + rest + (4,))
    y = _ntt_core(m, b, inverse, inner_plan)
    tw = mid_tw.reshape((b, a) + (1,) * len(rest) + (4,))
    y = f128_mul(y, jnp.broadcast_to(tw, y.shape))

    z = jnp.swapaxes(y, 0, 1)
    out = _ntt_core(z, a, inverse, outer_plan)
    return out.reshape((n,) + rest + (4,))


# ---- traceable bodies + public jitted wrappers --------------------------------


def ntt_evaluate_body(coeffs, plan, n: int):
    return _ntt_core(coeffs, n, inverse=False, plan=plan)


def ntt_interpolate_body(evals, plan, n: int):
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan)
    inv_n = jnp.asarray(_int_to_limbs(pow(n, P - 2, P)))
    return f128_mul(coeffs, jnp.broadcast_to(inv_n, coeffs.shape))


def ntt_lde_body(coeffs, off_pows, plan, n: int, blowup: int):
    """Coset LDE: scale by offset powers (device argument), zero-pad, one
    big NTT (value-identical to math.ntt.evaluate_poly_with_offset)."""
    big_n = n * blowup
    rest = coeffs.shape[1:-1]
    pows = off_pows.reshape((n,) + (1,) * len(rest) + (4,))
    scaled = f128_mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))
    padded = jnp.concatenate(
        [scaled,
         jnp.zeros((big_n - n,) + coeffs.shape[1:], dtype=jnp.uint64)], axis=0)
    return _ntt_core(padded, big_n, inverse=False, plan=plan)


def ntt_interp_offset_body(evals, inv_off_pows, plan, n: int):
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan)
    rest = coeffs.shape[1:-1]
    pows = inv_off_pows.reshape((n,) + (1,) * len(rest) + (4,))
    return f128_mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))


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
    return _ntt_lde_jit(coeffs, _power_series_dev(offset % P, n),
                        ntt_plan(n * blowup, False), n, blowup)


@partial(jax.jit, static_argnums=(3,))
def _ntt_interp_offset_jit(evals, inv_off_pows, plan, n: int):
    return ntt_interp_offset_body(evals, inv_off_pows, plan, n)


def interp_offset_powers(n: int, offset: int):
    """(n, 4) device series (1/n)·offset^-k."""
    inv_offset = pow(offset % P, P - 2, P)
    inv_n = pow(n, P - 2, P)
    return _power_series_dev(inv_offset, n, inv_n)


def ntt_interpolate_with_offset(evals, n: int, offset: int):
    return _ntt_interp_offset_jit(evals, interp_offset_powers(n, offset),
                                  ntt_plan(n, True), n)


# ================================================================================
# FRI folding (apply_drp — fri/src/folding/mod.rs:86-118, f128 device version)
# ================================================================================


def fri_fold_body(evaluations, inv_off_pows, alpha, n_fold: int):
    """evaluations (n, d, 4), alpha (d, 4) → folded (n/N, d, 4)."""
    n, d = evaluations.shape[0], evaluations.shape[1]
    rows = n // n_fold
    transposed = evaluations.reshape(n_fold, rows, d, 4)

    coeffs = _ntt_core(transposed, n_fold, inverse=True, plan=None)
    inv_nf = jnp.asarray(_int_to_limbs(pow(n_fold, P - 2, P)))
    coeffs = f128_mul(coeffs, jnp.broadcast_to(inv_nf, coeffs.shape))

    result = jnp.zeros((rows, d, 4), dtype=jnp.uint64)
    alpha_b = jnp.broadcast_to(alpha[None], (rows, d, 4))
    scaled = [f128_mul(coeffs[k],
                       jnp.broadcast_to(inv_off_pows[k][:, None, :],
                                        (rows, d, 4)))
              for k in range(n_fold)]
    for k in range(n_fold - 1, -1, -1):
        result = ext_add(ext_mul(result, alpha_b), scaled[k])
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
    one = np.zeros(inv_offsets.shape, dtype=np.uint64)
    one[..., 0] = 1
    rows = [jnp.asarray(one)]
    acc = inv_offsets
    for _ in range(1, n_fold):
        rows.append(acc)
        acc = f128_mul(acc, inv_offsets)
    return jnp.stack(rows)


@lru_cache(maxsize=None)
def fri_inv_offset_powers(n: int, n_fold: int, domain_offset: int):
    """(N, rows, 4) device matrix of ((offset·g^i)^-1)^k."""
    rows = n // n_fold
    g = F128.get_root_of_unity(n.bit_length() - 1)
    inv_offsets = _power_series_dev(pow(g, P - 2, P), rows,
                                    pow(domain_offset % P, P - 2, P))
    with jax.ensure_compile_time_eval():
        return _fri_pow_rows_jit(inv_offsets, n_fold)


# ================================================================================
# Neutral engine aliases — the shared limb-engine interface (ops/f62.py twin)
# ================================================================================

base_add = f128_add
base_sub = f128_sub
base_neg = f128_neg
base_mul = f128_mul
base_mul_base = f128_mul_base
base_pow_const = f128_pow_const
base_inv = f128_inv
