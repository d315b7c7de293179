"""f62 field arithmetic and NTT on JAX/XLA — the TPU engine for the
reference's 62-bit field (math/src/field/f62/mod.rs: p = 2^62 − 111·2^39 + 1,
TWO_ADICITY = 39, GENERATOR = 3, quad extension x² − x − 1, cubic extension
x³ + 2x + 2).

Design (TPU-first, the same shape as the f128 engine in ops/f128.py):

- Elements are uint64 arrays with a trailing LIMB axis of 2, each limb a
  32-bit little-endian digit (the TPU has no 64-bit integer units; 32-bit
  limbs make every partial product exact u32×u32 → u64 on the VPU).
- Multiplication is a 2×2 schoolbook into 4 columns of 32-bit half-products,
  one carry sweep, then reduction by repeated folding with
  2^62 ≡ 111·2^39 − 1 =: E (mod p): h·E = (h·111) << 39 − h, so each fold
  costs one small-constant multiply, a bit-shift and a subtract. Four folds
  take the 124-bit product below 2p; one conditional subtract canonicalizes.
  The reference instead keeps f62 in Montgomery form (f62/mod.rs mont_red);
  we stay canonical — Montgomery's R-factors never reach proof bytes, and
  canonical limbs serialize straight into the BLAKE3/SHA3 word hashers.
- The NTT / power-series / FRI-fold layers mirror ops/f128.py exactly
  (radix-2 DIT below _SMALL_NTT, six-step above, all domain-sized constants
  device-built and passed as runtime arguments — never embedded).

The exact oracle is winterfell_tpu.math (object-dtype Python ints); public
ops are pinned against it in tests/test_f62_jax.py.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ..math.fields import F62

P = F62.p
E = (111 << 39) - 1  # 2^62 mod p
_MASK32 = jnp.uint64(0xFFFFFFFF)
_MASK30 = jnp.uint64(0x3FFFFFFF)
_P_LIMBS_NP = np.array(
    [(P >> (32 * k)) & 0xFFFFFFFF for k in range(2)], dtype=np.uint64)

NUM_LIMBS = 2


# ================================================================================
# Host <-> device limb conversion
# ================================================================================


def to_limbs_np(arr_obj: np.ndarray) -> np.ndarray:
    """Object array of ints -> uint64 limb array with trailing axis 2.

    One object-array astype pass (f62 values fit u64) + native u32 split —
    far faster than a per-element Python loop."""
    v = arr_obj.astype(np.uint64)
    out = np.empty(arr_obj.shape + (NUM_LIMBS,), dtype=np.uint64)
    out[..., 0] = v & np.uint64(0xFFFFFFFF)
    out[..., 1] = v >> np.uint64(32)
    return out


def to_device(arr_obj: np.ndarray):
    return jnp.asarray(to_limbs_np(arr_obj))


def from_limbs_np(limbs: np.ndarray) -> np.ndarray:
    """uint64 limb array (..., 2) -> object array of Python ints."""
    limbs = np.asarray(limbs)
    out = np.zeros(limbs.shape[:-1], dtype=object)
    for k in range(NUM_LIMBS):
        out = out + (limbs[..., k].astype(object) << (32 * k))
    return out


def to_host(arr) -> np.ndarray:
    return from_limbs_np(np.asarray(arr))


def _int_to_limbs(v: int) -> np.ndarray:
    v = int(v) % P
    return np.array([v & 0xFFFFFFFF, (v >> 32) & 0xFFFFFFFF], dtype=np.uint64)


def scalar(v: int):
    """Device (2,) limb vector for a host int."""
    return jnp.asarray(_int_to_limbs(v))


# ================================================================================
# Base arithmetic (trailing axis = 2 limbs, values < 2^32 in u64 lanes)
# ================================================================================


def _carry_sweep(cols):
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & _MASK32)
        carry = t >> jnp.uint64(32)
    return out, carry


def _sub_raw(a, b):
    """a − b limbwise -> (limbs, borrow_out in {0,1})."""
    n = a.shape[-1]
    out = []
    borrow = jnp.zeros_like(a[..., 0])
    for k in range(n):
        t = a[..., k] - b[..., k] - borrow
        out.append(t & _MASK32)
        borrow = t >> jnp.uint64(63)
    return jnp.stack(out, axis=-1), borrow


def _p_like(a):
    return jnp.asarray(_P_LIMBS_NP).reshape((1,) * (a.ndim - 1) + (2,))


def _cond_sub_p(a):
    """a < 2p: subtract p once if a ≥ p."""
    diff, borrow = _sub_raw(a, _p_like(a))
    return jnp.where((borrow == 0)[..., None], diff, a)


def base_add(a, b):
    # a + b < 2^63: limb sums never carry out of limb 1 (both < 2^30)
    s0 = a[..., 0] + b[..., 0]
    s1 = a[..., 1] + b[..., 1] + (s0 >> jnp.uint64(32))
    s = jnp.stack([s0 & _MASK32, s1], axis=-1)
    return _cond_sub_p(s)


def base_sub(a, b):
    d, borrow = _sub_raw(a, b)
    d_wrap0 = d[..., 0] + _P_LIMBS_NP[0]
    d_wrap1 = d[..., 1] + jnp.uint64(int(_P_LIMBS_NP[1])) + (
        d_wrap0 >> jnp.uint64(32))
    d_wrap = jnp.stack([d_wrap0 & _MASK32, d_wrap1 & _MASK32], axis=-1)
    return jnp.where((borrow != 0)[..., None], d_wrap, d)


def base_neg(a):
    z = jnp.zeros_like(a)
    return jnp.where(
        jnp.all(a == 0, axis=-1, keepdims=True), z, _sub_raw(_p_like(a), a)[0])


def _fold62(x5):
    """One reduction fold at a fixed 5-limb working width:
    x ≡ (x >> 62)·E + (x mod 2^62), with h·E = (h·111) << 39 − h."""
    xs = [x5[..., k] for k in range(5)]
    lo0, lo1 = xs[0], xs[1] & _MASK30
    # h = x >> 62 (4 limbs suffice: x < 2^124 → h < 2^62)
    h = []
    for j in range(4):
        cur = xs[j + 1] >> jnp.uint64(30)
        nxt = (xs[j + 2] << jnp.uint64(2)) & _MASK32 if j + 2 < 5 else None
        h.append(cur | nxt if nxt is not None else cur)
    # y = h·111 (5 limbs; per-limb products < 2^39, no overflow)
    c111 = jnp.uint64(111)
    ycols = [h[0] * c111]
    for j in range(1, 4):
        ycols.append(h[j] * c111)
    ycols.append(jnp.zeros_like(h[0]))
    y, _ = _carry_sweep(ycols)
    # z = y << 39 = (y << 32) << 7, then h·E = z − h, then + lo
    zcols = [jnp.zeros_like(y[0])]
    prev = jnp.zeros_like(y[0])
    for j in range(4):
        zcols.append(((y[j] << jnp.uint64(7)) | (prev >> jnp.uint64(25)))
                     & _MASK32)
        prev = y[j]
    z = jnp.stack(zcols, axis=-1)
    h_pad = jnp.stack(h + [jnp.zeros_like(h[0])], axis=-1)
    t, _ = _sub_raw(z, h_pad)  # exact: z = h·(E+1) ≥ h
    cols = [t[..., 0] + lo0, t[..., 1] + lo1] + [t[..., k] for k in range(2, 5)]
    out, _ = _carry_sweep(cols)
    return jnp.stack(out, axis=-1)


def base_mul(a, b):
    """Canonical (a·b) mod p via 2×2 schoolbook + four E-folds."""
    a0, a1 = a[..., 0], a[..., 1]
    b0, b1 = b[..., 0], b[..., 1]
    p00, p01 = a0 * b0, a0 * b1
    p10, p11 = a1 * b0, a1 * b1
    cols = [
        p00 & _MASK32,
        (p00 >> jnp.uint64(32)) + (p01 & _MASK32) + (p10 & _MASK32),
        (p01 >> jnp.uint64(32)) + (p10 >> jnp.uint64(32)) + (p11 & _MASK32),
        p11 >> jnp.uint64(32),
    ]
    x, _ = _carry_sweep(cols)
    x5 = jnp.stack(x + [jnp.zeros_like(x[0])], axis=-1)
    # bit-width trajectory: 124 → 109 → 93 → 77 → 62.5; then < 2p
    for _ in range(4):
        x5 = _fold62(x5)
    return _cond_sub_p(x5[..., :2])


def base_mul_base(a, s):
    """Element array × base scalars with broadcast over the element axes."""
    if s.ndim == a.ndim - 1:
        s = s[..., None, :]
    return base_mul(a, jnp.broadcast_to(s, a.shape))


def _squares(a, k: int):
    if k == 0:
        return a
    if k <= 2:
        for _ in range(k):
            a = base_mul(a, a)
        return a
    return jax.lax.fori_loop(0, k, lambda _, v: base_mul(v, v), a)


def base_pow_const(a, e: int):
    """a ** e for a python-int exponent (square-and-multiply with fori_loop
    squaring runs — traced programs stay O(log e) with small bodies)."""
    if e == 0:
        return jnp.broadcast_to(
            jnp.asarray(_int_to_limbs(1)).reshape((1,) * (a.ndim - 1) + (2,)),
            a.shape)
    bits = bin(e)[2:]
    result = a
    run = 0
    for bit in bits[1:]:
        run += 1
        if bit == "1":
            result = base_mul(_squares(result, run), a)
            run = 0
    if run:
        result = _squares(result, run)
    return result


_P_MINUS_2_BITS = np.array([((P - 2) >> i) & 1 for i in range(61, -1, -1)],
                           dtype=np.uint64)


def base_inv(a):
    """a^(p−2) by left-to-right square-and-multiply; inv(0) = 0 by Fermat."""
    bits = jnp.asarray(_P_MINUS_2_BITS)
    one = jnp.broadcast_to(
        jnp.asarray(_int_to_limbs(1)).reshape((1,) * (a.ndim - 1) + (2,)),
        a.shape)

    def body(i, acc):
        acc = base_mul(acc, acc)
        return jnp.where(bits[i] == 1, base_mul(acc, a), acc)

    return jax.lax.fori_loop(0, 62, body, one)


# ================================================================================
# Extensions: arrays (..., d, 2), d in {1, 2, 3}
# quad x² = x + 1 (f62/mod.rs QuadExtension), cubic x³ = −2 − 2x (CubeExtension)
# ================================================================================


def ext_add(a, b):
    return base_add(a, b)


def ext_sub(a, b):
    return base_sub(a, b)


def ext_mul(a, b):
    d = a.shape[-2]
    if d == 1:
        return base_mul(a, b)
    if d == 2:
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        t2 = base_mul(a1, b1)
        c0 = base_add(base_mul(a0, b0), t2)
        c1 = base_add(base_add(base_mul(a0, b1), base_mul(a1, b0)), t2)
        return jnp.stack([c0, c1], axis=-2)
    a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    t0 = base_mul(a0, b0)
    t1 = base_add(base_mul(a0, b1), base_mul(a1, b0))
    t2 = base_add(base_add(base_mul(a0, b2), base_mul(a1, b1)),
                  base_mul(a2, b0))
    t3 = base_add(base_mul(a1, b2), base_mul(a2, b1))
    t4 = base_mul(a2, b2)
    # x³ = −2 − 2x, x⁴ = −2x − 2x²
    c0 = base_sub(t0, base_add(t3, t3))
    c1 = base_sub(t1, base_add(base_add(t3, t3), base_add(t4, t4)))
    c2 = base_sub(t2, base_add(t4, t4))
    return jnp.stack([c0, c1, c2], axis=-2)


@lru_cache(maxsize=None)
def _frobenius_consts(d: int) -> np.ndarray:
    """(d, d, 2) limb matrix F with frob(a)_j = Σ_i a_i · F[i, j]."""
    from ..math.fields import Field

    field = Field(F62, d)
    images = field._frobenius_images()
    out = np.zeros((d, d), dtype=object)
    for i in range(d):
        for j in range(d):
            out[i, j] = images[i][j]
    return to_limbs_np(out)


def ext_frobenius(a):
    d = a.shape[-2]
    if d == 1:
        return a
    fr = jnp.asarray(_frobenius_consts(d))  # (d, d, 2)
    acc = None
    for i in range(d):
        term = base_mul(
            jnp.broadcast_to(a[..., i : i + 1, :], a.shape[:-2] + (d, 2)),
            jnp.broadcast_to(fr[i], a.shape[:-2] + (d, 2)))
        acc = term if acc is None else base_add(acc, term)
    return acc


def ext_inv(a):
    d = a.shape[-2]
    if d == 1:
        return base_inv(a)
    conj = ext_frobenius(a)
    if d == 3:
        conj = ext_mul(conj, ext_frobenius(conj))
    norm = ext_mul(a, conj)[..., 0, :]  # lands in the base field
    ninv = base_inv(norm)
    return base_mul(conj, ninv[..., None, :])


_BATCH_INV_G = 128


def base_batch_inv(a):
    """Montgomery batch inversion over (..., 2) limb arrays — scan-based,
    ~6 muls/element vs base_inv's ~90; value-identical incl. zeros (see
    ops/f128.py:f128_batch_inv)."""
    shape = a.shape
    flat = a.reshape(-1, NUM_LIMBS)
    n = flat.shape[0]
    if n < 2 * _BATCH_INV_G:
        return base_inv(a)
    pad = (-n) % _BATCH_INV_G
    one_row = np.zeros((1, NUM_LIMBS), dtype=np.uint64)
    one_row[0, 0] = 1
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(jnp.asarray(one_row), (pad, NUM_LIMBS))])
    is_zero = jnp.all(flat == 0, axis=-1, keepdims=True)
    az = jnp.where(is_zero, jnp.asarray(one_row), flat)
    az = az.reshape(-1, _BATCH_INV_G, NUM_LIMBS)
    pref = jax.lax.associative_scan(base_mul, az, axis=1)
    suff = jax.lax.associative_scan(base_mul, az, axis=1, reverse=True)
    tinv = base_batch_inv(pref[:, -1])
    ones_col = jnp.broadcast_to(jnp.asarray(one_row)[None],
                                (az.shape[0], 1, NUM_LIMBS))
    pprev = jnp.concatenate([ones_col, pref[:, :-1]], axis=1)
    snext = jnp.concatenate([suff[:, 1:], ones_col], axis=1)
    inv = base_mul(base_mul(pprev, snext),
                   jnp.broadcast_to(tinv[:, None], pprev.shape))
    inv = inv.reshape(-1, NUM_LIMBS)
    inv = jnp.where(is_zero, jnp.uint64(0), inv)
    if pad:
        inv = inv[:n]
    return inv.reshape(shape)


def ext_batch_inv(a):
    """ext_inv with the norm inverted via base_batch_inv."""
    d = a.shape[-2]
    if d == 1:
        return base_batch_inv(a)
    conj = ext_frobenius(a)
    if d == 3:
        conj = ext_mul(conj, ext_frobenius(conj))
    norm = ext_mul(a, conj)[..., 0, :]
    return base_mul(conj, base_batch_inv(norm)[..., None, :])


def ext_mul_base(a, s):
    """(..., d, 2) ext × base scalar limb array (..., 2)."""
    return base_mul(a, s[..., None, :])


# ================================================================================
# Device-built power series and six-step middle twiddles (ops/f128.py mirror)
# ================================================================================


@partial(jax.jit, static_argnums=(2,))
def _build_powers_jit(jumps, scale, n: int):
    """[scale · s^k for k < n] by log-doubling from jumps[j] = s^(2^j)."""
    cap = 1 << max((n - 1).bit_length(), 0) if n > 1 else 1
    cur = scale[None, :]
    m, j = 1, 0
    while m < cap:
        nxt = base_mul(cur, jnp.broadcast_to(jumps[j], cur.shape))
        cur = jnp.concatenate([cur, nxt])
        m *= 2
        j += 1
    return cur[:n]


@lru_cache(maxsize=None)
def _power_series_dev(s: int, n: int, scale: int = 1):
    """Device-resident (n, 2) power series [scale·s^k]; O(log n) scalars
    cross the host↔device link."""
    logn = max((n - 1).bit_length(), 1)
    jumps = np.empty((logn, 2), dtype=np.uint64)
    acc = s % P
    for j in range(logn):
        jumps[j] = _int_to_limbs(acc)
        acc = acc * acc % P
    with jax.ensure_compile_time_eval():
        return _build_powers_jit(jnp.asarray(jumps),
                                 jnp.asarray(_int_to_limbs(scale)), n)


@partial(jax.jit, static_argnums=(1,))
def _build_mid_tw_jit(ratio_rows, b: int):
    a = ratio_rows.shape[1]
    one = np.zeros((1, a, 2), dtype=np.uint64)
    one[0, :, 0] = 1
    tw = jnp.asarray(one)
    m, r = 1, 0
    while m < b:
        nxt = base_mul(tw, jnp.broadcast_to(ratio_rows[r][None], tw.shape))
        tw = jnp.concatenate([tw, nxt], axis=0)
        m *= 2
        r += 1
    return tw


@lru_cache(maxsize=None)
def _mid_twiddles_dev(n: int, a: int, inverse: bool):
    b = n // a
    root = F62.get_root_of_unity(n.bit_length() - 1)
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


@lru_cache(maxsize=None)
def ntt_plan(n: int, inverse: bool):
    """None for small sizes, else (mid_twiddles, inner_plan, outer_plan) —
    passed into jitted programs as a runtime argument."""
    if n <= _SMALL_NTT:
        return None
    logn = n.bit_length() - 1
    a = 1 << (logn // 2)
    b = n // a
    return (_mid_twiddles_dev(n, a, inverse), ntt_plan(b, inverse),
            ntt_plan(a, inverse))


@lru_cache(maxsize=None)
def _stage_twiddles_small(n: int, inverse: bool):
    root = F62.get_root_of_unity(n.bit_length() - 1)
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
    """Unrolled radix-2 DIT with constant per-stage twiddles. x: (n, ..., 2)."""
    rest = x.shape[1:-1]
    x = x[jnp.asarray(_bitrev_perm(n))]
    for tw_np in _stage_twiddles_small(n, inverse):
        half = tw_np.shape[0]
        mm = 2 * half
        tw = jnp.asarray(tw_np).reshape((1, half) + (1,) * len(rest) + (2,))
        blk = x.reshape((n // mm, 2, half) + rest + (2,))
        u = blk[:, 0]
        v = base_mul(blk[:, 1], jnp.broadcast_to(tw, blk[:, 1].shape))
        x = jnp.concatenate([base_add(u, v), base_sub(u, v)], axis=1)
        x = x.reshape((n,) + rest + (2,))
    return x


def _ntt_core(x, n: int, inverse: bool, plan):
    """x: (n, ..., 2) -> NTT/iNTT without the 1/n scale (six-step above
    _SMALL_NTT)."""
    if n == 1:
        return x
    if n <= _SMALL_NTT:
        return _ntt_small(x, n, inverse)

    mid_tw, inner_plan, outer_plan = plan
    rest = x.shape[1:-1]
    b, a = mid_tw.shape[0], mid_tw.shape[1]

    m = x.reshape((b, a) + rest + (2,))
    y = _ntt_core(m, b, inverse, inner_plan)
    tw = mid_tw.reshape((b, a) + (1,) * len(rest) + (2,))
    y = base_mul(y, jnp.broadcast_to(tw, y.shape))

    z = jnp.swapaxes(y, 0, 1)
    out = _ntt_core(z, a, inverse, outer_plan)
    return out.reshape((n,) + rest + (2,))


# ---- traceable bodies + public jitted wrappers --------------------------------


def ntt_evaluate_body(coeffs, plan, n: int):
    return _ntt_core(coeffs, n, inverse=False, plan=plan)


def ntt_interpolate_body(evals, plan, n: int):
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan)
    inv_n = jnp.asarray(_int_to_limbs(pow(n, P - 2, P)))
    return base_mul(coeffs, jnp.broadcast_to(inv_n, coeffs.shape))


def ntt_lde_body(coeffs, off_pows, plan, n: int, blowup: int):
    """Coset LDE: scale by offset powers (device argument), zero-pad, one
    big NTT (value-identical to math.ntt.evaluate_poly_with_offset)."""
    big_n = n * blowup
    rest = coeffs.shape[1:-1]
    pows = off_pows.reshape((n,) + (1,) * len(rest) + (2,))
    scaled = base_mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))
    padded = jnp.concatenate(
        [scaled,
         jnp.zeros((big_n - n,) + coeffs.shape[1:], dtype=jnp.uint64)], axis=0)
    return _ntt_core(padded, big_n, inverse=False, plan=plan)


def ntt_interp_offset_body(evals, inv_off_pows, plan, n: int):
    coeffs = _ntt_core(evals, n, inverse=True, plan=plan)
    rest = coeffs.shape[1:-1]
    pows = inv_off_pows.reshape((n,) + (1,) * len(rest) + (2,))
    return base_mul(coeffs, jnp.broadcast_to(pows, coeffs.shape))


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
    """(n, 2) device series (1/n)·offset^-k."""
    inv_offset = pow(offset % P, P - 2, P)
    inv_n = pow(n, P - 2, P)
    return _power_series_dev(inv_offset, n, inv_n)


def ntt_interpolate_with_offset(evals, n: int, offset: int):
    return _ntt_interp_offset_jit(evals, interp_offset_powers(n, offset),
                                  ntt_plan(n, True), n)


# ================================================================================
# FRI folding (apply_drp — fri/src/folding/mod.rs:86-118, f62 device version)
# ================================================================================


def fri_fold_body(evaluations, inv_off_pows, alpha, n_fold: int):
    """evaluations (n, d, 2), alpha (d, 2) → folded (n/N, d, 2)."""
    n, d = evaluations.shape[0], evaluations.shape[1]
    rows = n // n_fold
    transposed = evaluations.reshape(n_fold, rows, d, 2)

    coeffs = _ntt_core(transposed, n_fold, inverse=True, plan=None)
    inv_nf = jnp.asarray(_int_to_limbs(pow(n_fold, P - 2, P)))
    coeffs = base_mul(coeffs, jnp.broadcast_to(inv_nf, coeffs.shape))

    result = jnp.zeros((rows, d, 2), dtype=jnp.uint64)
    alpha_b = jnp.broadcast_to(alpha[None], (rows, d, 2))
    scaled = [base_mul(coeffs[k],
                       jnp.broadcast_to(inv_off_pows[k][:, None, :],
                                        (rows, d, 2)))
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
        acc = base_mul(acc, inv_offsets)
    return jnp.stack(rows)


@lru_cache(maxsize=None)
def fri_inv_offset_powers(n: int, n_fold: int, domain_offset: int):
    """(N, rows, 2) device matrix of ((offset·g^i)^-1)^k."""
    rows = n // n_fold
    g = F62.get_root_of_unity(n.bit_length() - 1)
    inv_offsets = _power_series_dev(pow(g, P - 2, P), rows,
                                    pow(domain_offset % P, P - 2, P))
    with jax.ensure_compile_time_eval():
        return _fri_pow_rows_jit(inv_offsets, n_fold)
