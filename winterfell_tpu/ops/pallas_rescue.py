"""Pallas TPU kernels for Rescue-Prime (Rp64_256) row hashing.

The jnp path (ops.goldilocks.rp64_hash_rows) leans on XLA's generic uint64
emulation and materializes every op's result between fusions; these kernels
keep the whole sponge — absorb, 7 rounds of S-box / frequency-domain MDS /
round constants, squeeze — resident in VMEM per row block, with field
elements as explicit (lo, hi) uint32 limb planes and 16-bit half-word
products on the VPU (Mosaic has no 64-bit integers, which is the point:
the limb schedule is hand-written instead of emulated).

Layout: rows arrive transposed as (k, 8, m/8) u32 limb planes — lane j of
the Rescue state is a full native (8 sublanes, m/8 lanes) tile, so both the
stacked S-box chains and the per-lane MDS ops run at 100% VPU occupancy;
the grid walks the last dim in blocks. Values between ops inside the
permutation are lazy (< 2^64, ≡ mod p) with one canonical fix per
permutation, and squarings (62 of 76 muls per round) use a 3-wide-mul
square.
The per-round math mirrors the reference permutation exactly
(crypto/src/hash/rescue/rp64_256/mod.rs:299-319, mds_f64_12x12.rs) and the
jnp implementation is the oracle (tests/test_pallas_rescue.py pins both).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.compile_cache import stabilize_pallas_cache_keys

# Pallas cache keys must not depend on caller line numbers (see utils/compile_cache.py)
stabilize_pallas_cache_keys()

from ..crypto.rescue_constants import RP64_256_ARK1, RP64_256_ARK2
from ..math.fields import GOLDILOCKS_P

P = GOLDILOCKS_P
_NUM_ROUNDS = 7
_RATE_START = 4
_RATE_WIDTH = 8

_LANE_BLOCK = 512  # lanes per grid step (8·512 = 4096 rows); VMEM use ~4 MB

# fori_loop over the 7 rounds with the ARK constants in SMEM instead of 7
# unrolled rounds with literal constants: ~7x less VLIW code per kernel
# (the unrolled hash kernels serialize to ~40 MB executables whose loads
# dominate warm start on the remote tunnel, and whose code streams from
# HBM every grid step). WINTER_PALLAS_LOOP=0 forces the unrolled form.
import os as _os

_LOOP_MODE = _os.environ.get("WINTER_PALLAS_LOOP", "1") not in ("", "0")


def _u32(v):
    return jnp.uint32(v)


# ---- u32-pair primitives (values are (lo, hi) two-limb little-endian) ------


def _addc(a, b):
    s = a + b
    return jnp.where(s < a, _u32(1), _u32(0)), s


def _subb(a, b):
    d = a - b
    return jnp.where(a < b, _u32(1), _u32(0)), d


def _mul32_wide(a, b):
    """u32 × u32 → (hi, lo) via 16-bit half-words (VPU-native)."""
    a0 = a & _u32(0xFFFF)
    a1 = a >> _u32(16)
    b0 = b & _u32(0xFFFF)
    b1 = b >> _u32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p01 & _u32(0xFFFF)) + (p10 & _u32(0xFFFF)) + (p00 >> _u32(16))
    lo = (p00 & _u32(0xFFFF)) | (mid << _u32(16))
    hi = p11 + (p01 >> _u32(16)) + (p10 >> _u32(16)) + (mid >> _u32(16))
    return hi, lo


def _canon(pair):
    """u64 pair (< 2·p) → canonical (< p): one conditional subtract of p."""
    lo, hi = pair
    ge_p = (hi == _u32(0xFFFFFFFF)) & (lo >= _u32(1))
    bp, s0 = _subb(lo, _u32(1))
    s1 = hi - _u32(0xFFFFFFFF) - bp
    return jnp.where(ge_p, s0, lo), jnp.where(ge_p, s1, hi)


def _gl_reduce_limbs(n0, n1, n2, n3, lazy=False):
    """(n0..n3 little-endian u32 limbs of a 128-bit value) mod p.

    Goldilocks identities 2^64 ≡ 2^32 − 1 and 2^96 ≡ −1 (mod p):
    x ≡ (n0 + n1·2^32) + n2·(2^32 − 1) − n3. With ``lazy`` the result may
    be in [p, 2^64): still ≡ x (mod p) and a valid input to every pair op
    here, so chains skip the canonical fix until _canon at the end."""
    bl, r0 = _subb(n0, n3)
    under = jnp.where(n1 < bl, _u32(1), _u32(0))
    r1 = n1 - bl
    cfix, r0 = _addc(r0, under)
    r1 = r1 + jnp.where(under == 1, _u32(0xFFFFFFFF), _u32(0)) + cfix

    b2, r0 = _subb(r0, n2)
    c3, r1 = _addc(r1, n2 - b2)
    over = jnp.where(n2 >= b2, c3, _u32(0))
    u2, r1 = _subb(r1, jnp.where(n2 < b2, _u32(1) - c3, _u32(0)))
    cf, r0 = _addc(r0, jnp.where(over == 1, _u32(0xFFFFFFFF), _u32(0)))
    r1 = r1 + cf

    if lazy:
        return r0, r1
    return _canon((r0, r1))


def _gl_mul(a, b, lazy=False):
    """Goldilocks multiply on pairs a = (lo, hi), b = (lo, hi); any u64
    inputs (canonical not required)."""
    a_lo, a_hi = a
    b_lo, b_hi = b
    h00, l00 = _mul32_wide(a_lo, b_lo)
    h01, l01 = _mul32_wide(a_lo, b_hi)
    h10, l10 = _mul32_wide(a_hi, b_lo)
    h11, l11 = _mul32_wide(a_hi, b_hi)
    n0 = l00
    c1a, n1 = _addc(h00, l01)
    c1b, n1 = _addc(n1, l10)
    c2a, n2 = _addc(h01, h10)
    c2b, n2 = _addc(n2, l11)
    n2c, n2 = _addc(n2, c1a + c1b)
    n3 = h11 + c2a + c2b + n2c
    return _gl_reduce_limbs(n0, n1, n2, n3, lazy=lazy)


def _gl_sqr(a, lazy=False):
    """Goldilocks square: 3 wide muls instead of 4 (the cross product is
    computed once and doubled). 62 of the 76 muls in a Rescue round are
    squarings (the inv-S-box 72-mul chain is mostly _squares runs)."""
    a_lo, a_hi = a
    h00, l00 = _mul32_wide(a_lo, a_lo)
    h01, l01 = _mul32_wide(a_lo, a_hi)
    h11, l11 = _mul32_wide(a_hi, a_hi)
    # double the cross product: (h01:l01) << 1, top bit carries into n3
    top = h01 >> _u32(31)
    h01d = (h01 << _u32(1)) | (l01 >> _u32(31))
    l01d = l01 << _u32(1)
    n0 = l00
    c1, n1 = _addc(h00, l01d)
    c2a, n2 = _addc(h01d, l11)
    c2b, n2 = _addc(n2, c1)
    n3 = h11 + top + c2a + c2b
    return _gl_reduce_limbs(n0, n1, n2, n3, lazy=lazy)


def _gl_add(a, b, lazy=False):
    """Mod-p add on pairs; any u64 inputs, result ≡ a+b (mod p), < 2^64
    (canonical when ``lazy`` is false and inputs are < 2·p)."""
    a_lo, a_hi = a
    b_lo, b_hi = b
    c, lo = _addc(a_lo, b_lo)
    hi1 = a_hi + b_hi
    o1 = hi1 < a_hi
    hi = hi1 + c
    o2 = hi < hi1
    over = jnp.where(o1 | o2, _u32(1), _u32(0))
    # ≥ 2^64 ⇒ subtract p once ⇔ add 2^32 − 1 to the wrapped value
    cf, lo = _addc(lo, jnp.where(over == 1, _u32(0xFFFFFFFF), _u32(0)))
    hi = hi + cf
    if lazy:
        return lo, hi
    return _canon((lo, hi))


# ---- signed 64-bit (two's-complement) pair helpers for the freq-MDS --------


def _i64_add(a, b):
    c, lo = _addc(a[0], b[0])
    return lo, a[1] + b[1] + c


def _i64_sub(a, b):
    br, lo = _subb(a[0], b[0])
    return lo, a[1] - b[1] - br


def _i64_neg(a):
    br, lo = _subb(_u32(0), a[0])
    return lo, _u32(0) - a[1] - br


def _i64_shl(a, k: int):
    if k == 0:
        return a
    lo = a[0] << _u32(k)
    hi = (a[1] << _u32(k)) | (a[0] >> _u32(32 - k))
    return lo, hi


def _i64_cmul(a, c: int):
    """a · c for a small static constant c (shift/add chain)."""
    neg = c < 0
    c = -c if neg else c
    if c == 0:
        return jnp.zeros_like(a[0]), jnp.zeros_like(a[1])
    out = None
    bit = 0
    while c:
        if c & 1:
            term = _i64_shl(a, bit)
            out = term if out is None else _i64_add(out, term)
        c >>= 1
        bit += 1
    return _i64_neg(out) if neg else out


_MDS_FREQ_B1 = (16, 8, 16)
_MDS_FREQ_B2 = ((-1, 2), (-1, 1), (4, 8))
_MDS_FREQ_B3 = (-8, 1, 1)


def _mds12_freq_pairs(cols):
    """cols: 12 i64-pair lanes with values < 2^32 → 12 i64-pair lanes of the
    exact circulant product (same factorization as gl._mds12_freq)."""
    def fft4(x0, x1, x2, x3):
        z0, z2 = _i64_add(x0, x2), _i64_sub(x0, x2)
        z1, z3 = _i64_add(x1, x3), _i64_sub(x1, x3)
        return _i64_add(z0, z1), (z2, _i64_neg(z3)), _i64_sub(z0, z1)

    u0, u1, u2 = fft4(cols[0], cols[3], cols[6], cols[9])
    u4, u5, u6 = fft4(cols[1], cols[4], cols[7], cols[10])
    u8, u9, u10 = fft4(cols[2], cols[5], cols[8], cols[11])

    c0, c1, c2 = _MDS_FREQ_B1
    v0 = _i64_add(_i64_add(_i64_cmul(u0, c0), _i64_cmul(u4, c2)),
                  _i64_cmul(u8, c1))
    v4 = _i64_add(_i64_add(_i64_cmul(u0, c1), _i64_cmul(u4, c0)),
                  _i64_cmul(u8, c2))
    v8 = _i64_add(_i64_add(_i64_cmul(u0, c2), _i64_cmul(u4, c1)),
                  _i64_cmul(u8, c0))

    (y0r, y0i), (y1r, y1i), (y2r, y2i) = _MDS_FREQ_B2
    (x0r, x0i), (x1r, x1i), (x2r, x2i) = u1, u5, u9
    x0s, x1s, x2s = _i64_add(x0r, x0i), _i64_add(x1r, x1i), _i64_add(x2r, x2i)

    def kprod(xr, xi, xs, yr, yi):
        return (_i64_cmul(xr, yr), _i64_cmul(xi, yi), _i64_cmul(xs, yr + yi))

    def k_r(m):  # real part contribution m.0 − m.1
        return _i64_sub(m[0], m[1])

    def k_cross(m):  # xs·ys − m.0 − m.1
        return _i64_sub(_i64_sub(m[2], m[0]), m[1])

    m0 = kprod(x0r, x0i, x0s, y0r, y0i)
    m1 = kprod(x1r, x1i, x1s, y2r, y2i)
    m2 = kprod(x2r, x2i, x2s, y1r, y1i)
    v1 = (_i64_add(_i64_add(k_r(m0), k_cross(m1)), k_cross(m2)),
          _i64_add(_i64_add(k_cross(m0), _i64_sub(m1[1], m1[0])),
                   _i64_sub(m2[1], m2[0])))
    m0 = kprod(x0r, x0i, x0s, y1r, y1i)
    m1 = kprod(x1r, x1i, x1s, y0r, y0i)
    m2 = kprod(x2r, x2i, x2s, y2r, y2i)
    v5 = (_i64_add(_i64_add(k_r(m0), k_r(m1)), k_cross(m2)),
          _i64_add(_i64_add(k_cross(m0), k_cross(m1)),
                   _i64_sub(m2[1], m2[0])))
    m0 = kprod(x0r, x0i, x0s, y2r, y2i)
    m1 = kprod(x1r, x1i, x1s, y1r, y1i)
    m2 = kprod(x2r, x2i, x2s, y0r, y0i)
    v9 = (_i64_add(_i64_add(k_r(m0), k_r(m1)), k_r(m2)),
          _i64_add(_i64_add(k_cross(m0), k_cross(m1)), k_cross(m2)))

    c0, c1, c2 = _MDS_FREQ_B3
    v2 = _i64_sub(_i64_sub(_i64_cmul(u2, c0), _i64_cmul(u6, c2)),
                  _i64_cmul(u10, c1))
    v6 = _i64_sub(_i64_add(_i64_cmul(u2, c1), _i64_cmul(u6, c0)),
                  _i64_cmul(u10, c2))
    v10 = _i64_add(_i64_add(_i64_cmul(u2, c2), _i64_cmul(u6, c1)),
                   _i64_cmul(u10, c0))

    def ifft4(y0, y1, y2):
        z0, z1 = _i64_add(y0, y2), _i64_sub(y0, y2)
        z2, z3 = y1[0], _i64_neg(y1[1])
        return (_i64_add(z0, z2), _i64_add(z1, z3),
                _i64_sub(z0, z2), _i64_sub(z1, z3))

    s0, s3, s6, s9 = ifft4(v0, v1, v2)
    s1, s4, s7, s10 = ifft4(v4, v5, v6)
    s2, s5, s8, s11 = ifft4(v8, v9, v10)
    return [s0, s1, s2, s3, s4, s5, s6, s7, s8, s9, s10, s11]


def _mds_freq(state, ark=None):
    """state: list of 12 canonical (lo, hi) pairs → MDS·state, canonical.
    Low/high 32-bit halves through the integer convolution separately, then
    a 96-bit Goldilocks recombine (mds_f64_12x12.rs:41-69). ``ark``, when
    given, is 12 (lo, hi) PYTHON-int round-constant pairs folded into the
    recombine as scalar literals (Pallas kernels cannot capture array
    constants, and scalars broadcast for free)."""
    zeros = jnp.zeros_like(state[0][0])
    lo_in = [(lo, zeros) for lo, _ in state]
    hi_in = [(hi, zeros) for _, hi in state]
    lo_out = _mds12_freq_pairs(lo_in)
    hi_out = _mds12_freq_pairs(hi_in)
    out = []
    for k, ((l0, l1), (h0, h1)) in enumerate(zip(lo_out, hi_out)):
        # s = lo + hi·2^32 (96-bit, non-negative): limbs n0, n1, n2
        c, n1 = _addc(l1, h0)
        n2 = h1 + c
        lane = _gl_reduce_limbs(l0, n1, n2, jnp.zeros_like(l0), lazy=True)
        if ark is not None:
            lane = _gl_add(lane, (_u32(ark[k][0]), _u32(ark[k][1])),
                           lazy=True)
        out.append(lane)
    return out


# ---- the permutation --------------------------------------------------------
#
# State is ONE stacked pair of (12, 8, blk) u32 planes: the leading axis is
# the Rescue lane, the trailing (8, blk) is a full native (sublane, lane)
# tile, so every op — the stacked S-box chains AND the per-lane MDS slices —
# runs at 100% VPU utilization (a (12, blk) stacking pads to 16 sublanes and
# runs MDS slices at 1/8 occupancy). The 7 rounds are unrolled with the ARK
# constants embedded as scalar literals: Mosaic rejects dynamic
# lane-dimension slices of an operand ref (it cannot prove 128-alignment of
# a (12, 7) column load), and broadcast literals are free vector constants.


def _mds_freq_stacked(st, ark=None):
    lo, hi = st
    lanes = [(lo[k : k + 1], hi[k : k + 1]) for k in range(12)]
    out = _mds_freq(lanes, ark)
    return (jnp.concatenate([o[0] for o in out], axis=0),
            jnp.concatenate([o[1] for o in out], axis=0))


def _sbox(s):
    x2 = _gl_sqr(s, lazy=True)
    x4 = _gl_sqr(x2, lazy=True)
    x6 = _gl_mul(x4, x2, lazy=True)
    return _gl_mul(x6, s, lazy=True)


def _squares(s, k: int):
    if k <= 2:
        for _ in range(k):
            s = _gl_sqr(s, lazy=True)
        return s

    def body(_, pair):
        return _gl_sqr(pair, lazy=True)

    # i32 bounds: under jax_enable_x64 the induction variable would be i64,
    # which Mosaic cannot legalize on the TPU scalar core
    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(k), body, s)


def _inv_sbox(s):
    """x^INV_ALPHA via the reference 72-mul addition chain
    (rp64_256/mod.rs apply_inv_sbox), squaring runs as fori_loops."""
    t1 = _gl_sqr(s, lazy=True)
    t2 = _gl_sqr(t1, lazy=True)
    t3 = _gl_mul(_squares(t2, 3), t2, lazy=True)
    t4 = _gl_mul(_squares(t3, 6), t3, lazy=True)
    t5 = _gl_mul(_squares(t4, 12), t4, lazy=True)
    t6 = _gl_mul(_squares(t5, 6), t3, lazy=True)
    t7 = _gl_mul(_squares(t6, 31), t6, lazy=True)
    a = _gl_mul(_gl_sqr(t7, lazy=True), t6, lazy=True)
    a = _gl_sqr(a, lazy=True)
    a = _gl_sqr(a, lazy=True)
    b = _gl_mul(_gl_mul(t1, t2, lazy=True), s, lazy=True)
    return _gl_mul(a, b, lazy=True)


@lru_cache(maxsize=None)
def _ark_consts():
    """Per-round tuples of 12 (lo, hi) PYTHON-int pairs for ARK1/ARK2."""
    out = []
    for table in (RP64_256_ARK1, RP64_256_ARK2):
        out.append(tuple(
            tuple((int(v) & 0xFFFFFFFF, int(v) >> 32) for v in row)
            for row in table))
    return tuple(out)


def _permutation(state):
    """state: ((12, 8, blk) lo, (12, 8, blk) hi) — 7 unrolled rounds
    (rp64_256/mod.rs:299-319), round constants folded into the MDS recombine
    as scalar literals. All intermediate values are lazy (< 2^64, ≡ mod p);
    one _canon at the end makes the state canonical for the absorb adds and
    the squeeze."""
    ark1, ark2 = _ark_consts()
    for r in range(_NUM_ROUNDS):
        state = _sbox(state)
        state = _mds_freq_stacked(state, ark1[r])
        state = _inv_sbox(state)
        state = _mds_freq_stacked(state, ark2[r])
    return _canon(state)


# ---- fori-loop-over-rounds variant (ARK in SMEM) ----------------------------
#
# Same math, but the round body is traced ONCE and the ARK constants are
# scalar loads from an SMEM operand — the round constants can't be vector
# literals here (Mosaic can't index a vector operand's lane dim dynamically),
# and scalar loads from SMEM are free next to the ~150 vector multiplies of
# a round.


def _mds_freq_stacked_scalars(st, ark_pairs):
    """MDS + add-round-constants where ark_pairs is a list of 12 (lo, hi)
    traced SCALAR pairs (SMEM reads) instead of Python-int literals."""
    lo, hi = st
    lanes = [(lo[k : k + 1], hi[k : k + 1]) for k in range(12)]
    out = _mds_freq(lanes, None)
    out2 = [_gl_add(lane, ark_pairs[k], lazy=True)
            for k, lane in enumerate(out)]
    return (jnp.concatenate([o[0] for o in out2], axis=0),
            jnp.concatenate([o[1] for o in out2], axis=0))


def _permutation_loop(state, ark_ref):
    """ark_ref: SMEM (7, 2, 12, 2) u32 — [round, ark1/2, lane, lo/hi]."""

    def body(r, st):
        a1 = [(ark_ref[r, 0, k, 0], ark_ref[r, 0, k, 1]) for k in range(12)]
        a2 = [(ark_ref[r, 1, k, 0], ark_ref[r, 1, k, 1]) for k in range(12)]
        st = _sbox(st)
        st = _mds_freq_stacked_scalars(st, a1)
        st = _inv_sbox(st)
        st = _mds_freq_stacked_scalars(st, a2)
        return st

    # i32 bounds: under jax_enable_x64 the induction variable would be i64,
    # which Mosaic cannot legalize on the TPU scalar core
    state = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_NUM_ROUNDS), body,
                              state)
    return _canon(state)


@lru_cache(maxsize=None)
def _ark_array_np() -> np.ndarray:
    a = np.zeros((_NUM_ROUNDS, 2, 12, 2), dtype=np.uint32)
    for r in range(_NUM_ROUNDS):
        for k in range(12):
            for j, table in enumerate((RP64_256_ARK1, RP64_256_ARK2)):
                v = int(table[r][k])
                a[r, j, k, 0] = v & 0xFFFFFFFF
                a[r, j, k, 1] = v >> 32
    return a


# ---- kernels ----------------------------------------------------------------


def _hash_rows_block(k: int, lo, hi):
    """Sponge over one (k, 8, blk) row block (rp64_256/mod.rs:183-204):
    capacity[0] = k, absorb rate-8 chunks, squeeze state[4:8]. Pure jnp on
    plane arrays — runs inside the Pallas kernel on TPU and directly under
    jit in the CPU oracle tests."""
    blk = lo.shape[2]
    zeros = jnp.zeros((1, 8, blk), dtype=jnp.uint32)
    kmod = k % P
    first = min(k, _RATE_WIDTH)
    pad = _RATE_WIDTH - first
    cap_lo = [zeros + _u32(kmod & 0xFFFFFFFF)] + [zeros] * 3
    cap_hi = [zeros + _u32(kmod >> 32)] + [zeros] * 3
    st_lo = jnp.concatenate(cap_lo + [lo[:first]] + [zeros] * pad, axis=0)
    st_hi = jnp.concatenate(cap_hi + [hi[:first]] + [zeros] * pad, axis=0)
    state = _permutation((st_lo, st_hi))
    i = _RATE_WIDTH
    while i < k:
        width = min(_RATE_WIDTH, k - i)
        slo, shi = state
        rate = _gl_add((slo[4 : 4 + width], shi[4 : 4 + width]),
                       (lo[i : i + width], hi[i : i + width]))
        tail = _RATE_START + width
        # a full-rate chunk leaves no tail; Mosaic rejects zero-size slices
        lo_parts = [slo[:4], rate[0]] + ([slo[tail:]] if tail < 12 else [])
        hi_parts = [shi[:4], rate[1]] + ([shi[tail:]] if tail < 12 else [])
        st_lo = jnp.concatenate(lo_parts, axis=0)
        st_hi = jnp.concatenate(hi_parts, axis=0)
        state = _permutation((st_lo, st_hi))
        i += _RATE_WIDTH
    return state[0][4:8], state[1][4:8]


def _hash_rows_kernel(k: int, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    out_lo_ref[:], out_hi_ref[:] = _hash_rows_block(k, lo_ref[:], hi_ref[:])


def _hash_rows_block_loop(k: int, ark_ref, lo, hi):
    """_hash_rows_block with the fori-loop permutation (ARK from SMEM)."""
    blk = lo.shape[2]
    zeros = jnp.zeros((1, 8, blk), dtype=jnp.uint32)
    kmod = k % P
    first = min(k, _RATE_WIDTH)
    pad = _RATE_WIDTH - first
    cap_lo = [zeros + _u32(kmod & 0xFFFFFFFF)] + [zeros] * 3
    cap_hi = [zeros + _u32(kmod >> 32)] + [zeros] * 3
    st_lo = jnp.concatenate(cap_lo + [lo[:first]] + [zeros] * pad, axis=0)
    st_hi = jnp.concatenate(cap_hi + [hi[:first]] + [zeros] * pad, axis=0)
    state = _permutation_loop((st_lo, st_hi), ark_ref)
    i = _RATE_WIDTH
    while i < k:
        width = min(_RATE_WIDTH, k - i)
        slo, shi = state
        rate = _gl_add((slo[4 : 4 + width], shi[4 : 4 + width]),
                       (lo[i : i + width], hi[i : i + width]))
        tail = _RATE_START + width
        lo_parts = [slo[:4], rate[0]] + ([slo[tail:]] if tail < 12 else [])
        hi_parts = [shi[:4], rate[1]] + ([shi[tail:]] if tail < 12 else [])
        state = _permutation_loop(
            (jnp.concatenate(lo_parts, axis=0),
             jnp.concatenate(hi_parts, axis=0)), ark_ref)
        i += _RATE_WIDTH
    return state[0][4:8], state[1][4:8]


def _hash_rows_kernel_loop(k: int, ark_ref, lo_ref, hi_ref, out_lo_ref,
                           out_hi_ref):
    out_lo_ref[:], out_hi_ref[:] = _hash_rows_block_loop(
        k, ark_ref, lo_ref[:], hi_ref[:])


def _merge_rows_block(l_lo, l_hi, r_lo, r_hi):
    """merge(d0, d1): capacity[0] = 8, state = d0 ‖ d1, one permutation
    (rp64_256/mod.rs:208-221). Pure jnp on plane arrays."""
    blk = l_lo.shape[2]
    zeros = jnp.zeros((1, 8, blk), dtype=jnp.uint32)
    st_lo = jnp.concatenate(
        [zeros + _u32(_RATE_WIDTH)] + [zeros] * 3 + [l_lo, r_lo], axis=0)
    st_hi = jnp.concatenate([zeros] * 4 + [l_hi, r_hi], axis=0)
    state = _permutation((st_lo, st_hi))
    return state[0][4:8], state[1][4:8]


def _merge_rows_kernel(l_lo, l_hi, r_lo, r_hi, out_lo_ref, out_hi_ref):
    out_lo_ref[:], out_hi_ref[:] = _merge_rows_block(
        l_lo[:], l_hi[:], r_lo[:], r_hi[:])


def _merge_rows_kernel_loop(ark_ref, l_lo, l_hi, r_lo, r_hi, out_lo_ref,
                            out_hi_ref):
    l_lo, l_hi, r_lo, r_hi = l_lo[:], l_hi[:], r_lo[:], r_hi[:]
    blk = l_lo.shape[2]
    zeros = jnp.zeros((1, 8, blk), dtype=jnp.uint32)
    st_lo = jnp.concatenate(
        [zeros + _u32(_RATE_WIDTH)] + [zeros] * 3 + [l_lo, r_lo], axis=0)
    st_hi = jnp.concatenate([zeros] * 4 + [l_hi, r_hi], axis=0)
    state = _permutation_loop((st_lo, st_hi), ark_ref)
    out_lo_ref[:], out_hi_ref[:] = state[0][4:8], state[1][4:8]


def _split_planes(rows):
    """(m, k) u64 → two (k, 8, m/8) u32 planes (lo, hi): row s·(m/8)+l of
    lane j lands at [j, s, l], a full native (sublane, lane) tile per lane."""
    m = rows.shape[0]
    t = rows.T.reshape(-1, 8, m // 8)
    return ((t & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (t >> jnp.uint64(32)).astype(jnp.uint32))


def _join_planes(lo, hi):
    """two (4, 8, m/8) u32 planes → (m, 4) u64 digests."""
    m = lo.shape[1] * lo.shape[2]
    return (lo.astype(jnp.uint64)
            | (hi.astype(jnp.uint64) << jnp.uint64(32))).reshape(-1, m).T


def _ark_spec():
    """SMEM BlockSpec for the (7, 2, 12, 2) ARK operand. The index_map must
    be explicit: the default returns plain zeros that trace as i64 under
    jax_enable_x64, which Mosaic cannot legalize on the scalar core."""
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((_NUM_ROUNDS, 2, 12, 2),
                        lambda i: (0 * i, 0 * i, 0 * i, 0 * i),
                        memory_space=pltpu.SMEM)


@partial(jax.jit, static_argnums=(2,))
def _hash_rows_call(lo, hi, interpret: bool):
    k, _, lanes = lo.shape
    blk = min(_LANE_BLOCK, lanes)
    spec_in = pl.BlockSpec((k, 8, blk), lambda i: (0 * i, 0 * i, i))
    spec_out = pl.BlockSpec((4, 8, blk), lambda i: (0 * i, 0 * i, i))
    if _LOOP_MODE:
        return pl.pallas_call(
            partial(_hash_rows_kernel_loop, k),
            grid=(lanes // blk,),
            in_specs=[_ark_spec(), spec_in, spec_in],
            out_specs=(spec_out, spec_out),
            out_shape=(jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32),
                       jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32)),
            interpret=interpret,
        )(jnp.asarray(_ark_array_np()), lo, hi)
    return pl.pallas_call(
        partial(_hash_rows_kernel, k),
        grid=(lanes // blk,),
        in_specs=[spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32)),
        interpret=interpret,
    )(lo, hi)


def rp64_hash_rows_pallas(rows, interpret: bool = False):
    """hash_elements of each row: rows (m, k) u64 → digests (m, 4) u64.
    Drop-in for gl.rp64_hash_rows; m must be a multiple of 1024 on TPU
    (8 sublanes × 128-aligned lane count)."""
    lo, hi = _split_planes(rows)
    out_lo, out_hi = _hash_rows_call(lo, hi, interpret)
    return _join_planes(out_lo, out_hi)


@partial(jax.jit, static_argnums=(4,))
def _merge_rows_call(l_lo, l_hi, r_lo, r_hi, interpret: bool):
    _, _, lanes = l_lo.shape
    blk = min(_LANE_BLOCK, lanes)
    spec = pl.BlockSpec((4, 8, blk), lambda i: (0 * i, 0 * i, i))
    if _LOOP_MODE:
        return pl.pallas_call(
            _merge_rows_kernel_loop,
            grid=(lanes // blk,),
            in_specs=[_ark_spec(), spec, spec, spec, spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32),
                       jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32)),
            interpret=interpret,
        )(jnp.asarray(_ark_array_np()), l_lo, l_hi, r_lo, r_hi)
    return pl.pallas_call(
        _merge_rows_kernel,
        grid=(lanes // blk,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32)),
        interpret=interpret,
    )(l_lo, l_hi, r_lo, r_hi)


def rp64_merge_rows_pallas(left, right, interpret: bool = False):
    """merge of digest pairs: (m, 4), (m, 4) → (m, 4). Drop-in for
    gl.rp64_merge_rows; m must be a multiple of 1024 on TPU."""
    l_lo, l_hi = _split_planes(left)
    r_lo, r_hi = _split_planes(right)
    out_lo, out_hi = _merge_rows_call(l_lo, l_hi, r_lo, r_hi, interpret)
    return _join_planes(out_lo, out_hi)
