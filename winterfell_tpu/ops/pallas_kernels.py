"""Pallas TPU kernels (u32-limb Goldilocks arithmetic).

The production compute path currently uses jnp-level u64 ops, which XLA
lowers to emulated 32-bit pairs. These Pallas kernels are the hand-written
replacement layer: field elements as explicit (lo, hi) uint32 limb planes,
16-bit half-word products on the VPU, carries managed manually — no u64
emulation in sight. Round 1 ships the multiply kernel with its oracle test;
round 2 fuses NTT butterflies and full Rescue rounds at this layer.

All kernels run under ``interpret=True`` on CPU for tests and compile with
Mosaic on TPU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.compile_cache import stabilize_pallas_cache_keys

# Pallas cache keys must not depend on caller line numbers (see utils/compile_cache.py)
stabilize_pallas_cache_keys()

from ..math.fields import GOLDILOCKS_P

P = GOLDILOCKS_P


def _c(v):
    # fresh literal inside the current trace (pallas kernels cannot
    # capture module-level traced constants)
    return jnp.uint32(v)


def _mul32_wide(a, b):
    """u32 × u32 → (hi, lo) u32 pair via 16-bit half-words (VPU-native)."""
    a0 = a & _c(0xFFFF)
    a1 = a >> jnp.uint32(16)
    b0 = b & _c(0xFFFF)
    b1 = b >> jnp.uint32(16)

    p00 = a0 * b0                      # ≤ 2^32 − 2^17 + 1, fits u32
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1

    # lo = p00 + ((p01 + p10) << 16), tracking carries
    mid = (p01 & _c(0xFFFF)) + (p10 & _c(0xFFFF)) + (p00 >> jnp.uint32(16))
    lo = (p00 & _c(0xFFFF)) | (mid << jnp.uint32(16))
    hi = p11 + (p01 >> jnp.uint32(16)) + (p10 >> jnp.uint32(16)) + \
        (mid >> jnp.uint32(16))
    return hi, lo


def _add32_carry(a, b):
    """u32 + u32 → (carry, sum)."""
    s = a + b
    return jnp.where(s < a, jnp.uint32(1), jnp.uint32(0)), s


def _sub32_borrow(a, b):
    d = a - b
    return jnp.where(a < b, jnp.uint32(1), jnp.uint32(0)), d


def _gl_mul_limbs(a_lo, a_hi, b_lo, b_hi):
    """(a_hi·2^32 + a_lo)·(b_hi·2^32 + b_lo) mod p, all u32 planes.

    128-bit product limbs n0..n3 then the Goldilocks identities
    2^64 ≡ 2^32 − 1 and 2^96 ≡ −1 (mod p):
       x ≡ (n0 + n1·2^32) + n2·(2^32 − 1) − n3."""
    # 64-bit partial products
    h00, l00 = _mul32_wide(a_lo, b_lo)
    h01, l01 = _mul32_wide(a_lo, b_hi)
    h10, l10 = _mul32_wide(a_hi, b_lo)
    h11, l11 = _mul32_wide(a_hi, b_hi)

    # accumulate into n0..n3 (u32 limbs with carries)
    n0 = l00
    c1a, n1 = _add32_carry(h00, l01)
    c1b, n1 = _add32_carry(n1, l10)
    c2a, n2 = _add32_carry(h01, h10)
    c2b, n2 = _add32_carry(n2, l11)
    n2c, n2 = _add32_carry(n2, c1a + c1b)
    n3 = h11 + c2a + c2b + n2c  # cannot overflow: product < 2^128

    # low64 = n0 + n1·2^32 ; subtract n3 (borrow propagates into hi limb)
    bl, r0 = _sub32_borrow(n0, n3)
    r1 = n1 - bl  # may wrap; handled with the +p fix below
    under = jnp.where((n1 < bl), jnp.uint32(1), jnp.uint32(0))
    # if we underflowed 64 bits, add p = 2^64 − 2^32 + 1:
    #   (r1, r0) += (0xFFFFFFFF, 0x00000001)
    cfix, r0 = _add32_carry(r0, under)  # +1 where under
    r1 = r1 + jnp.where(under == 1, _c(0xFFFFFFFF), jnp.uint32(0)) + cfix

    # add n2·(2^32 − 1) = (n2 << 32) − n2: subtract n2 from low limb, add to hi
    b2, r0 = _sub32_borrow(r0, n2)
    # hi limb: r1 + n2 − borrow, tracking 64-bit overflow
    c3, r1 = _add32_carry(r1, n2 - b2)
    over = jnp.where(n2 >= b2, c3, jnp.uint32(0))
    u2, r1x = _sub32_borrow(r1, jnp.where(n2 < b2, jnp.uint32(1) - c3, jnp.uint32(0)))
    r1 = r1x
    # on 64-bit overflow, subtract p ⇔ add 2^32 − 1 to the low limb
    cf, r0 = _add32_carry(r0, jnp.where(over == 1, _c(0xFFFFFFFF), jnp.uint32(0)))
    r1 = r1 + cf

    # final conditional subtract of p if (r1, r0) >= p
    ge_p = (r1 == _c(0xFFFFFFFF)) & (r0 >= jnp.uint32(1)) | (r1 > _c(0xFFFFFFFF))
    # p = (0xFFFFFFFF, 0x00000001): r − p = (r1 − 0xFFFFFFFF − borrow, r0 − 1)
    bp, s0 = _sub32_borrow(r0, jnp.uint32(1))
    s1 = r1 - _c(0xFFFFFFFF) - bp
    r0 = jnp.where(ge_p, s0, r0)
    r1 = jnp.where(ge_p, s1, r1)
    return r0, r1


def _gl_mul_kernel(a_lo_ref, a_hi_ref, b_lo_ref, b_hi_ref, o_lo_ref, o_hi_ref):
    lo, hi = _gl_mul_limbs(a_lo_ref[:], a_hi_ref[:], b_lo_ref[:], b_hi_ref[:])
    o_lo_ref[:] = lo
    o_hi_ref[:] = hi


@partial(jax.jit, static_argnums=(4,))
def gl_mul_pallas(a_lo, a_hi, b_lo, b_hi, interpret: bool = False):
    """Elementwise Goldilocks multiply over u32 limb planes (2-D arrays)."""
    shape = a_lo.shape
    return pl.pallas_call(
        _gl_mul_kernel,
        out_shape=(jax.ShapeDtypeStruct(shape, jnp.uint32),
                   jax.ShapeDtypeStruct(shape, jnp.uint32)),
        interpret=interpret,
    )(a_lo, a_hi, b_lo, b_hi)


def split_limbs(x_u64: np.ndarray):
    lo = (x_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x_u64 >> np.uint64(32)).astype(np.uint32)
    return lo, hi


def join_limbs(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
