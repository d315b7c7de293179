"""MXU-backed DFT leaves for the f128 NTT.

The VPU pays ~400 native u32 ops per f128 butterfly multiply (16 32x32
partials + carry folds), so a radix-2 NTT runs ~26 multiply passes over the
domain. The TPU's real muscle is the MXU (128x128 int8 systolic array) —
this module computes the six-step decomposition's LEAF transforms as one
integer matrix multiply per level:

- Elements are split into 19 unsigned base-128 digits (int8-exact).
- The leaf DFT matrix W (omega^{rc} mod p) is expanded into a block-Toeplitz
  digit matrix WT[(l, r), (j, c)] = digit_{l-j}(W[r, c]) so that a single
  s8 x s8 -> s32 matmul against the stacked input digit planes produces the
  DIAGONAL SUMS D[l] = sum_{i+j=l} W_i * x_j directly (the MXU accumulates
  what the VPU would otherwise add element by element).
  Precision: |digit| < 2^7, contraction length 19L <= 9728 -> every s32
  accumulator stays below 2^7 * 2^7 * 9728 < 2^28.
- A VPU pass recombines the 37 digit diagonals into canonical 4xu32 limbs:
  base-2^7 carry normalization, packing into nine 32-bit limbs, then the
  same phi-fold reduction schedule as ops.f128 (2^128 = 45*2^40 - 1 mod p).

The batch axis is processed in chunks under lax.scan so the (37L, Bc) s32
diagonal temps stay bounded regardless of domain size.

Exact oracle: winterfell_tpu.ops.f128's radix-2 path (itself pinned to the
Python-int host layer); tests/test_ntt_mxu.py pins both.

Reference semantics: math/src/fft/serial.rs (the reference's NTT); the
decomposition mirrors ops/f128.py:_ntt_core's six-step.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from ..math.fields import F128
from . import f128 as eng

P = F128.p

NUM_DIGITS = 19  # ceil(128 / 7) base-2^7 digits per element
NUM_DIAGS = 2 * NUM_DIGITS - 1  # 37

# batch-chunk width for the scanned leaf pipeline: bounds the (NUM_DIAGS*L,
# CHUNK) s32 diagonal temp to ~[email protected]=128
_CHUNK = 1 << 15


def _digits_of_int(v: int) -> list:
    return [(v >> (7 * k)) & 0x7F for k in range(NUM_DIGITS)]


@lru_cache(maxsize=None)
def _leaf_matrix_np(n: int, inverse: bool) -> np.ndarray:
    """(NUM_DIAGS*n, NUM_DIGITS*n) int8 block-Toeplitz digit matrix of the
    n-point DFT matrix omega^{rc}. Built once per (n, inverse) on the host
    (~11 MB at n=128) and passed into programs as a device argument."""
    root = F128.get_root_of_unity(n.bit_length() - 1)
    if inverse:
        root = pow(root, P - 2, P)
    # W[r, c] = root^{rc} digit planes
    wd = np.zeros((NUM_DIGITS, n, n), dtype=np.int8)
    row_val = [1] * n  # root^{r*c} built row by row
    wr = 1  # root^r
    for r in range(n):
        acc = 1
        for c in range(n):
            for k, d in enumerate(_digits_of_int(acc)):
                wd[k, r, c] = d
            acc = acc * wr % P
        wr = wr * root % P
    out = np.zeros((NUM_DIAGS * n, NUM_DIGITS * n), dtype=np.int8)
    for l in range(NUM_DIAGS):
        for j in range(NUM_DIGITS):
            i = l - j
            if 0 <= i < NUM_DIGITS:
                out[l * n : (l + 1) * n, j * n : (j + 1) * n] = wd[i]
    return out


@lru_cache(maxsize=None)
def leaf_matrix_dev(n: int, inverse: bool):
    return jnp.asarray(_leaf_matrix_np(n, inverse))


def _digitize(x):
    """(L, B, 4) u32-valued u64 limbs -> (NUM_DIGITS * L, B) int8 digits."""
    L, B = x.shape[0], x.shape[1]
    limbs = [x[..., k].astype(jnp.uint32) for k in range(4)]
    digs = []
    for k in range(NUM_DIGITS):
        bit = 7 * k
        w, off = bit // 32, bit % 32
        lo = limbs[w] >> jnp.uint32(off)
        if off > 25 and w + 1 < 4:  # digit straddles a limb boundary
            lo = lo | (limbs[w + 1] << jnp.uint32(32 - off))
        digs.append((lo & jnp.uint32(0x7F)).astype(jnp.int8))
    return jnp.stack(digs, axis=0).reshape(NUM_DIGITS * L, B)


def _recombine(diags, L: int):
    """(NUM_DIAGS * L, B) s32 diagonal sums -> (L, B, 4) canonical u64 limbs.

    The value per output element is sum_l D_l * 2^(7l) < 2^286; carry-
    normalize base 2^7, pack into nine 32-bit limbs, then two phi-folds
    exactly like ops.f128._fold_256 (extended by one limb for the 288-bit
    intermediate)."""
    B = diags.shape[1]
    d = diags.reshape(NUM_DIAGS, L, B).astype(jnp.uint32)
    # carry-normalize: digits < 2^7, carries < 2^28 / 2^7
    digits = []
    carry = jnp.zeros_like(d[0])
    for l in range(NUM_DIAGS):
        t = d[l] + carry
        digits.append(t & jnp.uint32(0x7F))
        carry = t >> jnp.uint32(7)
    # the final carry extends the digit stream (value < 2^(7*37+21))
    for _ in range(4):  # 4 more 7-bit digits absorb the <2^28 carry
        digits.append(carry & jnp.uint32(0x7F))
        carry = carry >> jnp.uint32(7)
    nd = len(digits)  # 41 digits = 287 bits
    # pack 7-bit digits into nine 32-bit limbs
    limbs = [jnp.zeros_like(d[0]) for _ in range(9)]
    for k in range(nd):
        bit = 7 * k
        w, off = bit // 32, bit % 32
        limbs[w] = limbs[w] | (digits[k] << jnp.uint32(off))
        if off > 25 and w + 1 < 9:
            limbs[w + 1] = limbs[w + 1] | (digits[k] >> jnp.uint32(32 - off))
    # 288-bit -> mod p using 2^128 = phi (mod p), phi = 45*2^40 - 1 < 2^46:
    # value = hi_160 * 2^128 + lo_128; fold twice through the u64-lane
    # helpers of ops.f128 (inputs here are 32-bit limbs in u64 lanes).
    stack = [l.astype(jnp.uint64) for l in limbs]
    lo = jnp.stack(stack[:4], axis=-1)  # (L, B, 4)
    hi = jnp.stack(stack[4:], axis=-1)  # (L, B, 5)
    t = eng._mul_phi(hi)  # (L, B, 7)
    pad = jnp.zeros(t.shape[:-1] + (t.shape[-1] - 4,), dtype=jnp.uint64)
    t, _ = eng._add_raw(t, jnp.concatenate([lo, pad], axis=-1))
    # t < 2^(160+46) + 2^128 < 2^207 -> 7 limbs
    t2 = eng._mul_phi(t[..., 4:7])  # (L, B, 5); < 2^(79+46) = 2^125
    t2, _ = eng._add_raw(t2, jnp.concatenate(
        [t[..., :4], jnp.zeros(t.shape[:-1] + (1,), dtype=jnp.uint64)],
        axis=-1))
    # t2 < 2^125 + 2^128 < 2^129 -> 5 limbs, top limb in {0, 1}
    wrapped = t2[..., 4] != 0
    base = t2[..., :4]
    phi = jnp.asarray(eng._int_to_limbs(eng.PHI)).reshape(
        (1,) * (base.ndim - 1) + (4,))
    base_wrap, _ = eng._add_raw(base, jnp.broadcast_to(phi, base.shape))
    base = jnp.where(wrapped[..., None], base_wrap, base)
    return eng._cond_sub_p(base)


@partial(jax.jit, static_argnums=(2,))
def _leaf_dft_jit(x, wt, L: int):
    """x: (L, B, 4) u64 limb array -> n-point DFT along axis 0 via one
    block-Toeplitz digit matmul per batch chunk (lax.scan)."""
    B = x.shape[1]
    chunk = min(_CHUNK, B)
    while B % chunk:  # keep chunks even divisors of the batch
        chunk //= 2
    nb = B // chunk

    def one(xc):
        digs = _digitize(xc)  # (19L, Bc) int8
        diags = jax.lax.dot_general(
            wt, digs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (37L, Bc)
        return _recombine(diags, L)

    if nb <= 1:
        return one(x)
    xb = jnp.moveaxis(x.reshape(L, nb, chunk, 4), 1, 0)

    def body(_, xc):
        return None, one(xc)

    _, parts = jax.lax.scan(body, None, xb)
    return jnp.moveaxis(parts, 0, 1).reshape(L, B, 4)


def leaf_dft(x, n: int, inverse: bool):
    """Batched n-point DFT of x (n, ..., 4) along axis 0 on the MXU."""
    rest = x.shape[1:-1]
    B = 1
    for s in rest:
        B *= s
    out = _leaf_dft_jit(x.reshape(n, B, 4), leaf_matrix_dev(n, inverse), n)
    return out.reshape((n,) + rest + (4,))
