#!/usr/bin/env python3
"""A/B: current f128 engine (32-bit limbs in u64 lanes) vs a prototype
u32-lane engine (4xu32 resident limbs, 16-bit split inside mul).

TPU has no 64-bit integer units: every u64 op is emulated as u32 pairs and a
u64 multiply lowers to ~6+ native ops. The prototype keeps elements as
(..., 4) uint32 (16 bytes/element -- HALF the HBM traffic) and splits to
16-bit digits only inside the product, where every partial is one native
32x32->32 mul.

Run on CPU first for correctness (PROTO_CHECK=1), then on TPU for timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("AB_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from winterfell_tpu.math.fields import F128
from winterfell_tpu.ops import f128 as eng

P = F128.p
PHI = (45 << 40) - 1
M16 = jnp.uint32(0xFFFF)

# ---------------------------------------------------------------- prototype

def u32_add(a, b):
    """(..., 4) u32 + u32 with carries."""
    out = []
    carry = jnp.zeros_like(a[..., 0])
    for k in range(4):
        s = a[..., k] + b[..., k]
        c1 = (s < a[..., k]).astype(jnp.uint32)
        s2 = s + carry
        c2 = (s2 < carry).astype(jnp.uint32)
        out.append(s2)
        carry = c1 | c2
    return jnp.stack(out, axis=-1), carry


def u32_sub(a, b):
    out = []
    borrow = jnp.zeros_like(a[..., 0])
    for k in range(4):
        d = a[..., k] - b[..., k]
        b1 = (a[..., k] < b[..., k]).astype(jnp.uint32)
        d2 = d - borrow
        b2 = (d < borrow).astype(jnp.uint32)
        out.append(d2)
        borrow = b1 | b2
    return jnp.stack(out, axis=-1), borrow


_P_LIMBS = np.array([(P >> (32 * k)) & 0xFFFFFFFF for k in range(4)],
                    dtype=np.uint32)
_PHI_LIMBS = np.array([(PHI >> (32 * k)) & 0xFFFFFFFF for k in range(4)],
                      dtype=np.uint32)


def _p_like(a):
    return jnp.broadcast_to(jnp.asarray(_P_LIMBS), a.shape)


def _phi_like(a):
    return jnp.broadcast_to(jnp.asarray(_PHI_LIMBS), a.shape)


def f128_add32(a, b):
    s, carry = u32_add(a, b)
    s_wrap, _ = u32_add(s, _phi_like(s))
    s = jnp.where((carry != 0)[..., None], s_wrap, s)
    d, borrow = u32_sub(s, _p_like(s))
    return jnp.where((borrow == 0)[..., None], d, s)


def f128_sub32(a, b):
    d, borrow = u32_sub(a, b)
    d_wrap, _ = u32_add(d, _p_like(d))
    return jnp.where((borrow != 0)[..., None], d_wrap, d)


def _split16(a):
    """(..., 4) u32 -> list of 8 u32 digits < 2^16."""
    out = []
    for k in range(4):
        out.append(a[..., k] & M16)
        out.append(a[..., k] >> jnp.uint32(16))
    return out


def _mul_digits(ad, bd, na, nb):
    """Schoolbook over 16-bit digits, accumulating 32-bit partials split into
    16-bit halves; column sums < 2^21, well inside u32. Returns ncol=na+nb
    digit columns BEFORE the carry sweep."""
    cols = [None] * (na + nb)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(na):
        for j in range(nb):
            p = ad[i] * bd[j]
            acc(i + j, p & M16)
            acc(i + j + 1, p >> jnp.uint32(16))
    return cols


def _sweep(cols):
    """16-bit digit columns -> canonical digits + carry digit stream."""
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        t = c + carry
        out.append(t & M16)
        carry = t >> jnp.uint32(16)
    return out, carry


def _join(digits):
    """List of 2k 16-bit digits -> (..., k) u32 limbs."""
    limbs = [digits[2 * i] | (digits[2 * i + 1] << jnp.uint32(16))
             for i in range(len(digits) // 2)]
    return jnp.stack(limbs, axis=-1)


_PHI_DIGITS = [(PHI >> (16 * k)) & 0xFFFF for k in range(3)]  # phi < 2^46


def f128_mul32(a, b):
    ad = _split16(a)
    bd = _split16(b)
    cols = _mul_digits(ad, bd, 8, 8)  # 16 columns, 256-bit product
    digs, _ = _sweep(cols)  # 16 digits + zero carry (product < 2^256)
    lo, hi = digs[:8], digs[8:]

    # fold 1: hi * phi + lo (hi < 2^128, phi < 2^46 -> < 2^175)
    phid = [jnp.full_like(a[..., 0], d) for d in _PHI_DIGITS]
    cols = _mul_digits(hi, phid, 8, 3)  # 11 columns
    for k in range(8):
        cols[k] = cols[k] + lo[k]
    digs, _ = _sweep(cols)  # 11 digits, value < 2^176

    # fold 2: h2 (3 digits, < 2^47) * phi + l2
    h2, l2 = digs[8:11], digs[:8]
    cols = _mul_digits(h2, phid, 3, 3)  # 6 columns, < 2^93
    for k in range(6):
        cols[k] = cols[k] + l2[k]
    for k in range(6, 8):
        cols.append(l2[k])
    digs, carry = _sweep(cols)  # 8 digits + possible carry (sum < 2^129)
    r = _join(digs)
    r_wrap, _ = u32_add(r, _phi_like(r))
    r = jnp.where((carry != 0)[..., None], r_wrap, r)
    d, borrow = u32_sub(r, _p_like(r))
    return jnp.where((borrow == 0)[..., None], d, r)


# ------------------------------------------------- SoA (limb-major) variant
#
# (n, 4) arrays tile as (8, 128) on TPU: the minor dim of 4 pads to 128
# lanes, wasting 97% of the VPU. Keeping each limb as its OWN dense (n,)
# array makes every elementwise op full-width.


def soa_add(a, b):
    out = []
    carry = jnp.zeros_like(a[0])
    for k in range(4):
        s = a[k] + b[k]
        c1 = (s < a[k]).astype(jnp.uint32)
        s2 = s + carry
        c2 = (s2 < carry).astype(jnp.uint32)
        out.append(s2)
        carry = c1 | c2
    return out, carry


def soa_sub(a, b):
    out = []
    borrow = jnp.zeros_like(a[0])
    for k in range(4):
        d = a[k] - b[k]
        b1 = (a[k] < b[k]).astype(jnp.uint32)
        d2 = d - borrow
        b2 = (d < borrow).astype(jnp.uint32)
        out.append(d2)
        borrow = b1 | b2
    return out, borrow


def _soa_const(a, limbs_np):
    return [jnp.full_like(a[0], int(v)) for v in limbs_np]


def soa_select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def f128_add_soa(a, b):
    s, carry = soa_add(a, b)
    s_wrap, _ = soa_add(s, _soa_const(s, _PHI_LIMBS))
    s = soa_select(carry != 0, s_wrap, s)
    d, borrow = soa_sub(s, _soa_const(s, _P_LIMBS))
    return soa_select(borrow == 0, d, s)


def _soa_split16(a):
    out = []
    for k in range(4):
        out.append(a[k] & M16)
        out.append(a[k] >> jnp.uint32(16))
    return out


def f128_mul_soa(a, b):
    ad = _soa_split16(a)
    bd = _soa_split16(b)
    cols = _mul_digits(ad, bd, 8, 8)
    digs, _ = _sweep(cols)
    lo, hi = digs[:8], digs[8:]
    phid = [jnp.full_like(a[0], d) for d in _PHI_DIGITS]
    cols = _mul_digits(hi, phid, 8, 3)
    for k in range(8):
        cols[k] = cols[k] + lo[k]
    digs, _ = _sweep(cols)
    h2, l2 = digs[8:11], digs[:8]
    cols = _mul_digits(h2, phid, 3, 3)
    for k in range(6):
        cols[k] = cols[k] + l2[k]
    for k in range(6, 8):
        cols.append(l2[k])
    digs, carry = _sweep(cols)
    r = [digs[2 * i] | (digs[2 * i + 1] << jnp.uint32(16)) for i in range(4)]
    r_wrap, _ = soa_add(r, _soa_const(r, _PHI_LIMBS))
    r = soa_select(carry != 0, r_wrap, r)
    d, borrow = soa_sub(r, _soa_const(r, _P_LIMBS))
    return soa_select(borrow == 0, d, r)


def rounds_soa(xs, tws, n):
    for _ in range(n):
        v = f128_mul_soa(xs, tws)
        xs, _ = soa_add(xs, v)  # raw add to keep op mix comparable
        xs = f128_add_soa(xs, v) if False else xs
    return xs


def rounds_soa_full(xs, tws, n):
    for _ in range(n):
        v = f128_mul_soa(xs, tws)
        xs = f128_add_soa(xs, v)
    return xs


# ---------------------------------------------------------------- harness

def to32(x64):
    return jnp.asarray(np.asarray(x64).astype(np.uint32))


def rounds64(x, tw, n):
    for _ in range(n):
        v = eng.f128_mul(x, tw)
        x = eng.f128_add(x, v)
    return x


def rounds32(x, tw, n):
    for _ in range(n):
        v = f128_mul32(x, tw)
        x = f128_add32(x, v)
    return x


def main():
    rng = np.random.default_rng(0)
    n = int(os.environ.get("AB_N", str(1 << 20)))
    vals = [int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62)) % P
            for _ in range(64)]
    a_obj = np.array(vals, dtype=object)

    if os.environ.get("PROTO_CHECK"):
        a64 = eng.to_device(a_obj)
        b64 = eng.to_device(a_obj[::-1].copy())
        a32, b32 = to32(a64), to32(b64)
        want_mul = eng.from_limbs_np(np.asarray(eng.f128_mul(a64, b64)))
        got_mul = from32(np.asarray(f128_mul32(a32, b32)))
        assert list(want_mul) == list(got_mul), "mul mismatch"
        want_add = eng.from_limbs_np(np.asarray(eng.f128_add(a64, b64)))
        got_add = from32(np.asarray(f128_add32(a32, b32)))
        assert list(want_add) == list(got_add), "add mismatch"
        want_sub = eng.from_limbs_np(np.asarray(eng.f128_sub(a64, b64)))
        got_sub = from32(np.asarray(f128_sub32(a32, b32)))
        assert list(want_sub) == list(got_sub), "sub mismatch"
        print("PROTO_CHECK ok (mul/add/sub match on 64 random elements)")
        return

    big = np.empty(n, dtype=object)
    for i in range(0, n, 64):
        big[i : i + 64] = vals[: min(64, n - i)]
    x64 = eng.to_device(big)
    tw64 = eng.to_device(big[::-1].copy())
    x32, tw32 = to32(x64), to32(tw64)

    R = int(os.environ.get("AB_R", "10"))
    f64j = jax.jit(lambda x, t: rounds64(x, t, R))
    f32j = jax.jit(lambda x, t: rounds32(x, t, R))
    fsoaj = jax.jit(lambda xs, ts: rounds_soa_full(xs, ts, R))
    xsoa = [x32[..., k] for k in range(4)]
    tsoa = [tw32[..., k] for k in range(4)]

    if os.environ.get("PROTO_CHECK_SOA"):
        got = np.stack([np.asarray(v) for v in fsoaj(xsoa, tsoa)], axis=-1)
        want = np.asarray(f32j(x32, tw32))
        assert (got == want).all(), "SoA rounds diverge from AoS rounds"
        print("PROTO_CHECK_SOA ok")
        return

    for name, fn, args in (("u64-lane", f64j, (x64, tw64)),
                           ("u32-lane", f32j, (x32, tw32)),
                           ("u32-SoA", fsoaj, (xsoa, tsoa))):
        fn(*args).block_until_ready()  # compile
        ts = []
        for _ in range(5):
            t0 = time.time()
            fn(*args).block_until_ready()
            ts.append(time.time() - t0)
        per = min(ts) / R / n * 1e9
        print(f"{name}: {min(ts)*1e3:.1f} ms for {R} rounds of mul+add on "
              f"2^{n.bit_length()-1} -> {per:.2f} ns/butterfly-equivalent",
              flush=True)


def from32(limbs32):
    out = np.zeros(limbs32.shape[:-1], dtype=object)
    for k in range(4):
        out = out + (limbs32[..., k].astype(object) << (32 * k))
    return out


if __name__ == "__main__":
    main()
