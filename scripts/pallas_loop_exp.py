#!/usr/bin/env python3
"""Experiment: Rescue permutation with a fori_loop over rounds (ARK in SMEM)
instead of 7 unrolled rounds with literal constants.

Goal: ~7x smaller Mosaic graph -> fused commit programs compile in ~3 min
instead of ~20, hopefully at the same runtime (rounds are serial anyway).
Compares bytes + timing vs the production unrolled kernel at 2^21 x 12.

Run on TPU only (standalone programs; does not touch production modules).
"""
import os, sys, time
from functools import partial

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from winterfell_tpu.crypto.rescue_constants import RP64_256_ARK1, RP64_256_ARK2
from winterfell_tpu.math.fields import F64
from winterfell_tpu.ops import pallas_rescue as pr

_u32 = pr._u32


def _round_body(state, ark1_pair, ark2_pair):
    """One Rescue round; ark pairs are lists of 12 (lo, hi) SCALAR values
    (traced u32 scalars read from SMEM)."""
    state = pr._sbox(state)
    state = _mds_freq_stacked_scalars(state, ark1_pair)
    state = pr._inv_sbox(state)
    state = _mds_freq_stacked_scalars(state, ark2_pair)
    return state


def _mds_freq_stacked_scalars(st, ark_pairs):
    lo, hi = st
    lanes = [(lo[k : k + 1], hi[k : k + 1]) for k in range(12)]
    out = pr._mds_freq(lanes, None)
    out2 = []
    for k, lane in enumerate(out):
        alo, ahi = ark_pairs[k]
        out2.append(pr._gl_add(lane, (alo, ahi), lazy=True))
    return (jnp.concatenate([o[0] for o in out2], axis=0),
            jnp.concatenate([o[1] for o in out2], axis=0))


def _permutation_loop(state, ark_ref):
    """ark_ref: SMEM (7, 2, 12, 2) u32 — [round, ark1/2, lane, lo/hi]."""

    def body(r, st):
        a1 = [(ark_ref[r, 0, k, 0], ark_ref[r, 0, k, 1]) for k in range(12)]
        a2 = [(ark_ref[r, 1, k, 0], ark_ref[r, 1, k, 1]) for k in range(12)]
        return _round_body(st, a1, a2)

    state = jax.lax.fori_loop(jnp.int32(0), jnp.int32(7), body, state)
    return pr._canon(state)


def _hash_rows_kernel_loop(k, ark_ref, lo_ref, hi_ref, out_lo_ref, out_hi_ref):
    lo, hi = lo_ref[:], hi_ref[:]
    blk = lo.shape[2]
    zeros = jnp.zeros((1, 8, blk), dtype=jnp.uint32)
    kmod = k % pr.P
    first = min(k, 8)
    pad = 8 - first
    cap_lo = [zeros + _u32(kmod & 0xFFFFFFFF)] + [zeros] * 3
    cap_hi = [zeros + _u32(kmod >> 32)] + [zeros] * 3
    st_lo = jnp.concatenate(cap_lo + [lo[:first]] + [zeros] * pad, axis=0)
    st_hi = jnp.concatenate(cap_hi + [hi[:first]] + [zeros] * pad, axis=0)
    state = _permutation_loop((st_lo, st_hi), ark_ref)
    i = 8
    while i < k:
        width = min(8, k - i)
        slo, shi = state
        rate = pr._gl_add((slo[4 : 4 + width], shi[4 : 4 + width]),
                          (lo[i : i + width], hi[i : i + width]))
        tail = 4 + width
        lo_parts = [slo[:4], rate[0]] + ([slo[tail:]] if tail < 12 else [])
        hi_parts = [shi[:4], rate[1]] + ([shi[tail:]] if tail < 12 else [])
        state = _permutation_loop(
            (jnp.concatenate(lo_parts, axis=0),
             jnp.concatenate(hi_parts, axis=0)), ark_ref)
        i += 8
    out_lo_ref[:], out_hi_ref[:] = state[0][4:8], state[1][4:8]


def _ark_array():
    a = np.zeros((7, 2, 12, 2), dtype=np.uint32)
    for r in range(7):
        for k in range(12):
            for j, table in enumerate((RP64_256_ARK1, RP64_256_ARK2)):
                v = int(table[r][k])
                a[r, j, k, 0] = v & 0xFFFFFFFF
                a[r, j, k, 1] = v >> 32
    return jnp.asarray(a)


@partial(jax.jit, static_argnums=(3, 4))
def hash_rows_loop(ark, lo, hi, blk_lanes, interpret=False):
    k, _, lanes = lo.shape
    blk = min(blk_lanes, lanes)
    spec_in = pl.BlockSpec((k, 8, blk), lambda i: (0 * i, 0 * i, i))
    spec_out = pl.BlockSpec((4, 8, blk), lambda i: (0 * i, 0 * i, i))
    # SMEM spec needs an explicit index_map: the default one returns plain
    # zeros that trace as i64 under jax_enable_x64, and Mosaic cannot
    # legalize the resulting i64 func.return on the scalar core
    spec_ark = pl.BlockSpec((7, 2, 12, 2),
                            lambda i: (0 * i, 0 * i, 0 * i, 0 * i),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_hash_rows_kernel_loop, k),
        grid=(lanes // blk,),
        in_specs=[spec_ark, spec_in, spec_in],
        out_specs=(spec_out, spec_out),
        out_shape=(jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32),
                   jax.ShapeDtypeStruct((4, 8, lanes), jnp.uint32)),
        interpret=interpret,
    )(ark, lo, hi)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(41)
    M = 1 << 21
    rows_np = rng.integers(0, F64.p, size=(M, 12), dtype=np.uint64)
    rows_np[0] = F64.p - 1
    rows = jnp.asarray(rows_np)
    ark = _ark_array()

    @jax.jit
    def loop_hash(ark, r):
        lo, hi = pr._split_planes(r)
        out = hash_rows_loop(ark, lo, hi, 512)
        return pr._join_planes(*out)

    @jax.jit
    def prod_hash(r):
        lo, hi = pr._split_planes(r)
        out = pr._hash_rows_call(lo, hi, False)
        return pr._join_planes(*out)

    t0 = time.time()
    got = np.asarray(loop_hash(ark, rows))
    print(f"loop variant compile+run+pull: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    exp = np.asarray(prod_hash(rows))
    print(f"prod variant (cached) run+pull: {time.time()-t0:.1f}s", flush=True)
    ok = np.array_equal(got, exp)
    print("match:", ok, flush=True)
    if not ok:
        bad = np.nonzero(~(got == exp).all(axis=1))[0]
        print(f"  {bad.size} bad rows; first {bad[:5]}", flush=True)
        sys.exit(1)

    @jax.jit
    def loop_sum(ark, r):
        return loop_hash(ark, r).sum()

    @jax.jit
    def prod_sum(r):
        return prod_hash(r).sum()

    for label, fn in (("loop", lambda r: float(loop_sum(ark, r))),
                      ("prod", lambda r: float(prod_sum(r)))):
        fn(rows)
        ts = []
        for _ in range(3):
            r2 = jnp.asarray(
                rng.integers(0, F64.p, size=(M, 12), dtype=np.uint64))
            r2.block_until_ready()
            t0 = time.time()
            fn(r2)
            ts.append(time.time() - t0)
        print(f"{label} hash sum-timed: min {min(ts):.3f}s", flush=True)


if __name__ == "__main__":
    main()
