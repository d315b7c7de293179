#!/usr/bin/env python3
"""Full-size TPU check: pallas leaf hash vs jnp oracle on ALL 2^21 rows,
plus honest timing via a jitted digest-sum (scalar D2H forces completion)."""
import os, sys, time

os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from winterfell_tpu.math.fields import F64
from winterfell_tpu.ops import goldilocks as gl
from winterfell_tpu.ops import pallas_rescue as pr

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(31)
M = 1 << 21

rows_np = rng.integers(0, F64.p, size=(M, 12), dtype=np.uint64)
rows = jnp.asarray(rows_np)

# one fully-jitted program: split -> pallas grid kernel -> join
@jax.jit
def pallas_hash(r):
    lo, hi = pr._split_planes(r)
    out_lo, out_hi = pr._hash_rows_call(lo, hi, False)
    return pr._join_planes(out_lo, out_hi)


t0 = time.time()
got = np.asarray(pallas_hash(rows))
print(f"pallas full-size hash+transfer: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
exp = np.asarray(gl.rp64_hash_rows(rows[: M - 1024]))  # jnp path (m%1024!=0)
print(f"jnp hash+transfer: {time.time()-t0:.2f}s", flush=True)

ok = np.array_equal(got[: M - 1024], exp)
print("ALL-ROWS match:", ok, flush=True)
if not ok:
    bad = np.nonzero(~(got[: M - 1024] == exp).all(axis=1))[0]
    print(f"  {bad.size} bad rows; first at {bad[:8]}", flush=True)
    sys.exit(1)

# honest timing: jitted sum -> 1 scalar out, include it in the program
@jax.jit
def pallas_hash_sum(r):
    return pallas_hash(r).sum()


@jax.jit
def jnp_hash_sum(r):
    return gl.rp64_hash_rows(r).sum()


for label, fn, arg in (
    ("pallas hash (sum-timed)", pallas_hash_sum, rows),
    ("jnp    hash (sum-timed)", jnp_hash_sum, rows[: M - 1024]),
):
    fn(arg)  # compile
    ts = []
    for _ in range(3):
        r2 = jnp.asarray(rng.integers(0, F64.p, size=arg.shape, dtype=np.uint64))
        r2.block_until_ready()
        t0 = time.time()
        float(fn(r2))  # scalar pull = completion barrier
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts):.3f}s  {ts}", flush=True)
