#!/usr/bin/env python3
"""Locate where the Pallas leaf-hash wall time goes: split / kernel / join,
vs the raw jnp permutation and the strided merge level."""
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
rng = np.random.default_rng(23)
M = 1 << 21


def timeit(label, make_args, fn, n=3):
    fn(*make_args())
    ts = []
    for _ in range(n):
        args = make_args()
        for a in args:
            a.block_until_ready()
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts)*1e3:.1f} ms", flush=True)


def rows12():
    return (jnp.asarray(rng.integers(0, F64.p, size=(M, 12), dtype=np.uint64)),)


def planes12():
    lo, hi = pr._split_planes(rows12()[0])
    return (lo.block_until_ready(), hi.block_until_ready())


def digs():
    return (jnp.asarray(rng.integers(0, F64.p, size=(M, 4), dtype=np.uint64)),)


split_j = jax.jit(pr._split_planes)
join_j = jax.jit(pr._join_planes)
perm_j = jax.jit(gl.rp64_permutation_rows)

timeit("split_planes (2^21,12)", rows12, lambda r: split_j(r))
timeit("pallas kernel only k=12", planes12,
       lambda lo, hi: pr._hash_rows_call(lo, hi, False))
timeit("join_planes (4,8,2^18)",
       lambda: tuple(jnp.asarray(rng.integers(0, 1 << 32, size=(4, 8, M // 8),
                                              dtype=np.uint32)) for _ in range(2)),
       lambda lo, hi: join_j(lo, hi))
timeit("jnp permutation_rows (2^21,12)", rows12, lambda r: perm_j(r))
timeit("jnp merge_level strided (2^21,4)", digs, lambda d: gl._merge_level(d))
timeit("pallas full hash (2^21,12)", rows12,
       lambda r: pr.rp64_hash_rows_pallas(r))
