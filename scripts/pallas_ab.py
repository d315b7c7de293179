#!/usr/bin/env python3
"""TPU A/B: new (k,8,blk)-layout Pallas Rescue kernels vs the jnp-u64 path.

Verifies byte-equality on random rows (incl. p-1 / 0 edge rows), then times
leaf hashing at 2^21 x 12 and a 2^20 merge level, both paths, fresh-input
timing (new device arrays each rep so XLA cannot cache)."""
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

rng = np.random.default_rng(17)


def rand_rows(m, k):
    rows = rng.integers(0, F64.p, size=(m, k), dtype=np.uint64)
    rows[0, :] = F64.p - 1
    rows[1, :] = 0
    return rows


# ---- correctness: hash k in {8, 12, 24}, merge -----------------------------
for k in (8, 12, 24):
    rows = rand_rows(4096, k)
    t0 = time.time()
    got = np.asarray(pr.rp64_hash_rows_pallas(jnp.asarray(rows)))
    t1 = time.time()
    exp = np.asarray(gl.rp64_hash_rows(jnp.asarray(rows[:128])))
    ok = np.array_equal(got[:128], exp)
    print(f"hash k={k}: match={ok} (compile+run {t1-t0:.1f}s)", flush=True)
    if not ok:
        bad = np.nonzero(~(got[:128] == exp).all(axis=1))[0][:4]
        print("  first bad rows:", bad, got[bad], exp[bad], flush=True)
        sys.exit(1)

left, right = rand_rows(4096, 4), rand_rows(4096, 4)
got = np.asarray(pr.rp64_merge_rows_pallas(jnp.asarray(left), jnp.asarray(right)))
exp = np.asarray(gl.rp64_merge_rows(jnp.asarray(left[:128]), jnp.asarray(right[:128])))
ok = np.array_equal(got[:128], exp)
print("merge: match=", ok, flush=True)
if not ok:
    sys.exit(1)

# ---- timing ----------------------------------------------------------------
M = 1 << 21


def timeit(label, make_args, fn, n=3):
    fn(*make_args())  # compile
    ts = []
    for _ in range(n):
        args = make_args()
        for a in args:
            a.block_until_ready()
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts):.3f}s med {sorted(ts)[len(ts)//2]:.3f}s",
          flush=True)


def fresh_rows():
    return (jnp.asarray(rng.integers(0, F64.p, size=(M, 12), dtype=np.uint64)),)


def fresh_digs():
    return (jnp.asarray(rng.integers(0, F64.p, size=(M, 4), dtype=np.uint64)),)


timeit("pallas hash (2^21,12)", fresh_rows,
       lambda r: pr.rp64_hash_rows_pallas(r))
timeit("jnp    hash (2^21,12)", fresh_rows,
       lambda r: gl.rp64_hash_rows(r[:M - 128]))  # m%1024!=0 -> jnp path
timeit("pallas merge 2^21->2^20", fresh_digs,
       lambda d: pr.rp64_merge_rows_pallas(d[0::2], d[1::2]))
timeit("jnp    merge 2^21->2^20", fresh_digs,
       lambda d: gl.rp64_merge_rows(d[0::2][: (M // 2) - 128],
                                    d[1::2][: (M // 2) - 128]))
