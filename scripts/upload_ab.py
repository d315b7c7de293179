#!/usr/bin/env python3
"""Host->device transfer A/B on the axon tunnel: layout & dtype variants of
a 2^20 x 4-element f128 trace (64 MB logical)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from winterfell_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np

n, w = 1 << 20, 4
rng = np.random.default_rng(0)
pairs = rng.integers(0, 1 << 63, size=(n, w, 2), dtype=np.uint64)  # 64 MB
v32 = np.ascontiguousarray(pairs).view(np.uint32).reshape(n, w, 4)
v64 = v32.astype(np.uint64)  # 128 MB, the current upload

widen = jax.jit(lambda f: f.reshape(n, w, 4).astype(jnp.uint64))
widen2 = jax.jit(
    lambda f: f.astype(jnp.uint64).reshape(n, w, 4))


def timeit(label, fn, rounds=3):
    fn()  # compile/cache
    ts = []
    for _ in range(rounds):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label}: min {min(ts):.2f}s", flush=True)


timeit("u64 (n,4,4) asarray   [current]",
       lambda: jnp.asarray(v64).block_until_ready())
timeit("u32 (n,4,4) asarray           ",
       lambda: jnp.asarray(v32).block_until_ready())
timeit("u32 flat 1-D asarray          ",
       lambda: jnp.asarray(v32.reshape(-1)).block_until_ready())
timeit("u32 flat + device widen+shape ",
       lambda: widen(jnp.asarray(v32.reshape(-1))).block_until_ready())
timeit("u64 pairs (n,4,2) asarray     ",
       lambda: jnp.asarray(pairs).block_until_ready())
