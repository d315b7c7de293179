#!/usr/bin/env python3
"""TPU micro-benchmark: split prove-phase time into dispatch latency vs
kernel compute. Times (warm, after one compile call):

- null dispatch: tiny jitted add on a (8,128) array
- rp64_hash_rows on (2^21, 12) rows (the leaf-hash kernel)
- merge level at 2^20 (one Merkle reduction step)
- ntt_evaluate at 2^21 x 1 col
- padded gather of 256 rows from a (2^21, 4) array (query fetch path)
- device->host transfer of a (2^16, 4) digest level
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from winterfell_tpu.ops import goldilocks as gl

def timeit(label, fn, n=5):
    fn()  # warm (compile)
    t0 = time.time(); fn(); t1 = time.time()
    ts = []
    for _ in range(n):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    print(f"{label}: min {min(ts)*1e3:.1f} ms  med {sorted(ts)[len(ts)//2]*1e3:.1f} ms", flush=True)

@jax.jit
def _null(x):
    return x + jnp.uint64(1)

x_small = jnp.zeros((8, 128), dtype=jnp.uint64)
timeit("null dispatch", lambda: _null(x_small).block_until_ready())

m = 1 << 21
rows = jnp.asarray(np.random.randint(0, 1 << 62, size=(m, 12), dtype=np.uint64))
timeit("rp64_hash_rows (2^21,12)", lambda: gl.rp64_hash_rows(rows).block_until_ready(), n=3)

digs = jnp.asarray(np.random.randint(0, 1 << 62, size=(1 << 21, 4), dtype=np.uint64))
timeit("merge_level 2^21->2^20", lambda: gl._merge_level(digs).block_until_ready(), n=3)

col = jnp.asarray(np.random.randint(0, gl.P, size=(1 << 21, 1), dtype=np.uint64))
timeit("ntt_evaluate 2^21 x1", lambda: gl.ntt_evaluate(col, 1 << 21).block_until_ready(), n=3)

col2 = jnp.asarray(np.random.randint(0, gl.P, size=(1 << 21, 2), dtype=np.uint64))
timeit("ntt_evaluate 2^21 x2", lambda: gl.ntt_evaluate(col2, 1 << 21).block_until_ready(), n=3)

from winterfell_tpu.prover.device import _padded_take
idx = sorted(np.random.choice(1 << 21, 256, replace=False).tolist())
timeit("padded_take 256 rows of (2^21,4)", lambda: _padded_take(digs, idx), n=3)

lvl = jnp.asarray(np.random.randint(0, 1 << 62, size=(1 << 16, 4), dtype=np.uint64))
timeit("pull (2^16,4) to host", lambda: np.asarray(lvl), n=3)
