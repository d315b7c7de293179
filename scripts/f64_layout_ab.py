#!/usr/bin/env python3
"""A/B: Goldilocks ext-mul chains on (n, w) arrays (current layout — w pads
to 128 lanes) vs (w, n) arrays (n dense in the lanes). Quantifies how much
of the VPU the trailing narrow axis wastes in the f64 device prover."""
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

from winterfell_tpu.ops import goldilocks as gl


def rounds(x, tw, n):
    for _ in range(n):
        v = gl.gl_mul(x, tw)
        x = gl.gl_add(x, v)
    return x


def main():
    n = int(os.environ.get("AB_N", str(1 << 21)))
    rng = np.random.default_rng(0)
    R = 10

    for w in (1, 2, 4, 12):
        a = rng.integers(0, gl.P, size=(n, w), dtype=np.uint64)
        x_nm = jnp.asarray(a)          # (n, w): w in the lanes (padded)
        x_mn = jnp.asarray(a.T.copy()) # (w, n): n in the lanes (dense)
        tw_nm = jnp.asarray(a[::-1].copy())
        tw_mn = jnp.asarray(a[::-1].T.copy())

        f = jax.jit(lambda x, t: rounds(x, t, R))
        for name, xx, tt in ((f"(n,{w})", x_nm, tw_nm),
                             (f"({w},n)", x_mn, tw_mn)):
            f(xx, tt).block_until_ready()
            ts = []
            for _ in range(5):
                t0 = time.time()
                f(xx, tt).block_until_ready()
                ts.append(time.time() - t0)
            per = min(ts) / R / (n * w) * 1e9
            print(f"gl mul+add {name}: {min(ts)*1e3:.2f} ms "
                  f"-> {per:.3f} ns/elem", flush=True)


if __name__ == "__main__":
    main()
