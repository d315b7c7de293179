#!/usr/bin/env python3
"""TPU A/B: f128 NTT with MXU digit-matmul leaves vs radix-2 VPU leaves.
Times ntt_evaluate at 2^18/2^20 x 1 column, fresh inputs.

WINTER_MXU_NTT chooses the plan INSIDE one process; to compare both, this
script monkeypatches the plan cache between runs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from winterfell_tpu.utils import compile_cache

compile_cache.enable()

import numpy as np

from winterfell_tpu.math.fields import F128
from winterfell_tpu.ops import f128 as eng

rng = np.random.default_rng(5)


def rand_dev(n):
    lo = rng.integers(0, 1 << 62, size=n).astype(object)
    hi = rng.integers(0, 1 << 62, size=n).astype(object)
    return eng.to_device(((lo * (1 << 62) + hi) % F128.p)[:, None])


def bench(label, n):
    x = rand_dev(n)
    out = eng.ntt_evaluate(x, n)
    out.block_until_ready()  # compile
    ts = []
    for _ in range(3):
        x2 = rand_dev(n)
        x2.block_until_ready()
        t0 = time.time()
        eng.ntt_evaluate(x2, n).block_until_ready()
        ts.append(time.time() - t0)
    print(f"{label} n=2^{n.bit_length()-1}: min {min(ts)*1e3:.1f} ms",
          flush=True)
    return min(ts)


def main():
    print("backend:", jax.default_backend(), "mxu:", eng._mxu_enabled(),
          flush=True)
    for n in (1 << 18, 1 << 20):
        t_mxu = bench("mxu-leaf", n)
        # switch to radix-2 leaves: clear caches, disable mxu
        eng.ntt_plan.cache_clear()
        eng._USE_MXU = False
        t_r2 = bench("radix2  ", n)
        eng.ntt_plan.cache_clear()
        eng._USE_MXU = True
        print(f"  speedup: {t_r2 / t_mxu:.2f}x", flush=True)


if __name__ == "__main__":
    main()
