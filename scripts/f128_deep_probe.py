#!/usr/bin/env python3
"""Time the f128 DEEP-phase building blocks one by one on the TPU (warm,
after one compile call each): z-power tables, OOD column evaluation, the
fused DEEP combine, and the batch inversion on its own. Sizes match the
rescue_f128 bench at BENCH_TRACE_LOG2=18 (trace 2^18, LDE 2^20, d=1).

env: PROBE_LOG2 (trace exponent, default 18)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from winterfell_tpu.utils import compile_cache

compile_cache.enable()

import jax.numpy as jnp
import numpy as np

from winterfell_tpu.math.fields import F128, Field
from winterfell_tpu.ops import f128 as eng
from winterfell_tpu.prover import device_limb as dl

LOG2 = int(os.environ.get("PROBE_LOG2", "18"))
n = 1 << LOG2
blowup = 4
lde = n * blowup
d = 1
ext = Field(F128, d)

rng = np.random.default_rng(0)


def rand_limbs(shape):
    return jnp.asarray(
        rng.integers(0, 1 << 32, size=shape + (4,), dtype=np.uint64))


def timeit(label, fn, rounds=3):
    fn()  # compile / cache
    ts = []
    for _ in range(rounds):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"{label:44s} min {min(ts)*1e3:8.1f} ms", flush=True)


main_lde = rand_limbs((lde, 4))
comp_lde = rand_limbs((lde, 1, d))
main_polys = rand_limbs((n, 4))
comp_cols = rand_limbs((n, 1, d))
xs = eng._power_series_dev(F128.get_root_of_unity(LOG2 + 2), lde, 7)
z = tuple(int(x) for x in np.asarray(
    rng.integers(0, 1 << 62, size=(d,), dtype=np.uint64)))

# 1. z-power table build
timeit("z_power_table (n)", lambda: dl._z_power_table(
    eng, ext, z, n).block_until_ready())

z_pows = dl._z_power_table(eng, ext, z, n)

# 2. OOD evaluation of the 4 main columns
timeit("eval_cols_at main (n,4)", lambda: np.asarray(
    dl._eval_cols_at(main_polys, z_pows, eng)))
timeit("eval_cols_at comp (n,1,d)", lambda: np.asarray(
    dl._eval_cols_at(comp_cols, z_pows, eng)))

# 3. batch inversion alone at LDE size
den = rand_limbs((lde,))
timeit("f128_batch_inv (lde)",
       lambda: jax.jit(eng.f128_batch_inv)(den).block_until_ready())

# 4. plain mul chain at LDE size (16 muls/pt) for calibration


@jax.jit
def mul16(a, b):
    acc = a
    for _ in range(16):
        acc = eng.f128_mul(acc, b)
    return acc


timeit("16x f128_mul chain (lde)",
       lambda: mul16(den, den).block_until_ready())

# 5. the fused DEEP program exactly as the prover runs it


class _Dummy:
    engine = eng


prover = object.__new__(dl.F128Prover)
k = 4 + 1
cc_arr = rand_limbs((k, d))
adj_z = rand_limbs((k, d))
adj_gz = rand_limbs((k, d))
z_arr = rand_limbs((1, d))
zg_arr = rand_limbs((1, d))
fn = dl.F128Prover._get_deep_fn(prover, d, lde, 0)
timeit("fused DEEP fn (lde)", lambda: fn(
    main_lde, None, comp_lde, cc_arr, adj_z, adj_gz, z_arr, zg_arr,
    xs).block_until_ready())

# 6. FRI fold for scale
alpha = rand_limbs((d,))
ev = rand_limbs((lde, d))
timeit("fri_fold N=8 (lde)", lambda: eng.fri_fold(
    ev, 8, 7, alpha).block_until_ready())
