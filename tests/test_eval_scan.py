"""The scanned OOD slab evaluation must match the per-slab Python loop
bit-for-bit (same addition order; exercised with a shrunken slab size)."""

import numpy as np

from winterfell_tpu.math.fields import F128
from winterfell_tpu.ops import f128 as eng
from winterfell_tpu.prover import device_limb as dl

rng = np.random.default_rng(3)


def _rand_obj(shape):
    lo = rng.integers(0, 1 << 62, size=shape).astype(object)
    hi = rng.integers(0, 1 << 62, size=shape).astype(object)
    return (lo * (1 << 62) + hi) % F128.p


def test_eval_scan_matches_loop(monkeypatch):
    n, k, d = 256, 3, 2
    polys = eng.to_device(_rand_obj((n, k)))  # base columns (n, k, L)
    pows = eng.to_device(_rand_obj((n, d)))  # (n, d, L)

    loop = None
    S = 32
    for i in range(0, n, S):
        part = dl._eval_cols_base(polys[i : i + S], pows[i : i + S], eng)
        loop = part if loop is None else dl._ext_add_jit(loop, part, eng)

    monkeypatch.setattr(dl, "_EVAL_SLAB", S)
    got = dl._eval_cols_at(polys, pows, eng)
    assert (np.asarray(got) == np.asarray(loop)).all()

    # ext columns too
    polys_e = eng.to_device(_rand_obj((n, k, d)))
    loop = None
    for i in range(0, n, S):
        part = dl._eval_cols_ext(polys_e[i : i + S], pows[i : i + S], eng)
        loop = part if loop is None else dl._ext_add_jit(loop, part, eng)
    got = dl._eval_cols_at(polys_e, pows, eng)
    assert (np.asarray(got) == np.asarray(loop)).all()
