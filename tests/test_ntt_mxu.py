"""MXU digit-matmul DFT leaves vs the radix-2 f128 NTT (exact oracle)."""

import numpy as np
import pytest

from winterfell_tpu.math.fields import F128
from winterfell_tpu.math import ntt as host_ntt
from winterfell_tpu.ops import f128 as eng
from winterfell_tpu.ops import ntt_mxu

rng = np.random.default_rng(11)


def _rand_obj(shape):
    lo = rng.integers(0, 1 << 62, size=shape).astype(object)
    hi = rng.integers(0, 1 << 62, size=shape).astype(object)
    return (lo * (1 << 62) + hi) % F128.p


@pytest.mark.parametrize("n", [8, 64, 128])
@pytest.mark.parametrize("inverse", [False, True])
def test_leaf_dft_matches_radix2(n, inverse):
    a = _rand_obj((n, 3))
    dev = eng.to_device(a)
    want = np.asarray(eng._ntt_small(dev, n, inverse))
    got = np.asarray(ntt_mxu.leaf_dft(dev, n, inverse))
    assert (want == got).all()


def test_leaf_dft_big_batch_chunks():
    n, B = 64, 1 << 9
    a = _rand_obj((n, B))
    dev = eng.to_device(a)
    want = np.asarray(eng._ntt_small(dev, n, False))
    old = ntt_mxu._CHUNK
    try:
        ntt_mxu._CHUNK = 128  # force the scanned multi-chunk path
        got = np.asarray(ntt_mxu.leaf_dft(dev, n, False))
    finally:
        ntt_mxu._CHUNK = old
    assert (want == got).all()


@pytest.fixture
def mxu_plans(monkeypatch):
    monkeypatch.setattr(eng, "_USE_MXU", True)
    eng.ntt_plan.cache_clear()
    yield
    eng.ntt_plan.cache_clear()


def test_full_ntt_with_mxu_plan_matches_host(mxu_plans):
    n = 1 << 10  # forces six-step decomposition down to MXU leaves
    a = _rand_obj((n, 2))
    dev = eng.to_device(a)
    got = eng.from_limbs_np(np.asarray(eng.ntt_evaluate(dev, n)))
    want = host_ntt.evaluate_poly(F128, np.array(a, dtype=object))
    assert (got == want).all()


def test_full_interpolate_with_mxu_plan_matches_host(mxu_plans):
    n = 1 << 9
    a = _rand_obj((n, 1))
    dev = eng.to_device(a)
    got = eng.from_limbs_np(np.asarray(eng.ntt_interpolate(dev, n)))
    want = host_ntt.interpolate_poly(F128, np.array(a, dtype=object))
    assert (got == want).all()
