"""Montgomery batch inversion vs the Fermat-chain inverse — all engines,
including zero elements and the pad path (n not needed: sizes are pow2,
but the guard must hold for the small-array fallback too)."""

import numpy as np

from winterfell_tpu.math.fields import F62, F128, GOLDILOCKS_P
from winterfell_tpu.ops import f62 as f62_eng
from winterfell_tpu.ops import f128 as f128_eng
from winterfell_tpu.ops import goldilocks as gl

rng = np.random.default_rng(7)


def test_gl_batch_inv_matches_fermat():
    for n in (64, 512, 1 << 12):  # 64 exercises the small-array fallback
        a = rng.integers(0, GOLDILOCKS_P, size=n, dtype=np.uint64)
        a[0] = 0
        a[n // 2] = 0
        want = np.asarray(gl.gl_inv(gl.jnp.asarray(a)))
        got = np.asarray(gl.gl_batch_inv(gl.jnp.asarray(a)))
        assert (want == got).all()


def test_gl_ext_batch_inv_matches():
    for d in (2, 3):
        a = rng.integers(0, GOLDILOCKS_P, size=(512, d), dtype=np.uint64)
        a[3] = 0
        want = np.asarray(gl.ext_inv(gl.jnp.asarray(a)))
        got = np.asarray(gl.ext_batch_inv(gl.jnp.asarray(a)))
        assert (want == got).all()


def _rand_obj(p, shape):
    lo = rng.integers(0, 1 << 62, size=shape).astype(object)
    hi = rng.integers(0, 1 << 62, size=shape).astype(object)
    return (lo * (1 << 62) + hi) % p


def test_f128_batch_inv_matches():
    a = _rand_obj(F128.p, (512,))
    a[0] = 0
    dev = f128_eng.to_device(a)
    want = f128_eng.from_limbs_np(np.asarray(f128_eng.f128_inv(dev)))
    got = f128_eng.from_limbs_np(np.asarray(f128_eng.f128_batch_inv(dev)))
    assert list(want) == list(got)


def test_f128_ext_batch_inv_matches():
    a = _rand_obj(F128.p, (300, 2))  # non-multiple of 128: pad path
    dev = f128_eng.to_device(a)
    want = f128_eng.from_limbs_np(np.asarray(f128_eng.ext_inv(dev)))
    got = f128_eng.from_limbs_np(np.asarray(f128_eng.ext_batch_inv(dev)))
    assert (want == got).all()


def test_f62_batch_inv_matches():
    a = _rand_obj(F62.p, (512,))
    a[1] = 0
    dev = f62_eng.to_device(a)
    want = f62_eng.from_limbs_np(np.asarray(f62_eng.base_inv(dev)))
    got = f62_eng.from_limbs_np(np.asarray(f62_eng.base_batch_inv(dev)))
    assert list(want) == list(got)


def test_f62_ext_batch_inv_matches():
    for d in (2, 3):
        a = _rand_obj(F62.p, (256, d))
        dev = f62_eng.to_device(a)
        want = f62_eng.from_limbs_np(np.asarray(f62_eng.ext_inv(dev)))
        got = f62_eng.from_limbs_np(np.asarray(f62_eng.ext_batch_inv(dev)))
        assert (want == got).all()
