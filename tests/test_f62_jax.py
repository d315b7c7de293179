"""Oracle tests for the f62 device engine (winterfell_tpu/ops/f62.py)
against the exact host math layer (object-dtype Python ints)."""

import random

import numpy as np
import pytest

from winterfell_tpu.fri.folding import apply_drp, transpose_evaluations
from winterfell_tpu.math import ntt
from winterfell_tpu.math.fields import F62, Field
from winterfell_tpu.ops import f62 as fd

P = F62.p
rng = random.Random(0xF62)


def _rand_obj(shape):
    out = np.empty(shape, dtype=object)
    flat = out.reshape(-1)
    for i in range(flat.shape[0]):
        flat[i] = rng.randrange(P)
    return out


def _rt(arr_obj):
    return fd.to_host(fd.to_device(arr_obj))


def test_limb_roundtrip():
    a = _rand_obj((17,))
    assert (_rt(a) == a).all()
    edge = np.array([0, 1, P - 1, P - 2, (1 << 62) % P], dtype=object)
    assert (_rt(edge) == edge).all()


def test_add_sub_neg():
    a, b = _rand_obj((64,)), _rand_obj((64,))
    da, db = fd.to_device(a), fd.to_device(b)
    assert (fd.to_host(fd.base_add(da, db)) == (a + b) % P).all()
    assert (fd.to_host(fd.base_sub(da, db)) == (a - b) % P).all()
    assert (fd.to_host(fd.base_neg(da)) == (-a) % P).all()
    e = np.array([P - 1, P - 1, 0, 1], dtype=object)
    f = np.array([P - 1, 1, 0, P - 1], dtype=object)
    de, df = fd.to_device(e), fd.to_device(f)
    assert (fd.to_host(fd.base_add(de, df)) == (e + f) % P).all()
    assert (fd.to_host(fd.base_sub(de, df)) == (e - f) % P).all()


def test_mul():
    a, b = _rand_obj((256,)), _rand_obj((256,))
    da, db = fd.to_device(a), fd.to_device(b)
    assert (fd.to_host(fd.base_mul(da, db)) == a * b % P).all()
    e = np.array([P - 1, P - 1, 1, 0, P - 2], dtype=object)
    f = np.array([P - 1, 1, P - 1, P - 1, P - 2], dtype=object)
    assert (fd.to_host(fd.base_mul(fd.to_device(e), fd.to_device(f)))
            == e * f % P).all()


def test_pow_inv():
    a = _rand_obj((32,))
    da = fd.to_device(a)
    for e in (2, 3, 7, 1 << 20, P - 2):
        got = fd.to_host(fd.base_pow_const(da, e))
        want = np.array([pow(int(x), e, P) for x in a], dtype=object)
        assert (got == want).all(), e
    inv = fd.to_host(fd.base_inv(da))
    assert ((inv * a) % P == 1).all()
    assert (fd.to_host(fd.base_inv(fd.to_device(np.array([0], dtype=object))))
            == 0).all()


@pytest.mark.parametrize("d", [2, 3])
def test_ext_ops(d):
    ext = Field(F62, d)
    a = _rand_obj((40, d))
    b = _rand_obj((40, d))
    da, db = fd.to_device(a), fd.to_device(b)
    want_mul = np.array(
        [list(ext.mul(tuple(x), tuple(y))) for x, y in zip(a, b)], dtype=object)
    assert (fd.to_host(fd.ext_mul(da, db)) == want_mul).all()
    want_inv = np.array([list(ext.inv(tuple(x))) for x in a], dtype=object)
    assert (fd.to_host(fd.ext_inv(da)) == want_inv).all()
    want_fr = np.array([list(ext.frobenius(tuple(x))) for x in a], dtype=object)
    assert (fd.to_host(fd.ext_frobenius(da)) == want_fr).all()


@pytest.mark.parametrize("n", [16, 256])
def test_ntt_vs_host_oracle(n):
    a = _rand_obj((n, 1))
    host = ntt.evaluate_poly(F62, a)
    dev = fd.to_host(fd.ntt_evaluate(fd.to_device(a), n))
    assert (host == dev).all()

    host_i = ntt.interpolate_poly(F62, a)
    dev_i = fd.to_host(fd.ntt_interpolate(fd.to_device(a), n))
    assert (host_i == dev_i).all()


def test_ntt_six_step_vs_host_oracle():
    n = 1 << 13
    assert n > fd._SMALL_NTT
    a = _rand_obj((n, 1))
    host = ntt.evaluate_poly(F62, a)
    dev = fd.to_host(fd.ntt_evaluate(fd.to_device(a), n))
    assert (host == dev).all()


@pytest.mark.parametrize("blowup", [2, 8])
def test_ntt_offset_vs_host_oracle(blowup):
    n = 64
    a = _rand_obj((n, 2))
    host = ntt.evaluate_poly_with_offset(F62, a, F62.generator, blowup)
    dev = fd.to_host(
        fd.ntt_evaluate_with_offset(fd.to_device(a), n, F62.generator, blowup))
    assert (host == dev).all()

    host_i = ntt.interpolate_poly_with_offset(F62, host, F62.generator)
    dev_i = fd.to_host(
        fd.ntt_interpolate_with_offset(fd.to_device(host), n * blowup,
                                       F62.generator))
    assert (host_i[:n] == dev_i[:n]).all()


@pytest.mark.parametrize("n_fold", [4, 8])
def test_fri_fold_vs_host(n_fold):
    ext = Field(F62, 2)
    n = 256
    evals = _rand_obj((n, 2))
    alpha = ext.rand(rng)
    host = apply_drp(ext, transpose_evaluations(evals, n_fold),
                     F62.domain_offset, alpha)
    dev = fd.fri_fold(
        fd.to_device(evals), n_fold, F62.domain_offset,
        fd.to_device(np.array(list(alpha), dtype=object)))
    assert (fd.to_host(dev) == host).all()
