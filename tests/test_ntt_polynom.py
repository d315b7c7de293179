"""NTT and polynomial oracle tests (model: math/src/fft/tests.rs — FFT is
checked against naive evaluation, with and without coset offset)."""

import random

import numpy as np
import pytest

from winterfell_tpu.math import ntt, polynom, vecmath as vm
from winterfell_tpu.math.fields import F62, F64, F128, Field


def _rand_coeffs(field, n, seed=0):
    rng = random.Random(seed)
    return [field.rand(rng) for _ in range(n)]


@pytest.mark.parametrize("base", [F64, F62, F128])
def test_evaluate_poly_matches_naive(base):
    field = Field(base, 1)
    n = 16
    coeffs = _rand_coeffs(field, n)
    evals = ntt.evaluate_poly(base, vm.asarray(coeffs))
    g = ntt.get_root(base, n)
    xs = [(pow(g, i, base.p),) for i in range(n)]
    expected = polynom.eval_many(field, coeffs, xs)
    assert vm.totuples(evals) == expected


@pytest.mark.parametrize("base", [F64, F128])
@pytest.mark.parametrize("blowup", [2, 8])
def test_evaluate_with_offset_matches_naive(base, blowup):
    field = Field(base, 1)
    n = 8
    coeffs = _rand_coeffs(field, n, seed=1)
    offset = base.generator
    evals = ntt.evaluate_poly_with_offset(base, vm.asarray(coeffs), offset, blowup)
    h = ntt.get_root(base, n * blowup)
    xs = [(offset * pow(h, m, base.p) % base.p,) for m in range(n * blowup)]
    expected = polynom.eval_many(field, coeffs, xs)
    assert vm.totuples(evals) == expected


@pytest.mark.parametrize("base", [F64, F128])
def test_interpolate_roundtrip(base):
    field = Field(base, 1)
    n = 32
    coeffs = vm.asarray(_rand_coeffs(field, n, seed=2))
    assert vm.totuples(ntt.interpolate_poly(base, ntt.evaluate_poly(base, coeffs))) \
        == vm.totuples(coeffs)
    offset = base.generator
    lde = ntt.evaluate_poly_with_offset(base, coeffs, offset, 4)
    back = ntt.interpolate_poly_with_offset(base, lde[::4], offset)
    assert vm.totuples(back) == vm.totuples(coeffs)


def test_ntt_extension_field_elements():
    """NTT broadcasts over the trailing extension axis (mul_base semantics)."""
    field = Field(F64, 3)
    n = 16
    coeffs = _rand_coeffs(field, n, seed=3)
    evals = ntt.evaluate_poly(F64, vm.asarray(coeffs))
    g = ntt.get_root(F64, n)
    xs = [field.from_base(pow(g, i, F64.p)) for i in range(n)]
    expected = polynom.eval_many(field, coeffs, xs)
    assert vm.totuples(evals) == expected


def test_ntt_matrix_columns():
    """(n, width) base matrix NTT == per-column NTT."""
    base = F64
    n, w = 16, 3
    rng = random.Random(4)
    mat = np.array([[rng.randrange(base.p) for _ in range(w)] for _ in range(n)],
                   dtype=object)
    evals = ntt.evaluate_poly(base, mat)
    for c in range(w):
        col = ntt.evaluate_poly(base, mat[:, c : c + 1])
        assert list(evals[:, c]) == list(col[:, 0])


def test_syn_div_exact():
    field = Field(F64, 1)
    rng = random.Random(5)
    q = _rand_coeffs(field, 7, seed=5)
    b = field.rand(rng)
    a = 4
    # p = q * (x^a - b)
    divisor = [field.neg(b)] + [field.zero()] * (a - 1) + [field.one()]
    p = polynom.mul(field, q, divisor)
    assert polynom.syn_div(field, p, a, b) == q


def test_interpolate_lagrange():
    field = Field(F64, 2)
    rng = random.Random(6)
    coeffs = _rand_coeffs(field, 8, seed=6)
    xs = []
    seen = set()
    while len(xs) < 8:
        x = field.rand(rng)
        if x not in seen:
            seen.add(x)
            xs.append(x)
    ys = polynom.eval_many(field, coeffs, xs)
    got = polynom.interpolate(field, xs, ys)
    assert got == coeffs


def test_degree_of_and_poly_from_roots():
    field = Field(F64, 1)
    roots = [(3,), (5,), (7,)]
    p = polynom.poly_from_roots(field, roots)
    assert polynom.degree_of(field, p) == 3
    for r in roots:
        assert polynom.eval_poly(field, p, r) == field.zero()


def test_batch_inversion():
    field = Field(F64, 1)
    rng = random.Random(7)
    vals = [rng.randrange(1, F64.p) for _ in range(20)] + [0]
    arr = vm.base_asarray(vals)
    inv = vm.batch_inversion_base(F64, arr)
    for v, iv in zip(vals, inv):
        if v == 0:
            assert iv == 0
        else:
            assert v * iv % F64.p == 1


def test_infer_degree():
    """fft/mod.rs:518-542 doc example semantics: evaluations of x^2 + 1."""
    from winterfell_tpu.math.ntt import evaluate_poly, evaluate_poly_with_offset, infer_degree

    p = F64.p
    coeffs = np.array([[1], [0], [1], [0]], dtype=object)  # 1 + x^2
    evals = evaluate_poly(F64, coeffs)
    assert infer_degree(F64, evals) == 2
    evals_coset = evaluate_poly_with_offset(F64, coeffs, F64.generator, 2)
    assert infer_degree(F64, evals_coset, F64.generator) == 2
    zero = np.zeros((8, 1), dtype=object)
    assert infer_degree(F64, zero) == 0
