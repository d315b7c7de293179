import random

import pytest

from winterfell_tpu.math.fields import (
    F62, F62_CUBE, F62_QUAD, F64, F64_CUBE, F64_QUAD, F128, F128_QUAD,
    F62_1, F64_1, F128_1,
)

ALL_FIELDS = [F64_1, F62_1, F128_1, F64_QUAD, F64_CUBE, F62_QUAD, F62_CUBE, F128_QUAD]


@pytest.mark.parametrize("base", [F64, F62, F128])
def test_two_adic_roots(base):
    r = base.two_adic_root
    assert pow(r, 1 << base.two_adicity, base.p) == 1
    assert pow(r, 1 << (base.two_adicity - 1), base.p) == base.p - 1
    # generator of roots of unity for small domains
    g8 = base.get_root_of_unity(3)
    assert pow(g8, 8, base.p) == 1
    assert pow(g8, 4, base.p) != 1


def test_f64_64_domain_generator_is_8():
    # the reference chose TWO_ADIC_ROOT so that the 2^6-domain generator is 8
    # (math/src/field/f64/mod.rs:255-267)
    assert F64.get_root_of_unity(6) == 8


@pytest.mark.parametrize("F", ALL_FIELDS, ids=lambda f: f.name)
def test_field_axioms(F):
    rng = random.Random(42)
    for _ in range(10):
        a, b, c = F.rand(rng), F.rand(rng), F.rand(rng)
        assert F.add(a, b) == F.add(b, a)
        assert F.mul(a, b) == F.mul(b, a)
        assert F.mul(a, F.add(b, c)) == F.add(F.mul(a, b), F.mul(a, c))
        assert F.mul(F.mul(a, b), c) == F.mul(a, F.mul(b, c))
        if a != F.zero():
            assert F.mul(a, F.inv(a)) == F.one()
        assert F.sub(a, a) == F.zero()
        assert F.add(a, F.neg(a)) == F.zero()
        assert F.exp(a, 5) == F.mul(F.mul(F.mul(F.mul(a, a), a), a), a)


@pytest.mark.parametrize("F", [F64_QUAD, F64_CUBE, F62_QUAD, F62_CUBE, F128_QUAD],
                         ids=lambda f: f.name)
def test_extension_structure(F):
    rng = random.Random(7)
    a = F.rand(rng)
    # multiplicative group order
    assert F.exp(a, F.p ** F.degree - 1) == F.one()
    # frobenius is the p-power map
    assert F.frobenius(a) == F.exp(a, F.p)
    # embedding of base respects mul
    x, y = rng.randrange(F.p), rng.randrange(F.p)
    assert F.mul(F.from_base(x), F.from_base(y)) == F.from_base(x * y % F.p)


def test_f64_cubic_frobenius_matches_reference_constants():
    # hard-coded SageMath constants at math/src/field/f64/mod.rs:493-497
    imgs = F64_CUBE._frobenius_images()
    assert imgs[1] == (10615703402128488253, 10050274602728160328, 11746561000929144102)
    assert imgs[2] == (6700183068485440220, 14531223735771536287, 8396469466686423992)


@pytest.mark.parametrize("F", ALL_FIELDS, ids=lambda f: f.name)
def test_byte_roundtrip(F):
    rng = random.Random(3)
    a = F.rand(rng)
    b = F.to_le_bytes(a)
    assert len(b) == F.element_bytes
    assert F.from_le_bytes(b) == a
    assert F.try_from_random_bytes(b) == a
    # non-canonical bytes are rejected
    bad = (2**(8 * F.base.element_bytes) - 1).to_bytes(F.base.element_bytes, "little")
    assert F.base.try_from_le_bytes(bad) is None
