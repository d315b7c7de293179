"""Security estimator + AcceptableOptions tests (mirrors the reference unit
tests' expectations in air/src/proof/security.rs tests)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.air.security import ConjecturedSecurity, ProvenSecurity
from winterfell_tpu.crypto.hashers import Blake3_256


def _options(queries=28, blowup=8, grinding=16, ext=FieldExtension.NONE):
    return ProofOptions(queries, blowup, grinding, ext, 4, 7)


def test_conjectured_security_basic():
    # 28 queries × log2(8) = 84 ≥ 80 floor → + grinding 16 → 100 − 1 = 99
    sec = ConjecturedSecurity.compute(_options(), 128, 128)
    assert sec.bits == 99
    assert sec.is_at_least(99) and not sec.is_at_least(100)


def test_conjectured_security_field_capped():
    # quadratic extension of a 64-bit field: field security 128; query
    # security dominates the min at high query counts
    sec = ConjecturedSecurity.compute(
        _options(queries=100, ext=FieldExtension.QUADRATIC), 64, 256)
    assert sec.bits == 127  # min(128, 316) - 1


def test_conjectured_security_collision_capped():
    sec = ConjecturedSecurity.compute(_options(queries=100), 128, 96)
    assert sec.bits == 96


def test_grinding_floor():
    # 20 queries × 3 = 60 < 80 floor → grinding not counted
    sec = ConjecturedSecurity.compute(_options(queries=20), 128, 128)
    assert sec.bits == 59


def test_proven_security_sane():
    sec = ProvenSecurity.compute(_options(queries=80, ext=FieldExtension.QUADRATIC),
                                 64, 1 << 18, 128, 100, 10)
    # proven security is lower than conjectured but must be positive and
    # bounded by collision resistance
    assert 0 < sec.list_decoding <= 128
    assert 0 < sec.unique_decoding <= 128
    assert sec.is_at_least(min(sec.list_decoding, sec.unique_decoding))


def test_acceptable_options_in_verify():
    from winterfell_tpu.examples.fibonacci import (
        FibAir, FibProver, build_fib_trace, compute_fib_term)
    from winterfell_tpu.math.fields import F128
    from winterfell_tpu.verifier import AcceptableOptions, VerifierError, verify

    options = _options(grinding=0)
    prover = FibProver(options, Blake3_256)
    trace = build_fib_trace(F128, 64)
    proof = prover.prove(trace)
    result = compute_fib_term(F128, 64)

    verify(FibAir, proof, result, Blake3_256,
           AcceptableOptions(option_set=[options]))
    verify(FibAir, proof, result, Blake3_256,
           AcceptableOptions(min_conjectured_security=80))
    with pytest.raises(VerifierError):
        verify(FibAir, proof, result, Blake3_256,
               AcceptableOptions(min_conjectured_security=120))
    with pytest.raises(VerifierError):
        verify(FibAir, proof, result, Blake3_256,
               AcceptableOptions(option_set=[_options(queries=54)]))
