"""E2E tests for the fib8 / mulfib2 / mulfib8 example variants."""

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.fibonacci import (
    Fib8Air,
    Fib8Prover,
    MulFib2Air,
    MulFib2Prover,
    MulFib8Air,
    MulFib8Prover,
    build_fib8_trace,
    build_mulfib8_trace,
    build_mulfib_trace,
    compute_fib_term,
    compute_mulfib_term,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.verifier import verify


def _options():
    return ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)


def test_fib8_e2e():
    trace = build_fib8_trace(F128, 1024)
    prover = Fib8Prover(_options(), Blake3_256)
    proof = prover.prove(trace)
    result = prover.get_pub_inputs(trace)
    assert result == compute_fib_term(F128, 1024)
    verify(Fib8Air, proof, result, Blake3_256)


def test_mulfib2_e2e():
    trace = build_mulfib_trace(F128, 256)
    prover = MulFib2Prover(_options(), Blake3_256)
    proof = prover.prove(trace)
    result = prover.get_pub_inputs(trace)
    assert result == compute_mulfib_term(F128, 255)
    verify(MulFib2Air, proof, result, Blake3_256)


def test_mulfib8_e2e():
    trace = build_mulfib8_trace(F128, 1024)
    prover = MulFib8Prover(_options(), Blake3_256)
    proof = prover.prove(trace)
    result = prover.get_pub_inputs(trace)
    verify(MulFib8Air, proof, result, Blake3_256)
