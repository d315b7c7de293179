"""End-to-end prove→verify for the fibonacci examples (model:
examples/src/fibonacci/fib2/tests.rs via examples/src/tests.rs)."""

import pytest

from winterfell_tpu.air import BatchingMethod, FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256, Rp64_256, Sha3_256
from winterfell_tpu.examples.fibonacci import (
    FibAir,
    FibProver,
    FibSmallAir,
    FibSmallProver,
    build_fib_trace,
    compute_fib_term,
)
from winterfell_tpu.math.fields import F64, F128
from winterfell_tpu.verifier import VerifierError, verify


def _options(ext=FieldExtension.NONE, grinding=0, **kw):
    return ProofOptions(
        num_queries=28, blowup_factor=8, grinding_factor=grinding,
        field_extension=ext, fri_folding_factor=4, fri_remainder_max_degree=7, **kw)


def test_fib2_f128_blake3():
    options = _options()
    prover = FibProver(options, Blake3_256)
    trace = build_fib_trace(F128, 256)
    proof = prover.prove(trace)
    result = compute_fib_term(F128, 256)
    verify(FibAir, proof, result, Blake3_256)


def test_fib2_f128_quadratic_extension():
    options = _options(ext=FieldExtension.QUADRATIC)
    prover = FibProver(options, Sha3_256)
    trace = build_fib_trace(F128, 128)
    proof = prover.prove(trace)
    verify(FibAir, proof, compute_fib_term(F128, 128), Sha3_256)


def test_fib_small_f64_cubic_rescue():
    options = _options(ext=FieldExtension.CUBIC)
    prover = FibSmallProver(options, Rp64_256)
    trace = build_fib_trace(F64, 128)
    proof = prover.prove(trace)
    verify(FibSmallAir, proof, compute_fib_term(F64, 128), Rp64_256)


def test_fib2_grinding_and_serde_roundtrip():
    from winterfell_tpu.air.proof import Proof

    options = _options(grinding=4)
    prover = FibProver(options, Blake3_256)
    trace = build_fib_trace(F128, 64)
    proof = prover.prove(trace)
    data = proof.to_bytes()
    proof2 = Proof.from_bytes(data)
    assert proof2 == proof
    verify(FibAir, proof2, compute_fib_term(F128, 64), Blake3_256)
    assert proof.pow_nonce > 0


def test_fib2_wrong_pub_input_fails():
    options = _options()
    prover = FibProver(options, Blake3_256)
    trace = build_fib_trace(F128, 128)
    proof = prover.prove(trace)
    wrong = (compute_fib_term(F128, 128) + 1) % F128.p
    with pytest.raises(VerifierError):
        verify(FibAir, proof, wrong, Blake3_256)


def test_fib2_algebraic_batching():
    options = _options(batching_constraints=BatchingMethod.ALGEBRAIC,
                       batching_deep=BatchingMethod.HORNER)
    prover = FibProver(options, Blake3_256)
    trace = build_fib_trace(F128, 64)
    proof = prover.prove(trace)
    verify(FibAir, proof, compute_fib_term(F128, 64), Blake3_256)
