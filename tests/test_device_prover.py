"""Device (JAX) prover vs host prover: proof bytes must be IDENTICAL.

This is the pin that keeps the two pipelines in lock-step: every transcript
draw, commitment, OOD value, FRI layer and query byte must match.

Each byte-pin runs in a fresh interpreter (tests/isolation.py): XLA:CPU
segfaults nondeterministically compiling the resident whole-proof programs
inside long pytest processes (the round-4 crash class).
"""

import pytest

from tests.isolation import run_isolated

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Rp64_256
from winterfell_tpu.examples.fibonacci import (
    FibSmallAir,
    FibSmallProver,
    build_fib_trace,
    compute_fib_term,
)
from winterfell_tpu.math.fields import F64
from winterfell_tpu.prover.device import GoldilocksProver
from winterfell_tpu.verifier import verify

GoldilocksFibProver = GoldilocksProver.accelerate(FibSmallProver)


def _device_proof_check(ext_name: str):
    ext = getattr(FieldExtension, ext_name)
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    trace = build_fib_trace(F64, 256)
    host_proof = FibSmallProver(options, Rp64_256).prove(trace)
    dev_proof = GoldilocksFibProver(options, Rp64_256).prove(
        build_fib_trace(F64, 256))
    assert dev_proof.to_bytes() == host_proof.to_bytes()
    verify(FibSmallAir, dev_proof, compute_fib_term(F64, 256), Rp64_256)


def _dev_none():
    _device_proof_check("NONE")


def _dev_quad():
    _device_proof_check("QUADRATIC")


def _dev_cubic():
    _device_proof_check("CUBIC")


@pytest.mark.parametrize("fn", ["_dev_none", "_dev_quad", "_dev_cubic"])
def test_device_proof_matches_host_proof(fn):
    run_isolated("tests.test_device_prover", fn, "F64_PIN_OK")


def _grinding_check():
    options = ProofOptions(28, 8, 4, FieldExtension.CUBIC, 8, 31)
    trace = build_fib_trace(F64, 128)
    host_proof = FibSmallProver(options, Rp64_256).prove(trace)
    dev_proof = GoldilocksFibProver(options, Rp64_256).prove(
        build_fib_trace(F64, 128))
    assert dev_proof.to_bytes() == host_proof.to_bytes()


def test_device_proof_with_grinding():
    run_isolated("tests.test_device_prover", "_grinding_check", "F64_PIN_OK")
