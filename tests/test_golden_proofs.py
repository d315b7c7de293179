"""Golden proof fixtures: SHA3-256 of full proof bytes for fixed configs.

These pin the entire transcript (seed layout, reseed order, rejection
sampling, serde, Merkle shapes, FRI layout). Any change to these hashes means
proof bytes changed — which either breaks reference compatibility or must be
a deliberate, documented protocol change.
"""

import hashlib

import pytest

from winterfell_tpu.air import BatchingMethod, FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256, Rp64_256, Sha3_256
from winterfell_tpu.examples.fibonacci import FibProver, FibSmallProver, build_fib_trace
from winterfell_tpu.examples.rescue import RescueProver, build_rescue_trace
from winterfell_tpu.examples.vdf import VdfProver, build_vdf_trace
from winterfell_tpu.math.fields import F64, F128

# (name, builder) -> expected sha3-256 of proof bytes. Regenerate ONLY for a
# deliberate protocol change: python -m tests.test_golden_proofs
GOLDEN = {
    "fib2_f128_blake3_q28_b8": (
        "3fa50cc1a1e8d2bdb5060dbbf335c54d4bd6283ee119d440f86390005542497f"),
    "fib_small_f64_cubic_rp64_q28_b8_g4": (
        "35a820150251ee635a141ee53cb15d899bccbf6c66766cc5e0e3a65a85ecc6bc"),
    "vdf_f128_sha3_quad_q40_b4": (
        "b6f222e4e8a536a8557032598afc505367c87a7dcd65c1cbddcecf7f8fb4eabc"),
    "rescue_f128_blake3_algebraic_horner": (
        "c904bf1ff81f2d9f2a17f3e9332b0e3c2fb626739b52932336ac8e7e54d36b31"),
}


def _build(name):
    if name == "fib2_f128_blake3_q28_b8":
        options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)
        return FibProver(options, Blake3_256).prove(build_fib_trace(F128, 128))
    if name == "fib_small_f64_cubic_rp64_q28_b8_g4":
        options = ProofOptions(28, 8, 4, FieldExtension.CUBIC, 8, 31)
        return FibSmallProver(options, Rp64_256).prove(build_fib_trace(F64, 128))
    if name == "vdf_f128_sha3_quad_q40_b4":
        options = ProofOptions(40, 4, 0, FieldExtension.QUADRATIC, 4, 7)
        return VdfProver(options, Sha3_256).prove(build_vdf_trace(F128, 9, 64))
    if name == "rescue_f128_blake3_algebraic_horner":
        options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7,
                               BatchingMethod.ALGEBRAIC, BatchingMethod.HORNER)
        return RescueProver(options, Blake3_256).prove(build_rescue_trace((42, 43), 2))
    raise KeyError(name)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_proof_bytes(name):
    proof = _build(name)
    digest = hashlib.sha3_256(proof.to_bytes()).hexdigest()
    assert digest == GOLDEN[name], (
        f"proof bytes changed for {name}: {digest} — transcript drift!"
    )


if __name__ == "__main__":
    for name in sorted(GOLDEN):
        proof = _build(name)
        print(f'    "{name}": (\n        "{hashlib.sha3_256(proof.to_bytes()).hexdigest()}"),')
