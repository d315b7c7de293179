"""F62 device prover vs host prover: proof bytes must be IDENTICAL.

The engine-parametric LimbFieldProver (prover/device_limb.py) bound to the
f62 limb engine (ops/f62.py), over all three extension degrees and both
device commitment hashers."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256, Sha3_256
from winterfell_tpu.math.fields import F62
from winterfell_tpu.prover.device_limb import F62Prover
from winterfell_tpu.verifier import verify

from test_e2e_f62 import FibF62Air, FibF62Prover, _trace


@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.QUADRATIC,
                                 FieldExtension.CUBIC])
def test_fib_f62_device_matches_host(ext):
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host_prover = FibF62Prover(options, Blake3_256)
    host = host_prover.prove(_trace())
    result = host_prover.get_pub_inputs(_trace())
    dev = F62Prover.accelerate(FibF62Prover)(options, Blake3_256).prove(
        _trace())
    assert dev.to_bytes() == host.to_bytes()
    verify(FibF62Air, dev, result, Blake3_256)


def test_fib_f62_device_sha3_matches_host():
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibF62Prover(options, Sha3_256).prove(_trace())
    dev = F62Prover.accelerate(FibF62Prover)(options, Sha3_256).prove(_trace())
    assert dev.to_bytes() == host.to_bytes()
    verify(FibF62Air, dev, FibF62Prover(options, Sha3_256).get_pub_inputs(
        _trace()), Sha3_256)
