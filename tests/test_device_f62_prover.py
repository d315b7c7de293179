"""F62 device prover vs host prover: proof bytes must be IDENTICAL.

The engine-parametric LimbFieldProver (prover/device_limb.py) bound to the
f62 limb engine (ops/f62.py), over all three extension degrees and both
device commitment hashers.

Each byte-pin runs in a fresh interpreter: round 3's full-suite run
segfaulted in XLA:CPU on this file's large limb programs (cache-write path,
device_limb.py via executable serialization) — see tests/isolation.py.
"""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256, Sha3_256
from winterfell_tpu.math.fields import F62
from winterfell_tpu.prover.device_limb import F62Prover
from winterfell_tpu.verifier import verify

from tests.isolation import run_isolated
from tests.test_e2e_f62 import FibF62Air, FibF62Prover, _trace


def _f62_device_check(ext_name: str, hasher_name: str) -> None:
    ext = getattr(FieldExtension, ext_name)
    hasher = {"blake3": Blake3_256, "sha3": Sha3_256}[hasher_name]
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host_prover = FibF62Prover(options, hasher)
    host = host_prover.prove(_trace())
    result = host_prover.get_pub_inputs(_trace())
    dev = F62Prover.accelerate(FibF62Prover)(options, hasher).prove(_trace())
    assert dev.to_bytes() == host.to_bytes()
    verify(FibF62Air, dev, result, hasher)


def _f62_none_blake3():
    _f62_device_check("NONE", "blake3")


def _f62_quad_blake3():
    _f62_device_check("QUADRATIC", "blake3")


def _f62_cubic_blake3():
    _f62_device_check("CUBIC", "blake3")


def _f62_quad_sha3():
    _f62_device_check("QUADRATIC", "sha3")


@pytest.mark.parametrize("fn", ["_f62_none_blake3", "_f62_quad_blake3",
                                "_f62_cubic_blake3"])
def test_fib_f62_device_matches_host(fn):
    run_isolated("tests.test_device_f62_prover", fn, "F62_PIN_OK")


def test_fib_f62_device_sha3_matches_host():
    run_isolated("tests.test_device_f62_prover", "_f62_quad_sha3",
                 "F62_PIN_OK")
