"""f64 device prover with non-Rp64 hashers (BLAKE3/SHA3/RpJive64_256):
proof bytes must be IDENTICAL to the host prover's.

The reference's common f64 configs pair the Goldilocks field with Blake3
commitments (examples/src/fibonacci/fib_small uses f64 + any CLI hasher —
examples/src/lib.rs:86-93); the device path must cover the same
hasher x field matrix (prover/src/lib.rs:125 is hasher-generic).

The full-prove byte-pins run in fresh interpreters (tests/isolation.py):
XLA:CPU segfaults nondeterministically compiling the resident whole-proof
programs inside long pytest processes (the round-4 crash class)."""

import numpy as np
import pytest

from tests.isolation import run_isolated

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import (
    Blake3_192,
    Blake3_256,
    RpJive64_256,
    Sha3_256,
)
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

_HASHERS = {"blake3_256": Blake3_256, "blake3_192": Blake3_192,
            "sha3_256": Sha3_256}


def _byte_hasher_check(hasher_name: str, ext_name: str):
    hasher = _HASHERS[hasher_name]
    ext = getattr(FieldExtension, ext_name)
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host = FibSmallProver(options, hasher).prove(build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, hasher).prove(build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), hasher)


def _bh_blake3_256_none():
    _byte_hasher_check("blake3_256", "NONE")


def _bh_blake3_256_cubic():
    _byte_hasher_check("blake3_256", "CUBIC")


def _bh_blake3_192_none():
    _byte_hasher_check("blake3_192", "NONE")


def _bh_blake3_192_cubic():
    _byte_hasher_check("blake3_192", "CUBIC")


def _bh_sha3_none():
    _byte_hasher_check("sha3_256", "NONE")


def _bh_sha3_cubic():
    _byte_hasher_check("sha3_256", "CUBIC")


@pytest.mark.parametrize("fn", ["_bh_blake3_256_none", "_bh_blake3_256_cubic",
                                "_bh_blake3_192_none", "_bh_blake3_192_cubic",
                                "_bh_sha3_none", "_bh_sha3_cubic"])
def test_f64_byte_hasher_device_matches_host(fn):
    run_isolated("tests.test_device_f64_byte_hashers", fn, "F64BH_PIN_OK")


def test_jive_device_kernels_match_host():
    """Device Jive sponge + compression vs the sage-KAT-pinned host hasher."""
    from winterfell_tpu.crypto import hashers as h
    from winterfell_tpu.ops import jive_device as jd

    rng = np.random.default_rng(7)
    for k in (1, 3, 4, 5, 8, 11):
        rows = rng.integers(0, h._P, size=(5, k), dtype=np.uint64)
        got = np.asarray(jd.jive_hash_rows(rows))
        for r in range(rows.shape[0]):
            exp = RpJive64_256.hash_elements(
                [(int(v),) for v in rows[r]], None)
            assert got[r].astype("<u8").tobytes() == exp, (k, r)
    left = rng.integers(0, h._P, size=(6, 4), dtype=np.uint64)
    right = rng.integers(0, h._P, size=(6, 4), dtype=np.uint64)
    got = np.asarray(jd.jive_merge_rows(left, right))
    for r in range(6):
        exp = RpJive64_256.merge(left[r].astype("<u8").tobytes(),
                                 right[r].astype("<u8").tobytes())
        assert got[r].astype("<u8").tobytes() == exp


def _jive_check():
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibSmallProver(options, RpJive64_256).prove(
        build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, RpJive64_256).prove(
        build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), RpJive64_256)


def test_f64_jive_device_matches_host():
    run_isolated("tests.test_device_f64_byte_hashers", "_jive_check",
                 "F64BH_PIN_OK")


def _partitions_check():
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7
                           ).with_partitions(2, 2)
    host = FibSmallProver(options, Blake3_256).prove(build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, Blake3_256).prove(
        build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), Blake3_256)


def test_f64_blake3_device_partitions():
    run_isolated("tests.test_device_f64_byte_hashers", "_partitions_check",
                 "F64BH_PIN_OK")
