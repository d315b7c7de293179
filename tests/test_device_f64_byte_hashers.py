"""f64 device prover with non-Rp64 hashers (BLAKE3/SHA3/RpJive64_256):
proof bytes must be IDENTICAL to the host prover's.

The reference's common f64 configs pair the Goldilocks field with Blake3
commitments (examples/src/fibonacci/fib_small uses f64 + any CLI hasher —
examples/src/lib.rs:86-93); the device path must cover the same
hasher x field matrix (prover/src/lib.rs:125 is hasher-generic)."""

import numpy as np
import pytest

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


@pytest.mark.parametrize("hasher", [Blake3_256, Blake3_192, Sha3_256])
@pytest.mark.parametrize("ext", [FieldExtension.NONE, FieldExtension.CUBIC])
def test_f64_byte_hasher_device_matches_host(hasher, ext):
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host = FibSmallProver(options, hasher).prove(build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, hasher).prove(build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), hasher)


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


def test_f64_jive_device_matches_host():
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibSmallProver(options, RpJive64_256).prove(
        build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, RpJive64_256).prove(
        build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), RpJive64_256)


def test_f64_blake3_device_partitions():
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7
                           ).with_partitions(2, 2)
    host = FibSmallProver(options, Blake3_256).prove(build_fib_trace(F64, 256))
    dev = GoldilocksFibProver(options, Blake3_256).prove(
        build_fib_trace(F64, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibSmallAir, dev, compute_fib_term(F64, 256), Blake3_256)
