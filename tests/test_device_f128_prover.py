"""F128 device prover vs host prover: proof bytes must be IDENTICAL.

Covers the reference-default configuration space (f128 base field + BLAKE3
commitments — examples/src/lib.rs:8-10, 86-93): fib, rescue (periodic masks),
rescue_raps (aux segment), PartitionOptions, and the 192-bit digest variant.
"""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_192, Blake3_256
from winterfell_tpu.examples.fibonacci import (
    FibAir,
    FibProver,
    build_fib_trace,
    compute_fib_term,
)
from winterfell_tpu.examples.rescue import (
    RescueAir,
    RescueProver,
    RescuePublicInputs,
    build_rescue_trace,
    compute_hash_chain,
)
from winterfell_tpu.examples.rescue_raps import (
    RescueRapsAir,
    RescueRapsProver,
    build_raps_trace,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.prover.device_f128 import F128Prover
from winterfell_tpu.verifier import verify

from tests.isolation import run_isolated

F128FibProver = F128Prover.accelerate(FibProver)


# Every byte-pin here runs in a fresh interpreter (tests/isolation.py):
# XLA:CPU aborts/segfaults nondeterministically when compiling this file's
# large limb-engine programs inside a long pytest process (observed round 3
# on the cache serialize path, round 4 twice in plain
# backend_compile_and_load — huge-domain test, then rescue_raps CE — all of
# which pass standalone every time).


def _fib_device_check(ext_name: str):
    ext = getattr(FieldExtension, ext_name)
    options = ProofOptions(28, 8, 0, ext, 4, 7)
    host = FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    dev = F128FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 256), Blake3_256)


def _fib_none():
    _fib_device_check("NONE")


def _fib_quad():
    _fib_device_check("QUADRATIC")


@pytest.mark.parametrize("fn", ["_fib_none", "_fib_quad"])
def test_fib_device_matches_host(fn):
    run_isolated("tests.test_device_f128_prover", fn, "F128_PIN_OK")


def _blake3_192_check():
    options = ProofOptions(28, 8, 4, FieldExtension.QUADRATIC, 8, 31)
    host = FibProver(options, Blake3_192).prove(build_fib_trace(F128, 128))
    dev = F128FibProver(options, Blake3_192).prove(build_fib_trace(F128, 128))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 128), Blake3_192)


def test_fib_device_blake3_192_and_grinding():
    run_isolated("tests.test_device_f128_prover", "_blake3_192_check",
                 "F128_PIN_OK")


def _partitions_check(partitions: int):
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7
                           ).with_partitions(partitions, 2)
    host = FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    dev = F128FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 256), Blake3_256)


def _partitions_2():
    _partitions_check(2)


def _partitions_4():
    _partitions_check(4)


@pytest.mark.parametrize("fn", ["_partitions_2", "_partitions_4"])
def test_fib_device_partitions(fn):
    run_isolated("tests.test_device_f128_prover", fn, "F128_PIN_OK")


def _rescue_check():
    """Degree-3 constraints with cycle-16 periodic masks (rescue/air.rs)."""
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    seed = (42, 43)
    iterations = 8  # trace length 128
    trace = build_rescue_trace(seed, iterations)
    pub = RescuePublicInputs(seed, compute_hash_chain(seed, iterations))
    host = RescueProver(options, Blake3_256).prove(trace)
    dev = F128Prover.accelerate(RescueProver)(options, Blake3_256).prove(
        build_rescue_trace(seed, iterations))
    assert dev.to_bytes() == host.to_bytes()
    verify(RescueAir, dev, pub, Blake3_256)


def test_rescue_device_matches_host():
    run_isolated("tests.test_device_f128_prover", "_rescue_check",
                 "F128_PIN_OK")


def _rescue_raps_check():
    """Randomized AIR: aux segment commit + aux transition on device."""
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    seeds = [(i * 2 + 1, i * 2 + 2) for i in range(8)]
    permuted = seeds[2:] + seeds[:2]
    trace = build_raps_trace(seeds, permuted)
    host_prover = RescueRapsProver(options, Blake3_256)
    pub = host_prover.get_pub_inputs(trace)
    host = host_prover.prove(trace)
    dev = F128Prover.accelerate(RescueRapsProver)(options, Blake3_256).prove(
        build_raps_trace(seeds, permuted))
    assert dev.to_bytes() == host.to_bytes()
    verify(RescueRapsAir, dev, pub, Blake3_256)


def test_rescue_raps_device_matches_host():
    run_isolated("tests.test_device_f128_prover", "_rescue_raps_check",
                 "F128_PIN_OK")


def _sha3_check():
    """SHA3-256 commitments on the device path (vectorized Keccak)."""
    from winterfell_tpu.crypto.hashers import Sha3_256

    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibProver(options, Sha3_256).prove(build_fib_trace(F128, 128))
    dev = F128FibProver(options, Sha3_256).prove(build_fib_trace(F128, 128))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 128), Sha3_256)


def test_fib_device_sha3_matches_host():
    run_isolated("tests.test_device_f128_prover", "_sha3_check",
                 "F128_PIN_OK")


def _algebraic_horner_check():
    """Algebraic + Horner batching: the device coin draws ONE alpha and
    expands powers in-graph (air/src/air/coefficients.rs:159-195) — pinned
    against the host prover's bytes."""
    from winterfell_tpu.air import BatchingMethod

    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7,
                           BatchingMethod.ALGEBRAIC, BatchingMethod.HORNER)
    host = FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    dev = F128FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 256), Blake3_256)


def test_fib_device_algebraic_horner_matches_host():
    run_isolated("tests.test_device_f128_prover", "_algebraic_horner_check",
                 "F128_PIN_OK")


def _lamport_device_check():
    """Body of the lamport device byte-pin (see the test below for why this
    runs in a child process)."""
    from winterfell_tpu.examples.lamport import (
        LamportAggregateAir,
        LamportAggregateProver,
        LamportPublicInputs,
        PrivateKey,
        build_lamport_trace,
        message_to_elements,
    )

    keys = [PrivateKey(i) for i in range(2)]
    messages = [message_to_elements(f"test message {i}".encode())
                for i in range(2)]
    signatures = [k.sign(f"test message {i}".encode())
                  for i, k in enumerate(keys)]
    pub_keys = [k.pub_key() for k in keys]
    options = ProofOptions(28, 8, 0, FieldExtension.NONE, 4, 7)

    host = LamportAggregateProver(options, Blake3_256, pub_keys,
                                  messages).prove(
        build_lamport_trace(messages, signatures))
    DevProver = F128Prover.accelerate(LamportAggregateProver)
    dev = DevProver(options, Blake3_256, pub_keys, messages).prove(
        build_lamport_trace(messages, signatures))
    assert dev.to_bytes() == host.to_bytes()
    verify(LamportAggregateAir, dev,
           LamportPublicInputs(tuple(pub_keys), tuple(messages)), Blake3_256)


def test_lamport_aggregate_device_matches_host():
    """The heavyweight width-22 AIR (sequence assertions, periodic columns —
    examples/src/lamport/aggregate/mod.rs) on the device path.  Runs in a
    fresh interpreter (see tests/isolation.py for the XLA:CPU crash class)."""
    from tests.isolation import run_isolated

    run_isolated("tests.test_device_f128_prover", "_lamport_device_check",
                 "LAMPORT_PIN_OK")


def _huge_domain_split_check():
    """Body of the huge-domain byte-pin: force the huge-domain code paths
    (per-column LDE above _FUSE_LIMIT, slabbed DEEP combine above
    _DEEP_SLAB_LIMB, slabbed row hashing, per-row dynamic-slice query
    gathers above _TAKE_SLICE_LIMIT) at a CPU-testable size — proof bytes
    must stay identical to the host prover."""
    from winterfell_tpu.prover import device, device_limb

    device_limb._FUSE_LIMIT = 1
    device_limb._DEEP_SLAB_LIMB = 256
    device_limb._HASH_SLAB = 512
    device._TAKE_SLICE_LIMIT = 64

    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    dev = F128FibProver(options, Blake3_256).prove(build_fib_trace(F128, 256))
    assert dev.to_bytes() == host.to_bytes()
    verify(FibAir, dev, compute_fib_term(F128, 256), Blake3_256)


def test_fib_device_huge_domain_split_matches_host():
    """Isolated in a child process: XLA:CPU segfaulted compiling this test's
    big slab programs inside the round-4 full-suite process (plain
    backend_compile_and_load, persistent cache off — see tests/isolation.py)."""
    from tests.isolation import run_isolated

    run_isolated("tests.test_device_f128_prover", "_huge_domain_split_check",
                 "HUGE_DOMAIN_PIN_OK")


def _slabbed_ce_check():
    """CE slab-scan path (wide-AIR compile-memory fix, round 5): forcing
    _CE_SLAB_BUDGET to 1 routes every CE program through the lax.scan row
    slabs; bytes must still match the host prover exactly — covers both a
    plain AIR (fib) and an aux-segment AIR (rescue_raps)."""
    from winterfell_tpu.prover import device_limb

    device_limb._CE_SLAB_BUDGET = 1
    device_limb._CE_SLAB_ROWS = 64

    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    host = FibProver(options, Blake3_256).prove(build_fib_trace(F128, 512))
    dev = F128FibProver(options, Blake3_256).prove(build_fib_trace(F128, 512))
    assert dev.to_bytes() == host.to_bytes()

    seeds = [(i * 2 + 1, i * 2 + 2) for i in range(8)]
    permuted = seeds[2:] + seeds[:2]
    host_prover = RescueRapsProver(options, Blake3_256)
    pub = host_prover.get_pub_inputs(build_raps_trace(seeds, permuted))
    host = host_prover.prove(build_raps_trace(seeds, permuted))
    dev = F128Prover.accelerate(RescueRapsProver)(options, Blake3_256).prove(
        build_raps_trace(seeds, permuted))
    assert dev.to_bytes() == host.to_bytes()
    verify(RescueRapsAir, dev, pub, Blake3_256)


def test_slabbed_ce_matches_host():
    from tests.isolation import run_isolated

    run_isolated("tests.test_device_f128_prover", "_slabbed_ce_check",
                 "SLAB_CE_PIN_OK")
