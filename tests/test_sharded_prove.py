"""End-to-end SPMD prove over the virtual 8-device mesh: the mesh-sharded
GoldilocksProver must emit byte-identical proofs to the single-device prover
(which is itself pinned to the host prover in test_device_prover.py).

Sharding shards the work, never the transcript: all arithmetic is exact, so
a single differing byte means a partitioning bug. This is the CI stand-in for
multi-chip TPU runs (SURVEY §5.8; BASELINE.md scaling targets).

Each case runs in a fresh interpreter (tests/isolation.py): the round-4
suite segfaulted in XLA:CPU compiling the single-device comparator's
resident program in-process (fifth sighting of the crash class)."""

import pytest

from tests.isolation import run_isolated


def _sharded_check(n_devices: int, two_d: bool = False):
    import jax

    from winterfell_tpu.air import FieldExtension, ProofOptions
    from winterfell_tpu.crypto.hashers import Rp64_256
    from winterfell_tpu.examples.fibonacci import (
        FibSmallAir,
        FibSmallProver,
        build_fib_trace,
        compute_fib_term,
    )
    from winterfell_tpu.math.fields import F64
    from winterfell_tpu.parallel import make_mesh, make_mesh_2d
    from winterfell_tpu.prover.device import GoldilocksProver
    from winterfell_tpu.verifier import verify

    DeviceFib = GoldilocksProver.accelerate(FibSmallProver)
    assert len(jax.devices()) >= n_devices
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    seq = 2 * (1 << 12)  # trace length 2^12 — every phase divides the mesh
    trace = build_fib_trace(F64, seq)

    single = DeviceFib(options, Rp64_256).prove(build_fib_trace(F64, seq))
    if two_d:
        # 2-D (host × chip) mesh: rows sharded over both axes AND the
        # six-step NTT intermediates pinned so each big NTT is local
        # sub-NTTs around one transposing all-to-all (the host axis models
        # the DCN boundary — SCALING.md)
        prover = DeviceFib(options, Rp64_256).with_mesh(
            make_mesh_2d(2, n_devices // 2))
        assert prover._ntt_shard is not None  # six-step shardings active
    else:
        prover = DeviceFib(options, Rp64_256).with_mesh(make_mesh(n_devices))
    sharded = prover.prove(trace)

    assert sharded.to_bytes() == single.to_bytes()
    verify(FibSmallAir, sharded, compute_fib_term(F64, seq), Rp64_256)


def _sharded_4():
    _sharded_check(4)


def _sharded_8():
    _sharded_check(8)


def _sharded_2d():
    _sharded_check(8, two_d=True)


@pytest.mark.parametrize("fn", ["_sharded_4", "_sharded_8"])
def test_sharded_prove_bytes_equal_single_device(fn):
    run_isolated("tests.test_sharded_prove", fn, "SHARDED_PIN_OK")


def test_sharded_prove_2d_mesh_bytes_equal_single_device():
    run_isolated("tests.test_sharded_prove", "_sharded_2d", "SHARDED_PIN_OK")
