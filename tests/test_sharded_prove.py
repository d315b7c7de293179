"""End-to-end SPMD prove over the virtual 8-device mesh: the mesh-sharded
GoldilocksProver must emit byte-identical proofs to the single-device prover
(which is itself pinned to the host prover in test_device_prover.py).

Sharding shards the work, never the transcript: all arithmetic is exact, so
a single differing byte means a partitioning bug. This is the CI stand-in for
multi-chip TPU runs (SURVEY §5.8; BASELINE.md scaling targets)."""

import jax
import pytest

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


@pytest.mark.parametrize("n_devices", [4, 8])
def test_sharded_prove_bytes_equal_single_device(n_devices):
    assert len(jax.devices()) >= n_devices
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    seq = 2 * (1 << 12)  # trace length 2^12 — every phase divides the mesh
    trace = build_fib_trace(F64, seq)

    single = DeviceFib(options, Rp64_256).prove(build_fib_trace(F64, seq))
    sharded_prover = DeviceFib(options, Rp64_256).with_mesh(
        make_mesh(n_devices))
    sharded = sharded_prover.prove(trace)

    assert sharded.to_bytes() == single.to_bytes()
    verify(FibSmallAir, sharded, compute_fib_term(F64, seq), Rp64_256)


def test_sharded_prove_2d_mesh_bytes_equal_single_device():
    """Full prove() over a 2-D (host × chip) mesh: rows sharded over both
    axes AND the six-step NTT intermediates pinned so each big NTT is
    local sub-NTTs around one transposing all-to-all (the host axis models
    the DCN boundary — SCALING.md). Bytes must equal the single-device
    prover's."""
    assert len(jax.devices()) >= 8
    options = ProofOptions(28, 8, 0, FieldExtension.QUADRATIC, 4, 7)
    seq = 2 * (1 << 12)
    trace = build_fib_trace(F64, seq)

    single = DeviceFib(options, Rp64_256).prove(build_fib_trace(F64, seq))
    mesh = make_mesh_2d(2, 4)
    prover = DeviceFib(options, Rp64_256).with_mesh(mesh)
    assert prover._ntt_shard is not None  # six-step shardings active
    sharded = prover.prove(trace)

    assert sharded.to_bytes() == single.to_bytes()
    verify(FibSmallAir, sharded, compute_fib_term(F64, seq), Rp64_256)
