"""Sharding tests on the virtual 8-device CPU mesh: sharded execution must be
bit-identical to the single-device oracle (exact integer arithmetic — no
reduction-order sensitivity)."""

from functools import partial

import numpy as np
import pytest

import jax

from winterfell_tpu.math.fields import F64
from winterfell_tpu.ops import goldilocks as gl
from winterfell_tpu.parallel import make_mesh, ntt_six_step, sharded_commit, sharded_lde

P = F64.p


def _rand(shape, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P - 1, size=shape, dtype=np.uint64)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("n,a", [(64, 8), (256, 16), (1024, None)])
def test_six_step_ntt_matches_radix2(n, a):
    x = gl.jnp.asarray(_rand((n, 2)))
    direct = np.asarray(gl.ntt_evaluate(x, n))
    six = np.asarray(ntt_six_step(x, n, a))
    assert np.array_equal(direct, six)


def test_sharded_lde_matches_single_device():
    mesh = make_mesh()
    n, blowup, width = 128, 4, 8  # one column per device
    trace = _rand((n, width))
    sharded = np.asarray(sharded_lde(mesh, gl.jnp.asarray(trace), n,
                                     F64.generator, blowup))
    single = np.asarray(gl.ntt_evaluate_with_offset(
        gl.ntt_interpolate(gl.jnp.asarray(trace), n), n, F64.generator, blowup))
    assert np.array_equal(sharded, single)


def test_six_step_ntt_sharded_over_mesh():
    """The six-step NTT with its middle transpose sharded over the mesh: the
    inner/outer NTT batches are device-local, the transpose is the all-to-all.
    Values must match the single-device radix-2 oracle bit-for-bit."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from winterfell_tpu.parallel import _six_step_core

    mesh = make_mesh()
    n, a = 1024, 32
    x = _rand((n, 1), seed=7)

    shard = NamedSharding(mesh, P("x"))
    b = n // a
    sharded_fn = jax.jit(
        partial(_six_step_core,
                mid_tw=gl._mid_twiddles_dev(n, a, False),
                inner_plan=gl.ntt_plan(b, False),
                outer_plan=gl.ntt_plan(a, False), n=n, a=a),
        in_shardings=shard, out_shardings=shard)
    got = np.asarray(sharded_fn(jax.device_put(gl.jnp.asarray(x), shard)))
    expected = np.asarray(gl.ntt_evaluate(gl.jnp.asarray(x), n))
    assert np.array_equal(got, expected)


def test_sharded_commit_root_matches_host():
    from winterfell_tpu.crypto.hashers import Rp64_256
    from winterfell_tpu.crypto.merkle import MerkleTree
    from winterfell_tpu.math.fields import Field

    mesh = make_mesh()
    lde = _rand((64, 8))
    root_dev = np.asarray(sharded_commit(mesh, gl.jnp.asarray(lde)))
    root_bytes = np.ascontiguousarray(root_dev.astype("<u8")).tobytes()

    field1 = Field(F64, 1)
    leaves = [Rp64_256.hash_elements([(int(v),) for v in row], field1)
              for row in lde]
    host_tree = MerkleTree(leaves, Rp64_256)
    assert root_bytes == host_tree.root


def test_ntt_six_step_2d_mesh():
    """Six-step NTT over a 2-D (host x chip) mesh == single-device NTT.
    Exercises the all-to-all transpose across both mesh axes (the host axis
    models the DCN boundary of a multi-host pod)."""
    from winterfell_tpu.parallel import make_mesh_2d, ntt_six_step_2d

    n = 1 << 12
    rng = np.random.default_rng(9)
    x = rng.integers(0, F64.p, size=(n,), dtype=np.uint64)
    expected = np.asarray(gl.ntt_evaluate(gl.jnp.asarray(x), n))
    for hosts, chips in ((2, 4), (4, 2)):
        mesh = make_mesh_2d(hosts, chips)
        got = np.asarray(ntt_six_step_2d(mesh, gl.jnp.asarray(x), n))
        assert np.array_equal(got, expected), (hosts, chips)


def test_ntt_six_step_2d_mesh_columns():
    """Same, with trailing column dims (the trace-matrix shape)."""
    from winterfell_tpu.parallel import make_mesh_2d, ntt_six_step_2d

    n = 1 << 11
    rng = np.random.default_rng(10)
    x = rng.integers(0, F64.p, size=(n, 3), dtype=np.uint64)
    expected = np.asarray(gl.ntt_evaluate(gl.jnp.asarray(x), n))
    mesh = make_mesh_2d(2, 4)
    got = np.asarray(ntt_six_step_2d(mesh, gl.jnp.asarray(x), n))
    assert np.array_equal(got, expected)
