"""JAX Goldilocks engine vs the exact host oracle (runs on the virtual CPU
mesh per conftest; the same code path runs on TPU)."""

import random

import numpy as np
import pytest

from winterfell_tpu.crypto.hashers import Rp64_256, rp64_permutation
from winterfell_tpu.crypto.merkle import MerkleTree
from winterfell_tpu.math import ntt, vecmath as vm
from winterfell_tpu.math.fields import F64, Field
from winterfell_tpu.ops import goldilocks as gl

P = F64.p
rng = random.Random(1234)


def _rand_u64(shape):
    flat = [rng.randrange(P) for _ in range(int(np.prod(shape)))]
    return np.array(flat, dtype=np.uint64).reshape(shape)


def test_gl_add_sub_mul_vs_python():
    a = _rand_u64((1000,))
    b = _rand_u64((1000,))
    # include boundary values
    a[0], b[0] = P - 1, P - 1
    a[1], b[1] = 0, P - 1
    a[2], b[2] = P - 1, 1
    got_add = np.asarray(gl.gl_add(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    got_sub = np.asarray(gl.gl_sub(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    got_mul = np.asarray(gl.gl_mul(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    for i in range(1000):
        ai, bi = int(a[i]), int(b[i])
        assert int(got_add[i]) == (ai + bi) % P
        assert int(got_sub[i]) == (ai - bi) % P
        assert int(got_mul[i]) == ai * bi % P


@pytest.mark.parametrize("degree", [2, 3])
def test_ext_mul_vs_host(degree):
    field = Field(F64, degree)
    a = _rand_u64((50, degree))
    b = _rand_u64((50, degree))
    got = np.asarray(gl.ext_mul(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    for i in range(50):
        expected = field.mul(tuple(int(x) for x in a[i]), tuple(int(x) for x in b[i]))
        assert tuple(int(x) for x in got[i]) == expected


@pytest.mark.parametrize("n", [16, 256])
def test_ntt_vs_host_oracle(n):
    a = _rand_u64((n, 3))
    host = ntt.evaluate_poly(F64, a.astype(object))
    dev = np.asarray(gl.ntt_evaluate(gl.jnp.asarray(a), n))
    assert (host == dev.astype(object)).all()

    host_i = ntt.interpolate_poly(F64, a.astype(object))
    dev_i = np.asarray(gl.ntt_interpolate(gl.jnp.asarray(a), n))
    assert (host_i == dev_i.astype(object)).all()


def test_ntt_six_step_vs_host_oracle():
    """n = 2^14 > _SMALL_NTT (2^13): exercises the recursive six-step
    decomposition — the code path the production bench sizes (2^18+) run."""
    n = 1 << 14
    assert n > gl._SMALL_NTT
    a = _rand_u64((n, 1))
    host = ntt.evaluate_poly(F64, a.astype(object))
    dev = np.asarray(gl.ntt_evaluate(gl.jnp.asarray(a), n))
    assert (host == dev.astype(object)).all()

    host_i = ntt.interpolate_poly(F64, a.astype(object))
    dev_i = np.asarray(gl.ntt_interpolate(gl.jnp.asarray(a), n))
    assert (host_i == dev_i.astype(object)).all()


def test_ntt_six_step_offset_vs_host_oracle():
    """Coset LDE (blowup 2) across the six-step boundary: 2^13-point polys,
    2^14-point LDE domain."""
    n = 1 << 13
    blowup = 2
    a = _rand_u64((n, 1))
    host = ntt.evaluate_poly_with_offset(F64, a.astype(object), F64.generator, blowup)
    dev = np.asarray(
        gl.ntt_evaluate_with_offset(gl.jnp.asarray(a), n, F64.generator, blowup))
    assert (host == dev.astype(object)).all()


@pytest.mark.parametrize("blowup", [2, 8])
def test_ntt_offset_vs_host_oracle(blowup):
    n = 64
    a = _rand_u64((n, 2))
    host = ntt.evaluate_poly_with_offset(F64, a.astype(object), F64.generator, blowup)
    dev = np.asarray(
        gl.ntt_evaluate_with_offset(gl.jnp.asarray(a), n, F64.generator, blowup))
    assert (host == dev.astype(object)).all()

    back = np.asarray(gl.ntt_interpolate_with_offset(
        gl.jnp.asarray(dev[::blowup]), n, F64.generator))
    assert (back.astype(object) == a.astype(object)).all()


def test_rescue_permutation_vs_host():
    states = _rand_u64((5, 12))
    got = np.asarray(gl.rp64_permutation_rows(gl.jnp.asarray(states)))
    for i in range(5):
        expected = rp64_permutation([int(x) for x in states[i]])
        assert [int(x) for x in got[i]] == expected


def test_rescue_hash_rows_vs_host():
    field1 = Field(F64, 1)
    for k in (2, 7, 8, 12, 16):
        rows = _rand_u64((4, k))
        got = gl.digests_to_bytes(np.asarray(gl.rp64_hash_rows(gl.jnp.asarray(rows))))
        for i in range(4):
            expected = Rp64_256.hash_elements(
                [(int(v),) for v in rows[i]], field1)
            assert got[i] == expected


def test_merkle_build_vs_host():
    leaves = _rand_u64((16, 4))
    leaf_bytes = gl.digests_to_bytes(leaves)
    host_tree = MerkleTree(leaf_bytes, Rp64_256)
    nodes = gl.merkle_build_rp64(gl.jnp.asarray(leaves))
    node_bytes = gl.digests_to_bytes(nodes)
    assert node_bytes[1] == host_tree.root
    for i in range(1, 16):
        assert node_bytes[i] == host_tree.nodes[i]


def test_mds_freq_matches_direct():
    """Frequency-domain MDS (mds_f64_12x12.rs port) == direct circulant
    multiply, over random canonical states including near-p values."""
    rng = np.random.default_rng(7)
    state = rng.integers(0, F64.p, size=(64, 12), dtype=np.uint64)
    state[0] = F64.p - 1  # max-value row: exercises every carry path
    state[1] = 0
    direct = np.asarray(gl._rp_mds(gl.jnp.asarray(state)))
    freq = np.asarray(gl._rp_mds_freq(gl.jnp.asarray(state)))
    assert np.array_equal(direct, freq)
