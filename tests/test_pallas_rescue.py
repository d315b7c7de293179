"""Pallas Rescue sponge kernel math vs the jnp/goldilocks oracle.

The kernel bodies are pure jnp functions over (k, 8, m/8) u32 limb planes
(_hash_rows_block / _merge_rows_block) that the Pallas kernels call on refs;
the tests run those bodies directly under jit on CPU — interpret-mode
execution of the fully-unrolled 7-round permutation is minutes-slow, and the
only Pallas-specific plumbing left out (BlockSpecs, grid) is exercised on
real TPU by the device prover byte-pin tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from winterfell_tpu.math.fields import F64
from winterfell_tpu.ops import goldilocks as gl
from winterfell_tpu.ops import pallas_rescue as pr


def _rand_rows(m, k, seed=3):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, F64.p, size=(m, k), dtype=np.uint64)
    rows[0, :] = F64.p - 1  # exercise every carry path
    rows[1, :] = 0
    return rows


def _split_np(a):
    return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (a >> np.uint64(32)).astype(np.uint32))


def _join_np(lo, hi):
    return (np.asarray(lo).astype(np.uint64)
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32)))


def test_pair_mul_matches_gl():
    rng = np.random.default_rng(5)
    a = rng.integers(0, F64.p, size=(2, 256), dtype=np.uint64)
    b = rng.integers(0, F64.p, size=(2, 256), dtype=np.uint64)
    a[0, 0] = b[0, 0] = F64.p - 1
    lo, hi = pr._gl_mul(_split_np(a), _split_np(b))
    got = _join_np(lo, hi)
    expected = np.asarray(gl.gl_mul(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    assert np.array_equal(got, expected)


def test_pair_sqr_matches_mul_and_lazy_canon():
    rng = np.random.default_rng(7)
    # full u64 range: lazy chain values are < 2^64, not < p
    a = rng.integers(0, 1 << 64, size=(2, 256), dtype=np.uint64)
    a[0, 0] = F64.p - 1
    a[0, 1] = np.uint64(0xFFFFFFFFFFFFFFFF)
    pair = _split_np(a)
    expected = (a.astype(object) * a.astype(object)) % F64.p

    canon = _join_np(*pr._gl_sqr(pair))
    assert np.array_equal(canon.astype(object), expected)

    lazy = pr._gl_sqr(pair, lazy=True)
    assert np.array_equal(_join_np(*lazy).astype(object) % F64.p, expected)
    # _canon brings any lazy (< 2p) value to canonical
    assert np.array_equal(_join_np(*pr._canon(lazy)).astype(object), expected)


def _hash_via_block(rows):
    m, k = rows.shape
    lo, hi = pr._split_planes(jnp.asarray(rows))
    fn = jax.jit(pr._hash_rows_block, static_argnums=0)
    out_lo, out_hi = fn(k, lo, hi)
    return np.asarray(pr._join_planes(out_lo, out_hi))


@pytest.mark.parametrize("k", [2, 4, 8, 12, 24])
def test_hash_rows_matches_oracle(k):
    rows = _rand_rows(256, k)
    expected = np.asarray(gl.rp64_hash_rows(gl.jnp.asarray(rows)))
    got = _hash_via_block(rows)
    assert np.array_equal(got, expected)


def test_merge_rows_matches_oracle():
    left = _rand_rows(128, 4, seed=11)
    right = _rand_rows(128, 4, seed=12)
    expected = np.asarray(
        gl.rp64_merge_rows(gl.jnp.asarray(left), gl.jnp.asarray(right)))
    l_lo, l_hi = pr._split_planes(jnp.asarray(left))
    r_lo, r_hi = pr._split_planes(jnp.asarray(right))
    out = jax.jit(pr._merge_rows_block)(l_lo, l_hi, r_lo, r_hi)
    got = np.asarray(pr._join_planes(*out))
    assert np.array_equal(got, expected)
