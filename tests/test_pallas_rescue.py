"""Pallas Rescue sponge kernels vs the jnp/goldilocks oracle (interpret mode
on CPU; the same kernels compile with Mosaic on TPU)."""

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


def test_pair_mul_matches_gl():
    rng = np.random.default_rng(5)
    a = rng.integers(0, F64.p, size=(2, 256), dtype=np.uint64)
    b = rng.integers(0, F64.p, size=(2, 256), dtype=np.uint64)
    a[0, 0] = b[0, 0] = F64.p - 1
    lo, hi = pr._gl_mul(
        ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (a >> np.uint64(32)).astype(np.uint32)),
        ((b & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (b >> np.uint64(32)).astype(np.uint32)))
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    expected = np.asarray(gl.gl_mul(gl.jnp.asarray(a), gl.jnp.asarray(b)))
    assert np.array_equal(got, expected)


@pytest.mark.parametrize("k", [2, 4, 8, 12, 24])
def test_hash_rows_matches_oracle(k):
    rows = _rand_rows(256, k)
    expected = np.asarray(gl.rp64_hash_rows(gl.jnp.asarray(rows)))
    got = np.asarray(pr.rp64_hash_rows_pallas(rows, interpret=True))
    assert np.array_equal(got, expected)


def test_merge_rows_matches_oracle():
    left = _rand_rows(128, 4, seed=11)
    right = _rand_rows(128, 4, seed=12)
    expected = np.asarray(
        gl.rp64_merge_rows(gl.jnp.asarray(left), gl.jnp.asarray(right)))
    got = np.asarray(pr.rp64_merge_rows_pallas(left, right, interpret=True))
    assert np.array_equal(got, expected)
