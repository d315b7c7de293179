"""Pallas u32-limb Goldilocks multiply vs the exact oracle (interpret mode —
the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import pytest

from winterfell_tpu.ops.pallas_kernels import (
    P,
    gl_mul_pallas,
    join_limbs,
    split_limbs,
)


def _check(a: np.ndarray, b: np.ndarray):
    al, ah = split_limbs(a)
    bl, bh = split_limbs(b)
    ol, oh = gl_mul_pallas(al, ah, bl, bh, True)
    got = join_limbs(np.asarray(ol), np.asarray(oh)).astype(object)
    exp = (a.astype(object) * b.astype(object)) % P
    assert (got == exp).all(), f"mismatch: {np.nonzero(got != exp)}"


def test_random_sweep():
    rng = np.random.default_rng(42)
    a = rng.integers(0, P, size=(16, 1024), dtype=np.uint64)
    b = rng.integers(0, P, size=(16, 1024), dtype=np.uint64)
    _check(a, b)


def test_corner_cases():
    corners = [0, 1, 2, P - 1, P - 2, 2**32, 2**32 - 1, 2**32 + 1,
               2**63, 2**63 - 1, P // 2, P // 2 + 1, 0xFFFFFFFF00000000 % P]
    pairs = [(x, y) for x in corners for y in corners]
    n = len(pairs)
    pad = (-n) % 8
    pairs += [(0, 0)] * pad
    a = np.array([x for x, _ in pairs], dtype=np.uint64).reshape(8, -1)
    b = np.array([y for _, y in pairs], dtype=np.uint64).reshape(8, -1)
    _check(a, b)


def test_products_near_p_multiples():
    """Products that land just above/below multiples of p stress the final
    reductions."""
    import random

    rng = random.Random(7)
    vals = []
    for _ in range(512):
        x = rng.randrange(1, P)
        # y chosen so x*y mod p is tiny or near p
        y_small = (pow(x, P - 2, P) * rng.randrange(0, 4)) % P
        y_big = (pow(x, P - 2, P) * (P - 1 - rng.randrange(0, 4))) % P
        vals.append((x, y_small))
        vals.append((x, y_big))
    a = np.array([v[0] for v in vals], dtype=np.uint64).reshape(8, -1)
    b = np.array([v[1] for v in vals], dtype=np.uint64).reshape(8, -1)
    _check(a, b)
