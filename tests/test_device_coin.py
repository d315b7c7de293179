"""Device-resident Fiat-Shamir coin vs the host DefaultRandomCoin oracle.

The device ops (ops/device_coin.py) must replicate crypto/src/random/
default.rs:82-170 bit-for-bit: reseed = merge, draw = counter-incrementing
rejection sampling over the digest bytes.
"""

import os
import random

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from winterfell_tpu.crypto.hashers import (  # noqa: E402
    Blake3_192,
    Blake3_256,
    Rp62_248,
    Rp64_256,
    Sha3_256,
)
from winterfell_tpu.crypto.random_coin import DefaultRandomCoin  # noqa: E402
from winterfell_tpu.math.fields import F62, F64, F128, Field  # noqa: E402
from winterfell_tpu.ops import device_coin as dc  # noqa: E402


def _host_coin(hasher, seed_elements, field):
    return DefaultRandomCoin(hasher, seed_elements, field)


def _elem_ints_from_limbs(arr):
    """(d, L) uint64 32-bit limbs -> tuple of ints."""
    arr = np.asarray(arr)
    return tuple(
        int(sum(int(arr[i, k]) << (32 * k) for k in range(arr.shape[1])))
        for i in range(arr.shape[0])
    )


CASES = [
    ("blake3_256", Blake3_256, Field(F128, 2), "f128"),
    ("blake3_256", Blake3_256, Field(F62, 3), "f62"),
    ("blake3_192", Blake3_192, Field(F128, 1), "f128"),
    # quad ext from a 24-byte digest: the zero-padded tail component
    ("blake3_192", Blake3_192, Field(F128, 2), "f128"),
    ("blake3_192", Blake3_192, Field(F64, 3), "f64"),
    ("sha3_256", Sha3_256, Field(F128, 2), "f128"),
    ("blake3_256", Blake3_256, Field(F64, 3), "f64"),
    ("rp64_256", Rp64_256, Field(F64, 3), "f64"),
    ("rp62_248", Rp62_248, Field(F62, 1), "f62"),
    ("rp62_248", Rp62_248, Field(F62, 2), "f62"),
    ("rp62_248", Rp62_248, Field(F62, 3), "f62"),
]


@pytest.mark.parametrize("kind,hasher,field,eng_name", CASES)
def test_merge_matches_host(kind, hasher, field, eng_name):
    rng = random.Random(0xC01)
    merge, _ = dc.coin_bundle(kind, field.degree, eng_name)
    for _ in range(4):
        a = bytes(rng.randrange(256) for _ in range(hasher.digest_size))
        b = bytes(rng.randrange(256) for _ in range(hasher.digest_size))
        if kind == "rp64_256":
            # element digests: draw canonical field elements
            a = b"".join(
                rng.randrange(F64.p).to_bytes(8, "little") for _ in range(4))
            b = b"".join(
                rng.randrange(F64.p).to_bytes(8, "little") for _ in range(4))
            sa, sb = dc.seed_to_u64(a), dc.seed_to_u64(b)
            got = dc.u64_to_seed(merge(jnp.asarray(sa), jnp.asarray(sb)))
        elif kind == "rp62_248":
            # packed element digests; merge's `other` is a Merkle-root row in
            # the (8,) uint32 packed word layout the tree kernels emit
            from winterfell_tpu.crypto.hashers import _rp62_digest

            a = _rp62_digest([rng.randrange(F62.p) for _ in range(4)])[:31]
            b = _rp62_digest([rng.randrange(F62.p) for _ in range(4)])[:31]
            sa = dc.seed_to_state(kind, a)
            b_words = np.frombuffer(b + b"\x00", dtype="<u4").copy()
            got = dc.state_to_seed(
                kind, merge(jnp.asarray(sa), jnp.asarray(b_words)))
        else:
            sa, sb = dc.seed_to_words(a), dc.seed_to_words(b)
            got = dc.words_to_seed(merge(jnp.asarray(sa), jnp.asarray(sb)))
        assert got == hasher.merge(a, b)


@pytest.mark.parametrize("kind,hasher,field,eng_name", CASES)
def test_draw_matches_host(kind, hasher, field, eng_name):
    rng = random.Random(0xD1CE)
    _, draw = dc.coin_bundle(kind, field.degree, eng_name)
    seed_elems = [(rng.randrange(field.base.p),) for _ in range(5)]
    coin = _host_coin(hasher, seed_elems, Field(field.base, 1))
    # several sequential draws exercise the counter chaining + rejections
    # (f62 components reject ~76% of candidates)
    seed_dev = jnp.asarray(dc.seed_to_state(kind, coin.seed))
    counter = jnp.asarray(np.uint64(coin.counter))
    for _ in range(6):
        want = coin.draw(field)
        elem, counter = draw(seed_dev, counter)
        arr = np.asarray(elem)
        if arr.ndim == 2:
            got = _elem_ints_from_limbs(arr)
        else:
            got = tuple(int(x) for x in arr)
        assert got == want
        assert int(counter) == coin.counter
