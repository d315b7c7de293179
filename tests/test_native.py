"""Native C BLAKE3 vs the pure-Python oracle (official vectors + random
lengths spanning single-block, multi-block and multi-chunk tree mode)."""

import random

import pytest

from winterfell_tpu.crypto import native
from winterfell_tpu.crypto.blake3_host import blake3 as py_blake3

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="C toolchain unavailable")


def test_official_vectors():
    assert native.blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert native.blake3(bytes(i % 251 for i in range(1025))).hex().startswith(
        "d00278ae")


@pytest.mark.parametrize("length", [1, 63, 64, 65, 1023, 1024, 1025, 2048,
                                    3071, 4096, 10000, 131072])
def test_matches_python_oracle(length):
    rng = random.Random(length)
    data = rng.randbytes(length)
    assert native.blake3(data) == py_blake3(data)


def test_blake3_many_matches_single():
    rng = random.Random(9)
    rows = [rng.randbytes(80) for _ in range(33)]
    got = native.blake3_many(b"".join(rows), 33, 80)
    assert got == [native.blake3(r) for r in rows]


def test_hashers_use_native_transparently():
    from winterfell_tpu.crypto.hashers import Blake3_256
    data = b"transcript bytes"
    assert Blake3_256.hash(data) == py_blake3(data)


# ---- native f128 NTT vs the exact Python-int oracle -------------------------


def test_native_f128_ntt_matches_oracle(monkeypatch):
    import random

    import numpy as np

    from winterfell_tpu.crypto import native
    from winterfell_tpu.math import ntt
    from winterfell_tpu.math.fields import F128

    if not native.available():
        import pytest

        pytest.skip("no C toolchain")

    rng = random.Random(0xC128)
    p = F128.p
    a = np.empty((256, 2), dtype=object)
    for i in range(256):
        for j in range(2):
            a[i, j] = rng.randrange(p)

    def pure(fn, *args):
        monkeypatch.setenv("WINTER_NATIVE", "0")
        try:
            return fn(*args)
        finally:
            monkeypatch.setenv("WINTER_NATIVE", "1")

    ev_n = ntt.evaluate_poly(F128, a)
    assert (ev_n == pure(ntt.evaluate_poly, F128, a)).all()
    assert (ntt.interpolate_poly(F128, ev_n) == a).all()

    lde_n = ntt.evaluate_poly_with_offset(F128, a, F128.generator, 4)
    assert (lde_n == pure(
        ntt.evaluate_poly_with_offset, F128, a, F128.generator, 4)).all()
    back = ntt.interpolate_poly_with_offset(F128, lde_n, F128.generator)
    assert (back[:256] == a).all()
    assert (back == pure(
        ntt.interpolate_poly_with_offset, F128, lde_n, F128.generator)).all()
