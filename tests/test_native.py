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


# ---- Rescue-128 width-6 + lamport builders ----------------------------------


def test_rescue128w6_sponge_matches_python():
    from winterfell_tpu.examples.merkle import (
        ARK, INV_ALPHA, MDS, rescue128_digest)

    rng = random.Random(7)
    from winterfell_tpu.math.fields import F128

    for length in (2, 4, 5, 512):
        data = [rng.randrange(F128.p) for _ in range(length)]
        assert native.rescue128w6_sponge(data, MDS, ARK, INV_ALPHA) == \
            rescue128_digest(data)


def test_rescue128w6_hash2_many_matches_python():
    from winterfell_tpu.examples.merkle import (
        ARK, INV_ALPHA, MDS, rescue128_digest)
    from winterfell_tpu.math.fields import F128

    rng = random.Random(8)
    pairs = [(rng.randrange(F128.p), rng.randrange(F128.p)) for _ in range(9)]
    assert native.rescue128w6_hash2_many(pairs, MDS, ARK, INV_ALPHA) == \
        [rescue128_digest(list(p)) for p in pairs]


def test_lamport_keygen_and_trace_match_python(monkeypatch):
    """Pins the C lamport keygen + 1024-step trace builder to the Python
    state machine (examples/src/lamport/aggregate/prover.rs build_trace)."""
    from winterfell_tpu.examples import lamport

    keys = [lamport.PrivateKey(seed) for seed in (11, 12)]
    messages = [lamport.message_to_elements(f"msg{i}".encode())
                for i in range(2)]
    sigs = [k.sign(f"msg{i}".encode()) for i, k in enumerate(keys)]

    # native keygen == Python keygen
    py_pub = [lamport.rescue128_digest(list(sk)) for sk in keys[0].sec_keys]
    assert keys[0].pub_keys == py_pub
    assert keys[0].pub_key_hash == lamport.hash_pub_keys(py_pub)

    native_trace = lamport.build_lamport_trace(messages, sigs)
    monkeypatch.setattr(native, "available", lambda: False)
    py_trace = lamport.build_lamport_trace(messages, sigs)

    n, w = py_trace.length, py_trace.width
    for step in (0, 1, 7, 8, 9, 511, 1023, 1024, 2047):
        for col in range(w):
            assert native_trace.get(col, step) == py_trace.get(col, step), \
                (step, col)
    assert n == native_trace.length == 2048


def test_native_grind_matches_python_scan():
    """wt_blake3_grind == the serial check_leading_zeros loop
    (prover/src/channel.rs:169-184) for both BLAKE3 digest widths."""
    import random

    from winterfell_tpu.crypto.hashers import Blake3_192, Blake3_256
    from winterfell_tpu.crypto.random_coin import DefaultRandomCoin
    from winterfell_tpu.math.fields import F128, Field

    if not native.available():
        pytest.skip("native library unavailable")
    rng = random.Random(7)
    for hasher in (Blake3_256, Blake3_192):
        coin = DefaultRandomCoin(
            hasher, [(rng.randrange(F128.p),) for _ in range(4)],
            Field(F128, 1))
        for gf in (4, 8, 12):
            nonce = 1
            while coin.check_leading_zeros(nonce) < gf:
                nonce += 1
            assert native.blake3_grind(coin.seed, gf) == nonce
