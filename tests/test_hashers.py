import hashlib

from winterfell_tpu.crypto.blake3_host import blake3
from winterfell_tpu.crypto.hashers import (
    Blake3_192, Blake3_256, Rp64_256, Sha3_256, rp64_permutation,
)
from winterfell_tpu.math.fields import F64_1, F128_1
from winterfell_tpu.crypto.random_coin import DefaultRandomCoin


def test_blake3_official_vectors():
    # from the official BLAKE3 test-vector suite (input bytes = i % 251)
    assert blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
    )
    assert blake3(bytes(i % 251 for i in range(1))).hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213"
    )
    # multi-chunk (tree mode)
    assert blake3(bytes(i % 251 for i in range(1025))).hex().startswith("d00278ae")


def test_rescue_permutation_kat():
    # expected values from the reference sage-derived KAT
    # (crypto/src/hash/rescue/rp64_256/tests.rs:70-104)
    out = rp64_permutation(list(range(12)))
    assert out == [
        11084501481526603421, 6291559951628160880, 13626645864671311919,
        18397438323058963117, 7443014167353970324, 17930833023906771425,
        4275355080008025761, 7676681476902901785, 3460534574143792217,
        11912731278641497187, 8104899243369883110, 674509706691634438,
    ]


def test_rescue_merge_equals_hash_elements():
    # merge(d0,d1) == hash_elements of the 8 digest elements
    # (rp64_256/tests.rs hash_elements_vs_merge)
    d0 = Rp64_256.hash(b"foo")
    d1 = Rp64_256.hash(b"bar")
    elems = [(int.from_bytes(d[8 * i : 8 * i + 8], "little"),)
             for d in (d0, d1) for i in range(4)]
    assert Rp64_256.merge(d0, d1) == Rp64_256.hash_elements(elems, F64_1)


def test_byte_hashers():
    assert Sha3_256.hash(b"") == hashlib.sha3_256(b"").digest()
    assert Blake3_256.merge(b"\x00" * 32, b"\x01" * 32) == blake3(
        b"\x00" * 32 + b"\x01" * 32
    )
    assert len(Blake3_192.hash(b"x")) == 24
    assert Blake3_256.merge_with_int(b"\x00" * 32, 7) == blake3(
        b"\x00" * 32 + (7).to_bytes(8, "little")
    )


def test_hash_elements_canonical_bytes():
    elems = [(1,), (2**64 - 2**32,)]  # max canonical f64 element
    expected = blake3(
        (1).to_bytes(8, "little") + (2**64 - 2**32).to_bytes(8, "little")
    )
    assert Blake3_256.hash_elements(elems, F64_1) == expected


def test_random_coin_determinism_and_reseed():
    seed = [(1,), (2,), (3,), (4,)]
    c1 = DefaultRandomCoin(Blake3_256, seed, F128_1)
    c2 = DefaultRandomCoin(Blake3_256, seed, F128_1)
    assert c1.draw(F128_1) == c2.draw(F128_1)
    c2.reseed(Blake3_256.hash(b"data"))
    assert c1.draw(F128_1) != c2.draw(F128_1)


def test_random_coin_draw_integers():
    coin = DefaultRandomCoin(Blake3_256, [(1,), (2,), (3,), (4,)], F128_1)
    vals = coin.draw_integers(20, 64, nonce=0)
    assert len(vals) == 20
    assert all(0 <= v < 64 for v in vals)


def test_check_leading_zeros_is_trailing_zeros_of_le_head():
    coin = DefaultRandomCoin(Blake3_256, [(1,), (2,)], F128_1)
    n = coin.check_leading_zeros(12345)
    head = int.from_bytes(
        Blake3_256.merge_with_int(coin.seed, 12345)[:8], "little"
    )
    assert (head >> n) & 1 == 1 or head == 0
    assert head % (1 << n) == 0
