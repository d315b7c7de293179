"""Known-answer tests for all three Rescue-Prime permutations against the
sage-verified vectors in the reference test files
(crypto/src/hash/rescue/*/tests.rs apply_permutation)."""

from winterfell_tpu.crypto.hashers import (
    Rp62_248,
    Rp64_256,
    RpJive64_256,
    rp64_permutation,
    rp62_permutation,
    rp_jive64_permutation,
)
from winterfell_tpu.math.fields import F62, F64, Field


def test_rp64_256_permutation_kat():
    """crypto/src/hash/rescue/rp64_256/tests.rs apply_permutation."""
    state = list(range(12))
    expected = [
        11084501481526603421, 6291559951628160880, 13626645864671311919,
        18397438323058963117, 7443014167353970324, 17930833023906771425,
        4275355080008025761, 7676681476902901785, 3460534574143792217,
        11912731278641497187, 8104899243369883110, 674509706691634438,
    ]
    assert rp64_permutation(state) == expected


def test_rp62_248_permutation_kat():
    """crypto/src/hash/rescue/rp62_248/tests.rs apply_permutation."""
    state = list(range(12))
    expected = [
        2176593392043442589, 3663362000910009411, 2446978550600442325,
        4214718471639678996, 4179776369445579812, 2274316532403536457,
        2336761070419368662, 3192888412646553651, 4092565229845701133,
        753437048204208885, 4067414342325289862, 3516613610105678931,
    ]
    assert rp62_permutation(state) == expected


def test_rp_jive64_256_permutation_kat():
    """crypto/src/hash/rescue/rp64_256_jive/tests.rs apply_permutation."""
    state = list(range(8))
    expected = [
        16940713730596720799, 16218555904323712189, 11042680722444601138,
        5370396747047489939, 6349480890410006944, 1551053614279730715,
        3995941143622927528, 9350074312471431779,
    ]
    assert rp_jive64_permutation(state) == expected


def test_jive_merge_vs_hash_elements_inconsistent_by_design():
    """mod.rs:94-111: merge uses Jive compression, hash_elements the sponge —
    they intentionally differ."""
    f1 = Field(F64, 1)
    d0 = RpJive64_256.hash_elements([(1,), (2,), (3,), (4,)], f1)
    d1 = RpJive64_256.hash_elements([(5,), (6,), (7,), (8,)], f1)
    merged = RpJive64_256.merge(d0, d1)
    sponge = RpJive64_256.hash_elements(
        [(x,) for d in (d0, d1)
         for x in [int.from_bytes(d[8 * i : 8 * i + 8], "little") for i in range(4)]],
        f1)
    assert merged != sponge
    assert len(merged) == 32


def test_rp62_digest_packing_roundtrip():
    f62 = Field(F62, 1)
    d = Rp62_248.hash_elements([(7,), (11,)], f62)
    assert len(d) == 31
    # merge/merge_with_int consume 31-byte digests
    d2 = Rp62_248.merge(d, d)
    assert len(d2) == 31
    d3 = Rp62_248.merge_with_int(d, 12345)
    assert len(d3) == 31 and d3 != d2


def test_rescue_hashers_in_transcript_and_merkle():
    """The new hashers drive the generic Merkle + random coin machinery."""
    import random

    from winterfell_tpu.crypto.merkle import MerkleTree
    from winterfell_tpu.crypto.random_coin import DefaultRandomCoin
    from winterfell_tpu.math.fields import Field

    for hasher, field in ((RpJive64_256, Field(F64, 1)), (Rp62_248, Field(F62, 1))):
        rng = random.Random(3)
        leaves = [rng.randbytes(hasher.digest_size) for _ in range(16)]
        tree = MerkleTree(leaves, hasher)
        opened, proof = tree.prove_batch([2, 9])
        MerkleTree.verify_batch(tree.root, [2, 9], opened, proof, hasher)

        coin = DefaultRandomCoin(hasher, [(1,), (2,)], field)
        e = coin.draw(field)
        assert 0 <= e[0] < field.p
        positions = coin.draw_integers(4, 64, nonce=0)
        assert all(0 <= p < 64 for p in positions)
