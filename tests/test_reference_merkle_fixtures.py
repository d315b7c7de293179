"""Transcription of the reference's OWN Merkle test vectors.

/root/reference/crypto/src/merkle/tests.rs:14-66 defines two constant leaf
sets (LEAVES4, LEAVES8) and asserts exact proof/node-set structures for
them (tests.rs:68-186). These are the reference repo's own expected values,
transcribed verbatim — NOT produced by the code under test — so they pin
our MerkleTree/BatchMerkleProof behavior to the reference's, leaf-for-leaf:

- new_tree        tests.rs:68-84   (root = nested merges)
- prove           tests.rs:86-115  (single-leaf authentication paths)
- prove_batch     tests.rs:138-186 (Octopus node sets for [1], [1,2],
                  [1,6], and the all-indexes empty case)
- verify_batch    tests.rs:188-213 (accept + reject cases)
- from_proofs     tests.rs:239-255 (batch proof from single proofs)

hash_2x1 is Blake3_256::merge (tests.rs:316-318); our Blake3_256 is pinned
to the official BLAKE3 KATs in tests/test_hashers_kat.py, so no expected
byte here originates from this repo's Merkle code.
"""

import pytest

from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.crypto.merkle import BatchMerkleProof, MerkleTree

# tests.rs:14-31, verbatim
LEAVES4 = [bytes(v) for v in [
    [166, 168, 47, 140, 153, 86, 156, 86, 226, 229, 149, 76, 70, 132, 209,
     109, 166, 193, 113, 197, 42, 116, 170, 144, 74, 104, 29, 110, 220, 49,
     224, 123],
    [243, 57, 40, 140, 185, 79, 188, 229, 232, 117, 143, 118, 235, 229, 73,
     251, 163, 246, 151, 170, 14, 243, 255, 127, 175, 230, 94, 227, 214, 5,
     89, 105],
    [11, 33, 220, 93, 26, 67, 166, 154, 93, 7, 115, 130, 70, 13, 166, 45,
     120, 233, 175, 86, 144, 110, 253, 250, 67, 108, 214, 115, 24, 132, 45,
     234],
    [47, 173, 224, 232, 30, 46, 197, 186, 215, 15, 134, 211, 73, 14, 34,
     216, 6, 11, 217, 150, 90, 242, 8, 31, 73, 85, 150, 254, 229, 244, 23,
     231],
]]

# tests.rs:33-66, verbatim
LEAVES8 = [bytes(v) for v in [
    [115, 29, 176, 48, 97, 18, 34, 142, 51, 18, 164, 235, 236, 96, 113, 132,
     189, 26, 70, 93, 101, 143, 142, 52, 252, 33, 80, 157, 194, 52, 209,
     129],
    [52, 46, 37, 214, 24, 248, 121, 199, 229, 25, 171, 67, 65, 37, 98, 142,
     182, 72, 202, 42, 223, 160, 136, 60, 38, 255, 222, 82, 26, 27, 130,
     203],
    [130, 43, 231, 0, 59, 228, 152, 140, 18, 33, 87, 27, 49, 190, 44, 82,
     188, 155, 163, 108, 166, 198, 106, 143, 83, 167, 201, 152, 106, 176,
     242, 119],
    [207, 158, 56, 143, 28, 146, 238, 47, 169, 32, 166, 97, 163, 238, 171,
     243, 33, 209, 120, 219, 17, 182, 96, 136, 13, 90, 6, 27, 247, 242, 49,
     111],
    [179, 64, 123, 119, 226, 139, 161, 127, 36, 251, 218, 88, 20, 217, 212,
     85, 112, 85, 185, 193, 230, 181, 4, 22, 54, 219, 135, 98, 235, 180,
     182, 7],
    [101, 240, 19, 44, 43, 213, 31, 138, 39, 26, 82, 147, 255, 96, 234, 51,
     105, 6, 233, 144, 255, 187, 242, 3, 157, 246, 55, 175, 98, 121, 92,
     175],
    [25, 96, 149, 179, 94, 8, 170, 214, 169, 135, 12, 212, 224, 157, 182,
     127, 233, 93, 151, 214, 36, 183, 156, 212, 233, 152, 125, 244, 146,
     161, 75, 128],
    [247, 43, 130, 141, 234, 172, 61, 187, 109, 31, 56, 30, 14, 232, 92,
     158, 48, 161, 108, 234, 170, 180, 233, 77, 200, 248, 45, 152, 125, 11,
     1, 171],
]]


def h2(a: bytes, b: bytes) -> bytes:
    # hash_2x1 = Blake3_256::merge (tests.rs:316-318)
    return Blake3_256.merge(a, b)


def test_new_tree():  # tests.rs:68-84
    tree = MerkleTree(LEAVES4, Blake3_256)
    assert tree.depth == 2
    assert tree.root == h2(h2(LEAVES4[0], LEAVES4[1]),
                           h2(LEAVES4[2], LEAVES4[3]))

    tree = MerkleTree(LEAVES8, Blake3_256)
    assert tree.depth == 3
    assert tree.root == h2(
        h2(h2(LEAVES8[0], LEAVES8[1]), h2(LEAVES8[2], LEAVES8[3])),
        h2(h2(LEAVES8[4], LEAVES8[5]), h2(LEAVES8[6], LEAVES8[7])))


def test_prove():  # tests.rs:86-115
    tree = MerkleTree(LEAVES4, Blake3_256)
    assert tree.prove(1) == (
        LEAVES4[1], [LEAVES4[0], h2(LEAVES4[2], LEAVES4[3])])
    assert tree.prove(2) == (
        LEAVES4[2], [LEAVES4[3], h2(LEAVES4[0], LEAVES4[1])])

    tree = MerkleTree(LEAVES8, Blake3_256)
    assert tree.prove(1) == (LEAVES8[1], [
        LEAVES8[0],
        h2(LEAVES8[2], LEAVES8[3]),
        h2(h2(LEAVES8[4], LEAVES8[5]), h2(LEAVES8[6], LEAVES8[7])),
    ])
    assert tree.prove(6) == (LEAVES8[6], [
        LEAVES8[7],
        h2(LEAVES8[4], LEAVES8[5]),
        h2(h2(LEAVES8[0], LEAVES8[1]), h2(LEAVES8[2], LEAVES8[3])),
    ])


def test_verify():  # tests.rs:117-136
    tree = MerkleTree(LEAVES4, Blake3_256)
    for idx in (1, 2):
        leaf, proof = tree.prove(idx)
        MerkleTree.verify(tree.root, idx, leaf, proof, Blake3_256)

    tree = MerkleTree(LEAVES8, Blake3_256)
    for idx in (1, 6):
        leaf, proof = tree.prove(idx)
        MerkleTree.verify(tree.root, idx, leaf, proof, Blake3_256)


def test_prove_batch():  # tests.rs:138-186
    tree = MerkleTree(LEAVES8, Blake3_256)
    L = LEAVES8

    # 1 index
    values, proof = tree.prove_batch([1])
    assert values == [L[1]]
    assert proof.nodes == [[
        L[0], h2(L[2], L[3]), h2(h2(L[4], L[5]), h2(L[6], L[7]))]]
    assert proof.depth == 3

    # 2 indexes
    values, proof = tree.prove_batch([1, 2])
    assert values == [L[1], L[2]]
    assert proof.nodes == [
        [L[0], h2(h2(L[4], L[5]), h2(L[6], L[7]))],
        [L[3]],
    ]
    assert proof.depth == 3

    # 2 indexes on opposite sides
    values, proof = tree.prove_batch([1, 6])
    assert values == [L[1], L[6]]
    assert proof.nodes == [
        [L[0], h2(L[2], L[3])],
        [L[7], h2(L[4], L[5])],
    ]
    assert proof.depth == 3

    # all indexes
    values, proof = tree.prove_batch(list(range(8)))
    assert values == L
    assert proof.nodes == [[], [], [], []]
    assert proof.depth == 3


def test_verify_batch():  # tests.rs:188-213
    tree = MerkleTree(LEAVES8, Blake3_256)

    values, proof = tree.prove_batch([1])
    MerkleTree.verify_batch(tree.root, [1], values, proof, Blake3_256)
    with pytest.raises(Exception):
        MerkleTree.verify_batch(tree.root, [2], values, proof, Blake3_256)

    values, proof = tree.prove_batch([1, 2])
    MerkleTree.verify_batch(tree.root, [1, 2], values, proof, Blake3_256)
    for bad in ([1], [1, 3], [1, 2, 3]):
        with pytest.raises(Exception):
            MerkleTree.verify_batch(tree.root, bad, values, proof,
                                    Blake3_256)

    values, proof = tree.prove_batch([1, 6])
    MerkleTree.verify_batch(tree.root, [1, 6], values, proof, Blake3_256)

    values, proof = tree.prove_batch([1, 3, 6])
    MerkleTree.verify_batch(tree.root, [1, 3, 6], values, proof, Blake3_256)

    values, proof = tree.prove_batch(list(range(8)))
    MerkleTree.verify_batch(tree.root, list(range(8)), values, proof,
                            Blake3_256)


def test_from_proofs():  # tests.rs:239-255
    tree = MerkleTree(LEAVES8, Blake3_256)
    indices = [1, 2]
    _, proof1 = tree.prove_batch(indices)
    singles = [tree.prove(i) for i in indices]
    proof2 = BatchMerkleProof.from_single_proofs(singles, indices)
    assert proof1.nodes == proof2.nodes
    assert proof1.depth == proof2.depth
