"""Merkle tree + Octopus batch proof tests (model: crypto/src/merkle/tests.rs)."""

import random

import pytest

from winterfell_tpu.crypto.hashers import Blake3_256, Rp64_256, Sha3_256
from winterfell_tpu.crypto.merkle import BatchMerkleProof, MerkleTree, MerkleTreeError


def _leaves(n, seed=1):
    rng = random.Random(seed)
    return [rng.randbytes(32) for _ in range(n)]


@pytest.mark.parametrize("hasher", [Blake3_256, Sha3_256, Rp64_256])
@pytest.mark.parametrize("n", [2, 4, 8, 64])
def test_prove_verify_single(hasher, n):
    leaves = _leaves(n)
    tree = MerkleTree(leaves, hasher)
    for idx in range(n):
        leaf, proof = tree.prove(idx)
        assert leaf == leaves[idx]
        MerkleTree.verify(tree.root, idx, leaf, proof, hasher)
    # tamper
    leaf, proof = tree.prove(0)
    with pytest.raises(MerkleTreeError):
        MerkleTree.verify(tree.root, 0, b"\x00" * 32, proof, hasher)


@pytest.mark.parametrize("n,indexes", [
    (8, [1]),
    (8, [0, 1]),  # siblings
    (8, [0, 5, 6]),
    (16, [0, 1, 2, 3, 4, 5, 6, 7]),
    (64, [3, 17, 18, 45, 44]),
    (128, [0, 127]),
])
def test_prove_verify_batch(n, indexes):
    leaves = _leaves(n)
    tree = MerkleTree(leaves, Blake3_256)
    opened, proof = tree.prove_batch(indexes)
    MerkleTree.verify_batch(tree.root, indexes, opened, proof, Blake3_256)
    # wrong root must fail
    with pytest.raises(MerkleTreeError):
        MerkleTree.verify_batch(b"\x01" * 32, indexes, opened, proof, Blake3_256)


def test_batch_proof_serde_roundtrip():
    leaves = _leaves(64)
    tree = MerkleTree(leaves, Blake3_256)
    indexes = [3, 17, 18, 45, 44]
    opened, proof = tree.prove_batch(indexes)
    data = proof.to_bytes()
    proof2 = BatchMerkleProof.from_bytes(data, 32)
    assert proof2.depth == proof.depth
    assert proof2.nodes == proof.nodes
    MerkleTree.verify_batch(tree.root, indexes, opened, proof2, Blake3_256)


def test_single_vs_batch_consistency():
    """A batch of one index must verify like the single opening."""
    leaves = _leaves(32)
    tree = MerkleTree(leaves, Blake3_256)
    opened, bproof = tree.prove_batch([7])
    assert opened == [leaves[7]]
    MerkleTree.verify_batch(tree.root, [7], opened, bproof, Blake3_256)


def test_duplicate_index_rejected():
    tree = MerkleTree(_leaves(8), Blake3_256)
    with pytest.raises(MerkleTreeError):
        tree.prove_batch([1, 1])


def test_non_power_of_two_rejected():
    with pytest.raises(MerkleTreeError):
        MerkleTree(_leaves(6), Blake3_256)
