"""VectorCommitment abstraction (crypto/src/commitment.rs:28-77): MerkleTree
conforms to the interface the prover/verifier consume."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from winterfell_tpu.crypto.commitment import VectorCommitment
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.crypto.merkle import MerkleTree


def test_merkle_tree_is_a_vector_commitment():
    leaves = [bytes([i]) * 32 for i in range(8)]
    tree = MerkleTree(leaves, Blake3_256)
    assert isinstance(tree, VectorCommitment)
    assert tree.domain_len == 8
    assert isinstance(tree.root, bytes) and len(tree.root) == 32

    leaf, proof = tree.prove(3)
    MerkleTree.verify(tree.root, 3, leaf, proof, Blake3_256)

    opened, batch = tree.prove_batch([1, 6])
    MerkleTree.verify_batch(tree.root, [1, 6], opened, batch, Blake3_256)


def test_abstract_interface_not_instantiable():
    try:
        VectorCommitment()
    except TypeError:
        pass
    else:
        raise AssertionError("VectorCommitment must be abstract")
