"""E2E test: merkle path verification example (periodic assertions + bit
constraints + degree-5 constraints)."""

import pytest

from winterfell_tpu.air import FieldExtension, ProofOptions
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.examples.merkle import (
    MerkleAir,
    MerklePublicInputs,
    MerkleProver,
    build_merkle_trace,
    build_rescue128_merkle_tree,
    merkle_prove_path,
    rescue128_digest,
    rescue128_merge,
)
from winterfell_tpu.math.fields import F128
from winterfell_tpu.verifier import VerifierError, verify


def _setup(depth=7, index=42):
    value = (42, 43)
    leaves, nodes = build_rescue128_merkle_tree(depth, value, index)
    leaf, path = merkle_prove_path(leaves, nodes, index)
    branch = [leaf] + path
    root = nodes[1]
    return value, branch, index, root


def test_merkle_path_consistency():
    value, branch, index, root = _setup(depth=3, index=5)
    # recompute root from the path by hand
    node = rescue128_digest(list(value))
    idx = index
    for sibling in branch[1:]:
        if idx & 1:
            node = rescue128_merge(sibling, node)
        else:
            node = rescue128_merge(node, sibling)
        idx >>= 1
    assert node == root


def test_merkle_e2e():
    value, branch, index, root = _setup(depth=7, index=42)
    trace = build_merkle_trace(value, branch, index)
    assert trace.length == 64
    # blowup 16 to accommodate degree-5+cycle constraints (min blowup 8)
    options = ProofOptions(28, 16, 0, FieldExtension.NONE, 4, 7)
    prover = MerkleProver(options, Blake3_256, root)
    proof = prover.prove(trace)
    verify(MerkleAir, proof, MerklePublicInputs(root), Blake3_256)


def test_merkle_wrong_root_fails():
    value, branch, index, root = _setup(depth=7, index=99)
    trace = build_merkle_trace(value, branch, index)
    options = ProofOptions(28, 16, 0, FieldExtension.NONE, 4, 7)
    prover = MerkleProver(options, Blake3_256, root)
    proof = prover.prove(trace)
    bad = MerklePublicInputs(((root[0] + 1) % F128.p, root[1]))
    with pytest.raises(VerifierError):
        verify(MerkleAir, proof, bad, Blake3_256)
