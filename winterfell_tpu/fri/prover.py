"""FRI prover (fri/src/prover/mod.rs:95-336)."""

from __future__ import annotations

from typing import List

import numpy as np

from ..air.proof import FriProof, FriProofLayer
from ..crypto.merkle import MerkleTree
from ..math import ntt, vecmath as vm
from ..math.fields import Field
from .folding import apply_drp, fold_positions, transpose_evaluations
from .options import FriOptions


class FriProver:
    """Commit phase + query phase. The channel must provide
    ``commit_fri_layer(root)`` and ``draw_fri_alpha()`` like the reference
    fri::ProverChannel (fri/src/prover/channel.rs)."""

    def __init__(self, field: Field, options: FriOptions, hasher, domain_offset: int):
        self.field = field
        self.options = options
        self.hasher = hasher
        self.domain_offset = domain_offset
        self.layers: List[tuple] = []  # (MerkleTree, transposed (rows,N,d))
        self.remainder_poly: List[tuple] = []

    def build_layers(self, channel, evaluations: np.ndarray) -> None:
        """(prover/mod.rs:179-239). `evaluations`: (n, d) object array."""
        assert not self.layers, "prior proof generation has not been completed"
        n_fold = self.options.folding_factor
        for _ in range(self.options.num_fri_layers(evaluations.shape[0])):
            transposed = transpose_evaluations(evaluations, n_fold)
            leaves = [
                self.hasher.hash_elements(vm.totuples(row), self.field)
                for row in transposed
            ]
            tree = MerkleTree(leaves, self.hasher)
            channel.commit_fri_layer(tree.root)
            alpha = channel.draw_fri_alpha()
            evaluations = apply_drp(self.field, transposed, self.domain_offset, alpha)
            self.layers.append((tree, transposed))

        # remainder: iFFT with offset, keep first n/blowup coeffs REVERSED,
        # commit = hash_elements(remainder) (prover/mod.rs:230-239)
        coeffs = ntt.interpolate_poly_with_offset(
            self.field.base, evaluations, self.domain_offset)
        keep = evaluations.shape[0] // self.options.blowup_factor
        self.remainder_poly = list(reversed(vm.totuples(coeffs[:keep])))
        commitment = self.hasher.hash_elements(self.remainder_poly, self.field)
        channel.commit_fri_layer(commitment)

    def build_proof(self, positions: List[int]) -> FriProof:
        """Query phase (prover/mod.rs:254-290)."""
        assert self.remainder_poly, "FRI layers have not been built yet"
        n_fold = self.options.folding_factor
        proof_layers = []
        if self.layers:
            positions = list(positions)
            domain_size = self.layers[0][1].shape[0] * n_fold
            for tree, transposed in self.layers:
                positions = fold_positions(positions, domain_size, n_fold)
                _, batch_proof = tree.prove_batch(positions)
                query_values = [vm.totuples(transposed[p]) for p in positions]
                proof_layers.append(
                    FriProofLayer.new(self.field, query_values, batch_proof.to_bytes())
                )
                domain_size //= n_fold

        proof = FriProof.new(self.field, proof_layers, self.remainder_poly, 1)
        self.layers = []
        self.remainder_poly = []
        return proof
