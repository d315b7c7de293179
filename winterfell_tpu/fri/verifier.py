"""FRI verifier (fri/src/verifier/mod.rs:60-360)."""

from __future__ import annotations

from typing import List

from ..air.proof import FriProof
from ..crypto.merkle import BatchMerkleProof, MerkleTree
from ..math import polynom
from ..math.fields import Field
from .folding import fold_positions
from .options import FriOptions


class FriVerifierError(Exception):
    pass


def map_positions_to_indexes(positions: List[int], source_domain_size: int,
                             folding_factor: int, num_partitions: int) -> List[int]:
    """(fri/src/utils.rs:9-33)."""
    if num_partitions == 1:
        return list(positions)
    target = source_domain_size // folding_factor
    partition_size = target // num_partitions
    out = []
    for position in positions:
        partition_idx = position % num_partitions
        local_idx = (position - partition_idx) // num_partitions
        out.append(partition_idx * partition_size + local_idx)
    return out


class DefaultVerifierChannel:
    """Parses a FriProof into typed layer queries and verifies decommitments
    (fri/src/verifier/channel.rs:128+)."""

    def __init__(self, proof: FriProof, layer_commitments: List[bytes],
                 domain_size: int, folding_factor: int, field: Field, hasher):
        self.field = field
        self.hasher = hasher
        self.layer_commitments = layer_commitments
        self.num_partitions = proof.num_partitions
        self.remainder_raw = proof.parse_remainder(field)
        self.layer_queries = []  # per layer: flat value list
        self.layer_proofs = []
        for layer in proof.layers:
            values, path_bytes = layer.parse(field, folding_factor)
            self.layer_queries.append(values)
            self.layer_proofs.append(
                BatchMerkleProof.from_bytes(path_bytes, hasher.digest_size))

    def read_layer_queries(self, depth: int, position_indexes: List[int],
                           commitment: bytes, folding_factor: int) -> List[list]:
        """Returns per-position rows of N values after verifying the batch
        opening proof against `commitment`."""
        flat = self.layer_queries[depth]
        n = folding_factor
        rows = [flat[i * n : (i + 1) * n] for i in range(len(flat) // n)]
        if len(rows) != len(position_indexes):
            raise FriVerifierError(f"layer {depth}: query count mismatch")
        leaves = [self.hasher.hash_elements(row, self.field) for row in rows]
        try:
            MerkleTree.verify_batch(commitment, position_indexes, leaves,
                                    self.layer_proofs[depth], self.hasher)
        except Exception as e:
            raise FriVerifierError(f"layer {depth} decommitment failed: {e}")
        return rows

    def read_remainder(self, commitment: bytes) -> List[tuple]:
        expected = self.hasher.hash_elements(self.remainder_raw, self.field)
        if expected != commitment:
            raise FriVerifierError("FRI remainder commitment mismatch")
        return self.remainder_raw


class FriVerifier:
    """`layer_commitments` and `layer_alphas` are produced by the caller's
    commit-phase pass over the transcript (verifier/mod.rs:107-154)."""

    def __init__(self, field: Field, options: FriOptions, max_poly_degree: int,
                 layer_commitments: List[bytes], layer_alphas: List[tuple],
                 domain_offset: int):
        self.field = field
        self.options = options
        self.max_poly_degree = max_poly_degree
        np2 = 1
        while np2 < max_poly_degree + 1:
            np2 *= 2
        self.domain_size = np2 * options.blowup_factor
        self.domain_generator = field.base.get_root_of_unity(
            self.domain_size.bit_length() - 1)
        self.layer_commitments = layer_commitments
        self.layer_alphas = layer_alphas
        self.domain_offset = domain_offset

        # degree-truncation sanity (verifier/mod.rs:122-140)
        max_degree_plus_1 = max_poly_degree + 1
        for depth in range(len(layer_commitments)):
            if depth != len(layer_commitments) - 1 and \
                    max_degree_plus_1 % options.folding_factor != 0:
                raise FriVerifierError(f"degree truncation at layer {depth}")
            max_degree_plus_1 //= options.folding_factor

    def verify(self, channel: DefaultVerifierChannel, evaluations: List[tuple],
               positions: List[int]) -> None:
        """(verifier/mod.rs:236-328)."""
        if len(evaluations) != len(positions):
            raise FriVerifierError("positions/evaluations length mismatch")
        field = self.field
        base = field.base
        p = base.p
        n_fold = self.options.folding_factor
        folding_roots = [
            pow(self.domain_generator, self.domain_size // n_fold * i, p)
            for i in range(n_fold)
        ]

        domain_generator = self.domain_generator
        domain_size = self.domain_size
        max_degree_plus_1 = self.max_poly_degree + 1
        positions = list(positions)
        evaluations = list(evaluations)

        for depth in range(self.options.num_fri_layers(self.domain_size)):
            folded_positions = fold_positions(positions, domain_size, n_fold)
            position_indexes = map_positions_to_indexes(
                folded_positions, domain_size, n_fold, channel.num_partitions)
            layer_commitment = self.layer_commitments[depth]
            layer_values = channel.read_layer_queries(
                depth, position_indexes, layer_commitment, n_fold)

            # cross-check claimed evaluations against the queried rows
            row_length = domain_size // n_fold
            query_values = []
            for position in positions:
                idx = folded_positions.index(position % row_length)
                query_values.append(layer_values[idx][position // row_length])
            if evaluations != query_values:
                raise FriVerifierError(f"invalid layer folding at depth {depth}")

            # interpolate each row over its coset x-coordinates, evaluate at α
            alpha = self.layer_alphas[depth]
            new_evals = []
            for i, pos in enumerate(folded_positions):
                xe = pow(domain_generator, pos, p) * self.domain_offset % p
                xs = [field.from_base(xe * r % p) for r in folding_roots]
                poly = polynom.interpolate(field, xs, layer_values[i])
                new_evals.append(polynom.eval_poly(field, poly, alpha))
            evaluations = new_evals

            if max_degree_plus_1 % n_fold != 0:
                raise FriVerifierError(f"degree truncation at depth {depth}")
            domain_generator = pow(domain_generator, n_fold, p)
            max_degree_plus_1 //= n_fold
            domain_size //= n_fold
            positions = folded_positions

        # remainder check via reverse-Horner (verifier/mod.rs:310-328)
        remainder_poly = channel.read_remainder(self.layer_commitments[-1])
        if len(remainder_poly) > max_degree_plus_1:
            raise FriVerifierError("remainder degree mismatch")
        for position, evaluation in zip(positions, evaluations):
            x = self.domain_offset * pow(domain_generator, position, p) % p
            acc = field.zero()
            for coeff in remainder_poly:
                acc = field.add(field.mul_base(acc, x), coeff)
            if acc != evaluation:
                raise FriVerifierError("invalid remainder folding")
