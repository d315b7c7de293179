"""Merkle tree vector commitment with Octopus-compressed batch proofs.

Mirrors crypto/src/merkle/{mod,proofs}.rs: heap node layout with the root at
``nodes[1]`` (mod.rs:344-368), single openings as (leaf, sibling chain)
(mod.rs:193-207), batch openings that skip shared internal nodes
(mod.rs:217-272, the Octopus scheme of proofs.rs:16-118), and batch-proof
reconstruction ``get_root`` (proofs.rs:103-236).

Digests are raw ``bytes``. Leaf hashing (hashing rows of field elements into
digests) happens upstream; the tree commits to pre-hashed leaves exactly like
the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

from ..utils.serde import ByteReader, ByteWriter, DeserializationError
from .commitment import VectorCommitment


class MerkleTreeError(Exception):
    pass


def _are_siblings(left: int, right: int) -> bool:
    return left & 1 == 0 and right - 1 == left


def _map_indexes(indexes: List[int], depth: int) -> Dict[int, int]:
    num_leaves = 1 << depth
    index_map: Dict[int, int] = {}
    for i, index in enumerate(indexes):
        index_map[index] = i
        if index >= num_leaves:
            raise MerkleTreeError(f"leaf index {index} out of bounds for {num_leaves} leaves")
    if len(indexes) != len(index_map):
        raise MerkleTreeError("duplicate leaf index")
    return index_map


def _normalize_indexes(indexes: List[int]) -> List[int]:
    return sorted({i - (i & 1) for i in indexes})


@dataclass
class BatchMerkleProof:
    """Octopus batch proof: per normalized index, the sibling digests not
    recomputable from the opened leaves (proofs.rs:23-28)."""

    nodes: List[List[bytes]]
    depth: int

    @classmethod
    def from_single_proofs(
        cls, proofs: List[Tuple[bytes, List[bytes]]], indexes: List[int]
    ) -> "BatchMerkleProof":
        """Builds a batch proof from individual ``MerkleTree.prove``
        openings (proofs.rs:38-99): sort by index, then drop every sibling
        digest that the opened leaves make recomputable — at the leaf
        level a queried sibling replaces the path node, at higher levels
        two openings that converge on sibling internal nodes merge."""
        if not proofs:
            raise MerkleTreeError("at least one proof must be provided")
        if len(proofs) != len(indexes):
            raise MerkleTreeError("number of proofs must equal number of indexes")
        depth = len(proofs[0][1])
        by_index = {}
        for index, proof in zip(indexes, proofs):
            if len(proof[1]) != depth:
                raise MerkleTreeError("not all proofs have the same length")
            by_index[index] = proof
        idxs = sorted(by_index)
        prfs = [by_index[i] for i in idxs]

        nodes: List[List[bytes]] = []
        proof_map: Dict[int, Tuple[bytes, List[bytes]]] = {}
        i = 0
        while i < len(idxs):
            if i + 1 < len(idxs) and _are_siblings(idxs[i], idxs[i + 1]):
                nodes.append([])
                i += 1  # queried sibling pair: leaf recomputable, no node
            else:
                nodes.append([prfs[i][1][0]])
            proof_map[idxs[i] >> 1] = prfs[i]
            i += 1

        for d in range(1, depth):
            layer = sorted(proof_map)
            next_map: Dict[int, Tuple[bytes, List[bytes]]] = {}
            i = 0
            while i < len(layer):
                index = layer[i]
                proof = proof_map[index]
                if i + 1 < len(layer) and _are_siblings(index, layer[i + 1]):
                    i += 1  # openings converge: internal sibling recomputable
                else:
                    nodes[i].append(proof[1][d])
                next_map[index >> 1] = proof
                i += 1
            proof_map = next_map

        return cls(nodes=nodes, depth=depth)

    def get_root(self, indexes: List[int], leaves: List[bytes], hasher) -> bytes:
        """Reconstructs the root (proofs.rs:103-236)."""
        if not indexes:
            raise MerkleTreeError("no leaf indexes provided")
        index_map = _map_indexes(indexes, self.depth)
        norm = _normalize_indexes(indexes)
        if len(norm) != len(self.nodes):
            raise MerkleTreeError("invalid proof: node vector count mismatch")

        offset = 1 << self.depth
        v: Dict[int, bytes] = {}
        next_indexes: List[int] = []
        proof_pointers: List[int] = []
        for i, index in enumerate(norm):
            if index in index_map:
                buf0 = leaves[index_map[index]]
                if index + 1 in index_map:
                    buf1 = leaves[index_map[index + 1]]
                    proof_pointers.append(0)
                else:
                    if not self.nodes[i]:
                        raise MerkleTreeError("invalid proof")
                    buf1 = self.nodes[i][0]
                    proof_pointers.append(1)
            else:
                if not self.nodes[i]:
                    raise MerkleTreeError("invalid proof")
                buf0 = self.nodes[i][0]
                if index + 1 in index_map:
                    buf1 = leaves[index_map[index + 1]]
                else:
                    raise MerkleTreeError("invalid proof")
                proof_pointers.append(1)
            parent = hasher.merge(buf0, buf1)
            parent_index = (offset + index) >> 1
            v[parent_index] = parent
            next_indexes.append(parent_index)

        for _ in range(1, self.depth):
            indexes_lvl = list(next_indexes)
            next_indexes = []
            i = 0
            while i < len(indexes_lvl):
                node_index = indexes_lvl[i]
                sibling_index = node_index ^ 1
                if i + 1 < len(indexes_lvl) and indexes_lvl[i + 1] == sibling_index:
                    sibling = v.get(sibling_index)
                    if sibling is None:
                        raise MerkleTreeError("invalid proof")
                    i += 1
                else:
                    pointer = proof_pointers[i]
                    if len(self.nodes[i]) <= pointer:
                        raise MerkleTreeError("invalid proof")
                    sibling = self.nodes[i][pointer]
                    proof_pointers[i] += 1
                node = v.get(node_index)
                if node is None:
                    raise MerkleTreeError("invalid proof")
                if node_index & 1:
                    parent = hasher.merge(sibling, node)
                else:
                    parent = hasher.merge(node, sibling)
                parent_index = node_index >> 1
                v[parent_index] = parent
                next_indexes.append(parent_index)
                i += 1
        root = v.get(1)
        if root is None:
            raise MerkleTreeError("invalid proof")
        return root

    # -- serde (proofs.rs:390-420) ------------------------------------------

    def write_into(self, w: ByteWriter) -> None:
        w.write_u8(self.depth)
        w.write_usize(len(self.nodes))
        for digests in self.nodes:
            w.write_usize(len(digests))
            for d in digests:
                w.write_bytes(d)

    def to_bytes(self) -> bytes:
        w = ByteWriter()
        self.write_into(w)
        return w.to_bytes()

    @classmethod
    def read_from(cls, r: ByteReader, digest_size: int) -> "BatchMerkleProof":
        depth = r.read_u8()
        num_node_vectors = r.read_usize()
        nodes = []
        for _ in range(num_node_vectors):
            count = r.read_usize()
            nodes.append([r.read_bytes(digest_size) for _ in range(count)])
        return cls(nodes, depth)

    @classmethod
    def from_bytes(cls, data: bytes, digest_size: int) -> "BatchMerkleProof":
        r = ByteReader(data)
        proof = cls.read_from(r, digest_size)
        if r.has_more_bytes():
            raise DeserializationError("unconsumed batch proof bytes")
        return proof


class MerkleTree(VectorCommitment):
    """Fully-balanced binary Merkle tree over pre-hashed leaf digests — the
    production ``VectorCommitment`` (crypto/src/merkle/mod.rs impl)."""

    def __init__(self, leaves: List[bytes], hasher):
        n = len(leaves)
        if n < 2:
            raise MerkleTreeError("a Merkle tree requires at least 2 leaves")
        if n & (n - 1):
            raise MerkleTreeError("number of leaves must be a power of two")
        self.leaves = list(leaves)
        self.hasher = hasher
        # heap layout: nodes[1] = root, leaf parents at [n/2, n)
        nodes: List[bytes] = [b""] * n
        half = n // 2
        for i in range(half):
            nodes[half + i] = hasher.merge(leaves[2 * i], leaves[2 * i + 1])
        for i in range(half - 1, 0, -1):
            nodes[i] = hasher.merge(nodes[2 * i], nodes[2 * i + 1])
        self.nodes = nodes

    @property
    def root(self) -> bytes:
        return self.nodes[1]

    @property
    def depth(self) -> int:
        return len(self.leaves).bit_length() - 1

    @property
    def domain_len(self) -> int:
        return len(self.leaves)

    def prove(self, index: int) -> Tuple[bytes, List[bytes]]:
        """Single opening: (leaf, [leaf sibling, node siblings...])."""
        n = len(self.leaves)
        if index >= n:
            raise MerkleTreeError("leaf index out of bounds")
        leaf = self.leaves[index]
        proof = [self.leaves[index ^ 1]]
        idx = (index + n) >> 1
        while idx > 1:
            proof.append(self.nodes[idx ^ 1])
            idx >>= 1
        return leaf, proof

    def prove_batch(self, indexes: List[int]) -> Tuple[List[bytes], BatchMerkleProof]:
        """Octopus batch opening (mod.rs:217-272). Returns (opened leaves in
        normalized order, batch proof)."""
        if not indexes:
            raise MerkleTreeError("no leaf indexes provided")
        index_map = _map_indexes(indexes, self.depth)
        norm = _normalize_indexes(indexes)
        leaves: List[bytes] = [b""] * len(index_map)
        nodes: List[List[bytes]] = []

        n = len(self.leaves)
        next_indexes: List[int] = []
        for index in norm:
            missing = []
            for i in (index, index + 1):
                v = self.leaves[i]
                if i in index_map:
                    leaves[index_map[i]] = v
                else:
                    missing.append(v)
            nodes.append(missing)
            next_indexes.append((index + n) >> 1)

        for _ in range(1, self.depth):
            indexes_lvl = list(next_indexes)
            next_indexes = []
            i = 0
            while i < len(indexes_lvl):
                sibling_index = indexes_lvl[i] ^ 1
                if i + 1 < len(indexes_lvl) and indexes_lvl[i + 1] == sibling_index:
                    i += 1
                else:
                    nodes[i].append(self.nodes[sibling_index])
                next_indexes.append(sibling_index >> 1)
                i += 1

        return leaves, BatchMerkleProof(nodes, self.depth)

    # -- verification (static) ----------------------------------------------

    @staticmethod
    def verify(root: bytes, index: int, leaf: bytes, proof: List[bytes], hasher) -> None:
        if index & 1 == 0:
            v = hasher.merge(leaf, proof[0])
        else:
            v = hasher.merge(proof[0], leaf)
        idx = (index + (1 << len(proof))) >> 1
        for p in proof[1:]:
            if idx & 1 == 0:
                v = hasher.merge(v, p)
            else:
                v = hasher.merge(p, v)
            idx >>= 1
        if v != root:
            raise MerkleTreeError("invalid Merkle proof")

    @staticmethod
    def verify_batch(root: bytes, indexes: List[int], leaves: List[bytes],
                     proof: BatchMerkleProof, hasher) -> None:
        if root != proof.get_root(indexes, leaves, hasher):
            raise MerkleTreeError("invalid batch Merkle proof")
