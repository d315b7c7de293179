"""Reference-sourced byte vectors for NON-TRIVIAL proof sections.

test_reference_dummy_proof.py pins the all-default container layout; these
vectors pin the sections a REAL proof fills — an Octopus batch Merkle proof
with actual skipped-sibling structure, a Queries blob with row-major f128
values, an OodFrame with aux columns, and a FriProofLayer — against byte
strings derived BY HAND from the reference writers:

- BatchMerkleProof   crypto/src/merkle/mod.rs:217-272 (prove_batch node-set
                     construction) + proofs.rs:390-400 (depth u8, vint64
                     node-vector count, each Vec<Digest> as vint64 len +
                     digest bytes)
- Queries            air/src/proof/queries.rs:51-73 (row-major element
                     bytes) + :140-146 (two Vec<u8>: vint64 len + bytes)
- OodFrame           air/src/proof/ood_frame.rs:60-73 (trace_states layout
                     [cur_main, cur_aux, next_main, next_aux] with a u8
                     frame count 2) + :178-188 (u16 lengths)
- FriProofLayer      fri/src/proof.rs:343-353 (u32 lengths — NOT vint64)
- vint64             utils/core/src/serde/byte_writer.rs:77-91
                     (((v << 1) | 1) << (len - 1), little-endian)
- f128 elements      16-byte little-endian (math/src/field/f128/mod.rs
                     canonical representation, IS_CANONICAL = true)

Digest VALUES inside the Merkle vectors are BLAKE3 merges computed with the
in-repo BLAKE3, which is itself pinned to the official BLAKE3 test vectors
(tests/test_hashers_kat.py) — so no byte below originates from the code
under test's serializers.

Hand-derivation of the Octopus node sets for 8 leaves, indexes [1, 6]
(depth 3, heap numbering: node k's children are 2k, 2k+1; leaf i = node
8 + i):

  normalize_indexes([1, 6]) -> [0, 6] (clear low bit, dedup)
  pair (0,1): leaf 0 NOT queried -> nodes[0] = [L0]; leaf 1 queried ->
              returned leaves[0] = L1; next index (0+8)>>1 = 4
  pair (6,7): leaf 6 queried -> leaves[1] = L6; leaf 7 not ->
              nodes[1] = [L7]; next index (6+8)>>1 = 7
  level 2: indexes [4, 7]: sibling(4) = 5 not in set -> nodes[0] += [N5];
           sibling(7) = 6 not in set -> nodes[1] += [N6]; next [2, 3]
  level 1: indexes [2, 3]: sibling(2) = 3 IS next in set -> merged, no
           node recorded (the Octopus compression)
  => nodes = [[L0, N5], [L7, N6]], depth = 3
  with N5 = blake3(L2 ‖ L3), N6 = blake3(L4 ‖ L5).
"""

from winterfell_tpu.air.proof import FriProofLayer, OodFrame, Queries
from winterfell_tpu.crypto.hashers import Blake3_256
from winterfell_tpu.crypto.merkle import MerkleTree
from winterfell_tpu.math.fields import F128, Field

F128_BASE = Field(F128, 1)


def _bytes_of(container) -> bytes:
    from winterfell_tpu.utils.serde import ByteWriter

    w = ByteWriter()
    container.write_into(w)
    return bytes(w._buf)


# leaf digests: distinct constant 32-byte patterns (chosen, not computed)
LEAVES = [bytes([17 * i + 1] * 32) for i in range(8)]
N5 = Blake3_256.hash(LEAVES[2] + LEAVES[3])
N6 = Blake3_256.hash(LEAVES[4] + LEAVES[5])


def vint(v: int) -> bytes:
    # vint64: length L = ceil(bit_length / 7) bytes, value shifted past an
    # L-1-zero-bit unary length marker (byte_writer.rs:77-91)
    length = max(1, -(-v.bit_length() // 7))
    assert length < 9
    return (((v << 1) | 1) << (length - 1)).to_bytes(length, "little")


# --- BatchMerkleProof -------------------------------------------------------

EXPECTED_PROOF = (
    bytes([3])                    # depth u8 (proofs.rs:393)
    + vint(2)                     # node-vector count (proofs.rs:394)
    + vint(2) + LEAVES[0] + N5    # nodes[0] as Vec<Digest>
    + vint(2) + LEAVES[7] + N6    # nodes[1]
)


def test_batch_merkle_proof_bytes_match_reference_derivation():
    tree = MerkleTree(LEAVES, Blake3_256)
    leaves, proof = tree.prove_batch([1, 6])
    assert leaves == [LEAVES[1], LEAVES[6]]
    assert proof.to_bytes() == EXPECTED_PROOF
    # and the proof reconstructs the root (verify_batch's core)
    root = Blake3_256.hash(
        Blake3_256.hash(Blake3_256.hash(LEAVES[0] + LEAVES[1]) + N5)
        + Blake3_256.hash(N6 + Blake3_256.hash(LEAVES[6] + LEAVES[7])))
    assert tree.root == root


# --- Queries ----------------------------------------------------------------


def _le16(v: int) -> bytes:
    return v.to_bytes(16, "little")


def test_queries_bytes_match_reference_derivation():
    rows = [[(i + 1,), (100 + i,)] for i in range(2)]  # 2 queries x 2 f128
    q = Queries.new(EXPECTED_PROOF, rows, F128_BASE)
    expected = (
        vint(64)                                    # values Vec<u8> length
        + _le16(1) + _le16(100)                     # row 0, row-major
        + _le16(2) + _le16(101)                     # row 1
        + vint(len(EXPECTED_PROOF)) + EXPECTED_PROOF
    )
    assert _bytes_of(q) == expected
    # the proof blob is 132 bytes (depth 1 + count 1 + 2·(vint 1 + 64)) ->
    # the vint64 takes the 2-byte form: ((132·2+1) << 1) = 0x0212 LE
    assert len(EXPECTED_PROOF) == 132
    assert vint(len(EXPECTED_PROOF)) == bytes([0x12, 0x02])


# --- OodFrame ---------------------------------------------------------------


def test_ood_frame_bytes_match_reference_derivation():
    # main width 2, aux width 1, 2 quotient columns, f128 base elements
    frame = OodFrame.new(
        F128_BASE,
        trace_current=[(11,), (12,), (13,)],   # a1 a2 | c1
        trace_next=[(21,), (22,), (23,)],      # b1 b2 | d1
        quot_current=[(31,), (32,)],
        quot_next=[(41,), (42,)],
    )
    trace_blob = bytes([2]) + b"".join(
        _le16(v) for v in (11, 12, 13, 21, 22, 23))
    quot_blob = bytes([2]) + b"".join(_le16(v) for v in (31, 32, 41, 42))
    expected = (
        len(trace_blob).to_bytes(2, "little") + trace_blob    # u16 + bytes
        + len(quot_blob).to_bytes(2, "little") + quot_blob
    )
    assert _bytes_of(frame) == expected


# --- FriProofLayer ----------------------------------------------------------


def test_fri_proof_layer_bytes_match_reference_derivation():
    ext = Field(F128, 2)
    # 2 queries x folding-4 rows of quadratic-extension values
    rows = [[(10 * r + c, 1000 + 10 * r + c) for c in range(4)]
            for r in range(2)]
    layer = FriProofLayer.new(ext, rows, EXPECTED_PROOF)
    values = b"".join(
        _le16(10 * r + c) + _le16(1000 + 10 * r + c)
        for r in range(2) for c in range(4))
    expected = (
        len(values).to_bytes(4, "little") + values            # u32 lengths
        + len(EXPECTED_PROOF).to_bytes(4, "little") + EXPECTED_PROOF
    )
    assert _bytes_of(layer) == expected
