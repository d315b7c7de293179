"""Reference-sourced proof-container byte vector.

The reference's ``Proof::new_dummy()`` (air/src/proof/mod.rs:146-183) is
built entirely from compile-time constants, so its serialized bytes are
fully determined by the reference serializers. The expected byte string
below is derived BY HAND from the reference source — every byte annotated
with the Rust writer that produces it — and therefore constitutes
cross-validation evidence that does not originate from this repo's own
serializer:

- Context            air/src/proof/context.rs:144-151
- TraceInfo          air/src/air/trace_info.rs:240-263
- ProofOptions       air/src/options.rs:309-320 (FieldExtension::None = 1,
                     BatchingMethod::Linear = 0, PartitionOptions::new(1,1))
- vint64 usize       utils/core/src/serde/byte_writer.rs:77-91
- Commitments        air/src/proof/commitments.rs:95-99 (Default = empty)
- Queries            air/src/proof/queries.rs:51-73, 140-146
                     (values/opening_proof each as Vec<u8>: vint len + bytes,
                     utils/core/src/serde/mod.rs:295-299)
- BatchMerkleProof   crypto/src/merkle/proofs.rs:390-400
                     ({nodes: [], depth: 0} -> [00][01])
- OodFrame           air/src/proof/ood_frame.rs:180-188 (Default = empty)
- FriProof           fri/src/proof.rs:76-82, 200-213 (new_dummy)
- pow_nonce          u64 LE (air/src/proof/mod.rs:198)
"""

from winterfell_tpu.air import (
    BatchingMethod,
    FieldExtension,
    ProofOptions,
    TraceInfo,
)
from winterfell_tpu.air.proof import (
    Commitments,
    Context,
    FriProof,
    OodFrame,
    Proof,
    Queries,
)
from winterfell_tpu.math.fields import F64, Field

EXPECTED = bytes.fromhex(
    # --- Context ---------------------------------------------------------
    # TraceInfo::new(1, 8): main_width u8, aux_width u8, aux_rands u8,
    # ilog2(length) u8, meta len u16
    "01" "00" "00" "03" "0000"
    # modulus byte-count u8 + f64 modulus 2^64-2^32+1 LE
    "08" "01000000ffffffff"
    # ProofOptions::new(1, 2, 2, None, 8, 1, Linear, Linear):
    # num_queries, blowup, grinding, FieldExtension::None=1, folding,
    # remainder_max_degree, batching_constraints=0, batching_deep=0,
    # partition num_partitions=1, hash_rate=1
    "01" "02" "02" "01" "08" "01" "00" "00" "01" "01"
    # num_constraints = 100 as vint64: (100<<1)|1 = 0xC9
    "c9"
    # --- num_unique_queries u8 ------------------------------------------
    "01"
    # --- Commitments::default: u16 len = 0 ------------------------------
    "0000"
    # --- trace_queries[0]: values Vec<u8> = 8 bytes of f64 ONE ----------
    # vint len 8 = 0x11, element 1u64 LE; opening proof Vec<u8> =
    # [depth=00, vint 0 nodes = 01] with vint len 2 = 0x05
    "11" "0100000000000000" "05" "0001"
    # --- constraint_queries: identical dummy query ----------------------
    "11" "0100000000000000" "05" "0001"
    # --- OodFrame::default: two u16 zero lengths ------------------------
    "0000" "0000"
    # --- FriProof::new_dummy: layers u8=0, remainder u16 len=0,
    #     num_partitions u8=0
    "00" "0000" "00"
    # --- pow_nonce u64 LE -----------------------------------------------
    "0000000000000000"
)


def _new_dummy() -> Proof:
    """Mirror of Proof::new_dummy() through this repo's containers."""
    options = ProofOptions(
        num_queries=1, blowup_factor=2, grinding_factor=2,
        field_extension=FieldExtension.NONE, fri_folding_factor=8,
        fri_remainder_max_degree=1,
        batching_constraints=BatchingMethod.LINEAR,
        batching_deep=BatchingMethod.LINEAR,
    )
    base = Field(F64, 1)
    dummy_query = Queries.new(b"\x00\x01", [[(1,)]], base)
    return Proof(
        context=Context.new(F64, TraceInfo(1, 8), options, 100),
        num_unique_queries=1,
        commitments=Commitments(b""),
        trace_queries=[dummy_query],
        constraint_queries=Queries.new(b"\x00\x01", [[(1,)]], base),
        ood_frame=OodFrame(b"", b""),
        fri_proof=FriProof([], b"", 0),
        pow_nonce=0,
    )


def test_dummy_proof_bytes_match_reference_derivation():
    assert _new_dummy().to_bytes() == EXPECTED


def test_dummy_proof_roundtrip():
    """dummy_proof_serialization (air/src/proof/tests.rs:13-21)."""
    proof = _new_dummy()
    copy = Proof.from_bytes(proof.to_bytes())
    assert copy.to_bytes() == proof.to_bytes()
