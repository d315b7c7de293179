"""Proof container serde tests (model: air/src/proof/tests.rs + options tests)."""

import pytest

from winterfell_tpu.air.options import (
    BatchingMethod,
    FieldExtension,
    PartitionOptions,
    ProofOptions,
)
from winterfell_tpu.air.proof import (
    Commitments,
    Context,
    FriProof,
    FriProofLayer,
    OodFrame,
    Proof,
    Queries,
    merge_ood_evaluations,
)
from winterfell_tpu.air.trace_info import TraceInfo
from winterfell_tpu.math.fields import F64, F64_1, F128, F128_1, Field
from winterfell_tpu.utils.serde import ByteReader, ByteWriter


def _options(**kw):
    defaults = dict(
        num_queries=32,
        blowup_factor=8,
        grinding_factor=16,
        field_extension=FieldExtension.NONE,
        fri_folding_factor=8,
        fri_remainder_max_degree=31,
    )
    defaults.update(kw)
    return ProofOptions(**defaults)


def _roundtrip(obj, read):
    w = ByteWriter()
    obj.write_into(w)
    data = w.to_bytes()
    r = ByteReader(data)
    obj2 = read(r)
    assert not r.has_more_bytes()
    return obj2, data


def test_proof_options_serde():
    opts = _options(
        field_extension=FieldExtension.CUBIC,
        batching_constraints=BatchingMethod.ALGEBRAIC,
        batching_deep=BatchingMethod.HORNER,
    ).with_partitions(4, 8)
    opts2, data = _roundtrip(opts, ProofOptions.read_from)
    assert opts2 == opts
    # exact layout: 10 bytes (air/src/options.rs:307-320)
    assert len(data) == 10
    assert data == bytes([32, 8, 16, 3, 8, 31, 1, 2, 4, 8])


def test_proof_options_to_elements():
    opts = _options()
    elems = opts.to_elements(F64_1)
    # buf = ext(1)<<24 | folding(8)<<16 | remainder(31)<<8 | blowup(8)
    expected = (1 << 24) | (8 << 16) | (31 << 8) | 8
    assert elems == [(expected,), (16,), (32,)]


def test_trace_info_serde():
    info = TraceInfo(20, 64)
    info2, data = _roundtrip(info, TraceInfo.read_from)
    assert info2 == info
    assert data == bytes([20, 0, 0, 6, 0, 0])

    info = TraceInfo(20, 1 << 16, aux_segment_width=9, num_aux_segment_rands=12,
                     meta=b"\x01\x02\x03\x04")
    info2, _ = _roundtrip(info, TraceInfo.read_from)
    assert info2 == info


def test_trace_info_to_elements():
    """Mirrors the reference unit test air/src/air/trace_info.rs:345-388."""
    info = TraceInfo(20, 64)
    first = int.from_bytes(bytes([0, 20, 0, 0]), "little")
    assert info.to_elements(F64_1) == [(first,), (64,)]

    info = TraceInfo(20, 64, aux_segment_width=9, num_aux_segment_rands=12,
                     meta=bytes([1, 2, 3, 4]))
    first = int.from_bytes(bytes([12, 9, 1, 20]), "little")
    meta = int.from_bytes(bytes([1, 2, 3, 4]) + b"\x00" * 4, "little")
    assert info.to_elements(F64_1) == [(first,), (64,), (meta,)]


@pytest.mark.parametrize("base,field_", [(F64, F64_1), (F128, F128_1)])
def test_context_roundtrip(base, field_):
    ctx = Context.new(base, TraceInfo(4, 1024), _options(), 7)
    ctx2, _ = _roundtrip(ctx, Context.read_from)
    assert ctx2 == ctx
    assert ctx2.base_field() is base
    elems = ctx.to_elements(field_)
    # trace(2) + modulus(2) + constraints(1) + options(3)
    assert len(elems) == 8


def test_commitments_parse():
    roots = [bytes([i]) * 32 for i in range(5)]
    c = Commitments.new(roots[:1], roots[1], roots[2:])
    tr, cr, fr = c.parse(32, 1, 2)
    assert tr == roots[:1] and cr == roots[1] and fr == roots[2:]
    c2, _ = _roundtrip(c, Commitments.read_from)
    assert c2 == c


def test_queries_roundtrip():
    f = F128_1
    rows = [[f.from_int(3 * i + j) for j in range(4)] for i in range(5)]
    q = Queries.new(b"\xAB" * 10, rows, f)
    q2, _ = _roundtrip(q, Queries.read_from)
    assert q2 == q
    proof, rows2 = q2.parse(f, 64, 5, 4)
    assert proof == b"\xAB" * 10
    assert rows2 == rows


def test_ood_frame_roundtrip():
    f = Field(F64, 3)
    cur = [f.from_int(i) for i in range(5)]
    nxt = [f.from_int(100 + i) for i in range(5)]
    qc = [f.from_int(200 + i) for i in range(3)]
    qn = [f.from_int(300 + i) for i in range(3)]
    frame = OodFrame.new(f, cur, nxt, qc, qn)
    frame2, _ = _roundtrip(frame, OodFrame.read_from)
    assert frame2 == frame
    c2, n2, q2, qn2 = frame2.parse(f, 3, 2, 3)
    assert (c2, n2, q2, qn2) == (cur, nxt, qc, qn)
    merged = merge_ood_evaluations(c2, n2, q2, qn2)
    assert merged == cur + qc + nxt + qn


def test_fri_proof_roundtrip():
    f = F128_1
    layers = [
        FriProofLayer.new(f, [[f.from_int(i * 10 + j) for j in range(4)] for i in range(3)],
                          b"\x01\x02\x03")
        for _ in range(2)
    ]
    fri = FriProof.new(f, layers, [f.from_int(9), f.from_int(8)], 1)
    fri2, _ = _roundtrip(fri, FriProof.read_from)
    assert fri2 == fri
    assert fri2.parse_remainder(f) == [(9,), (8,)]
    vals, paths = fri2.layers[0].parse(f, 4)
    assert len(vals) == 12 and paths == b"\x01\x02\x03"


def test_full_proof_roundtrip():
    f = F128_1
    ctx = Context.new(F128, TraceInfo(4, 1024), _options(), 7)
    commitments = Commitments.new([b"\x01" * 32], b"\x02" * 32, [b"\x03" * 32, b"\x04" * 32])
    tq = Queries.new(b"\x05" * 8, [[f.from_int(1), f.from_int(2)]], f)
    cq = Queries.new(b"\x06" * 8, [[f.from_int(3)]], f)
    ood = OodFrame.new(f, [f.from_int(1)] * 4, [f.from_int(2)] * 4,
                       [f.from_int(3)] * 2, [f.from_int(4)] * 2)
    fri = FriProof.new(f, [FriProofLayer.new(f, [[f.from_int(7)] * 8], b"\x08")],
                       [f.from_int(5)], 1)
    proof = Proof(ctx, 30, commitments, [tq], cq, ood, fri, 1234567)
    data = proof.to_bytes()
    proof2 = Proof.from_bytes(data)
    assert proof2 == proof
