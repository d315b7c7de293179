"""Proof object and its typed parts — the STARK proof wire format.

Byte-exact mirror of air/src/proof/{mod,context,commitments,queries,ood_frame}.rs
and fri/src/proof.rs. Serialization order of the full proof is fixed at
air/src/proof/mod.rs:189-199:

    context ‖ num_unique_queries u8 ‖ commitments ‖ trace_queries* ‖
    constraint_queries ‖ ood_frame ‖ fri_proof ‖ pow_nonce u64
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import List

from ...math.fields import BASE_FIELDS, BaseField, Field
from ...utils.serde import ByteReader, ByteWriter, DeserializationError
from ..options import ProofOptions
from ..trace_info import TraceInfo


# ================================================================================
# Context
# ================================================================================


@dataclass(frozen=True)
class Context:
    """Proof metadata (air/src/proof/context.rs:17-160). ``to_elements``
    defines the public-coin seed layout (context.rs:105-137)."""

    trace_info: TraceInfo
    field_modulus_bytes: bytes
    options: ProofOptions
    num_constraints: int

    @classmethod
    def new(cls, base: BaseField, trace_info: TraceInfo, options: ProofOptions,
            num_constraints: int) -> "Context":
        assert trace_info.length <= 0xFFFF_FFFF, "trace length too big"
        assert trace_info.length * options.blowup_factor <= 0xFFFF_FFFF, "LDE domain too big"
        assert 0 < num_constraints <= 0xFFFF_FFFF
        return cls(
            trace_info,
            base.p.to_bytes(base.element_bytes, "little"),
            options,
            num_constraints,
        )

    @property
    def lde_domain_size(self) -> int:
        return self.trace_info.length * self.options.blowup_factor

    def base_field(self) -> BaseField:
        p = int.from_bytes(self.field_modulus_bytes, "little")
        for f in BASE_FIELDS.values():
            if f.p == p:
                return f
        raise DeserializationError("unknown base field modulus")

    def to_elements(self, field_: Field) -> list:
        """Context::to_elements (context.rs:105-137): trace info elements,
        modulus bytes as 2 padded elements, num_constraints, options elements."""
        result = self.trace_info.to_elements(field_)
        mb = self.field_modulus_bytes
        half = len(mb) // 2
        eb = field_.base.element_bytes
        for piece in (mb[:half], mb[half:]):
            assert len(piece) < eb
            padded = piece + b"\x00" * (eb - len(piece))
            result.append(field_.from_base(field_.base.from_le_bytes(padded)))
        result.append(field_.from_int(self.num_constraints))
        result.extend(self.options.to_elements(field_))
        return result

    def write_into(self, w: ByteWriter) -> None:
        self.trace_info.write_into(w)
        assert len(self.field_modulus_bytes) < 255
        w.write_u8(len(self.field_modulus_bytes))
        w.write_bytes(self.field_modulus_bytes)
        self.options.write_into(w)
        w.write_usize(self.num_constraints)

    @classmethod
    def read_from(cls, r: ByteReader) -> "Context":
        trace_info = TraceInfo.read_from(r)
        num_modulus_bytes = r.read_u8()
        modulus_bytes = r.read_bytes(num_modulus_bytes)
        options = ProofOptions.read_from(r)
        num_constraints = r.read_usize()
        if num_constraints == 0:
            raise DeserializationError("number of constraints must be > 0")
        return cls(trace_info, modulus_bytes, options, num_constraints)


# ================================================================================
# Commitments
# ================================================================================


@dataclass
class Commitments:
    """Opaque concatenated digest bytes (air/src/proof/commitments.rs:26-95)."""

    raw: bytes = b""

    @classmethod
    def new(cls, trace_roots: List[bytes], constraint_root: bytes,
            fri_roots: List[bytes]) -> "Commitments":
        return cls(b"".join(trace_roots) + constraint_root + b"".join(fri_roots))

    def parse(self, digest_size: int, num_trace_segments: int, num_fri_layers: int):
        """Split into (trace_roots, constraint_root, fri_roots[num_fri_layers+1])."""
        total = num_trace_segments + 1 + num_fri_layers + 1
        if len(self.raw) != total * digest_size:
            raise DeserializationError(
                f"expected {total * digest_size} commitment bytes, got {len(self.raw)}"
            )
        digests = [
            self.raw[i * digest_size : (i + 1) * digest_size] for i in range(total)
        ]
        trace_roots = digests[:num_trace_segments]
        constraint_root = digests[num_trace_segments]
        fri_roots = digests[num_trace_segments + 1 :]
        return trace_roots, constraint_root, fri_roots

    def write_into(self, w: ByteWriter) -> None:
        assert len(self.raw) < 0xFFFF
        w.write_u16(len(self.raw))
        w.write_bytes(self.raw)

    @classmethod
    def read_from(cls, r: ByteReader) -> "Commitments":
        n = r.read_u16()
        return cls(r.read_bytes(n))


# ================================================================================
# Queries
# ================================================================================


@dataclass
class Queries:
    """Query values + batch opening proof, each as length-prefixed byte blobs
    (air/src/proof/queries.rs:138-168). Serde: Vec<u8> values then Vec<u8>
    proof, each as vint64 length + bytes."""

    opening_proof: bytes
    values: bytes

    @classmethod
    def new(cls, opening_proof_bytes: bytes, query_values: List[list],
            field_: Field) -> "Queries":
        """`query_values`: one list of field elements per query, equal lengths."""
        assert query_values, "query values cannot be empty"
        n = len(query_values[0])
        assert n > 0
        buf = bytearray()
        for row in query_values:
            assert len(row) == n, "all queries must have the same number of values"
            buf += field_.elements_to_le_bytes(row)
        return cls(opening_proof_bytes, bytes(buf))

    def parse(self, field_: Field, domain_size: int, num_queries: int,
              values_per_query: int):
        """Returns (opening_proof_bytes, rows) where rows is a list of
        per-query element lists (queries.rs:86-135)."""
        if domain_size & (domain_size - 1) != 0:
            raise DeserializationError("query domain size must be a power of two")
        eb = field_.element_bytes
        expected = num_queries * values_per_query * eb
        if len(self.values) != expected:
            raise DeserializationError(
                f"expected {expected} query value bytes, got {len(self.values)}"
            )
        rows = []
        for q in range(num_queries):
            row_bytes = self.values[q * values_per_query * eb : (q + 1) * values_per_query * eb]
            rows.append([
                field_.from_le_bytes(row_bytes[i * eb : (i + 1) * eb])
                for i in range(values_per_query)
            ])
        return self.opening_proof, rows

    def write_into(self, w: ByteWriter) -> None:
        w.write_usize(len(self.values))
        w.write_bytes(self.values)
        w.write_usize(len(self.opening_proof))
        w.write_bytes(self.opening_proof)

    @classmethod
    def read_from(cls, r: ByteReader) -> "Queries":
        n = r.read_usize()
        values = r.read_bytes(n)
        m = r.read_usize()
        proof = r.read_bytes(m)
        return cls(proof, values)


# ================================================================================
# OodFrame
# ================================================================================


@dataclass
class OodFrame:
    """OOD evaluations (air/src/proof/ood_frame.rs:31-216). Both blobs start
    with a u8 frame count (=2) followed by row-major element bytes:
    trace_states = [cur_main‖cur_aux, next_main‖next_aux],
    quotient_states = [cur_quotients, next_quotients]."""

    trace_states: bytes = b""
    quotient_states: bytes = b""

    @classmethod
    def new(cls, field_: Field, trace_current: list, trace_next: list,
            quot_current: list, quot_next: list) -> "OodFrame":
        ts = bytes([2]) + field_.elements_to_le_bytes(trace_current + trace_next)
        qs = bytes([2]) + field_.elements_to_le_bytes(quot_current + quot_next)
        return cls(ts, qs)

    def parse(self, field_: Field, main_trace_width: int, aux_trace_width: int,
              num_quotients: int):
        """Returns (trace_current, trace_next, quot_current, quot_next)."""
        assert main_trace_width > 0 and num_quotients > 0
        w = main_trace_width + aux_trace_width
        eb = field_.element_bytes

        r = ByteReader(self.trace_states)
        if r.read_u8() != 2:
            raise DeserializationError("OOD frame size must be 2")
        raw = r.read_bytes(2 * w * eb)
        if r.has_more_bytes():
            raise DeserializationError("unconsumed OOD trace bytes")
        elems = [field_.from_le_bytes(raw[i * eb : (i + 1) * eb]) for i in range(2 * w)]
        trace_current, trace_next = elems[:w], elems[w:]

        r = ByteReader(self.quotient_states)
        if r.read_u8() != 2:
            raise DeserializationError("OOD quotient frame size must be 2")
        raw = r.read_bytes(2 * num_quotients * eb)
        if r.has_more_bytes():
            raise DeserializationError("unconsumed OOD quotient bytes")
        elems = [
            field_.from_le_bytes(raw[i * eb : (i + 1) * eb])
            for i in range(2 * num_quotients)
        ]
        return trace_current, trace_next, elems[:num_quotients], elems[num_quotients:]

    def write_into(self, w: ByteWriter) -> None:
        w.write_u16(len(self.trace_states))
        w.write_bytes(self.trace_states)
        w.write_u16(len(self.quotient_states))
        w.write_bytes(self.quotient_states)

    @classmethod
    def read_from(cls, r: ByteReader) -> "OodFrame":
        n = r.read_u16()
        ts = r.read_bytes(n)
        m = r.read_u16()
        qs = r.read_bytes(m)
        return cls(ts, qs)


def merge_ood_evaluations(trace_current: list, trace_next: list,
                          quot_current: list, quot_next: list) -> list:
    """Concatenation order for the single OOD transcript reseed
    (ood_frame.rs:335-351): all z-evals first, then all z·g-evals."""
    return trace_current + quot_current + trace_next + quot_next


# ================================================================================
# FriProof
# ================================================================================


@dataclass
class FriProofLayer:
    """One FRI layer: query values ‖ batch opening proof, each u32
    length-prefixed (fri/src/proof.rs:343-355)."""

    values: bytes
    paths: bytes

    @classmethod
    def new(cls, field_: Field, query_values: List[list],
            proof_bytes: bytes) -> "FriProofLayer":
        """`query_values`: per queried position, the N folded coset values."""
        assert query_values, "query values cannot be empty"
        buf = b"".join(field_.elements_to_le_bytes(row) for row in query_values)
        return cls(buf, proof_bytes)

    def parse(self, field_: Field, folding_factor: int):
        """Returns (flat query values, proof bytes) (fri/src/proof.rs:289-327)."""
        eb = field_.element_bytes
        num_query_bytes = eb * folding_factor
        if len(self.values) % num_query_bytes != 0 or not self.values:
            raise DeserializationError("invalid FRI layer value byte count")
        n = len(self.values) // eb
        values = [
            field_.from_le_bytes(self.values[i * eb : (i + 1) * eb]) for i in range(n)
        ]
        return values, self.paths

    def write_into(self, w: ByteWriter) -> None:
        w.write_u32(len(self.values))
        w.write_bytes(self.values)
        w.write_u32(len(self.paths))
        w.write_bytes(self.paths)

    @classmethod
    def read_from(cls, r: ByteReader) -> "FriProofLayer":
        n = r.read_u32()
        if n == 0:
            raise DeserializationError("a FRI proof layer must contain at least one value")
        values = r.read_bytes(n)
        m = r.read_u32()
        paths = r.read_bytes(m)
        return cls(values, paths)


@dataclass
class FriProof:
    """FRI low-degree proof (fri/src/proof.rs:33-235)."""

    layers: List[FriProofLayer] = dc_field(default_factory=list)
    remainder: bytes = b""  # serialized remainder polynomial coefficients
    num_partitions: int = 1  # stored as log2? NO: stored as u8 count

    @classmethod
    def new(cls, field_: Field, layers: List[FriProofLayer],
            remainder_coeffs: list, num_partitions: int) -> "FriProof":
        return cls(
            layers,
            field_.elements_to_le_bytes(remainder_coeffs),
            num_partitions,
        )

    def parse_remainder(self, field_: Field) -> list:
        eb = field_.element_bytes
        if len(self.remainder) % eb != 0:
            raise DeserializationError("invalid remainder byte count")
        n = len(self.remainder) // eb
        return [
            field_.from_le_bytes(self.remainder[i * eb : (i + 1) * eb])
            for i in range(n)
        ]

    @property
    def num_layers(self) -> int:
        return len(self.layers)

    def write_into(self, w: ByteWriter) -> None:
        w.write_u8(len(self.layers))
        for layer in self.layers:
            layer.write_into(w)
        assert len(self.remainder) < 0xFFFF
        w.write_u16(len(self.remainder))
        w.write_bytes(self.remainder)
        w.write_u8(self.num_partitions)

    @classmethod
    def read_from(cls, r: ByteReader) -> "FriProof":
        num_layers = r.read_u8()
        layers = [FriProofLayer.read_from(r) for _ in range(num_layers)]
        n = r.read_u16()
        remainder = r.read_bytes(n)
        num_partitions = r.read_u8()
        return cls(layers, remainder, num_partitions)


# ================================================================================
# Proof
# ================================================================================


@dataclass
class Proof:
    """Full STARK proof (air/src/proof/mod.rs:52-199)."""

    context: Context
    num_unique_queries: int
    commitments: Commitments
    trace_queries: List[Queries]
    constraint_queries: Queries
    ood_frame: OodFrame
    fri_proof: FriProof
    pow_nonce: int

    @property
    def options(self) -> ProofOptions:
        return self.context.options

    @property
    def trace_info(self) -> TraceInfo:
        return self.context.trace_info

    @property
    def lde_domain_size(self) -> int:
        return self.context.lde_domain_size

    def num_modulus_bits(self) -> int:
        """Bit length of the base field modulus (context.rs:81-93)."""
        return int.from_bytes(self.context.field_modulus_bytes, "little").bit_length()

    def conjectured_security(self, hasher):
        """(air/src/proof/mod.rs:96-103)."""
        from ..security import ConjecturedSecurity

        return ConjecturedSecurity.compute(
            self.options, self.num_modulus_bits(), hasher.collision_resistance)

    def proven_security(self, hasher):
        """(air/src/proof/mod.rs:105-127)."""
        from ..security import ProvenSecurity

        num_trace_polys = self.trace_info.width
        num_committed = num_trace_polys + self.options.blowup_factor
        return ProvenSecurity.compute(
            self.options, self.num_modulus_bits(), self.trace_info.length,
            hasher.collision_resistance, self.context.num_constraints,
            num_committed)

    def write_into(self, w: ByteWriter) -> None:
        self.context.write_into(w)
        w.write_u8(self.num_unique_queries)
        self.commitments.write_into(w)
        for q in self.trace_queries:
            q.write_into(w)
        self.constraint_queries.write_into(w)
        self.ood_frame.write_into(w)
        self.fri_proof.write_into(w)
        w.write_u64(self.pow_nonce)

    def to_bytes(self) -> bytes:
        w = ByteWriter()
        self.write_into(w)
        return w.to_bytes()

    @classmethod
    def read_from(cls, r: ByteReader) -> "Proof":
        context = Context.read_from(r)
        num_unique_queries = r.read_u8()
        commitments = Commitments.read_from(r)
        trace_queries = [
            Queries.read_from(r) for _ in range(context.trace_info.num_segments)
        ]
        constraint_queries = Queries.read_from(r)
        ood_frame = OodFrame.read_from(r)
        fri_proof = FriProof.read_from(r)
        pow_nonce = r.read_u64()
        return cls(
            context,
            num_unique_queries,
            commitments,
            trace_queries,
            constraint_queries,
            ood_frame,
            fri_proof,
            pow_nonce,
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "Proof":
        r = ByteReader(data)
        proof = cls.read_from(r)
        if r.has_more_bytes():
            raise DeserializationError("unconsumed proof bytes")
        return proof
