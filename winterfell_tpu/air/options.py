"""Protocol options — ProofOptions / FieldExtension / BatchingMethod / PartitionOptions.

Byte-exact mirror of the reference option types (air/src/options.rs:95-341,
404-512). These values are serialized into every proof AND folded into the
Fiat–Shamir seed (via ``to_elements``), so the encodings here define proof
compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

from ..math.fields import BaseField, Field
from ..utils.serde import ByteReader, ByteWriter, DeserializationError


class FieldExtension(IntEnum):
    """Extension degree selector (air/src/options.rs:47, serde at :363-387)."""

    NONE = 1
    QUADRATIC = 2
    CUBIC = 3

    @property
    def degree(self) -> int:
        return int(self)


class BatchingMethod(IntEnum):
    """Randomness batching mode for constraint/DEEP composition
    (air/src/options.rs:479-505)."""

    LINEAR = 0
    ALGEBRAIC = 1
    HORNER = 2


@dataclass(frozen=True)
class PartitionOptions:
    """Column-partitioned row hashing config (air/src/options.rs:404-445)."""

    num_partitions: int = 1
    hash_rate: int = 1

    def __post_init__(self):
        assert 1 <= self.num_partitions <= 16, "num_partitions must be in 1..=16"
        assert 1 <= self.hash_rate <= 256, "hash_rate must be in 1..=256"

    def partition_size(self, num_columns: int, extension_degree: int = 1) -> int:
        """Partition width in columns of the (possibly extension) field
        (air/src/options.rs:434-445)."""
        if self.num_partitions == 1:
            return num_columns
        min_partition_size = self.hash_rate // extension_degree
        return max(-(-num_columns // self.num_partitions), min_partition_size)

    def partition_count(self, num_columns: int, extension_degree: int = 1) -> int:
        return -(-num_columns // self.partition_size(num_columns, extension_degree))


@dataclass(frozen=True)
class ProofOptions:
    """STARK protocol parameters (air/src/options.rs:95-201).

    Serde layout (air/src/options.rs:307-341): num_queries u8, blowup u8,
    grinding u8, field_extension u8, folding u8, remainder_max_degree u8,
    batching_constraints u8, batching_deep u8, num_partitions u8, hash_rate u8.
    """

    num_queries: int
    blowup_factor: int
    grinding_factor: int
    field_extension: FieldExtension
    fri_folding_factor: int
    fri_remainder_max_degree: int
    batching_constraints: BatchingMethod = BatchingMethod.LINEAR
    batching_deep: BatchingMethod = BatchingMethod.LINEAR
    partition_options: PartitionOptions = field(default_factory=PartitionOptions)

    MIN_BLOWUP_FACTOR = 2

    def __post_init__(self):
        assert 0 < self.num_queries <= 255, "num_queries must be in 1..=255"
        b = self.blowup_factor
        assert b & (b - 1) == 0 and 2 <= b <= 128, "blowup must be a power of 2 in 2..=128"
        assert 0 <= self.grinding_factor <= 32, "grinding factor must be <= 32"
        f = self.fri_folding_factor
        assert f in (2, 4, 8, 16), "FRI folding factor must be 2, 4, 8 or 16"
        r = self.fri_remainder_max_degree
        assert (r + 1) & r == 0 and r <= 255, "FRI remainder max degree must be 2^k-1, <= 255"

    def with_partitions(self, num_partitions: int, hash_rate: int) -> "ProofOptions":
        return ProofOptions(
            self.num_queries,
            self.blowup_factor,
            self.grinding_factor,
            self.field_extension,
            self.fri_folding_factor,
            self.fri_remainder_max_degree,
            self.batching_constraints,
            self.batching_deep,
            PartitionOptions(num_partitions, hash_rate),
        )

    def domain_offset(self, base: BaseField) -> int:
        """LDE domain offset — hard-coded to the field generator
        (air/src/options.rs:249-251)."""
        return base.generator

    def extension_field(self, base: BaseField) -> Field:
        return Field(base, self.field_extension.degree)

    # -- transcript encoding ------------------------------------------------

    def to_elements(self, field_: Field) -> list:
        """3 base-field elements (air/src/options.rs:294-304): packed
        (ext ‖ folding ‖ remainder ‖ blowup) u32, then grinding, num_queries."""
        buf = int(self.field_extension)
        buf = (buf << 8) | self.fri_folding_factor
        buf = (buf << 8) | self.fri_remainder_max_degree
        buf = (buf << 8) | self.blowup_factor
        return [
            field_.from_int(buf),
            field_.from_int(self.grinding_factor),
            field_.from_int(self.num_queries),
        ]

    # -- serde --------------------------------------------------------------

    def write_into(self, w: ByteWriter) -> None:
        w.write_u8(self.num_queries)
        w.write_u8(self.blowup_factor)
        w.write_u8(self.grinding_factor)
        w.write_u8(int(self.field_extension))
        w.write_u8(self.fri_folding_factor)
        w.write_u8(self.fri_remainder_max_degree)
        w.write_u8(int(self.batching_constraints))
        w.write_u8(int(self.batching_deep))
        w.write_u8(self.partition_options.num_partitions)
        w.write_u8(self.partition_options.hash_rate)

    @classmethod
    def read_from(cls, r: ByteReader) -> "ProofOptions":
        num_queries = r.read_u8()
        blowup = r.read_u8()
        grinding = r.read_u8()
        ext_raw = r.read_u8()
        try:
            ext = FieldExtension(ext_raw)
        except ValueError:
            raise DeserializationError(f"invalid FieldExtension: {ext_raw}")
        folding = r.read_u8()
        remainder = r.read_u8()
        try:
            bc = BatchingMethod(r.read_u8())
            bd = BatchingMethod(r.read_u8())
        except ValueError as e:
            raise DeserializationError(f"invalid BatchingMethod: {e}")
        num_partitions = r.read_u8()
        hash_rate = r.read_u8()
        return cls(
            num_queries,
            blowup,
            grinding,
            ext,
            folding,
            remainder,
            bc,
            bd,
            PartitionOptions(num_partitions, hash_rate),
        )
