"""TraceInfo — execution trace shape metadata.

Byte-exact mirror of air/src/air/trace_info.rs:24-330: the serde layout and
the ``to_elements`` encoding (which feeds the Fiat–Shamir public-coin seed).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..math.fields import Field
from ..utils.serde import ByteReader, ByteWriter, DeserializationError

MIN_TRACE_LENGTH = 8
MAX_TRACE_WIDTH = 255
MAX_META_BYTES = 65535
MAX_RAND_SEGMENT_ELEMENTS = 255


@dataclass(frozen=True)
class TraceInfo:
    main_segment_width: int
    length: int
    aux_segment_width: int = 0
    num_aux_segment_rands: int = 0
    meta: bytes = field(default=b"")

    def __post_init__(self):
        assert self.main_segment_width > 0, "main trace width must be > 0"
        w = self.main_segment_width + self.aux_segment_width
        assert w <= MAX_TRACE_WIDTH, f"total trace width cannot exceed {MAX_TRACE_WIDTH}"
        n = self.length
        assert n >= MIN_TRACE_LENGTH and n & (n - 1) == 0, (
            "trace length must be a power of two >= 8"
        )
        assert len(self.meta) <= MAX_META_BYTES
        if self.aux_segment_width > 0:
            assert self.num_aux_segment_rands > 0, (
                "an aux trace segment requires at least one random element"
            )
        assert self.num_aux_segment_rands <= MAX_RAND_SEGMENT_ELEMENTS

    # -- accessors ----------------------------------------------------------

    @property
    def width(self) -> int:
        return self.main_segment_width + self.aux_segment_width

    @property
    def is_multi_segment(self) -> bool:
        return self.aux_segment_width > 0

    @property
    def num_segments(self) -> int:
        return 2 if self.is_multi_segment else 1

    @property
    def num_aux_segments(self) -> int:
        return 1 if self.aux_segment_width > 0 else 0

    # -- transcript encoding (trace_info.rs:210-238) ------------------------

    def to_elements(self, field_: Field) -> list:
        buf = self.main_segment_width
        buf = (buf << 8) | self.num_aux_segments
        if self.num_aux_segments == 1:
            buf = (buf << 8) | self.aux_segment_width
            buf = (buf << 8) | self.num_aux_segment_rands
        result = [field_.from_int(buf), field_.from_int(self.length)]
        if self.meta:
            # meta packed into chunks of (ELEMENT_BYTES - 1) bytes, zero-padded
            chunk = field_.base.element_bytes - 1
            for i in range(0, len(self.meta), chunk):
                piece = self.meta[i : i + chunk]
                padded = piece + b"\x00" * (field_.base.element_bytes - len(piece))
                result.append(field_.from_base(int.from_bytes(padded, "little")))
        return result

    # -- serde (trace_info.rs:241-330) --------------------------------------

    def write_into(self, w: ByteWriter) -> None:
        w.write_u8(self.main_segment_width)
        w.write_u8(self.aux_segment_width)
        w.write_u8(self.num_aux_segment_rands)
        w.write_u8(self.length.bit_length() - 1)  # trace length as power of two
        w.write_u16(len(self.meta))
        w.write_bytes(self.meta)

    @classmethod
    def read_from(cls, r: ByteReader) -> "TraceInfo":
        main_width = r.read_u8()
        if main_width == 0:
            raise DeserializationError("main trace segment width must be greater than zero")
        aux_width = r.read_u8()
        if main_width + aux_width >= MAX_TRACE_WIDTH:
            raise DeserializationError("full trace width too large")
        num_rands = r.read_u8()
        if aux_width != 0 and num_rands == 0:
            raise DeserializationError("aux segment must require at least one random element")
        log_len = r.read_u8()
        if log_len < 3:
            raise DeserializationError("trace length cannot be smaller than 2^3")
        meta_len = r.read_u16()
        meta = r.read_bytes(meta_len) if meta_len else b""
        return cls(main_width, 1 << log_len, aux_width, num_rands, meta)
