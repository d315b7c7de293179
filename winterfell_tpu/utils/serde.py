"""Canonical byte-oriented serialization — the proof wire-format primitives.

Implements the exact wire format of the reference serde layer
(utils/core/src/serde/{byte_reader,byte_writer}.rs): all fixed-width integers
are little-endian; ``usize`` values use the vint64 variable-length encoding
(utils/core/src/serde/byte_writer.rs:69-93, byte_reader.rs:116-148).

This module is host-side Python: it is not on the compute hot path, but it
must be byte-exact since the proof bytes feed the Fiat–Shamir transcript.
"""

from __future__ import annotations


class DeserializationError(ValueError):
    pass


def usize_encoded_len(value: int) -> int:
    """Number of bytes vint64 uses for `value` (byte_writer.rs:145-149)."""
    if value < 0 or value > 0xFFFF_FFFF_FFFF_FFFF:
        raise ValueError(f"usize out of range: {value}")
    # leading_zeros of the u64 representation
    zeros = 64 - value.bit_length()
    ln = max(zeros - 1, 0) // 7
    return 9 - min(ln, 8)


def encode_usize(value: int) -> bytes:
    """vint64 encoding (byte_writer.rs:69-93)."""
    length = usize_encoded_len(value)
    if length == 9:
        return b"\x00" + value.to_bytes(8, "little")
    encoded = (((value << 1) | 1) << (length - 1)) & ((1 << 64) - 1)
    return encoded.to_bytes(8, "little")[:length]


class ByteWriter:
    """Accumulates bytes, mirroring the reference ByteWriter trait."""

    __slots__ = ("_buf",)

    def __init__(self) -> None:
        self._buf = bytearray()

    def write_u8(self, v: int) -> None:
        self._buf.append(v & 0xFF)

    def write_bool(self, v: bool) -> None:
        self.write_u8(1 if v else 0)

    def write_u16(self, v: int) -> None:
        self._buf += (v & 0xFFFF).to_bytes(2, "little")

    def write_u32(self, v: int) -> None:
        self._buf += (v & 0xFFFF_FFFF).to_bytes(4, "little")

    def write_u64(self, v: int) -> None:
        self._buf += (v & (1 << 64) - 1).to_bytes(8, "little")

    def write_u128(self, v: int) -> None:
        self._buf += (v & (1 << 128) - 1).to_bytes(16, "little")

    def write_usize(self, v: int) -> None:
        self._buf += encode_usize(v)

    def write_bytes(self, b: bytes) -> None:
        self._buf += b

    def write(self, obj) -> None:
        obj.write_into(self)

    def write_many(self, objs) -> None:
        for o in objs:
            o.write_into(self)

    def to_bytes(self) -> bytes:
        return bytes(self._buf)

    def __len__(self) -> int:
        return len(self._buf)


class ByteReader:
    """Sequential reader over a byte string (SliceReader semantics)."""

    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._data):
            raise DeserializationError(
                f"unexpected EOF: need {n} bytes at offset {self._pos}, "
                f"have {len(self._data) - self._pos}"
            )
        out = self._data[self._pos : self._pos + n]
        self._pos += n
        return out

    def peek_u8(self) -> int:
        if self._pos >= len(self._data):
            raise DeserializationError("unexpected EOF (peek)")
        return self._data[self._pos]

    def read_u8(self) -> int:
        return self._take(1)[0]

    def read_bool(self) -> bool:
        v = self.read_u8()
        if v > 1:
            raise DeserializationError(f"invalid bool byte: {v}")
        return v == 1

    def read_u16(self) -> int:
        return int.from_bytes(self._take(2), "little")

    def read_u32(self) -> int:
        return int.from_bytes(self._take(4), "little")

    def read_u64(self) -> int:
        return int.from_bytes(self._take(8), "little")

    def read_u128(self) -> int:
        return int.from_bytes(self._take(16), "little")

    def read_usize(self) -> int:
        """vint64 decoding (byte_reader.rs:116-148): the count of trailing
        zero bits of the first byte, plus one, is the encoded length."""
        first = self.peek_u8()
        if first == 0:
            length = 9
        else:
            length = ((first & -first).bit_length() - 1) + 1  # trailing_zeros + 1
        if length == 9:
            self.read_u8()
            return int.from_bytes(self._take(8), "little")
        raw = self._take(length)
        encoded = int.from_bytes(raw + b"\x00" * (8 - length), "little")
        return encoded >> length

    def read_bytes(self, n: int) -> bytes:
        return self._take(n)

    def has_more_bytes(self) -> bool:
        return self._pos < len(self._data)

    @property
    def position(self) -> int:
        return self._pos
