from winterfell_tpu.utils.serde import ByteReader, ByteWriter, encode_usize


def test_vint64_roundtrip():
    values = [
        0, 1, 2, 63, 64, 127, 128, 2**13, 2**14 - 1, 2**14, 2**20, 2**21 - 1,
        2**28 - 1, 2**28, 2**35 - 1, 2**35, 2**42, 2**49, 2**56 - 1, 2**56,
        2**63 - 1, 2**63, 2**64 - 1,
    ]
    for v in values:
        w = ByteWriter()
        w.write_usize(v)
        r = ByteReader(w.to_bytes())
        assert r.read_usize() == v
        assert not r.has_more_bytes()


def test_vint64_known_encodings():
    # vint64 spec: value << 1 | 1 for 1-byte values (0..=2^7-1)
    assert encode_usize(0) == b"\x01"
    assert encode_usize(1) == b"\x03"
    assert encode_usize(0x7F) == b"\xff"
    # 2-byte boundary
    assert encode_usize(0x80) == bytes([0x02, 0x02])
    # 9-byte special case
    assert encode_usize(2**63) == b"\x00" + (2**63).to_bytes(8, "little")


def test_fixed_width_le():
    w = ByteWriter()
    w.write_u8(0xAB)
    w.write_u16(0x1234)
    w.write_u32(0xDEADBEEF)
    w.write_u64(0x0102030405060708)
    w.write_u128(1 << 127)
    b = w.to_bytes()
    r = ByteReader(b)
    assert r.read_u8() == 0xAB
    assert r.read_u16() == 0x1234
    assert r.read_u32() == 0xDEADBEEF
    assert r.read_u64() == 0x0102030405060708
    assert r.read_u128() == 1 << 127
    assert not r.has_more_bytes()
