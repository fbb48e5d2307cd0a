"""Bitstream layer tests — mirrors the reference's aligned/misaligned
write-read equivalence checks (T/test/TestDefaultBitStream.java:52-520)."""

import numpy as np
import pytest

from kanzi_tpu.core.bits import BitReader, BitWriter, pack_msb


def test_scalar_roundtrip_aligned():
    bw = BitWriter()
    vals = [(0x5A, 8), (0xFFFF, 16), (1, 1), (0, 7), (0x123456789ABCDEF0, 64)]
    for v, c in vals:
        bw.write_bits(v, c)
    br = BitReader(bw.getvalue())
    for v, c in vals:
        assert br.read_bits(c) == v & ((1 << c) - 1)


def test_scalar_roundtrip_random(rng):
    bw = BitWriter()
    items = []
    for _ in range(5000):
        c = int(rng.integers(1, 65))
        v = int(rng.integers(0, 1 << 63)) & ((1 << c) - 1)
        items.append((v, c))
        bw.write_bits(v, c)
    data = bw.getvalue()
    assert len(data) == (bw.written + 7) // 8
    br = BitReader(data)
    for v, c in items:
        assert br.read_bits(c) == v


def test_msb_first_layout():
    bw = BitWriter()
    bw.write_bits(0b101, 3)
    bw.write_bits(0b11111, 5)
    assert bw.getvalue() == bytes([0b10111111])


def test_vector_write_matches_scalar(rng):
    cnts = rng.integers(1, 57, size=2000)
    vals = rng.integers(0, 1 << 56, size=2000, dtype=np.uint64) & ((np.uint64(1) << cnts.astype(np.uint64)) - np.uint64(1))
    bw1 = BitWriter()
    for v, c in zip(vals, cnts):
        bw1.write_bits(int(v), int(c))
    bw2 = BitWriter()
    bw2.write_bits_vec(vals, cnts)
    assert bw1.getvalue() == bw2.getvalue()


def test_vector_read_matches_scalar(rng):
    cnts = rng.integers(1, 57, size=2000)
    vals = rng.integers(0, 1 << 56, size=2000, dtype=np.uint64) & ((np.uint64(1) << cnts.astype(np.uint64)) - np.uint64(1))
    bw = BitWriter()
    bw.write_bits_vec(vals, cnts)
    br = BitReader(bw.getvalue())
    out = br.read_bits_vec(cnts)
    np.testing.assert_array_equal(out, vals)


def test_write_bytes_misaligned(rng):
    payload = rng.integers(0, 256, size=1000, dtype=np.uint8)
    bw = BitWriter()
    bw.write_bits(0b101, 3)
    bw.write_bytes(payload.tobytes())
    bw.write_bits(0x7, 3)
    br = BitReader(bw.getvalue())
    assert br.read_bits(3) == 0b101
    np.testing.assert_array_equal(br.read_bytes(1000), payload)
    assert br.read_bits(3) == 0x7


def test_partial_bits_of_bytes():
    bw = BitWriter()
    bw.write_bytes(bytes([0xAB, 0xCD]), nbits=12)
    br = BitReader(bw.getvalue())
    assert br.read_bits(12) == 0xABC


def test_reader_eof():
    br = BitReader(bytes([0xFF]))
    br.read_bits(8)
    with pytest.raises(EOFError):
        br.read_bits(1)


def test_read_bytes_aligned_vs_shifted(rng):
    payload = rng.integers(0, 256, size=64, dtype=np.uint8)
    for lead in range(9):
        bw = BitWriter()
        if lead:
            bw.write_bits(0, lead)
        bw.write_bytes(payload.tobytes())
        br = BitReader(bw.getvalue())
        if lead:
            br.read_bits(lead)
        np.testing.assert_array_equal(br.read_bytes(64), payload)


def test_pack_msb_empty():
    assert pack_msb(np.zeros(0, np.uint64), np.zeros(0, np.int64)).size == 0


def test_64bit_values():
    bw = BitWriter()
    bw.write_bits((1 << 64) - 1, 64)
    bw.write_bits(0, 64)
    br = BitReader(bw.getvalue())
    assert br.read_bits(64) == (1 << 64) - 1
    assert br.read_bits(64) == 0
