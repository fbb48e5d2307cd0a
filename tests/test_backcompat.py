"""Bitstream back-compat: headers of versions 1..7 parse and verify; v6
streams (no block-header checksum byte, mix32_v6 header checksum) decode.

The v6/v3 fixtures are hand-assembled with the documented wire layout
(CompressedInputStream.java:359-515, readBlockHeader :1025-1095).
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from kanzi_tpu.core.bits import BitWriter
from kanzi_tpu.core.errors import Error
from kanzi_tpu.io.stream import (BITSTREAM_TYPE, CompressedInputStream,
                                 _HASH, _M32, _mix32_v6)


def _v6_header(bw: BitWriter, entropy=0, transform=0, block_size=4 << 20,
               chk=0):
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(6, 4)
    bw.write_bits(chk, 2)
    bw.write_bits(entropy, 5)
    bw.write_bits(transform, 48)
    bw.write_bits(block_size >> 4, 28)
    bw.write_bits(0, 2)          # szMask: no original size
    bw.write_bits(0, 15)         # padding
    ck = (_HASH * ((0x01030507 * 6) & _M32)) & _M32
    for v in (chk, entropy, (transform >> 32) & _M32, transform & _M32,
              block_size):
        ck = _mix32_v6(ck, v)
    bw.write_bits(((ck >> 23) ^ (ck >> 3)) & 0xFFFFFF, 24)


def _block(bw: BitWriter, data: bytes):
    # v6 copy block: mode byte (0x80), 1 length byte, payload, NO checksum
    inner = BitWriter()
    inner.write_bits(0x80, 8)
    inner.write_bits(len(data), 8)
    inner.write_bytes(data)
    nbits = inner.written
    lw = max(nbits.bit_length(), 3)
    bw.write_bits(lw - 3, 5)
    bw.write_bits(nbits, lw)
    pk, nb = inner.getvalue_packed()
    bw.write_bytes(pk.tobytes(), nb)


def _eos(bw: BitWriter):
    bw.write_bits(0, 5)
    bw.write_bits(0, 3)


def test_v6_stream_decodes():
    payload = bytes(range(64)) * 2
    bw = BitWriter()
    _v6_header(bw)
    _block(bw, payload)
    _eos(bw)
    cis = CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    out = cis.read(len(payload) + 16)
    assert bytes(out) == payload
    assert cis.bs_version == 6


def test_v6_header_checksum_rejected():
    bw = BitWriter()
    _v6_header(bw)
    raw = bytearray(bw.getvalue())
    raw[6] ^= 0x40  # flip a transform bit -> checksum mismatch
    with pytest.raises(Exception) as ei:
        CompressedInputStream(io.BytesIO(bytes(raw)), {"jobs": 1})
    assert getattr(ei.value, "code", None) == Error.ERR_CRC_CHECK


def test_v3_header_parses_then_reports_unsupported():
    bw = BitWriter()
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(3, 4)
    bw.write_bit(0)              # no checksum
    entropy, transform, block_size, nb_blocks = 1, 0, 1 << 20, 4
    bw.write_bits(entropy, 5)
    bw.write_bits(transform, 48)
    bw.write_bits(block_size >> 4, 28)
    bw.write_bits(nb_blocks, 6)
    ck = (_HASH * 3) & _M32
    for v in (entropy, 0, transform & _M32, block_size, nb_blocks):
        ck ^= (_HASH * v) & _M32
    bw.write_bits(((ck >> 23) ^ (ck >> 3)) & 0x0F, 4)
    with pytest.raises(Exception) as ei:
        CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    assert getattr(ei.value, "code", None) == Error.ERR_STREAM_VERSION
    assert "pre-v6" in str(ei.value)


def test_future_version_rejected():
    bw = BitWriter()
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(8, 4)
    bw.write_bits(0, 64)
    with pytest.raises(Exception) as ei:
        CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    assert getattr(ei.value, "code", None) == Error.ERR_STREAM_VERSION


def test_memory_endian_helpers():
    from kanzi_tpu.core.memory import BigEndian, LittleEndian
    buf = bytearray(16)
    BigEndian.write_int32(buf, 0, -123456789)
    assert BigEndian.read_int32(buf, 0) == -123456789
    LittleEndian.write_long64(buf, 4, 0x1122334455667788)
    assert LittleEndian.read_long64(buf, 4) == 0x1122334455667788
    BigEndian.write_int16(buf, 12, -2)
    assert BigEndian.read_int16(buf, 12) == -2
    assert BigEndian.read_uint16(buf, 12) == 0xFFFE
