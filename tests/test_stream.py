"""Stream engine tests — mirrors T/test/TestCompressedStream.java:57-257."""

import io as pyio

import numpy as np
import pytest

from kanzi_tpu.core.errors import IOError_
from kanzi_tpu.io.stream import CompressedInputStream, CompressedOutputStream


def _roundtrip(data: bytes, ctx: dict, jobs_dec: int = 2) -> bytes:
    buf = pyio.BytesIO()
    cos = CompressedOutputStream(buf, ctx)
    cos.write(data)
    cos.close()
    blob = buf.getvalue()
    cis = CompressedInputStream(pyio.BytesIO(blob), {"jobs": jobs_dec})
    out = cis.read()
    assert out == data
    return blob


def test_roundtrip_fuzz(rng):
    """Random sizes x compressible + incompressible data."""
    for t in range(12):
        size = 1024 << (t % 7)
        comp = np.repeat(rng.integers(0, 256, size // 8 + 1).astype(np.uint8),
                         8)[:size].tobytes()
        incomp = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        for data in (comp, incomp):
            _roundtrip(data, {"transform": "LZ", "entropy": "HUFFMAN",
                              "blockSize": 65536 * (1 + t % 3), "jobs": 1 + t % 3})


def test_empty_input():
    blob = _roundtrip(b"", {"transform": "LZ", "entropy": "ANS0",
                            "blockSize": 1024, "jobs": 1})
    assert len(blob) > 0  # header + end block


def test_block_checksum_modes(rng):
    data = rng.integers(0, 256, 100000, dtype=np.uint8).tobytes()
    for chk in (0, 32, 64):
        _roundtrip(data, {"transform": "NONE", "entropy": "NONE",
                          "blockSize": 16384, "jobs": 2, "checksum": chk})


def test_corrupted_block_header_rejected(rng):
    data = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    buf = pyio.BytesIO()
    cos = CompressedOutputStream(buf, {"transform": "LZ", "entropy": "HUFFMAN",
                                       "blockSize": 16384, "jobs": 1})
    cos.write(data)
    cos.close()
    # the first block header lives right after the 20-byte stream header and
    # the ~3-byte framing; its 8-bit checksum must reject any corruption there
    blob = bytearray(buf.getvalue())
    blob[24] ^= 0xFF
    cis = CompressedInputStream(pyio.BytesIO(bytes(blob)), {"jobs": 1})
    with pytest.raises(Exception):
        cis.read()


def test_bad_magic_rejected():
    with pytest.raises(IOError_):
        CompressedInputStream(pyio.BytesIO(b"NOPE" + b"\x00" * 100), {})


def test_payload_checksum_catches_corruption(rng):
    data = rng.integers(0, 256, 50000, dtype=np.uint8).tobytes()
    buf = pyio.BytesIO()
    cos = CompressedOutputStream(buf, {"transform": "NONE", "entropy": "NONE",
                                       "blockSize": 16384, "jobs": 1, "checksum": 32})
    cos.write(data)
    cos.close()
    blob = bytearray(buf.getvalue())
    blob[200] ^= 0x01  # payload corruption (past header + block header)
    cis = CompressedInputStream(pyio.BytesIO(bytes(blob)), {"jobs": 1})
    with pytest.raises(Exception):
        cis.read()


def test_headerless_stream(rng):
    data = rng.integers(0, 256, 30000, dtype=np.uint8).tobytes()
    ctx = {"transform": "LZ", "entropy": "HUFFMAN", "blockSize": 16384,
           "jobs": 1, "headerless": True}
    buf = pyio.BytesIO()
    cos = CompressedOutputStream(buf, ctx)
    cos.write(data)
    cos.close()
    dctx = {"jobs": 1, "headerless": True, "transform": "LZ",
            "entropy": "HUFFMAN", "blockSize": 16384, "bsVersion": 7}
    cis = CompressedInputStream(pyio.BytesIO(buf.getvalue()), dctx)
    assert cis.read() == data


def test_level_presets_roundtrip(rng):
    from kanzi_tpu.app.block_compressor import LEVELS, BlockCompressor
    from kanzi_tpu.app.block_decompressor import BlockDecompressor
    words = [b"hello world ", b"the quick fox ", b"data compression "]
    data = b"".join([words[i] for i in rng.choice(3, 4000)])
    for level in [0, 1, 2, 3, 5, 6]:  # 4 & 7-9 placeholders/slow paths tested elsewhere
        t, e, b = LEVELS[level]
        blob = BlockCompressor(transform=t, entropy=e, block_size=max(b, 1024),
                               jobs=2).compress_bytes(data)
        out = BlockDecompressor(jobs=2).decompress_bytes(blob)
        assert out == data, f"level {level}"
