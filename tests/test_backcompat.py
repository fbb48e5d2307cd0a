"""Bitstream back-compat: headers of versions 1..7 parse and verify; v6
streams (no block-header checksum byte, mix32_v6 header checksum) decode.

The v6/v3 fixtures are hand-assembled with the documented wire layout
(CompressedInputStream.java:359-515, readBlockHeader :1025-1095).
"""

from __future__ import annotations

import io
import os

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


def _v3_header(bw: BitWriter, entropy=0, transform=0, block_size=1 << 20,
               nb_blocks=1, version=3):
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(version, 4)
    bw.write_bit(0)              # no checksum
    bw.write_bits(entropy, 5)
    bw.write_bits(transform, 48)
    bw.write_bits(block_size >> 4, 28)
    bw.write_bits(nb_blocks, 6)
    ck = (_HASH * version) & _M32
    for v in (entropy, 0, transform & _M32, block_size, nb_blocks):
        ck ^= (_HASH * v) & _M32
    bw.write_bits(((ck >> 23) ^ (ck >> 3)) & 0x0F, 4)


def _v1_header(bw: BitWriter, entropy=0, transform=0, block_size=1 << 20,
               version=1):
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(version, 4)
    bw.write_bit(0)              # no checksum
    bw.write_bits(entropy, 5)
    bw.write_bits(transform, 48)
    bw.write_bits(block_size >> 4, 28)
    bw.write_bits(1, 6)          # nb blocks
    bw.write_bits(0, 4)          # reserved


def _legacy_block(bw: BitWriter, body: BitWriter, pre_len: int,
                  mode: int = 0x0F, data_size: int | None = None):
    """Pre-v7 non-copy block: mode + postTransformLength + payload, all
    inside the framed bits (no header-checksum byte)."""
    if data_size is None:
        data_size = 1 if pre_len < 256 else (pre_len.bit_length() + 7) // 8
    inner = BitWriter()
    inner.write_bits(mode | ((data_size - 1) << 5), 8)
    inner.write_bits(pre_len, 8 * data_size)
    inner.extend(body)
    nbits = inner.written
    lw = max(nbits.bit_length(), 3)
    bw.write_bits(lw - 3, 5)
    bw.write_bits(nbits, lw)
    pk, nb = inner.getvalue_packed()
    bw.write_bytes(pk.tobytes(), nb)


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


# ---------------------------------------------------------------------------
# legacy block-body decode (fixtures authored with the documented wire
# layouts of old bitstream versions; cites in the decoder implementations)
# ---------------------------------------------------------------------------

def _huffman_v5_body(data: np.ndarray) -> BitWriter:
    """Single-stream Huffman chunk (HuffmanDecoder.java:231-345)."""
    from kanzi_tpu.core.globals import histogram_order0
    from kanzi_tpu.entropy.huffman import HuffmanEncoder

    bw = BitWriter()
    enc = HuffmanEncoder(bw)
    freqs = histogram_order0(data)
    n_sym = enc._update_frequencies(freqs)  # alphabet + ExpGolomb deltas
    assert n_sym > 1
    codes, sizes = enc.codes, enc.sizes
    bw.write_bits(0, 2)  # number of streams (single)
    total_bits = int(sizes[data].sum())
    from kanzi_tpu.entropy import utils as eu
    eu.write_varint(bw, total_bits)
    bw.write_bits_vec(codes[data].astype(np.uint64), sizes[data])
    return bw


def test_v5_stream_huffman_decodes():
    rng = np.random.default_rng(7)
    payload = rng.integers(97, 105, 4000).astype(np.uint8)
    bw = BitWriter()
    # v5 header: szMask + 16-bit checksum, mix32_v6, seed = version
    entropy, transform, block_size = 1, 0, 1 << 20
    bw.write_bits(BITSTREAM_TYPE, 32)
    bw.write_bits(5, 4)
    bw.write_bit(0)
    bw.write_bits(entropy, 5)
    bw.write_bits(transform, 48)
    bw.write_bits(block_size >> 4, 28)
    bw.write_bits(0, 2)  # szMask = 0
    ck = (_HASH * 5) & _M32
    for v in (entropy, 0, transform & _M32, block_size):
        ck = _mix32_v6(ck, v)
    bw.write_bits(((ck >> 23) ^ (ck >> 3)) & 0xFFFF, 16)
    _legacy_block(bw, _huffman_v5_body(payload), payload.size)
    _eos(bw)
    cis = CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    out = cis.read(payload.size + 16)
    assert bytes(out) == payload.tobytes()
    assert cis.bs_version == 5


def _fpaq_v3_body(data: np.ndarray) -> BitWriter:
    from kanzi_tpu.entropy.fpaq import FPAQEncoder
    bw = BitWriter()
    enc = FPAQEncoder(bw, legacy_v3=True)
    enc.encode(data)
    enc.dispose()
    return bw


def test_v3_stream_fpaq_decodes():
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 7, 3000).astype(np.uint8)
    bw = BitWriter()
    _v3_header(bw, entropy=2, transform=0, block_size=1 << 20)
    _legacy_block(bw, _fpaq_v3_body(payload), payload.size)
    _eos(bw)
    cis = CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    out = cis.read(payload.size + 16)
    assert bytes(out) == payload.tobytes()
    assert cis.bs_version == 3


def _ans_v1_encode_chunk(bw: BitWriter, seg: np.ndarray, order: int) -> None:
    """Mirror image of ANSRangeDecoder.decodeChunkV1 (2 states order 0 /
    1 state order 1, 16-bit renormalization)."""
    from kanzi_tpu.entropy import utils as eu
    from kanzi_tpu.entropy.ans import ANS_TOP, _write_freqs_header
    lr = 12 if order == 0 else 11
    scale = 1 << lr
    bw.write_bits(lr - 8, 3)
    seg64 = seg.astype(np.int64)
    if order == 0:
        hist = np.bincount(seg, minlength=256).astype(np.int64)
        alphabet = eu.normalize_frequencies(hist, seg.size, scale)
        _write_freqs_header(bw, alphabet, hist, lr)
        assert len(alphabet) > 1
        ftab = hist[None, :]
    else:
        prev = np.zeros(seg.size, dtype=np.int64)
        prev[1:] = seg64[:-1]
        hist2 = np.bincount(prev * 256 + seg64, minlength=65536).reshape(256, 256)
        ftab = np.zeros((256, 256), dtype=np.int64)
        for k in range(256):
            fk = hist2[k].copy()
            alpha = eu.normalize_frequencies(fk, int(hist2[k].sum()), scale)
            _write_freqs_header(bw, alpha, fk, lr)
            ftab[k] = fk
    ctab = np.concatenate([np.zeros((ftab.shape[0], 1), dtype=np.int64),
                           np.cumsum(ftab, axis=1)[:, :-1]], axis=1)
    fcap = np.minimum(ftab, scale - 1)
    words: list[int] = []  # emission order; reversed = consumption order
    n = seg.size
    if order == 0:
        end2 = (n & -2) - 1
        # pair starts in decode order: 0, 2, ... < end2
        pairs = list(range(0, end2, 2))
        st0 = st1 = ANS_TOP
        x_shift = (ANS_TOP >> lr) << 16

        def enc(st, sym):
            f, c = int(fcap[0, sym]), int(ctab[0, sym])
            while st >= x_shift * f:
                words.append(st & 0xFFFF)
                st >>= 16
            return ((st // f) << lr) + (st % f) + c

        for i in reversed(pairs):
            st0 = enc(st0, int(seg64[i + 1]))
            st1 = enc(st1, int(seg64[i]))
        tail = seg[n - 1:].tobytes() if n & 1 else b""
    else:
        st0 = ANS_TOP
        x_shift = (ANS_TOP >> lr) << 16
        for i in range(n - 1, -1, -1):
            ctxk = int(seg64[i - 1]) if i > 0 else 0
            sym = int(seg64[i])
            f, c = int(fcap[ctxk, sym]), int(ctab[ctxk, sym])
            while st0 >= x_shift * f:
                words.append(st0 & 0xFFFF)
                st0 >>= 16
            st0 = ((st0 // f) << lr) + (st0 % f) + c
        tail = b""
    payload = b"".join(w.to_bytes(2, "big") for w in reversed(words)) + tail
    eu.write_varint(bw, len(payload))
    bw.write_bits(st0, 32)
    if order == 0:
        bw.write_bits(st1, 32)
    bw.write_bytes(payload)


@pytest.mark.parametrize("order", [0, 1])
def test_ans_v1_chunk_roundtrip(order):
    from kanzi_tpu.core.bits import BitReader
    from kanzi_tpu.entropy.ans import ANSRangeDecoder
    rng = np.random.default_rng(13 + order)
    data = rng.integers(0, 24, 5000).astype(np.uint8)
    bw = BitWriter()
    _ans_v1_encode_chunk(bw, data, order)
    dec = ANSRangeDecoder(BitReader(bw.getvalue()), order, bs_version=1)
    out = dec.decode(data.size)
    assert bytes(out) == data.tobytes()


def test_v1_stream_ans0_decodes():
    rng = np.random.default_rng(17)
    payload = rng.integers(32, 64, 2048).astype(np.uint8)
    bw = BitWriter()
    _v1_header(bw, entropy=5, transform=0, block_size=1 << 20)
    body = BitWriter()
    _ans_v1_encode_chunk(body, payload, 0)
    _legacy_block(bw, body, payload.size)
    _eos(bw)
    cis = CompressedInputStream(io.BytesIO(bw.getvalue()), {"jobs": 1})
    out = cis.read(payload.size + 16)
    assert bytes(out) == payload.tobytes()
    assert cis.bs_version == 1


def test_cm_v3_predictor_roundtrip():
    from kanzi_tpu.core.bits import BitReader
    from kanzi_tpu.entropy.binary import (BinaryEntropyDecoder,
                                          BinaryEntropyEncoder)
    from kanzi_tpu.models.cm import CMPredictor
    rng = np.random.default_rng(19)
    data = rng.integers(0, 5, 2000).astype(np.uint8)
    ctx3 = {"bsVersion": 3}
    bw = BitWriter()
    enc = BinaryEntropyEncoder(bw, CMPredictor(ctx3))
    enc.encode(data)
    enc.dispose()
    dec = BinaryEntropyDecoder(BitReader(bw.getvalue()), CMPredictor(ctx3))
    out = dec.decode(data.size)
    assert bytes(out) == data.tobytes()
    # the legacy predictor must differ from v7 on the same input
    p3, p7 = CMPredictor(ctx3), CMPredictor({"bsVersion": 7})
    for b in (1, 0, 1, 1, 0, 1):
        p3.update(b)
        p7.update(b)
    assert p3.get() != p7.get()


def test_lzx_v5_inverse():
    from kanzi_tpu.transforms.lz import _lzx_inverse_v5_py
    # literal section: "abcd", ext-length byte 9, then a final 16-byte run
    # (the last literal run must end exactly at the section end, 13 bytes
    # past srcEnd - LZCodec.java:800, :898)
    tail = bytes(range(65, 81))
    lits = b"abcd" + bytes([9]) + tail
    tk_len = 13 + len(lits)
    src = bytearray()
    src += tk_len.to_bytes(4, "little")
    src += (2).to_bytes(4, "little")   # token section length
    src += (1).to_bytes(4, "little")   # distance section length
    src.append(0)                      # mode: 1-byte distances, minMatch 4
    src += lits
    src += bytes([(4 << 5) | 6, 0xE0])  # lit4+match(len 10), ext lit run 7+9
    src.append(4)                      # distance
    out = _lzx_inverse_v5_py(np.frombuffer(bytes(src), dtype=np.uint8), None)
    assert bytes(out) == b"abcd" + b"abcdabcdab" + tail


def test_bwt_v5_block_framing():
    from kanzi_tpu.transforms.bwt import BWT, BWTBlockCodec, get_bwt_chunks
    rng = np.random.default_rng(23)
    data = rng.integers(97, 103, 1200).astype(np.uint8)
    bwt = BWT()
    transformed = bwt.forward(data)
    chunks = get_bwt_chunks(data.size)
    # legacy framing: per-chunk mode byte + primary index (low 6 bits in mode)
    hdr = bytearray()
    for i in range(chunks):
        pi = bwt.get_primary_index(i)
        nbytes = 1
        while pi >= (1 << (6 + 8 * (nbytes - 1))):
            nbytes += 1
        mode = ((nbytes - 1) << 6) | (pi >> (8 * (nbytes - 1)))
        hdr.append(mode)
        for k in range(nbytes - 2, -1, -1):
            hdr.append((pi >> (8 * k)) & 0xFF)
    blob = np.frombuffer(bytes(hdr) + transformed.tobytes(), dtype=np.uint8)
    assert get_bwt_chunks(blob.size) == chunks  # legacy derives from full size
    codec = BWTBlockCodec({"bsVersion": 5})
    out = codec.inverse(blob)
    assert bytes(out) == data.tobytes()


def test_exe_v2_inverse():
    from kanzi_tpu.transforms.exe import _inverse_v2
    # E8 followed by escape 0xF5 -> literal; E8 followed by encoded address
    src = bytearray(b"\x90" * 4)
    src += b"\xe8\xf5"          # escaped: stays E8, F5 dropped
    src += b"\x90" * 3
    src += b"\xe8\x01\xf0\xf0\xf1"  # sgn=0, addr = 0x000001
    src += b"\x90" * 10
    out = _inverse_v2(np.frombuffer(bytes(src), dtype=np.uint8))
    b = bytes(out)
    assert b[4] == 0xE8 and b[5] == 0x90       # escape consumed
    i = b.index(b"\xe8", 5)
    # low 3 bytes hold (absolute addr 1 - output position); 4th byte = sgn
    addr24 = int.from_bytes(b[i + 1:i + 4], "little")
    assert addr24 == (1 - (i + 1)) & 0xFFFFFF
    assert b[i + 4] == 0


def test_utf_v0_unpack():
    from kanzi_tpu.transforms.utf import UTFCodec
    text = ("héllo wörld ünïcode ß " * 60).encode("utf-8") + b"." * 16
    src = np.frombuffer(text, dtype=np.uint8)
    enc = UTFCodec({})  # writes V1 packing
    fwd = enc.forward(src)
    n = (int(fwd[2]) << 8) | int(fwd[3])
    legacy = fwd.copy()
    for i in range(n):
        off = 4 + 3 * i
        packed = (int(fwd[off]) << 16) | (int(fwd[off + 1]) << 8) | int(fwd[off + 2])
        cls = packed >> 19
        if cls == 0:
            v0 = packed
        elif cls == 1:
            v0 = (1 << 21) | (packed & 0x7FFFF)
        elif cls == 2:
            v0 = (2 << 21) | (packed & 0x7FFFF)
        else:
            v0 = (3 << 21) | (packed & 0x1FFFFF)
        legacy[off] = (v0 >> 16) & 0xFF
        legacy[off + 1] = (v0 >> 8) & 0xFF
        legacy[off + 2] = v0 & 0xFF
    dec = UTFCodec({"bsVersion": 3})
    out = dec.inverse(legacy, src.size)
    assert bytes(out) == text


def test_text2_legacy_word_index():
    import re
    pytest.importorskip("ctypes")
    from kanzi_tpu.transforms._text_dict import DICT_EN_1024
    from kanzi_tpu.utils import native_transforms as nt
    if nt._lib() is None:
        pytest.skip("native library unavailable")
    # dict entries are stored lowercased (caps in the blob mark boundaries);
    # the flip bit upper-cases the first char on emit
    words = [w.lower() for w in re.findall(rb"[A-Z][a-z]*", DICT_EN_1024)]
    # legacy TextCodec2: 0x80 | flip 0x20 | ext 0x40 | idx (5 bits [+7[+7]])
    payload = bytearray(b"\x00hello world ")
    payload.append(0x80 | 0x20 | 0)      # "the" flipped -> "The"
    payload.append(0x80 | 0x40)          # extended index ...
    payload.append(33)                   # ... word 33
    payload += b"!"
    out = nt.text_inverse_native(np.frombuffer(bytes(payload), dtype=np.uint8),
                                 2, 1 << 20, False, None, legacy=True)
    expect = b"hello world The " + words[33] + b"!"
    assert bytes(out) == expect


def test_rolz_v3_roundtrip():
    from kanzi_tpu.transforms.rolz import ROLZCodec
    rng = np.random.default_rng(29)
    base = b"the quick brown fox jumps over the lazy dog. "
    data = np.frombuffer((base * 200)[:8000], dtype=np.uint8)
    enc = ROLZCodec()
    blob = enc.forward(data)
    dec = ROLZCodec({"bsVersion": 3})
    out = dec.inverse(blob, data.size)
    assert bytes(out)[:data.size] == data.tobytes()


# ---------------------------------------------------------------------------
# frozen legacy-stream anchors: the binary fixtures in tests/golden/ were
# snapshotted from the builders above; both the builders (wire writing) and
# the version-dispatch decoder are pinned against them, so a shared
# misreading of the legacy layouts can no longer drift silently
# ---------------------------------------------------------------------------

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name,expected_version,expected_payload",
                         [("v6", 6, b"hello legacy world" * 10)])
def test_frozen_legacy_v6_decodes(name, expected_version, expected_payload):
    blob = open(os.path.join(_GOLDEN, f"legacy_{name}.knz"), "rb").read()
    cis = CompressedInputStream(io.BytesIO(blob), {"jobs": 1})
    out = cis.read(len(expected_payload) + 16)
    assert bytes(out) == expected_payload
    assert cis.bs_version == expected_version


def test_frozen_legacy_v5_decodes():
    blob = open(os.path.join(_GOLDEN, "legacy_v5.knz"), "rb").read()
    rng = np.random.default_rng(7)
    payload = rng.integers(97, 105, 4000).astype(np.uint8)
    cis = CompressedInputStream(io.BytesIO(blob), {"jobs": 1})
    assert bytes(cis.read(payload.size + 16)) == payload.tobytes()
    assert cis.bs_version == 5


def test_frozen_legacy_v3_decodes():
    blob = open(os.path.join(_GOLDEN, "legacy_v3.knz"), "rb").read()
    rng = np.random.default_rng(11)
    payload = rng.integers(0, 7, 3000).astype(np.uint8)
    cis = CompressedInputStream(io.BytesIO(blob), {"jobs": 1})
    assert bytes(cis.read(payload.size + 16)) == payload.tobytes()
    assert cis.bs_version == 3


def test_frozen_builders_unchanged():
    """The in-test wire builders still produce exactly the frozen bytes."""
    bw = BitWriter()
    _v6_header(bw)
    _block(bw, b"hello legacy world" * 10)
    _eos(bw)
    frozen = open(os.path.join(_GOLDEN, "legacy_v6.knz"), "rb").read()
    assert bw.getvalue() == frozen
