"""Transform round-trip tests — mirrors the reference's parameterized sweeps
(T/test/TestTransforms.java:172-420)."""

import numpy as np
import pytest

from kanzi_tpu.core.types import TransformSkip


def _rt(t, data, **kw):
    """Round-trip helper; returns encoded size or None if stage skipped."""
    try:
        enc = t.forward(data)
    except TransformSkip:
        return None
    out = t.inverse(enc, count=data.size)
    np.testing.assert_array_equal(out, data)
    return enc.size


def _text(rng, n):
    return rng.choice(np.frombuffer(
        b"the quick brown fox jumps over the lazy dog \n", dtype=np.uint8), n)


def _runs(rng, n):
    vals = rng.integers(0, 256, max(n // 8, 1)).astype(np.uint8)
    reps = rng.integers(1, 20, vals.size)
    return np.repeat(vals, reps)[:n]


# --- ZRLT / RLT -------------------------------------------------------------

def test_zrlt_roundtrip(rng):
    from kanzi_tpu.transforms.zrlt import ZRLT
    for _ in range(30):
        n = int(rng.integers(1, 8000))
        p = rng.random()
        data = np.where(rng.random(n) < p, 0,
                        rng.integers(0, 256, n)).astype(np.uint8)
        _rt(ZRLT(), data)


def test_zrlt_edge_values(rng):
    from kanzi_tpu.transforms.zrlt import ZRLT
    data = np.array([0] * 40 + [0xFE, 0xFF, 0, 1, 2, 0xFE] + [0] * 30, dtype=np.uint8)
    data = np.tile(data, 100)
    assert _rt(ZRLT(), data) is not None
    assert _rt(ZRLT(), np.zeros(100000, dtype=np.uint8)) is not None


def test_rlt_roundtrip(rng):
    from kanzi_tpu.transforms.rlt import RLT
    for _ in range(30):
        n = int(rng.integers(16, 8000))
        _rt(RLT({}), _runs(rng, n))


def test_rlt_escape_data(rng):
    from kanzi_tpu.transforms.rlt import RLT
    data = np.full(2000, 0xFB, dtype=np.uint8)
    data[::17] = 1
    data[1::17] = 2  # avoid being all-run
    _rt(RLT(), data)


# --- SBRT / SRT -------------------------------------------------------------

@pytest.mark.parametrize("mode", [1, 2, 3])
def test_sbrt_roundtrip(rng, mode):
    from kanzi_tpu.transforms.sbrt import SBRT
    for n in [0, 1, 100, 10000]:
        _rt(SBRT(mode), _text(rng, n))


def test_sbrt_native_matches_python(rng, monkeypatch):
    from kanzi_tpu.transforms.sbrt import SBRT
    import kanzi_tpu.utils.native_transforms as nt
    data = _text(rng, 3000)
    a = SBRT(2).forward(data)
    monkeypatch.setattr(nt, "_FORCE_PY", True)
    b = SBRT(2).forward(data)
    np.testing.assert_array_equal(a, b)


def test_srt_roundtrip(rng):
    from kanzi_tpu.transforms.srt import SRT
    for n in [1, 2, 100, 5000, 30000]:
        _rt(SRT(), _text(rng, n))
        _rt(SRT(), _runs(rng, n))


# --- FSD --------------------------------------------------------------------

def test_fsd_delta(rng):
    from kanzi_tpu.transforms.fsd import FSDCodec
    sig = (128 + 60 * np.sin(np.arange(50000) / 25)).astype(np.uint8)
    assert _rt(FSDCodec({}), sig) is not None


def test_fsd_skips_text(rng):
    from kanzi_tpu.transforms.fsd import FSDCodec
    assert _rt(FSDCodec({}), _text(rng, 50000)) is None


# --- LZ / LZX / LZP ----------------------------------------------------------

@pytest.mark.parametrize("extra", [False, True])
def test_lzx_roundtrip(rng, extra):
    from kanzi_tpu.transforms.lz import LZXCodec
    words = [b"the quick brown fox ", b"jumps over ", b"lazy dog! "]
    for _ in range(10):
        data = np.frombuffer(
            b"".join([words[i] for i in rng.choice(3, 2000)]), dtype=np.uint8)
        n = int(rng.integers(30, data.size))
        assert _rt(LZXCodec(extra=extra), data[:n].copy()) is not None


def test_lzx_skips_random(rng):
    from kanzi_tpu.transforms.lz import LZXCodec
    assert _rt(LZXCodec(), rng.integers(0, 256, 50000, dtype=np.uint8)) is None


def test_lzx_python_decoder_agrees(rng):
    from kanzi_tpu.transforms.lz import LZXCodec, _lzx_inverse_py
    words = [b"abcdefgh", b"12345678", b"abcd1234"]
    data = np.frombuffer(b"".join([words[i] for i in rng.choice(3, 5000)]), dtype=np.uint8)
    enc = LZXCodec().forward(data)
    np.testing.assert_array_equal(_lzx_inverse_py(enc, data.size), data)


def test_lzp_roundtrip(rng):
    from kanzi_tpu.transforms.lz import LZPCodec, _lzp_inverse_py
    passage = bytes(rng.integers(32, 127, 400, dtype=np.uint8))
    data = np.frombuffer(passage * 100 + b"xyz", dtype=np.uint8)
    enc = LZPCodec().forward(data)
    out = LZPCodec().inverse(enc, count=data.size)
    np.testing.assert_array_equal(out, data)
    np.testing.assert_array_equal(_lzp_inverse_py(enc), data)


# --- BWT ----------------------------------------------------------------

def test_suffix_array_matches_bruteforce(rng):
    from kanzi_tpu.transforms.bwt import suffix_array, _suffix_array_doubling
    for _ in range(15):
        n = int(rng.integers(1, 200))
        data = rng.integers(0, 5, n, dtype=np.uint8)
        b = data.tobytes()
        expect = sorted(range(n), key=lambda i: b[i:])
        assert suffix_array(data).tolist() == expect
        assert _suffix_array_doubling(data).tolist() == expect


def test_bwt_block_codec_roundtrip(rng):
    from kanzi_tpu.transforms.bwt import BWTBlockCodec
    # n=1 skips (pIndexSize==0), matching the reference
    with pytest.raises(TransformSkip):
        BWTBlockCodec({}).forward(np.array([7], dtype=np.uint8))
    for n in [2, 255, 256, 257, 5000, 100000]:
        data = rng.choice(np.frombuffer(b"banana bandana! ", dtype=np.uint8), n)
        enc = BWTBlockCodec({}).forward(data)
        out = BWTBlockCodec({}).inverse(enc, count=n)
        np.testing.assert_array_equal(out, data)


def test_bwt_invalid_primary_index(rng):
    from kanzi_tpu.transforms.bwt import BWT
    data = rng.integers(0, 256, 1000, dtype=np.uint8)
    bwt = BWT()
    enc = bwt.forward(data)
    bad = BWT()
    bad.primary_indexes = [0] * 8  # invalid (must be >= 1)
    with pytest.raises(Exception):
        bad.inverse(enc)


# --- content filters ------------------------------------------------------

def test_text_codec_roundtrip(rng):
    from kanzi_tpu.transforms.text import TextCodec
    eng = (b"The quick brown fox jumps over the lazy dog. Because there "
           b"would be many people who believe that this time is different. ") * 200
    data = np.frombuffer(eng, dtype=np.uint8)
    for tc in (1, 2):
        ctx = {"textcodec": tc, "blockSize": data.size, "entropy": "NONE"}
        enc = TextCodec(ctx).forward(data)
        out = TextCodec(dict(ctx)).inverse(enc, count=data.size)
        np.testing.assert_array_equal(out, data)
        assert enc.size < data.size


def test_text_codec_skips_binary(rng):
    from kanzi_tpu.transforms.text import TextCodec
    data = rng.integers(0, 256, 50000, dtype=np.uint8)
    assert _rt(TextCodec({"textcodec": 2, "blockSize": 50000}), data) is None


def test_utf_codec_roundtrip(rng):
    from kanzi_tpu.transforms.utf import UTFCodec
    text = ("Привет мир! Ça va très bien. 日本語のテキスト。" * 300).encode("utf-8")
    data = np.frombuffer(text, dtype=np.uint8)
    n = _rt(UTFCodec({}), data)
    assert n is not None and n < data.size


def test_alias_codec_paths(rng):
    from kanzi_tpu.transforms.alias import AliasCodec
    dna = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), 50000)
    assert _rt(AliasCodec({}), dna) is not None
    sym16 = rng.choice(np.frombuffer(b"0123456789abcdef", dtype=np.uint8), 49999)
    assert _rt(AliasCodec({}), sym16) is not None
    words = rng.choice(np.frombuffer(b"the cat sat on a mat zx!", dtype=np.uint8), 100000)
    assert _rt(AliasCodec({}), words) is not None
    assert _rt(AliasCodec({}), np.full(5000, 7, dtype=np.uint8)) is not None


def test_exe_codec_roundtrip():
    from kanzi_tpu.transforms.exe import EXECodec
    import kanzi_tpu.utils.native as nat
    nat.get_lib()
    blob = open(nat._SO, "rb").read()
    data = np.frombuffer(blob[:262144], dtype=np.uint8)
    enc = EXECodec({}).forward(data)
    out = EXECodec({}).inverse(enc, count=data.size)
    np.testing.assert_array_equal(out, data)


def test_rolz_roundtrip(rng):
    from kanzi_tpu.transforms.rolz import ROLZCodec
    words = [b"the quick brown fox ", b"jumps over ", b"lazy dog. "]
    data = np.frombuffer(b"".join([words[i] for i in rng.choice(3, 5000)]), dtype=np.uint8)
    enc = ROLZCodec({}).forward(data)
    out = ROLZCodec({}).inverse(enc, count=data.size)
    np.testing.assert_array_equal(out, data)
    assert enc.size < data.size // 4
    # random data declines
    assert _rt(ROLZCodec({}), rng.integers(0, 256, 5000, dtype=np.uint8)) is None


def test_rolzx_roundtrip(rng):
    from kanzi_tpu.transforms.rolz import ROLZCodec
    words = [b"the quick brown fox ", b"jumps over ", b"lazy dog. "]
    data = np.frombuffer(b"".join([words[i] for i in rng.choice(3, 5000)]), dtype=np.uint8)
    enc = ROLZCodec({}, extra=True).forward(data)
    out = ROLZCodec({}, extra=True).inverse(enc, count=data.size)
    np.testing.assert_array_equal(out, data)
    assert enc.size < data.size // 4
    # skewed low-entropy data (exercises the adaptive binary coder's
    # carry/renorm paths that diverge from the ROLZ+ANS pipeline)
    skew = (rng.integers(0, 2, 200000) * rng.integers(0, 16, 200000)).astype(np.uint8)
    enc2 = ROLZCodec({}, extra=True).forward(skew)
    out2 = ROLZCodec({}, extra=True).inverse(enc2, count=skew.size)
    np.testing.assert_array_equal(out2, skew)
    # random data declines
    assert _rt(ROLZCodec({}, extra=True), rng.integers(0, 256, 5000, dtype=np.uint8)) is None


def test_rolzx_stream_roundtrip(rng):
    import io as _io
    from kanzi_tpu.io.stream import CompressedOutputStream, CompressedInputStream
    data = bytes(b"hello world, kanzi-tpu rolzx stream test. " * 4000)
    buf = _io.BytesIO()
    cos = CompressedOutputStream(buf, {"transform": "ROLZX", "entropy": "NONE",
                                       "blockSize": 128 * 1024, "jobs": 2})
    cos.write(data)
    cos.close()
    cis = CompressedInputStream(_io.BytesIO(buf.getvalue()), {"jobs": 2})
    out = cis.read(len(data) + 100)
    if isinstance(out, np.ndarray):
        out = out.tobytes()
    assert out == data


def test_ans_native_matches_python(rng, monkeypatch):
    import kanzi_tpu.utils.native_coders as nc
    from kanzi_tpu.core.bits import BitWriter
    from kanzi_tpu.entropy.ans import ANSRangeEncoder
    data = rng.choice(np.frombuffer(b"abcdefgh", dtype=np.uint8), 40000)
    for order in (0, 1):
        bw1 = BitWriter()
        ANSRangeEncoder(bw1, order).encode(data)
        monkeypatch.setattr(nc, "_FORCE_PY", True)
        bw2 = BitWriter()
        ANSRangeEncoder(bw2, order).encode(data)
        monkeypatch.setattr(nc, "_FORCE_PY", False)
        assert bw1.getvalue() == bw2.getvalue()


def test_bwts_roundtrip(rng):
    from kanzi_tpu.transforms.bwts import BWTS
    for n in [1, 2, 100, 3000]:
        data = rng.choice(np.frombuffer(b"mississippi banana ", dtype=np.uint8), n)
        enc = BWTS().forward(data)
        out = BWTS().inverse(enc, count=n)
        np.testing.assert_array_equal(out, data)


def test_bwt_big_block_u40_inverse(rng, monkeypatch):
    """Blocks ABOVE 2^24 use the 40-bit packed inverse (native/bwt.cpp
    bwt_inverse_big) — the u32 fast path now covers up to exactly 16 MiB,
    so this is the only unit coverage of the big path and its opt-in
    bigram walk (KANZI_TPU_BWT_BIGRAM=1)."""
    import os

    from kanzi_tpu.utils.corpus import mixed_corpus
    from kanzi_tpu.utils.native_transforms import (bwt_forward_native,
                                                   bwt_inverse_native)
    if bwt_forward_native(np.zeros(16, np.uint8), 1) is None:
        pytest.skip("native library unavailable")
    n = (1 << 24) + 65536
    data = mixed_corpus(n, seed=24)
    bwt, idxs = bwt_forward_native(data, 8)
    inv = bwt_inverse_native(bwt, idxs, 8, jobs=2)
    np.testing.assert_array_equal(inv, data)
    monkeypatch.setenv("KANZI_TPU_BWT_BIGRAM", "1")
    inv2 = bwt_inverse_native(bwt, idxs, 8, jobs=2)
    np.testing.assert_array_equal(inv2, data)
