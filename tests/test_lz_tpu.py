"""Device (JAX) LZX encoder: valid wire output, round-trips through both
inverse implementations, and match quality at least on par with the serial
native parse (TestTransforms.java:173 analog for the new TPU path)."""

import numpy as np
import pytest

from kanzi_tpu.ops.lz_tpu import (_emit_len_bytes, _merge_adjacent,
                                  lzx_forward_device)
from kanzi_tpu.transforms.lz import LZXCodec, _lzx_inverse_py


def _text(n: int) -> np.ndarray:
    base = open("/root/repo/SURVEY.md", "rb").read()
    return np.frombuffer((base * (n // len(base) + 1))[:n], np.uint8)


@pytest.mark.parametrize("case", ["text", "zeros", "period7", "mixed",
                                  "periodic_1m"])
def test_device_lzx_round_trip(case):
    rng = np.random.default_rng(7)
    if case == "text":
        data = _text(200_000)
    elif case == "zeros":
        data = np.zeros(77_777, np.uint8)
    elif case == "period7":
        data = np.tile(np.arange(7, dtype=np.uint8), 11_111)
    elif case == "mixed":
        data = np.concatenate([
            np.zeros(5000, np.uint8),
            rng.integers(0, 256, 5000).astype(np.uint8),
            _text(50_000)])
    else:  # periodic_1m: long-range repeats beyond the 16-bit window
        base = _text(300_000)
        data = np.tile(base, 4)
    enc = lzx_forward_device(data)
    assert enc is not None
    dec = _lzx_inverse_py(enc, data.size)
    assert np.array_equal(dec, data)
    # native inverse must accept the same stream
    dec2 = LZXCodec().inverse(enc, data.size)
    assert np.array_equal(np.asarray(dec2, np.uint8), data)


def test_device_lzx_skips_incompressible():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 60_000).astype(np.uint8)
    assert lzx_forward_device(data) is None
    assert lzx_forward_device(np.zeros(10, np.uint8)) is None  # < min block


def test_device_lzx_beats_serial_parse_on_text():
    data = _text(1 << 20)
    enc_dev = lzx_forward_device(data)
    enc_nat = LZXCodec().forward(data)
    assert enc_dev.size <= enc_nat.size  # ladder+merge parse is stronger


def test_device_lzx_min_match6():
    data = np.frombuffer(b"ACGTACGGTTACG" * 4000, np.uint8)
    enc = lzx_forward_device(data, min_match=6)
    assert np.array_equal(_lzx_inverse_py(enc, data.size), data)


def test_merge_adjacent_splits_at_cap():
    pos = np.array([0, 100, 200100], dtype=np.int64)
    ln = np.array([100, 200000, 50], dtype=np.int64)
    dist = np.array([9, 9, 9], dtype=np.int64)
    p, l, d = _merge_adjacent(pos, ln, dist)
    assert l.sum() == 200150
    assert (l <= 65535).all()
    assert (d == 9).all()
    assert p[0] == 0 and (np.diff(p) == l[:-1]).all()


def test_emit_len_bytes_matches_reference_branches():
    vals = np.array([0, 253, 254, 255, 65789, 65790, 1 << 20], np.int64)
    nb, b = _emit_len_bytes(vals)
    assert list(nb) == [1, 1, 3, 3, 3, 4, 4]
    # 3-byte form: 254, (v-254)>>8, (v-254)&255
    assert list(b[2][:3]) == [254, 0, 0]
    assert list(b[4][:3]) == [254, 0xFF, 0xFF]
    # 4-byte form: 255 + 3 bytes of v-255
    v4 = 65790 - 255
    assert list(b[5]) == [255, v4 >> 16, (v4 >> 8) & 0xFF, v4 & 0xFF]


def test_codec_env_gate_round_trip(monkeypatch):
    monkeypatch.setenv("KANZI_TPU_DEVICE_LZ", "1")
    data = _text(100_000)
    c = LZXCodec()
    enc = c.forward(data)
    assert np.array_equal(np.asarray(c.inverse(enc, data.size)), data)


# ---------------------------------------------------------------------------
# v2 engine (ops/lz_sort): batched content-sort matcher + parallel greedy
# ---------------------------------------------------------------------------

from kanzi_tpu.ops.lz_sort import lzx_forward_device_v2  # noqa: E402


@pytest.mark.parametrize("case", ["text", "zeros", "period7", "mixed",
                                  "periodic_1m", "zero_prefix"])
def test_v2_round_trip(case):
    rng = np.random.default_rng(7)
    if case == "text":
        data = _text(200_000)
    elif case == "zeros":
        data = np.zeros(77_777, np.uint8)
    elif case == "period7":
        data = np.tile(np.arange(7, dtype=np.uint8), 11_111)
    elif case == "mixed":
        data = np.concatenate([
            np.zeros(5000, np.uint8),
            rng.integers(0, 256, 5000).astype(np.uint8),
            _text(50_000)])
    elif case == "zero_prefix":
        # matches must never reference the virtual zeros before the block
        data = np.concatenate([np.zeros(3000, np.uint8), _text(30_000)])
    else:  # long-range repeats beyond the row window
        data = np.tile(_text(300_000), 4)
    enc = lzx_forward_device_v2(data)
    assert enc is not None
    assert np.array_equal(_lzx_inverse_py(enc, data.size), data)
    dec2 = LZXCodec().inverse(enc, data.size)
    assert np.array_equal(np.asarray(dec2, np.uint8), data)


def test_v2_skips_incompressible():
    rng = np.random.default_rng(1)
    assert lzx_forward_device_v2(
        rng.integers(0, 256, 60_000).astype(np.uint8)) is None
    assert lzx_forward_device_v2(np.zeros(10, np.uint8)) is None


def test_v2_min_match6():
    data = np.frombuffer(b"ACGTACGGTTACG" * 4000, np.uint8)
    enc = lzx_forward_device_v2(data, min_match=6)
    assert np.array_equal(_lzx_inverse_py(enc, data.size), data)


def test_v2_ratio_near_native_on_mixed():
    """Parse quality guard: within 5% of the serial hash-chain parse on a
    realistic mixed corpus (the v2 window is 64 KiB vs native 64 KiB)."""
    from kanzi_tpu.utils.corpus import mixed_corpus
    data = mixed_corpus(1 << 20)
    enc_dev = lzx_forward_device_v2(data)
    enc_nat = LZXCodec().forward(data)
    assert enc_dev.size <= int(enc_nat.size * 1.05)


def test_v2_host_extension_exact():
    """Device caps matches at 8; the host extension must recover long
    matches byte-exactly (round-trip is the proof)."""
    rng = np.random.default_rng(5)
    chunk = rng.integers(0, 256, 500).astype(np.uint8)
    data = np.concatenate([chunk, rng.integers(0, 256, 37).astype(np.uint8),
                           chunk, chunk, _text(20_000)])
    enc = lzx_forward_device_v2(data)
    assert np.array_equal(_lzx_inverse_py(enc, data.size), data)
