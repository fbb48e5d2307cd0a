"""Shared entropy-coding helpers: alphabet wire coding, frequency
normalization, LSB-first varints.

Wire format re-derived from K/entropy/EntropyUtils.java:30-300.  The
normalization error-spreading procedure is replicated exactly because encoder
and decoder must derive identical frequency tables from the same histogram
(ANS/Range emit the normalized freqs; Huffman re-normalizes lengths).
"""

from __future__ import annotations

import numpy as np

from ..core.bits import BitReader, BitWriter

INCOMPRESSIBLE_THRESHOLD = 973  # 0.95 * 1024

_FULL_ALPHABET = 0
_PARTIAL_ALPHABET = 1
_ALPHABET_256 = 0
_ALPHABET_0 = 1


def encode_alphabet(bw: BitWriter, alphabet: np.ndarray) -> int:
    """Emit the symbol set: 2 bits for full/empty, else 5-bit last-mask index
    plus presence bitmap bytes (EntropyUtils.java:38-74)."""
    count = len(alphabet)
    if count > 256:
        return -1
    if count == 0:
        bw.write_bit(_FULL_ALPHABET)
        bw.write_bit(_ALPHABET_0)
    elif count == 256:
        bw.write_bit(_FULL_ALPHABET)
        bw.write_bit(_ALPHABET_256)
    else:
        bw.write_bit(_PARTIAL_ALPHABET)
        alphabet = np.asarray(alphabet, dtype=np.int64)
        masks = np.zeros(32, dtype=np.uint8)
        np.bitwise_or.at(masks, alphabet >> 3, (1 << (alphabet & 7)).astype(np.uint8))
        last_mask = int(alphabet[-1]) >> 3
        bw.write_bits(last_mask, 5)
        bw.write_bits_vec(masks[:last_mask + 1].astype(np.uint64),
                          np.full(last_mask + 1, 8, dtype=np.int64))
    return count


def decode_alphabet(br: BitReader) -> np.ndarray:
    """Inverse of encode_alphabet; returns sorted symbol array."""
    if br.read_bit() == _FULL_ALPHABET:
        if br.read_bit() == _ALPHABET_0:
            return np.zeros(0, dtype=np.int32)
        return np.arange(256, dtype=np.int32)
    last_mask = br.read_bits(5)
    masks = br.read_bits_vec(np.full(last_mask + 1, 8, dtype=np.int64)).astype(np.uint8)
    bits = np.unpackbits(masks, bitorder="little")
    return np.nonzero(bits)[0].astype(np.int32)


def normalize_frequencies(freqs: np.ndarray, total_freq: int, scale: int) -> np.ndarray:
    """Scale ``freqs`` (len<=256, modified in place) so they sum to ``scale``.

    Returns the alphabet (symbols with non-zero original frequency).  The
    rounding + bounded error-spreading procedure matches
    EntropyUtils.java:141-250 exactly (wire-critical for ANS/Range).
    """
    if len(freqs) > 256:
        raise ValueError("alphabet too large")
    if not (1 << 8) <= scale <= (1 << 16):
        raise ValueError("scale must be in [256..65536]")
    if len(freqs) == 0 or total_freq == 0:
        return np.zeros(0, dtype=np.int32)

    if total_freq == scale:
        return np.nonzero(freqs[:256])[0].astype(np.int32)

    alphabet = []
    sum_scaled = 0
    sum_freq = 0
    idx_max = 0
    n = len(freqs)
    for i in range(n):
        f = int(freqs[i])
        if f == 0:
            continue
        sf = f * scale
        scaled = 1 if sf <= total_freq else (sf + (total_freq >> 1)) // total_freq
        alphabet.append(i)
        sum_scaled += scaled
        freqs[i] = scaled
        sum_freq += f
        if scaled > freqs[idx_max]:
            idx_max = i
        if sum_freq >= total_freq:
            break

    alphabet_size = len(alphabet)
    if alphabet_size == 0:
        return np.zeros(0, dtype=np.int32)
    if alphabet_size == 1:
        freqs[alphabet[0]] = scale
        return np.array(alphabet, dtype=np.int32)
    if sum_scaled == scale:
        return np.array(alphabet, dtype=np.int32)

    delta = sum_scaled - scale
    err_thr = int(freqs[idx_max]) >> 4
    if abs(delta) <= err_thr:
        freqs[idx_max] -= delta
        return np.array(alphabet, dtype=np.int32)

    if delta < 0:
        delta += err_thr
        freqs[idx_max] += err_thr
    else:
        delta -= err_thr
        freqs[idx_max] -= err_thr

    inc = -1 if delta > 0 else 1
    delta = abs(delta)
    round_ = 0
    while True:
        round_ += 1
        if round_ >= 6 or delta <= 0:
            break
        adjustments = 0
        for idx in alphabet:
            if freqs[idx] <= 2:
                continue
            freqs[idx] += inc
            adjustments += 1
            delta -= 1
            if delta == 0:
                break
        if adjustments == 0:
            break

    freqs[idx_max] = max(int(freqs[idx_max]) - delta, 1)
    return np.array(alphabet, dtype=np.int32)


def write_varint(bw: BitWriter, value: int) -> int:
    """LSB-first 7-bit varint, unsigned 32-bit (EntropyUtils.java:259-277)."""
    value &= 0xFFFFFFFF
    res = 0
    while value >= 128:
        bw.write_bits(0x80 | (value & 0x7F), 8)
        value >>= 7
        res += 1
    bw.write_bits(value, 8)
    return res


def read_varint(br: BitReader) -> int:
    value = br.read_bits(8)
    res = value & 0x7F
    shift = 7
    while value >= 128:
        value = br.read_bits(8)
        res |= (value & 0x7F) << shift
        if shift == 28:
            break
        shift += 7
    return res
