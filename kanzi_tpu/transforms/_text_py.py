"""Pure-Python TEXT codec inverse — the executable spec / no-native
fallback (mirrors native/text.cpp kz_text_inverse, itself re-derived from
K/transform/TextCodec.java:523-760).

Serial per-byte loop: correctness over speed (the C++ path is the fast
one; this exists so KANZI_TPU_NO_NATIVE=1 can decode every level).
"""

from __future__ import annotations

import numpy as np

THRESHOLD2 = 128 * 128
MAX_DICT_SIZE = 1 << 19
MAX_WORD_LENGTH = 31
LF, CR = 0x0A, 0x0D
ESCAPE_TOKEN1, ESCAPE_TOKEN2 = 0x0F, 0x0E
HASH1 = 0x7FEB352D
HASH2 = 0x846CA68B
MASK_CRLF = 0x40
MASK_LENGTH = 0x0007FFFF
MASK_FLIP_CASE = 0x80
_M32 = 0xFFFFFFFF


def _is_text(v: int) -> bool:
    c = v | 0x20
    return 0x61 <= c <= 0x7A


_DELIM = [False] * 256
for _i in range(256):
    _d = (0x20 <= _i <= 0x2F) or (0x3A <= _i <= 0x3F)
    if _i in (0x0A, 0x09, 0x0D, 0x5F, 0x7C, 0x7B, 0x7D, 0x5B, 0x5D):
        _d = True
    _DELIM[_i] = _d


def _ilog2(x: int) -> int:
    return max(x.bit_length() - 1, 0)


class _Entry:
    __slots__ = ("hash", "pos", "data", "buf")

    def __init__(self, h, pos, data, buf):
        self.hash = h
        self.pos = pos
        self.data = data
        self.buf = buf


def _static_dict():
    """Build the 1024-word static dictionary (kz_text_set_dict mirror)."""
    from ._text_dict import DICT_EN_1024
    words = bytearray(DICT_EN_1024)
    entries = []
    anchor, h, nb = 0, HASH1, 0
    for i in range(len(words)):
        if not _is_text(words[i]):
            continue
        if 0x41 <= words[i] <= 0x5A:  # upper: word boundary
            if i > anchor:
                entries.append(_Entry(h, anchor, ((i - anchor) << 24) | nb,
                                      words))
                nb += 1
                anchor = i
                h = HASH1
                if nb >= 1024:
                    break
            words[i] ^= 0x20
        h = (h * HASH1 ^ words[i] * HASH2) & _M32
    if nb < 1024:
        entries.append(_Entry(h, anchor,
                              ((len(words) - anchor) << 24) | nb, words))
    return entries


_STATIC = None


def _get_static():
    global _STATIC
    if _STATIC is None:
        _STATIC = _static_dict()
    return _STATIC


class _Dict:
    def __init__(self, count: int, log_hash: int, with_escapes: bool):
        static = _get_static()
        log = 13 if count < 1024 else max(min(_ilog2(count // 128), 18), 13)
        self.dict_size = 1 << log
        self.static_size = len(static) + (2 if with_escapes else 0)
        self.hash_mask = (1 << log_hash) - 1
        self.map: dict[int, _Entry] = {}
        self.list: dict[int, _Entry] = {}
        for i, e in enumerate(static):
            if i >= self.dict_size:
                break
            self.list[i] = _Entry(e.hash, e.pos, e.data, e.buf)
        if with_escapes:
            n = len(static)
            self.list[n] = _Entry(0, 0, (1 << 24) | n, bytes([ESCAPE_TOKEN2]))
            self.list[n + 1] = _Entry(0, 0, (1 << 24) | (n + 1),
                                      bytes([ESCAPE_TOKEN1]))
        for i in range(self.static_size):
            e = self.list.get(i)
            if e is not None:
                self.map[e.hash & self.hash_mask] = e

    def entry(self, i: int) -> _Entry:
        e = self.list.get(i)
        if e is None:
            e = _Entry(0, -1, i, None)
            self.list[i] = e
        return e

    def expand(self) -> bool:
        if self.dict_size >= MAX_DICT_SIZE:
            return False
        self.dict_size <<= 1
        return True


def _lookup_or_add(D: _Dict, src, delim_anchor: int, src_idx: int,
                   length: int, words: int) -> int:
    """Decoder-side dictionary update (tryFlipped/threshold flags False).
    Returns the updated word counter."""
    val = src[delim_anchor + 1]
    h1 = (HASH1 * HASH1 ^ val * HASH2) & _M32
    for i in range(delim_anchor + 2, src_idx):
        h1 = (h1 * HASH1 ^ src[i] * HASH2) & _M32
    e1 = D.map.get(h1 & D.hash_mask)
    e = None
    if e1 is not None and e1.hash == h1 and (e1.data >> 24) & 0xFF == length:
        e = e1
        # verify bytes
        for k in range(length - 1):
            if src[delim_anchor + 2 + k] != e.buf[e.pos + 1 + k]:
                e = None
                break
    if e is None:
        add_ok = (length > 3) or (words < THRESHOLD2)
        if add_ok and e1 is None:
            ne = D.entry(words)
            if (ne.data & MASK_LENGTH) >= D.static_size:
                D.map.pop(ne.hash & D.hash_mask, None)  # unconditional, as C++
                ne.buf = src
                ne.pos = delim_anchor + 1
                ne.hash = h1
                ne.data = (length << 24) | words
            D.map[h1 & D.hash_mask] = ne
            words += 1
            if words >= D.dict_size:
                if not D.expand():
                    words = D.static_size
    return words


def text_inverse_py(src: np.ndarray, codec_type: int, block_size: int,
                    extra: bool, count_hint: int | None,
                    legacy: bool = False) -> np.ndarray:
    """Mirror of native/text.cpp kz_text_inverse."""
    src = bytes(np.asarray(src, dtype=np.uint8).tobytes())
    count = len(src)
    cap = count_hint if count_hint is not None else count * 5 + 1024
    t1 = codec_type == 1
    log = 13
    if t1:
        if block_size >= 8:
            log = max(min(_ilog2(block_size // 8), 26), 13)
    else:
        if block_size >= 32:
            log = max(min(_ilog2(block_size // 32), 24), 13)
    log += 1 if extra else 0
    D = _Dict(cap, log, t1)
    dst = bytearray(cap)
    src_idx, dst_idx = 0, 0
    is_crlf = (src[src_idx] & MASK_CRLF) != 0
    src_idx += 1
    if src_idx >= count:
        return np.frombuffer(bytes(dst[:dst_idx]), np.uint8).copy()
    delim_anchor = src_idx - 1 if _is_text(src[src_idx]) else src_idx
    words = D.static_size
    word_run = False
    while src_idx < count and dst_idx < cap:
        cur = src[src_idx]
        if _is_text(cur):
            dst[dst_idx] = cur
            dst_idx += 1
            src_idx += 1
            continue
        if src_idx > delim_anchor + 3 and _DELIM[cur]:
            length = src_idx - delim_anchor - 1
            if length <= MAX_WORD_LENGTH:
                words = _lookup_or_add(D, src, delim_anchor, src_idx,
                                       length, words)
        src_idx += 1
        flip_mask = 0
        idx = -1
        if t1:
            is_word_ref = cur in (ESCAPE_TOKEN1, ESCAPE_TOKEN2)
            if is_word_ref:
                if src_idx >= count:
                    raise ValueError("TEXT: truncated")
                idx = src[src_idx]
                src_idx += 1
                if idx >= 128:
                    idx &= 0x7F
                    idx2 = src[src_idx]
                    src_idx += 1
                    if idx2 & 0x80:
                        idx = ((idx & 0x1F) << 7) | (idx2 & 0x7F)
                        idx2 = src[src_idx] & 0x7F
                        src_idx += 1
                    idx = (idx << 7) | idx2
                    if idx >= D.dict_size:
                        raise ValueError("TEXT: bad index")
                flip_mask = 0x20 if cur == ESCAPE_TOKEN2 else 0
        elif legacy:
            is_word_ref = (cur & 0x80) != 0
            if is_word_ref:
                flip_mask = cur & 0x20
                idx = cur & 0x1F
                if cur & 0x40:
                    if src_idx >= count:
                        raise ValueError("TEXT: truncated")
                    idx2 = src[src_idx]
                    src_idx += 1
                    if idx2 & 0x80:
                        idx = (idx << 7) | (idx2 & 0x7F)
                        if src_idx >= count:
                            raise ValueError("TEXT: truncated")
                        idx2 = src[src_idx] & 0x7F
                        src_idx += 1
                    idx = (idx << 7) | idx2
                    if idx >= D.dict_size:
                        raise ValueError("TEXT: bad index")
        else:
            is_word_ref = (cur & 0x80) != 0
            if is_word_ref:
                if cur == MASK_FLIP_CASE:
                    flip_mask = 0x20
                    if src_idx >= count:
                        raise ValueError("TEXT: truncated")
                    cur = src[src_idx]
                    src_idx += 1
                idx = cur & 0x7F
                if idx >= 64:
                    if idx >= 112:
                        if src_idx + 1 >= count:
                            raise ValueError("TEXT: truncated")
                        idx = ((idx & 0x0F) << 16) | (src[src_idx] << 8) \
                            | src[src_idx + 1]
                        src_idx += 2
                    else:
                        if src_idx >= count:
                            raise ValueError("TEXT: truncated")
                        idx = ((idx & 0x1F) << 8) | src[src_idx]
                        src_idx += 1
                    if idx > D.dict_size:
                        raise ValueError("TEXT: bad index")
                elif idx == 0:
                    raise ValueError("TEXT: bad index")
                idx -= 1
        if is_word_ref:
            e = D.entry(idx)
            length = (e.data >> 24) & 0xFF
            if word_run and length > 1:
                if dst_idx >= cap:
                    raise ValueError("TEXT: overflow")
                dst[dst_idx] = 0x20
                dst_idx += 1
            if e.pos < 0 or dst_idx + length >= cap:
                raise ValueError("TEXT: bad entry")
            dst[dst_idx] = e.buf[e.pos] ^ flip_mask
            dst_idx += 1
            if length > 1:
                dst[dst_idx:dst_idx + length - 1] = \
                    e.buf[e.pos + 1:e.pos + length]
                dst_idx += length - 1
                word_run = True
                delim_anchor = src_idx
            else:
                word_run = False
                delim_anchor = src_idx - 1
        else:
            if not t1 and cur == ESCAPE_TOKEN1:
                if src_idx >= count:
                    raise ValueError("TEXT: truncated")
                dst[dst_idx] = src[src_idx]
                dst_idx += 1
                src_idx += 1
            else:
                if is_crlf and cur == LF:
                    dst[dst_idx] = CR
                    dst_idx += 1
                    if dst_idx >= cap:
                        raise ValueError("TEXT: overflow")
                dst[dst_idx] = cur
                dst_idx += 1
            word_run = False
            delim_anchor = src_idx - 1
    if src_idx != count:
        raise ValueError("TEXT: stream mismatch")
    return np.frombuffer(bytes(dst[:dst_idx]), np.uint8).copy()
