"""EXE codec: x86/ARM64 branch-target rewriting (relative -> absolute).

Wire format re-derived from K/transform/EXECodec.java:35-1013 — see
native/exe.cpp.  Detects the architecture from PE/ELF/Mach-O headers or
jump-opcode histograms; skipped when the native library is missing.
"""

from __future__ import annotations

import numpy as np

from ..core.globals import DataType
from ..core.types import TransformSkip
from ..utils import native_transforms as nt

MIN_BLOCK_SIZE = 4096


class EXECodec:
    def __init__(self, ctx: dict | None = None, **kw) -> None:
        self.ctx = ctx
        self.bs_version = (ctx or {}).get("bsVersion", 7)

    def max_encoded_len(self, src_len: int) -> int:
        return src_len + 32 if src_len <= 256 else src_len + (src_len >> 3)

    def forward(self, src: np.ndarray) -> np.ndarray:
        src = np.asarray(src, dtype=np.uint8)
        if src.size < MIN_BLOCK_SIZE:
            raise TransformSkip("EXE: block too small")
        if self.ctx is not None:
            dt = self.ctx.get("dataType", DataType.UNDEFINED)
            if dt not in (DataType.UNDEFINED, DataType.EXE, DataType.BIN):
                raise TransformSkip("EXE: wrong data type")
        res, dt_ord = nt.exe_forward_native(src)
        if self.ctx is not None and dt_ord is not None and dt_ord > 0:
            self.ctx["dataType"] = DataType(dt_ord)
        if res is None:
            raise TransformSkip("EXE: not executable code or no native kernel")
        return res

    def inverse(self, src: np.ndarray, count: int | None = None) -> np.ndarray:
        src = np.asarray(src, dtype=np.uint8)
        if src.size == 0:
            return src.copy()
        if self.bs_version < 3:
            return _inverse_v2(src)
        res = nt.exe_inverse_native(src, count)
        if res is None:
            raise NotImplementedError("EXE inverse requires the native library")
        return res


def _inverse_v2(src: np.ndarray) -> np.ndarray:
    """Pre-v3 x86 layout: no mode byte, 0xF5 escape after E8/E9, address
    bytes XORed with 0xF0 and stored big-endian-ish (EXECodec.java:498-560)."""
    n = src.size
    out = bytearray()
    i = 0
    end = n - 8
    while i < end:
        out.append(int(src[i])); i += 1
        if (int(src[i - 1]) & 0xFE) != 0xE8:
            continue
        if int(src[i]) == 0xF5:
            i += 1  # escape: not an encoded address
            continue
        sgn = int(src[i]) - 1
        if sgn not in (0, -1):
            continue
        addr = ((0xF0 ^ int(src[i + 3]))
                | ((0xF0 ^ int(src[i + 2])) << 8)
                | ((0xF0 ^ int(src[i + 1])) << 16)
                | ((sgn & 0xFF) << 24))
        addr -= len(out)
        out.append(addr & 0xFF)
        out.append((addr >> 8) & 0xFF)
        out.append((addr >> 16) & 0xFF)
        out.append(sgn & 0xFF)
        i += 4
    while i < n:
        out.append(int(src[i])); i += 1
    return np.frombuffer(bytes(out), dtype=np.uint8).copy()
