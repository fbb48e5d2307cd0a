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
        res = nt.exe_inverse_native(src, count)
        if res is None:
            raise NotImplementedError("EXE inverse requires the native library")
        return res
