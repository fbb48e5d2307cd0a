"""Placeholder for the TextCodec transform — forward declines (stage skipped),
inverse unsupported until implemented.  The skip-flag mechanism makes this a
valid (if less effective) member of any chain."""

from __future__ import annotations

import numpy as np

from ..core.types import TransformSkip


class TextCodec:
    def __init__(self, ctx: dict | None = None, **kw) -> None:
        self.ctx = ctx

    def max_encoded_len(self, src_len: int) -> int:
        return src_len + (src_len >> 2) + 1024

    def forward(self, src: np.ndarray) -> np.ndarray:
        raise TransformSkip("TextCodec not implemented yet")

    def inverse(self, src: np.ndarray, count: int | None = None) -> np.ndarray:
        raise NotImplementedError("TextCodec inverse not implemented yet")
