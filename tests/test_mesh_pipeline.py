"""Full level-1 pipeline over the virtual device mesh: the per-block LZX
transform stage sharded via shard_map + all_gather, committed in block
order through the standard v7 writer (the mesh analogue of the per-block
EncodingTask scope, CompressedOutputStream.java:512-586)."""

from __future__ import annotations

import io

import numpy as np
import pytest


def _mesh(n):
    import jax

    from kanzi_tpu.parallel.engine import make_mesh
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(n)


def test_mesh_l1_round_trip_mixed():
    from kanzi_tpu.io.stream import CompressedInputStream
    from kanzi_tpu.parallel.engine import mesh_l1_compress
    from kanzi_tpu.utils.corpus import mixed_corpus

    mesh = _mesh(8)
    data = mixed_corpus(4 << 20)
    wire = mesh_l1_compress(mesh, data, block_size=1 << 19)
    assert len(wire) < data.size          # it actually compresses
    out = CompressedInputStream(io.BytesIO(wire), {"jobs": 2}).read(-1)
    assert out == data.tobytes()


def test_mesh_l1_matches_host_level1_ratio():
    """The mesh path must produce a stream no larger than ~1.02x the host
    level-1 writer on the same bytes (same engine per shard; padding rows
    at block boundaries may cost a whisker)."""
    from kanzi_tpu.app.block_compressor import BlockCompressor
    from kanzi_tpu.parallel.engine import mesh_l1_compress
    from kanzi_tpu.utils.corpus import mixed_corpus

    mesh = _mesh(8)
    data = mixed_corpus(2 << 20, seed=3)
    wire = mesh_l1_compress(mesh, data, block_size=1 << 19)
    host = BlockCompressor(transform="LZX", entropy="NONE",
                           block_size=1 << 19, jobs=2).compress_bytes(
        data.tobytes())
    assert len(wire) <= int(len(host) * 1.02)


def test_mesh_l1_incompressible_copy_fallback():
    from kanzi_tpu.io.stream import CompressedInputStream
    from kanzi_tpu.parallel.engine import mesh_l1_compress

    mesh = _mesh(8)
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 1 << 20, dtype=np.uint8)
    wire = mesh_l1_compress(mesh, data, block_size=1 << 19)
    out = CompressedInputStream(io.BytesIO(wire), {}).read(-1)
    assert out == data.tobytes()


def test_mesh_ans0_decode_round_trip():
    """Sharded entropy DECODE (the DecodingTask fan-out analogue,
    CompressedInputStream.java:1106-1191): wire produced by the mesh
    encoder decodes byte-exactly with payloads sharded over the mesh."""
    import numpy as np

    from kanzi_tpu.parallel.engine import (mesh_ans0_compress,
                                           mesh_ans0_decompress)

    mesh = _mesh(8)
    rng = np.random.default_rng(9)
    chunk = 4096
    blob = (rng.normal(90, 25, 19 * chunk + 511)
            .clip(0, 255).astype(np.uint8))
    wire = mesh_ans0_compress(mesh, blob, chunk=chunk)
    got = mesh_ans0_decompress(mesh, wire, blob.size, chunk=chunk)
    assert np.array_equal(got, blob)


def test_mesh_ans0_decode_rejects_corrupt_payload():
    import numpy as np
    import pytest as _pytest

    from kanzi_tpu.core.errors import BitStreamError
    from kanzi_tpu.parallel.engine import (mesh_ans0_compress,
                                           mesh_ans0_decompress)

    mesh = _mesh(8)
    rng = np.random.default_rng(10)
    chunk = 4096
    blob = (rng.normal(90, 25, 9 * chunk).clip(0, 255).astype(np.uint8))
    wire = bytearray(mesh_ans0_compress(mesh, blob, chunk=chunk))
    wire[len(wire) // 2] ^= 0xFF          # flip payload bits mid-stream
    with _pytest.raises(BitStreamError):
        mesh_ans0_decompress(mesh, bytes(wire), blob.size, chunk=chunk)


def test_mesh_l5_round_trip_and_ratio():
    """Level 5 (TEXT+UTF+BWT+RANK+ZRLT + ANS0) with the suffix-array and
    entropy stages sharded over the mesh: byte-exact round trip through
    the standard reader, and the same stream size as the host writer to
    within the per-block ANS byte-alignment pad."""
    import numpy as np

    from kanzi_tpu.app.block_compressor import BlockCompressor
    from kanzi_tpu.io.stream import CompressedInputStream
    from kanzi_tpu.parallel.engine import mesh_l5_compress
    from kanzi_tpu.utils.corpus import mixed_corpus

    mesh = _mesh(8)
    data = mixed_corpus(2 << 20, seed=6)
    wire = mesh_l5_compress(mesh, data, block_size=1 << 19)
    got = CompressedInputStream(io.BytesIO(wire), {"jobs": 2}).read(-1)
    assert got == data.tobytes()
    host = BlockCompressor(transform="TEXT+UTF+BWT+RANK+ZRLT",
                           entropy="ANS0", block_size=1 << 19,
                           jobs=2).compress_bytes(data.tobytes())
    assert len(wire) <= len(host) + 4 * ((data.size >> 19) + 1)


def test_mesh_reader_decode_round_trip():
    """Full-stream mesh DECODE through the standard reader: the l5 wire
    round-trips with the ANS0 entropy stage sharded in BOTH directions
    (encoder hook entropy/ans.py _ans0_mesh; decoder hook
    ANSRangeDecoder.decode -> mesh_ans0_decode_stream).  Match:
    CompressedInputStream.java:1106-1191 DecodingTask fan-out."""
    from kanzi_tpu.parallel.engine import mesh_decompress, mesh_l5_compress
    from kanzi_tpu.utils.corpus import mixed_corpus

    mesh = _mesh(8)
    data = mixed_corpus(2 << 20, seed=11)
    wire = mesh_l5_compress(mesh, data, block_size=1 << 19)
    got = mesh_decompress(mesh, wire, jobs=2)
    assert got == data.tobytes()


def test_mesh_reader_decode_rejects_corrupt_stream():
    """The sharded reader path keeps the host reader's failure detection:
    flipped payload bits are rejected, not silently mis-decoded."""
    import pytest as _pytest

    from kanzi_tpu.core.errors import BitStreamError
    from kanzi_tpu.io.stream import IOError_
    from kanzi_tpu.parallel.engine import mesh_decompress, mesh_l5_compress
    from kanzi_tpu.utils.corpus import mixed_corpus

    mesh = _mesh(8)
    data = mixed_corpus(1 << 20, seed=12)
    wire = bytearray(mesh_l5_compress(mesh, data, block_size=1 << 19))
    wire[(len(wire) * 3) // 4] ^= 0xFF
    with _pytest.raises((BitStreamError, IOError_, ValueError, EOFError)):
        mesh_decompress(mesh, bytes(wire), jobs=2)
