"""Device-mesh block engine: data-parallel compression over jax.sharding.

The reference's only parallel axis is independent blocks over a thread pool
(K/io/CompressedOutputStream.java:512-586, spin-wait ordered commit).  The
TPU-native equivalent shards the chunk axis of a block batch across a 1-D
``blocks`` mesh: every device runs the rANS scan on its shard, collective
metadata (per-chunk payload lengths) is all-gathered over ICI, and the host
serializes blocks in order — same contract, mesh instead of threads.

compress_step() is the full "training step" analogue: shard -> per-device
scan/pack -> all_gather lengths -> ordered gather of payloads.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import ans as jans


def _encode_fn(c: int):
    """Per-device encode: the fused Pallas pipeline on TPU for full 16 KiB
    chunks, the XLA lockstep path elsewhere (CPU mesh, odd chunk sizes)."""
    if jax.default_backend() == "tpu" and c == 16384:
        from ..ops.ans_pallas import ans0_encode_chunks_fused
        return ans0_encode_chunks_fused
    return jans.ans0_encode_chunks


def _shard_map(fn, mesh: Mesh, *, in_specs, out_specs):
    """shard_map across jax versions (check_vma vs legacy check_rep)."""
    from jax.experimental.shard_map import shard_map
    try:
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def compress_step(mesh: Mesh, chunks, freq, cum):
    """Block-batch ANS0 compression over the mesh.

    Args:
      chunks: uint8 [N, C] with N a multiple of mesh size
      freq/cum: int32 [N, 256]
    Returns:
      payload [N, C] u16, lengths [N] i32 (globally replicated), states [N,4]
    """
    axis = mesh.axis_names[0]

    enc = _encode_fn(np.shape(chunks)[1])

    # shard_map (not plain jit + sharding constraints): the Pallas path is a
    # Mosaic kernel, which GSPMD cannot auto-partition — each device must run
    # the kernel on its own shard explicitly, with the ordered-commit length
    # metadata all-gathered over ICI afterwards.
    def local(ch, fr, cm):
        payload, n_emit, states = enc(ch, fr, cm)
        lengths = jax.lax.all_gather(n_emit, axis, tiled=True)
        return payload, lengths, states

    fn = _shard_map(local, mesh,
                    in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(), P(axis)))
    return jax.jit(fn)(jnp.asarray(chunks),
                       jnp.asarray(freq, dtype=jnp.int32),
                       jnp.asarray(cum, dtype=jnp.int32))


def train_step(mesh: Mesh, chunks, freq, cum):
    """Full multi-chip step used by the dry-run: compress + collective stats.

    Returns per-step aggregate metrics computed with mesh collectives
    (psum over the blocks axis) alongside the compressed payloads.
    """
    axis = mesh.axis_names[0]

    enc = _encode_fn(np.shape(chunks)[1])

    def local(ch, fr, cm):
        payload, n_emit, states = enc(ch, fr, cm)
        local_bytes = jnp.sum(n_emit) * 2
        total_bytes = jax.lax.psum(local_bytes, axis)      # ICI collective
        all_lengths = jax.lax.all_gather(n_emit, axis, tiled=True)
        return payload, all_lengths, states, total_bytes

    fn = _shard_map(local, mesh,
                    in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(), P(axis), P()))
    return jax.jit(fn)(jnp.asarray(chunks), jnp.asarray(freq, dtype=jnp.int32),
                       jnp.asarray(cum, dtype=jnp.int32))


def make_pipeline_step(mesh: Mesh, chunk: int):
    """Jitted full ANS0 entropy stage over the mesh: per-device histogram +
    the reference's exact frequency normalization + the 4-lane rANS scan +
    payload pack, with the ordered-commit length metadata all-gathered.

    This is the mesh analogue of the reference's per-block EncodingTask fan
    -out (K/io/CompressedOutputStream.java:512-586): blocks/chunks shard over
    the ``blocks`` axis, collectives ride ICI, the host serializes in order.

    Returns step(chunks_u8[N, chunk]) -> (freq[N,256], payload[N,chunk] u16,
    lengths[N] i32 replicated, states[N,4]).
    """
    axis = mesh.axis_names[0]
    enc = _encode_fn(chunk)
    total_shift = int(chunk).bit_length() - 1
    if (1 << total_shift) != chunk:
        raise ValueError("chunk must be a power of two for device stats")
    from ..ops.ans_pallas import _normalize_freqs_jax

    def local(ch):
        hist = jax.vmap(lambda r: jnp.bincount(r, length=256))(
            ch.astype(jnp.int32))
        freq = _normalize_freqs_jax(hist, total_shift, 1 << jans.LOG_RANGE)
        freq = freq.astype(jnp.int32)
        cum = jnp.concatenate(
            [jnp.zeros((ch.shape[0], 1), jnp.int32),
             jnp.cumsum(freq, axis=1)[:, :-1]], axis=1)
        payload, n_emit, states = enc(ch, freq, cum)
        lengths = jax.lax.all_gather(n_emit, axis, tiled=True)
        return freq, payload, lengths, states

    fn = _shard_map(local, mesh,
                    in_specs=(P(axis),),
                    out_specs=(P(axis), P(axis), P(), P(axis)))
    return jax.jit(fn)


def mesh_ans0_compress(mesh: Mesh, block: np.ndarray,
                       chunk: int = 16384) -> bytes:
    """Compress ``block`` through the full mesh ANS0 pipeline and return the
    exact ANSRangeEncoder wire bytes (decodable by entropy.ans
    .ANSRangeDecoder with ``chunk_size=chunk``).  Full chunks run on the
    mesh; the tail chunk (and the <=32-byte degenerate case) run on host."""
    from ..core.bits import BitWriter
    from ..entropy import ans as hans
    from ..ops.ans_block import assemble_ans0_wire

    block = np.asarray(block, dtype=np.uint8)
    count = block.size
    bw = BitWriter()
    if count <= 32:
        bw.write_bytes(block.tobytes())
        return bw.getvalue()
    nfull = count // chunk
    tail = count - nfull * chunk
    if nfull:
        ndev = mesh.devices.size
        npad = (-nfull) % ndev
        chunks = block[:nfull * chunk].reshape(nfull, chunk)
        if npad:  # pad the batch to the mesh size; padded rows are dropped
            chunks = np.concatenate(
                [chunks, np.repeat(chunks[-1:], npad, axis=0)])
        step = make_pipeline_step(mesh, chunk)
        freq_d, pay_d, len_d, st_d = step(jnp.asarray(chunks))
        freq = np.asarray(freq_d)[:nfull].astype(np.int64)
        payload = np.asarray(pay_d)[:nfull]
        n_emit = np.asarray(len_d)[:nfull]
        states = np.asarray(st_d)[:nfull]
        nz = freq > 0
        nsym = nz.sum(axis=1)
        alphabets = [np.flatnonzero(nz[i]).astype(np.int32)
                     for i in range(nfull)]
        assemble_ans0_wire(bw, freq, nsym, alphabets, n_emit, states,
                           payload, np.arange(nfull))
    if tail:
        enc = hans.ANSRangeEncoder(bw, 0, chunk_size=chunk)
        enc._encode_chunk(block[nfull * chunk:], bw)
    return bw.getvalue()


# ---------------------------------------------------------------------------
# full level-1 pipeline on the mesh
# ---------------------------------------------------------------------------
#
# The reference's unit of parallelism is the whole EncodingTask — transform
# chain + entropy per block (CompressedOutputStream.java:512-586).  Level 1
# is LZX + NONE (BlockCompressor.java:539), so the sharded stage is the LZX
# match+parse engine (ops/lz_sort): every device analyzes its shard of the
# 256 KiB content rows, per-shard token counts are all-gathered (the
# ordered-commit metadata riding ICI), and the host commits blocks in order
# through the standard v7 writer — producing a byte-for-byte valid .knz
# stream that CompressedInputStream decodes.


import functools


def make_l1_step(mesh: Mesh, mm: int = 4):
    return _make_l1_step(mesh, mm)


@functools.lru_cache(maxsize=None)
def _make_l1_step(mesh: Mesh, mm: int):
    """Jitted sharded LZX analyze (v3 whole-block engine): blocks
    (B, bucket) u8 with B a multiple of the mesh size shard over the
    ``blocks`` axis; returns per-shard front-compacted token arrays
    (pos, mlen, dist) — positions are SHARD-local — plus the all-gathered
    per-shard token counts (the ordered-commit metadata).  Memoized per
    (mesh, mm) so repeated callers share one jit cache (XLA:CPU pays a
    large lazy kernel-codegen cost on an executable's first run)."""
    from ..ops import lz_sort as L
    axis = mesh.axis_names[0]

    def local(bufs, send, mdist):
        pos, mlen, dist, ntok = L._analyze_flat(bufs, send, mdist, mm)
        counts = jax.lax.all_gather(ntok[None], axis, tiled=True)
        return pos, mlen, dist, counts

    fn = _shard_map(local, mesh,
                    in_specs=(P(axis), P(axis), P(axis)),
                    out_specs=(P(axis), P(axis), P(axis), P()))
    return jax.jit(fn)


def _l1_mesh_hints(mesh, chunks, mm: int = 4, step=None):
    """Run the sharded LZX stage over all ``chunks`` (one batch of blocks)
    and return per-block stream-writer hints [(mm, payload-or-None)]."""
    import jax.numpy as jnp

    from ..ops import lz_sort as L
    from ..ops.lz_tpu import MIN_BLOCK_LENGTH, _emit

    ndev = mesh.devices.size
    blocks = [np.asarray(b, dtype=np.uint8) for b in chunks]
    hints = [(mm, None)] * len(blocks)
    live = [i for i, b in enumerate(blocks)
            if MIN_BLOCK_LENGTH <= b.size <= L.MAX_FLAT]
    if not live:
        return hints
    bucket = L._flat_bucket(max(blocks[i].size for i in live))
    nb = len(live) + ((-len(live)) % ndev)  # zero pad rows: no tokens
    bufs = np.zeros((nb, bucket), np.uint8)
    send = np.full(nb, -18, np.int32)
    mdist = np.zeros(nb, np.int32)
    for j, i in enumerate(live):
        bufs[j, :blocks[i].size] = blocks[i]
        send[j] = blocks[i].size - 18
        mdist[j] = L._block_max_dist(blocks[i].size)
    if step is None:
        step = make_l1_step(mesh, mm)
    pos_d, mlen_d, dist_d, counts_d = step(
        jnp.asarray(bufs), jnp.asarray(send), jnp.asarray(mdist))
    counts = np.asarray(counts_d)
    bps = nb // ndev                      # blocks per shard
    span = bps * bucket                   # positions per shard
    span_out = span // 4                  # compacted token slots per shard
    #                                       (the parse's aligned-4-group
    #                                       reduction: <=1 token per group)
    ps, ls, ds = [], [], []
    for s in range(ndev):
        k = int(counts[s])
        if k == 0:
            continue
        ps.append(np.asarray(
            pos_d[s * span_out:s * span_out + k]).astype(np.int64) + s * span)
        ls.append(np.asarray(
            mlen_d[s * span_out:s * span_out + k]).astype(np.int64))
        ds.append(np.asarray(
            dist_d[s * span_out:s * span_out + k]).astype(np.int64))
    if not ps:
        return hints
    p = np.concatenate(ps)
    l = np.concatenate(ls)
    d = np.concatenate(ds)
    for j, i in enumerate(live):
        lo, hi = np.searchsorted(p, [j * bucket, (j + 1) * bucket])
        pi, li, di = p[lo:hi] - j * bucket, l[lo:hi].copy(), d[lo:hi]
        src = blocks[i]
        if pi.size:
            md = L._block_max_dist(src.size)
            out = L._emit_native(src, mm, pi, li, di, md)
            if out is False:  # no native library: numpy emission path
                li = L._extend_tokens_host(src, pi, li, di, src.size - 18)
                out = _emit(src, src.size, mm, md, pi, li, di)
            hints[i] = (mm, out)
    return hints


def mesh_l1_compress(mesh: Mesh, data: np.ndarray,
                     block_size: int = 4 << 20, checksum: int = 0,
                     jobs: int | None = None) -> bytes:
    """Compress ``data`` at level 1 (LZX + NONE) with the per-block
    transform stage sharded over the mesh, returning a complete v7 .knz
    stream (header, block framing, copy fallbacks, optional checksums)
    byte-decodable by io.stream.CompressedInputStream.  ``jobs`` bounds
    the blocks per mesh dispatch (default: all blocks at once up to the
    stream cap; pass the mesh size to keep per-step shapes minimal)."""
    import io as _io

    from ..io.stream import MAX_CONCURRENCY, CompressedOutputStream

    data = np.asarray(data, dtype=np.uint8)
    nblocks = max(1, -(-data.size // block_size))
    sink = _io.BytesIO()
    cos = CompressedOutputStream(sink, {
        "entropy": "NONE", "transform": "LZX", "blockSize": block_size,
        "jobs": min(jobs or MAX_CONCURRENCY, MAX_CONCURRENCY, nblocks),
        "checksum": checksum, "fileSize": data.size})
    step = make_l1_step(mesh)
    cos._lz_hint_fn = lambda chunks: _l1_mesh_hints(mesh, chunks, 4, step)
    cos.write(data.tobytes())
    cos.close()
    return sink.getvalue()
