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
