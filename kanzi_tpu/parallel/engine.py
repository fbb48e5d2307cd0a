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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ans as jans


def _encode_fn(c: int):
    """Per-device encode: the fused Pallas pipeline on TPU for full 16 KiB
    chunks, the XLA lockstep path elsewhere (CPU mesh, odd chunk sizes)."""
    if jax.default_backend() == "tpu" and c == 16384:
        from ..ops.ans_pallas import ans0_encode_chunks_fused
        return ans0_encode_chunks_fused
    return jans.ans0_encode_chunks


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
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    enc = _encode_fn(np.shape(chunks)[1])

    @jax.jit
    def step(ch, fr, cm):
        ch = jax.lax.with_sharding_constraint(ch, shard)
        fr = jax.lax.with_sharding_constraint(fr, shard)
        cm = jax.lax.with_sharding_constraint(cm, shard)
        payload, n_emit, states = enc(ch, fr, cm)
        # ordered-commit metadata: every host needs all lengths to lay out
        # the bitstream; replicate them (all-gather over ICI)
        lengths = jax.lax.with_sharding_constraint(n_emit, repl)
        return payload, lengths, states

    with mesh:
        return step(jnp.asarray(chunks), jnp.asarray(freq, dtype=jnp.int32),
                    jnp.asarray(cum, dtype=jnp.int32))


def train_step(mesh: Mesh, chunks, freq, cum):
    """Full multi-chip step used by the dry-run: compress + collective stats.

    Returns per-step aggregate metrics computed with mesh collectives
    (psum over the blocks axis) alongside the compressed payloads.
    """
    from jax.experimental.shard_map import shard_map
    axis = mesh.axis_names[0]

    enc = _encode_fn(np.shape(chunks)[1])

    def local(ch, fr, cm):
        payload, n_emit, states = enc(ch, fr, cm)
        local_bytes = jnp.sum(n_emit) * 2
        total_bytes = jax.lax.psum(local_bytes, axis)      # ICI collective
        all_lengths = jax.lax.all_gather(n_emit, axis, tiled=True)
        return payload, all_lengths, states, total_bytes

    try:
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=(P(axis), P(), P(axis), P()),
                       check_vma=False)
    except TypeError:  # older jax spells it check_rep
        fn = shard_map(local, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis)),
                       out_specs=(P(axis), P(), P(axis), P()),
                       check_rep=False)
    return jax.jit(fn)(jnp.asarray(chunks), jnp.asarray(freq, dtype=jnp.int32),
                       jnp.asarray(cum, dtype=jnp.int32))
