"""Host glue for the TPU ANS0 kernel: produces the exact ANSRangeEncoder
wire bytes (entropy/ans.py) with the symbol scan + payload packing on device.

Division of labor:
  host:   per-chunk histograms, the reference's exact frequency
          normalization (wire-identical headers), header/varint assembly,
          tail (<16 KiB) chunks
  device: the 4-lane rANS scan over all chunks in lockstep + payload pack
"""

from __future__ import annotations

import numpy as np

from ..core.bits import BitReader, BitWriter
from ..core.errors import BitStreamError
from ..entropy import ans as hans
from ..entropy import utils as eu
from . import ans as jans

CHUNK = jans.CHUNK


def _chunk_stats(chunks: np.ndarray):
    """(freq[N,256], cum[N,256], alphabet sizes) with exact reference
    normalization per chunk."""
    n = chunks.shape[0]
    # per-row histograms; a row loop beats one big offset-id bincount here
    # because it avoids a (n, CHUNK) temporary (slow first-touch on this host)
    hist = np.stack([np.bincount(r, minlength=256) for r in chunks])
    freq = eu.normalize_frequencies_batch(hist, CHUNK, 1 << jans.LOG_RANGE)
    nz = hist > 0
    nsym = nz.sum(axis=1)
    alphabets = [np.flatnonzero(nz[i]).astype(np.int32) for i in range(n)]
    cum = np.concatenate([np.zeros((n, 1), dtype=np.int64),
                          np.cumsum(freq, axis=1)[:, :-1]], axis=1)
    return freq, cum, nsym, alphabets


def _encode_kernel():
    """Kernel selection: the Pallas path on TPU (exact division in-kernel);
    the XLA lax.scan path elsewhere (CPU mesh, tests).  XLA's f32 divide is
    lowered to an approximate reciprocal on TPU and is NOT exact there."""
    import jax
    if jax.default_backend() == "tpu":
        from .ans_pallas import ans0_encode_chunks_pallas
        return ans0_encode_chunks_pallas
    return jans.ans0_encode_chunks


def assemble_ans0_wire(bw: BitWriter, freq: np.ndarray, nsym: np.ndarray,
                       alphabets: list, n_emit: np.ndarray,
                       states: np.ndarray, payload: np.ndarray,
                       rowmap: np.ndarray) -> None:
    """Serialize per-chunk ANS0 wire records (lr, freq header, varint size,
    4x32-bit states, big-endian u16 payload — ANSRangeEncoder.java:263-305)
    from device-produced arrays.  ``rowmap[i]`` is the payload row for chunk
    ``i`` (single-symbol chunks have no payload and are skipped)."""
    for i in range(len(nsym)):
        bw.write_bits(jans.LOG_RANGE - 8, 3)
        hans._write_freqs_header(bw, alphabets[i], freq[i], jans.LOG_RANGE)
        if nsym[i] <= 1:
            continue  # skipped chunk (single symbol)
        k = rowmap[i]
        ne = int(n_emit[k])
        pay = payload[k, :ne].astype(">u2").tobytes()
        eu.write_varint(bw, len(pay))
        for j in range(4):
            bw.write_bits(int(states[k, j]), 32)
        bw.write_bytes(pay)


def ans0_encode(block: np.ndarray, bw: BitWriter) -> int:
    """Drop-in for ANSRangeEncoder(order=0).encode with the scan on TPU."""
    import jax.numpy as jnp
    block = np.asarray(block, dtype=np.uint8)
    count = block.size
    if count <= 32:
        bw.write_bytes(block.tobytes())
        return count
    nfull = count // CHUNK
    tail = count - nfull * CHUNK
    if nfull > 0:
        import jax
        chunks = block[:nfull * CHUNK].reshape(nfull, CHUNK)
        if jax.default_backend() == "tpu":
            # fully device-resident: histogram + normalization + scan + pack
            from .ans_pallas import ans0_encode_device
            freq_d, pay_d, ne_d, st_d = ans0_encode_device(jnp.asarray(chunks))
            freq = np.asarray(freq_d).astype(np.int64)
            n_emit = np.asarray(ne_d)
            states = np.asarray(st_d)
            nz = freq > 0
            nsym = nz.sum(axis=1)
            alphabets = [np.flatnonzero(nz[i]).astype(np.int32)
                         for i in range(nfull)]
            # fetch only the populated payload prefix (bucketed width to
            # bound recompiles)
            mw = int(n_emit.max(initial=0))
            mw = 1 << max(mw - 1, 1).bit_length()
            payload = np.asarray(pay_d[:, :min(mw, CHUNK)])
            rowmap = np.arange(nfull)
        else:
            freq, cum, nsym, alphabets = _chunk_stats(chunks)
            sel = np.flatnonzero(nsym > 1)
            rowmap = np.full(nfull, -1)
            rowmap[sel] = np.arange(sel.size)
            if sel.size:
                payload, n_emit, states = _encode_kernel()(
                    jnp.asarray(chunks[sel]),
                    jnp.asarray(freq[sel], dtype=jnp.int32),
                    jnp.asarray(cum[sel], dtype=jnp.int32))
                payload = np.asarray(payload)
                n_emit = np.asarray(n_emit)
                states = np.asarray(states)
        assemble_ans0_wire(bw, freq, nsym, alphabets, n_emit, states,
                           payload, rowmap)
    if tail:
        enc = hans.ANSRangeEncoder(bw, 0)
        enc._encode_chunk(block[nfull * CHUNK:], bw)
    return count


CHUNK1 = CHUNK << 8  # 4 MiB order-1 wire chunks (ANSRangeEncoder.java:126)


def ans1_encode(block: np.ndarray, bw: BitWriter) -> int:
    """Drop-in for ANSRangeEncoder(order=1).encode with the scan on device.

    Host: per-chunk order-1 context histograms + exact per-row reference
    normalization (wire-identical headers) + bitstream assembly.
    Device: bigram table lookup + the 4-lane rANS scan + payload compaction
    (Pallas on TPU, XLA elsewhere).
    """
    import jax
    import jax.numpy as jnp
    block = np.asarray(block, dtype=np.uint8)
    count = block.size
    if count <= 32:
        bw.write_bytes(block.tobytes())
        return count
    nfull = count // CHUNK1
    tail = count - nfull * CHUNK1
    if nfull > 0:
        chunks = block[:nfull * CHUNK1].reshape(nfull, CHUNK1)
        scale = 1 << jans.LOG_RANGE1
        freq = np.zeros((nfull, 256, 256), dtype=np.int64)
        for i in range(nfull):
            h2 = hans._order1_histogram(chunks[i].astype(np.int64))
            freq[i] = eu.normalize_frequencies_batch(
                h2, h2.sum(axis=1), scale)
        cum = np.concatenate(
            [np.zeros((nfull, 256, 1), dtype=np.int64),
             np.cumsum(freq, axis=2)[:, :, :-1]], axis=2)
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            from .ans_pallas import ans1_encode_chunks_pallas
            pay_d, cnt_d, st_d = ans1_encode_chunks_pallas(
                jnp.asarray(chunks), jnp.asarray(freq, jnp.int32),
                jnp.asarray(cum, jnp.int32))
            payload = np.asarray(pay_d)
            tile_counts = np.asarray(cnt_d)     # (N, CHUNK1//CHUNK, 128)
            states = np.asarray(st_d)
        else:
            pay_d, ne_d, st_d = jans.ans1_encode_chunks(
                jnp.asarray(chunks), jnp.asarray(freq, jnp.int32),
                jnp.asarray(cum, jnp.int32))
            payload = np.asarray(pay_d)
            n_emit = np.asarray(ne_d)
            states = np.asarray(st_d)
        for i in range(nfull):
            bw.write_bits(jans.LOG_RANGE1 - 8, 3)
            for k in range(256):
                alpha = np.flatnonzero(freq[i, k]).astype(np.int32)
                hans._write_freqs_header(bw, alpha, freq[i, k],
                                         jans.LOG_RANGE1)
            if on_tpu:
                # stitch per-16KiB-tile payload prefixes in tile order
                parts = []
                for t in range(CHUNK1 // CHUNK):
                    nw = int(tile_counts[i, t].sum())
                    parts.append(payload[i, t * CHUNK:t * CHUNK + nw])
                words = np.concatenate(parts)
            else:
                words = payload[i, :int(n_emit[i])]
            pay = words.astype(">u2").tobytes()
            eu.write_varint(bw, len(pay))
            for j in range(4):
                bw.write_bits(int(states[i, j]), 32)
            bw.write_bytes(pay)
    if tail:
        enc = hans.ANSRangeEncoder(bw, 1)
        enc._encode_chunk(block[nfull * CHUNK1:], bw)
    return count


def ans0_decode(count: int, br: BitReader) -> np.ndarray:
    """Drop-in for ANSRangeDecoder(order=0).decode with the scan on TPU."""
    import jax.numpy as jnp
    if count <= 32:
        return br.read_bytes(count)
    out = np.empty(count, dtype=np.uint8)
    nfull = count // CHUNK
    tail = count - nfull * CHUNK
    # stage 1 (host, sequential): parse per-chunk headers and slice payloads
    metas = []  # (start, freq, cum, states, payload_bytes) or (start, symbol)
    host_resume = None  # (first host chunk index, its already-read log range)
    for i in range(nfull):
        lr = 8 + br.read_bits(3)
        if lr != jans.LOG_RANGE:
            # valid streams may use any lr in [8,15]; the device kernel is
            # specialized to the default 12, so decode the rest on the host
            if not 8 <= lr <= 15:
                raise BitStreamError("invalid ANS range",
                                     BitStreamError.INVALID_STREAM)
            host_resume = (i, lr)
            break
        alpha, freqs = hans._read_freqs_header(br, lr)
        if len(alpha) <= 1:
            metas.append((i * CHUNK, int(alpha[0]) if len(alpha) else 0))
            continue
        sz = eu.read_varint(br)
        if sz >= hans.MAX_CHUNK_SIZE:
            raise BitStreamError("invalid ANS chunk size",
                                 BitStreamError.INVALID_STREAM)
        states = [br.read_bits(32) for _ in range(4)]
        pay = br.read_bytes(sz)
        metas.append((i * CHUNK, freqs, states, pay))
    full = [m for m in metas if len(m) == 4]
    if full:
        maxp = max(len(m[3]) for m in full) + 8
        pay = np.zeros((len(full), maxp), dtype=np.uint8)
        freq = np.zeros((len(full), 256), dtype=np.int64)
        states = np.zeros((len(full), 4), dtype=np.int64)
        for k, m in enumerate(full):
            pay[k, :len(m[3])] = m[3]
            freq[k] = m[1]
            states[k] = m[2]
        cum = np.concatenate([np.zeros((len(full), 1), dtype=np.int64),
                              np.cumsum(freq, axis=1)[:, :-1]], axis=1)
        import jax
        if jax.default_backend() == "tpu":
            from .ans_pallas import ans0_decode_chunks_pallas as _dec
        else:
            _dec = jans.ans0_decode_chunks
        res, consumed = _dec(
            jnp.asarray(pay), jnp.asarray(states, dtype=jnp.int32),
            jnp.asarray(freq, dtype=jnp.int32), jnp.asarray(cum, dtype=jnp.int32))
        res = np.asarray(res)
        consumed = np.asarray(consumed)
        for k, m in enumerate(full):
            if int(consumed[k]) != len(m[3]):
                raise BitStreamError("ANS payload size mismatch (TPU decode)",
                                     BitStreamError.INVALID_STREAM)
            out[m[0]:m[0] + CHUNK] = res[k]
    for m in metas:
        if len(m) == 2:
            out[m[0]:m[0] + CHUNK] = m[1]
    if host_resume is not None:
        i0, lr0 = host_resume
        dec = hans.ANSRangeDecoder(br, 0)
        dec._decode_chunk(out, i0 * CHUNK, min((i0 + 1) * CHUNK, count),
                          br, lr=lr0)
        for i in range(i0 + 1, nfull):
            dec._decode_chunk(out, i * CHUNK, (i + 1) * CHUNK, br)
        if tail:
            dec._decode_chunk(out, nfull * CHUNK, count, br)
        return out
    if tail:
        dec = hans.ANSRangeDecoder(br, 0)
        dec._decode_chunk(out, nfull * CHUNK, count, br)
    return out
