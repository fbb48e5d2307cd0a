"""Pallas TPU kernel for canonical Huffman decoding (wire format of
entropy/huffman.py, HuffmanDecoder.java:42-605 semantics).

Decode is bit-serial per stream (each code's length gates the next read),
so the kernel walks the 4096 symbols of each 16 KiB chunk's four streams
sequentially, 64 chunks in lockstep (one chunk per sublane row, stream j
in lane j).  Instead of the reference's 4096-entry (len, symbol) LUT —
whose per-lane gather Mosaic cannot do — the canonical structure is used
directly:

  v        = next 12 bits (MSB-first window)
  L        = 1 + #{l in 1..12 : boundary[l] <= v}
             boundary[l] = sum_{k<=l} count[k] << (12-k)   (monotone ->
             4-probe binary search over 12 packed entries)
  rank     = adj[L] + (v >> (12 - L)),   adj[L] = offset[L] - first[L]
  symbol   = perm[rank]   (canonical order: symbols sorted by (len, value))

The kernel emits ranks (packed 4 per output word, stream-major quarters);
the perm lookup runs afterwards as one wide chunk-major pass
(ops/ans_pallas._lookup).  Stream payloads stream through a 32-word
VMEM sub-window per stream at its exact word pointer — the four streams
interleaved into one 128-lane tile per chunk row — refilled every 32
symbols by scalar-indexed row reads + one dynamic rotate.  Final bit
positions are returned so the host can verify the per-stream bit counts
(the reference's stream-length mismatch check).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ans_pallas import _interp, _lookup

MAX_SYMBOL_SIZE = 12
CHUNK = 16384
FRAG = CHUNK // 4                  # symbols per stream
_ROWS = 64                         # chunks per grid cell
# per-stream payload capacity: 4096 syms * 12 bits = 6144 bytes = 3072
# 16-bit words; stored per chunk as 4 stream segments of 25 rows x 128
# words (3200 words: >= 3072 plus slack so refill reads stay in bounds)
_PAY_ROWS_PER_STREAM = 26          # one extra row: refills read 2 rows
_PAY_ROWS = 4 * _PAY_ROWS_PER_STREAM


def _decode_kernel(bnd_ref, adj_ref, st_ref, pay_ref, out_ref, used_ref,
                   w0, bit_scr, rank_scr, pack_scr, wb_scr):
    rows = _ROWS
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    sj = jnp.bitwise_and(lane, 3)

    bit_scr[:] = st_ref[:]         # starting bit positions (normally 0)
    bnd = bnd_ref[:]
    adj = adj_ref[:]

    def outer(o, _):
        # ---- refill: stream j of row q gets the 32 words at its EXACT
        # word pointer wp = bitpos >> 4, in lanes [32j, 32j+32) of the
        # single window plane.  Alignment is one dynamic rotate of the
        # 2-row payload span — no sub-tile selects, no quantization slack.
        bp0 = bit_scr[:]
        wp_all = jnp.right_shift(bp0, 4)                      # (rows, 128)

        @pl.when(jnp.bitwise_and(o, 1) == 0)
        def _refill():
            wb_scr[:] = wp_all
            cap = (_PAY_ROWS_PER_STREAM - 2) * 128 + 96
            for q in range(rows):
                for j in range(4):
                    wp = jnp.minimum(wp_all[q, j], cap)
                    r0 = j * _PAY_ROWS_PER_STREAM + jnp.right_shift(wp, 7)
                    col = jnp.bitwise_and(wp, 127)
                    ra = pay_ref[q, pl.ds(r0, 1), :]          # (1, 128)
                    rb = pay_ref[q, pl.ds(r0 + 1, 1), :]
                    sh = jnp.bitwise_and(128 - col, 127)
                    rolled = jnp.where(
                        lane[:1] < 128 - col,
                        pltpu.roll(ra, sh, 1), pltpu.roll(rb, sh, 1))
                    w0[q, pl.ds(32 * j, 32)] = rolled[0, :32]

        def inner(t, _):
            bp = bit_scr[:]
            loff = jnp.right_shift(bp, 4) - wb_scr[:]         # 0..24
            idx = jnp.left_shift(sj, 5) + loff
            wa = jnp.take_along_axis(w0[:], jnp.bitwise_and(idx, 127), axis=1)
            wbv = jnp.take_along_axis(w0[:], jnp.bitwise_and(idx + 1, 127),
                                      axis=1)
            v32 = jnp.bitwise_or(jnp.left_shift(wa, 16), wbv)
            v = jnp.bitwise_and(
                jnp.right_shift(v32, 20 - jnp.bitwise_and(bp, 15)), 0xFFF)
            # L-1 = #{l: boundary[l] <= v} over 12 packed (2/word) entries
            g = jnp.zeros((rows, 128), jnp.int32)
            for step in (8, 4, 2, 1):
                probe = g + step
                idx = probe - 1
                wv = jnp.take_along_axis(bnd, jnp.right_shift(idx, 1), axis=1)
                pv = jnp.bitwise_and(
                    jnp.right_shift(wv, jnp.left_shift(
                        jnp.bitwise_and(idx, 1), 4)), 0xFFFF)
                g = jnp.where((pv <= v) & (probe <= 12), probe, g)
            L = g + 1
            av = jnp.take_along_axis(adj, L, axis=1) - 8192
            rank = av + jnp.right_shift(v, 12 - L)
            bit_scr[:] = bp + jnp.where(lane < 4, L, 0)
            # accumulate this step's 4 ranks at lanes 4*(t + 16*(o&1)) + j
            q32 = jnp.bitwise_and(o * 16 + t, 31)
            keep = jnp.right_shift(lane, 2) == q32
            srep = jnp.take_along_axis(rank, jnp.bitwise_and(lane, 3), axis=1)
            rank_scr[:] = jnp.where(keep, srep, rank_scr[:])
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=16)

        @pl.when(jnp.bitwise_and(o, 1) == 1)
        def _():
            # rank_scr lane 4q+j = stream j's symbol (sb + q), sb = 32*(o>>1).
            # Pack 4 consecutive symbols of one stream per word: valid at
            # lanes 16m+j -> stream j, symbols sb+4m .. sb+4m+3.
            r = jnp.bitwise_and(rank_scr[:], 255)
            p = (r
                 | jnp.left_shift(pltpu.roll(r, 124, 1), 8)
                 | jnp.left_shift(pltpu.roll(r, 120, 1), 16)
                 | jnp.left_shift(pltpu.roll(r, 116, 1), 24))
            # scatter the 8 words per stream into pack_scr's stream tiles:
            # tile j lane d in [8k, 8k+8) <- p lane 16*(d-8k)+j, k = (o>>1)&15
            k = jnp.bitwise_and(jnp.right_shift(o, 1), 15)
            d = jnp.bitwise_and(lane, 127)
            hit = jnp.right_shift(d, 3) == k
            m = jnp.bitwise_and(d, 7)
            for j in range(4):
                src = jnp.bitwise_and(16 * m + j, 127)
                upd = jnp.take_along_axis(p, src, axis=1)
                cur = pack_scr[:, j * 128:(j + 1) * 128]
                pack_scr[:, j * 128:(j + 1) * 128] = jnp.where(hit, upd, cur)

            @pl.when(jnp.bitwise_and(o, 31) == 31)
            def _():
                tt = jnp.right_shift(o, 5)                    # 0..7
                for j in range(4):
                    out_ref[:, pl.ds(j * 1024 + tt * 128, 128)] = \
                        pack_scr[:, j * 128:(j + 1) * 128]
        return 0

    jax.lax.fori_loop(0, 256, outer, 0)
    used_ref[:] = bit_scr[:]


def _decode(bnd, adj, st0, pay):
    n = bnd.shape[0]
    r = _ROWS
    return pl.pallas_call(
        _decode_kernel,
        interpret=_interp(),
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((r, _PAY_ROWS, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((r, CHUNK // 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, CHUNK // 4), jnp.int32),
            jax.ShapeDtypeStruct((n, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((r, 128), jnp.int32),   # window plane
            pltpu.VMEM((r, 128), jnp.int32),   # bit positions
            pltpu.VMEM((r, 128), jnp.int32),   # per-32-step rank buffer
            pltpu.VMEM((r, 512), jnp.int32),   # 4 output tiles (per stream)
            pltpu.VMEM((r, 128), jnp.int32),   # refill-time window bases
        ],
    )(bnd, adj, st0, pay)


def build_decode_tables(sizes_list, alphabets):
    """Per-chunk canonical decode tables.

    Args: lists (len N) of per-chunk arrays: sizes (256 lengths), alphabet
    (present symbols ascending).
    Returns (bnd (N,128) i32, adj (N,128) i32, perm (N,256) i32) numpy.
    """
    n = len(alphabets)
    bnd = np.zeros((n, 128), np.int32)
    adj = np.zeros((n, 128), np.int32)
    perm = np.zeros((n, 256), np.int32)
    for i in range(n):
        alpha = np.asarray(alphabets[i], np.int64)
        ln = np.asarray(sizes_list[i], np.int64)[alpha]
        order = np.lexsort((alpha, ln))                 # by (len, value)
        sym_sorted = alpha[order]
        len_sorted = ln[order]
        perm[i, :len(alpha)] = sym_sorted
        count = np.bincount(len_sorted, minlength=13)[:13]
        boundary = np.cumsum(count[1:] << (12 - np.arange(1, 13)))
        offset = np.concatenate([[0], np.cumsum(count[1:])])[:12]
        prev_b = np.concatenate([[0], boundary[:-1]])
        first = prev_b >> (12 - np.arange(1, 13))
        adjv = offset - first + 8192
        words = np.zeros(6, np.int64)
        for L in range(12):
            words[L >> 1] |= int(boundary[L]) << (16 * (L & 1))
        bnd[i, :6] = words.astype(np.int32)
        adj[i, 1:13] = adjv.astype(np.int32)
    return bnd, adj, perm


@jax.jit
def huffman_decode_chunks_pallas(pay: jax.Array, bnd: jax.Array,
                                 adj: jax.Array, perm: jax.Array):
    """Decode full 16 KiB chunks.  pay (N, P) uint8: per chunk the 4
    streams' byte-aligned payloads concatenated at _PAY_ROWS_PER_STREAM*256
    byte strides.  Returns (symbols (N, 16384) uint8, used_bits (N, 4))."""
    n0 = pay.shape[0]
    npad = ((max(n0, _ROWS) + _ROWS - 1) // _ROWS) * _ROWS
    maxb = _PAY_ROWS * 256
    payb = jnp.zeros((npad, maxb), jnp.uint8)
    payb = jax.lax.dynamic_update_slice(payb, pay[:, :maxb], (0, 0))
    payb = payb.astype(jnp.int32).reshape(npad, maxb // 2, 2)
    payw = jnp.left_shift(payb[:, :, 0], 8) | payb[:, :, 1]  # BE 16-bit words
    payw = payw.reshape(npad, _PAY_ROWS, 128)
    if npad != n0:
        padr = ((0, npad - n0), (0, 0))
        bnd = jnp.pad(bnd, padr, mode="edge")
        adj = jnp.pad(adj, padr, mode="edge")
        perm = jnp.pad(perm, padr, mode="edge")
    st0 = jnp.zeros((npad, 128), jnp.int32)
    packed, used = _decode(bnd.astype(jnp.int32), adj.astype(jnp.int32),
                           st0, payw)
    shifts = jnp.array([0, 8, 16, 24], jnp.int32)
    ranks = jnp.bitwise_and(
        jnp.right_shift(packed[:, :, None], shifts[None, None, :]), 255)
    ranks = ranks.reshape(npad, CHUNK)
    syms = _lookup(ranks.astype(jnp.int32), perm.astype(jnp.int32))
    return syms[:n0].astype(jnp.uint8), used[:n0, :4]
