"""Pallas TPU kernels for the 4-state interleaved rANS coder (order 0).

Wire behavior identical to ops/ans.py (and the numpy coder entropy/ans.py):
4 interleaved states per 16 KiB chunk, logRange 12, 16-bit renormalization
(ANSRangeEncoder.java:337-407 semantics) — but engineered for the TPU:

  * encode (`ans0_encode_chunks_fused`): ONE fused lookup+scan kernel with
    lanes = chunks (the four state updates serialized into substeps), table
    gathers and all relayout transposes in VMEM, emissions leaving in
    per-chunk wire order as u16 words + u8 flags; then the MXU
    stable-partition compaction kernel.  `ans0_encode_device` adds the
    on-device statistics (nibble-matmul histogram + exact normalization in
    VMEM).  See docs/kernels.md for the design derivation.
  * decode: one chunk per sublane row, 4 states in lanes, binary-search
    symbol resolution over per-row packed bounds, windowed payload
    streaming.
  * `_scan`/`_lookup` (step-major 4-lane layouts) remain for the order-1
    path and the rank/perm post-pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ANS_TOP = 1 << 15
LOG_RANGE = 12
SCALE = 1 << LOG_RANGE
CHUNK = 16384


def _interp() -> bool:
    """Run the Pallas kernels in interpret mode (CPU tests of the kernel
    logic on tiny shapes; see tests/test_pallas_interpret.py)."""
    import os
    return os.environ.get("KANZI_TPU_PALLAS_INTERPRET", "0") == "1"


# ---------------------------------------------------------------------------
# kernel 1: packed (freq | cum<<12) per-position lookup, 8 chunks per cell
# ---------------------------------------------------------------------------

def _lookup_kernel(syms_ref, tbl_ref, out_ref):
    t_lo = tbl_ref[:, :128]
    t_hi = tbl_ref[:, 128:]
    c = syms_ref.shape[1]
    for j in range(c // 128):
        ix = syms_ref[:, j * 128:(j + 1) * 128]
        ixm = jnp.bitwise_and(ix, 127)
        lo = jnp.take_along_axis(t_lo, ixm, axis=1)
        hi = jnp.take_along_axis(t_hi, ixm, axis=1)
        out_ref[:, j * 128:(j + 1) * 128] = jnp.where(ix < 128, lo, hi)


def _lookup(syms_i32: jax.Array, tables: jax.Array) -> jax.Array:
    """syms (N, C) int32 in [0,256), tables (N, 256) int32 -> (N, C) int32."""
    n, c = syms_i32.shape
    return pl.pallas_call(
        _lookup_kernel,
        interpret=_interp(),
        grid=(n // 8,),
        in_specs=[
            pl.BlockSpec((8, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.int32),
    )(syms_i32, tables)


# ---------------------------------------------------------------------------
# kernel 2: the sequential rANS state scan, all lanes in lockstep
# ---------------------------------------------------------------------------

def _scan_kernel(lk_ref, emit_ref, st_out_ref, st_ref, *, lr: int = LOG_RANGE):
    sb = lk_ref.shape[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        st_ref[:] = jnp.full_like(st_ref, ANS_TOP)

    def body(i, _):
        lk = lk_ref[i]                         # (R, 128) packed f | cum<<lr
        f = jnp.bitwise_and(lk, (1 << lr) - 1)
        cm = jnp.right_shift(lk, lr)
        st = st_ref[:]
        # emit when st >= ((ANS_TOP >> lr) << 16) * f  <=>  st >> (31-lr) >= f
        em = jnp.right_shift(st, 31 - lr) >= f
        val = jnp.bitwise_and(st, 0xFFFF)
        st1 = jnp.where(em, jnp.right_shift(st, 16), st)
        # exact st1 // f: f32 estimate + one residual correction
        q = (st1.astype(jnp.float32) / f.astype(jnp.float32)).astype(jnp.int32)
        r = st1 - q * f
        q = q + jnp.where(r < 0, -1, 0) + jnp.where(r >= f, 1, 0)
        r = st1 - q * f
        st_ref[:] = jnp.left_shift(q, lr) + r + cm
        emit_ref[i] = jnp.where(em, jnp.bitwise_or(jnp.left_shift(em.astype(jnp.int32), 16), val), 0)
        return 0

    jax.lax.fori_loop(0, sb, body, 0)
    st_out_ref[:] = st_ref[:]


def _scan(lk: jax.Array, step_block: int = 128, lane_block: int = 16,
          lr: int = LOG_RANGE):
    """lk (S, R, 128) int32 -> emit (S, R, 128) int32, states (R, 128).

    Grid = (lane tiles, step blocks); steps iterate fastest so the per-tile
    states persist in VMEM scratch across the sequential walk.
    """
    s, r, _ = lk.shape
    rb = min(lane_block, r)
    emit, st = pl.pallas_call(
        functools.partial(_scan_kernel, lr=lr),
        interpret=_interp(),
        grid=(r // rb, s // step_block),
        in_specs=[pl.BlockSpec((step_block, rb, 128), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((step_block, rb, 128), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, r, 128), jnp.int32),
            jax.ShapeDtypeStruct((r, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rb, 128), jnp.int32)],
    )(lk)
    return emit, st


# ---------------------------------------------------------------------------
# fused substep pipeline (order 0): lanes = chunks, 16384 substeps
# ---------------------------------------------------------------------------
#
# The wire payload orders emissions by the original byte index b; the
# interleaved coder processes b = C-1 .. 0 (4 states, state j owning bytes
# with b % 4 == 3 - j).  Serializing the four per-step state updates into
# one substep each (t = C-1-b, state register u = t & 3) makes the lane
# dimension pure chunks, so
#   * the lookup kernel's (chunks, bytes) -> (substeps, chunks) relayout is
#     one lane-flip gather + one 128x128 transpose per tile, fused into the
#     lookup itself (no XLA transpose pass, no packed-i32 round trip), and
#   * emissions leave the scan already in per-chunk wire order: accumulate
#     128 substeps in VMEM, transpose + lane-flip each (128,128) tile, and
#     the scan's output IS the compaction kernel's input (the old emit ->
#     layout -> compact 2 GiB HBM round trip disappears).

def _scan_sub_fused_kernel(syms_ref, tbl_ref, wv_ref, wf_ref, st_out_ref,
                           st_scr, e_scr, lk_scr, *, lr: int = LOG_RANGE):
    rb = lk_scr.shape[1]
    rev = 127 - jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

    @pl.when(pl.program_id(1) == 0)
    def _():
        st_scr[:] = jnp.full_like(st_scr, ANS_TOP)

    # ---- in-VMEM lookup + relayout: the lk array never touches HBM
    for r in range(rb):
        sl = slice(r * 128, (r + 1) * 128)
        ix = syms_ref[sl, :].astype(jnp.int32)
        ixf = jnp.take_along_axis(ix, rev, axis=1)        # lane dt <- 127-dt
        ixm = jnp.bitwise_and(ixf, 127)
        lo = jnp.take_along_axis(tbl_ref[sl, :128], ixm, axis=1)
        hi = jnp.take_along_axis(tbl_ref[sl, 128:], ixm, axis=1)
        lk_scr[:, r, :] = jnp.where(ixf < 128, lo, hi).T

    def quad(qi, _):
        for u in range(4):
            t = qi * 4 + u
            lk = lk_scr[t]                                # (rb, 128)
            f = jnp.bitwise_and(lk, (1 << lr) - 1)
            cm = jnp.right_shift(lk, lr)
            st = st_scr[u]
            em = jnp.right_shift(st, 31 - lr) >= f
            val = jnp.bitwise_and(st, 0xFFFF)
            st1 = jnp.where(em, jnp.right_shift(st, 16), st)
            q = (st1.astype(jnp.float32) / f.astype(jnp.float32)
                 ).astype(jnp.int32)
            r = st1 - q * f
            q = q + jnp.where(r < 0, -1, 0) + jnp.where(r >= f, 1, 0)
            r = st1 - q * f
            st_scr[u] = jnp.left_shift(q, lr) + r + cm
            e_scr[pl.ds(t, 1)] = jnp.where(
                em, jnp.bitwise_or(0x10000, val), 0)[None]
        return 0

    jax.lax.fori_loop(0, 32, quad, 0)
    for r in range(rb):
        tile = e_scr[:, r, :].T                           # (chunks, substeps)
        t32 = jnp.take_along_axis(tile, rev, axis=1)
        sl = slice(r * 128, (r + 1) * 128)
        wv_ref[sl, :] = jnp.bitwise_and(t32, 0xFFFF).astype(jnp.uint16)
        wf_ref[sl, :] = jnp.right_shift(t32, 16).astype(jnp.uint8)
    st_out_ref[:] = st_scr[:]


def _scan_sub_fused(chunks_u8: jax.Array, tables: jax.Array, rb: int = 8,
                    lr: int = LOG_RANGE):
    """Fused lookup+scan: chunks (N, C) uint8, tables (N, 256) int32
    packed (f | cum<<lr) -> wire-order emissions split as wv (N, C) uint16
    words + wf (N, C) uint8 emit flags, st (4, N/128, 128).  One kernel;
    the (C, N) lookup array stays in VMEM."""
    n, c = chunks_u8.shape
    wv, wf, st = pl.pallas_call(
        functools.partial(_scan_sub_fused_kernel, lr=lr),
        interpret=_interp(),
        grid=(n // (rb * 128), c // 128),
        in_specs=[
            pl.BlockSpec((rb * 128, 128),
                         lambda i, j: (i, c // 128 - 1 - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb * 128, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb * 128, 128),
                         lambda i, j: (i, c // 128 - 1 - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb * 128, 128),
                         lambda i, j: (i, c // 128 - 1 - j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, rb, 128), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.uint16),
            jax.ShapeDtypeStruct((n, c), jnp.uint8),
            jax.ShapeDtypeStruct((4, n // 128, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, rb, 128), jnp.int32),      # states st0..st3
            pltpu.VMEM((128, rb, 128), jnp.int32),    # emission tile buffer
            pltpu.VMEM((128, rb, 128), jnp.int32),    # lookup tile buffer
        ],
    )(chunks_u8, tables)
    return wv, wf, st


@jax.jit
def ans0_encode_chunks_fused(chunks: jax.Array, freq: jax.Array,
                             cum: jax.Array):
    """Fused-substep encode of full 16 KiB chunks — wire-identical to
    ans0_encode_chunks_pallas but with the transposes folded into the
    lookup/scan kernels (lanes = chunks).  N must allow padding to 1024."""
    n0, c = chunks.shape
    npad = ((max(n0, 1024) + 1023) // 1024) * 1024
    if npad != n0:
        pad = ((0, npad - n0), (0, 0))
        chunks = jnp.pad(chunks, pad, mode="edge")
        freq = jnp.pad(freq, pad, mode="edge")
        cum = jnp.pad(cum, pad, mode="edge")
    n = npad
    freq_cap = jnp.minimum(freq, SCALE - 1)
    tables = jnp.bitwise_or(freq_cap,
                            jnp.left_shift(cum, LOG_RANGE)).astype(jnp.int32)
    wv, wf, st = _scan_sub_fused(chunks, tables)
    # state register u holds wire state column u (st0..st3)
    states = st.reshape(4, n).T.astype(jnp.int32)
    pay, cnt = _compact2(wv.reshape(n, c // 128, 128),
                         wf.reshape(n, c // 128, 128))
    payload = pay.reshape(n, c)
    n_emit = jnp.sum(cnt, axis=1)
    return payload[:n0], n_emit[:n0], states[:n0]


# ---------------------------------------------------------------------------
# device-side chunk statistics: histogram + exact normalization
# ---------------------------------------------------------------------------

def _hist16(chunks: jax.Array) -> jax.Array:
    """Per-chunk byte histograms via nibble decomposition: hist(hi, lo) =
    OH_hi^T @ OH_lo — 32 one-hot lanes per byte instead of 256, with the
    256-way outer product on the MXU.  Counts <= 16384 are exact in f32."""
    xi = chunks.astype(jnp.int32)
    oh_hi = jax.nn.one_hot(jnp.right_shift(xi, 4), 16, dtype=jnp.bfloat16)
    oh_lo = jax.nn.one_hot(jnp.bitwise_and(xi, 15), 16, dtype=jnp.bfloat16)
    c = jnp.einsum("nph,npl->nhl", oh_hi, oh_lo,
                   preferred_element_type=jnp.float32)
    return c.reshape(chunks.shape[0], 256).astype(jnp.int32)


def _normalize_freqs_jax(hist: jax.Array, total_shift: int, scale: int):
    """jnp port of entropy.utils.normalize_frequencies_batch for rows that
    sum to exactly 1 << total_shift (full chunks) — integer-exact on TPU
    (the power-of-two total turns the half-up divide into a shift)."""
    total = 1 << total_shift
    nz = hist > 0
    asize = jnp.sum(nz.astype(jnp.int32), axis=1)
    sf = hist * scale
    scaled = jnp.where(sf <= total,
                       1, jnp.right_shift(sf + (total >> 1), total_shift))
    scaled = jnp.where(nz, scaled, 0)
    idx_max = jnp.argmax(scaled, axis=1).astype(jnp.int32)   # first max
    oh_max = (jax.lax.broadcasted_iota(jnp.int32, scaled.shape, 1)
              == idx_max[:, None])
    sum_scaled = jnp.sum(scaled, axis=1)
    f = scaled
    single = asize == 1
    f = jnp.where(single[:, None], jnp.where(nz, scale, 0), f)
    active = (~single) & (sum_scaled != scale)
    delta = sum_scaled - scale
    err_thr = jnp.right_shift(jnp.sum(scaled * oh_max, axis=1), 4)
    small = active & (jnp.abs(delta) <= err_thr)
    f = f - jnp.where(small[:, None] & oh_max, delta[:, None], 0)
    big = active & ~small
    neg = big & (delta < 0)
    pos = big & (delta > 0)
    f = f + jnp.where(neg[:, None] & oh_max, err_thr[:, None], 0)
    f = f - jnp.where(pos[:, None] & oh_max, err_thr[:, None], 0)
    d = jnp.where(neg, delta + err_thr, jnp.where(pos, delta - err_thr, 0))
    inc = jnp.where(d > 0, -1, 1).astype(jnp.int32)
    d = jnp.abs(d)
    live = big
    for _ in range(5):  # bounded error-spreading rounds, symbol order
        elig = nz & (f > 2) & live[:, None]
        cnt = jnp.cumsum(elig.astype(jnp.int32), axis=1)
        adj = elig & (cnt <= d[:, None])
        nadj = jnp.sum(adj.astype(jnp.int32), axis=1)
        f = f + adj * inc[:, None]
        d = d - jnp.minimum(nadj, d)
        live = live & (d > 0) & (nadj > 0)
    fmax = jnp.sum(f * oh_max, axis=1)
    f = jnp.where(big[:, None] & oh_max,
                  jnp.maximum(fmax - d, 1)[:, None], f)
    return f


# ---------------------------------------------------------------------------
# kernel: exact normalization in VMEM (Pallas port of _normalize_freqs_jax;
# the XLA version materializes ~40 (N,256) intermediates to HBM, this one
# keeps the whole per-row pipeline in registers)
# ---------------------------------------------------------------------------

def _norm_kernel(hist_ref, out_ref, *, total_shift: int, scale: int):
    rows = hist_ref.shape[0]
    total = 1 << total_shift
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

    def reduce_sum(lo, hi):
        return (jnp.sum(lo, axis=1, keepdims=True)
                + jnp.sum(hi, axis=1, keepdims=True))

    def cumsum_pair(lo, hi):
        def cs(x):
            for s in (1, 2, 4, 8, 16, 32, 64):
                x = x + jnp.where(lane >= s, pltpu.roll(x, s, 1), 0)
            return x
        clo = cs(lo)
        chi = cs(hi) + clo[:, 127:128]
        return clo, chi

    def first_argmax(lo, hi):
        m = jnp.maximum(jnp.max(lo, axis=1, keepdims=True),
                        jnp.max(hi, axis=1, keepdims=True))
        ilo = jnp.min(jnp.where(lo == m, lane, 4096), axis=1, keepdims=True)
        ihi = jnp.min(jnp.where(hi == m, lane + 128, 4096), axis=1,
                      keepdims=True)
        return m, jnp.minimum(ilo, ihi)

    h_lo = hist_ref[:, :128]
    h_hi = hist_ref[:, 128:]

    def norm_half(h, lane_g):
        nz = h > 0
        sf = h * scale
        scaled = jnp.where(sf <= total, 1,
                           jnp.right_shift(sf + (total >> 1), total_shift))
        return nz, jnp.where(nz, scaled, 0)

    nz_lo, f_lo = norm_half(h_lo, lane)
    nz_hi, f_hi = norm_half(h_hi, lane + 128)
    asize = reduce_sum(nz_lo.astype(jnp.int32), nz_hi.astype(jnp.int32))
    mval, imax = first_argmax(f_lo, f_hi)
    om_lo = (lane == imax)
    om_hi = (lane + 128 == imax)
    sum_scaled = reduce_sum(f_lo, f_hi)

    single = asize == 1
    f_lo = jnp.where(single & nz_lo, scale, f_lo)
    f_hi = jnp.where(single & nz_hi, scale, f_hi)
    active = (~single) & (sum_scaled != scale)
    delta = sum_scaled - scale
    err_thr = jnp.right_shift(mval, 4)
    small = active & (jnp.abs(delta) <= err_thr)
    f_lo = f_lo - jnp.where(small & om_lo, delta, 0)
    f_hi = f_hi - jnp.where(small & om_hi, delta, 0)
    big = active & ~small
    neg = big & (delta < 0)
    pos = big & (delta > 0)
    bump = jnp.where(neg, err_thr, jnp.where(pos, -err_thr, 0))
    f_lo = f_lo + jnp.where(big & om_lo, bump, 0)
    f_hi = f_hi + jnp.where(big & om_hi, bump, 0)
    d = jnp.where(neg, delta + err_thr, jnp.where(pos, delta - err_thr, 0))
    inc = jnp.where(d > 0, -1, 1)
    d = jnp.abs(d)
    live = big
    for _ in range(5):   # bounded error-spreading rounds, symbol order
        elig_lo = nz_lo & (f_lo > 2) & live
        elig_hi = nz_hi & (f_hi > 2) & live
        c_lo, c_hi = cumsum_pair(elig_lo.astype(jnp.int32),
                                 elig_hi.astype(jnp.int32))
        adj_lo = elig_lo & (c_lo <= d)
        adj_hi = elig_hi & (c_hi <= d)
        nadj = reduce_sum(adj_lo.astype(jnp.int32), adj_hi.astype(jnp.int32))
        f_lo = f_lo + jnp.where(adj_lo, inc, 0)
        f_hi = f_hi + jnp.where(adj_hi, inc, 0)
        d = d - jnp.minimum(nadj, d)
        live = live & (d > 0) & (nadj > 0)
    fmax = (jnp.sum(jnp.where(om_lo, f_lo, 0), axis=1, keepdims=True)
            + jnp.sum(jnp.where(om_hi, f_hi, 0), axis=1, keepdims=True))
    fin = jnp.maximum(fmax - d, 1)
    f_lo = jnp.where(big & om_lo, fin, f_lo)
    f_hi = jnp.where(big & om_hi, fin, f_hi)
    out_ref[:, :128] = f_lo
    out_ref[:, 128:] = f_hi


def _normalize_freqs_pallas(hist: jax.Array, total_shift: int, scale: int,
                            rows_per_cell: int = 256) -> jax.Array:
    """Pallas version of _normalize_freqs_jax (identical results for rows
    summing to exactly 1 << total_shift)."""
    n = hist.shape[0]
    rb = min(rows_per_cell, n)
    return pl.pallas_call(
        functools.partial(_norm_kernel, total_shift=total_shift, scale=scale),
        interpret=_interp(),
        grid=(n // rb,),
        in_specs=[pl.BlockSpec((rb, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rb, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 256), jnp.int32),
    )(hist)


@jax.jit
def ans0_encode_device(chunks: jax.Array):
    """Fully device-resident ANS0 stage-2 encode of full 16 KiB chunks:
    histogram -> exact normalization -> table build -> scan -> compaction,
    one jit call.  Returns (freq (N,256) i32, payload (N,C) u16,
    n_emit (N) i32, states (N,4) i32)."""
    total_shift = CHUNK.bit_length() - 1
    hist = _hist16(chunks)
    if hist.shape[0] % 256 == 0:
        freq = _normalize_freqs_pallas(hist, total_shift, SCALE)
    else:
        freq = _normalize_freqs_jax(hist, total_shift, SCALE)
    cum = jnp.concatenate(
        [jnp.zeros((freq.shape[0], 1), jnp.int32),
         jnp.cumsum(freq, axis=1)[:, :-1].astype(jnp.int32)], axis=1)
    payload, n_emit, states = ans0_encode_chunks_fused(chunks, freq, cum)
    return freq, payload, n_emit, states


# ---------------------------------------------------------------------------
# kernel 3: stable partition (payload compaction) — replaces an XLA sort
# ---------------------------------------------------------------------------
#
# Per 16 KiB chunk, viewed as 128 blocks x 128 lanes of (flag<<16 | value):
#   1. in-block positions: pos = flag @ upper-triangular ones (MXU, exact)
#   2. per-block counts c and exclusive block offsets O (second small matmul)
#   3. gather table g[b, j] = index of the (j+1)-th flagged lane of block b,
#      found by 7-step binary search (each probe one lane-direction
#      tpu.dynamic_gather over the sorted pos row)
#   4. in-block compact: one gather with g
#   5. per-block rotate to the global lane offset O&127: one gather
#   6. tile placement: rows t0 = O>>7 and t0+1 selected by 0/1 matrices,
#      two batched MXU matmuls accumulate the disjoint contributions
# All gathers are lane-direction on (rows, 128) operands — the only gather
# form Mosaic supports — and every value fits exactly in f32.

def _compact_kernel(e_ref, out_ref, cnt_ref, *, u16_out: bool = False):
    ch, nb = e_ref.shape[0], e_ref.shape[1]
    t = e_ref[:].reshape(ch * nb, 128)
    _compact_body(jnp.right_shift(t, 16), jnp.bitwise_and(t, 0xFFFF),
                  out_ref, cnt_ref, ch, nb, u16_out)


def _compact2_kernel(v_ref, f_ref, out_ref, cnt_ref, *, u16_out: bool = True):
    ch, nb = v_ref.shape[0], v_ref.shape[1]
    _compact_body(f_ref[:].reshape(ch * nb, 128).astype(jnp.int32),
                  v_ref[:].reshape(ch * nb, 128).astype(jnp.int32),
                  out_ref, cnt_ref, ch, nb, u16_out)


def _compact_body(flag, val, out_ref, cnt_ref, ch, nb, u16_out):
    lane = jax.lax.broadcasted_iota(jnp.int32, (ch * nb, 128), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    triu = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            ).astype(jnp.float32)
    tril_strict = (jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
                   < jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
                   ).astype(jnp.float32)
    # 1. inclusive in-block cumsum of flags (values <= 128: exact in f32)
    pos = jnp.dot(flag.astype(jnp.float32), triu,
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    # 2. counts (lane-reduce) and exclusive offsets across each chunk's
    #    nb blocks, both in (ch, nb)-lane layout
    c = jnp.sum(flag.reshape(ch, nb, 128), axis=2)            # (ch, nb)
    off = jnp.dot(c.astype(jnp.float32), tril_strict,
                  preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt_ref[:] = c
    # 3. g[b, j] = #{k: pos[b, k] <= j} via binary search (pos sorted)
    j = lane
    g = jnp.zeros_like(j)
    for step in (64, 32, 16, 8, 4, 2, 1):
        probe = g + step
        pv = jnp.take_along_axis(pos, probe - 1, axis=1)
        g = jnp.where(pv <= j, probe, g)
    # 4. in-block compaction (lanes >= c_b are garbage, masked in step 5)
    comp = jnp.take_along_axis(val, jnp.minimum(g, 127), axis=1)
    # 5. rotate each block right by r = off & 127.  Per-row scalars are
    #    fetched from the (ch, 128) lane layout by repeating each chunk row
    #    128x and gathering lane b (the row's block id) — no cross-layout
    #    reshape needed.
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ch * nb, 128), 0)
    nb_shift = nb.bit_length() - 1
    bid = jnp.bitwise_and(row_iota, nb - 1)                   # row's block id
    # replicate each chunk's (nb,) offset/count rows to its nb block rows
    # with a 0/1 row-select matmul (pltpu.repeat tiles, it does not repeat
    # elementwise); values <= 16384 need the exact bf16x3 path
    sel = (jnp.right_shift(row_iota[:, :ch], nb_shift)
           == jax.lax.broadcasted_iota(jnp.int32, (ch * nb, ch), 1)
           ).astype(jnp.float32)                              # (ch*nb, ch)
    off_pad = jnp.pad(off, ((0, 0), (0, 128 - nb))).astype(jnp.float32)
    c_pad = jnp.pad(c, ((0, 0), (0, 128 - nb))).astype(jnp.float32)
    off_rows = jnp.dot(sel, off_pad,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    c_rows = jnp.dot(sel, c_pad,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    r_fl = jnp.bitwise_and(jnp.take_along_axis(off_rows, bid, axis=1), 127)
    cb = jnp.take_along_axis(c_rows, bid, axis=1)
    src = jnp.bitwise_and(lane - r_fl, 127)
    rolled = jnp.take_along_axis(comp, src, axis=1)
    valid = src < cb
    mask_a = valid & (lane >= r_fl)                           # stays in t0
    mask_b = valid & (lane < r_fl)                            # spills to t0+1
    # 6. place blocks into their destination 128-lane output tiles.  The
    # 16-bit payload values are split into two 8-bit planes so the MXU's
    # single-pass bf16 path is exact (0/1 selectors x <=255 values; the
    # f32 accumulator sees at most one nonzero contribution per element)
    # — 4 default-precision matmuls instead of 2 bf16x6 ones.
    t0 = jnp.right_shift(off, 7)                              # (ch, nb)
    ra = (sub[None] == t0[:, None, :]).astype(jnp.float32)    # (ch, t, b)
    rb = (sub[None] == (t0 + 1)[:, None, :]).astype(jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))

    def place(sel, vals):
        return jax.lax.dot_general(
            sel, vals.astype(jnp.float32).reshape(ch, nb, 128), dn,
            preferred_element_type=jnp.float32)

    r_hi = jnp.right_shift(rolled, 8)
    r_lo = jnp.bitwise_and(rolled, 255)
    out = ((place(ra, r_hi * mask_a) + place(rb, r_hi * mask_b)) * 256.0
           + place(ra, r_lo * mask_a) + place(rb, r_lo * mask_b))
    if u16_out:
        out_ref[:] = out.astype(jnp.int32).astype(jnp.uint16)
    else:
        out_ref[:] = out.astype(jnp.int32)


def _compact(e: jax.Array, chunks_per_cell: int = 8, u16_out: bool = False):
    """e (N, nb, 128) int32 (flag<<16|val), nb a power of two <= 128 ->
    payload (N, nb, 128) int32 — or uint16 with ``u16_out`` (halves the
    output write and skips the downstream conversion pass) — of flagged
    values stably compacted per chunk of nb*128 positions, plus counts
    (N, nb) int32."""
    n, nb, _ = e.shape
    ch = min(chunks_per_cell, n)
    out_dt = jnp.uint16 if u16_out else jnp.int32
    payload, cnt = pl.pallas_call(
        functools.partial(_compact_kernel, u16_out=u16_out),
        interpret=_interp(),
        grid=(n // ch,),
        in_specs=[pl.BlockSpec((ch, nb, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((ch, nb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb, 128), out_dt),
            jax.ShapeDtypeStruct((n, nb), jnp.int32),
        ],
    )(e)
    return payload, cnt


def _compact2(vals: jax.Array, flags: jax.Array, chunks_per_cell: int = 8):
    """Split-operand variant of _compact: vals (N, nb, 128) uint16 emission
    words, flags (N, nb, 128) uint8 emit markers -> (payload (N, nb, 128)
    uint16, counts (N, nb) int32).  Reads 3 bytes/position instead of 4."""
    n, nb, _ = vals.shape
    ch = min(chunks_per_cell, n)
    payload, cnt = pl.pallas_call(
        _compact2_kernel,
        interpret=_interp(),
        grid=(n // ch,),
        in_specs=[pl.BlockSpec((ch, nb, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=[
            pl.BlockSpec((ch, nb, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, nb), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nb, 128), jnp.uint16),
            jax.ShapeDtypeStruct((n, nb), jnp.int32),
        ],
    )(vals, flags)
    return payload, cnt


# ---------------------------------------------------------------------------
# kernel 4: rANS decode — 64 chunks per cell, one chunk per sublane row
# ---------------------------------------------------------------------------
#
# Decode is bit-serial per chunk (the next slot depends on the renormalized
# state), so the kernel walks the 4096 steps sequentially with 64 chunks in
# lockstep (rows).  Per-chunk 256-entry tables live in that chunk's 128-lane
# row (two operand halves), looked up with lane-direction dynamic_gather:
#   * symbol rank: ONE bucket lookup.  Slot space [0,4096) is cut into 256
#     buckets of 16 slots; bucket word = (rank at the bucket base) << 16 |
#     presence mask (bit j = "a dense bound equals 16b+j", j=1..15; the
#     bounds are strictly increasing so each value occurs at most once).
#     rank(slot) = (w >> 16) + popcount(w & ((2 << (slot & 15)) - 1)),
#     replacing the former coarse-rank + 4-probe binary search (5 gathers)
#     with 1 gather2 + a SWAR popcount.
#   * freq/cum: one gather into the packed (f | cum<<12) table
# Payload bytes stream through a tile-aligned VMEM window of three
# 128-word tiles per chunk, refilled every 32 steps by scalar-indexed row
# copies.  Tight bound: refill offset <= 127 words + <= 124 words consumed
# before the last inner step + 3-word lookahead = max index 254, so only
# tiles w0/w1 are ever read; w2 is deliberate slack kept for the
# speculative refill copy (reads one tile past the live window).  Decoded
# symbols are
# packed 4-per-word before the VMEM->HBM store, so a grid cell's output
# tile is 1 MiB instead of 4 MiB (fits scoped VMEM with double buffering
# at any batch size).

_DEC_ROWS = 64           # chunks per grid cell
_DEC_PAY_ROWS = 132      # 33 KiB of payload per chunk as 16-bit words
                         # (+2 rows of speculative window slack)


def _decode_kernel(tlo_ref, thi_ref, blo_ref, bhi_ref, st0_ref, pay_ref,
                   out_ref, used_ref,
                   st_scr, w0, w1, w2, ptr_scr, base_scr, sym_scr,
                   pack_scr):
    rows = _DEC_ROWS
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)

    st_scr[:] = st0_ref[:]
    ptr_scr[:] = jnp.zeros((rows, 128), jnp.int32)
    tlo = tlo_ref[:]
    thi = thi_ref[:]
    blo = blo_ref[:]          # bucket words (crs<<16 | mask), buckets 0..127
    bhi = bhi_ref[:]          # buckets 128..255

    def gather2(lo, hi, idx):
        g_lo = jnp.take_along_axis(lo, jnp.bitwise_and(idx, 127), axis=1)
        g_hi = jnp.take_along_axis(hi, jnp.bitwise_and(idx, 127), axis=1)
        return jnp.where(idx < 128, g_lo, g_hi)

    def outer(o, _):
        # ---- refill the per-chunk payload word windows (tile-aligned),
        # every other outer iteration.  Scalar-indexed row copies; measured
        # cheaper than a batched one-hot matmul (tiny-M batched dot_general
        # lowers to 64 serial MXU passes).
        @pl.when(jnp.bitwise_and(o, 1) == 0)
        def _():
            base = jnp.left_shift(jnp.right_shift(ptr_scr[:], 8), 8)
            base_scr[:] = base
            for q in range(rows):
                row = jnp.right_shift(base[q, 0], 8)
                w0[q, :] = pay_ref[q, pl.ds(row, 1), :][0]
                w1[q, :] = pay_ref[q, pl.ds(row + 1, 1), :][0]
                w2[q, :] = pay_ref[q, pl.ds(row + 2, 1), :][0]

        def inner(j, _):
            st = st_scr[:]
            slot = jnp.bitwise_and(st, SCALE - 1)
            w = gather2(blo, bhi, jnp.right_shift(slot, 4))
            v = jnp.bitwise_and(
                w, jnp.left_shift(2, jnp.bitwise_and(slot, 15)) - 1)
            v = v - jnp.bitwise_and(jnp.right_shift(v, 1), 0x5555)
            v = (jnp.bitwise_and(v, 0x3333)
                 + jnp.bitwise_and(jnp.right_shift(v, 2), 0x3333))
            v = jnp.bitwise_and(v + jnp.right_shift(v, 4), 0x0F0F)
            g = jnp.right_shift(w, 16) + jnp.bitwise_and(
                v + jnp.right_shift(v, 8), 0x1F)
            lk = gather2(tlo, thi, g)
            f = jnp.bitwise_and(lk, SCALE - 1)
            cm = jnp.right_shift(lk, LOG_RANGE)
            st1 = f * jnp.right_shift(st, LOG_RANGE) + slot - cm
            need = ((st1 < ANS_TOP) & (lane < 4)).astype(jnp.int32)
            # suffix-exclusive word offsets: lane 3 consumes first
            e = (pltpu.roll(need, 127, 1) + pltpu.roll(need, 126, 1)
                 + pltpu.roll(need, 125, 1))
            e = jnp.where(lane < 4, e, 0)
            # word-granular fetch: ptr counts bytes but is always even.
            # Each lane's word lies in one of 3 window tiles (offset < 128
            # words at refill + 128 consumed + 3 lookahead); select the
            # lane's tile, then one in-tile gather.
            local = jnp.right_shift(ptr_scr[:] - base_scr[:], 1) + e
            pair = jnp.right_shift(local, 7)                 # 0..2
            wa = jnp.where(pair == 0, w0[:],
                           jnp.where(pair == 1, w1[:], w2[:]))
            rd = jnp.take_along_axis(wa, jnp.bitwise_and(local, 127), axis=1)
            st2 = jnp.where(need == 1,
                            jnp.bitwise_or(jnp.left_shift(st1, 16), rd), st1)
            st_scr[:] = st2
            tot = jnp.take_along_axis(e + need,
                                      jnp.zeros((rows, 128), jnp.int32), axis=1)
            ptr_scr[:] = ptr_scr[:] + 2 * tot
            # chunk byte 4*step + i comes from state 3-i
            srep = jnp.take_along_axis(g, 3 - jnp.bitwise_and(lane, 3), axis=1)
            s16 = jnp.bitwise_and(o * 16 + j, 31)           # step within tile
            sym_scr[:] = jnp.where(jnp.right_shift(lane, 2) == s16,
                                   srep, sym_scr[:])
            return 0

        jax.lax.fori_loop(0, 16, inner, 0, unroll=16)

        @pl.when(jnp.bitwise_and(o, 1) == 1)
        def _():
            # pack the 128 accumulated symbols 4-per-word into the quarter
            # tile (o>>1)&3 of pack_scr, flush every 8 outer iterations
            s = sym_scr[:]
            p = (s | jnp.left_shift(pltpu.roll(s, 127, 1), 8)
                 | jnp.left_shift(pltpu.roll(s, 126, 1), 16)
                 | jnp.left_shift(pltpu.roll(s, 125, 1), 24))
            pw = jnp.take_along_axis(p, jnp.bitwise_and(jnp.left_shift(lane, 2), 127), axis=1)
            q = jnp.bitwise_and(jnp.right_shift(o, 1), 3)
            keep = jnp.right_shift(lane, 5) == q
            pack_scr[:] = jnp.where(keep, pw, pack_scr[:])

            @pl.when(jnp.bitwise_and(o, 7) == 7)
            def _():
                t = jnp.right_shift(o, 3)
                out_ref[:, pl.ds(t * 128, 128)] = pack_scr[:]
        return 0

    jax.lax.fori_loop(0, 256, outer, 0)
    used_ref[:] = ptr_scr[:]


def _decode(tlo, thi, blo, bhi, st0, pay):
    """All args row-padded to N % 64 == 0.  pay is (N, 132, 128) int32
    big-endian 16-bit words.  Returns out (N, 4096) int32 little-endian
    4-packed symbol RANKS and used (N, 128) byte counts."""
    n = tlo.shape[0]
    r = _DEC_ROWS
    return pl.pallas_call(
        _decode_kernel,
        interpret=_interp(),
        grid=(n // r,),
        in_specs=[pl.BlockSpec((r, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec((r, _DEC_PAY_ROWS, 128), lambda i: (i, 0, 0),
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
            pltpu.VMEM((r, 128), jnp.int32),   # states
            pltpu.VMEM((r, 128), jnp.int32),   # window tile 0
            pltpu.VMEM((r, 128), jnp.int32),   # window tile 1
            pltpu.VMEM((r, 128), jnp.int32),   # window tile 2
            pltpu.VMEM((r, 128), jnp.int32),   # byte pointers
            pltpu.VMEM((r, 128), jnp.int32),   # window base bytes
            pltpu.VMEM((r, 128), jnp.int32),   # symbol accumulation tile
            pltpu.VMEM((r, 128), jnp.int32),   # packed-output tile
        ],
    )(tlo, thi, blo, bhi, st0, pay)


@jax.jit
def ans0_decode_chunks_pallas(payload: jax.Array, states: jax.Array,
                              freq: jax.Array, cum: jax.Array):
    """Decode full 16 KiB chunks.  payload (N, P) uint8 renorm byte pairs,
    states (N, 4) int32, freq/cum (N, 256) int32.  Returns (out (N, 16384)
    uint8, consumed (N) int32) — semantics of ops/ans.py ans0_decode_chunks."""
    n0, p = payload.shape
    npad = _pad_rows(max(n0, _DEC_ROWS))
    npad = ((npad + _DEC_ROWS - 1) // _DEC_ROWS) * _DEC_ROWS
    maxb = _DEC_PAY_ROWS * 256
    payb = jnp.zeros((npad, maxb), jnp.uint8)
    payb = jax.lax.dynamic_update_slice(payb, payload[:, :maxb], (0, 0))
    payb = payb.astype(jnp.int32).reshape(npad, maxb // 2, 2)
    pay = jnp.left_shift(payb[:, :, 0], 8) | payb[:, :, 1]   # big-endian words
    pay = pay.reshape(npad, _DEC_PAY_ROWS, 128)
    if npad != n0:
        pad = ((0, npad - n0), (0, 0))
        freq = jnp.pad(freq, pad, mode="edge")
        cum = jnp.pad(cum, pad, mode="edge")
        states = jnp.pad(states, pad, mode="edge")
    freq_cap = jnp.minimum(freq, SCALE - 1)
    # dense rank order: present symbols first, in symbol order; absent
    # symbols pad the tail with +inf bounds so the rank search skips them
    sym_iota = jax.lax.broadcasted_iota(jnp.int32, freq.shape, 1)
    keys = jnp.where(freq > 0, sym_iota, 4096 + sym_iota)
    perm = jnp.argsort(keys, axis=1).astype(jnp.int32)       # rank -> symbol
    f_d = jnp.take_along_axis(freq_cap, perm, axis=1)
    cum_d = jnp.take_along_axis(cum, perm, axis=1)
    f_unc = jnp.take_along_axis(freq, perm, axis=1).astype(jnp.int32)
    nsym = jnp.sum((freq > 0).astype(jnp.int32), axis=1, keepdims=True)
    rank_iota = jax.lax.broadcasted_iota(jnp.int32, freq.shape, 1)
    # strictly increasing dense bounds; UNcapped freqs (matches the XLA
    # reference ans0_decode_chunks: a single-symbol chunk has bound 4096)
    bounds = jnp.where(rank_iota < nsym, cum_d + f_unc, 8191).astype(jnp.int32)
    tbl = jnp.bitwise_or(f_d, jnp.left_shift(cum_d, LOG_RANGE)).astype(jnp.int32)
    # bucket words for the kernel's one-gather rank lookup (_decode_kernel
    # header): word[b] = (#{bounds <= 16b}) << 16 | presence mask, where mask
    # bit j (j = 1..15) marks a dense bound equal to 16b+j.  Bit 0 is never
    # set — a bound at the bucket base is already in the base rank.
    key16 = jnp.right_shift(bounds + 15, 4)                  # ceil/16, <= 512
    bix = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    def _coarse(k16_slice):
        return jnp.sum((k16_slice[:, None, :] <= bix[:, :, None])
                       .astype(jnp.int32), axis=2)
    crs_full = jax.lax.map(_coarse, key16.reshape(-1, 64, 256)
                           ).reshape(npad, 256)
    b_idx = jnp.right_shift(bounds, 4)
    j_bit = jnp.bitwise_and(bounds, 15)
    # bounds are strictly increasing, so each (bucket, j) pair is unique and
    # scatter-add == scatter-or; pad bounds (8191) and the final 4096 bound
    # fall outside b < 256 and contribute nothing
    bit = jnp.where((j_bit != 0) & (b_idx < 256),
                    jnp.left_shift(1, j_bit), 0).astype(jnp.int32)
    rows_ix = jnp.arange(npad, dtype=jnp.int32)[:, None]
    mask = jnp.zeros((npad, 256), jnp.int32).at[
        rows_ix, jnp.clip(b_idx, 0, 255)].add(bit)
    bwords = jnp.bitwise_or(jnp.left_shift(crs_full, 16), mask)
    st0 = jnp.pad(states.astype(jnp.int32), ((0, 0), (0, 124)))
    packed_out, used = _decode(tbl[:, :128], tbl[:, 128:],
                               bwords[:, :128], bwords[:, 128:], st0, pay)
    shifts = jnp.array([0, 8, 16, 24], jnp.int32)
    ranks = jnp.bitwise_and(
        jnp.right_shift(packed_out[:, :, None], shifts[None, None, :]), 255)
    ranks = ranks.reshape(npad, CHUNK)
    out = _lookup(ranks, perm)                               # rank -> symbol
    return out[:n0].astype(jnp.uint8), used[:n0, 0]

def _pad_rows(n: int) -> int:
    """Smallest valid lane-tile row count >= n (multiple of 32, and of 512
    once several lane tiles are needed, so tiles divide evenly)."""
    m = (n + 31) & ~31
    return m if m <= 512 else (n + 511) & ~511


# ---------------------------------------------------------------------------
# order-1 (bigram) table lookup: MXU one-hot over the high 9 index bits,
# elementwise one-hot reduction over the low 7 — no XLA gather, no
# sublane-direction addressing.  idx = ctx*256 + sym in [0, 65536); the
# packed (freq | cum << 11) values are < 2^22, exact in f32 (HIGHEST).
# ---------------------------------------------------------------------------

LOG_RANGE1 = 11          # order-1 logRange (ANSRangeEncoder.java:125)
CHUNK1 = CHUNK << 8      # 4 MiB wire chunks (ANSRangeEncoder.java:126)


def _lookup1_kernel(ctx_ref, sym_ref, tbl_ref, out_ref):
    rows = ctx_ref.shape[1]
    tbl = tbl_ref[0]                                       # (512, 128) f32
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    dn = (((0,), (0,)), ((), ()))
    for r in range(rows):
        ctx = ctx_ref[0, r][None, :].astype(jnp.int32)     # (1, 128)
        sym = sym_ref[0, r][None, :].astype(jnp.int32)
        hi = ctx * 2 + jnp.right_shift(sym, 7)
        lo = jnp.bitwise_and(sym, 127)
        oht = (iota_hi == hi).astype(jnp.float32)          # (512, 128)
        # R[l, p] = sum_h tbl[h, l] * oht[h, p] : full-tile MXU contraction
        R = jax.lax.dot_general(tbl, oht, dn,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        ohlo = (iota_lo == lo).astype(jnp.float32)
        out_ref[0, r] = jnp.sum(R * ohlo, axis=0).astype(jnp.int32)


def _lookup1(ctx_u8: jax.Array, sym_u8: jax.Array, tbl: jax.Array,
             rows_per_cell: int = 32) -> jax.Array:
    """ctx/sym (N, C) uint8, tbl (N, 512, 128) f32 -> (N, C) int32 packed."""
    n, c = ctx_u8.shape
    rc = rows_per_cell
    ctx2 = ctx_u8.reshape(n, c // 128, 128)
    sym2 = sym_u8.reshape(n, c // 128, 128)
    out = pl.pallas_call(
        _lookup1_kernel,
        interpret=_interp(),
        grid=(n, (c // 128) // rc),
        in_specs=[
            pl.BlockSpec((1, rc, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rc, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 512, 128), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rc, 128), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c // 128, 128), jnp.int32),
    )(ctx2, sym2, tbl)
    return out.reshape(n, c)


@jax.jit
def ans1_encode_chunks_pallas(chunks: jax.Array, freq: jax.Array,
                              cum: jax.Array):
    """Order-1 encode of full 4 MiB wire chunks on device.

    chunks (N, C) uint8 (C == CHUNK1, 4 lanes = quarters, context = previous
    byte resetting at quarter starts — entropy/ans.py _lane_layout_order1);
    freq/cum (N, 256, 256) int32 normalized per context (sum = 2048).
    Returns (payload_u16 (N, C), n_emit_tiles (N, C // CHUNK, 128) per-tile
    counts, states (N, 4)); the host stitches tile payload prefixes in order.
    """
    n, c = chunks.shape
    q = c // 4
    lr = LOG_RANGE1
    fcap = jnp.minimum(freq, (1 << lr) - 1)
    packed = jnp.bitwise_or(fcap, jnp.left_shift(cum, lr)).astype(jnp.float32)
    tbl = packed.reshape(n, 256 * 256 // 128, 128)          # [hi, lo] layout
    # context = previous byte, 0 at quarter starts
    prev = jnp.roll(chunks, 1, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    ctx = jnp.where((pos % q) == 0, 0, prev).astype(jnp.uint8)
    lkf = _lookup1(ctx, chunks, tbl)                        # (N, C) int32

    # scan order: lane k = quarter k walked backward (host _lane_layout_order1
    # has no lane reversal, unlike order 0); flat lane e = k*N + n, padded to
    # whole 128-lane rows with inert (f=1, cum=0) entries
    x = lkf.reshape(n, 4, q)[:, :, ::-1]                    # (N, k, t)
    flat = x.transpose(2, 1, 0).reshape(q, 4 * n)
    lanes = max(128, ((4 * n + 127) // 128) * 128)
    if lanes != 4 * n:
        flat = jnp.pad(flat, ((0, 0), (0, lanes - 4 * n)), constant_values=1)
    lk = flat.reshape(q, lanes // 128, 128)
    emit, st = _scan(lk, lr=lr)
    states = st.reshape(lanes)[:4 * n].reshape(4, n).T.astype(jnp.int32)

    # forward payload: step-major over the whole chunk, lanes 3..0 per step
    e = emit.reshape(q, lanes)[:, :4 * n]
    e = e.reshape(q, 4, n).transpose(2, 0, 1)[:, ::-1, ::-1]  # (N, q, 4)
    e = e.reshape(n * (c // CHUNK), CHUNK // 128, 128)      # 16 KiB tiles
    pay_i32, cnt = _compact(e)
    payload = pay_i32.reshape(n, c).astype(jnp.uint16)
    return payload, cnt.reshape(n, c // CHUNK, 128), states


@jax.jit
def ans0_encode_chunks_pallas(chunks: jax.Array, freq: jax.Array,
                              cum: jax.Array):
    """Encode (N, C) uint8 chunks; returns (payload_u16 (N, C), n_emit (N),
    states (N, 4)) — bit-identical to ops/ans.py ans0_encode_chunks."""
    n0, c = chunks.shape
    npad = _pad_rows(n0)
    if npad != n0:
        pad = ((0, npad - n0), (0, 0))
        chunks = jnp.pad(chunks, pad, mode="edge")
        freq = jnp.pad(freq, pad, mode="edge")
        cum = jnp.pad(cum, pad, mode="edge")
    n = npad
    s = c // 4
    freq_cap = jnp.minimum(freq, SCALE - 1)
    tables = jnp.bitwise_or(freq_cap, jnp.left_shift(cum, LOG_RANGE)).astype(jnp.int32)
    packed = _lookup(chunks.astype(jnp.int32), tables)        # (N, C)

    # scan layout: row s of the kernel walks original step (S-1-s) with lane
    # order st3..st0; flat lane e = k*N + n; fold to (S, R, 128)
    x = packed.reshape(n, s, 4)[:, ::-1, ::-1]                # (N, S, 4)
    lk = x.transpose(1, 2, 0).reshape(s, (4 * n) // 128, 128)
    emit, st = _scan(lk)

    # states: scan lane k (flat e = k*N + n) is output state column k
    states = st.reshape(4, n).T.astype(jnp.int32)

    # payload forward order per chunk: reverse the scan rows back, lanes
    # st3..st0 within each original step reversed to match the numpy coder:
    # flags/vals come out of the scan as [s_rev, k_rev, n]; forward order is
    # chunks-major (n, s_fwd, k_fwd) = double reversal, same as ops/ans.py
    e = emit.reshape(s, 4, n).transpose(2, 0, 1)[:, ::-1, ::-1]  # (N, S, 4)
    pay_i32, cnt = _compact(e.reshape(n, 128, c // 128))
    payload = pay_i32.reshape(n, c).astype(jnp.uint16)
    n_emit = jnp.sum(cnt, axis=1)
    return payload[:n0], n_emit[:n0], states[:n0]
