"""Pallas fused multi-operand sort — MEASURED AND REJECTED (round 4).

Status: this was round 3's projected "2-4x fused sort" for the LZ match
engine.  Built, verified bit-exact against `jax.lax.sort`, and measured
SLOWER than XLA's variadic sort at every shape that matters (7.7 vs 3.1
ns/elem at (8, 4Mi) x 2 operands; 7.4 vs 2.8 at (512, 64K) x 5).  A
bitonic network is O(log^2 N) stages and each stage costs ~25-30 VPU
ops/elem across operands; VMEM residency removes the HBM traffic but not
the stage count, and XLA's sort already runs at memory speed.  Kept
in-tree with its interpret-mode test as the recorded experiment — see
docs/kernels.md ("Pallas fused sort") for the full numbers and the radix
cost model that was rejected alongside it.  The production engine
(ops/lz_sort.py) keeps `jax.lax.sort`.

``ksort_rows`` sorts each row of a batch of i32 arrays by the
lexicographic order of the first ``num_keys`` operands (ascending,
signed).  The caller guarantees a TOTAL order (in practice the last key
operand is the position iota, which is unique per row), so stability is
irrelevant and a bitonic network is exact.

Why this exists: XLA's variadic sort on TPU runs its whole compare
-exchange network through HBM — ~log^2(N)/2 = 253 passes at N = 4 Mi —
so it costs ~2.3 ns/elem for one operand and ~0.9 ns/elem for each
additional operand (measured, v5e).  The match engine in ops/lz_sort
spends ~20 ns/elem in five such sorts (= the whole 0.05 GB/s analyze
rate).  This kernel runs the same bitonic network in a handful of fused
passes instead:

  1. ``span`` passes: a grid cell loads a contiguous span of S = 2^LS
     elements per operand into VMEM and executes EVERY network stage
     whose compare-exchange stride is < S — the first pass runs the
     complete bitonic sort of each span (merge levels 1..LS), and each
     later merge level k > LS needs one span pass for its strides < S.
  2. ``cross`` passes: for merge level k > LS, the strides >= S touch
     elements 2^j apart, j >= LS.  Viewing the row as (hi, 2^(k-LS), S)
     the butterfly spans the middle axis; a grid cell loads a block
     (2^(k-LS), W) — 2^(k-LS) strided slices of a window W — and runs
     all of level k's big-stride stages in VMEM.

  Total passes for N = 4 Mi, S = 256 Ki: 1 + 2*(22-18) = 9, vs 253.
  Compare-exchange partners i XOR 2^j never wrap a roll boundary (XOR
  of a single bit has no carry), so each stage is two rolls + selects.

The network is executed by one `fori_loop` whose per-stage parameters
(stride bit j, merge-level bit k) are scalar-prefetched — graphs stay
small and compile fast through the remote-compile tunnel.

No reference counterpart: `flanglet/kanzi` has no sorting of this kind;
the engine that calls this replaces LZCodec.java's serial hash-chain
match loop (LZCodec.java:144-966) wholesale.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LS = 17                  # span = 128 Ki elements (0.5 MiB/operand in VMEM)


def _interp() -> bool:
    """Interpret mode for CPU tests of the kernel logic on tiny shapes
    (same convention as ans_pallas; see tests/test_pallas_interpret.py)."""
    import os
    return os.environ.get("KANZI_TPU_PALLAS_INTERPRET", "0") == "1"


def _roll2(v, rsub, rlane):
    """Roll the flattened (sub*128+lane) order by (rsub*128 + rlane);
    exactly one of the two amounts is nonzero for a power-of-two stride."""
    return pltpu.roll(pltpu.roll(v, rsub, 0), rlane, 1)


def _stage_body(ops, nk, g, j, k):
    """One compare-exchange stage on VMEM-resident operands.

    ops: list of (R, 128) i32; nk: number of key operands; g: (R, 128)
    global flat index of each element; j: stride bit; k: merge-level bit
    (both traced scalars).
    """
    s = jnp.int32(1) << j
    rlane = jnp.where(j < 7, s, 0)
    rsub = jnp.where(j >= 7, s >> 7, 0)
    right = (g & s) != 0          # elements whose partner is at g - s
    partners = [jnp.where(right, _roll2(v, rsub, rlane),
                          _roll2(v, -rsub, -rlane)) for v in ops]
    # lexicographic partner < mine over the key operands
    less = jnp.zeros_like(right)
    eq = jnp.ones_like(right)
    for a, b in zip(ops[:nk], partners[:nk]):
        less = less | (eq & (b < a))
        eq = eq & (b == a)
    desc = ((g >> k) & 1) != 0    # descending half of the merge
    take = (less ^ right) ^ desc
    return [jnp.where(take, p, v) for v, p in zip(ops, partners)]


def _span_kernel(jarr_ref, karr_ref, *refs, nops: int, nk: int,
                 nstages: int, span: int):
    """Run ``nstages`` network stages (all strides < span) on one span.
    refs = nops inputs + nops outputs; grid cell = one span of one row."""
    sid = pl.program_id(1)
    rows = span // 128
    g = (sid * span
         + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
         + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))
    ops = [refs[i][0] for i in range(nops)]

    def body(t, ops):
        return _stage_body(ops, nk, g, jarr_ref[t], karr_ref[t])

    ops = jax.lax.fori_loop(0, nstages, body, ops, unroll=False)
    for i in range(nops):
        refs[nops + i][0] = ops[i]


def _cross_kernel(jarr_ref, karr_ref, *refs, nops: int, nk: int,
                  nstages: int, nsl: int, wr: int, ls: int):
    """Run merge stages with strides >= 2^ls.  Block = (nsl, wr, 128) —
    nsl strided slices (slice m = elements whose bits >= ls equal m
    within the butterfly group) of a window of wr*128 elements.
    Flattened slice-major to (nsl*wr, 128); the stride-2^j partner is
    2^(j-ls)*wr sublane rows away."""
    hi = pl.program_id(1)         # butterfly group index
    wi = pl.program_id(2)         # window index inside the span
    rows = nsl * wr
    sub = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    sl = sub // wr                # slice id  (middle-axis coordinate)
    f = (sub % wr) * 128 + lane
    g = ((hi * nsl + sl) << ls) + wi * (wr * 128) + f
    ops = [refs[i][0].reshape(rows, 128) for i in range(nops)]

    def body(t, ops):
        j = jarr_ref[t]
        s_sl = (jnp.int32(1) << (j - ls)) * wr       # slice stride in rows
        right = (g & (jnp.int32(1) << j)) != 0
        partners = [jnp.where(right, pltpu.roll(v, s_sl, 0),
                              pltpu.roll(v, -s_sl, 0)) for v in ops]
        less = jnp.zeros_like(right)
        eq = jnp.ones_like(right)
        for a, b in zip(ops[:nk], partners[:nk]):
            less = less | (eq & (b < a))
            eq = eq & (b == a)
        desc = ((g >> karr_ref[t]) & 1) != 0
        take = (less ^ right) ^ desc
        return [jnp.where(take, p, v) for v, p in zip(ops, partners)]

    ops = jax.lax.fori_loop(0, nstages, body, ops, unroll=False)
    for i in range(nops):
        refs[nops + i][0] = ops[i].reshape(nsl, wr, 128)


def _pad_stages(js, ks, cap: int = 0):
    """Pad per-pass stage lists to a fixed length (graph-shape reuse)."""
    n = len(js)
    want = max(n, cap)
    return (np.asarray(js + [0] * (want - n), np.int32),
            np.asarray(ks + [0] * (want - n), np.int32), n)


@functools.lru_cache(maxsize=None)
def _span_call(b: int, nspans: int, span: int, nops: int, nk: int,
               nstages: int):
    kern = functools.partial(_span_kernel, nops=nops, nk=nk,
                             nstages=nstages, span=span)
    rows = span // 128
    grid = (b, nspans)
    bspec = pl.BlockSpec((1, rows, 128), lambda i, s: (i * nspans + s, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def call(jarr, karr, *arrs):
        return pl.pallas_call(
            kern, interpret=_interp(),
            grid=grid,
            in_specs=[sspec, sspec] + [bspec] * nops,
            out_specs=[bspec] * nops,
            out_shape=[jax.ShapeDtypeStruct((b * nspans, rows, 128),
                                            jnp.int32)] * nops,
        )(jarr, karr, *arrs)
    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def _cross_call(b: int, nhi: int, nsl: int, nwin: int, wr: int, ls: int,
                nops: int, nk: int, nstages: int):
    kern = functools.partial(_cross_kernel, nops=nops, nk=nk,
                             nstages=nstages, nsl=nsl, wr=wr, ls=ls)
    grid = (b, nhi, nwin)
    rows_span = (1 << ls) // 128
    bspec = pl.BlockSpec(
        (1, nsl, wr, 128), lambda i, h, wi: (i * nhi + h, 0, wi, 0),
        memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def call(jarr, karr, *arrs):
        return pl.pallas_call(
            kern, interpret=_interp(),
            grid=grid,
            in_specs=[sspec, sspec] + [bspec] * nops,
            out_specs=[bspec] * nops,
            out_shape=[jax.ShapeDtypeStruct(
                (b * nhi, nsl, rows_span, 128), jnp.int32)] * nops,
        )(jarr, karr, *arrs)
    return jax.jit(call)


# VMEM budget per cross-pass block, in i32 elements per operand.  nsl
# slices x window W; W shrinks as nsl grows so blocks stay ~0.5 MiB.
_CROSS_ELEMS = 1 << 17


def ksort_rows(arrays, num_keys: int):
    """Sort each row of the (B, N) i32 ``arrays`` by the lexicographic
    ascending (signed) order of the first ``num_keys`` operands.  N must
    be a power of two >= 2^10; the order must be total (unique keys)."""
    arrays = [jnp.asarray(a, jnp.int32) for a in arrays]
    b, n = arrays[0].shape
    ln = n.bit_length() - 1
    if (1 << ln) != n:
        raise ValueError("ksort_rows: N must be a power of two")
    nops = len(arrays)
    ls = min(LS, ln)
    span = 1 << ls
    nspans = n >> ls

    # ---- pass 1: full sort of every span (merge levels 1..ls) ----
    js, ks = [], []
    for k in range(1, ls + 1):
        for j in range(k - 1, -1, -1):
            js.append(j)
            ks.append(k)
    jarr, karr, nst = _pad_stages(js, ks)
    shaped = [a.reshape(b * nspans, span // 128, 128) for a in arrays]
    out = _span_call(b, nspans, span, nops, num_keys, nst)(
        jnp.asarray(jarr), jnp.asarray(karr), *shaped)

    # ---- merge levels above the span ----
    for k in range(ls + 1, ln + 1):
        # big strides j = k-1 .. ls: cross pass over strided slices
        nsl = 1 << (k - ls)
        nhi = n >> k
        w = max(128, min(span, _CROSS_ELEMS // nsl))
        wr = w // 128
        nwin = (span // 128) // wr
        js = list(range(k - 1, ls - 1, -1))
        ks2 = [k] * len(js)
        jarr, karr, nst = _pad_stages(js, ks2)
        shaped = [a.reshape(b * nhi, nsl, span // 128, 128) for a in out]
        out = _cross_call(b, nhi, nsl, nwin, wr, ls, nops, num_keys, nst)(
            jnp.asarray(jarr), jnp.asarray(karr), *shaped)
        # small strides j = ls-1 .. 0: one span pass
        js = list(range(ls - 1, -1, -1))
        ks2 = [k] * len(js)
        jarr, karr, nst = _pad_stages(js, ks2)
        shaped = [a.reshape(b * nspans, span // 128, 128) for a in out]
        out = _span_call(b, nspans, span, nops, num_keys, nst)(
            jnp.asarray(jarr), jnp.asarray(karr), *shaped)

    return tuple(a.reshape(b, n) for a in out)
