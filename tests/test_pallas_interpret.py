"""CPU coverage of the Pallas kernel logic via interpret mode.

The real kernels need a TPU (tests/test_ans_pallas.py, opt-in); these run
the same kernel bodies through the Pallas interpreter on tiny shapes so the
default CPU suite exercises the scan/compaction/normalization logic against
independent numpy oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

CHUNK = 16384
SCALE = 4096


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("KANZI_TPU_PALLAS_INTERPRET", "1")


def test_scan_sub_fused_small():
    import jax.numpy as jnp

    from kanzi_tpu.ops.ans_pallas import _scan_sub_fused

    rng = np.random.default_rng(2)
    n, c = 128, 512
    f = rng.integers(1, 4096, (n, 256)).astype(np.int64)
    # consistent-enough tables: cum bounded so states stay in int32
    cum = np.minimum(np.cumsum(f, axis=1) - f, 4096 - f)
    chunks = rng.integers(0, 256, (n, c), dtype=np.uint8)
    tables = (np.minimum(f, 4095) | (cum << 12)).astype(np.int32)

    wv, wf, st = _scan_sub_fused(jnp.asarray(chunks), jnp.asarray(tables),
                                 rb=1)
    wv = np.asarray(wv).astype(np.int64)
    wf = np.asarray(wf).astype(np.int64)
    st = np.asarray(st).reshape(4, n).T

    states = np.full((n, 4), 1 << 15, np.int64)
    WV = np.zeros((n, c), np.int64)
    WF = np.zeros((n, c), np.int64)
    rows = np.arange(n)
    for t in range(c):
        u = t & 3
        b = c - 1 - t
        sym = chunks[:, b]
        fv = np.minimum(f[rows, sym], 4095)
        cm = cum[rows, sym]
        stv = states[:, u]
        em = (stv >> 19) >= fv
        val = stv & 0xFFFF
        st1 = np.where(em, stv >> 16, stv)
        q, r = st1 // fv, st1 % fv
        states[:, u] = (q << 12) + r + cm
        WV[:, b] = val
        WF[:, b] = em
    WV = np.where(WF == 1, WV, 0)
    assert np.array_equal(st, states.astype(np.int32))
    assert np.array_equal(wf, WF)
    assert np.array_equal(np.where(wf == 1, wv, 0), WV)


def test_compact2_small():
    import jax.numpy as jnp

    from kanzi_tpu.ops.ans_pallas import _compact2

    rng = np.random.default_rng(0)
    n, nb = 8, 4
    flag = (rng.random((n, nb * 128)) < 0.4).astype(np.uint8)
    val = rng.integers(0, 65536, (n, nb * 128)).astype(np.uint16)
    pay, cnt = _compact2(jnp.asarray(val.reshape(n, nb, 128)),
                         jnp.asarray(flag.reshape(n, nb, 128)))
    pay = np.asarray(pay).reshape(n, nb * 128)
    assert np.array_equal(np.asarray(cnt).sum(1), flag.sum(1))
    for i in range(n):
        want = val[i][flag[i] == 1]
        assert np.array_equal(pay[i, :want.size], want)


def test_normalize_pallas_small():
    import jax.numpy as jnp

    from kanzi_tpu.entropy.utils import normalize_frequencies_batch
    from kanzi_tpu.ops.ans_pallas import _normalize_freqs_pallas

    rng = np.random.default_rng(1)
    hists = []
    for _ in range(32):
        k = int(rng.integers(1, 257))
        syms = rng.choice(256, k, replace=False)
        w = rng.pareto(rng.uniform(0.2, 3.0), k) + 1e-9
        h = np.zeros(256, np.int64)
        h[syms] = 1 + rng.multinomial(CHUNK - k, w / w.sum())
        hists.append(h)
    hists = np.array(hists)
    ref = normalize_frequencies_batch(hists, CHUNK, SCALE)
    out = np.asarray(_normalize_freqs_pallas(
        jnp.asarray(hists, jnp.int32), 14, SCALE, rows_per_cell=32))
    assert np.array_equal(out, ref)


def test_decode_inverts_encode_interpret():
    """Encode (XLA scan) -> decode (_decode kernel, interpret mode) round
    trip.  Guards the kernel <-> wrapper table-format contract (bucket
    words), which a TPU-gated test alone cannot (see round-2 advisor)."""
    import jax.numpy as jnp

    from kanzi_tpu.ops.ans import ans0_encode_chunks
    from kanzi_tpu.ops.ans_block import _chunk_stats
    from kanzi_tpu.ops.ans_pallas import ans0_decode_chunks_pallas

    rng = np.random.default_rng(5)
    chunks = np.stack([
        (rng.zipf(1.4, CHUNK) % 230).astype(np.uint8),      # skewed
        np.clip(rng.normal(100, 2, CHUNK), 0, 255).astype(np.uint8),
        rng.integers(0, 256, CHUNK).astype(np.uint8),       # incompressible
        np.zeros(CHUNK, np.uint8),                          # single symbol
    ])
    n = chunks.shape[0]
    freq, cum, _, _ = _chunk_stats(chunks)
    p, ne, st = ans0_encode_chunks(
        jnp.asarray(chunks), jnp.asarray(freq, jnp.int32),
        jnp.asarray(cum, jnp.int32))
    p, ne, st = np.asarray(p), np.asarray(ne), np.asarray(st)
    maxb = ((int(ne.max()) * 2 + 130) // 128 + 2) * 128
    pay = np.zeros((n, maxb), np.uint8)
    for i in range(n):
        pay[i, :ne[i] * 2] = p[i, :ne[i]].astype(">u2").view(np.uint8)
    out, used = ans0_decode_chunks_pallas(
        jnp.asarray(pay), jnp.asarray(st, jnp.int32),
        jnp.asarray(freq, jnp.int32), jnp.asarray(cum, jnp.int32))
    assert np.array_equal(np.asarray(out), chunks)
    assert np.array_equal(np.asarray(used), ne * 2)


def test_ksort_rows_interpret():
    """ksort_pallas (the measured-and-rejected fused bitonic sort — kept
    as the recorded experiment, docs/kernels.md): span and cross passes
    must still match a lexicographic reference exactly."""
    import jax.numpy as jnp

    import kanzi_tpu.ops.ksort_pallas as K

    rng = np.random.default_rng(7)
    for ls, b, n, nops, nk in [(10, 2, 1 << 9, 2, 1), (10, 1, 1 << 12, 4, 2),
                               (11, 2, 1 << 13, 3, 2)]:
        old = K.LS
        K.LS = ls
        try:
            arrs = [rng.integers(-50, 50, (b, n)).astype(np.int32)
                    for _ in range(nops - 1)]
            idx = np.broadcast_to(
                np.arange(n, dtype=np.int32), (b, n)).copy()
            karrs = arrs[:nk - 1] + [idx] + arrs[nk - 1:]
            got = K.ksort_rows([jnp.asarray(a) for a in karrs], nk)
            for row in range(b):
                order = np.lexsort(
                    tuple([a[row] for a in karrs[:nk]][::-1]))
                for g, a in zip(got, karrs):
                    assert np.array_equal(np.asarray(g)[row], a[row][order])
        finally:
            K.LS = old
            K._span_call.cache_clear()
            K._cross_call.cache_clear()
