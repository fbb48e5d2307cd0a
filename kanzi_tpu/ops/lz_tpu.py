"""TPU LZX encode: parallel match finding + parse selection on device.

The reference encoder (K/transform/LZCodec.java:144-760, mirrored by
native/lz.cpp) is a serial greedy hash-chain parse.  Any *valid* LZX token
stream round-trips, so the TPU path re-designs the parse for SPMD hardware
instead of translating the loop:

  1. hash every position (VPU, 32-bit mix of the first min-match bytes)
  2. nearest previous occurrence per hash via ONE stable sort of
     (hash, position) pairs — the sorted neighbor IS the single-entry
     hash-table hit, computed for all positions at once
  3. match lengths by lockstep 4-byte XOR extension rounds (gathers)
  4. one-step-lazy parse selection entirely with data-parallel primitives:
     kept[i] = mlen[i] >= mm and not (mlen[i+1] > mlen[i]); next-kept via a
     reversed cumulative min; the greedy token chain extracted by pointer
     doubling (log2 n gather rounds) instead of a serial walk
  5. wire emission (sections, tokens, emit_len varints) vectorized on the
     host with numpy — pure layout work, no data-dependent loops

Matches are capped at 4*EXT_ROUNDS bytes; longer repeats continue as
chained rep0 tokens (dist unchanged -> 1 token byte + 1 length byte per
segment), costing ~2/128 bytes of ratio on long runs versus the serial
encoder's unbounded match_fwd.
"""

from __future__ import annotations

import functools

import numpy as np

MAX_DISTANCE1 = (1 << 16) - 2
MAX_DISTANCE2 = (1 << 24) - 2
MIN_BLOCK_LENGTH = 24
EXT_ROUNDS = 31              # max match = 4 + 4*31 = 128 bytes per token


def _pad_bucket(n: int) -> int:
    m = 1 << max(n - 1, 1).bit_length()
    return max(m, 1024)


_MIX = (-1640531527, -2048144789, -1028477379, 668265263, 374761393,
        -1886788817, 2034077037, -1525255075)


def _analyze(src_pad, src_end, hlog: int, mm: int, max_dist: int):
    """Device stage: returns (tok_pos, tok_len, tok_dist, n_tok) padded
    token arrays for the greedy one-step-lazy parse.  src_end is a traced
    scalar so one compile covers every block size in a pad bucket.

    Candidates come from a hash LADDER (window lengths mm, 8, 16, 32, 64,
    128): the nearest previous occurrence of a long window is the head of a
    long-range repeat that the short-window nearest-neighbor would shadow
    with a closer short match.  The longest plausibly-verified level wins,
    then one byte-exact extension pipeline computes the true length."""
    import jax
    import jax.numpy as jnp

    n = src_pad.shape[0]
    b = src_pad.astype(jnp.int32)

    def sh(k):
        return jnp.roll(b, -k)

    w = (sh(0) << 24) | (sh(1) << 16) | (sh(2) << 8) | sh(3)  # 4B window
    w_ext = jnp.concatenate([w, jnp.zeros(1, w.dtype)])
    idx = jnp.arange(n, dtype=jnp.int32)

    def wat(off):
        """w at position idx+off (static off)."""
        return jnp.roll(w, -off)

    def nearest_prev(h):
        # full 32-bit keys: the sort-based finder has no table to size, so
        # hlog only echoes the reference's LZ/LZX distinction; collisions
        # are filtered by the probe + byte-exact extension
        hs, ids = jax.lax.sort((h, idx), num_keys=1, is_stable=True)
        prev = jnp.where((hs == jnp.roll(hs, 1)) & (idx > 0),
                         jnp.roll(ids, 1), -1)
        return jnp.zeros(n, jnp.int32).at[ids].set(prev)

    levels = [lv for lv in (mm, 8, 16, 32, 64, 128) if lv >= mm]
    cand = jnp.full(n, -1, jnp.int32)
    for lv in levels:  # ascending: later (longer) levels overwrite
        nw = (lv + 3) // 4
        h = wat(0) * _MIX[0]
        for j in range(1, nw - 1):
            h = h ^ wat(4 * j) * _MIX[j % 8]
        if nw > 1:
            h = h ^ wat(lv - 4) * _MIX[(nw - 1) % 8]
        c = nearest_prev(h)
        d = idx - c
        okc = (c >= 0) & (d <= max_dist)
        if lv > mm:
            # plausibility probe: first + last word of the window agree
            # (byte-exact truth comes from the extension pass)
            a0 = jnp.take(w_ext, jnp.minimum(idx, n))
            c0 = jnp.take(w_ext, jnp.minimum(jnp.maximum(c, 0), n))
            a1 = jnp.take(w_ext, jnp.minimum(idx + lv - 4, n))
            c1 = jnp.take(w_ext, jnp.minimum(jnp.maximum(c, 0) + lv - 4, n))
            okc = okc & (a0 == c0) & (a1 == c1)
        cand = jnp.where(okc, c, cand)

    dist = idx - cand
    ok = (cand >= 0) & (idx < src_end)

    # lockstep 4-byte extension; clip-mode gathers may falsely extend past
    # the buffer end, fixed by the src_end cap below
    l = jnp.zeros(n, jnp.int32)
    active = ok
    cnd = jnp.maximum(cand, 0)
    for _ in range(EXT_ROUNDS):
        a = jnp.take(w, jnp.minimum(idx + l, n - 1))
        c = jnp.take(w, jnp.minimum(cnd + l, n - 1))
        x = (a ^ c).astype(jnp.uint32)
        eq = x == 0
        lead = ((x < (1 << 24)).astype(jnp.int32)
                + (x < (1 << 16)).astype(jnp.int32)
                + (x < (1 << 8)).astype(jnp.int32))
        l = l + jnp.where(active, jnp.where(eq, 4, lead), 0)
        active = active & eq
    l = jnp.minimum(l, jnp.maximum(src_end - idx, 0))
    mlen = jnp.where(ok & (l >= mm), l, 0)

    # one-step lazy: drop a match when the next position matches longer
    mlen_next = jnp.roll(mlen, -1).at[n - 1].set(0)
    kept = (mlen > 0) & ~(mlen_next > mlen)

    # next kept position at/after i (sentinel n): reversed cumulative min
    pos_or_inf = jnp.where(kept, idx, n)
    nxt = jax.lax.cummin(pos_or_inf, reverse=True)
    nxt_ext = jnp.concatenate([nxt, jnp.full(1, n, jnp.int32)])

    # token chain: from token p jump to the first kept match after its end
    end_p = jnp.minimum(idx + jnp.maximum(mlen, mm), n)
    jump = jnp.take(nxt_ext, end_p)                    # (n,)
    jump_ext = jnp.concatenate([jump, jnp.full(1, n, jnp.int32)])

    # extract the path from nxt[0] by pointer doubling: token t's position
    # = jump^t(start); at most n // mm tokens
    tmax = n // mm + 1
    t_iota = jnp.arange(tmax, dtype=jnp.int32)
    p = jnp.full(tmax, nxt_ext[0], jnp.int32)
    J = jump_ext
    bit = 1
    while bit < tmax:
        p = jnp.where((t_iota & bit) != 0, jnp.take(J, jnp.minimum(p, n)), p)
        J = jnp.take(J, jnp.minimum(J, n))
        bit <<= 1
    valid = p < n
    n_tok = jnp.sum(valid.astype(jnp.int32))
    pc = jnp.minimum(p, n - 1)
    return (jnp.where(valid, p, 0), jnp.take(mlen, pc),
            jnp.take(dist, pc), n_tok)


def _emit_len_bytes(v: np.ndarray):
    """Vectorized emit_len (LZCodec.java emitLength): per-value byte count
    and up to 4 bytes, big-endian extensions."""
    v = v.astype(np.int64)
    nb = np.where(v < 254, 1, np.where(v < 65536 + 254, 3, 4))
    b = np.zeros((v.size, 4), dtype=np.uint8)
    b[:, 0] = np.where(v < 254, v, np.where(nb == 3, 254, 255))
    v3 = v - 254
    v4 = v - 255
    b[:, 1] = np.where(nb == 3, (v3 >> 8) & 0xFF, (v4 >> 16) & 0xFF)
    b[:, 2] = np.where(nb == 3, v3 & 0xFF, (v4 >> 8) & 0xFF)
    b[:, 3] = v4 & 0xFF
    return nb, b


def _scatter_varlen(nb: np.ndarray, b: np.ndarray, out: np.ndarray,
                    offs: np.ndarray) -> None:
    """Write per-item variable-length byte groups b[i, :nb[i]] at offs[i]."""
    for k in range(4):
        sel = nb > k
        if not sel.any():
            break
        out[offs[sel] + k] = b[sel, k]


def lzx_forward_device(src: np.ndarray, extra: bool = False,
                       min_match: int = 4) -> np.ndarray | None:
    """LZX forward with match finding / parse selection on the JAX device.

    Produces a valid v7 LZX section stream (decodable by kz_lzx_inverse and
    the reference); the parse differs from the serial encoder, the format
    does not.  Returns None when the block should be skipped (mirrors
    kz_lzx_forward's -1).
    """
    import jax.numpy as jnp

    src = np.asarray(src, dtype=np.uint8)
    count = src.size
    if count < MIN_BLOCK_LENGTH:
        return None
    src_end = count - 16 - 2
    max_dist = MAX_DISTANCE1 if src_end < 4 * MAX_DISTANCE1 else MAX_DISTANCE2
    hlog = 19 if extra else 16
    mm = min_match if min_match > 0 else 4

    npad = _pad_bucket(count)
    pad = np.zeros(npad, dtype=np.uint8)
    pad[:count] = src
    tok_pos_d, tok_len_d, tok_dist_d, n_tok_d = _analyze_jit(
        jnp.asarray(pad), jnp.int32(src_end), hlog, mm, max_dist)
    k = int(n_tok_d)
    tok_pos = np.asarray(tok_pos_d[:k]).astype(np.int64)
    tok_len = np.asarray(tok_len_d[:k]).astype(np.int64)
    tok_dist = np.asarray(tok_dist_d[:k]).astype(np.int64)
    return _emit(src, count, mm, max_dist, tok_pos, tok_len, tok_dist)


_MERGE_CAP = 65535


def _merge_adjacent(tok_pos, tok_len, tok_dist):
    """Fuse runs of exactly-adjacent matches with equal distance (identical
    decode output) so the device extension cap never costs token bytes on
    long repeats; re-split merged tokens at _MERGE_CAP."""
    k = tok_pos.size
    if k == 0:
        return tok_pos, tok_len, tok_dist
    adj = (tok_pos[1:] == tok_pos[:-1] + tok_len[:-1]) \
        & (tok_dist[1:] == tok_dist[:-1])
    starts = np.flatnonzero(np.concatenate([[True], ~adj]))
    pos2 = tok_pos[starts]
    dist2 = tok_dist[starts]
    len2 = np.add.reduceat(tok_len, starts)
    cnt = (len2 + _MERGE_CAP - 1) // _MERGE_CAP
    if (cnt == 1).all():
        return pos2, len2, dist2
    total = int(cnt.sum())
    tid = np.repeat(np.arange(cnt.size), cnt)
    intra = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    pos3 = pos2[tid] + intra * _MERGE_CAP
    len3 = np.minimum(len2[tid] - intra * _MERGE_CAP, _MERGE_CAP)
    return pos3, len3, dist2[tid]


def _emit(src, count, mm, max_dist, tok_pos, tok_len, tok_dist):
    """Vectorized host emission of the LZX section layout."""
    tok_pos, tok_len, tok_dist = _merge_adjacent(tok_pos, tok_len, tok_dist)
    k = tok_pos.size
    anchors = np.empty(k + 1, dtype=np.int64)
    anchors[0] = 0
    np.add(tok_pos, tok_len, out=anchors[1:])
    lit_len = np.empty(k + 1, dtype=np.int64)
    lit_len[:k] = tok_pos - anchors[:k]
    lit_len[k] = count - anchors[k]          # final literal-only token

    # rep flags: dist equals the previous / before-previous match distance
    d_prev = np.full(k, count, dtype=np.int64)
    d_prev2 = np.full(k, count, dtype=np.int64)
    d_prev[1:] = tok_dist[:-1]
    d_prev2[2:] = tok_dist[:-2]
    rep0 = tok_dist == d_prev
    rep1 = ~rep0 & (tok_dist == d_prev2)
    isrep = rep0 | rep1

    # token match bits
    nb_dist = np.where(isrep, 0,
                       1 + (tok_dist >= 256) + (tok_dist >= 65536))
    m_th = np.where(isrep, 3, 7)
    m_val = tok_len - mm
    m_ext = m_val >= m_th
    tok_match = np.where(isrep, np.where(rep1, 0x04, 0x00), nb_dist << 3) \
        + np.minimum(m_val, m_th)

    # literal-length bits + extension varints (into the literal section)
    lit_ext = lit_len >= 7
    tok_bits = np.minimum(lit_len, 7) << 5
    tokens = np.empty(k + 1, dtype=np.uint8)
    tokens[:k] = (tok_bits[:k] + tok_match).astype(np.uint8)
    tokens[k] = tok_bits[k]

    # ----- literal section: [ext varint?][run bytes] per token -----
    ext_nb = np.zeros(k + 1, dtype=np.int64)
    if lit_ext.any():
        nbv, bv = _emit_len_bytes(lit_len[lit_ext] - 7)
        ext_nb[lit_ext] = nbv
    piece = ext_nb + lit_len
    lit_off = 13 + np.cumsum(piece) - piece
    lit_sec_end = int(lit_off[-1] + piece[-1])
    out = np.zeros(lit_sec_end + (k + 1) + 3 * k + 4 * (k + 1) + 16,
                   dtype=np.uint8)
    if lit_ext.any():
        _scatter_varlen(nbv, bv, out, lit_off[lit_ext])
    total_lit = int(lit_len.sum())
    if total_lit:
        tid = np.repeat(np.arange(k + 1), lit_len)
        starts_dst = lit_off + ext_nb
        intra = np.arange(total_lit) - np.repeat(
            np.cumsum(lit_len) - lit_len, lit_len)
        out[starts_dst[tid] + intra] = src[anchors[tid] + intra]

    dst_idx = lit_sec_end
    out[0:4] = np.frombuffer(np.uint32(dst_idx).tobytes(), np.uint8)
    out[4:8] = np.frombuffer(np.uint32(k + 1).tobytes(), np.uint8)
    out[12] = (0 if max_dist == MAX_DISTANCE1 else 1) | (((mm - 2) & 7) << 1)

    out[dst_idx:dst_idx + k + 1] = tokens
    dst_idx += k + 1

    # ----- distance section (big-endian, 1..3 bytes per non-rep match) ----
    nr = ~isrep
    d_nr = tok_dist[nr]
    nbd = nb_dist[nr]
    if d_nr.size:
        offs = np.cumsum(nbd) - nbd + dst_idx
        db = np.zeros((d_nr.size, 3), dtype=np.uint8)
        db[:, 0] = np.where(nbd == 3, d_nr >> 16,
                            np.where(nbd == 2, d_nr >> 8, d_nr)) & 0xFF
        db[:, 1] = np.where(nbd == 3, d_nr >> 8, d_nr) & 0xFF
        db[:, 2] = d_nr & 0xFF
        _scatter_varlen(nbd, np.concatenate(
            [db, np.zeros((d_nr.size, 1), np.uint8)], axis=1), out, offs)
        m_idx_len = int(nbd.sum())
    else:
        m_idx_len = 0
    dst_idx += m_idx_len
    out[8:12] = np.frombuffer(np.uint32(m_idx_len).tobytes(), np.uint8)

    # ----- match-length section -----
    if m_ext.any():
        nbm, bm = _emit_len_bytes((m_val - m_th)[m_ext])
        offs = np.cumsum(nbm) - nbm + dst_idx
        _scatter_varlen(nbm, bm, out, offs)
        dst_idx += int(nbm.sum())

    if dst_idx >= count - (count // 100):
        return None
    return out[:dst_idx].copy()


@functools.lru_cache(maxsize=1)
def _get_analyze_jit():
    import jax
    return jax.jit(_analyze, static_argnums=(2, 3, 4))


def _analyze_jit(*args):
    return _get_analyze_jit()(*args)
