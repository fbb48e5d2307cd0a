"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: the level-1 block pipeline (LZX transform + NONE entropy + block
payload assembly — BlockCompressor.java:539 row 1) over a frozen 64 MiB
MIXED corpus (kanzi_tpu.utils.corpus: text/xml/exe/dna/numeric/random),
measured end-to-end with the fastest engine available in this environment.
vs_baseline compares against the reference's own end-to-end silesia -l1
encode rate (0.416 GB/s on a 16-core Ryzen 9950X, BASELINE.md).

Secondaries on stderr:
  * device pipeline rate (input in HBM, two-tier whole-block engine) and
    the device e2e including the dev box's d2h tunnel + overlapped host
    emit
  * RATIO + SPEED SCOREBOARD — per level 1..9, compressed size, ENCODE
    and DECODE GB/s (best-of-N) on the frozen synthetic corpus, host
    path + device gates (device size must be <= host)
  * the same scoreboard on the REAL-FILE corpus (utils/corpus.real_corpus
    — a frozen silesia-style mix of files on this box, SHA-pinned)
  * ANS0 entropy-stage kernel rates, encode AND decode, incl the decode
    scale-out projection (chunks shard across chips; parallel/engine
    .make_decode_step is the mesh path, dryrun-verified)
  * the dev-box d2h tunnel rate (taxes e2e here; not a TPU property)
"""

from __future__ import annotations

import io
import json
import os
import sys
import time

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: the sort-heavy LZ graphs take minutes
    to compile through this dev box's remote-compile tunnel; caching them
    on disk makes every run after the first start in seconds."""
    import os

    import jax
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()


BASELINE = {1: 0.416, 3: 0.237, 5: 0.123, 8: 0.036, 9: 0.014}
# silesia e2e enc GB/s, BASELINE.md
# full per-level reference silesia ENCODE rates (GB/s, BASELINE.md)
BASELINE_ENC = {1: 0.416, 2: 0.302, 3: 0.237, 4: 0.165, 5: 0.123,
                6: 0.111, 7: 0.126, 8: 0.036, 9: 0.014}
REF_CORES = 16          # the reference numbers come from a 16-core 9950X
# reference silesia DECODE rates (GB/s) from BASELINE.md enc/dec ms pairs
BASELINE_DEC = {1: 1.158, 2: 0.669, 3: 0.451, 4: 0.285, 5: 0.282,
                6: 0.269, 7: 0.203, 8: 0.035, 9: 0.014}
# reference silesia compression ratios per level.  NOTE: a DIFFERENT
# dataset from both bench corpora — trend context only, NOT a comparable
# target (silesia.tar = 211,957,760 B, README.md:69-94)
SILESIA_RATIO = {1: 0.374, 2: 0.324, 3: 0.302, 4: 0.289, 5: 0.254,
                 6: 0.233, 7: 0.223, 8: 0.203, 9: 0.196}
CORPUS_MB = 64          # the l1 end-to-end loops
SCORE_MB = 16           # scoreboards (levels 4-7 are slow on 2 cores)
ANS0_MB = 256           # the entropy-stage encode kernel (amortizes dispatch)
ANS0_DEC_MB = 48        # the decode kernel (0.2 GB/s/cell class)
BLOCK = 4 << 20


def _corpus(size: int, seed: int = 0) -> np.ndarray:
    from kanzi_tpu.utils.corpus import mixed_corpus
    return mixed_corpus(size, seed=seed) if seed else mixed_corpus(size)


def bench_l1_tpu(data: np.ndarray):
    """Full l1 encode: blocks -> device LZX batch (packed-token fetch +
    overlapped host emit) -> framed payload bytes.
    Returns (e2e GB/s, device-analyze GB/s, ratio)."""
    import jax.numpy as jnp

    from kanzi_tpu.core.bits import BitWriter
    from kanzi_tpu.ops import lz_sort as L

    blocks = [data[i:i + BLOCK] for i in range(0, data.size, BLOCK)]

    def run():
        res = L.lzx_forward_device_batch(blocks)
        bw = BitWriter()
        total = 0
        for b, r in zip(blocks, res):
            payload = r if r is not None else b  # copy-block fallback
            bw.write_bits(len(payload), 32)
            bw.write_bytes(payload.tobytes() if hasattr(payload, "tobytes")
                           else bytes(payload))
            total += len(payload)
        return bw.getvalue()

    blob = run()  # warm (compile via persistent cache)
    t0 = time.perf_counter()
    blob = run()
    e2e = data.size / (time.perf_counter() - t0) / 1e9

    # device-resident analyze: blocks already in HBM, tokens stay on
    # device (the production model: payloads consumed device-side / over
    # ICI; this box's d2h tunnel is a dev-harness artifact).  Grouped
    # exactly like the production dispatch (FLAT_GROUP whole blocks per
    # launch, async pipelined).
    G = L.FLAT_GROUP
    bucket = L._flat_bucket(BLOCK)
    groups = []
    for g0 in range(0, len(blocks) - len(blocks) % G, G):
        grp = blocks[g0:g0 + G]
        bufs = np.zeros((G, bucket), np.uint8)
        send = np.full(G, -18, np.int32)
        mdist = np.zeros(G, np.int32)
        for j, b in enumerate(grp):
            bufs[j, :b.size] = b
            send[j] = b.size - 18
            mdist[j] = L._block_max_dist(b.size)
        groups.append((jnp.asarray(bufs), jnp.asarray(send),
                       jnp.asarray(mdist)))
    fn = L._analyze_flat_jit(4)
    _ = int(fn(*groups[0])[2])  # warm
    t0 = time.perf_counter()
    outs = [fn(*g) for g in groups]            # async pipeline
    _ = [int(o[2]) for o in outs]
    dev = (len(groups) * G * BLOCK) / (time.perf_counter() - t0) / 1e9
    return e2e, dev, len(blob) / data.size


def bench_tpu_ans0(data: np.ndarray, iters: int = 3) -> float:
    import jax.numpy as jnp

    from kanzi_tpu.ops.ans_pallas import CHUNK, ans0_encode_device

    n = data.size // CHUNK
    dch = jnp.asarray(data[:n * CHUNK].reshape(n, CHUNK))
    out = ans0_encode_device(dch)
    _ = np.asarray(out[2][:2])
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out = ans0_encode_device(dch)
        _ = np.asarray(out[2][:2])
        best = min(best, time.perf_counter() - t0)
    return (n * CHUNK) / best / 1e9


def bench_tpu_ans0_decode(data: np.ndarray, iters: int = 3) -> float:
    """Device ANS0 decode kernel rate: encode once on device (tables,
    states, payloads), then time the decode kernel on the same chunks."""
    import jax
    import jax.numpy as jnp

    from kanzi_tpu.ops import ans as jans
    from kanzi_tpu.ops.ans_pallas import (CHUNK, _normalize_freqs_jax,
                                          ans0_decode_chunks_pallas)

    n = data.size // CHUNK
    chunks = data[:n * CHUNK].reshape(n, CHUNK)
    hist = np.stack([np.bincount(r, minlength=256) for r in chunks])
    freq = np.asarray(_normalize_freqs_jax(
        jnp.asarray(hist), 14, 1 << jans.LOG_RANGE)).astype(np.int64)
    cum = np.concatenate([np.zeros((n, 1), np.int64),
                          np.cumsum(freq, axis=1)[:, :-1]], axis=1)
    pay16, n_emit, states = jans.ans0_encode_chunks(
        jnp.asarray(chunks), jnp.asarray(freq, jnp.int32),
        jnp.asarray(cum, jnp.int32))
    pay16 = np.asarray(pay16)
    n_emit = np.asarray(n_emit)
    states = np.asarray(states)
    maxb = int(n_emit.max()) * 2 + 8
    pay = np.zeros((n, maxb), np.uint8)
    for i in range(n):
        w = pay16[i, :n_emit[i]]
        pay[i, :2 * n_emit[i]:2] = w >> 8
        pay[i, 1:2 * n_emit[i] + 1:2] = w & 0xFF
    args = (jnp.asarray(pay), jnp.asarray(states, jnp.int32),
            jnp.asarray(freq, jnp.int32), jnp.asarray(cum, jnp.int32))
    out, used = ans0_decode_chunks_pallas(*args)
    assert np.array_equal(np.asarray(out), chunks), "device decode mismatch"
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out, used = ans0_decode_chunks_pallas(*args)
        _ = np.asarray(used[:2])
        best = min(best, time.perf_counter() - t0)
    return (n * CHUNK) / best / 1e9


def bench_cpu_level(data: np.ndarray, level: int, jobs: int = 0,
                    iters: int = 2) -> tuple[float, float, float]:
    """Host path for one level: returns (enc GB/s, dec GB/s, ratio)."""
    import os

    from kanzi_tpu.app.block_compressor import LEVELS, BlockCompressor
    from kanzi_tpu.io.stream import CompressedInputStream
    t, e, b = LEVELS[level]
    jobs = jobs or (os.cpu_count() or 2)
    bc = BlockCompressor(transform=t, entropy=e, block_size=b, jobs=jobs)
    raw = data.tobytes()
    blob = bc.compress_bytes(raw)  # warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        blob = bc.compress_bytes(raw)
        best = min(best, time.perf_counter() - t0)
    best_d = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = CompressedInputStream(io.BytesIO(blob),
                                    {"jobs": jobs}).read(-1)
        best_d = min(best_d, time.perf_counter() - t0)
    assert out == raw, f"level {level} round-trip mismatch"
    return (data.size / best / 1e9, data.size / best_d / 1e9,
            len(blob) / data.size)


def scoreboard(data: np.ndarray, err, tag: str, device_gates: bool) -> dict:
    """Per level 1..9: compressed size + encode/decode GB/s, host path vs
    device gates (a device engine must never produce a larger stream than
    the host path it replaces).  Measurement rules (VERDICT r4 weak #4 +
    next #2): best-of-N timing per cell; levels whose block size exceeds
    the slice get enough data for TWO blocks so both jobs stay busy (the
    reference's numbers come from 13+ blocks over 16 cores); l8/l9 run a
    4 MiB slice (TPAQ/TPAQX are ~15 MB/s-class by design).
    Device gates: LZ/LZX sort engine (l1), device Huffman (l2, l3),
    device ANS0 (l5)."""
    import os

    from kanzi_tpu.app.block_compressor import LEVELS, BlockCompressor
    from kanzi_tpu.io.stream import CompressedInputStream

    board = {}
    for level in range(1, 10):
        t, e, b = LEVELS[level]
        if level >= 8:
            d = data[:4 << 20]
            iters_e, iters_d = 1, 1     # TPAQ at ~4 MiB: one timed pass
            jobs = 1                    # one block => one active core; a
            #                             2-job pool would halve the
            #                             per-core normalization unfairly
        else:
            # at least two blocks so both jobs stay busy (l7's 16 MiB
            # block would otherwise serialize on a 16 MiB slice)
            want = max(SCORE_MB << 20, 2 * b)
            d = data[:min(want, data.size)]
            iters_e, iters_d = 2, 3
            jobs = 2
        raw = d.tobytes()
        bc = BlockCompressor(transform=t, entropy=e, block_size=b, jobs=jobs)
        t_host = float("inf")
        for _ in range(iters_e):
            t0 = time.perf_counter()
            blob = bc.compress_bytes(raw)
            t_host = min(t_host, time.perf_counter() - t0)
        host = len(blob)
        t_dec = float("inf")
        for _ in range(iters_d):
            t0 = time.perf_counter()
            out = CompressedInputStream(io.BytesIO(blob),
                                        {"jobs": jobs}).read(-1)
            t_dec = min(t_dec, time.perf_counter() - t0)
        assert out == raw, f"{tag} l{level} round-trip mismatch"
        dev = None
        gates = {1: {"KANZI_TPU_DEVICE_LZ": "1"},
                 2: {"KANZI_TPU_DEVICE_HUFFMAN": "1"},
                 3: {"KANZI_TPU_DEVICE_HUFFMAN": "1"},
                 5: {"KANZI_TPU_DEVICE_ANS": "1"}}
        if device_gates and level in gates:
            env = gates[level]
            old = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                dev = len(bc.compress_bytes(raw))
            except Exception as ex:  # pragma: no cover
                print(f"{tag} l{level} device path failed: {ex}", file=err)
            finally:
                for k, v in old.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        enc_g = d.size / t_host / 1e9
        dec_g = d.size / t_dec / 1e9
        board[level] = {"host": host, "device": dev,
                        "slice_mb": d.size >> 20, "jobs": jobs,
                        "ratio": round(host / d.size, 4),
                        "host_gbps": round(enc_g, 4),
                        "host_dec_gbps": round(dec_g, 4)}
        flag = ""
        if dev is not None:
            flag = " DEVICE>HOST!" if dev > host else " ok"
        print(f"{tag} l{level}: host {host} ratio {host/d.size:.4f}"
              + (f" device {dev}{flag}" if dev is not None else "")
              + f" (enc {enc_g:.3f} / dec {dec_g:.3f} GB/s host, "
              + f"{d.size >> 20} MiB best-of-{iters_e}/{iters_d})",
              file=err)
    return board


def box_calibration(data: np.ndarray, err) -> dict:
    """Single-core speed of THIS box vs the reference's 9950X, measured
    with bzip2 -9 (always single-threaded, BWT+Huffman — the same workload
    family as levels 5-7).  BASELINE.md pins bzip2 -9 on silesia on the
    reference box at 8223 ms enc / 3453 ms dec for 211,957,760 bytes
    (reference README.md:69-94): 0.0258 enc / 0.0614 dec GB/s.  The factor
    carries a data-mix caveat (silesia vs this corpus) but anchors the
    \"x ref/core\" proxy columns to a measured core-speed ratio instead of
    assuming equal cores.
    """
    import shutil
    import subprocess
    import tempfile
    if shutil.which("bzip2") is None:
        return {}
    REF_ENC, REF_DEC = 0.02578, 0.06139  # GB/s, 9950X on silesia
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "c.bin")
        bz = os.path.join(td, "c.bz2")
        blob = data[: 16 << 20].tobytes()
        with open(raw, "wb") as f:
            f.write(blob)
        enc_t = dec_t = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            with open(raw, "rb") as fi, open(bz, "wb") as fo:
                subprocess.run(["bzip2", "-9", "-c"], stdin=fi, stdout=fo,
                               check=True)
            enc_t = min(enc_t, time.perf_counter() - t0)
            t0 = time.perf_counter()
            with open(bz, "rb") as fi:
                subprocess.run(["bzip2", "-d", "-c"], stdin=fi,
                               stdout=subprocess.DEVNULL, check=True)
            dec_t = min(dec_t, time.perf_counter() - t0)
    enc_g = len(blob) / enc_t / 1e9
    dec_g = len(blob) / dec_t / 1e9
    out = {"bzip2_box_enc_gbps": round(enc_g, 4),
           "bzip2_box_dec_gbps": round(dec_g, 4),
           "core_speed_vs_ref_enc": round(enc_g / REF_ENC, 3),
           "core_speed_vs_ref_dec": round(dec_g / REF_DEC, 3)}
    print(f"calibration: bzip2 -9 single-core on this box "
          f"{enc_g:.4f} enc / {dec_g:.4f} dec GB/s vs the reference "
          f"9950X's {REF_ENC:.4f}/{REF_DEC:.4f} on silesia -> this core "
          f"runs the BWT workload family at {enc_g / REF_ENC:.2f}x enc / "
          f"{dec_g / REF_DEC:.2f}x dec of a reference core "
          f"(x-ref/core proxies divide by this to compare like-for-like)",
          file=err)
    return out


def tunnel_d2h_rate() -> float:
    import jax.numpy as jnp
    d = jnp.asarray(np.zeros(4 << 20, np.uint8))
    _ = np.asarray(d[:64])
    t0 = time.perf_counter()
    _ = np.asarray(d)
    return d.size / (time.perf_counter() - t0) / 1e9


def main() -> None:
    data = _corpus(CORPUS_MB << 20)
    err = sys.stderr
    # CPU first (TPU client threads would steal the pool's cores)
    host = host_dec = ratio_h = 0.0
    try:
        host, host_dec, ratio_h = bench_cpu_level(data[:32 << 20], 1)
        print(f"secondary: l1 cpu e2e enc {host:.3f} / dec {host_dec:.3f} "
              f"GB/s ratio {ratio_h:.3f} (ref e2e {BASELINE[1]} enc / "
              f"{BASELINE_DEC[1]} dec GB/s)", file=err)
    except Exception as e:  # pragma: no cover
        print(f"secondary cpu bench failed: {e}", file=err)
    board = {}
    try:
        # 32 MiB so the l7 row gets two 16 MiB blocks (both jobs busy)
        board = scoreboard(_corpus(32 << 20, seed=0), err,
                           "scoreboard", device_gates=True)
    except Exception as e:  # pragma: no cover
        print(f"ratio scoreboard failed: {e}", file=err)
    # the REAL-FILE corpus (silesia-style, frozen by SHA)
    real_board = {}
    real_sha = None
    try:
        from kanzi_tpu.utils.corpus import real_corpus
        rdata, real_sha, breakdown = real_corpus(64 << 20)
        print(f"real corpus sha256 {real_sha[:16]}.. sections {breakdown}",
              file=err)
        real_board = scoreboard(rdata[:32 << 20], err, "real",
                                device_gates=False)
        for lv, tgt in SILESIA_RATIO.items():
            if lv in real_board:
                real_board[lv]["silesia_ratio_other_dataset"] = tgt
    except Exception as e:  # pragma: no cover
        print(f"real corpus scoreboard failed: {e}", file=err)
    calib = {}
    try:
        calib = box_calibration(data, err)
    except Exception as e:  # pragma: no cover
        print(f"box calibration failed: {e}", file=err)
    # annotate scoreboard rows with per-core parity, raw AND calibrated
    # (raw divides by the reference's per-core rate as if cores were
    # equal; calibrated divides that by the measured bzip2 core factor)
    try:
        for b in (board, real_board):
            for lv, row in b.items():
                jobs = row.get("jobs", 1) or 1
                enc_pc = row["host_gbps"] / jobs
                dec_pc = row["host_dec_gbps"] / jobs
                row["x_ref_core_enc"] = round(
                    enc_pc / (BASELINE_ENC[lv] / REF_CORES), 3)
                row["x_ref_core_dec"] = round(
                    dec_pc / (BASELINE_DEC[lv] / REF_CORES), 3)
                if calib:
                    row["x_ref_core_enc_calibrated"] = round(
                        row["x_ref_core_enc"]
                        / calib["core_speed_vs_ref_enc"], 2)
                    row["x_ref_core_dec_calibrated"] = round(
                        row["x_ref_core_dec"]
                        / calib["core_speed_vs_ref_dec"], 2)
    except Exception as e:  # pragma: no cover
        print(f"parity annotation failed: {e}", file=err)
    dev_e2e = dev_pipe = d2h = ans0 = ans0_dec = 0.0
    ratio_d = 1.0
    try:
        dev_e2e, dev_pipe, ratio_d = bench_l1_tpu(data)
        d2h = tunnel_d2h_rate()
        print(f"secondary: l1 tpu e2e-incl-tunnel {dev_e2e:.3f} GB/s "
              f"(packed-token fetch + overlapped host emit) | "
              f"device-analyze {dev_pipe:.3f} GB/s | ratio {ratio_d:.3f} | "
              f"dev-box tunnel d2h {d2h*1000:.0f} MB/s", file=err)
        try:
            big = _corpus(ANS0_MB << 20, seed=7)
            ans0 = bench_tpu_ans0(big)
            print(f"secondary: ans0 entropy-stage kernel enc {ans0:.2f} "
                  f"GB/s at {ANS0_MB} MiB (r1 headline)", file=err)
        except Exception as e:
            print(f"secondary ans0 bench failed: {e}", file=err)
        try:
            dd = _corpus(ANS0_DEC_MB << 20, seed=8)
            ans0_dec = bench_tpu_ans0_decode(dd)
            print(f"secondary: ans0 entropy-stage kernel dec {ans0_dec:.3f} "
                  f"GB/s/chip at {ANS0_DEC_MB} MiB; decode scale-out = "
                  f"chunks across chips (parallel/engine.make_decode_step, "
                  f"dryrun-verified) -> 8-chip mesh aggregate "
                  f"~{ans0_dec*8:.2f} GB/s projected", file=err)
        except Exception as e:
            print(f"secondary ans0 decode bench failed: {e}", file=err)
        try:
            from kanzi_tpu.ops.bwt_tpu import suffix_array_device
            blk4 = data[:4 << 20]
            _ = suffix_array_device(blk4)  # warm/compile
            t0 = time.perf_counter()
            _ = suffix_array_device(blk4)
            sa_gbps = blk4.size / (time.perf_counter() - t0) / 1e9
            print(f"secondary: device suffix array (l5 BWT stage) "
                  f"{sa_gbps:.4f} GB/s at 4 MiB incl tunnel fetch "
                  f"(host SA-IS 0.011 GB/s on one core of this box; "
                  f"device gate = offload, not latency)", file=err)
        except Exception as e:
            print(f"secondary device-SA bench failed: {e}", file=err)
    except Exception as e:
        print(f"TPU bench failed ({e})", file=err)
    # headline: level-1 end-to-end with the fastest engine available in
    # THIS environment (the framework routes per-block work the same way).
    # On this dev box the TPU sits behind a slow d2h tunnel, so the host
    # C++ path wins e2e; on directly-attached TPUs the device pipeline
    # (reported alongside) takes over.
    value, ratio = (host, ratio_h) if host >= dev_e2e else (dev_e2e, ratio_d)
    dev_le_host = all(v["device"] is None or v["device"] <= v["host"]
                      for v in board.values()) if board else None
    print(json.dumps({
        "metric": "l1_encode_e2e",
        "value": round(value, 4), "unit": "GB/s",
        "vs_baseline": round(value / BASELINE[1], 3),
        "ratio": round(ratio, 4),
        "host_cpu_gbps": round(host, 4),
        "host_cpu_dec_gbps": round(host_dec, 4),
        "device_e2e_incl_tunnel_gbps": round(dev_e2e, 4),
        "device_analyze_gbps": round(dev_pipe, 4),
        "device_ans0_enc_gbps": round(ans0, 3),
        "device_ans0_dec_gbps_per_chip": round(ans0_dec, 3),
        "tunnel_d2h_mbps": round(d2h * 1000, 1),
        "ratio_scoreboard": {f"l{k}": v for k, v in board.items()},
        "real_corpus": {"sha256": real_sha,
                        "levels": {f"l{k}": v
                                   for k, v in real_board.items()}},
        "device_ratio_le_host": dev_le_host,
        "box_calibration": calib,
        "note": ("best available engine end-to-end on a 64 MiB mixed "
                 "corpus; scoreboards carry enc AND dec GB/s incl l8/l9; "
                 "real-corpus silesia_ratio_other_dataset is trend "
                 "context from a DIFFERENT dataset, not a target; device "
                 "l1 analyze is at its measured sort-floor ceiling "
                 "(docs/kernels.md round-5 verdict) — the TPU l1 story "
                 "is mesh scale-out; this box: 2 CPU cores + 1 v5e "
                 "behind a slow d2h tunnel "
                 "(reference baseline: 16-core Ryzen 9950X)")}))
    # short headline AFTER the full JSON: the driver archives the last
    # 2000 chars of stdout, which the big line alone overflows
    print(f"HEADLINE l1_encode_e2e {value:.4f} GB/s vs_baseline "
          f"{value / BASELINE[1]:.3f} ratio {ratio:.4f} | "
          f"l1 dec {host_dec:.3f} GB/s | device_ratio_le_host "
          f"{dev_le_host} | box_core_vs_ref "
          f"{calib.get('core_speed_vs_ref_enc', '?')}x enc / "
          f"{calib.get('core_speed_vs_ref_dec', '?')}x dec (bzip2 anchor)")


if __name__ == "__main__":
    main()
