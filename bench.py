"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (round 1): chunk-parallel rANS (ANS0, wire format v7) entropy
encode throughput on one TPU chip — the stage-2 compute kernel of the
level-5 pipeline, via the Pallas kernels in ops/ans_pallas.py (dynamic-
gather table lookup, single-launch 4096-step state scan, MXU stable-
partition payload compaction), measured on a 896 MiB device-resident
batch (one jit call; includes the tunnel's ~23 ms dispatch round-trip).

vs_baseline compares against the closest published reference number that
exercises its ANS stage: kanzi -l5 end-to-end encode on silesia
(0.123 GB/s single CPU, BASELINE.md).  Secondary numbers (CPU end-to-end
levels) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_L5_ENC_GBPS = 0.123  # silesia -l5 encode, AMD 9950X (BASELINE.md)
BASELINE_L1_ENC_GBPS = 0.416


def _corpus(size: int) -> np.ndarray:
    """Deterministic text-heavy corpus built from the repo's own sources."""
    import glob
    parts = []
    for pat in ("kanzi_tpu/**/*.py", "native/*.cpp", "*.md"):
        for f in sorted(glob.glob(pat, recursive=True)):
            with open(f, "rb") as fh:
                parts.append(fh.read())
    base = b"".join(parts)
    reps = size // len(base) + 1
    return np.frombuffer((base * reps)[:size], dtype=np.uint8)


def bench_tpu_ans0(data: np.ndarray, iters: int = 5) -> float:
    import jax.numpy as jnp
    from kanzi_tpu.ops.ans_pallas import CHUNK, ans0_encode_device

    n = data.size // CHUNK
    dch = jnp.asarray(data[:n * CHUNK].reshape(n, CHUNK))
    # compile (the axon tunnel's block_until_ready does not sync; force a
    # small device->host fetch instead)
    out = ans0_encode_device(dch)
    _ = np.asarray(out[2][:2])
    best = float("inf")
    for _i in range(iters):
        t0 = time.perf_counter()
        out = ans0_encode_device(dch)
        _ = np.asarray(out[2][:2])
        best = min(best, time.perf_counter() - t0)
    return (n * CHUNK) / best / 1e9


def bench_cpu_level(data: np.ndarray, level: int, jobs: int = 0,
                    iters: int = 3) -> tuple[float, float]:
    import os

    from kanzi_tpu.app.block_compressor import LEVELS, BlockCompressor
    t, e, b = LEVELS[level]
    jobs = jobs or (os.cpu_count() or 2)
    bc = BlockCompressor(transform=t, entropy=e, block_size=b, jobs=jobs)
    raw = data.tobytes()
    blob = bc.compress_bytes(raw)  # warmup (native lib load, pool spinup)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        blob = bc.compress_bytes(raw)
        best = min(best, time.perf_counter() - t0)
    return data.size / best / 1e9, len(blob) / data.size


def main() -> None:
    size = 896 * 1024 * 1024
    data = _corpus(size)
    # CPU secondary first: the TPU client's runtime threads would otherwise
    # steal cores from the thread-pooled block engine.
    try:
        l1, r1 = bench_cpu_level(data[:32 * 1024 * 1024], 1)
        print(f"secondary: l1 cpu encode {l1:.3f} GB/s ratio {r1:.3f} "
              f"(ref 0.416 GB/s)", file=sys.stderr)
    except Exception as e:
        print(f"secondary bench failed: {e}", file=sys.stderr)
    try:
        gbps = bench_tpu_ans0(data)
        metric = "ans0_entropy_encode_tpu_1chip"
        base = BASELINE_L5_ENC_GBPS
    except Exception as e:
        print(f"TPU bench failed ({e}); falling back to CPU -l1", file=sys.stderr)
        gbps, ratio = bench_cpu_level(data[:16 * 1024 * 1024], 1)
        metric = "l1_encode_cpu"
        base = BASELINE_L1_ENC_GBPS
    print(json.dumps({"metric": metric, "value": round(gbps, 4),
                      "unit": "GB/s", "vs_baseline": round(gbps / base, 3)}))


if __name__ == "__main__":
    main()
