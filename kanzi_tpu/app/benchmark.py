"""Benchmark sweep harness (K/app/Benchmark.java:38-484 equivalent).

Sweeps level presets, block sizes and transform x entropy combos over a data
sample, running round-trips and reporting encode/decode throughput + ratio.
Usable as a library or `python -m kanzi_tpu.app.benchmark <file>`.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

from .block_compressor import LEVELS, BlockCompressor
from .block_decompressor import BlockDecompressor


@dataclass
class Result:
    config: str
    in_size: int
    out_size: int
    enc_mbps: float
    dec_mbps: float

    @property
    def ratio(self) -> float:
        return self.out_size / self.in_size if self.in_size else 0.0

    def __str__(self) -> str:
        return (f"{self.config:36s} {self.out_size:10d} ({self.ratio:6.4f}) "
                f"enc {self.enc_mbps:8.1f} MB/s  dec {self.dec_mbps:8.1f} MB/s")


def run_config(data: bytes, transform: str, entropy: str, block_size: int,
               jobs: int = 4) -> Result:
    bc = BlockCompressor(transform=transform, entropy=entropy,
                         block_size=block_size, jobs=jobs)
    t0 = time.perf_counter()
    blob = bc.compress_bytes(data)
    t1 = time.perf_counter()
    out = BlockDecompressor(jobs=jobs).decompress_bytes(blob)
    t2 = time.perf_counter()
    if out != data:
        raise RuntimeError(f"round-trip failed for {transform}+{entropy}")
    n = len(data)
    return Result(f"{transform}+{entropy} b={block_size >> 20}M", n, len(blob),
                  n / 1e6 / max(t1 - t0, 1e-9), n / 1e6 / max(t2 - t1, 1e-9))


def run_levels(data: bytes, levels=None, jobs: int = 4) -> list[Result]:
    results = []
    for lvl in (levels or range(10)):
        t, e, b = LEVELS[lvl]
        r = run_config(data, t, e, b, jobs)
        r.config = f"-l {lvl} ({t}+{e})"
        results.append(r)
        print(r, flush=True)
    return results


def run_block_size_sweep(data: bytes, transform: str = "LZX",
                         entropy: str = "HUFFMAN", jobs: int = 4) -> list[Result]:
    results = []
    for b in (1 << 20, 4 << 20, 16 << 20):
        r = run_config(data, transform, entropy, b, jobs)
        results.append(r)
        print(r, flush=True)
    return results


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m kanzi_tpu.app.benchmark <file> [levels...]",
              file=sys.stderr)
        return 1
    data = open(args[0], "rb").read()
    levels = [int(x) for x in args[1:]] or None
    print(f"Benchmarking {args[0]} ({len(data)} bytes)")
    run_levels(data, levels)
    return 0


if __name__ == "__main__":
    sys.exit(main())
