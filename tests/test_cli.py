"""CLI behavior tests (kanzi_tpu.app.__main__) — flag semantics that the
library-level tests do not cover: directory inputs/outputs, -o NONE,
overwrite protection (K/app/Kanzi.java + BlockCompressor.java semantics).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from kanzi_tpu.app.__main__ import main
from kanzi_tpu.core.errors import Error


@pytest.fixture
def tree(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "src"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(bytes(rng.integers(65, 91, 50000, dtype=np.uint8)))
    (d / "sub" / "b.bin").write_bytes(b"hello world " * 4000)
    return d


def test_dir_output_must_exist(tree, tmp_path, capsys):
    rc = main(["-c", "-f", "-i", str(tree), "-o", str(tmp_path / "missing"),
               "-l", "1", "-v", "0"])
    assert rc == Error.ERR_CREATE_FILE
    assert "existing directory" in capsys.readouterr().err


def test_dir_round_trip_mirrors_subpaths(tree, tmp_path):
    out = tmp_path / "out"
    dec = tmp_path / "dec"
    out.mkdir()
    dec.mkdir()
    assert main(["-c", "-f", "-i", str(tree), "-o", str(out),
                 "-l", "1", "-v", "0"]) == 0
    assert (out / "a.bin.knz").is_file()
    assert (out / "sub" / "b.bin.knz").is_file()
    assert main(["-d", "-f", "-i", str(out), "-o", str(dec),
                 "-v", "0"]) == 0
    assert (dec / "a.bin").read_bytes() == (tree / "a.bin").read_bytes()
    assert (dec / "sub" / "b.bin").read_bytes() == \
        (tree / "sub" / "b.bin").read_bytes()


def test_dir_without_output_writes_beside_inputs(tree):
    assert main(["-c", "-f", "-i", str(tree), "-l", "1", "-v", "0"]) == 0
    assert (tree / "a.bin.knz").is_file()
    assert (tree / "sub" / "b.bin.knz").is_file()


def test_output_none_sink(tree):
    assert main(["-c", "-f", "-i", str(tree / "a.bin"), "-o", "NONE",
                 "-l", "1", "-v", "0"]) == 0


def test_overwrite_protection(tree, tmp_path):
    out = tmp_path / "x.knz"
    assert main(["-c", "-i", str(tree / "a.bin"), "-o", str(out),
                 "-l", "1", "-v", "0"]) == 0
    rc = main(["-c", "-i", str(tree / "a.bin"), "-o", str(out),
               "-l", "1", "-v", "0"])
    assert rc == Error.ERR_OVERWRITE_FILE
    assert main(["-c", "-f", "-i", str(tree / "a.bin"), "-o", str(out),
                 "-l", "1", "-v", "0"]) == 0


@pytest.mark.parametrize("chain,entropy", [
    ("BWT+MTFT+ZRLT", "RANGE"),     # classic bzip-style stack, range coder
    ("BWTS+SRT", "FPAQ"),           # bijective BWT (in no level preset)
    ("RLT+TEXT", "HUFFMAN"),
    ("LZP+ZRLT", "ANS1"),
    ("MM+PACK", "ANS0"),
    ("EXE+LZX", "CM"),
])
def test_custom_chain_cli_round_trip(tree, tmp_path, chain, entropy):
    """Non-preset -t/-e combos through the CLI: the chain-string -> 48-bit
    descriptor -> writer -> reader path for transforms outside the level
    table (TransformFactory.java:132-158; Kanzi.java -t/-e flags)."""
    src = tree / "sub" / "b.bin"
    knz = tmp_path / "c.knz"
    out = tmp_path / "c.out"
    assert main(["-c", "-i", str(src), "-o", str(knz), "-t", chain,
                 "-e", entropy, "-f", "-v", "0"]) == 0
    assert main(["-d", "-i", str(knz), "-o", str(out), "-f", "-v", "0"]) == 0
    assert out.read_bytes() == src.read_bytes()


def test_benchmark_harness_smoke():
    """The sweep harness (app/benchmark.py, Benchmark.java:38-484
    equivalent) runs level and config benchmarks with verified
    round-trips."""
    from kanzi_tpu.app import benchmark as B
    data = (b"benchmark harness smoke payload 0123456789 " * 1500)
    res = B.run_levels(data, levels=[0, 1, 5], jobs=2)
    assert [r.in_size for r in res] == [len(data)] * 3
    assert res[1].ratio < 1.0          # l1 compresses this
    r = B.run_config(data, "BWT+RANK+ZRLT", "ANS0", 1 << 20, jobs=1)
    assert r.out_size < len(data)
