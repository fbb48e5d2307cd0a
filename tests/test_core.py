"""Core utility tests: Global tables, data-type detection, magic, xxhash."""

import numpy as np

from kanzi_tpu.core import globals as g
from kanzi_tpu.core import magic
from kanzi_tpu.utils import xxhash
from kanzi_tpu.utils.native import get_lib


def test_log2_values_table():
    # spot values lifted from the spec (K/Global.java:92-101)
    assert g.LOG2_VALUES[0] == 0
    assert g.LOG2_VALUES[1] == 1
    assert g.LOG2_VALUES[2] == 1
    assert g.LOG2_VALUES[6] == 2
    assert g.LOG2_VALUES[7] == 3
    assert g.LOG2_VALUES[255] == 8


def test_log2_4096_table():
    # spot values from K/Global.java:103-123
    expected = {0: 0, 1: 0, 2: 4096, 3: 6492, 4: 8192, 5: 9511, 6: 10588,
                7: 11499, 16: 16384, 32: 20480, 64: 24576, 128: 28672,
                255: 32745, 256: 32768}
    for x, v in expected.items():
        assert int(g.LOG2_4096[x]) == v, (x, int(g.LOG2_4096[x]), v)


def test_squash_stretch_inverse():
    assert g.squash(2048) == 4095
    assert g.squash(0) == 2048
    # stretch(squash(x)) ~= x
    # tails saturate, so only check the informative middle range
    for x in range(-1024, 1025, 97):
        assert abs(int(g.STRETCH[g.squash(x)]) - x) <= 32


def test_log2_1024():
    assert g.log2_1024(1) == 0
    assert g.log2_1024(2) == 1024
    assert g.log2_1024(1024) == 10240
    assert abs(g.log2_1024(1000) - int(1024 * np.log2(1000))) <= 10


def test_entropy_bounds(rng):
    data = rng.integers(0, 256, size=65536, dtype=np.uint8)
    h = g.histogram_order0(data)
    e = g.first_order_entropy_1024(65536, h)
    assert 1000 <= e <= 1024  # random data ~ max entropy
    flat = np.zeros(256, dtype=np.int64)
    flat[65] = 65536
    assert g.first_order_entropy_1024(65536, flat) == 0


def test_detect_simple_type():
    dna = np.frombuffer(b"ACGTACGTACGTNNNACGT" * 100, dtype=np.uint8)
    assert g.detect_simple_type(dna.size, g.histogram_order0(dna)) == g.DataType.DNA
    num = np.frombuffer(b"123456.789, 42:+/=" * 50, dtype=np.uint8)
    assert g.detect_simple_type(num.size, g.histogram_order0(num)) == g.DataType.NUMERIC
    small = np.frombuffer(b"\x00\x01" * 100, dtype=np.uint8)
    assert g.detect_simple_type(small.size, g.histogram_order0(small)) == g.DataType.SMALL_ALPHABET


def test_jobs_per_task():
    assert g.compute_jobs_per_task(7, 3) == [3, 2, 2]
    assert g.compute_jobs_per_task(2, 4) == [1, 1, 1, 1]
    assert g.compute_jobs_per_task(8, 4) == [2, 2, 2, 2]


def test_magic_detection():
    assert magic.get_type(b"\x89PNG\r\n") == magic.PNG_MAGIC
    assert magic.get_type(b"KANZxxxx") == magic.KNZ_MAGIC
    assert magic.get_type(b"BZh91AY") == magic.BZIP2_MAGIC
    assert magic.get_type(b"\x1f\x8b\x08\x00") == magic.GZIP_MAGIC
    assert magic.get_type(b"hello world") == magic.NO_MAGIC
    assert magic.is_compressed(magic.PNG_MAGIC)
    assert magic.is_executable(magic.ELF_MAGIC)
    assert magic.is_multimedia(magic.BMP_MAGIC)


def test_xxhash_native_matches_python(rng):
    lib = get_lib()
    assert lib is not None, "native library failed to build"
    for n in [0, 1, 3, 4, 15, 16, 17, 31, 32, 33, 100, 1000, 4096]:
        buf = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        for seed in (0, 0x4B414E5A, 0xFFFFFFFF):
            assert xxhash._xxhash32_py(buf, seed) == int(lib.kz_xxhash32(buf, n, seed))
            assert xxhash._xxhash64_py(buf, seed) == int(lib.kz_xxhash64(buf, n, seed))


def test_xxhash32_known_vector():
    # canonical xxh32 test vector (the 32-bit variant is canonical xxHash)
    assert xxhash._xxhash32_py(b"", 0) == 0x02CC5D05
    assert xxhash._xxhash32_py(b"", 0x9E3779B1) == 0x36B78AE7


def test_lyndon_factorization():
    from kanzi_tpu.utils.lyndon import lyndon_words
    assert lyndon_words(b"banana") == [b"b", b"an", b"an", b"a"]
    assert lyndon_words(b"aaab") == [b"aaab"]
    assert lyndon_words(b"") == []


def test_sorts(rng):
    from kanzi_tpu.utils import sorts
    for cls in (sorts.QuickSort, sorts.RadixSort, sorts.BucketSort,
                sorts.MergeSort, sorts.HeapSort, sorts.InsertionSort):
        data = rng.integers(0, 200, 500).astype(np.int64)
        expect = np.sort(data.copy())
        inst = cls()
        inst.sort(data)
        np.testing.assert_array_equal(data, expect)


def test_debug_bitstreams(rng):
    import io as pyio
    from kanzi_tpu.core.bits import BitReader, BitWriter
    from kanzi_tpu.core.debug_bits import DebugInputBitStream, DebugOutputBitStream
    sink = pyio.StringIO()
    bw = DebugOutputBitStream(BitWriter(), out=sink)
    bw.write_bits(0b101, 3)
    bw.write_bits(0xFF, 8)
    data = bw.delegate.getvalue()
    assert "101" in sink.getvalue().replace("\n", "")
    sink2 = pyio.StringIO()
    br = DebugInputBitStream(BitReader(data), out=sink2)
    assert br.read_bits(3) == 0b101
    assert br.read_bits(8) == 0xFF


def test_ioutil(tmp_path):
    from kanzi_tpu.io.ioutil import create_file_list, sort_files_by_path_and_size
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "f1.txt").write_bytes(b"x" * 100)
    (tmp_path / "a" / "f2.txt").write_bytes(b"x" * 10)
    (tmp_path / ".hidden").write_bytes(b"h")
    files = create_file_list(str(tmp_path), skip_dot_files=True)
    assert len(files) == 2
    sort_files_by_path_and_size(files, True)
    assert files[0].name == "f1.txt"  # bigger first within dir
