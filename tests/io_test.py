import numpy as np
import pytest

import vaex_tpu as vaex


def roundtrip_check(df, df2):
    assert len(df2) == len(df)
    for name in df.get_column_names():
        a = df.evaluate(name)
        b = df2.evaluate(name)
        a_list = a.to_pylist() if hasattr(a, "to_pylist") else (
            [None if m else v for v, m in zip(np.asarray(a.data if np.ma.isMaskedArray(a) else a),
                                              np.ma.getmaskarray(a) if np.ma.isMaskedArray(a) else [False] * len(a))])
        b_list = b.to_pylist() if hasattr(b, "to_pylist") else (
            [None if m else v for v, m in zip(np.asarray(b.data if np.ma.isMaskedArray(b) else b),
                                              np.ma.getmaskarray(b) if np.ma.isMaskedArray(b) else [False] * len(b))])
        for va, vb in zip(a_list, b_list):
            if isinstance(va, float) and isinstance(vb, float) and np.isnan(va) and np.isnan(vb):
                continue
            assert va == vb, f"column {name}: {va!r} != {vb!r}"


def test_hdf5_roundtrip(df_local, tmp_path):
    path = str(tmp_path / "test.hdf5")
    df = df_local.drop("name")  # object arrays stored as strings, skip
    df.export_hdf5(path)
    df2 = vaex.open(path)
    roundtrip_check(df, df2)


def test_arrow_roundtrip(df_local, tmp_path):
    path = str(tmp_path / "test.arrow")
    df_local.export_arrow(path)
    df2 = vaex.open(path)
    roundtrip_check(df_local.drop("name"), df2.drop("name"))


def test_parquet_roundtrip(df_local, tmp_path):
    path = str(tmp_path / "test.parquet")
    df_local.export_parquet(path)
    df2 = vaex.open(path)
    roundtrip_check(df_local.drop("name"), df2.drop("name"))


def test_csv_roundtrip(df_local, tmp_path):
    path = str(tmp_path / "test.csv")
    df = df_local[["x", "y", "i"]]
    df.export_csv(path)
    df2 = vaex.from_csv(path)
    assert len(df2) == 10
    assert df2.sum("x") == 45


def test_hdf5_aggregation_after_open(df_local, tmp_path):
    path = str(tmp_path / "agg.hdf5")
    df_local.drop("name").export_hdf5(path)
    df2 = vaex.open(path)
    assert df2.count() == 10
    assert df2.sum("x") == 45
    assert df2.count("m") == 8
    counts = df2.count(binby="x", limits=[0, 10], shape=5)
    assert counts.tolist() == [2, 2, 2, 2, 2]


def test_from_pandas():
    import pandas as pd
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    df = vaex.from_pandas(pdf)
    assert df.sum("a") == 6


def test_example():
    df = vaex.example(10_000)
    assert len(df) == 10_000
    counts = df.count(binby=df.x, shape=64)
    assert counts.sum() > 0
    assert df.count() == 10_000


def test_block_cached_file(tmp_path, monkeypatch):
    """Block-level remote cache (reference: file/cache.py CachedFile)."""
    import fsspec
    from vaex_tpu import file as file_mod
    payload = bytes(range(256)) * 5000  # 1.28 MB, > 1 block
    mem = fsspec.filesystem("memory")
    with mem.open("/blob.bin", "wb") as f:
        f.write(payload)
    base = str(tmp_path / "blocks")
    opener = lambda: mem.open("/blob.bin", "rb")
    cf = file_mod.CachedFile(opener, "memory://blob.bin", cache_dir_path=base,
                             block_size=1 << 18)
    cf.seek(100)
    assert cf.read(16) == payload[100:116]
    assert cf.block_reads == 1          # only the first 256K block fetched
    cf.seek(len(payload) - 10)
    assert cf.read() == payload[-10:]
    assert cf.block_reads == 2          # plus the last block
    cf.close()
    # persistence: a new instance sees the cached blocks, no re-fetch
    cf2 = file_mod.CachedFile(opener, "memory://blob.bin", cache_dir_path=base,
                              block_size=1 << 18)
    cf2.seek(100)
    assert cf2.read(16) == payload[100:116]
    assert cf2.block_reads == 0
    # full sequential read completes the mask and matches
    cf2.seek(0)
    assert cf2.read() == payload
    cf2.close()
    # open() integration via the cache fs_option
    f3 = file_mod.open("memory://blob.bin?cache=block")
    # patch the cache base so the test stays in tmp (open used default dir)
    assert f3.read(32) == payload[:32]
    f3.close()


def test_votable_roundtrip(tmp_path):
    """VOTable read/write (reference: vaex-astro votable)."""
    path = str(tmp_path / "cat.vot")
    df = vaex.from_arrays(ra=np.array([10.5, 20.25, np.nan]),
                          n=np.array([1, 2, 3], dtype=np.int32),
                          flag=np.array([True, False, True]),
                          name=np.array(["alpha", "b<b>", "gamma"], dtype=object))
    df.export(path)
    df2 = vaex.open(path)
    assert len(df2) == 3
    ra = np.asarray(df2.evaluate("ra"))
    assert ra[0] == 10.5 and ra[1] == 20.25 and np.isnan(ra[2])
    assert np.asarray(df2.evaluate("n")).tolist() == [1, 2, 3]
    assert np.asarray(df2.evaluate("flag")).tolist() == [True, False, True]
    names = df2.evaluate("name")
    names = names.to_pylist() if hasattr(names, "to_pylist") else list(names)
    assert names == ["alpha", "b<b>", "gamma"]  # xml-escaped round trip
    # masked ints survive as missing
    m = np.ma.MaskedArray([1, 2, 3], mask=[0, 1, 0])
    d3 = vaex.from_arrays(m=m)
    p3 = str(tmp_path / "m.vot")
    d3.export(p3)
    d4 = vaex.open(p3)
    assert d4.count("m") == 2 and int(d4.sum("m")) == 4


def test_hdf5_export_object_strings(tmp_path):
    """Object-dtype string columns export to hdf5 (converted to Arrow
    strings at ingestion, reference superstrings behavior)."""
    df = vaex.from_arrays(x=np.arange(10.0),
                          s=np.array([f"v{i % 3}" for i in range(10)], dtype=object))
    p = str(tmp_path / "obj.hdf5")
    df.export(p)
    d2 = vaex.open(p)
    s2 = d2.evaluate("s")
    s2 = s2.to_pylist() if hasattr(s2, "to_pylist") else list(s2)
    assert s2 == [f"v{i % 3}" for i in range(10)]
    # mixed object columns stay untouched
    d3 = vaex.from_arrays(o=np.array([1, "a", None], dtype=object))
    assert str(d3.data_type("o")) == "object"


def test_export_hdf5_string_unaligned_chunks(tmp_path):
    # chunk boundaries not multiple of 8: null bitmap boundary bytes are
    # read-modify-written instead of raising
    import numpy as np
    import pyarrow as pa
    import vaex_tpu as vaex
    s = ["s%d" % i if i % 3 else None for i in range(250)]
    df = vaex.from_arrays(x=np.arange(250.0), s=pa.array(s))
    path = str(tmp_path / "unaligned.hdf5")
    df.export_hdf5(path, chunk_size=100)
    back = vaex.open(path)
    got = [None if v is None else str(v) for v in np.asarray(back.evaluate("s"), dtype=object)]
    assert got == s


def test_csv_lazy_byte_range_chunking(tmp_path):
    """Byte-range lazy CSV: newline-aligned fragments, random-access start
    with O(range) fragment parses (reference: vaex/csv.py:56-134)."""
    from vaex_tpu.io.csv import CsvDatasetLazy

    path = str(tmp_path / "big.csv")
    n = 5000
    with open(path, "w") as f:
        f.write("a,b\n")
        for i in range(n):
            f.write(f"{i},{i * 2}\n")

    # tiny fragments force many byte ranges
    ds = CsvDatasetLazy(path, fragment_bytes=4096)
    assert len(ds._fragments) > 3
    assert ds.row_count == n

    df = vaex.from_dataset(ds)
    assert df.sum("a") == n * (n - 1) // 2

    # iterate from a nonzero start: values correct and only covering
    # fragments get parsed
    parsed = []
    orig = CsvDatasetLazy._parse_fragment

    def counting(self, i, columns):
        parsed.append(i)
        return orig(self, i, columns)

    CsvDatasetLazy._parse_fragment = counting
    try:
        start, end = n - 700, n - 100
        got = []
        for i1, i2, chunks in ds.chunk_iterator(["a"], chunk_size=128, start=start, end=end):
            got.extend(chunks["a"].to_pylist())
        assert got == list(range(start, end))
        assert parsed, "expected at least one fragment parse"
        assert min(parsed) > 0, "start-offset read must skip leading fragments"
        assert len(parsed) < len(ds._fragments) / 2, "must parse only covering fragments"
    finally:
        CsvDatasetLazy._parse_fragment = orig

    # column random access seeks too
    col = ds["b"]
    assert col[100:105].to_pylist() == [200, 202, 204, 206, 208]
    ds.close()


def test_csv_lazy_quoted_newline_detected(tmp_path):
    """Embedded newlines in quoted fields break newline row accounting; the
    parse path must fail loudly, not return wrong rows."""
    import pytest
    from vaex_tpu.io.csv import CsvDatasetLazy

    path = str(tmp_path / "quoted.csv")
    with open(path, "w") as f:
        f.write('a,b\n')
        for i in range(50):
            f.write(f'{i},"line1\nline2"\n')

    ds = CsvDatasetLazy(path, fragment_bytes=256)
    with pytest.raises(ValueError, match="lazy=False"):
        for _ in ds.chunk_iterator(["a"], chunk_size=16):
            pass


def test_json_roundtrip(tmp_path):
    import vaex_tpu as vaex
    df = vaex.from_arrays(x=np.arange(10.0), s=np.array(["a", "b"] * 5, dtype=object))
    path = str(tmp_path / "t.json")
    df.export(path)
    d2 = vaex.open(path)
    assert len(d2) == 10
    assert np.asarray(d2.evaluate("x")).tolist() == list(np.arange(10.0))
    assert d2.count(selection="s == 'a'") == 5


def test_lazy_subpackage_attributes():
    """vaex.ml.StandardScaler etc. work without explicit subpackage imports
    (PEP 562 lazy module attributes)."""
    import vaex_tpu as vaex
    assert hasattr(vaex.ml, "StandardScaler")
    assert hasattr(vaex.vaexfast, "histogram1d")
    assert hasattr(vaex.contrib.io, "gbq")
    with pytest.raises(AttributeError):
        vaex.nonexistent_module
