"""Dtype sweep over the aggregation/groupby oracles (reference:
tests/dtypes_test.py + tests/arrow/* parametrized fixtures): every numeric
dtype x {plain, masked, arrow} storage must produce numpy-oracle results for
scalar stats, binned stats and groupby.

The CPU mesh computes exactly (no emulated-f64 noise), so integer aggregates
compare with array_equal and floats with tight allclose.
"""

import numpy as np
import pyarrow as pa
import pytest

import vaex_tpu as vaex

INT_DTYPES = ["int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"]
FLOAT_DTYPES = ["float16", "float32", "float64"]
STORAGES = ["plain", "masked", "arrow"]


def _column(dtype, storage, n=57):
    rng = np.random.RandomState(42)
    if dtype in INT_DTYPES:
        info = np.iinfo(dtype)
        lo, hi = max(info.min, -50), min(info.max, 100)
        values = rng.randint(lo, hi, n).astype(dtype)
    else:
        values = (rng.randn(n) * 10).astype(dtype)
    mask = rng.rand(n) < 0.2
    if storage == "plain":
        return values, np.zeros(n, bool)
    if storage == "masked":
        return np.ma.masked_array(values, mask), mask
    return pa.array(values, mask=mask), mask


@pytest.mark.parametrize("storage", STORAGES)
@pytest.mark.parametrize("dtype", INT_DTYPES + FLOAT_DTYPES)
def test_scalar_stats_dtype(dtype, storage):
    col, mask = _column(dtype, storage)
    df = vaex.from_arrays(v=col)
    dense = np.asarray(col if storage != "masked" else col.data)
    valid = dense[~mask]
    assert df.count("v") == len(valid)
    want_sum = valid.astype(np.float64).sum()
    if dtype in INT_DTYPES:
        # integer sums are exact (BASELINE: bitwise-matching integer aggregates)
        assert int(df.sum("v")) == int(valid.astype(np.int64).sum() if dtype != "uint64"
                                       else valid.astype(np.uint64).sum())
    else:
        assert float(df.sum("v")) == pytest.approx(want_sum, rel=1e-5)
    assert float(df.mean("v")) == pytest.approx(valid.astype(np.float64).mean(), rel=1e-5)
    # exact on CPU; TPU-emulated f64 reduces carry ~1e-14 relative noise
    assert float(df.min("v")) == pytest.approx(float(valid.min()), rel=1e-12, abs=1e-300)
    assert float(df.max("v")) == pytest.approx(float(valid.max()), rel=1e-12, abs=1e-300)
    if dtype not in ("float16",):
        assert float(df.std("v")) == pytest.approx(valid.astype(np.float64).std(), rel=1e-4)


@pytest.mark.parametrize("storage", STORAGES)
@pytest.mark.parametrize("dtype", INT_DTYPES + FLOAT_DTYPES)
def test_binned_count_dtype(dtype, storage):
    col, mask = _column(dtype, storage)
    df = vaex.from_arrays(v=col)
    dense = np.asarray(col if storage != "masked" else col.data).astype(np.float64)
    valid = dense[~mask]
    lo, hi = float(valid.min()), float(valid.max()) + 1
    counts = np.asarray(df.count(binby="v", limits=[lo, hi], shape=8))
    edges = np.linspace(lo, hi, 9)
    want, _ = np.histogram(valid, bins=edges)
    assert counts.sum() == len(valid)
    np.testing.assert_array_equal(counts, want)


@pytest.mark.parametrize("storage", STORAGES)
@pytest.mark.parametrize("dtype", INT_DTYPES + FLOAT_DTYPES)
def test_groupby_dtype(dtype, storage):
    rng = np.random.RandomState(7)
    n = 60
    keys = rng.randint(0, 5, n).astype("int32")
    col, mask = _column(dtype, storage, n)
    df = vaex.from_arrays(k=keys, v=col)
    dense = np.asarray(col if storage != "masked" else col.data).astype(np.float64)
    g = df.groupby("k", agg={"v": "sum", "n": vaex.agg.count("v")}, sort=True)
    gk = np.asarray(g["k"].to_numpy())
    np.testing.assert_array_equal(gk, np.arange(5))
    for i in range(5):
        sel = (keys == i) & ~mask
        assert np.asarray(g["n"].to_numpy())[i] == sel.sum()
        got = float(np.asarray(g["v"].to_numpy())[i])
        assert got == pytest.approx(dense[sel].sum(), rel=1e-5, abs=1e-6)


@pytest.mark.parametrize("dtype", ["datetime64[ns]", "datetime64[us]"])
def test_minmax_datetime(dtype):
    base = np.datetime64("2020-01-01", dtype.split("[")[1][:-1])
    values = base + np.arange(50) * np.timedelta64(1, "D")
    np.random.RandomState(0).shuffle(values)
    df = vaex.from_arrays(t=values.astype(dtype))
    assert np.datetime64(df.min("t"), "D") == np.datetime64("2020-01-01")
    assert np.datetime64(df.max("t"), "D") == np.datetime64("2020-02-19")
