"""Reference-semantics parity tests: the NaN/masked/edge-bin behaviors pinned
by the reference C++ layouts (src/binners.cpp:27-36, binner_ordinal.cpp:11,
agg_count.cpp:44-67) and its own test expectations
(tests/count_test.py:26-43)."""

import numpy as np
import pytest

import vaex_tpu as vaex


def test_edges_layout_scalar():
    """[nan, under, bins..., over] exactly (binners.cpp:27-36)."""
    x = np.array([-2.0, -1, 0, 1, 2, 3, np.nan])
    df = vaex.from_arrays(x=x)
    # range [0.5, 1.5): 1 in range, 3 under (-2,-1,0), 2 over (2,3), 1 nan
    counts = df.count(binby="x", limits=[0.5, 1.5], shape=1, edges=True)
    assert counts.tolist() == [1, 3, 1, 2]
    # counting x itself: the nan VALUE doesn't count (agg skips nan)
    counts_x = df.count("x", binby="x", limits=[0.5, 1.5], shape=1, edges=True)
    assert counts_x.tolist() == [0, 3, 1, 2]


def test_edges_layout_masked():
    x = np.ma.MaskedArray([-2.0, -1, 0, 1, 2, 3, 4], mask=[0, 0, 0, 0, 0, 0, 1])
    df = vaex.from_arrays(x=x)
    counts = df.count(binby="x", limits=[0.5, 1.5], shape=1, edges=True)
    # masked row → nan slot (binners.cpp: masked -> index 0)
    assert counts.tolist() == [1, 3, 1, 2]


def test_minmax_limits_histogram_vs_numpy():
    """Reference's own test excludes the last bin when comparing with numpy
    (tests/count_test.py:43) — the max value lands in the overflow slot."""
    rng = np.random.RandomState(0)
    x = rng.normal(0, 10, 10_000)
    df = vaex.from_arrays(x=x)
    vmin, vmax = df.limits("x", "minmax")
    counts = df.count(binby="x", limits=[vmin, vmax], shape=16)
    np_counts, _ = np.histogram(x, bins=16, range=(vmin, vmax))
    assert counts[:-1].tolist() == np_counts[:-1].tolist()


def test_sum_skips_nan_and_masked():
    f = np.array([1.0, np.nan, 3.0])
    m = np.ma.MaskedArray([1, 2, 3], mask=[0, 1, 0])
    df = vaex.from_arrays(f=f, m=m)
    assert df.sum("f") == 4.0
    assert df.sum("m") == 4
    assert df.count("f") == 2
    assert df.count("m") == 2
    assert df.mean("f") == 2.0


def test_minmax_sentinels_empty_bins():
    """Empty bins keep +inf/-inf sentinels in the raw grid
    (agg_minmax.cpp:13-17 initial_fill)."""
    df = vaex.from_arrays(x=np.array([0.5, 2.5]), v=np.array([10.0, 20.0]))
    mins = df.min("v", binby="x", limits=[0, 3], shape=3)
    assert mins[0] == 10 and mins[2] == 20
    assert np.isinf(mins[1]) and mins[1] > 0
    maxs = df.max("v", binby="x", limits=[0, 3], shape=3)
    assert np.isinf(maxs[1]) and maxs[1] < 0


def test_int_aggregation_exact():
    """Integer aggregates are exact in every precision mode (BASELINE.md:
    'integer aggregates bitwise-equal')."""
    rng = np.random.RandomState(1)
    v = rng.randint(-2**40, 2**40, 100_000)
    df = vaex.from_arrays(v=v, g=(np.arange(100_000) % 7))
    assert int(df.sum("v")) == int(v.sum())
    sums = df.sum("v", binby="g", limits=[0, 7], shape=7)
    import pandas as pd
    expected = pd.DataFrame({"g": np.arange(100_000) % 7, "v": v}).groupby("g")["v"].sum()
    assert np.asarray(sums).astype(np.int64).tolist() == expected.values.tolist()


def test_count_star_with_nan_rows():
    """count('*') counts rows regardless of values (agg_count.cpp: no
    data_ptr → count all)."""
    df = vaex.from_arrays(f=np.array([1.0, np.nan, np.nan]))
    assert df.count() == 3
    assert df.count("f") == 1


def test_selection_with_masked_values():
    """Masked values in a selection expression do not select (reference:
    numpy.ma semantics in _BlockScope)."""
    m = np.ma.MaskedArray([1, 5, 10], mask=[0, 1, 0])
    df = vaex.from_arrays(m=m)
    assert df.count(selection="m > 0") == 2  # masked row excluded


def test_filtered_groupby():
    g = np.arange(20) % 4
    v = np.arange(20.0)
    df = vaex.from_arrays(g=g, v=v)
    dff = df[df.v >= 10]
    res = dff.groupby("g", agg={"v": "sum"}, sort=True)
    import pandas as pd
    expected = pd.DataFrame({"g": g[10:], "v": v[10:]}).groupby("g")["v"].sum()
    assert np.asarray(res.evaluate("v")).tolist() == expected.values.tolist()


def test_ordinal_edges_layout():
    """[bins..., null, nan] (binner_ordinal.cpp:11 non-invert, no-other)."""
    codes = np.ma.MaskedArray([0, 1, 2, 5, 1], mask=[0, 0, 0, 0, 1])
    df = vaex.from_arrays(c=codes)
    # explicit max_value skips the data validation (reference categorize
    # semantics) — code 5 is deliberately out of range to hit the null slot
    df = df.categorize("c", min_value=0, max_value=2)
    counts = df.count(binby="c", edges=True)
    # layout: [b0, b1, b2, null(oor+masked), nan]
    assert counts.tolist() == [1, 1, 1, 2, 0]


def test_float_sum_accuracy_mixed():
    """Mixed precision float sums stay within ~1e-6 relative of exact f64."""
    rng = np.random.RandomState(2)
    v = rng.normal(1000, 1, 1_000_000).astype(np.float32)
    df = vaex.from_arrays(v=v)
    exact = np.sum(v.astype(np.float64))
    got = float(df.sum("v"))
    assert abs(got - exact) / abs(exact) < 1e-6


def test_sum_accuracy_all_paths():
    """Accuracy ladder of the mixed-precision engine: scalar sums are
    tree-reduced (~1e-15), few-cell binned f64 sums use hi/lo f32 pairs with
    row-sliced replicas (~1e-6), int64 sums are bit-exact via sort+cumsum."""
    rng = np.random.RandomState(9)
    n = 200_000
    v64 = rng.normal(1000, 1, n)
    x = rng.normal(0, 1, n).astype(np.float32)
    df = vaex.from_arrays(v64=v64, x=x)
    exact = v64.sum()
    assert abs(float(df.sum("v64")) - exact) / abs(exact) < 1e-12
    assert abs(float(df.std("v64")) - v64.std()) / v64.std() < 1e-8
    binned = np.asarray(df.sum("v64", binby="x", limits=[-3, 3], shape=4))
    oracle = np.histogram(x, bins=4, range=(-3, 3), weights=v64)[0]
    assert np.max(np.abs((binned - oracle) / oracle)) < 1e-5


def test_integer_on_edge_binning_exact():
    """Integer-valued data on integer bin edges bins exactly — for constant
    AND runtime (data-derived) limits.  Regression: the runtime-limits path
    initially multiplied by a reciprocal where the constant path compiled to
    a division, shifting edge rows down one bin (binners.cpp scaled*bins)."""
    from vaex_tpu import settings
    g = np.random.RandomState(3).randint(0, 50, 20000)
    ref = np.bincount(g, minlength=50)
    for dyn in (True, False):
        old = settings.compute.dynamic_limits
        settings.compute.dynamic_limits = dyn
        try:
            df = vaex.from_arrays(g=g.copy())
            got = np.asarray(df.count(binby="g", limits=[0, 50], shape=50))
        finally:
            settings.compute.dynamic_limits = old
        np.testing.assert_array_equal(got, ref, err_msg=f"dynamic_limits={dyn}")
