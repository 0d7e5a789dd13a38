import numpy as np
import pytest

import vaex_tpu as vaex


def test_count_scalar(df):
    assert df.count() == 10
    assert df.count("x") == 10
    assert df.count("m") == 8         # 2 masked
    assert df.count("f") == 9         # 1 nan
    assert df.count("s") == 9         # 1 null (string, host path)


def test_sum_mean(df):
    x = np.arange(10.0)
    assert df.sum("x") == x.sum()
    assert df.mean("x") == pytest.approx(x.mean())
    # masked ints: skip masked
    m = np.arange(10)
    m_valid = np.delete(m, [2, 7])
    assert df.sum("m") == m_valid.sum()
    assert df.mean("m") == pytest.approx(m_valid.mean())
    # nan floats: skip nan
    f = np.array([0.1, np.nan, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0])
    assert df.sum("f") == pytest.approx(np.nansum(f))


def test_minmax(df):
    assert df.min("x") == 0
    assert df.max("x") == 9
    mm = df.minmax("x")
    assert mm.tolist() == [0, 9]


def test_std_var(df):
    x = np.arange(10.0)
    assert df.var("x") == pytest.approx(x.var())
    assert df.std("x") == pytest.approx(x.std())


def test_virtual_column(df):
    df["z"] = df.x + df.y
    x = np.arange(10.0)
    assert df.sum("z") == pytest.approx((x + x**2).sum())


def test_expression_strings(df):
    assert df.sum("x * 2") == pytest.approx(np.arange(10.0).sum() * 2)
    assert df.count("sin(x)") == 10


def test_count_binby_1d(df):
    counts = df.count(binby="x", limits=[0, 10], shape=5)
    assert counts.tolist() == [2, 2, 2, 2, 2]


def test_sum_binby_1d(df):
    sums = df.sum("y", binby="x", limits=[0, 10], shape=5)
    x = np.arange(10.0)
    y = x ** 2
    expected = [y[(x >= lo) & (x < lo + 2)].sum() for lo in range(0, 10, 2)]
    assert sums.tolist() == pytest.approx(expected)


def test_mean_binby_2d(df):
    means = df.mean("x", binby=["x", "y"], limits=[[0, 10], [0, 100]], shape=4)
    assert means.shape == (4, 4)
    total = df.count(binby=["x", "y"], limits=[[0, 10], [0, 100]], shape=4)
    assert total.sum() == 10  # 81 goes to the last bin? no: y=81<100 ok


def test_binby_edges(df):
    counts = df.count(binby="x", limits=[2, 8], shape=3, edges=True)
    # layout [nan, under, b0, b1, b2, over]
    assert counts.shape == (6,)
    assert counts[1] == 2      # x=0,1 underflow
    assert counts[-1] == 2     # x=8,9 overflow
    assert counts[2:-1].sum() == 6


def test_selection(df):
    assert df.count(selection="x > 4") == 5
    assert df.sum("x", selection="x > 4") == sum(range(5, 10))
    df.select("x < 5")
    assert df.count(selection=True) == 5


def test_selection_list(df):
    counts = df.count(selection=[None, "x > 4"])
    assert counts.tolist() == [10, 5]


def test_filtered(df):
    dff = df[df.x > 2]
    assert len(dff) == 7
    assert dff.count() == 7
    assert dff.sum("x") == sum(range(3, 10))
    assert dff.min("x") == 3


def test_limits_minmax(df):
    limits = df.limits("x", "minmax")
    assert limits == [0, 9]


def test_small_chunks(df_local, small_buffer_fixture):
    with small_buffer_fixture(df_local, 3):
        assert df_local.count() == 10
        assert df_local.sum("x") == 45
        counts = df_local.count(binby="x", limits=[0, 10], shape=5)
        assert counts.tolist() == [2, 2, 2, 2, 2]


def test_delay_fusion(df_local):
    """delay=True batches stats into one pass (reference: delayed batching)."""
    passes_before = df_local.executor.passes
    s = df_local.sum("x", delay=True)
    c = df_local.count(delay=True)
    m = df_local.mean("y", delay=True)
    df_local.execute()
    assert s.get() == 45
    assert c.get() == 10
    assert m.get() == pytest.approx((np.arange(10.0) ** 2).mean())
    assert df_local.executor.passes == passes_before + 1


def test_mean_binby_ints(df):
    means = df.mean("i", binby="i", limits=[0, 10], shape=10)
    assert means.tolist() == pytest.approx(list(range(10)))


def test_first_last(df_local):
    assert df_local.first("y") == 0.0
    assert df_local.last("y") == 81.0
    firsts = df_local.first("y", binby="x", limits=[0, 10], shape=5)
    assert firsts.tolist() == [0.0, 4.0, 16.0, 36.0, 64.0]


def test_minmax_sorted_composite_path(monkeypatch):
    """High-cardinality small-int min/max numerics vs pandas with the
    sorted-backend routing forced on (the TPU decision point; the composite
    single-key sort was tried and REVERTED — scatter-min/max is faster on
    the chip for <=32-bit dtypes, h2o q7 measured 2.98s vs 5.48s)."""
    import pandas as pd
    import vaex_tpu.ops.gridagg as gridagg

    monkeypatch.setattr(gridagg, "SORTED_MINMAX_BACKENDS", {"cpu", "tpu"})
    monkeypatch.setattr(gridagg, "_onehot_cell_limit", lambda: 8)

    n, C = 200_000, 20_000
    rng = np.random.RandomState(3)
    for dtype in (np.int8, np.uint8, np.int16):
        lo, hi = (np.iinfo(dtype).min, np.iinfo(dtype).max)
        k = rng.randint(0, C, n).astype(np.int32)
        v = rng.randint(lo, int(hi) + 1, n).astype(dtype)
        df = vaex.from_arrays(k=k, v=v)
        res = df.groupby("k", agg={"mx": vaex.agg.max("v"),
                                   "mn": vaex.agg.min("v")}, sort=True)
        want = (pd.DataFrame({"k": k, "v": v}).groupby("k")["v"]
                .agg(["max", "min"]).sort_index())
        np.testing.assert_array_equal(
            np.asarray(res["mx"].to_numpy()), want["max"].values)
        np.testing.assert_array_equal(
            np.asarray(res["mn"].to_numpy()), want["min"].values)


def test_minmax_sorted_composite_masked(monkeypatch):
    """Masked rows must not contribute to the composite sorted min/max."""
    import vaex_tpu.ops.gridagg as gridagg

    monkeypatch.setattr(gridagg, "SORTED_MINMAX_BACKENDS", {"cpu", "tpu"})
    monkeypatch.setattr(gridagg, "_onehot_cell_limit", lambda: 8)

    n, C = 50_000, 5_000
    rng = np.random.RandomState(4)
    k = rng.randint(0, C, n).astype(np.int32)
    data = rng.randint(-128, 128, n).astype(np.int8)
    mask = rng.rand(n) < 0.5
    v = np.ma.masked_array(data, mask)
    df = vaex.from_arrays(k=k, v=v)
    res = df.groupby("k", agg={"mx": vaex.agg.max("v")}, sort=True)
    import pandas as pd
    pdf = pd.DataFrame({"k": k[~mask], "v": data[~mask]})
    want = pdf.groupby("k")["v"].max()
    got = res["mx"].to_numpy()
    keys = np.asarray(res["k"].to_numpy())
    got_by_key = dict(zip(keys.tolist(), np.asarray(got).tolist()))
    for kk, wv in want.items():
        assert got_by_key[kk] == wv
