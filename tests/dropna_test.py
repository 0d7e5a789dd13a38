"""dropna/dropnan/dropmissing parity scenarios ported from the reference
suite (/root/reference/tests/dropna_test.py)."""

import numpy as np
import pytest

import vaex_tpu as vaex


def test_dropna_cache_bug():
    # reference PR #874: repeated dropna must not reuse a cached length
    df = vaex.from_arrays(x=np.ma.array([1, 0, 2], mask=[0, 1, 0]),
                          y=np.ma.array([3, 4, 0], mask=[0, 0, 1]))
    df1 = df.dropna("x")
    assert len(df1) == 2
    df2 = df1.dropna("y")
    assert len(df2) == 1


@pytest.fixture()
def df_na():
    s = vaex.string_column(["aap", None, "noot", "mies"])
    x = np.arange(4, dtype=np.float64)
    x[2] = x[3] = np.nan
    m = np.ma.array(x, mask=[0, 1, 0, 1])
    return vaex.from_arrays(x=x, m=m, s=s)


def test_dropmissing(df_na):
    df = df_na
    xs = df.x.dropmissing().tolist()
    assert np.any(np.isnan(xs)), "nan is not a missing value"
    ms = df.m.dropmissing().tolist()
    assert ms[:1] == [0] and np.isnan(ms[1]) and len(ms) == 2
    assert df.s.dropmissing().tolist() == ["aap", "noot", "mies"]


def test_dropnan(df_na):
    df = df_na
    assert df.x.dropnan().tolist() == [0, 1]
    assert df.m.dropnan().tolist() == [0, None, None]
    assert df.s.dropnan().tolist() == ["aap", None, "noot", "mies"]


def test_dropna(df_na):
    df = df_na
    assert df.x.dropna().tolist() == [0, 1]
    assert df.m.dropna().tolist() == [0]
    assert df.s.dropna().tolist() == ["aap", "noot", "mies"]


def test_dropna_all_columns():
    df = vaex.from_arrays(nan=np.array([1.1, np.nan, np.nan, 4.4, 5.5]),
                          na=vaex.string_column(["dog", "dog", None, "cat", None]))
    for dd in (df.dropna(), df.dropna(how="any")):
        assert dd.nan.tolist() == [1.1, 4.4]
        assert dd.na.tolist() == ["dog", "cat"]
    dd = df.dropna(how="all")
    assert dd.nan.fillna(99).tolist() == [1.1, 99, 4.4, 5.5]
    assert dd.na.tolist() == ["dog", "dog", "cat", None]
    with pytest.raises(ValueError):
        df.dropna(how="invalid")


def test_dropna_string_columns():
    # non-identifier column names route through the df['name'] expression
    # form (reference: utils.py:417 valid_expression)
    df = vaex.from_dict({"10": [1, 2, np.nan],
                         "20": [0.5, 0.6, np.nan],
                         "30": [-1, np.nan, np.nan]})
    dd = df.dropna()
    assert dd.shape == (1, 3)
    assert dd["10"].tolist() == [1]
    assert dd["20"].tolist() == [0.5]
    assert dd["30"].tolist() == [-1]
    assert df.sum(df["10"]) == 3.0
