"""Masked-values filter/selection + isna-family parity scenarios ported from
the reference suite (/root/reference/tests/masked_values_filters_test.py,
isna_test.py)."""

import numpy as np
import pyarrow as pa
import pytest

import vaex_tpu as vaex


@pytest.fixture()
def df_masked():
    x = np.ma.MaskedArray(data=[0, 1, 2, 3, 4], mask=[False, False, True, False, True])
    y = np.ma.MaskedArray(data=[3, 5, 2, -1.5, 0], mask=[False] * 5)
    w = np.ma.MaskedArray(data=["dog", "dog", "cat", "cat", "mouse"],
                          mask=[False, False, True, False, True])
    return vaex.from_arrays(x=x, y=y, w=w)


def test_masked_values_selections(df_masked):
    df = df_masked
    assert df.y.count(selection="x < 3") == 2
    assert df.y.sum(selection="x < 3") == 8.0
    assert df.y.mean(selection=df.x < 3) == 4.0
    assert df.y.std(selection=df.x < 3) == 1.0
    assert df.w.nunique(selection="x < 3") == 1


def test_masked_values_numerical_filter(df_masked):
    d = df_masked[df_masked.x >= 1]
    assert len(d) == 2
    assert d.w.tolist() == ["dog", "cat"]
    assert d.y.tolist() == [5.0, -1.5]
    assert d.x.tolist() == [1.0, 3]


def test_masked_values_string_filter(df_masked):
    d = df_masked[df_masked.w == "cat"]
    assert len(d) == 1
    assert d.w.tolist() == ["cat"]
    assert d.y.tolist() == [-1.5]
    assert d.x.tolist() == [3]


def test_masked_values_filter_and_selection(df_masked):
    # an Expression selection on a filtered frame must fetch the selection's
    # own columns (regression: Expression.__eq__ overload used to steal the
    # __filter__ branch in _selection_dependencies)
    d = df_masked[df_masked.x < 4]
    assert d.y.count(selection="w == 'cat'") == d.y.count(selection=d.w == "cat")
    assert d.y.count(selection=d.w == "cat") == 1
    assert d.y.sum(selection=d.w == "cat") == -1.5
    assert d.y.mean(selection=d.w == "cat") == -1.5
    assert d.y.nunique(selection=d.w == "cat") == 1


@pytest.fixture()
def df_na():
    s = vaex.string_column(["aap", None, "noot", "mies"])
    x = np.arange(4, dtype=np.float64)
    x[2] = x[3] = np.nan
    m = np.ma.array(x, mask=[0, 1, 0, 1])
    return vaex.from_arrays(x=x, m=m, s=s)


def test_is_missing(df_na):
    df = df_na
    assert df.x.ismissing().tolist() == [False, False, False, False]
    assert df.m.ismissing().tolist() == [False, True, False, True]
    assert df.s.ismissing().tolist() == [False, True, False, False]
    assert df.m.notmissing().tolist() == [True, False, True, False]


def test_is_nan(df_na):
    df = df_na
    assert df.x.isnan().tolist() == [False, False, True, True]
    assert df.m.isnan().tolist() == [False, False, True, False]
    assert df.s.isnan().tolist() == [False, False, False, False]
    assert df.x.notnan().tolist() == [True, True, False, False]


def test_is_na(df_na):
    df = df_na
    assert df.x.isna().tolist() == [False, False, True, True]
    assert df.m.isna().tolist() == [False, True, True, True]
    assert df.s.isna().tolist() == [False, True, False, False]


def test_notna_arrow():
    df = vaex.from_arrays(x=pa.array(["Apple", None, "Orange"]),
                          y=pa.array([1, None, 3.5]),
                          z=np.array([1, np.nan, 3.5]))
    assert df.x.notmissing().tolist() == [True, False, True]
    assert df.y.notna().tolist() == [True, False, True]
    assert df.y.notnan().tolist() == [True, True, True]
    assert df.z.notnan().tolist() == [True, False, True]
    assert df.z.notna().tolist() == [True, False, True]
