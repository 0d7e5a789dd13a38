"""value_counts / fill-family parity scenarios ported from the reference
suite (/root/reference/tests/value_counts_test.py, fillna_test.py) —
behaviors re-asserted against this engine, not copied code."""

import numpy as np
import pytest

import vaex_tpu as vaex


@pytest.fixture()
def ds_mixed():
    x = np.array([0, 1, 1, 2, 2, 2, np.nan])
    y = np.ma.array(x, mask=[True, True, False, False, False, False, False])
    s = np.array(list(map(str, x)))
    return vaex.from_arrays(x=x, y=y, s=s)


def test_value_counts_simple(ds_mixed):
    ds = ds_mixed
    # dropna=True implies dropnan+dropmissing (reference expression.py:1013)
    assert ds.x.value_counts(dropna=True, ascending=True).values.tolist() == [1, 2, 3]
    assert ds.x.value_counts(dropna=False, ascending=True).values.tolist() == [1, 1, 2, 3]
    assert set(ds.s.value_counts(dropna=True, ascending=True).index.tolist()) == {"0.0", "nan", "1.0", "2.0"}
    assert set(ds.y.value_counts(dropna=True, ascending=True).index.tolist()) == {1, 2}
    assert ds.y.value_counts(dropna=False, dropmissing=True, ascending=True).values.tolist() == [1, 1, 3]
    # a missing entry is labeled "missing" and listed FIRST (cpu.py:270-276)
    vc = ds.y.value_counts(dropna=False, dropmissing=False, ascending=True)
    assert vc.values.tolist() == [2, 1, 1, 3]
    assert vc.index.tolist()[0] == "missing"


def test_value_counts_masked_str():
    x = np.ma.MaskedArray(
        data=["A", "A", "A", "B", "B", "B", "", "", ""],
        mask=[False, True, False, False, True, True, False, True, False])
    df = vaex.from_arrays(x=x)
    vc = df.x.value_counts()
    assert len(vc) == 4
    assert vc["A"] == 2 and vc["B"] == 1 and vc[""] == 2 and vc["missing"] == 4
    vc = df.x.value_counts(dropmissing=True)
    assert len(vc) == 3 and vc["A"] == 2 and vc["B"] == 1 and vc[""] == 2
    vc = df.x.value_counts(dropna=True)
    assert len(vc) == 3


def test_value_counts_add_strings():
    # python-list columns must ingest as arrow strings (dataset.py
    # to_supported_array parity) and string concat stays a string
    df = vaex.from_arrays(x=["car", "car", "boat"], y=["red", "red", "blue"])
    df["z"] = df.x + "-" + df.y
    vc = df.z.value_counts()
    assert list(vc.index) == ["car-red", "boat-blue"]
    assert vc.values.tolist() == [2, 1]


def test_value_counts_high_cardinality():
    x = np.random.RandomState(7).randint(0, 1000, size=100_000)
    df = vaex.from_arrays(x=x, s=[str(i) for i in x])
    assert int(df.x.value_counts().sum()) == 100_000
    assert int(df.s.value_counts().sum()) == 100_000


# -- fill family (reference fillna_test.py) --------------------------------

@pytest.fixture()
def df_fill():
    s = vaex.string_column(["aap", None, "noot", "mies"])
    x = np.arange(4, dtype=np.float64)
    x[2] = x[3] = np.nan
    m = np.ma.array(x, mask=[0, 1, 0, 1])
    return vaex.from_arrays(x=x, m=m, s=s)


def test_fillnan(df_fill):
    df = df_fill
    assert df.x.fillnan(9).tolist() == [0, 1, 9, 9]
    # masked entries survive a nan fill (mask is orthogonal to nan)
    assert df.m.fillnan(9).tolist() == [0, None, 9, None]
    assert df.s.fillnan("kees").tolist() == ["aap", None, "noot", "mies"]


def test_fillmissing(df_fill):
    df = df_fill
    xs = df.x.fillmissing(9).tolist()
    assert 9 not in xs and np.any(np.isnan(xs)), "nan is not a missing value"
    ms = df.m.fillmissing(9).tolist()
    assert ms[:2] == [0, 9] and np.isnan(ms[2]) and ms[3] == 9
    assert df.s.fillmissing("kees").tolist() == ["aap", "kees", "noot", "mies"]


def test_fillna(df_fill):
    df = df_fill
    assert df.x.fillna(9).tolist() == [0, 1, 9, 9]
    assert df.m.fillna(9).tolist() == [0, 9, 9, 9]
    assert df.s.fillna("kees").tolist() == ["aap", "kees", "noot", "mies"]


def test_fillna_virtual():
    df = vaex.from_arrays(x=np.array([1, 2, 3, 5, np.nan, -1, -7, 10.0]))
    with np.errstate(invalid="ignore"):
        df["r"] = np.log(df.x)
    df["r"] = df.r.fillna(value=0xDEADBEEF)
    np.testing.assert_almost_equal(
        df.r.tolist()[:4], [0.0, 0.6931471805599453, 1.0986122886681098, 1.6094379124341003])
    assert df.r.tolist()[4:7] == [0xDEADBEEF] * 3


def test_fillna_scalar_array():
    df = vaex.from_arrays(x=np.array([1, 2, 3, np.nan]))
    df["x_2"] = df.x.fillna(np.array(2.0))
    assert df.x_2.tolist() == [1, 2, 3, 2]


def test_fillmissing_upcast():
    # reference expression.py:1091 _upcast_for: widen ints so the fill fits
    df = vaex.from_arrays(x=np.ma.array([1, 2, 0], mask=[0, 0, 1]))
    df["x"] = df["x"].astype("int8")
    df["y"] = df["x"].fillmissing(127)
    assert df.y.dtype == np.dtype("int8")
    df["z"] = df["x"].fillmissing(128)
    assert df.z.dtype == np.dtype("int16")
    assert df.z.tolist() == [1, 2, 128]
    df["w"] = df["x"].fillmissing(-129)
    assert df.w.dtype == np.dtype("int16")

    dfu = vaex.from_arrays(x=np.ma.array([1, 2, 0], mask=[0, 0, 1]))
    dfu["x"] = dfu["x"].astype("uint8")
    dfu["z"] = dfu["x"].fillmissing(256)
    assert dfu.z.dtype == np.dtype("uint16")
    dfu["w"] = dfu["x"].fillmissing(-129)
    assert dfu.w.dtype == np.dtype("int16")


def test_fillna_string_virtual():
    # fillna on a virtual string column (bare arrow arrays reach the host
    # function when the inner value is memoized) keeps the string type
    df = vaex.from_arrays(name=["Maria", "Adam", None, None, "Dan"],
                          age=[28, 15, 34, 55, 41])
    assert df["name"].is_string()  # method, not property (expression.py:1430)
    df["name"] = df["name"].fillna("missing")
    assert df["name"].is_string()
    assert df["name"].tolist() == ["Maria", "Adam", "missing", "missing", "Dan"]


def test_fillna_num_to_string_dtype():
    inp = vaex.from_arrays(
        int1=np.ma.array([1, 0], mask=[0, 1], dtype=int),
        float1=np.ma.array([3.14, 0], mask=[0, 1], dtype=float))
    inp["int1"] = inp["int1"].astype("string")
    inp["float1"] = inp["float1"].astype("string")
    assert inp["int1"].is_string() and inp["float1"].is_string()
    assert inp["int1"].fillna("").tolist() == ["1", ""]
