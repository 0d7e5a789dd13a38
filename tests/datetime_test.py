"""datetime/timedelta parity scenarios ported from the reference suite
(/root/reference/tests/datetime_test.py) — behaviors re-asserted against
this engine, not copied code."""

import numpy as np
import pyarrow as pa
import pytest

import vaex_tpu as vaex

DATES = np.array([
    "2009-10-12T03:31:00", "2016-02-11T10:17:34", "2015-11-12T11:34:22",
    "2003-03-03T00:33:15", "2014-07-23T15:08:05", "2011-01-01T07:02:01",
], dtype="M8[ns]")


def test_datetime_operations():
    df = vaex.from_arrays(date=DATES)
    p = df.to_pandas_df()
    assert df.date.dt.hour.tolist() == p.date.dt.hour.values.tolist()
    assert df.date.dt.minute.tolist() == p.date.dt.minute.values.tolist()
    assert df.date.dt.second.tolist() == p.date.dt.second.values.tolist()
    assert df.date.dt.day.tolist() == p.date.dt.day.values.tolist()
    assert df.date.dt.day_name.tolist() == p.date.dt.day_name().values.tolist()
    assert df.date.dt.month.tolist() == p.date.dt.month.values.tolist()
    assert df.date.dt.month_name.tolist() == p.date.dt.month_name().values.tolist()
    assert df.date.dt.quarter.tolist() == p.date.dt.quarter.values.tolist()
    assert df.date.dt.year.tolist() == p.date.dt.year.values.tolist()
    assert df.date.dt.is_leap_year.tolist() == p.date.dt.is_leap_year.values.tolist()
    assert any(df.date.dt.is_leap_year.tolist())
    assert df.date.dt.weekofyear.tolist() == p.date.dt.isocalendar().week.values.tolist()
    assert df.date.dt.dayofyear.tolist() == p.date.dt.dayofyear.values.tolist()
    assert df.date.dt.dayofweek.tolist() == p.date.dt.dayofweek.values.tolist()
    # 'H' is the reference-era pandas alias; we normalize retired codes
    assert df.date.dt.floor("H").tolist() == p.date.dt.floor("h").values.tolist()
    assert df.date.dt.date.tolist() == p.date.dt.date.values.tolist()
    assert df.date.dt.halfyear.tolist() == [2, 1, 2, 1, 2, 1]


def test_datetime_agg():
    df = vaex.from_arrays(date=DATES)
    assert df.count(df.date) == len(DATES)
    assert df.max(df.date) == np.datetime64("2016-02-11T10:17:34")
    assert df.mean(df.date) < np.datetime64("2016-02-11T10:17:34")
    assert df.mean(df.date) > DATES[0]


def test_datetime_stats():
    x1 = np.datetime64("2005-01-01")
    x2 = np.datetime64("2015-02-01")
    x = np.arange(x1, x2, dtype=np.datetime64)
    df = vaex.from_arrays(x=x, y=np.arange(len(x)))
    d1, d2 = df.x.minmax()
    assert d1 == x1 and d2 == x[-1]


def test_timedelta_arithmetics():
    x = np.array(["2019-01-04T21:23:00", "2019-02-04T05:00:10",
                  "2019-03-04T15:15:15", "2019-06-21T10:31:15"], dtype=np.datetime64)
    y = np.array(["2018-06-14T12:11:00", "2019-02-02T22:19:00",
                  "2017-11-18T10:11:19", "2019-07-12T11:00:00"], dtype=np.datetime64)
    df = vaex.from_arrays(x=x, y=y)
    df["diff"] = df.x - df.y
    df["diff_dev_hours"] = df["diff"] / np.timedelta64(1, "h")
    df["diff_add_days"] = df["diff"] + np.timedelta64(5, "D")
    diff = x - y
    assert (diff / np.timedelta64(1, "h")).tolist() == df["diff_dev_hours"].values.tolist()
    assert (diff + np.timedelta64(5, "D")).tolist() == df["diff_add_days"].values.tolist()
    assert df["diff"].min() == diff.min()
    assert df["diff"].max() == diff.max()


@pytest.mark.parametrize("as_string", [True, False])
def test_datetime_binary_operations(as_string):
    x = np.array(["2019-01-04T21:23:00", "2019-02-04T05:00:10",
                  "2019-03-04T15:15:15", "2019-06-21T10:31:15"], dtype=np.datetime64)
    sample = "2019-03-15" if as_string else np.datetime64("2019-03-15")
    df = vaex.from_arrays(x=x)
    assert (df.x > sample).tolist() == list(x > np.datetime64("2019-03-15"))
    assert (df.x <= sample).tolist() == list(x <= np.datetime64("2019-03-15"))


def test_no_change_fingerprint():
    # a scalar comparison must not add variables / mutate the frame
    # (reference: datetime_test.py test_no_change_fingerprint)
    x = np.array(["2019-01-04T21:23:00", "2019-02-04T05:00:10"], dtype=np.datetime64)
    df = vaex.from_arrays(x=x)
    fp = df.fingerprint()
    _ = df.x > np.datetime64("2019-03-15")
    assert df.fingerprint() == fp


def test_create_datetime64_column_from_ints():
    df = vaex.from_arrays(year=np.array([2015, 2015, 2017]),
                          month=np.array([1, 2, 10]),
                          day=np.array([1, 3, 22]),
                          time=np.array([945, 1015, 30]))
    df["hour"] = (df.time // 100 % 24).format("%02d")
    df["minute"] = (df.time % 100).format("%02d")
    expr = (df.year.format("%4d") + "-" + df.month.format("%02d") + "-"
            + df.day.format("%02d") + "T" + df.hour + ":" + df.minute)
    assert expr.to_numpy().astype(np.datetime64).tolist() == expr.astype("datetime64").tolist()


def test_create_datetime64_column_from_str():
    df = vaex.from_arrays(year=np.array(["2015", "2015", "2017"]),
                          month=np.array(["01", "02", "10"]),
                          day=np.array(["01", "03", "22"]),
                          hour=np.array(["09", "10", "00"]),
                          minute=np.array(["45", "15", "30"]))
    expr = df.year + "-" + df.month + "-" + df.day + "T" + df.hour + ":" + df.minute
    assert expr.to_numpy().astype(np.datetime64).tolist() == expr.astype("datetime64").tolist()
    assert expr.to_numpy().astype("datetime64[ns]").tolist() == expr.astype("datetime64[ns]").to_numpy().tolist()


def test_create_str_column_from_datetime64():
    df = vaex.from_arrays(date=DATES)
    p = df.to_pandas_df()
    fmt = "%Y/%m/%d"
    assert df.date.dt.strftime(fmt).values.tolist() == p.date.dt.strftime(fmt).values.tolist()


def test_non_ns_units():
    dates = np.array([np.datetime64("1900-10-12T03:31:00"),
                      np.datetime64("2011-01-01T07:02:01")], dtype="M8[ms]")
    df = vaex.from_arrays(dates=pa.array(dates))
    assert np.all(df.dates.to_numpy() == dates)


def test_datetime_operations_after_astype():
    df = vaex.from_arrays(x=["2009-10-12T03:31:00", "2016-02-11T10:17:34", "2015-11-12T11:34:22"])
    df["x_dt"] = df.x.astype("datetime64")
    df["x_hour"] = df.x_dt.dt.hour
    assert df.x_hour.tolist() == [3, 10, 11]


def test_datetime_filtering():
    df = vaex.from_arrays(x=["2020-05-01", "2021-10-01", "2022-01-01"])
    df["x_dt"] = df.x.astype("datetime64")
    max_date = df.x_dt.max()
    assert (df.x_dt < max_date).tolist() == [True, True, False]
    df["x_td"] = df.x_dt - max_date
    assert (df.x_td < np.timedelta64(0)).tolist() == [True, True, False]
    as_scalar = df["x_td"].max()
    assert (df.x_td < as_scalar).tolist() == [True, True, False]
