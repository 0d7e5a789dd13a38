"""map() parity scenarios ported from the reference suite
(/root/reference/tests/map_test.py)."""

import numpy as np
import pyarrow as pa
import pytest

import vaex_tpu as vaex


def test_nan_madness():
    x = [np.nan, float("nan"), np.nan / 2, float("nan") / 3, 0, 1]
    df = vaex.from_arrays(x=x)
    assert df.x.map({np.nan / 5: -1, 0: 10, 1: 20}).tolist() == [-1, -1, -1, -1, 10, 20]
    with pytest.raises(ValueError):
        df.x.map({np.nan / 5: -1, np.nan / 10: -2, 0: 10, 1: 20})


def test_map_basics():
    colour = ["red", "red", "blue", "red", "green", "green", "red", "blue", "blue", "green"]
    floats = [10.0, 20.0, 30.0, 10.0, 20.0, 30.0, 30.0, 30.0, 10.0, np.nan]
    ds = vaex.from_arrays(colour=colour, floats=floats)
    ds["colour_"] = ds.colour.map({"red": 1, "blue": 2, "green": 3})
    assert ds.colour_.tolist() == [1, 1, 2, 1, 3, 3, 1, 2, 2, 3]
    ds["floats_"] = ds.floats.map({10.0: -1, 20.0: -2, 30.0: -3, np.nan: -4}, nan_value=np.nan)
    assert ds.floats_.tolist()[:-1] == (np.array(floats) / -10.0).tolist()[:-1]
    assert ds.floats_.tolist()[-1] == -4
    # missing keys raise unless allow_missing/default_value handles them
    with pytest.raises(ValueError):
        ds.colour.map({"ret": 1, "blue": 2, "green": 3})
    with pytest.raises(ValueError):
        ds.colour.map({"blue": 2, "green": 3})
    ds["cu"] = ds.colour.map({"blue": 2, "green": 3}, default_value=-1)
    assert ds.cu.tolist() == [-1, -1, 2, -1, 3, 3, -1, 2, 2, 3]
    ds.colour.map({"red": 1, "blue": 2, "green": 3, "orange": 4})  # extra keys are fine
    assert ds.colour.map({"blue": 2, "green": 3}, allow_missing=True).tolist() == \
        [None, None, 2, None, 3, 3, None, 2, 2, 3]


def test_map_missing():
    df = vaex.from_arrays(x=np.ma.array([1, 2, 0], mask=[0, 0, 1]))
    df["m"] = df.x.map({1: 99}, allow_missing=True)
    assert df.m.tolist() == [99, None, None]


def test_map_to_string():
    df = vaex.from_arrays(type=[0, 1, 2, 2, 2, np.nan])
    df["role"] = df["type"].map({0: "admin", 1: "maintainer", 2: "user", np.nan: "unknown"})
    assert df["role"].tolist() == ["admin", "maintainer", "user", "user", "user", "unknown"]


@pytest.mark.parametrize("type", [pa.string(), pa.large_string()])
def test_map_from_string(type):
    df = vaex.from_arrays(type=pa.array(["admin", "maintainer", "user", "user", "user", None], type=type))
    df["role"] = df["type"].map({"admin": 0, "maintainer": 1, "user": 2, None: -1})
    assert df["role"].tolist() == [0, 1, 2, 2, 2, -1]


def test_map_serialize(tmp_path):
    df = vaex.from_arrays(type=[0, 1, 2, 2, 2, np.nan])
    df["role"] = df["type"].map({0: "admin", 1: "maintainer", 2: "user", np.nan: "unknown"})
    assert df["role"].tolist() == ["admin", "maintainer", "user", "user", "user", "unknown"]
    path = str(tmp_path / "state.json")
    df.state_write(path)
    df2 = vaex.from_arrays(type=[0, 1, 2, 2, 2, np.nan])
    df2.state_load(path)
    assert df2["role"].tolist() == ["admin", "maintainer", "user", "user", "user", "unknown"]


def test_map_long_mapper():
    english = np.array(["one", "two", "three", "four", "five", "six"])
    german = np.array(["eins", "zwei", "drei", "vier", "fünf", "sechs"])
    df = vaex.from_arrays(english=english)
    df["german"] = df.english.map(mapper=dict(zip(english, german)))
    assert df["german"].tolist() == german.tolist()
