"""category / ordinal_encode parity scenarios ported from the reference suite
(/root/reference/tests/category_test.py)."""

import warnings

import numpy as np
import pyarrow as pa
import pytest

import vaex_tpu as vaex


@pytest.mark.parametrize("lazy", [False, True])
def test_cat_string(lazy):
    ds0 = vaex.from_arrays(colors=["red", "green", "blue", "green"])
    ds = ds0.ordinal_encode("colors", lazy=lazy)
    assert ds.is_category("colors")
    assert ds.limits("colors", shape=128) == ([-0.5, 2.5], 3)

    ds = ds0.ordinal_encode("colors", values=["red", "green"], lazy=lazy)
    assert ds.is_category("colors")
    assert ds.limits("colors", shape=128) == ([-0.5, 1.5], 2)
    if not lazy:
        # 'blue' is not in the values list -> missing
        assert ds["colors"].tolist() == [0, 1, None, 1]
    assert ds.copy().is_category(ds.colors)


@pytest.mark.parametrize("lazy", [False, True])
def test_count_cat(lazy):
    ds0 = vaex.from_arrays(colors=["red", "green", "blue", "green"])
    ds = ds0.ordinal_encode("colors", ["red", "green", "blue"], lazy=lazy)
    assert ds.count(binby=ds.colors).tolist() == [1, 2, 1]
    # different value order -> different codes (regression: from_keys
    # hashmaps used to share an empty fingerprint and collide result caches)
    ds = ds0.ordinal_encode("colors", ["red", "blue", "green"], lazy=lazy)
    assert ds.count(binby=ds.colors).tolist() == [1, 1, 2]


def test_categorize():
    ds0 = vaex.from_arrays(c=np.array([0, 1, 1, 3]))
    ds0.categorize("c", labels=["a", "b", "c", "d"], inplace=True)
    assert ds0.is_category(ds0.c)
    assert ds0.category_labels(ds0.c) == ["a", "b", "c", "d"]
    assert ds0.category_count(ds0.c) == 4


@pytest.mark.parametrize("lazy", [False, True])
def test_cat_missing_values(lazy):
    colors = np.ma.array(["red", "green", "blue", "green", "MISSING"],
                         mask=[False, False, False, False, True])
    ds = vaex.from_arrays(colors=colors).ordinal_encode("colors", ["red", "green", "blue"], lazy=lazy)
    # edges layout: [bins..., missing, overflow] — matches the reference's
    # expected [1, 2, 1, 1, 0] (category_test.py test_cat_missing_values)
    assert ds.count(binby=ds.colors, edges=True).tolist() == [1, 2, 1, 1, 0]


def test_categorize_integers():
    df = vaex.from_arrays(x=np.arange(5, 15))
    df.categorize("x", min_value=5, labels=list(range(5, 15)), inplace=True)
    assert df.count(binby="x").tolist() == [1] * 10
    # min/max from data when not given (reference dataframe.py:5893-5897)
    df = vaex.from_arrays(x=np.arange(5, 15))
    df.categorize("x", inplace=True)
    assert df.count(binby="x").tolist() == [1] * 10


def test_categorize_non_int_raises():
    df = vaex.from_arrays(x=np.array([0.5, 1.5]))
    with pytest.raises(TypeError):
        df.categorize("x")


def test_arrow_dict_encoded():
    indices = pa.array([0, 1, 0, 1, 2, 0, None, 2])
    dictionary = pa.array(["aap", "noot", "mies"])
    c = pa.DictionaryArray.from_arrays(indices, dictionary)
    df = vaex.from_arrays(c=c)
    assert df.category_labels("c") == ["aap", "noot", "mies"]
    assert df.category_count("c") == 3
    assert df.category_offset("c") == 0


def test_ordinal_encode_optimize():
    # dense int columns redirect to categorize with a warning
    x = np.random.RandomState(0).choice(2, 10, replace=True)
    df = vaex.from_arrays(x=x)
    with pytest.warns(UserWarning, match=".*categorize.*"):
        df.ordinal_encode(df.x)


def test_ordinal_with_offset():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        df = vaex.from_arrays(x=[100, 101, 102, 100]).ordinal_encode("x")
    assert df.x.index_values().tolist() == [0, 1, 2, 0]


def test_ordinal_encode_with_extra_values():
    import random
    values = ["apple", "banana", "orange", "kiwi", "grape", "strawberry"]
    values_but_banana = [values[0]] + values[2:]
    random.seed(3)
    df = vaex.from_arrays(id=list(range(100)),
                          fruit=[random.choice(values_but_banana) for _ in range(100)])
    df["str_fruit"] = df["fruit"]
    df = df.ordinal_encode("fruit", values)
    assert not df[df["str_fruit"] == "strawberry"].fruit.ismissing().values.any()
