"""Fingerprint pinning + rebuild invariants for every dataset decorator
(reference: tests/fingerprint_test.py pins cache keys; tests/conftest.py:10-64
rebuild_dataset roundtrips each dataset through pickle and vaex-encoding).

Fingerprints key the result cache (cache.py) and the HBM column cache — if
they drift between releases, cached results are silently orphaned (or worse,
collide).  The pinned values below were computed at round 4; a failure here
means the fingerprint algorithm changed and every persisted cache entry is
invalidated: bump the pins ONLY with that consequence in mind.
"""

import pickle

import numpy as np
import pytest

import vaex_tpu as vaex
from vaex_tpu import encoding as enc_mod


def _base():
    return vaex.dataset.DatasetArrays(
        x=np.arange(10, dtype=np.int64),
        y=np.arange(10, dtype=np.float64) * 0.5,
        z=np.arange(10, dtype=np.float32) + 2,
    )


def _decorated():
    """One instance of every dataset decorator, chained and standalone."""
    ds = _base()
    other = vaex.dataset.DatasetArrays(w=np.arange(10, dtype=np.int32))
    return {
        "arrays": ds,
        "renamed": ds.renamed({"x": "a"}),
        "sliced": ds.sliced(2, 8),
        "take": ds.take(np.array([1, 3, 5])),
        "dropped": ds.dropped("z"),
        "merged": ds.merged(other),
        "concat": ds.concat(_base()),
        "chain": ds.renamed({"x": "a"}).sliced(1, 9).dropped("z"),
    }


@pytest.mark.parametrize("name", list(_decorated()))
def test_dataset_decorator_pickle_rebuild(name):
    ds = _decorated()[name]
    ds2 = pickle.loads(pickle.dumps(ds))
    assert ds2.fingerprint == ds.fingerprint
    assert list(ds2) == list(ds)
    assert ds2.row_count == ds.row_count
    # content equality through the chunk iterator (the executor's view)
    for (i1, j1, c1), (i2, j2, c2) in zip(ds.chunk_iterator(list(ds)),
                                          ds2.chunk_iterator(list(ds2))):
        assert (i1, j1) == (i2, j2)
        for k in c1:
            np.testing.assert_array_equal(np.asarray(c1[k]), np.asarray(c2[k]))


@pytest.mark.parametrize("name", list(_decorated()))
def test_dataframe_state_encoding_rebuild(name):
    """DataFrames over every decorator roundtrip their state through the
    vaex-encoding wire format (the server path) without fingerprint drift."""
    df = vaex.from_dataset(_decorated()[name])
    col = df.get_column_names()[0]
    df["v2"] = df[col] * 2
    df.select(f"{col} > 2", name="sel")
    enc = enc_mod.Encoding()
    spec = enc.encode("dataframe-state", df)
    blob = enc_mod.serialize({"s": spec}, enc)
    spec2, enc2 = enc_mod.deserialize(blob)
    df2 = vaex.from_dataset(_decorated()[name])
    enc2.decode("dataframe-state", spec2["s"], df=df2)
    assert df2.fingerprint() == df.fingerprint()
    np.testing.assert_array_equal(np.asarray(df2.evaluate("v2")),
                                  np.asarray(df.evaluate("v2")))
    assert df2.count(selection="sel") == df.count(selection="sel")


def test_fingerprints_pinned():
    """Cache keys must not drift silently across releases."""
    ds = _base()
    pins = {
        "arrays": ds.fingerprint,
        "renamed": ds.renamed({"x": "a"}).fingerprint,
        "sliced": ds.sliced(2, 8).fingerprint,
        "df": vaex.from_dataset(ds).fingerprint(),
    }
    # recompute-stability inside one process
    assert pins["arrays"] == _base().fingerprint
    assert pins["df"] == vaex.from_dataset(_base()).fingerprint()
    expected = {
        "arrays": "dataset-arrays-fb6ed1824ce932ef48ab7163cd49bc50",
        "renamed": "dataset-rename-c8c068994ec617f42aad1b54e263ce1b",
        "sliced": "dataset-slice-5c4f77ad2e8c8acc3805cc2ef7867d0e",
        "df": "dataframe-19f491ecccb6ab3ed785b5b146c59999",
    }
    assert pins == expected, (
        "fingerprint algorithm changed — every persisted cache entry is "
        f"orphaned; got {pins}")


def test_task_fingerprint_pinned():
    from vaex_tpu.ops.gridagg import BinnerScalar
    from vaex_tpu.tasks import TaskAggregation
    import vaex_tpu.agg as agg_mod
    df = vaex.from_dataset(_base())
    task = TaskAggregation(df, (BinnerScalar("x", 0, 10, 4),), agg_mod.sum("y"))
    fp = task.fingerprint()
    assert fp == TaskAggregation(df, (BinnerScalar("x", 0, 10, 4),),
                                 agg_mod.sum("y")).fingerprint()
    assert fp != TaskAggregation(df, (BinnerScalar("x", 0, 10, 4),),
                                 agg_mod.sum("z")).fingerprint()
    assert fp == "task-aggregation-5c8638fbe8b353e799e24984c5ac141e"
