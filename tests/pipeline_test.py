"""End-to-end integration: the BASELINE.md NYC-taxi-shaped pipeline
(filter + join + percentile_approx + correlation) on synthetic data with
numpy/pandas oracles, plus serialization/rebuild invariants
(reference: tests/conftest.py rebuild fixtures)."""

import pickle

import numpy as np
import pytest

import vaex_tpu as vaex


@pytest.fixture(scope="module")
def taxi():
    rng = np.random.RandomState(7)
    n = 200_000
    pickup_zone = rng.randint(0, 50, n)
    distance = np.abs(rng.gamma(2.0, 1.5, n))
    fare = 2.5 + distance * 2.0 + rng.normal(0, 1, n)
    tip = np.clip(fare * rng.beta(2, 8, n), 0, None)
    passengers = rng.randint(1, 7, n).astype(np.int8)
    df = vaex.from_arrays(pickup_zone=pickup_zone, distance=distance,
                          fare=fare, tip=tip, passengers=passengers)
    zones = vaex.from_arrays(pickup_zone=np.arange(50),
                             borough=vaex.string_column(
                                 [["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten"][i % 5]
                                  for i in range(50)]))
    return df, zones, dict(pickup_zone=pickup_zone, distance=distance, fare=fare, tip=tip)


def test_full_pipeline(taxi):
    df, zones, raw = taxi
    # 1. filter
    dff = df[(df.distance > 0.5) & (df.fare < 50)]
    mask = (raw["distance"] > 0.5) & (raw["fare"] < 50)
    assert len(dff) == mask.sum()
    # 2. join zone dimension
    dfj = dff.join(zones, on="pickup_zone")
    assert "borough" in dfj.get_column_names()
    # 3. derived column + correlation
    dfj["tip_pct"] = dfj.tip / dfj.fare * 100
    corr = dfj.correlation("distance", "fare")
    import pandas as pd
    oracle = np.corrcoef(raw["distance"][mask], raw["fare"][mask])[0, 1]
    assert corr == pytest.approx(oracle, rel=1e-4)
    # 4. percentile
    p90 = dfj.percentile_approx("fare", 90, percentile_shape=1 << 14)
    assert p90 == pytest.approx(np.percentile(raw["fare"][mask], 90), rel=0.01)
    # 5. groupby borough
    res = dfj.groupby("borough", agg={"mean_fare": vaex.agg.mean("fare"), "n": "count"})
    assert int(res.sum("n")) == mask.sum()
    pdf = pd.DataFrame({"borough": [["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten"][z % 5]
                                    for z in raw["pickup_zone"][mask]],
                        "fare": raw["fare"][mask]})
    oracle_means = pdf.groupby("borough")["fare"].mean()
    keys = res.evaluate("borough")
    keys = keys.to_pylist() if hasattr(keys, "to_pylist") else list(keys)
    got = dict(zip(keys, np.asarray(res.evaluate("mean_fare"))))
    for k, v in oracle_means.items():
        assert got[k] == pytest.approx(v, rel=1e-6)
    # 6. heatmap grid on the joined/filtered frame
    grid = dfj.mean("tip_pct", binby=["distance", "fare"],
                    limits=[[0, 10], [0, 50]], shape=64)
    assert grid.shape == (64, 64)
    assert np.isfinite(np.asarray(grid)).sum() > 100


def test_delay_fused_pipeline(taxi):
    """delay=True batches heterogeneous stats into minimal passes."""
    df, zones, raw = taxi
    passes_before = df.executor.passes
    stats = dict(
        count=df.count(delay=True),
        mean_fare=df.mean("fare", delay=True),
        std_tip=df.std("tip", delay=True),
        minmax=df.minmax("distance", delay=True),
        hist=df.count(binby="distance", limits=[0, 10], shape=32, delay=True),
    )
    df.execute()
    assert stats["count"].get() == 200_000
    assert stats["mean_fare"].get() == pytest.approx(raw["fare"].mean(), rel=1e-6)
    assert stats["std_tip"].get() == pytest.approx(raw["tip"].std(), rel=1e-4)
    # all fused into very few passes (std needs its own moment tasks but same run)
    assert df.executor.passes - passes_before <= 2


def test_dataset_pickle_rebuild(df_local):
    """Datasets and dataframe state survive pickling (reference:
    rebuild_dataset fixtures, tests/conftest.py:10-64)."""
    ds = df_local.dataset
    ds2 = pickle.loads(pickle.dumps(ds))
    assert ds2.fingerprint == ds.fingerprint
    assert list(ds2) == list(ds)
    df2 = vaex.from_dataset(ds2)
    assert df2.sum("x") == df_local.sum("x")


def test_task_encoding_roundtrip(df_local):
    from vaex_tpu import encoding as enc_mod
    from vaex_tpu.ops.gridagg import BinnerScalar
    from vaex_tpu.tasks import TaskAggregation
    import vaex_tpu.agg as agg_mod
    desc = agg_mod.sum("x", selection="x > 2")
    task = TaskAggregation(df_local, (BinnerScalar("x", 0, 10, 4),), desc)
    enc = enc_mod.Encoding()
    spec = enc.encode("task", task)
    blob = enc_mod.serialize({"t": spec}, enc)
    spec2, enc2 = enc_mod.deserialize(blob)
    task2 = enc2.decode("task", spec2["t"], df=df_local)
    assert task2.binners[0].minimum == 0
    assert task2.aggregation_description.selection == "x > 2"
    df_local.executor.schedule(task2)
    df_local.execute()
    expected = df_local.sum("x", binby="x", limits=[0, 10], shape=4, selection="x > 2")
    # executor applies edges=False slicing from the decoded descriptor
    assert np.asarray(task2.get()).tolist() == np.asarray(expected).tolist()


def test_concat_mixed_dtypes():
    # fractional values catch truncation: the resolved schema must promote
    # i32+f64 -> f64 (reference: schema.py resolver_flexible.resolve)
    df1 = vaex.from_arrays(x=np.arange(3, dtype=np.int32))
    df2 = vaex.from_arrays(x=np.arange(3, dtype=np.float64) + 0.5)
    df = vaex.concat([df1, df2])
    assert len(df) == 6
    assert df.x.dtype.numpy == np.dtype("f8")
    assert df.sum("x") == 7.5
    assert df.x.values.tolist() == [0.0, 1.0, 2.0, 0.5, 1.5, 2.5]


def test_concat_missing_column_null_fill():
    # flexible resolver keeps the UNION of names, filling missing fragments
    # with nulls (reference: dataset.py:709-738 DatasetConcatenated flexible)
    df1 = vaex.from_arrays(x=np.arange(3, dtype=np.int32))
    df2 = vaex.from_arrays(x=np.arange(3, dtype=np.int32) + 10,
                           extra=np.array([1.0, 2.0, 3.0]))
    df = vaex.concat([df1, df2])
    assert set(df.get_column_names()) == {"x", "extra"}
    assert df.count("extra") == 3          # nulls don't count
    assert df.sum("extra") == 6.0
    vals = df.extra.values
    assert np.ma.isMaskedArray(vals) and vals.mask[:3].all() and not vals.mask[3:].any()
    # strict resolver refuses schema mismatch
    with pytest.raises(NameError):
        vaex.concat([df1, df2], resolver="strict")


def test_concat_null_fill_export_roundtrip(tmp_path):
    # is_masked must see through ColumnConcatenated/ColumnNulls or the hdf5
    # exporter writes no mask dataset and nulls silently become garbage
    df1 = vaex.from_arrays(x=np.arange(3, dtype=np.int32))
    df2 = vaex.from_arrays(x=np.arange(3, dtype=np.int32) + 10,
                           extra=np.array([1.0, 2.0, 3.0]))
    df = vaex.concat([df1, df2])
    assert df.is_masked("extra")
    path = str(tmp_path / "concat.hdf5")
    df.export(path)
    df3 = vaex.open(path)
    assert df3.count("extra") == 3 and df3.sum("extra") == 6.0
    vals = df3.extra.values
    assert np.ma.isMaskedArray(vals) and vals.mask[:3].all() and not vals.mask[3:].any()


def test_concat_promotes_masked_and_groupby():
    df1 = vaex.from_arrays(g=np.array([0, 0, 1], dtype=np.int8),
                           v=np.ma.MaskedArray([1, 2, 3], mask=[0, 1, 0]))
    df2 = vaex.from_arrays(g=np.array([1, 1, 0], dtype=np.int64),
                           v=np.array([4.5, 5.5, 6.5]))
    df = vaex.concat([df1, df2])
    assert df.g.dtype.numpy == np.dtype("i8")
    assert df.count("v") == 5
    res = df.groupby("g", agg={"v": "sum"}, sort=True)
    assert np.asarray(res["v"]).tolist() == [1 + 6.5, 3 + 4.5 + 5.5]


def test_executor_nested_guard(df_local):
    from vaex_tpu.execution import get_main_executor

    def bad_progress(fraction):
        df_local.count()  # nested execute
        return True

    with pytest.raises(RuntimeError, match="nested"):
        df_local.sum("x", progress=bad_progress)
