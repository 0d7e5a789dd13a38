"""viz / geo / CLI / interchange protocol / state / cache tests."""

import numpy as np
import pytest

import vaex_tpu as vaex


def test_viz_histogram(df_local, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ax = df_local.viz.histogram("x", shape=8)
    assert ax is not None
    plt.close("all")
    ax = df_local.viz.heatmap("x", "y", shape=16)
    plt.close("all")
    ax = df_local.viz.scatter("x", "y")
    plt.close("all")


def test_viz_contour_vector_tensor():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rng = np.random.RandomState(0)
    n = 2000
    df = vaex.from_arrays(
        x=rng.normal(0, 1, n), y=rng.normal(0, 1, n),
        vx=rng.normal(1, 0.5, n), vy=rng.normal(-1, 2.0, n))
    ax = df.viz.contour("x", "y", shape=32, f="log1p")
    assert ax is not None
    plt.close("all")
    ax = df.viz.contour("x", "y", what="mean(vx)", shape=16, fill=True,
                        levels=5, colorbar=True)
    plt.close("all")
    # vector field: arrows only in populated cells
    ax = df.viz.vector("x", "y", "vx", "vy", shape=8, min_count=5, normalize=True)
    q = [c for c in ax.collections if hasattr(c, "U")]
    assert q, "quiver not drawn"
    lengths = np.hypot(q[0].U, q[0].V)
    np.testing.assert_allclose(lengths, 1.0, rtol=1e-9)  # normalized
    plt.close("all")
    # tensor: dispersion ellipses elongated along vy (var(vy) >> var(vx))
    artists = df.viz.tensor("x", "y", "vx", "vy", shape=4, min_count=10)
    assert artists
    # the dominant eigen direction should be close to the y axis
    angles = np.array([a.angle % 180 for a in artists])
    assert ((np.abs(angles - 90) < 30).mean()) > 0.8
    plt.close("all")
    # f-transform sanity: log on a mean heatmap
    ax = df.viz.heatmap("x", "y", what="mean(vx*vx)", shape=8, f="log")
    plt.close("all")
    with pytest.raises(ValueError, match="unknown transform"):
        df.viz.histogram("x", shape=4, f="bogus")
    plt.close("all")


def test_geo_spherical_roundtrip():
    rng = np.random.RandomState(0)
    n = 100
    alpha = rng.uniform(0, 360, n)
    delta = rng.uniform(-89, 89, n)
    distance = rng.uniform(1, 10, n)
    df = vaex.from_arrays(alpha=alpha, delta=delta, distance=distance)
    df = df.geo.spherical2cartesian("alpha", "delta", "distance")
    df = df.geo.cartesian2spherical(alpha="alpha2", delta="delta2", distance="distance2")
    d2 = np.asarray(df.evaluate("distance2"))
    assert d2 == pytest.approx(distance)
    delta2 = np.asarray(df.evaluate("delta2"))
    assert delta2 == pytest.approx(delta)


def test_geo_polar():
    df = vaex.from_arrays(x=np.array([1.0, 0.0]), y=np.array([0.0, 2.0]))
    df = df.geo.cartesian2polar()
    assert np.asarray(df.evaluate("r_polar")).tolist() == [1.0, 2.0]
    assert np.asarray(df.evaluate("phi_polar")) == pytest.approx([0.0, 90.0])


def test_geo_inside_polygon():
    df = vaex.from_arrays(x=np.array([0.5, 5.0]), y=np.array([0.5, 5.0]))
    expr = df.geo.inside_polygon("x", "y", [0, 1, 1, 0], [0, 0, 1, 1])
    assert np.asarray(df.evaluate(expr)).tolist() == [True, False]


def test_rotation():
    df = vaex.from_arrays(x=np.array([1.0]), y=np.array([0.0]))
    df = df.geo.rotation_2d("x", "y", "xr", "yr", 90)
    assert float(df.evaluate("xr")[0]) == pytest.approx(0, abs=1e-12)
    assert float(df.evaluate("yr")[0]) == pytest.approx(1)


def test_cli_convert_and_meta(tmp_path, capsys):
    from vaex_tpu.__main__ import main
    df = vaex.from_arrays(x=np.arange(10.0), y=np.arange(10.0) ** 2)
    src = str(tmp_path / "in.hdf5")
    dst = str(tmp_path / "out.parquet")
    df.export(src)
    assert main(["convert", src, dst]) == 0
    df2 = vaex.open(dst)
    assert df2.sum("x") == 45
    assert main(["meta", dst]) == 0
    out = capsys.readouterr().out
    assert '"rows": 10' in out
    assert main(["settings"]) == 0


def test_interchange_protocol(df_local):
    import pandas as pd
    df = df_local[["x", "i", "s"]]
    xchg = df.__dataframe__()
    assert xchg.num_rows() == 10
    assert xchg.num_columns() == 3
    pdf = pd.api.interchange.from_dataframe(df)
    assert pdf["x"].tolist() == list(np.arange(10.0))
    assert pdf["s"][0] == "apple"


def test_cache_hits(df_local):
    from vaex_tpu import cache
    with cache.temporary("memory"):
        before = dict(cache.log_stats)
        df_local.sum("x")
        df_local.sum("x")  # second call should hit
        assert cache.log_stats["hit"] > before.get("hit", 0)


def test_cache_redis_tier(df_local):
    """Redis tier drives the same MutableMapping protocol; tested with an
    injected fake client (reference: vaex/cache.py:272-371 redis)."""
    from vaex_tpu import cache

    class FakeRedis:
        def __init__(self):
            self.store = {}

        def get(self, k):
            return self.store.get(k)

        def set(self, k, v):
            self.store[k] = v

        def delete(self, k):
            return self.store.pop(k, None) is not None

        def scan_iter(self, pattern):
            prefix = pattern.rstrip("*")
            return iter([k.encode() for k in self.store if k.startswith(prefix)])

    fake = FakeRedis()
    r = cache.RedisCache(client=fake)
    old = cache.cache
    cache.cache = r
    try:
        v1 = df_local.sum("x")
        assert len(r) == 1 and fake.store  # result landed in "redis"
        v2 = df_local.sum("x")
        assert v1 == v2 == 45
        key = next(iter(r))
        del r[key]
        assert len(r) == 0
        with pytest.raises(KeyError):
            r[key]
    finally:
        cache.cache = old
    # unknown type spec raises actionably; redis spec requires the package
    with pytest.raises(ValueError, match="unknown cache type"):
        cache.on("bogus")
    try:
        import redis  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="redis"):
            cache.on("memory,redis")
    cache.off()


def test_cache_disk(df_local, tmp_path):
    from vaex_tpu import cache, settings
    old_path = settings.cache.path
    settings.cache.path = str(tmp_path / "cache")
    try:
        with cache.temporary("disk"):
            v1 = df_local.sum("x")
            v2 = df_local.sum("x")
            assert v1 == v2 == 45
    finally:
        settings.cache.path = old_path


def test_state_roundtrip(df_local, tmp_path):
    df = df_local.copy()
    df["r"] = df.x * 2
    df.select("x > 3")
    state = df.state_get()
    fresh = vaex.from_arrays(**{name: df_local.evaluate(name, filtered=False)
                                for name in ["x", "y", "i", "m", "f"]})
    fresh.state_set(state)
    assert "r" in fresh.get_column_names()
    assert np.asarray(fresh.evaluate("r")).tolist() == list(np.arange(10.0) * 2)
    assert fresh.count(selection=True) == 6
    # file roundtrip
    path = str(tmp_path / "state.json")
    df.state_write(path)
    fresh2 = vaex.from_arrays(x=np.arange(10.0), y=np.arange(10.0)**2, i=np.arange(10, dtype=np.int32),
                              m=np.arange(10), f=np.arange(10.0))
    fresh2.state_load(path)
    assert "r" in fresh2.get_column_names()


def test_state_with_udf(df_local):
    df = df_local.copy()
    double = df.add_function("double", lambda ar: ar * 2)
    df["d"] = double(df.x)
    state = df.state_get()
    fresh = vaex.from_arrays(x=np.arange(10.0))
    fresh.state_set(state)
    assert np.asarray(fresh.evaluate("d")).tolist() == list(np.arange(10.0) * 2)


def test_propagate_uncertainties():
    df = vaex.from_arrays(x=np.array([1.0, 2.0]), x_uncertainty=np.array([0.1, 0.2]))
    df["y"] = df.x ** 2
    df.propagate_uncertainties([df.y])
    # dy = 2x dx
    expected = 2 * np.array([1.0, 2.0]) * np.array([0.1, 0.2])
    assert np.asarray(df.evaluate("y_uncertainty")) == pytest.approx(expected)


def test_progress_callback(df_local):
    fractions = []
    df_local.sum("x", progress=lambda f: fractions.append(f) or True)
    assert fractions and fractions[-1] == 1.0


def test_progress_cancel(df_local, small_buffer_fixture):
    from vaex_tpu.execution import UserAbort
    with small_buffer_fixture(df_local, 3):
        result = df_local.sum("x", progress=lambda f: False, delay=True)
        df_local.execute()
        assert result.isRejected or result.isPending


def test_mutual_information(df_local):
    mi = df_local.mutual_information("x", "y", mi_shape=16)
    assert mi > 0


def test_percentile_approx(df_local):
    # approximate by design (binned cum-grid, like the reference); tight on
    # large uniform data, loose on 10 rows
    x = np.arange(10.0)
    p50 = df_local.percentile_approx("x", 50, percentile_shape=1024)
    assert p50 == pytest.approx(np.percentile(x, 50), abs=1.0)
    rng = np.random.RandomState(0)
    big = rng.normal(0, 1, 100_000)
    dfb = vaex.from_arrays(v=big)
    for p in [10, 50, 90]:
        got = dfb.percentile_approx("v", p, percentile_shape=1024 * 16)
        assert got == pytest.approx(np.percentile(big, p), abs=0.01)


def test_median_approx(df_local):
    assert df_local.median_approx("x") == pytest.approx(4.5, abs=1.0)


def test_mode():
    df = vaex.from_arrays(x=np.array([1.0, 2, 2, 3, 2, 5]))
    assert df.mode("x", mode_shape=8) == pytest.approx(2, abs=0.5)


def test_correlation_cov(df_local):
    x = np.arange(10.0)
    y = x ** 2
    corr = df_local.correlation("x", "y")
    expected = np.corrcoef(x, y)[0, 1]
    assert corr == pytest.approx(expected, rel=1e-6)
    cov = df_local.covar("x", "y")
    assert cov == pytest.approx(np.cov(x, y, bias=True)[0, 1], rel=1e-6)
    matrix = df_local.cov(["x", "y"])
    assert matrix[0, 0] == pytest.approx(x.var(), rel=1e-6)


def test_describe(df_local):
    desc = df_local.describe()
    assert desc.loc["count", "x"] == 10
    assert desc.loc["NA", "m"] == 2


def test_dropna(df_local):
    assert len(df_local.dropna(column_names=["m"])) == 8
    assert len(df_local.dropnan(column_names=["f"])) == 9
    assert len(df_local.dropmissing(column_names=["m"])) == 8


def test_native_module():
    from vaex_tpu import native
    if not native.available:
        import pytest
        pytest.skip("native extension not built")
    s = native.NativeOrderedSet.create(np.int64)
    assert s.update(np.array([5, 3, 5, 7], dtype=np.int64)) == 3
    assert s.keys().tolist() == [5, 3, 7]
    assert s.map(np.array([3, 9], dtype=np.int64)).tolist() == [1, -1]
    out = native.pad_to(np.arange(3, dtype=np.float64), 6, 0)
    assert out.tolist() == [0, 1, 2, 0, 0, 0]


def test_native_ordered_set_pinned_shards():
    """The parallel build (per-thread local sets over row ranges + row-ordered
    merge of local uniques, mirroring the reference's nmaps submaps,
    hash_primitives.hpp:98-260) must preserve GLOBAL first-occurrence order.
    nthreads>1 forces the sharded path even on a 1-core box, pinning the
    merge logic the auto heuristic would skip (VERDICT r4 #6)."""
    from vaex_tpu import native
    if not native.available:
        import pytest
        pytest.skip("native extension not built")
    rng = np.random.RandomState(7)
    for dtype in (np.int64, np.int32, np.float64):
        # duplicates straddle shard boundaries; first occurrences scattered
        n = 100_003  # odd: uneven final shard
        values = rng.randint(0, 5000, n).astype(dtype)
        values[::97] = rng.randint(5000, 5500, len(values[::97])).astype(dtype)
        serial = native.NativeOrderedSet.create(dtype)
        serial.update(values, nthreads=1)
        for nthreads in (2, 5, 16):
            sharded = native.NativeOrderedSet.create(dtype)
            added = sharded.update(values, nthreads=nthreads)
            assert added == len(serial)
            np.testing.assert_array_equal(sharded.keys(), serial.keys())
            # probes agree (the map is threaded independently)
            probe = values[:1000]
            np.testing.assert_array_equal(sharded.map(probe), serial.map(probe))
        # incremental: a second sharded update only adds the new tail keys
        tail = (np.arange(20) + 6000).astype(dtype)
        sharded = native.NativeOrderedSet.create(dtype)
        sharded.update(values, nthreads=3)
        assert sharded.update(np.concatenate([values[:50], tail]), nthreads=3) == 20
        np.testing.assert_array_equal(
            sharded.keys(), np.concatenate([serial.keys(), tail]))
    bits = np.packbits(np.array([1, 0, 1], dtype=np.uint8), bitorder="little")
    assert native.unpack_bitmap(bits.tobytes(), 3).tolist() == [True, False, True]


def test_pallas_hist2d_interpret():
    """Numeric parity of the MXU one-hot kernel vs numpy (interpret mode)."""
    import jax
    from jax.experimental import pallas as pl
    import vaex_tpu.ops.pallas_gridagg as pg
    rng = np.random.RandomState(0)
    N, nx, ny = 3000, 16, 16
    bx = rng.randint(-1, nx, N).astype(np.int32)
    by = rng.randint(0, ny, N).astype(np.int32)
    v = rng.rand(N).astype(np.float32)
    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        count, total = pg.hist2d_count_sum(np.asarray(bx), np.asarray(by), np.asarray(v), nx, ny, tile=256)
    finally:
        pl.pallas_call = orig
    mask = bx >= 0
    expected = np.zeros((nx, ny))
    np.add.at(expected, (bx[mask], by[mask]), 1)
    assert np.array_equal(np.asarray(count), expected)
    expected_sum = np.zeros((nx, ny))
    np.add.at(expected_sum, (bx[mask], by[mask]), v[mask])
    assert np.allclose(np.asarray(total), expected_sum, atol=1e-4)


@pytest.mark.parametrize("mode,tol_bits", [("i24", 22), ("hilo", 15), ("i8lo", 13)])
def test_pallas_histflat_payload_modes_interpret(mode, tol_bits):
    """Payload encodings: count exact, sum within each mode's error bound.

    Interpreter-semantics test: pinned to CPU — pallas interpret mode on the
    TPU backend drops the bf16 lo-correction terms (interpreter artifact;
    the REAL kernel's hilo/i8lo error bounds are verified on the chip by
    tests_tpu/test_pallas_parity.py)."""
    import jax
    if mode in ("hilo", "i8lo") and jax.default_backend() == "tpu":
        pytest.skip("interpret-mode bf16 semantics diverge on the TPU backend")
    from jax.experimental import pallas as pl
    import vaex_tpu.ops.pallas_gridagg as pg
    rng = np.random.RandomState(2)
    N, C = 3000, 500
    c = rng.randint(-1, C, N).astype(np.int32)
    v1 = rng.normal(3, 2, N).astype(np.float32)
    v2 = (v1 * v1).astype(np.float32)
    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        count, (s1, s2) = pg.histflat_grid(
            np.asarray(c), (np.asarray(v1), np.asarray(v2)), C,
            tile=256, mode=mode)
    finally:
        pl.pallas_call = orig
    mask = c >= 0
    ref_c = np.bincount(c[mask], minlength=C)
    assert np.array_equal(np.asarray(count), ref_c)
    for s, v in ((s1, v1), (s2, v2)):
        ref_s = np.bincount(c[mask], weights=v[mask].astype(np.float64), minlength=C)
        atol = np.abs(v).max() * 2.0**-tol_bits * np.sqrt(max(1, N / C)) * 4 + 1e-4
        np.testing.assert_allclose(np.asarray(s), ref_s, rtol=0, atol=atol)


def test_pallas_histflat_count_wide_interpret():
    """Count-only rides the 512-wide r one-hot when C >= 4096."""
    from jax.experimental import pallas as pl
    import vaex_tpu.ops.pallas_gridagg as pg
    rng = np.random.RandomState(4)
    C = 9000
    c = rng.randint(-1, C, 40000).astype(np.int32)
    orig = pl.pallas_call
    pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        count, sums = pg.histflat_grid(np.asarray(c), (), C, tile=1024)
    finally:
        pl.pallas_call = orig
    assert sums == ()
    assert np.array_equal(np.asarray(count), np.bincount(c[c >= 0], minlength=C))


def test_open_convert(tmp_path):
    df = vaex.from_arrays(x=np.arange(10.0))
    csv_path = str(tmp_path / "c.csv")
    df.export_csv(csv_path)
    df2 = vaex.open(csv_path, convert=True)
    import os
    assert os.path.exists(csv_path + ".hdf5")
    assert df2.sum("x") == 45
    # second open reuses the converted file
    df3 = vaex.open(csv_path, convert=True)
    assert df3.sum("x") == 45


def test_file_module(tmp_path):
    from vaex_tpu import file as file_mod
    assert not file_mod.is_remote("/tmp/x.hdf5")
    assert file_mod.is_remote("s3://bucket/x.hdf5")
    base, opts = file_mod.split_options("s3://b/k?anon=true&region=x")
    assert base == "s3://b/k" and opts == {"anon": "true", "region": "x"}
    fp1 = file_mod.fingerprint("/tmp/nonexistent-xyz")
    assert isinstance(fp1, str)
    # memory:// via fsspec roundtrip
    import fsspec
    with fsspec.open("memory://test/data.bin", "wb") as f:
        f.write(b"hello")
    local = file_mod.fetch_local("memory://test/data.bin")
    assert open(local, "rb").read() == b"hello"


def test_prefetch_iterator(df_local):
    chunks = list(df_local.evaluate_iterator("x", chunk_size=3, prefetch=True))
    total = np.concatenate([np.asarray(c) for _, _, c in chunks])
    assert total.tolist() == list(np.arange(10.0))


def test_events_signal():
    from vaex_tpu.events import Signal
    s = Signal("test")
    got = []
    s.connect(lambda v: got.append(v))
    s.emit(42)
    assert got == [42]


def test_itertools():
    from vaex_tpu.itertools import buffer, pmap
    assert list(buffer(iter(range(5)))) == [0, 1, 2, 3, 4]
    assert list(pmap(lambda v: v * 2, range(5))) == [0, 2, 4, 6, 8]
    def bad():
        yield 1
        raise ValueError("boom")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        list(buffer(bad()))


def test_memory_limit_tracker(df_local):
    from vaex_tpu import settings
    old = settings.memory.tracker, settings.memory.limit
    settings.memory.tracker, settings.memory.limit = "limit", "1KB"
    try:
        with pytest.raises(MemoryError):
            # a 1M-cell grid blows the 1KB budget before the pass starts
            df_local.count(binby="x", limits=[0, 10], shape=1_000_000)
    finally:
        settings.memory.tracker, settings.memory.limit = old


def test_percentile_binby():
    rng = np.random.RandomState(0)
    g = rng.randint(0, 4, 40_000)
    v = rng.normal(g, 1.0)  # per-group median ≈ group id
    df = vaex.from_arrays(g=g, v=v)
    medians = df.percentile_approx("v", 50, binby="g", limits=[0, 4], shape=4,
                                   percentile_shape=4096)
    assert np.asarray(medians) == pytest.approx([0, 1, 2, 3], abs=0.1)


def test_limits_percentage(df_local):
    lo, hi = df_local.limits("x", "90%")
    assert 0 <= lo < hi <= 9
    lims = df_local.limits(["x", "y"], ["minmax", "95%"])
    assert lims[0] == [0, 9]


def test_small_api(df_local):
    assert df_local.column_count() == 7
    assert df_local.byte_size() > 0
    df_local.set_active_fraction(0.5)
    assert df_local.get_active_fraction() == 0.5
    assert len(df_local) == 5
    df_local.set_active_range(0, 10)


def test_drop_duplicates():
    df = vaex.from_arrays(a=np.array([1, 2, 1, 3, 2]), b=np.array([10.0, 20, 10, 30, 21]))
    out = df.drop_duplicates(["a"])
    assert sorted(np.asarray(out.evaluate("a")).tolist()) == [1, 2, 3]
    assert len(out) == 3
    out2 = df.drop_duplicates()
    assert len(out2) == 4  # (2,20) and (2,21) differ


def test_export_partitioned(tmp_path):
    df = vaex.from_arrays(g=np.array([0, 1, 0, 1]), v=np.arange(4.0))
    base = str(tmp_path / "part")
    df.export_partitioned(base + "/data.parquet" if False else base, by="g")
    import os, glob
    files = glob.glob(base + "/g=*/part.*")
    assert len(files) == 2
    back = vaex.open(files[0])
    assert len(back) == 2


def test_reference_parity_methods(df_local, tmp_path):
    df = df_local
    assert df.shape == (10, 7)
    assert df.nbytes > 0
    assert df.length() == 10
    df.select("x > 4")
    assert df.selected_length() == 5
    rows = list(df.iterrows())
    assert rows[0][0] == 0 and rows[0][1]["x"] == 0.0
    arrays = df.to_arrays(["x", "y"])
    assert len(arrays) == 2
    vals = df.values
    assert vals.shape[0] == 10
    expr = df.func.sin(df.x)
    assert np.asarray(df.evaluate(expr)) == pytest.approx(np.sin(np.arange(10.0)))
    df.set_current_row(3)
    assert df.has_current_row() and df.get_current_row() == 3
    assert df.label("x") == "x"
    df.units["x"] = "km"
    assert df.label("x") == "x (km)"
    missing, different, equal = df.compare(df.copy())
    assert not missing and not different
    edges = df.bin_edges("x", [0, 10], shape=5)
    assert len(edges) == 6
    # export_many
    paths = df[["x", "y"]].export_many(str(tmp_path / "part-{i}.parquet"), chunk_size=4)
    assert len(paths) == 3
    back = vaex.open_many(paths)
    assert back.sum("x") == 45
    df.delete_variable(df.add_variable("tmpv", 1))
    df["virt"] = df.x * 2
    df.delete_virtual_column("virt")
    assert "virt" not in df.get_column_names()


def test_evaluate_slice_on_filtered(df_local):
    dff = df_local[df_local.x > 2]
    # i1/i2 index the FILTERED rows (reference semantics)
    vals = np.asarray(dff.evaluate("x", 0, 3))
    assert vals.tolist() == [3.0, 4.0, 5.0]
    assert np.asarray(dff.evaluate("x", 2, 5)).tolist() == [5.0, 6.0, 7.0]


def test_pass_log(df_local):
    from vaex_tpu import profiling
    df_local.sum("x")
    stats = profiling.pass_stats()
    assert stats and stats[-1]["rows"] == 10
    assert stats[-1]["agg_tasks"] >= 1


def test_datasets_module():
    from vaex_tpu import datasets
    t = datasets.titanic(200)
    assert len(t) == 200
    assert set(t.get_column_names()) >= {"pclass", "survived", "sex", "age", "fare"}
    surv = t.groupby("sex", agg={"rate": vaex.agg.mean("_astype(survived, 'float64')")})
    keys = surv.evaluate("sex")
    keys = keys.to_pylist() if hasattr(keys, "to_pylist") else list(keys)
    rates = dict(zip(keys, np.asarray(surv.evaluate("rate"))))
    assert rates["female"] > rates["male"]
    i = datasets.iris()
    assert len(i) == 150 and i.nunique("species") == 3


def test_selection_favorites(df_local, tmp_path, monkeypatch):
    monkeypatch.setattr(df_local, "get_private_dir", lambda create=False: str(tmp_path))
    df_local.select("x > 5")
    df_local.selection_favorite_add("big_x")
    df_local.select_nothing()
    assert df_local.get_selection() is None
    df_local.selection_favorite_apply("big_x")
    assert df_local.count(selection=True) == 4
    df_local.selection_favorite_remove("big_x")
    assert "big_x" not in df_local.selections_favorite_load()


def test_struct_flatten():
    import pyarrow as pa
    array = pa.StructArray.from_arrays(arrays=[[1, 2], ["a", "b"], [3, 4]],
                                       names=["col1", "col2", "col3"])
    df = vaex.from_arrays(array=array, plain=np.array([9.0, 10.0]))
    flat = df.struct.flatten()
    names = flat.get_column_names()
    assert names == ["array_col1", "array_col2", "array_col3", "plain"]
    assert np.asarray(flat.evaluate("array_col1")).tolist() == [1, 2]
    c2 = flat.evaluate("array_col2")
    assert (c2.to_pylist() if hasattr(c2, "to_pylist") else list(c2)) == ["a", "b"]
    assert np.asarray(flat.evaluate("plain")).tolist() == [9.0, 10.0]
    # nested struct, recursive
    inner = pa.StructArray.from_arrays(arrays=[[5, 6]], names=["deep"])
    outer = pa.StructArray.from_arrays(arrays=[inner, [7, 8]], names=["in", "top"])
    df2 = vaex.from_arrays(s=outer)
    flat2 = df2.struct.flatten()
    assert flat2.get_column_names() == ["s_in_deep", "s_top"]
    assert np.asarray(flat2.evaluate("s_in_deep")).tolist() == [5, 6]
    flat3 = df2.struct.flatten(recursive=False)
    assert flat3.get_column_names() == ["s_in", "s_top"]


def test_aliases_and_open(tmp_path, monkeypatch):
    from vaex_tpu import settings
    monkeypatch.setattr(settings.main, "aliases_path", str(tmp_path / "aliases.yaml"))
    monkeypatch.setattr(vaex.aliases, "_loaded", False)
    vaex.aliases.clear()
    df = vaex.from_arrays(x=np.arange(10.0))
    target = str(tmp_path / "data.hdf5")
    df.export(target)
    vaex.aliases["mydata"] = target
    df2 = vaex.open("mydata")
    assert len(df2) == 10
    # persisted: a fresh instance reloads from disk
    fresh = type(vaex.aliases)()
    monkeypatch.setattr(vaex, "aliases", fresh, raising=True)
    assert fresh["mydata"] == target
    del fresh["mydata"]
    assert "mydata" not in fresh


def test_cli_alias(tmp_path, monkeypatch, capsys):
    from vaex_tpu import settings
    from vaex_tpu.__main__ import main
    monkeypatch.setattr(settings.main, "aliases_path", str(tmp_path / "aliases.yaml"))
    monkeypatch.setattr(vaex.aliases, "_loaded", False)
    vaex.aliases.clear()
    assert main(["alias", "add", "foo", "/tmp/foo.hdf5"]) == 0
    assert main(["alias", "add", "foo", "/tmp/bar.hdf5"]) == 1  # no --force
    assert main(["alias", "add", "foo", "/tmp/bar.hdf5", "-f"]) == 0
    main(["alias", "list"])
    out = capsys.readouterr().out
    assert "foo: /tmp/bar.hdf5" in out
    assert main(["alias", "remove", "foo"]) == 0
    assert "foo" not in vaex.aliases


def test_settings_yaml_file(tmp_path, monkeypatch):
    from vaex_tpu import settings as settings_mod
    cfg = tmp_path / "main.yaml"
    cfg.write_text("chunk:\n  size_max: 12345\ncompute:\n  precision: float64\n")
    monkeypatch.setenv("VAEX_TPU_SETTINGS_FILE", str(cfg))
    s = settings_mod._apply_yaml_file(settings_mod.Settings())
    assert s.chunk.size_max == 12345
    assert s.compute.precision == "float64"
    # env var beats the file
    monkeypatch.setenv("VAEX_TPU_CHUNK_SIZE_MAX", "999")
    s2 = settings_mod._apply_yaml_file(settings_mod.Settings())
    assert s2.chunk.size_max == 999


def test_executor_shards_over_mesh():
    """The executor shards chunk rows over all visible devices via shard_map
    (conftest forces an 8-device CPU mesh); results must match the
    single-device path bitwise for ints and to f64 accuracy for floats."""
    import jax
    from vaex_tpu.execution import ExecutorLocal
    rng = np.random.RandomState(4)
    x = rng.normal(0, 1, 100_001)          # odd length: padding must split evenly
    i = rng.randint(-1000, 1000, 100_001)
    df = vaex.from_arrays(x=x, i=i)
    assert float(df.sum("x")) == pytest.approx(x.sum(), rel=1e-12)
    assert int(df.sum("i")) == i.sum()
    cnt = np.asarray(df.count(binby="x", limits=[-3, 3], shape=32))
    n_dev = len(jax.devices())
    assert df.executor.pass_log[-1]["shards"] == n_dev
    if jax.default_backend() != "tpu":  # conftest forces the 8-device CPU mesh
        assert n_dev == 8
    # unsharded executor gives identical grids
    ex1 = ExecutorLocal(mesh=None)
    df2 = vaex.from_arrays(x=x, i=i)
    df2._executor = ex1
    cnt1 = np.asarray(df2.count(binby="x", limits=[-3, 3], shape=32))
    assert ex1.pass_log[-1]["shards"] == 1
    assert cnt.tolist() == cnt1.tolist()


def test_evaluate_list(df_local):
    xs, ys = df_local.evaluate(["x", "y"])
    assert np.asarray(xs).tolist() == np.arange(10.0).tolist()
    assert np.asarray(ys).tolist() == (np.arange(10.0) ** 2).tolist()


def test_split_float_and_cache_helpers(df_local):
    parts = df_local.split(0.3)
    assert [len(p) for p in parts] == [3, 7]
    parts = df_local.split_random(0.3, random_state=42)
    assert [len(p) for p in parts] == [3, 7]
    from vaex_tpu import cache
    cache.memory()
    try:
        assert cache.is_on()
        assert df_local.count() == 10
    finally:
        cache.off()
    assert not cache.is_on()


def test_arrow_pycapsule_interface(df_local):
    """Arrow PyCapsule stream export: pa.table(df) consumes directly."""
    import pyarrow as pa
    t = pa.table(df_local)
    assert t.num_rows == len(df_local)
    assert set(t.column_names) == set(df_local.get_column_names())


def test_unpack_bitmap_bounds():
    # out-of-range bit counts must raise, not read past the buffer
    from vaex_tpu import native
    import pytest
    with pytest.raises(ValueError):
        native.unpack_bitmap(b"\xff", 1000)
    with pytest.raises(ValueError):
        native.unpack_bitmap(b"\xff\xff", 10, 7)
    assert native.unpack_bitmap(b"\x0f", 8).tolist() == [True] * 4 + [False] * 4
    assert native.unpack_bitmap(b"\x0f", 3, 3).tolist() == [True, False, False]


def test_groupby_join_negative_zero():
    # -0.0 == 0.0 must group/join as one key (equal values -> equal hash)
    import numpy as np
    import vaex_tpu as vaex
    df = vaex.from_arrays(k=np.array([0.0, -0.0, 0.0, 1.0]), v=np.array([1.0, 2.0, 3.0, 4.0]))
    r = df.groupby("k", agg={"v": "sum"}, sort=True)
    assert len(np.asarray(r.evaluate("k"))) == 2
    assert np.asarray(r.evaluate("v")).tolist() == [6.0, 4.0]
    left = vaex.from_arrays(k=np.array([0.0, 1.0]), a=np.array([1.0, 2.0]))
    right = vaex.from_arrays(k=np.array([-0.0, 1.0]), b=np.array([10.0, 20.0]))
    j = left.join(right, on="k", how="left")
    assert j.evaluate("b").tolist() == [10.0, 20.0]


def test_stat_expressions(df_local):
    """Composable statistic algebra (reference: vaex/stat.py:7-122)."""
    s = vaex.stat.mean("x") / vaex.stat.std("x")
    v = s.calculate(df_local)
    x = np.asarray(df_local.evaluate("x"))
    assert v == pytest.approx(x.mean() / x.std())
    # binned: count-normalized sum == mean where count > 0
    expr = vaex.stat.sum("x") / vaex.stat.count("x")
    grid = expr.calculate(df_local, binby="x", limits=[0, 10], shape=5)
    ref = np.asarray(df_local.mean("x", binby="x", limits=[0, 10], shape=5))
    counts = np.asarray(df_local.count(binby="x", limits=[0, 10], shape=5))
    mask = counts > 0
    np.testing.assert_allclose(np.asarray(grid)[mask], ref[mask])
    # unary + reverse ops + repr
    r = 1 - (-vaex.stat.min("x"))
    assert r.calculate(df_local) == 1.0
    assert "mean" in str(vaex.stat.mean("x"))
    assert vaex.stat.mean("x").pretty_name() == "x_mean"
    # delayed: both stats fuse into one pass
    passes0 = df_local.executor.passes
    d = (vaex.stat.sum("x") + vaex.stat.sum("y")).calculate(df_local, delay=True)
    df_local.execute()
    assert d.get() == 45 + np.asarray(df_local.evaluate("y")).sum()
    assert df_local.executor.passes == passes0 + 1


def test_vaexfast_compat():
    """Legacy vaex.vaexfast utility surface (reference: src/vaexfast.cpp)."""
    from vaex_tpu import vaexfast
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, 10000)
    counts = np.zeros(16)
    vaexfast.histogram1d(x, None, counts, 0.0, 1.0)
    ref, _ = np.histogram(x, bins=16, range=(0, 1))
    np.testing.assert_allclose(counts, ref)
    y = rng.uniform(0, 1, 10000)
    counts2 = np.zeros((8, 8))
    vaexfast.histogram2d(x, y, None, counts2, 0, 1, 0, 1)
    ref2, _, _ = np.histogram2d(x, y, bins=8, range=[[0, 1], [0, 1]])
    np.testing.assert_allclose(counts2, ref2)
    # grid_interpolate: cumulative rows crossing value 0.5
    grid = np.cumsum(np.full((3, 10), 0.1), axis=1)
    out = np.zeros(3)
    vaexfast.grid_interpolate(grid, out, 0.5)
    np.testing.assert_allclose(out, 4.0)  # crosses 0.5 exactly at sample 4
    # resize: block-summed downsample preserves totals
    g = rng.rand(8, 8)
    small = vaexfast.resize(g, 4)
    assert small.shape == (4, 4)
    np.testing.assert_allclose(small.sum(), g.sum())
    np.testing.assert_allclose(small[0, 0], g[:2, :2].sum())
    # soneira_peebles: eta**max_level points inside the initial window
    pts = vaexfast.soneira_peebles(0.5, 1.0, 2.0, 3, 4)
    assert len(pts) == 3 ** 4
    assert np.all(np.abs(pts - 0.5) < 1.0)
    # shuffled_sequence: a permutation of 0..n-1
    arr = np.zeros(100, dtype=np.int64)
    vaexfast.shuffled_sequence(arr)
    np.testing.assert_array_equal(np.sort(arr), np.arange(100))


def test_jax_array_columns():
    """Device-resident jax.Array columns are first-class (TPU-native
    feature): stats, virtual columns, filters, evaluate."""
    import jax.numpy as jnp
    x = jnp.arange(20.0, dtype=jnp.float32)
    df = vaex.from_arrays(x=x)
    assert df.count() == 20
    assert df.sum("x") == 190.0
    df["y"] = df.x * 2
    assert df.sum("y") == 380.0
    assert df[df.x > 9].count() == 10
    counts = np.asarray(df.count(binby="x", limits=[0, 20], shape=4))
    assert counts.tolist() == [5, 5, 5, 5]
    np.testing.assert_array_equal(df.evaluate("x"), np.arange(20.0, dtype=np.float32))
    # mixed jax + numpy columns in one frame
    df2 = vaex.from_arrays(a=jnp.ones(5, jnp.float32), b=np.arange(5.0))
    assert df2.sum("a") == 5.0 and df2.sum("b") == 10.0


def test_kernel_choice_settings_key_program_cache():
    """strategy/pallas_payload are baked into the compiled trace, so the
    program cache key must include them: flipping the payload mode
    mid-process silently reused the old program (an i16-vs-i24 accuracy
    comparison measured bitwise-0 diff because both ran the i24 binary)."""
    from vaex_tpu import settings
    df = vaex.from_arrays(x=np.arange(100, dtype=np.float32))
    kw = dict(binby="x", limits=[0, 100], shape=4)
    df.count(**kw)
    c0 = df.executor.program_compiles
    df.count(**kw)  # identical query: program cache hit
    assert df.executor.program_compiles == c0
    old = settings.compute.pallas_payload
    try:
        settings.compute.pallas_payload = "i16" if old != "i16" else "hilo"
        df.count(**kw)  # mode flip: must NOT reuse the old program
        assert df.executor.program_compiles == c0 + 1
    finally:
        settings.compute.pallas_payload = old


def test_device_columns_not_double_cached():
    """Chunk slices of device-resident (jax-backed) columns must NOT enter
    the HBM column cache: caching them doubles the columns' device
    footprint (a 768M-row frame OOMed 16GB HBM this way).  Host-backed
    columns still populate the cache."""
    import jax.numpy as jnp
    from vaex_tpu import execution
    x = np.random.RandomState(11).rand(5000).astype(np.float32)
    before = execution._device_cache._total
    df = vaex.from_arrays(x=jnp.asarray(x))
    df.sum("x")
    df.mean("x", binby="x", limits=[0, 1], shape=16)
    assert execution._device_cache._total == before, \
        "device-resident column slices leaked into the HBM cache"
    # host columns keep using the cache (second query hits it)
    dfh = vaex.from_arrays(h=x.copy())
    dfh.sum("h")
    assert execution._device_cache._total > before


def test_device_resident_sort():
    """Sort over a device-column frame keeps the permutation on device
    (no D2H): lazy take gathers on device; results match host numpy."""
    import jax.numpy as jnp
    from vaex_tpu import array_types
    rng = np.random.RandomState(7)
    x = rng.rand(4000).astype(np.float32)
    y = np.arange(4000, dtype=np.int32)
    df = vaex.from_arrays(x=jnp.asarray(x), y=jnp.asarray(y))
    s = df.sort("x")
    # permutation is device-resident
    assert array_types.is_jax_array(s.dataset.indices)
    order = np.argsort(x, kind="stable")
    np.testing.assert_array_equal(np.asarray(s.evaluate("x")), x[order])
    np.testing.assert_array_equal(np.asarray(s.evaluate("y")), y[order])
    # aggregations ride the device gather path
    assert s.count() == 4000
    np.testing.assert_allclose(s.sum("x"), x.sum(), rtol=1e-6)
    # descending + multi-key, and composition of device takes
    d = df.sort("x", ascending=False)
    np.testing.assert_array_equal(np.asarray(d.evaluate("y")), y[order[::-1]])
    s2 = s.sort("y")  # device ColumnIndexed composition back to identity
    np.testing.assert_array_equal(np.asarray(s2.evaluate("y")), y)


def test_device_sort_falls_back_on_host_or_virtual_keys():
    """Mixed/host frames keep the host lexsort; device-compatible virtual
    keys evaluate eagerly on device and the permutation stays in HBM."""
    import jax.numpy as jnp
    from vaex_tpu import array_types
    x = np.random.RandomState(3).rand(100).astype(np.float32)
    df = vaex.from_arrays(x=jnp.asarray(x), h=x.copy())
    s = df.sort("h")  # host column present -> host path
    assert isinstance(s.dataset.indices, np.ndarray)
    np.testing.assert_array_equal(np.asarray(s.evaluate("x")), np.sort(x))
    df2 = vaex.from_arrays(x=jnp.asarray(x))
    df2["v"] = df2.x * -1
    s2 = df2.sort("v")  # device-compatible virtual key -> device path
    assert array_types.is_jax_array(s2.dataset.indices)
    np.testing.assert_array_equal(np.asarray(s2.evaluate("x")), np.sort(x)[::-1])
    # inline expression key (never defined as a column) also rides the device path
    s3 = df2.sort("x * 2 + 1")
    assert array_types.is_jax_array(s3.dataset.indices)
    np.testing.assert_array_equal(np.asarray(s3.evaluate("x")), np.sort(x))
    # UDF-backed (non-device-compatible) expression keys fall back to host
    df2.add_function("f_host", lambda a: np.asarray(a) * -1.0)
    s4 = df2.sort("f_host(x)")
    assert isinstance(s4.dataset.indices, np.ndarray)
    np.testing.assert_array_equal(np.asarray(s4.evaluate("x")), np.sort(x)[::-1])


def test_device_resident_join():
    """Join over a device-column frame keeps the lookup AND the joined
    columns on device (small right table is shipped up once)."""
    import jax.numpy as jnp
    from vaex_tpu import array_types
    from vaex_tpu.column import ColumnIndexed
    rng = np.random.RandomState(2)
    b = rng.randint(0, 100, 5000)
    a = rng.rand(5000).astype(np.float32)
    d = vaex.from_arrays(a=jnp.asarray(a), b=jnp.asarray(b))
    right = vaex.from_arrays(b=np.arange(100), lab=np.arange(100) * 3)
    j = d.join(right, on="b", rsuffix="_r")
    lab = j.dataset["lab"]
    assert isinstance(lab, ColumnIndexed) and array_types.is_jax_array(lab.indices)
    assert array_types.is_jax_array(lab.column)
    np.testing.assert_array_equal(np.asarray(j.evaluate("lab")), b * 3)
    # aggregation over the joined device column rides the device path
    assert j.sum("lab") == int((b * 3).sum())
    # unmatched keys -> host fallback with proper masking
    right2 = vaex.from_arrays(b=np.arange(50), lab=np.arange(50) * 3)
    j2 = d.join(right2, on="b")
    lv = j2.evaluate("lab")
    assert np.ma.isMaskedArray(lv) and lv.mask.sum() == int((b >= 50).sum())
    # inner join compacts on device
    j3 = d.join(right2, on="b", how="inner")
    assert len(j3) == int((b < 50).sum())
    np.testing.assert_array_equal(np.asarray(j3.evaluate("lab")), b[b < 50] * 3)
    # string right column -> host path, still correct
    right3 = vaex.from_arrays(b=np.arange(100), name=np.array([f"n{i}" for i in range(100)], dtype=object))
    j4 = d.join(right3, on="b")
    assert np.asarray(j4.evaluate("name"))[0] == f"n{b[0]}"


def test_device_frame_groupby_int_range():
    """Device integer key columns qualify for GrouperIntRange (no host
    hashmap build; the discovery pass is a device minmax)."""
    import jax.numpy as jnp
    from vaex_tpu import array_types
    rng = np.random.RandomState(4)
    k = rng.randint(1000, 9000, 30000)
    v = rng.rand(30000)
    d = vaex.from_arrays(k=jnp.asarray(k), v=jnp.asarray(v))
    res = d.groupby("k", agg={"v": "mean"})
    assert array_types.is_jax_array(res.dataset["k"])
    ref_keys = np.unique(k)
    np.testing.assert_array_equal(np.sort(np.asarray(res.evaluate("k"))), ref_keys)
    got = dict(zip(np.asarray(res.evaluate("k")).tolist(), np.asarray(res.evaluate("v")).tolist()))
    for key in ref_keys[:50]:
        sel = k == key
        assert abs(got[key] - v[sel].mean()) < 1e-6


def test_device_frame_export_roundtrip(tmp_path):
    """Sorted device frame exports to disk (device gathers stream to host
    once) and reloads with correct values."""
    import jax.numpy as jnp
    rng = np.random.RandomState(11)
    x = rng.rand(10000).astype(np.float32)
    y = np.arange(10000, dtype=np.int64)
    df = vaex.from_arrays(x=jnp.asarray(x), y=jnp.asarray(y))
    s = df.sort("x")
    path = str(tmp_path / "sorted.hdf5")
    s.export(path)
    back = vaex.open(path)
    xs = np.asarray(back.evaluate("x"))
    ys = np.asarray(back.evaluate("y"))
    np.testing.assert_array_equal(xs, np.sort(x))
    # single-key sort is unstable (numpy's default kind is too): y must be a
    # permutation consistent with the sorted keys, not the stable order
    np.testing.assert_array_equal(np.sort(ys), y)
    np.testing.assert_array_equal(x[ys], xs)
    # single-fetch evaluate fast path hits the device ColumnIndexed
    np.testing.assert_array_equal(np.asarray(s.evaluate("y", i1=10, i2=20)), ys[10:20])


def test_dynamic_limits_program_reuse():
    """Bin limits are runtime args to the compiled pass: the same query
    shape with different (data-derived) limits reuses ONE compiled program
    (each fresh minmax pair previously paid a full XLA recompile), and
    results stay correct for every limits pair."""
    rng = np.random.RandomState(5)
    x = rng.rand(20000).astype(np.float32)
    v = rng.rand(20000).astype(np.float32)
    df = vaex.from_arrays(x=x, v=v)

    def oracle(lo, hi, shape=16):
        scaled = (x.astype(np.float64) - lo) / (hi - lo)
        bins = (scaled * shape).astype(np.int64)
        m = (scaled >= 0) & (scaled < 1)
        return np.bincount(bins[m], minlength=shape)[:shape]

    df.count(binby="x", limits=[0.0, 1.0], shape=16)  # compile
    n0 = len(df.executor._program_cache)
    for lo, hi in [(0.1, 0.9), (0.25, 0.5), (-1.0, 2.0)]:
        got = np.asarray(df.count(binby="x", limits=[lo, hi], shape=16))
        np.testing.assert_array_equal(got, oracle(lo, hi))
    assert len(df.executor._program_cache) == n0, "limits change recompiled the pass"

    # ordinal (GrouperIntRange) minimum is dynamic too: same span, shifted
    # keys -> same program
    k = rng.randint(100, 200, 20000)
    d2 = vaex.from_arrays(k=k, v=v)
    r1 = d2.groupby("k", agg={"v": "sum"})
    n1 = len(d2.executor._program_cache)
    d3 = vaex.from_arrays(k=k + 5000, v=v)  # same executor singleton
    r2 = d3.groupby("k", agg={"v": "sum"})
    assert len(d3.executor._program_cache) == n1, "shifted key range recompiled"
    np.testing.assert_array_equal(np.asarray(r2.evaluate("k")), np.asarray(r1.evaluate("k")) + 5000)
    np.testing.assert_allclose(np.asarray(r2.evaluate("v")), np.asarray(r1.evaluate("v")), rtol=1e-6)
    # a DIFFERENT span in the same power-of-two bucket also reuses (the
    # ordinal cell count is bucketed; padded tail bins drop as empties)
    k4 = rng.randint(300, 420, 20000)  # span 120 -> same 128 bucket as span 100
    d4 = vaex.from_arrays(k=k4, v=v)
    r4 = d4.groupby("k", agg={"v": "sum"})
    assert len(d4.executor._program_cache) == n1, "same-bucket span recompiled"
    np.testing.assert_array_equal(np.asarray(r4.evaluate("k")), np.unique(k4))


def test_dynamic_limits_off_matches_on():
    """VAEX_TPU_DYNAMIC_LIMITS=0 static-baking path stays bitwise-identical
    to the runtime-args path."""
    from vaex_tpu import settings
    rng = np.random.RandomState(6)
    x = rng.normal(0, 1, 30000)
    df = vaex.from_arrays(x=x)
    on = np.asarray(df.count(binby="x", shape=32))  # minmax-derived limits
    old = settings.compute.dynamic_limits
    try:
        settings.compute.dynamic_limits = False
        df2 = vaex.from_arrays(x=x.copy())
        off = np.asarray(df2.count(binby="x", shape=32))
    finally:
        settings.compute.dynamic_limits = old
    np.testing.assert_array_equal(on, off)


def test_dynamic_hashmap_tables_program_reuse():
    """Hashmap key tables are runtime inputs to the compiled pass: a second
    dataset with a DIFFERENT key table of the same structure (dtype, size
    bucket) reuses the compiled program, and codes stay correct."""
    rng = np.random.RandomState(9)
    keyset1 = np.round(rng.rand(40) * 100, 2)
    keyset2 = np.round(rng.rand(50) * 100, 2) + 200  # disjoint values, DIFFERENT
    # count in the same power-of-two bucket (Grouper bin counts are bucketed)
    k1 = rng.choice(keyset1, 30000)
    k2 = rng.choice(keyset2, 30000)
    v = rng.rand(30000)
    d1 = vaex.from_arrays(k=k1, v=v)
    r1 = d1.groupby("k", agg={"v": "sum"}, sort=True)
    n0 = len(d1.executor._program_cache)
    d2 = vaex.from_arrays(k=k2, v=v)
    r2 = d2.groupby("k", agg={"v": "sum"}, sort=True)
    assert len(d2.executor._program_cache) == n0, "fresh key table recompiled the pass"
    import pandas as pd
    for d, k, r in ((d1, k1, r1), (d2, k2, r2)):
        ref = pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].sum().sort_index()
        np.testing.assert_array_equal(np.asarray(r.evaluate("k")), ref.index.values)
        np.testing.assert_allclose(np.asarray(r.evaluate("v")), ref.values, rtol=1e-6)


def test_filtered_indices_device_path():
    """Filtered-extract on a fully device-resident frame computes the index
    vector on device ('on' forces the path on the CPU backend for testing);
    result must match the host path exactly, incl. missing-never-selects."""
    import jax.numpy as jnp
    from vaex_tpu import settings
    rng = np.random.RandomState(5)
    x = rng.randn(10_001).astype(np.float32)
    df = vaex.from_arrays(x=jnp.asarray(x), y=jnp.arange(10_001, dtype=jnp.int32))
    sel = df[df.x > 0.3]
    old = settings.compute.device_filter
    try:
        settings.compute.device_filter = "on"
        dev = sel._filtered_indices()
        assert not isinstance(dev, np.ndarray)  # stayed a jax array
        settings.compute.device_filter = "off"
        host = sel._filtered_indices()
    finally:
        settings.compute.device_filter = old
    np.testing.assert_array_equal(np.asarray(dev), host)
    # end-to-end: extract + join on the filtered device frame
    settings.compute.device_filter = "on"
    try:
        right = vaex.from_arrays(y=np.arange(0, 10_001, dtype=np.int32),
                                 z=np.arange(0, 10_001, dtype=np.int64) * 2)
        j = sel.join(right, on="y")
        assert len(j) == int((x > 0.3).sum())
        yv = np.asarray(j.evaluate("y"), dtype=np.int64)
        np.testing.assert_array_equal(np.asarray(j.evaluate("z"), np.int64), yv * 2)
    finally:
        settings.compute.device_filter = old
