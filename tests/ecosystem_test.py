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
