"""Server/remote execution tests — in-process dummy transport AND a real
websocket server on a port (reference strategy: tests/common.py:75-153)."""

import numpy as np
import pytest

import vaex_tpu as vaex
from vaex_tpu.server.dummy import create_client_server


@pytest.fixture
def server_df():
    x = np.arange(100, dtype=np.float64)
    import pyarrow as pa
    s = pa.array([["a", "b", "c", "d"][i % 4] for i in range(100)])
    return vaex.from_arrays(x=x, y=x**2, g=(np.arange(100) % 5), s=s)


@pytest.fixture
def client(server_df):
    client, server = create_client_server({"test": server_df})
    return client


def test_list(client):
    assert client.dataset_names == ["test"]


def test_remote_metadata(client):
    df = client["test"]
    assert len(df) == 100
    assert set(df.get_column_names()) == {"x", "y", "g", "s"}
    assert df.data_type("x").numpy == np.float64


def test_remote_aggregation(client, server_df):
    df = client["test"]
    assert df.count() == 100
    assert df.sum("x") == server_df.sum("x")
    assert df.mean("y") == pytest.approx(server_df.mean("y"))
    assert df.minmax("x").tolist() == [0, 99]


def test_remote_binby(client):
    df = client["test"]
    counts = df.count(binby="x", limits=[0, 100], shape=10)
    assert counts.tolist() == [10] * 10


def test_remote_virtual_and_selection(client):
    df = client["test"]
    df["z"] = df.x * 2
    assert df.sum("z") == 2 * sum(range(100))
    assert df.count(selection="x > 49") == 50


def test_remote_filter(client):
    df = client["test"]
    dff = df[df.x > 10]
    assert dff.count() == 89


def test_remote_evaluate(client):
    df = client["test"]
    values = df.evaluate("x", 0, 5)
    assert np.asarray(values).tolist() == [0, 1, 2, 3, 4]
    s = df.evaluate("s", 0, 4)
    assert list(map(str, np.asarray(s) if not hasattr(s, "to_pylist") else s.to_pylist())) == ["a", "b", "c", "d"]


def test_remote_unique_groupby(client, server_df):
    df = client["test"]
    assert sorted(df.unique("g")) == [0, 1, 2, 3, 4]
    res = df.groupby("g", agg={"y": "sum"}, sort=True)
    expected = server_df.groupby("g", agg={"y": "sum"}, sort=True)
    assert np.asarray(res.evaluate("y")).tolist() == np.asarray(expected.evaluate("y")).tolist()


def test_remote_error(client):
    df = client["test"]
    from vaex_tpu.server.client import RemoteError
    with pytest.raises((RemoteError, NameError)):
        df.sum("nonexistent_column")


def test_real_websocket_server(server_df):
    import socket
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    server = vaex.serve({"ws": server_df}, port=port)
    try:
        client = vaex.connect(f"ws://localhost:{port}")
        df = client["ws"]
        assert df.count() == 100
        assert df.sum("x") == sum(range(100))
        counts = df.count(binby="x", limits=[0, 100], shape=4)
        assert counts.tolist() == [25, 25, 25, 25]
        client.close()
    finally:
        server.stop()


def test_token_auth(server_df):
    import socket
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    server = vaex.serve({"ws": server_df}, port=port, token="secret")
    try:
        from vaex_tpu.server.client import RemoteError
        with pytest.raises((RemoteError, PermissionError)):
            vaex.connect(f"ws://localhost:{port}")  # no token
        client = vaex.connect(f"ws://localhost:{port}", token="secret")
        assert client["ws"].count() == 100
        client.close()
    finally:
        server.stop()


def test_rest_endpoints(server_df):
    import asyncio
    from aiohttp.test_utils import TestClient, TestServer
    from vaex_tpu.server.rest import make_app

    async def run():
        app = make_app({"rest": server_df})
        async with TestClient(TestServer(app)) as client:
            resp = await client.get("/")
            data = await resp.json()
            assert data["datasets"] == ["rest"]
            resp = await client.get("/histogram/rest", params={"expression": "x", "shape": 4, "min": 0, "max": 100})
            data = await resp.json()
            assert data["values"] == [25, 25, 25, 25]
            resp = await client.get("/heatmap/rest", params={"expression_x": "x", "expression_y": "y", "shape": 8})
            data = await resp.json()
            assert len(data["values"]) == 8

    asyncio.new_event_loop().run_until_complete(run())


def test_encoding_roundtrip():
    from vaex_tpu import encoding as enc_mod
    enc = enc_mod.Encoding()
    ar = np.arange(10, dtype=np.float32)
    spec = enc.encode("ndarray", ar)
    data = enc_mod.serialize({"v": spec}, enc)
    spec2, enc2 = enc_mod.deserialize(data)
    out = enc2.decode("ndarray", spec2["v"])
    assert out.tolist() == ar.tolist()
    # masked
    m = np.ma.MaskedArray([1, 2, 3], mask=[0, 1, 0])
    enc = enc_mod.Encoding()
    spec = enc.encode("ndarray", m)
    data = enc_mod.serialize({"v": spec}, enc)
    spec2, enc2 = enc_mod.deserialize(data)
    out = enc2.decode("ndarray", spec2["v"])
    assert out.tolist() == [1, None, 3]
    # arrow
    import pyarrow as pa
    enc = enc_mod.Encoding()
    spec = enc.encode("array", pa.array(["x", None, "z"]))
    data = enc_mod.serialize({"v": spec}, enc)
    spec2, enc2 = enc_mod.deserialize(data)
    out = enc2.decode("array", spec2["v"])
    assert out.to_pylist() == ["x", None, "z"]


def _free_port():
    import socket
    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()
    return port


def test_server_progress_streaming(server_df):
    """Progress frames stream over the wire during a pass (reference:
    vaex-server/vaex/server/websocket.py progress events)."""
    from vaex_tpu import settings
    from vaex_tpu.server import server as server_mod

    port = _free_port()
    old_interval = server_mod.PROGRESS_INTERVAL
    old_chunk = settings.chunk.size
    server_mod.PROGRESS_INTERVAL = 0.0   # every chunk emits a frame
    settings.chunk.size = 16             # force many chunks server-side
    server = vaex.serve({"ws": server_df}, port=port)
    try:
        client = vaex.connect(f"ws://localhost:{port}")
        df = client["ws"]
        fractions = []
        assert df.count(progress=lambda f: fractions.append(f) or True) == 100
        assert len(fractions) >= 2          # interim + final
        assert fractions[-1] >= 1.0
        assert all(b >= a for a, b in zip(fractions, fractions[1:]))
        client.close()
    finally:
        server_mod.PROGRESS_INTERVAL = old_interval
        settings.chunk.size = old_chunk
        server.stop()


def test_server_cancel_mid_pass(server_df):
    """A progress callback returning False cancels the request server-side
    mid-pass (reference: cancellation via progress callbacks,
    execution.py:420-431 + per-request cancel frames)."""
    from vaex_tpu import settings
    from vaex_tpu.server import server as server_mod
    from vaex_tpu.server.client import Cancelled, RemoteError

    port = _free_port()
    old_interval = server_mod.PROGRESS_INTERVAL
    old_chunk = settings.chunk.size
    server_mod.PROGRESS_INTERVAL = 0.0
    settings.chunk.size = 8
    server = vaex.serve({"ws": server_df}, port=port)
    try:
        client = vaex.connect(f"ws://localhost:{port}")
        df = client["ws"]
        seen = []

        def cancel_after_first(fraction):
            seen.append(fraction)
            return len(seen) < 2  # allow one frame, then cancel

        with pytest.raises((Cancelled, RemoteError)):
            df.count(progress=cancel_after_first)
        assert seen, "expected at least one progress frame before cancel"
        assert seen[-1] < 1.0, "cancel should land mid-pass"
        # the connection stays usable after a cancelled request
        assert df.sum("x") == sum(range(100))
        client.close()
    finally:
        server_mod.PROGRESS_INTERVAL = old_interval
        settings.chunk.size = old_chunk
        server.stop()


def test_execute_async_concurrent():
    """execute_async is genuinely async: two executors drain concurrently on
    one event loop, interleaving at chunk boundaries (reference async
    generator core, execution.py:265-493)."""
    import asyncio
    from vaex_tpu import settings
    from vaex_tpu.execution import ExecutorLocal

    x = np.arange(1000, dtype=np.float64)
    df1 = vaex.from_arrays(x=x)
    df2 = vaex.from_arrays(x=x * 2)
    df1.executor = ExecutorLocal()
    df2.executor = ExecutorLocal()

    async def run(df):
        p = df.sum("x", delay=True)
        await df.executor.execute_async()
        return p.get()

    async def main():
        return await asyncio.gather(run(df1), run(df2))

    old_chunk = settings.chunk.size
    settings.chunk.size = 100
    try:
        s1, s2 = asyncio.run(main())
    finally:
        settings.chunk.size = old_chunk
    assert s1 == x.sum()
    assert s2 == 2 * x.sum()


def test_executor_deep_delayed_chain():
    """A delayed chain deeper than any fixed retry bound still drains (the
    r1 executor stopped after 100 iterations)."""
    from vaex_tpu.delayed import delayed

    x = np.arange(10, dtype=np.float64)
    df = vaex.from_arrays(x=x)

    depth = 130
    state = {"n": 0, "done": False}

    def chain(_result):
        state["n"] += 1
        if state["n"] < depth:
            return delayed(chain)(df.count(delay=True))
        state["done"] = True
        return 1

    p = delayed(chain)(df.count(delay=True))
    df.execute()
    # each round schedules a fresh task; keep draining like a REPL would
    while not state["done"]:
        df.execute()
    assert state["n"] == depth


def test_server_concurrent_execute(tmp_path):
    """Two clients' execute requests must run CONCURRENTLY server-side
    (reference: AsyncThreadedService's pool of executors, service.py:61-95).
    Each request evaluates a UDF that blocks until BOTH requests have
    reached it — with the old process-wide executor lock this rendezvous
    can never complete."""
    import threading
    import time as _time
    from vaex_tpu.server.dummy import DummyTransport, create_client_server
    from vaex_tpu.server.client import Client

    rendezvous = str(tmp_path / "rendezvous")

    def make_slow(tag):
        def rendezvous_udf(x):
            import os as _os
            import time as _t
            _os.makedirs(rendezvous, exist_ok=True)
            open(f"{rendezvous}/{tag}", "w").write("here")
            deadline = _t.time() + 15
            while _t.time() < deadline:
                if len(_os.listdir(rendezvous)) >= 2:
                    return x * 0 + 1.0  # both requests in flight: success
                _t.sleep(0.01)
            return x * 0 - 1.0  # timed out: requests were serialized
        return rendezvous_udf

    base = vaex.from_arrays(x=np.arange(4.0))
    client1, server = create_client_server({"df": base})
    client2 = Client(DummyTransport(server))

    results = {}

    def work(tag, client):
        df = client["df"]
        df["slow"] = df.x.apply(make_slow(tag))
        results[tag] = float(df.sum("slow"))

    t1 = threading.Thread(target=work, args=("a", client1))
    t2 = threading.Thread(target=work, args=("b", client2))
    t1.start(); t2.start()
    t1.join(timeout=30); t2.join(timeout=30)
    assert results.get("a") == 4.0, results
    assert results.get("b") == 4.0, results
