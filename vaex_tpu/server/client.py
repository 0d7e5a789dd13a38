"""Websocket client + transports.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
client.py:21-114 + tornado_client.py: a synchronous request/reply transport
over one websocket connection; `connect()` lists the server's datasets and
hands out remote DataFrames.
"""

from __future__ import annotations

import threading

from .. import encoding as encoding_mod


class WebSocketTransport:
    def __init__(self, url, token=None):
        from websockets.sync.client import connect as ws_connect
        self.url = url
        self._ws = ws_connect(url, max_size=None)
        self._lock = threading.Lock()       # one outstanding request at a time
        self._send_lock = threading.Lock()  # cancel frames interleave with recv
        self._req_counter = 0
        if token is not None:
            self.request({"msg": "auth", "token": token}, encoding_mod.Encoding())

    def next_req_id(self):
        self._req_counter += 1
        return f"req-{self._req_counter}"

    def _send(self, data):
        with self._send_lock:
            self._ws.send(data)

    def cancel(self, req_id):
        """Fire a cancel frame for an in-flight request (thread-safe; the
        reference supports per-request cancel the same way)."""
        self._send(encoding_mod.serialize(
            {"msg": "cancel", "req_id": req_id}, encoding_mod.Encoding()))

    def request(self, spec, enc, progress=None):
        """Send one request and wait for its reply, dispatching interim
        ``progress`` frames to the callback; a callback returning False
        fires a cancel for this request (reference: progress events +
        cancel over the wire, websocket.py:1-141)."""
        req_id = spec.get("req_id")
        with self._lock:
            self._send(encoding_mod.serialize(spec, enc))
            while True:
                reply = self._ws.recv()
                reply_spec, reply_enc = encoding_mod.deserialize(reply)
                msg = reply_spec.get("msg")
                if msg == "progress":
                    if progress is not None:
                        ok = progress(reply_spec.get("fraction", 0.0))
                        if ok is False and req_id is not None:
                            self.cancel(req_id)
                            progress = None  # cancel once; drain to the reply
                    continue
                break
        if msg == "cancelled":
            raise Cancelled("request cancelled")
        if msg == "error":
            raise RemoteError(reply_spec["error"], reply_spec.get("traceback"))
        return reply_spec, reply_enc

    def close(self):
        self._ws.close()


class Cancelled(RuntimeError):
    """The server aborted the request after a cancel frame."""


class RemoteError(RuntimeError):
    def __init__(self, message, tb=None):
        super().__init__(message)
        self.remote_traceback = tb


class Client:
    """Reference: vaex-server client.py Client."""

    def __init__(self, transport):
        self.transport = transport
        spec, _ = self.transport.request({"msg": "list"}, encoding_mod.Encoding())
        self._datasets = spec["datasets"]

    @property
    def dataset_names(self):
        return list(self._datasets)

    def __getitem__(self, name):
        from .dataframe import DataFrameRemote
        if name not in self._datasets:
            raise KeyError(f"no dataset {name!r} on server; available: {self.dataset_names}")
        return DataFrameRemote(self, name, self._datasets[name])

    def open(self, name):
        return self[name]

    def get(self, name):
        return self[name]

    # -- RPC helpers used by DataFrameRemote
    def _execute(self, dataset, state, tasks_specs, enc, progress=None):
        req = {"msg": "execute", "dataset": dataset, "state": state, "tasks": tasks_specs}
        if progress is not None:
            req["req_id"] = self.transport.next_req_id()
        spec, reply_enc = self.transport.request(req, enc, progress=progress)
        return [reply_enc.decode("task-result", r) for r in spec["results"]]

    def _evaluate(self, dataset, state, expression, i1=None, i2=None):
        spec, reply_enc = self.transport.request(
            {"msg": "evaluate", "dataset": dataset, "state": state,
             "expression": str(expression), "i1": i1, "i2": i2}, encoding_mod.Encoding())
        return reply_enc.decode("array", spec["result"])

    def _data_type(self, dataset, state, expression):
        spec, reply_enc = self.transport.request(
            {"msg": "data_type", "dataset": dataset, "state": state,
             "expression": str(expression)}, encoding_mod.Encoding())
        return reply_enc.decode("dtype", spec["result"])

    def _call(self, dataset, state, method, *args, **kwargs):
        spec, _ = self.transport.request(
            {"msg": "call", "dataset": dataset, "state": state, "method": method,
             "args": list(args), "kwargs": kwargs}, encoding_mod.Encoding())
        return spec["result"]

    def close(self):
        self.transport.close()


def connect(url, token=None):
    """vaex_tpu.connect('ws://host:port') (reference: vaex/__init__.py:649)."""
    if url.startswith(("ws://", "wss://")):
        return Client(WebSocketTransport(url, token=token))
    raise ValueError(f"unsupported url {url!r} (use ws:// or wss://)")
