"""Websocket RPC server with progress streaming + cancellation.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
tornado_server.py:38-230 + websocket.py:1-141: one binary frame per request
(JSON spec + packed blobs, encoding.serialize), optional token auth, the
service executes on the process-wide TPU executor.  Built on
`websockets.sync` (threaded) instead of tornado's IOLoop.

Execute requests that carry a ``req_id`` run on a worker thread while the
connection keeps reading frames, so the server can stream
``{"msg": "progress", "req_id", "fraction"}`` frames during the pass and
react to ``{"msg": "cancel", "req_id"}`` mid-pass (the reference streams
progress events and supports per-request cancel the same way,
websocket.py:1-141).
"""

from __future__ import annotations

import logging
import threading
import time
import traceback

from .. import encoding as encoding_mod
from .service import Service

logger = logging.getLogger("vaex_tpu.server")

PROGRESS_INTERVAL = 0.1  # seconds between streamed progress frames


class WebSocketServer:
    def __init__(self, dataframes=None, host="localhost", port=8765, token=None):
        self.service = Service(dataframes or {})
        self.host = host
        self.port = port
        self.token = token
        self._server = None
        self._thread = None

    # -- request handling ------------------------------------------------
    def _error_reply(self, e, req_id=None):
        reply = {"msg": "error", "error": str(e), "traceback": traceback.format_exc()}
        if isinstance(e, _Cancelled):
            reply = {"msg": "cancelled"}
        if req_id is not None:
            reply["req_id"] = req_id
        return encoding_mod.serialize(reply, encoding_mod.Encoding())

    def _handle_execute(self, spec, enc, cancel_event, send):
        """Run an execute request, streaming throttled progress frames."""
        req_id = spec.get("req_id")
        last = [0.0]

        def progress(fraction):
            now = time.monotonic()
            if now - last[0] >= PROGRESS_INTERVAL or fraction >= 1.0:
                last[0] = now
                send(encoding_mod.serialize(
                    {"msg": "progress", "req_id": req_id, "fraction": float(fraction)},
                    encoding_mod.Encoding()))

        try:
            results, out_enc = self.service.execute(
                spec["dataset"], spec.get("state"), spec["tasks"], enc,
                progress=progress if req_id is not None else None,
                cancel_event=cancel_event)
            reply = {"msg": "result", "results": results}
            if req_id is not None:
                reply["req_id"] = req_id
            return encoding_mod.serialize(reply, out_enc)
        except Exception as e:  # noqa: BLE001
            from ..execution import UserAbort
            if isinstance(e, UserAbort) or (cancel_event is not None and cancel_event.is_set()):
                return self._error_reply(_Cancelled("cancelled"), req_id)
            logger.exception("error handling execute")
            return self._error_reply(e, req_id)

    def handle_request(self, spec, enc, authenticated):
        """Synchronous request kinds (reference request kinds:
        auth/list/execute/call-dataframe, websocket.py)."""
        out_enc = encoding_mod.Encoding()
        try:
            msg = spec["msg"]
            if self.token is not None and msg != "auth" and "auth" not in authenticated:
                raise PermissionError("not authenticated")
            if msg == "auth":
                if self.token is not None and spec.get("token") != self.token:
                    raise PermissionError("invalid token")
                authenticated.add("auth")
                reply = {"msg": "auth_ok"}
            elif msg == "list":
                reply = {"msg": "list", "datasets": self.service.list_datasets()}
            elif msg == "execute":
                results, out_enc = self.service.execute(spec["dataset"], spec.get("state"),
                                                        spec["tasks"], enc)
                reply = {"msg": "result", "results": results}
            elif msg == "evaluate":
                result, out_enc = self.service.evaluate(spec["dataset"], spec.get("state"),
                                                        spec["expression"], spec.get("i1"), spec.get("i2"))
                reply = {"msg": "result", "result": result}
            elif msg == "data_type":
                reply = {"msg": "result", "result": self.service.data_type(
                    spec["dataset"], spec.get("state"), spec["expression"])}
            elif msg == "call":
                out = self.service.call_dataframe(spec["dataset"], spec.get("state"),
                                                  spec["method"], spec.get("args", []),
                                                  spec.get("kwargs", {}))
                reply = {"msg": "result", "result": out}
            else:
                raise ValueError(f"unknown message {msg!r}")
        except Exception as e:  # noqa: BLE001
            logger.exception("error handling message")
            return self._error_reply(e)
        return encoding_mod.serialize(reply, out_enc)

    def handle_message(self, data: bytes, authenticated: set) -> bytes:
        """Back-compat single-shot entry (no streaming)."""
        spec, enc = encoding_mod.deserialize(data)
        return self.handle_request(spec, enc, authenticated)

    # -- lifecycle -------------------------------------------------------
    def _connection_loop(self, websocket):
        authenticated = set()
        cancels = {}
        send_lock = threading.Lock()

        def send(data):
            with send_lock:
                websocket.send(data)

        try:
            for message in websocket:
                spec, enc = encoding_mod.deserialize(message)
                msg = spec.get("msg")
                if msg == "cancel":
                    ev = cancels.get(spec.get("req_id"))
                    if ev is not None:
                        ev.set()
                    continue
                if msg == "execute" and spec.get("req_id") is not None:
                    if self.token is not None and "auth" not in authenticated:
                        send(self._error_reply(PermissionError("not authenticated"),
                                               spec.get("req_id")))
                        continue
                    req_id = spec["req_id"]
                    ev = threading.Event()
                    cancels[req_id] = ev

                    def work(spec=spec, enc=enc, req_id=req_id, ev=ev):
                        try:
                            send(self._handle_execute(spec, enc, ev, send))
                        finally:
                            cancels.pop(req_id, None)

                    threading.Thread(target=work, daemon=True).start()
                    continue
                send(self.handle_request(spec, enc, authenticated))
        except Exception:  # noqa: BLE001
            logger.debug("connection closed")

    def serve(self):
        from websockets.sync.server import serve

        self._server = serve(self._connection_loop, self.host, self.port)
        self._server.serve_forever()

    def start(self):
        """Serve on a background thread; returns once listening."""
        started = threading.Event()

        def run():
            from websockets.sync.server import serve

            with serve(self._connection_loop, self.host, self.port) as server:
                self._server = server
                started.set()
                server.serve_forever()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        if not started.wait(10):
            raise RuntimeError("server failed to start")
        return self

    def stop(self):
        if self._server is not None:
            self._server.shutdown()


class _Cancelled(RuntimeError):
    pass


def start_server(dataframes, host="localhost", port=8765, token=None):
    server = WebSocketServer(dataframes, host=host, port=port, token=token)
    return server.start()
