"""Websocket RPC server.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
tornado_server.py:38-230 + websocket.py:1-141: one binary frame per request
(JSON spec + packed blobs, encoding.serialize), optional token auth, the
service executes on the process-wide TPU executor.  Built on
`websockets.sync` (threaded) instead of tornado's IOLoop.
"""

from __future__ import annotations

import logging
import threading
import traceback

from .. import encoding as encoding_mod
from .service import Service

logger = logging.getLogger("vaex_tpu.server")


class WebSocketServer:
    def __init__(self, dataframes=None, host="localhost", port=8765, token=None):
        self.service = Service(dataframes or {})
        self.host = host
        self.port = port
        self.token = token
        self._server = None
        self._thread = None

    # -- request handling ------------------------------------------------
    def handle_message(self, data: bytes, authenticated: set) -> bytes:
        spec, enc = encoding_mod.deserialize(data)
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
            reply = {"msg": "error", "error": str(e), "traceback": traceback.format_exc()}
            out_enc = encoding_mod.Encoding()
        return encoding_mod.serialize(reply, out_enc)

    # -- lifecycle -------------------------------------------------------
    def serve(self):
        from websockets.sync.server import serve

        def handler(websocket):
            authenticated = set()
            try:
                for message in websocket:
                    reply = self.handle_message(message, authenticated)
                    websocket.send(reply)
            except Exception:  # noqa: BLE001
                logger.debug("connection closed")

        self._server = serve(handler, self.host, self.port)
        self._server.serve_forever()

    def start(self):
        """Serve on a background thread; returns once listening."""
        started = threading.Event()

        def run():
            from websockets.sync.server import serve

            def handler(websocket):
                authenticated = set()
                try:
                    for message in websocket:
                        reply = self.handle_message(message, authenticated)
                        websocket.send(reply)
                except Exception:  # noqa: BLE001
                    logger.debug("connection closed")

            with serve(handler, self.host, self.port) as server:
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


def start_server(dataframes, host="localhost", port=8765, token=None):
    server = WebSocketServer(dataframes, host=host, port=port, token=token)
    return server.start()
