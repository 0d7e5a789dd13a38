"""In-process fake transport for tests — no network.

Reference: /root/reference/packages/vaex-server/vaex/server/dummy.py, used by
the test fixture matrix to exercise the remote path without sockets
(tests/common.py:149-153)."""

from __future__ import annotations

from .. import encoding as encoding_mod
from .client import Client
from .server import WebSocketServer


class DummyTransport:
    """Feeds requests straight into a server object's handler."""

    def __init__(self, server: WebSocketServer):
        self.server = server
        self._authenticated = set()

    def next_req_id(self):
        return None  # in-process: requests are synchronous, no interleaving

    def request(self, spec, enc, progress=None):
        spec = {k: v for k, v in spec.items() if k != "req_id"}
        data = encoding_mod.serialize(spec, enc)
        reply = self.server.handle_message(data, self._authenticated)
        reply_spec, reply_enc = encoding_mod.deserialize(reply)
        if progress is not None:
            progress(1.0)
        if reply_spec.get("msg") == "error":
            from .client import RemoteError
            raise RemoteError(reply_spec["error"], reply_spec.get("traceback"))
        return reply_spec, reply_enc

    def close(self):
        pass


def create_client_server(dataframes, token=None):
    """(client, server) pair wired in-process."""
    server = WebSocketServer(dataframes, token=token)
    transport = DummyTransport(server)
    if token is not None:
        transport.request({"msg": "auth", "token": token}, encoding_mod.Encoding())
    return Client(transport), server
