"""SAMP (Simple Application Messaging Protocol) bridge for VO astronomy
tools (TOPCAT, Aladin).

Counterpart of /root/reference/packages/vaex-core/vaex/samp.py: broadcast a
table to connected VO clients and receive row highlights.  Import-gated on
astropy.samp (not in this environment); the module itself imports cleanly.
"""

from __future__ import annotations

import os
import tempfile


def _samp():
    try:
        from astropy import samp
        return samp
    except ImportError as e:  # pragma: no cover
        raise ImportError("astropy is required for SAMP messaging; "
                          "pip install astropy") from e


class Samp:
    """Minimal SAMP client: connect to the running hub, broadcast tables
    (reference: samp.py Samp)."""

    def __init__(self, name="vaex_tpu", description="TPU-native vaex"):
        samp = _samp()
        self.client = samp.SAMPIntegratedClient(
            name=name, description=description)
        self.client.connect()

    def broadcast_table(self, df, name="vaex table"):
        """Export to a temporary VOTable and notify all clients
        (table.load.votable mtype)."""
        from .astro import export_votable
        path = os.path.join(tempfile.mkdtemp(prefix="vaex_samp_"), "table.vot")
        export_votable(df, path)
        self.client.notify_all({
            "samp.mtype": "table.load.votable",
            "samp.params": {"url": "file://" + path, "name": name},
        })
        return path

    def disconnect(self):
        self.client.disconnect()
