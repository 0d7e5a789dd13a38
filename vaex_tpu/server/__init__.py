"""Client/server remote DataFrames.

TPU-native counterpart of /root/reference/packages/vaex-server (SURVEY.md
§5.8): a websocket RPC ships encoded task specs + dataframe state to a
server that executes them on its own TPU executor and streams results back;
an aiohttp REST layer exposes histogram/heatmap endpoints (the reference's
fastapi.py).  `vaex_tpu.connect("ws://host:port")` returns a Client whose
DataFrames have the full lazy API — aggregations, groupby, unique — executed
server-side.
"""

from .client import Client, connect  # noqa: F401
from .dataframe import DataFrameRemote  # noqa: F401
