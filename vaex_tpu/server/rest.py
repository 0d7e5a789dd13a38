"""REST API: histogram/heatmap endpoints over aiohttp.

TPU-native counterpart of /root/reference/packages/vaex-server/vaex/server/
fastapi.py:41-136 (/histogram and /heatmap JSON endpoints); this environment
has aiohttp instead of fastapi, same routes and schemas."""

from __future__ import annotations

import json

import numpy as np

from .service import Service


def make_app(dataframes):
    from aiohttp import web

    service = Service(dataframes)

    async def index(request):
        return web.json_response({"datasets": list(service.dataframes)})

    async def dataset_info(request):
        name = request.match_info["name"]
        df = service.dataframes[name]
        return web.json_response({
            "name": name,
            "row_count": df.dataset.row_count,
            "columns": {c: str(df.data_type(c)) for c in df.get_column_names()},
        })

    async def histogram(request):
        name = request.match_info["name"]
        q = request.rel_url.query
        expression = q["expression"]
        shape = int(q.get("shape", 64))
        vmin = q.get("min")
        vmax = q.get("max")
        filter_ = q.get("filter")
        df = service.dataframes[name]
        if filter_:
            df = df.filter(filter_)
        limits = [float(vmin), float(vmax)] if vmin is not None and vmax is not None else None
        limits = df.limits(expression, limits)
        counts = df.count(binby=expression, limits=limits, shape=shape)
        centers = np.linspace(limits[0], limits[1], shape + 1)
        centers = ((centers[1:] + centers[:-1]) / 2)
        return web.json_response({
            "expression": expression,
            "centers": centers.tolist(),
            "values": np.asarray(counts).tolist(),
            "limits": [float(limits[0]), float(limits[1])],
        })

    async def heatmap(request):
        name = request.match_info["name"]
        q = request.rel_url.query
        ex = q["expression_x"]
        ey = q["expression_y"]
        shape = int(q.get("shape", 128))
        filter_ = q.get("filter")
        df = service.dataframes[name]
        if filter_:
            df = df.filter(filter_)
        limits = df.limits([ex, ey], None)
        counts = df.count(binby=[ex, ey], limits=limits, shape=shape)
        return web.json_response({
            "expression_x": ex,
            "expression_y": ey,
            "values": np.asarray(counts).tolist(),
            "limits": [[float(l[0]), float(l[1])] for l in limits],
        })

    app = web.Application()
    app.add_routes([
        web.get("/", index),
        web.get("/dataset/{name}", dataset_info),
        web.get("/histogram/{name}", histogram),
        web.get("/heatmap/{name}", heatmap),
    ])
    return app


def serve_rest(dataframes, host="localhost", port=8080):
    from aiohttp import web
    app = make_app(dataframes)
    web.run_app(app, host=host, port=port)
