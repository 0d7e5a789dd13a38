"""matplotlib plotting on binned grids (reference: vaex-viz/vaex/viz/mpl.py)."""

from __future__ import annotations

import numpy as np

from ..dataframe import register_dataframe_accessor


def _ensure_str(e):
    from ..expression import Expression
    return e.expression if isinstance(e, Expression) else str(e)


@register_dataframe_accessor("viz")
class DataFrameAccessorViz:
    def __init__(self, df):
        self.df = df

    def histogram(self, x, what="count(*)", grid=None, shape=64, limits=None, selection=None,
                  n=None, normalize_axis=None, xlabel=None, ylabel=None, label=None,
                  progress=None, **kwargs):
        """1-D histogram/agg line plot (reference: mpl.py histogram)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        limits = df.limits(x, limits, selection=selection)
        if grid is None:
            grid = self._compute_what(what, binby=x, limits=limits, shape=shape, selection=selection)
        edges = np.linspace(limits[0], limits[1], shape + 1)
        centers = (edges[1:] + edges[:-1]) / 2
        ax = plt.gca()
        values = np.asarray(grid, dtype=np.float64)
        if n is not None or kwargs.pop("normalize", False):
            values = values / max(values.sum(), 1)
        ax.plot(centers, values, drawstyle="steps-mid", label=label, **kwargs)
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or str(what))
        return ax

    def heatmap(self, x, y, what="count(*)", shape=256, limits=None, selection=None,
                logscale=None, colorbar=True, colormap="afmhot", vmin=None, vmax=None,
                xlabel=None, ylabel=None, equal_aspect=False, figsize=None, **kwargs):
        """2-D density/aggregation image (reference: mpl.py heatmap/plot)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        y = _ensure_str(y)
        limits = df.limits([x, y], limits, selection=selection)
        grid = self._compute_what(what, binby=[x, y], limits=limits, shape=shape, selection=selection)
        grid = np.asarray(grid, dtype=np.float64)
        if logscale or (logscale is None and str(what).startswith("count")):
            with np.errstate(divide="ignore"):
                grid = np.log1p(grid)
        if figsize is not None:
            plt.figure(figsize=figsize)
        ax = plt.gca()
        im = ax.imshow(grid.T, origin="lower", extent=[limits[0][0], limits[0][1], limits[1][0], limits[1][1]],
                       aspect="equal" if equal_aspect else "auto", cmap=colormap, vmin=vmin, vmax=vmax, **kwargs)
        if colorbar:
            plt.colorbar(im, ax=ax)
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or y)
        return ax

    # reference exposes both names
    plot = heatmap

    def scatter(self, x, y, s=1, c=None, selection=None, length_limit=50000, length_check=True,
                xlabel=None, ylabel=None, alpha=0.5, **kwargs):
        """Raw scatter for small data (reference: mpl.py scatter)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        y = _ensure_str(y)
        if length_check and len(df) > length_limit:
            raise ValueError(f"too many rows ({len(df)}) for scatter; use heatmap or pass length_check=False")
        xv = np.asarray(df.evaluate(x, selection=selection))
        yv = np.asarray(df.evaluate(y, selection=selection))
        cv = np.asarray(df.evaluate(_ensure_str(c), selection=selection)) if c is not None else None
        ax = plt.gca()
        ax.scatter(xv, yv, s=s, c=cv, alpha=alpha, **kwargs)
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or y)
        return ax

    def vector(self, x, y, vx, vy, shape=16, limits=None, selection=None, **kwargs):
        """Mean-vector field over a coarse grid (reference: mpl.py vector)."""
        import matplotlib.pyplot as plt
        df = self.df
        x, y, vx, vy = map(_ensure_str, (x, y, vx, vy))
        limits = df.limits([x, y], limits, selection=selection)
        mx = df.mean(vx, binby=[x, y], limits=limits, shape=shape, selection=selection)
        my = df.mean(vy, binby=[x, y], limits=limits, shape=shape, selection=selection)
        cx = np.linspace(limits[0][0], limits[0][1], shape)
        cy = np.linspace(limits[1][0], limits[1][1], shape)
        X, Y = np.meshgrid(cx, cy, indexing="ij")
        ax = plt.gca()
        ax.quiver(X, Y, np.asarray(mx), np.asarray(my), **kwargs)
        return ax

    def _compute_what(self, what, binby, limits, shape, selection):
        """Parse 'count(*)' / 'mean(E)' / vaex.agg object (reference:
        mpl.py what-parsing)."""
        df = self.df
        from .. import agg as agg_mod
        if isinstance(what, agg_mod.AggregatorDescriptor):
            binners = df._create_binners(binby, limits, shape).get() if hasattr(
                df._create_binners(binby, limits, shape), "get") else None
            tasks, result = what.add_tasks(df, binners)
            df.execute()
            return result.get()
        what = str(what)
        if "(" in what:
            name, _, arg = what.partition("(")
            arg = arg.rstrip(")").strip()
            name = name.strip()
        else:
            name, arg = what, "*"
        method = getattr(df, name)
        if arg in ("*", ""):
            if name == "count":
                return method(binby=binby, limits=limits, shape=shape, selection=selection)
            raise ValueError(f"{name} requires an expression")
        return method(arg, binby=binby, limits=limits, shape=shape, selection=selection)
