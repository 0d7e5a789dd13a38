"""matplotlib plotting on binned grids (reference: vaex-viz/vaex/viz/mpl.py)."""

from __future__ import annotations

import numpy as np

from ..dataframe import register_dataframe_accessor


def _ensure_str(e):
    from ..expression import Expression
    return e.expression if isinstance(e, Expression) else str(e)


def _apply_f(grid, f):
    """Value transform by name (reference: vaex.dataset._parse_f — 'identity',
    'log', 'log10', 'log1p', or any callable)."""
    if f is None or f == "identity":
        return grid
    if callable(f):
        return f(grid)
    fn = {"log": np.log, "log10": np.log10, "log1p": np.log1p}.get(f)
    if fn is None:
        raise ValueError(f"unknown transform f={f!r} (use identity/log/log10/log1p)")
    with np.errstate(divide="ignore", invalid="ignore"):
        return fn(grid)


@register_dataframe_accessor("viz")
class DataFrameAccessorViz:
    def __init__(self, df):
        self.df = df

    def histogram(self, x, what="count(*)", grid=None, shape=64, limits=None, selection=None,
                  n=None, normalize_axis=None, xlabel=None, ylabel=None, label=None,
                  f="identity", progress=None, **kwargs):
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
        values = _apply_f(np.asarray(grid, dtype=np.float64), f)
        if n is not None or kwargs.pop("normalize", False):
            values = values / max(values.sum(), 1)
        ax.plot(centers, values, drawstyle="steps-mid", label=label, **kwargs)
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or str(what))
        return ax

    def heatmap(self, x, y, what="count(*)", shape=256, limits=None, selection=None,
                logscale=None, colorbar=True, colormap="afmhot", vmin=None, vmax=None,
                xlabel=None, ylabel=None, equal_aspect=False, figsize=None,
                f=None, **kwargs):
        """2-D density/aggregation image (reference: mpl.py heatmap/plot)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        y = _ensure_str(y)
        limits = df.limits([x, y], limits, selection=selection)
        grid = self._compute_what(what, binby=[x, y], limits=limits, shape=shape, selection=selection)
        grid = np.asarray(grid, dtype=np.float64)
        if f is not None:
            grid = _apply_f(grid, f)
        elif logscale or (logscale is None and str(what).startswith("count")):
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
    plot1d = histogram

    def healpix_heatmap(self, healpix_expression="source_id/34359738368",
                        healpix_max_level=12, healpix_level=8, what="count(*)",
                        selection=None, f=None, colormap="afmhot", colorbar=True,
                        image_size=800, grid=None, title=None, **kwargs):
        """All-sky Mollweide map binned by nested-HEALPix pixel (reference:
        mpl.py:886-990 healpix_heatmap; display math is the self-contained
        viz.healpix module instead of healpy).  ``healpix_expression`` must
        yield nested pixel ids at ``healpix_max_level`` (Gaia's
        source_id/34359738368 convention); the engine bins them at
        ``healpix_level`` in one ordinal grid pass."""
        import matplotlib.pyplot as plt
        from . import healpix as _hp
        df = self.df
        nside = 2 ** healpix_level
        npix = _hp.nside2npix(nside)
        scale = 4 ** (healpix_max_level - healpix_level)
        expr = f"({_ensure_str(healpix_expression)}) // {scale}"
        if grid is None:
            grid = self._compute_what(what, binby=expr, limits=[0, npix],
                                      shape=npix, selection=selection)
        grid = np.asarray(grid, dtype=np.float64)
        if f is not None:
            grid = _apply_f(grid, f)
        img, LON, LAT = _hp.healpix_grid_image(grid, nside, width=image_size,
                                               height=image_size // 2)
        ax = plt.gca()
        if ax.name != "mollweide":
            fig = ax.figure
            ax.remove()
            ax = fig.add_subplot(111, projection="mollweide")
        # mollweide axes take lon in [-pi, pi]; flip lon to astronomy convention
        mesh = ax.pcolormesh(-LON, LAT, img, cmap=colormap,
                             shading="auto", **kwargs)
        if colorbar:
            plt.colorbar(mesh, ax=ax, shrink=0.6)
        if title:
            ax.set_title(title)
        return ax

    healpix_plot = healpix_heatmap

    def scatter(self, x, y, s=1, c=None, xerr=None, yerr=None, s_expr=None, c_expr=None,
                labels=None, selection=None, length_limit=50000, length_check=True,
                xlabel=None, ylabel=None, alpha=0.5, **kwargs):
        """Raw scatter for small data (reference: mpl.py scatter:214 —
        incl. per-point expression sizes/colors, errorbars, text labels)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        y = _ensure_str(y)
        if length_check and len(df) > length_limit:
            raise ValueError(f"too many rows ({len(df)}) for scatter; use heatmap or pass length_check=False")

        def ev(e):
            return None if e is None else np.asarray(df.evaluate(_ensure_str(e), selection=selection))

        xv, yv = ev(x), ev(y)
        cv = ev(c_expr if c_expr is not None else c) if (c is not None or c_expr is not None) else None
        sv = ev(s_expr) if s_expr is not None else s
        ax = plt.gca()
        art = ax.scatter(xv, yv, s=sv, c=cv, alpha=alpha, **kwargs)
        if xerr is not None or yerr is not None:
            ax.errorbar(xv, yv, xerr=ev(xerr), yerr=ev(yerr), fmt="none",
                        ecolor="gray", alpha=alpha * 0.6, zorder=art.get_zorder() - 1)
        if labels is not None:
            lv = ev(labels)
            for xi, yi, li in zip(xv, yv, lv):
                ax.annotate(str(li), (xi, yi), textcoords="offset points", xytext=(3, 3))
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or y)
        return ax

    def vector(self, x, y, vx, vy, shape=16, limits=None, selection=None,
               normalize=False, min_count=0, **kwargs):
        """Mean-vector field over a coarse grid (reference: viz/vector.py
        plot2d_vector): per-cell mean of (vx, vy) drawn as quiver arrows;
        cells with fewer than ``min_count`` contributing rows are hidden,
        ``normalize=True`` plots unit direction vectors.  All three grids
        (count + two means) fuse into ONE device pass via delay=True."""
        import matplotlib.pyplot as plt
        df = self.df
        x, y, vx, vy = map(_ensure_str, (x, y, vx, vy))
        limits = df.limits([x, y], limits, selection=selection)
        # count(vx+vy): a row counts only when BOTH components are present
        # (reference: vector.py:33)
        count = df.count(f"({vx}) + ({vy})", binby=[x, y], limits=limits,
                         shape=shape, selection=selection, delay=True)
        mx = df.mean(vx, binby=[x, y], limits=limits, shape=shape,
                     selection=selection, delay=True)
        my = df.mean(vy, binby=[x, y], limits=limits, shape=shape,
                     selection=selection, delay=True)
        df.execute()
        count = np.asarray(count.get(), dtype=np.float64)
        mx = np.asarray(mx.get(), dtype=np.float64)
        my = np.asarray(my.get(), dtype=np.float64)
        if normalize:
            with np.errstate(divide="ignore", invalid="ignore"):
                length = np.sqrt(mx**2 + my**2)
                mx, my = mx / length, my / length
        cx = df.bin_centers(x, limits[0], shape=shape)
        cy = df.bin_centers(y, limits[1], shape=shape)
        X, Y = np.meshgrid(cx, cy, indexing="ij")
        mask = count.flatten() >= min_count
        kwargs.setdefault("alpha", 0.7)
        ax = plt.gca()
        ax.quiver(X.flatten()[mask], Y.flatten()[mask],
                  mx.flatten()[mask], my.flatten()[mask], **kwargs)
        return ax

    def contour(self, x, y, what="count(*)", limits=None, shape=256, selection=None,
                f="identity", levels=None, fill=False, colorbar=False, colorbar_label=None,
                colormap=None, colors=None, linewidths=None, linestyles=None,
                vmin=None, vmax=None, grid=None, xlabel=None, ylabel=None,
                figsize=None, aspect="auto", **kwargs):
        """Contour lines (or filled contours) over a binned 2-D grid
        (reference: viz/contour.py plot2d_contour)."""
        import matplotlib.pyplot as plt
        df = self.df
        x = _ensure_str(x)
        y = _ensure_str(y)
        limits = df.limits([x, y], limits, selection=selection)
        if grid is None:
            grid = self._compute_what(what, binby=[x, y], limits=limits,
                                      shape=shape, selection=selection)
        grid = _apply_f(np.asarray(grid, dtype=np.float64), f)
        shape2 = grid.shape
        cx = df.bin_centers(x, limits[0], shape=shape2[0])
        cy = df.bin_centers(y, limits[1], shape=shape2[1])
        if figsize is not None:
            plt.figure(figsize=figsize)
        ax = plt.gca()
        ax.set_aspect(aspect)
        method = ax.contourf if fill else ax.contour
        opts = dict(colors=colors, cmap=colormap, vmin=vmin, vmax=vmax, **kwargs)
        if levels is not None:
            opts["levels"] = levels
        if not fill:
            opts.update(linewidths=linewidths, linestyles=linestyles)
        cs = method(cx, cy, grid.T, **{k: v for k, v in opts.items() if v is not None})
        if colorbar:
            plt.colorbar(cs, ax=ax, label=colorbar_label or str(what))
        ax.set_xlabel(xlabel or x)
        ax.set_ylabel(ylabel or y)
        return ax

    def tensor(self, x, y, vx, vy, shape=16, limits=None, selection=None,
               normalize=False, min_count=0, scale=1.0, facecolor="green",
               alpha=0.5, edgecolor="black"):
        """Per-cell dispersion ellipses from the 2x2 covariance of (vx, vy)
        (reference: viz/tensor.py plot2d_tensor): each grid cell draws an
        ellipse whose axes are the covariance eigenvectors scaled by the
        square roots of the eigenvalues."""
        import matplotlib.pyplot as plt
        from matplotlib.patches import Ellipse
        df = self.df
        x, y, vx, vy = map(_ensure_str, (x, y, vx, vy))
        limits = df.limits([x, y], limits, selection=selection)
        count = df.count(f"({vx}) + ({vy})", binby=[x, y], limits=limits,
                         shape=shape, selection=selection, delay=True)
        cov = df.cov([vx, vy], binby=[x, y], limits=limits, shape=shape,
                     selection=selection, delay=True)
        df.execute()
        count = np.asarray(count.get(), dtype=np.float64).flatten()
        cov = np.asarray(cov.get(), dtype=np.float64)
        if normalize:
            trace = cov[..., 0, 0] + cov[..., 1, 1]
            with np.errstate(divide="ignore", invalid="ignore"):
                cov = cov / trace[..., None, None]
        cx = df.bin_centers(x, limits[0], shape=shape)
        cy = df.bin_centers(y, limits[1], shape=shape)
        X, Y = np.meshgrid(cx, cy, indexing="ij")
        X, Y = X.flatten(), Y.flatten()
        cov = cov.reshape((-1, 2, 2))
        with np.errstate(invalid="ignore"):
            max_length = np.sqrt(np.nanmax(cov[:, 0, 0] + cov[:, 1, 1]))
        cell_w = (limits[0][1] - limits[0][0]) / shape
        cell_h = (limits[1][1] - limits[1][0]) / shape
        scaling = min(cell_w, cell_h) / max(max_length, 1e-300) * scale
        ax = plt.gca()
        artists = []
        for i in range(len(X)):
            if count[i] < min_count or not np.all(np.isfinite(cov[i])):
                continue
            eigen_values, eigen_vectors = np.linalg.eigh(cov[i])
            order = np.argsort(eigen_values)[::-1]
            v1 = eigen_vectors[:, order[0]]
            width = np.sqrt(max(eigen_values[order[0]], 0.0)) * scaling
            height = np.sqrt(max(eigen_values[order[1]], 0.0)) * scaling
            angle = np.degrees(np.arctan2(v1[1], v1[0]))
            e = Ellipse(xy=(X[i], Y[i]), width=width, height=height, angle=angle,
                        alpha=alpha, facecolor=facecolor, edgecolor=edgecolor)
            ax.add_artist(e)
            artists.append(e)
        ax.set_xlim(limits[0])
        ax.set_ylim(limits[1])
        return artists

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
