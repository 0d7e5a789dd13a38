"""ipywidgets views over grid models + df.widget accessor
(reference: vaex-jupyter/vaex/jupyter/view.py, widgets.py, __init__.py).

Views display a stacked [no-selection, default-selection] grid and expose
brush methods (``select_range`` / ``select_rectangle`` / ``select_lasso``)
that write a named selection on the DataFrame; the DataFrame's
``signal_selection_changed`` then drives every linked model to recompute —
the reference's cross-view selection linking (jupyter/view.py brushes).
"""

from __future__ import annotations

import numpy as np

from ..dataframe import register_dataframe_accessor
from .model import Axis, GridModel


class ViewBase:
    def _repr_mimebundle_(self, **kwargs):
        return self.widget._repr_mimebundle_(**kwargs)

    def close(self):
        self.model.close()


class HistogramWidget(ViewBase):
    """1-D reactive histogram: slider for shape, brushable x-range selection."""

    def __init__(self, df, expression, shape=64, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        self.axis = Axis(df, expression, shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.axis], what=what, selection=selection)
        self.output = w.Output()
        self.shape_slider = w.IntSlider(value=shape, min=2, max=512, description="bins")
        self.shape_slider.observe(self._on_shape, names="value")
        self.widget = w.VBox([self.shape_slider, self.output])
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def _on_shape(self, change):
        self.axis.shape = change["new"]

    def select_range(self, vmin, vmax, name="default", mode="replace"):
        """Brush: select rows with vmin <= expression < vmax."""
        expr = self.axis.expression
        self.df.select(f"(({expr}) >= {vmin!r}) & (({expr}) < {vmax!r})", name=name, mode=mode)

    def _draw(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            grid = np.atleast_2d(self.model.grid)
            for row in grid:
                ax.plot(self.axis.centers, row, drawstyle="steps-mid")
            ax.set_xlabel(self.axis.expression)
            plt.close(fig)


class HeatmapWidget(ViewBase):
    def __init__(self, df, x, y, shape=128, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        self.axis_x = Axis(df, x, shape=shape)
        self.axis_y = Axis(df, y, shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.axis_x, self.axis_y], what=what, selection=selection)
        self.output = w.Output()
        self.widget = w.VBox([self.output])
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def select_rectangle(self, x1, x2, y1, y2, name="default", mode="replace"):
        """Brush: rectangle selection in (x, y) data coordinates."""
        ex, ey = self.axis_x.expression, self.axis_y.expression
        self.df.select(
            f"(({ex}) >= {x1!r}) & (({ex}) < {x2!r}) & (({ey}) >= {y1!r}) & (({ey}) < {y2!r})",
            name=name, mode=mode)

    def select_lasso(self, xs, ys, name="default", mode="replace"):
        self.df.select_lasso(self.axis_x.expression, self.axis_y.expression,
                             xs, ys, name=name, mode=mode)

    def _draw(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            grid = self.model.grid
            if grid.ndim == 3:  # stacked selections: show the unselected base
                grid = grid[0]
            ax.imshow(np.log1p(grid).T, origin="lower", aspect="auto",
                      extent=[self.axis_x.min, self.axis_x.max, self.axis_y.min, self.axis_y.max])
            plt.close(fig)


class PieChartWidget(ViewBase):
    """Selection-linked pie over a 1-D grid (reference: jupyter/view.py:312
    PieChart(Histogram) — wedge fractions from the same grid model; the
    selection layer renders as an inner ring)."""

    def __init__(self, df, expression, shape=8, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        self.axis = Axis(df, expression, shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.axis], what=what, selection=selection)
        self.output = w.Output()
        self.widget = w.VBox([self.output])
        self.fractions = None          # outer ring (all rows)
        self.fractions_selected = None  # inner ring (selection layer)
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def select_range(self, vmin, vmax, name="default", mode="replace"):
        expr = self.axis.expression
        self.df.select(f"(({expr}) >= {vmin!r}) & (({expr}) < {vmax!r})",
                       name=name, mode=mode)

    def _draw(self):
        grid = np.atleast_2d(np.asarray(self.model.grid, dtype=np.float64))
        totals = grid.sum(axis=-1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(totals > 0, grid / totals, 0.0)
        self.fractions = frac[0]
        self.fractions_selected = frac[1] if grid.shape[0] > 1 else None
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            ax.pie(np.maximum(grid[0], 0))
            if grid.shape[0] > 1:
                ax.pie(np.maximum(grid[1], 0), radius=0.6)
            plt.close(fig)


class DataArrayWidget(ViewBase):
    """Grid-as-labeled-array view (reference: jupyter/view.py:94 DataArray):
    renders the model's N-d grid with axis coordinates via xarray_lite, and
    live-updates on selection/axis changes like every other view."""

    def __init__(self, df, expressions, shape=16, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        if isinstance(expressions, str):
            expressions = [expressions]
        self.axes = [Axis(df, str(e), shape=shape) for e in expressions]
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, self.axes, what=what, selection=selection)
        self.output = w.Output()
        self.widget = w.VBox([self.output])
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    @property
    def data_array(self):
        return self.model.data_array

    def _draw(self):
        with self.output:
            self.output.clear_output(wait=True)
            print(repr(self.data_array))


class GeoMapWidget(ViewBase):
    """Map-style binned view over (longitude, latitude) — the headless
    analogue of the reference's ipyleaflet heatmap layer
    (vaex-jupyter/vaex/jupyter/ipyleaflet.py): a 2-D density grid in
    geographic coordinates with a rectangle brush in (lon, lat).  When
    ipyleaflet is importable the grid is also pushed into a leaflet Heatmap
    layer; otherwise the view renders the same grid with matplotlib on a
    [-180, 180] x [-90, 90] canvas."""

    def __init__(self, df, longitude, latitude, shape=128, what="count(*)",
                 selection=None, limits=None):
        import ipywidgets as w
        self.df = df
        if limits is None:
            limits = [[-180.0, 180.0], [-90.0, 90.0]]
        self.axis_lon = Axis(df, str(longitude), min=limits[0][0],
                             max=limits[0][1], shape=shape)
        self.axis_lat = Axis(df, str(latitude), min=limits[1][0],
                             max=limits[1][1], shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.axis_lon, self.axis_lat],
                               what=what, selection=selection)
        self.output = w.Output()
        self.widget = w.VBox([self.output])
        self.leaflet_layer = None
        try:  # pragma: no cover - env-gated
            import ipyleaflet
            self._ipyleaflet = ipyleaflet
        except ImportError:
            self._ipyleaflet = None
        self.heat_data = None   # [(lat, lon, weight)] rows for a leaflet layer
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def select_rectangle(self, lon1, lon2, lat1, lat2, name="default", mode="replace"):
        ex, ey = self.axis_lon.expression, self.axis_lat.expression
        self.df.select(
            f"(({ex}) >= {lon1!r}) & (({ex}) < {lon2!r}) & "
            f"(({ey}) >= {lat1!r}) & (({ey}) < {lat2!r})", name=name, mode=mode)

    def _draw(self):
        grid = np.asarray(self.model.grid, dtype=np.float64)
        if grid.ndim == 3:
            grid = grid[-1] if grid.shape[0] > 1 and np.nansum(grid[-1]) else grid[0]
        # leaflet-style point-weight triples for the nonzero cells
        lon_c, lat_c = self.axis_lon.centers, self.axis_lat.centers
        ii, jj = np.nonzero(grid)
        self.heat_data = [(float(lat_c[j]), float(lon_c[i]), float(grid[i, j]))
                          for i, j in zip(ii, jj)]
        if self._ipyleaflet is not None:  # pragma: no cover - env-gated
            if self.leaflet_layer is None:
                self.leaflet_layer = self._ipyleaflet.Heatmap(locations=[])
            self.leaflet_layer.locations = [(a, b) for a, b, _ in self.heat_data]
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            ax.imshow(np.log1p(grid).T, origin="lower", aspect="auto",
                      extent=[self.axis_lon.min, self.axis_lon.max,
                              self.axis_lat.min, self.axis_lat.max])
            ax.set_xlabel(self.axis_lon.expression)
            ax.set_ylabel(self.axis_lat.expression)
            plt.close(fig)


class CounterWidget:
    """Processed/selected-rows counters (reference: widgets.py counters).

    Live: subscribes to selection changes so the selected count tracks
    brushing in other views.
    """

    def __init__(self, df, selection=None):
        import ipywidgets as w
        self.df = df
        self.selection = selection
        self.label = w.HTML()
        self._listener = df.signal_selection_changed.connect(self._on_selection)
        self.update()

    def _on_selection(self, df, name):
        sel = "default" if self.selection is True else self.selection
        if name == sel:
            self.update()

    def update(self):
        if self.selection is not None:
            n = int(self.df.count(selection=self.selection))
            self.label.value = f"<b>{n:,}</b> selected"
        else:
            self.label.value = f"<b>{len(self.df):,}</b> rows"

    def close(self):
        try:
            self.df.signal_selection_changed.disconnect(self._listener)
        except ValueError:
            pass


@register_dataframe_accessor("widget")
class DataFrameAccessorWidget:
    """df.widget accessor (reference: vaex-jupyter accessor)."""

    def __init__(self, df):
        self.df = df

    def histogram(self, expression, shape=64, what="count(*)", selection=None):
        return HistogramWidget(self.df, str(expression), shape=shape, what=what, selection=selection)

    def heatmap(self, x, y, shape=128, what="count(*)", selection=None):
        return HeatmapWidget(self.df, str(x), str(y), shape=shape, what=what, selection=selection)

    def pie_chart(self, expression, shape=8, what="count(*)", selection=None):
        return PieChartWidget(self.df, str(expression), shape=shape, what=what,
                              selection=selection)

    def data_array(self, expressions, shape=16, what="count(*)", selection=None):
        return DataArrayWidget(self.df, expressions, shape=shape, what=what,
                               selection=selection)

    def geo_map(self, longitude, latitude, shape=128, what="count(*)",
                selection=None, limits=None):
        return GeoMapWidget(self.df, longitude, latitude, shape=shape,
                            what=what, selection=selection, limits=limits)

    def counter_processed(self):
        return CounterWidget(self.df)

    def counter_selection(self, selection="default"):
        return CounterWidget(self.df, selection=selection)

    def axis_model(self, expression, shape=64):
        return Axis(self.df, str(expression), shape=shape)

    def grid_model(self, axes, what="count(*)", selection=None):
        return GridModel(self.df, axes, what=what, selection=selection)

    # bqplot / ipyvolume views (widget/plot.py, import-gated): the reference's
    # vaex-jupyter plot-widget ring (view.py Histogram/Heatmap/PieChart,
    # ipyvolume.py)
    def histogram_bqplot(self, x, shape=64, what="count(*)", selection=None, **kwargs):
        from .plot import Histogram
        return Histogram(self.df, x, shape=shape, what=what, selection=selection, **kwargs)

    def heatmap_bqplot(self, x, y, shape=128, what="count(*)", selection=None, **kwargs):
        from .plot import Heatmap
        return Heatmap(self.df, x, y, shape=shape, what=what, selection=selection, **kwargs)

    def pie(self, x, shape=8, **kwargs):
        from .plot import PieChart
        return PieChart(self.df, x, shape=shape, **kwargs)

    def volume(self, x, y, z, shape=64, what="count(*)", selection=None):
        from .plot import VolumePlot
        return VolumePlot(self.df, x, y, z, shape=shape, what=what, selection=selection)

    def toolbar(self, view):
        from .plot import PlotToolbar
        return PlotToolbar(view)
