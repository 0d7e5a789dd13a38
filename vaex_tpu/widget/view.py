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
