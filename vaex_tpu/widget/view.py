"""ipywidgets views over grid models + df.widget accessor
(reference: vaex-jupyter/vaex/jupyter/view.py, widgets.py, __init__.py)."""

from __future__ import annotations

import numpy as np

from ..dataframe import register_dataframe_accessor
from .model import Axis, GridModel


class HistogramWidget:
    """1-D reactive histogram: slider for shape, text inputs for limits."""

    def __init__(self, df, expression, shape=64, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        self.axis = Axis(df, expression, shape=shape)
        self.model = GridModel(df, [self.axis], what=what)
        self.model.selection = selection
        self.output = w.Output()
        self.shape_slider = w.IntSlider(value=shape, min=2, max=512, description="bins")
        self.shape_slider.observe(self._on_shape, names="value")
        self.widget = w.VBox([self.shape_slider, self.output])
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def _on_shape(self, change):
        self.axis.shape = change["new"]

    def _draw(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            ax.plot(self.axis.centers, self.model.grid, drawstyle="steps-mid")
            ax.set_xlabel(self.axis.expression)
            plt.close(fig)

    def _repr_mimebundle_(self, **kwargs):
        return self.widget._repr_mimebundle_(**kwargs)


class HeatmapWidget:
    def __init__(self, df, x, y, shape=128, what="count(*)", selection=None):
        import ipywidgets as w
        self.df = df
        self.axis_x = Axis(df, x, shape=shape)
        self.axis_y = Axis(df, y, shape=shape)
        self.model = GridModel(df, [self.axis_x, self.axis_y], what=what)
        self.model.selection = selection
        self.output = w.Output()
        self.widget = w.VBox([self.output])
        self.model.on_grid(lambda grid: self._draw())
        self._draw()

    def _draw(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        with self.output:
            self.output.clear_output(wait=True)
            fig, ax = plt.subplots()
            ax.imshow(np.log1p(self.model.grid).T, origin="lower", aspect="auto",
                      extent=[self.axis_x.min, self.axis_x.max, self.axis_y.min, self.axis_y.max])
            plt.close(fig)

    def _repr_mimebundle_(self, **kwargs):
        return self.widget._repr_mimebundle_(**kwargs)


class CounterWidget:
    """Processed-rows counter (reference: widgets.py counters)."""

    def __init__(self, df):
        import ipywidgets as w
        self.df = df
        self.label = w.HTML()
        self.update()

    def update(self):
        self.label.value = f"<b>{len(self.df):,}</b> rows"


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

    def axis_model(self, expression, shape=64):
        return Axis(self.df, str(expression), shape=shape)

    def grid_model(self, axes, what="count(*)"):
        return GridModel(self.df, axes, what=what)
