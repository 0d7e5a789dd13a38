"""bqplot / ipyvolume plot views over the reactive grid models.

TPU-native counterpart of the reference's plot-widget ring
(/root/reference/packages/vaex-jupyter/vaex/jupyter/view.py:42-315 Histogram/
Heatmap/PieChart over bqplot, ipyvolume.py volume rendering, widgets.py
toolbar).  The heavy plotting libraries are OPTIONAL and imported lazily:
constructing a view without them raises a helpful ImportError, and the whole
module imports cleanly without them — headless tests drive the classes with
fake bqplot/ipyvolume modules (tests/ecosystem_test.py), mirroring the
reference's headless state-machine tests.

Every view owns a GridModel (widget/model.py); redraw is reactive via
``model.on_grid`` and brushing writes named DataFrame selections, so views
sharing a DataFrame link automatically (brush one → all recompute).
"""

from __future__ import annotations

import numpy as np

from .model import Axis, GridModel

# the two brush colors of the reference's stacked [unselected, selected]
# display (view.py:20)
C0, C1 = "#9ECBF5", "#E0732C"


def _require(module_name):
    import importlib
    try:
        return importlib.import_module(module_name)
    except ImportError as e:  # pragma: no cover - exercised via fakes
        raise ImportError(
            f"{module_name} is required for this view; pip install {module_name}") from e


def _translate_selection(selection):
    """Reference: view.py:32-38."""
    if selection in (None, False):
        return None
    if selection is True:
        return "default"
    return selection


class PlotBase:
    """Shared brush/selection plumbing (reference ViewBase, view.py:42-91)."""

    def __init__(self, df, selection_interact="default", selection_mode="replace"):
        self.df = df
        self.selection_interact = selection_interact
        self.selection_mode = selection_mode

    def select_nothing(self):
        self.df.select_nothing(name=_translate_selection(self.selection_interact))

    def select_x_range(self, x1, x2):
        expr = self.model.axes[0].expression
        self.df.select(f"(({expr}) >= {x1!r}) & (({expr}) < {x2!r})",
                       name=_translate_selection(self.selection_interact),
                       mode=self.selection_mode)

    def select_rectangle(self, x1, x2, y1, y2):
        ex = self.model.axes[0].expression
        ey = self.model.axes[1].expression
        self.df.select_rectangle(ex, ey, limits=[[x1, x2], [y1, y2]],
                                 mode=self.selection_mode,
                                 name=_translate_selection(self.selection_interact))

    def close(self):
        self.model.close()

    def _stacked(self):
        """Grid as [selections, ...axes] even for a single selection."""
        grid = np.asarray(self.model.grid)
        if grid.ndim == len(self.model.axes):
            grid = grid[None]
        return grid

    def _repr_mimebundle_(self, **kwargs):  # pragma: no cover - live jupyter
        return self.figure._repr_mimebundle_(**kwargs)


class Histogram(PlotBase):
    """bqplot bar histogram with x-range brushing
    (reference: view.py:221-311)."""

    def __init__(self, df, x, shape=64, what="count(*)", selection=None,
                 selection_interact="default", selection_mode="replace"):
        super().__init__(df, selection_interact, selection_mode)
        bq = _require("bqplot")
        self.x = x if isinstance(x, Axis) else Axis(df, x, shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.x], what=what, selection=selection)
        self.scale_x = bq.LinearScale(min=self.x.min, max=self.x.max)
        self.scale_y = bq.LinearScale()
        self.mark = bq.Bars(x=self.x.centers, y=self._bars(),
                            scales={"x": self.scale_x, "y": self.scale_y},
                            colors=[C0, C1], type="stacked")
        self.axis_x = bq.Axis(scale=self.scale_x, label=str(self.x.expression))
        self.axis_y = bq.Axis(scale=self.scale_y, orientation="vertical", label=what)
        self.brush = bq.interacts.BrushIntervalSelector(scale=self.scale_x)
        self.brush.observe(self._on_brush, names=["brushing"])
        self.figure = bq.Figure(marks=[self.mark], axes=[self.axis_x, self.axis_y],
                                interaction=self.brush)
        self.model.on_grid(lambda grid: self._update())

    def _bars(self):
        grid = self._stacked().astype(np.float64)
        if grid.shape[0] > 1:
            # stacked display: unselected = total - selected (reference draws
            # the selected counts on top of the remainder)
            rest = grid[0] - grid[1:].sum(axis=0)
            grid = np.concatenate([rest[None], grid[1:]], axis=0)
        return grid

    def _update(self):
        self.mark.x = self.x.centers
        self.mark.y = self._bars()
        self.scale_x.min = float(self.x.min)
        self.scale_x.max = float(self.x.max)

    def _on_brush(self, change):
        if self.brush.brushing:  # wait for release
            return
        sel = getattr(self.brush, "selected", None)
        if sel is None or len(sel) != 2:
            return
        self.select_x_range(float(min(sel)), float(max(sel)))


class PieChart(Histogram):
    """Pie over the same 1-D model (reference: view.py:312-325)."""

    def __init__(self, df, x, shape=8, **kwargs):
        super().__init__(df, x, shape=shape, **kwargs)
        bq = _require("bqplot")
        grid = self._stacked()[0].astype(np.float64)
        self.pie = bq.Pie(sizes=grid, labels=[str(c) for c in self.x.centers])
        self.figure = bq.Figure(marks=[self.pie])
        self.model.on_grid(lambda grid: self._update_pie())

    def _update_pie(self):
        self.pie.sizes = self._stacked()[0].astype(np.float64)
        self.pie.labels = [str(c) for c in self.x.centers]


class Heatmap(PlotBase):
    """bqplot heatmap with rectangle brushing (reference: view.py:130-219)."""

    def __init__(self, df, x, y, shape=128, what="count(*)", selection=None,
                 selection_interact="default", selection_mode="replace"):
        super().__init__(df, selection_interact, selection_mode)
        bq = _require("bqplot")
        self.x = x if isinstance(x, Axis) else Axis(df, x, shape=shape)
        self.y = y if isinstance(y, Axis) else Axis(df, y, shape=shape)
        if selection is None:
            selection = [None, "default"]
        self.model = GridModel(df, [self.x, self.y], what=what, selection=selection)
        self.scale_x = bq.LinearScale(min=self.x.min, max=self.x.max)
        self.scale_y = bq.LinearScale(min=self.y.min, max=self.y.max)
        self.scale_color = bq.ColorScale(scheme="viridis")
        self.mark = bq.HeatMap(x=self.x.centers, y=self.y.centers,
                               color=self._image(),
                               scales={"x": self.scale_x, "y": self.scale_y,
                                       "color": self.scale_color})
        self.axis_x = bq.Axis(scale=self.scale_x, label=str(self.x.expression))
        self.axis_y = bq.Axis(scale=self.scale_y, orientation="vertical",
                              label=str(self.y.expression))
        self.brush = bq.interacts.BrushSelector(x_scale=self.scale_x, y_scale=self.scale_y)
        self.brush.observe(self._on_brush, names=["brushing"])
        self.figure = bq.Figure(marks=[self.mark], axes=[self.axis_x, self.axis_y],
                                interaction=self.brush)
        self.model.on_grid(lambda grid: self._update())

    def _image(self):
        grid = self._stacked().astype(np.float64)
        # log1p display transform like the reference's default f-transform
        img = np.log1p(grid[-1] if grid.shape[0] > 1 and self.df.has_selection("default")
                       else grid[0])
        return img.T  # bqplot heatmap is [y, x]

    def _update(self):
        self.mark.x = self.x.centers
        self.mark.y = self.y.centers
        self.mark.color = self._image()

    def _on_brush(self, change):
        if self.brush.brushing:
            return
        sel_x = getattr(self.brush, "selected_x", None)
        sel_y = getattr(self.brush, "selected_y", None)
        if sel_x is None or sel_y is None:
            return
        self.select_rectangle(float(min(sel_x)), float(max(sel_x)),
                              float(min(sel_y)), float(max(sel_y)))


class VolumePlot(PlotBase):
    """3-D volume rendering of a binned grid via ipyvolume
    (reference: jupyter/ipyvolume.py)."""

    def __init__(self, df, x, y, z, shape=64, what="count(*)", selection=None):
        super().__init__(df)
        ipv = _require("ipyvolume")
        axes = [a if isinstance(a, Axis) else Axis(df, a, shape=shape) for a in (x, y, z)]
        self.model = GridModel(df, axes, what=what, selection=selection)
        self._ipv = ipv
        self.figure = ipv.figure()
        self.volume = ipv.volshow(self._volume(), extent=self._extent())
        self.model.on_grid(lambda grid: self._update())

    def _volume(self):
        grid = self._stacked()[0].astype(np.float32)
        return np.log1p(grid.T)  # ipyvolume expects [z, y, x]

    def _extent(self):
        return [[a.min, a.max] for a in self.model.axes]

    def _update(self):
        self.volume.data = self._volume()


class PlotToolbar:
    """Selection-mode / interaction toolbar (reference: jupyter/widgets.py
    ToolsToolbar): toggles write straight onto the view."""

    MODES = ["replace", "and", "or", "xor", "subtract"]

    def __init__(self, view):
        import ipywidgets as w
        self.view = view
        self.mode = w.ToggleButtons(options=self.MODES, value=view.selection_mode,
                                    description="mode")
        self.mode.observe(self._on_mode, names=["value"])
        self.clear = w.Button(description="clear selection")
        self.clear.on_click(lambda b: view.select_nothing())
        self.widget = w.HBox([self.mode, self.clear])

    def _on_mode(self, change):
        self.view.selection_mode = change["new"]

    def _repr_mimebundle_(self, **kwargs):  # pragma: no cover - live jupyter
        return self.widget._repr_mimebundle_(**kwargs)
