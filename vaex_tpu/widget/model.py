"""Reactive grid models (reference: vaex-jupyter/vaex/jupyter/model.py:86-566).

An Axis tracks (expression, min, max, shape) with a small state machine
(NO_LIMITS → STAGED_CALCULATING_LIMITS → READY); a GridModel aggregates over
its axes and recomputes whenever an axis or the selection changes — the same
reactive recompute loop the reference builds on traitlets, driving the TPU
executor instead of CPU passes.
"""

from __future__ import annotations

import traitlets

import numpy as np


class Axis(traitlets.HasTraits):
    """Reference: jupyter/model.py Axis."""

    class Status:
        NO_LIMITS = "no_limits"
        CALCULATING_LIMITS = "staged_calculating_limits"
        READY = "ready"

    expression = traitlets.Unicode()
    min = traitlets.Float(None, allow_none=True)
    max = traitlets.Float(None, allow_none=True)
    shape = traitlets.Int(64)
    status = traitlets.Unicode(Status.NO_LIMITS)

    def __init__(self, df, expression, min=None, max=None, shape=64):
        super().__init__(expression=str(expression), shape=shape)
        self.df = df
        if min is not None and max is not None:
            self.min, self.max = float(min), float(max)
            self.status = Axis.Status.READY
        else:
            self.computed_limits()

    def computed_limits(self):
        self.status = Axis.Status.CALCULATING_LIMITS
        vmin, vmax = self.df.limits(self.expression, "minmax")
        self.min, self.max = float(vmin), float(vmax)
        self.status = Axis.Status.READY

    @property
    def centers(self):
        edges = np.linspace(self.min, self.max, self.shape + 1)
        return (edges[1:] + edges[:-1]) / 2

    def _debug_wait_for_status(self, status=Status.READY):
        assert self.status == status, f"status {self.status!r} != {status!r}"


class GridModel(traitlets.HasTraits):
    """Reference: jupyter/model.py DataArray/GridCalculator."""

    class Status:
        MISSING_LIMITS = "missing_limits"
        CALCULATING = "staged_calculating"
        READY = "ready"

    status = traitlets.Unicode(Status.MISSING_LIMITS)
    what = traitlets.Unicode("count(*)")
    selection = traitlets.Any(None)

    def __init__(self, df, axes, what="count(*)"):
        super().__init__(what=what)
        self.df = df
        self.axes = list(axes)
        self.grid = None
        self._callbacks = []
        for axis in self.axes:
            axis.observe(self._on_axis_change, names=["min", "max", "shape", "expression"])
        self.observe(self._on_axis_change, names=["what", "selection"])
        self.compute()

    def on_grid(self, callback):
        self._callbacks.append(callback)

    def _on_axis_change(self, change):
        self.compute()

    def compute(self):
        if any(axis.status != Axis.Status.READY for axis in self.axes):
            self.status = GridModel.Status.MISSING_LIMITS
            return
        self.status = GridModel.Status.CALCULATING
        binby = [axis.expression for axis in self.axes]
        limits = [[axis.min, axis.max] for axis in self.axes]
        shape = [axis.shape for axis in self.axes]
        what = self.what
        if what.startswith("count"):
            self.grid = np.asarray(self.df.count(binby=binby, limits=limits, shape=shape,
                                                 selection=self.selection))
        else:
            name, _, arg = what.partition("(")
            arg = arg.rstrip(")")
            method = getattr(self.df, name.strip())
            self.grid = np.asarray(method(arg, binby=binby, limits=limits, shape=shape,
                                          selection=self.selection))
        self.status = GridModel.Status.READY
        for cb in self._callbacks:
            cb(self.grid)

    def _debug_wait_for_status(self, status=Status.READY):
        assert self.status == status, f"status {self.status!r} != {status!r}"
