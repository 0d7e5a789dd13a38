"""Reactive grid models (reference: vaex-jupyter/vaex/jupyter/model.py:86-566).

An Axis tracks (expression, min, max, shape) with a small state machine
(NO_LIMITS → STAGED_CALCULATING_LIMITS → READY); a GridModel aggregates over
its axes and recomputes whenever an axis, the aggregation, or a relevant
*named selection* changes — the same reactive recompute loop the reference
builds on traitlets (jupyter/model.py Axis/DataArray), driving the TPU
executor instead of CPU thread passes.  Selection linking works through
``DataFrame.signal_selection_changed``: every model watching the same
DataFrame recomputes when a selection it displays is brushed in any view.
"""

from __future__ import annotations

import threading

import traitlets

import numpy as np

from ..xarray_lite import DataArrayLite


class _StatusMixin:
    """Status-machine plumbing shared by Axis and GridModel (reference:
    jupyter/model.py _HasState:27-82 — status trait + exception capture +
    `_debug_wait_for_status` test hooks; the reference awaits an asyncio
    future on the ioloop, here a threading.Event fits the headless/TPU
    executor)."""

    exception = None

    def _capture(self, exc):
        """Record a failure and transition to the error state instead of
        letting a background (debounced) compute die silently
        (reference: _HasState._error :43-47)."""
        self.exception = exc
        self.status = self.Status.EXCEPTION

    def _raise_if_exception(self):
        if self.exception is not None:
            raise self.exception

    def _debug_wait_for_status(self, status=None, timeout=10.0):
        """Block until `status` is reached (immediately if already there);
        raises on transition to EXCEPTION, like the reference's
        future-rejecting hook (jupyter/model.py:32-47)."""
        status = status or self.Status.READY
        if self.status == self.Status.EXCEPTION and status != self.Status.EXCEPTION:
            raise self.exception
        if self.status == status:
            return
        event = threading.Event()

        def on_change(change):
            if change["new"] in (status, self.Status.EXCEPTION):
                event.set()

        self.observe(on_change, "status")
        try:
            if not event.wait(timeout):
                raise TimeoutError(
                    f"status {self.status!r} never reached {status!r} in {timeout}s")
            if self.status == self.Status.EXCEPTION and status != self.Status.EXCEPTION:
                raise self.exception
        finally:
            self.unobserve(on_change, "status")


class Axis(_StatusMixin, traitlets.HasTraits):
    """Reference: jupyter/model.py Axis (state machine :86-244)."""

    class Status:
        NO_LIMITS = "no_limits"
        CALCULATING_LIMITS = "staged_calculating_limits"
        READY = "ready"
        EXCEPTION = "exception"

    expression = traitlets.Unicode()
    min = traitlets.Float(None, allow_none=True)
    max = traitlets.Float(None, allow_none=True)
    shape = traitlets.Int(64)
    status = traitlets.Unicode(Status.NO_LIMITS)

    def __init__(self, df, expression, min=None, max=None, shape=64):
        super().__init__(expression=str(expression), shape=shape)
        self.df = df
        self.observe(self._on_expression_change, names=["expression"])
        if min is not None and max is not None:
            self.min, self.max = float(min), float(max)
            self.status = Axis.Status.READY
        else:
            self.computed_limits()

    def _on_expression_change(self, change):
        # a new expression invalidates the limits; recompute them so
        # observers see a consistent (expression, min, max) triple
        self.status = Axis.Status.NO_LIMITS
        self.computed_limits()

    def computed_limits(self):
        self.status = Axis.Status.CALCULATING_LIMITS
        try:
            vmin, vmax = self.df.limits(self.expression, "minmax")
            self.min, self.max = float(vmin), float(vmax)
        except Exception as e:  # noqa: BLE001
            self._capture(e)
            return
        self.exception = None
        self.status = Axis.Status.READY

    @property
    def centers(self):
        edges = np.linspace(self.min, self.max, self.shape + 1)
        return (edges[1:] + edges[:-1]) / 2

class GridModel(_StatusMixin, traitlets.HasTraits):
    """Reference: jupyter/model.py DataArray/GridCalculator (:246-566).

    ``selection`` may be a single selection (None/True/name) or a list of
    them; a list produces a stacked grid with a leading ``selection`` axis
    (the reference's multi-selection DataArray).  The model recomputes when:
    any axis changes, ``what``/``selection`` change, or a *named selection
    it displays* changes on the DataFrame (brushing in another view).
    """

    class Status:
        MISSING_LIMITS = "missing_limits"
        CALCULATING = "staged_calculating"
        READY = "ready"
        EXCEPTION = "exception"

    status = traitlets.Unicode(Status.MISSING_LIMITS)
    what = traitlets.Unicode("count(*)")
    selection = traitlets.Any(None)
    debounce_delay = traitlets.Float(0.0)

    def __init__(self, df, axes, what="count(*)", selection=None, debounce_delay=0.0):
        super().__init__(what=what, debounce_delay=debounce_delay)
        self.df = df
        self.axes = list(axes)
        self.grid = None
        self._callbacks = []
        self._debounce_timer = None
        self._debounce_lock = threading.Lock()
        for axis in self.axes:
            axis.observe(self._on_axis_change, names=["min", "max", "shape", "expression"])
        self.observe(self._on_axis_change, names=["what", "selection"])
        self._selection_listener = df.signal_selection_changed.connect(self._on_selection_change)
        if selection is not None:
            self.selection = selection  # triggers compute via observer
        else:
            self.compute()

    def close(self):
        """Stop listening; reference: model unobserve on widget close."""
        with self._debounce_lock:
            if self._debounce_timer is not None:
                self._debounce_timer.cancel()
                self._debounce_timer = None
        try:
            self.df.signal_selection_changed.disconnect(self._selection_listener)
        except ValueError:
            pass

    def on_grid(self, callback):
        self._callbacks.append(callback)

    def _selection_names(self):
        sel = self.selection
        items = sel if isinstance(sel, (list, tuple)) else [sel]
        names = set()
        for s in items:
            if s is True:
                names.add("default")
            elif isinstance(s, str):
                names.add(s)
        return names

    def _on_selection_change(self, df, name):
        if name in self._selection_names():
            self._schedule_compute()

    def _on_axis_change(self, change):
        self._schedule_compute()

    def _schedule_compute(self):
        """Debounced recompute: a burst of trait changes (brushing drags,
        programmatic multi-trait updates) coalesces into one pass
        (reference: @vaex.jupyter.debounced on DataArray computations,
        jupyter/model.py:196 + utils.py debounced).  delay=0 computes
        synchronously — the deterministic default for headless use."""
        if self.debounce_delay <= 0:
            self.compute()
            return
        with self._debounce_lock:
            if self._debounce_timer is not None:
                self._debounce_timer.cancel()
            self.status = GridModel.Status.CALCULATING

            def fire():
                with self._debounce_lock:
                    self._debounce_timer = None
                try:
                    self.compute()
                except Exception as e:  # noqa: BLE001 — timer thread
                    self._capture(e)

            self._debounce_timer = threading.Timer(self.debounce_delay, fire)
            self._debounce_timer.daemon = True
            self._debounce_timer.start()

    def _effective_selection(self):
        """Drop named selections that don't exist yet — a view created before
        any brushing shows only the unselected grid until a selection appears
        (reference: DataArray selection toggling)."""
        sel = self.selection
        if not isinstance(sel, (list, tuple)):
            return sel
        def exists(s):
            if s is None or s is False:
                return True
            name = "default" if s is True else s
            return self.df.has_selection(name)
        live = [s for s in sel if exists(s)]
        if len(live) == 1:
            return live[0]
        return live

    def compute(self):
        if any(axis.status != Axis.Status.READY for axis in self.axes):
            self.status = GridModel.Status.MISSING_LIMITS
            return
        self.status = GridModel.Status.CALCULATING
        try:
            binby = [axis.expression for axis in self.axes]
            limits = [[axis.min, axis.max] for axis in self.axes]
            shape = [axis.shape for axis in self.axes]
            what = self.what
            selection = self._effective_selection()
            if what.startswith("count"):
                self.grid = np.asarray(self.df.count(binby=binby, limits=limits, shape=shape,
                                                     selection=selection))
            else:
                name, _, arg = what.partition("(")
                arg = arg.rstrip(")")
                method = getattr(self.df, name.strip())
                self.grid = np.asarray(method(arg, binby=binby, limits=limits, shape=shape,
                                              selection=selection))
        except Exception as e:  # noqa: BLE001
            self._capture(e)
            return
        self._computed_selection = selection
        self.exception = None
        self.status = GridModel.Status.READY
        for cb in self._callbacks:
            cb(self.grid)

    @property
    def data_array(self):
        """Grid as a labeled array with bin-center coords
        (reference: DataArray exposing xarray, jupyter/model.py:246)."""
        if self.grid is None:
            return None
        dims = [str(axis.expression) for axis in self.axes]
        coords = {str(axis.expression): axis.centers for axis in self.axes}
        computed = getattr(self, "_computed_selection", self.selection)
        if isinstance(computed, (list, tuple)):
            dims = ["selection"] + dims
            coords["selection"] = np.array(
                ["default" if s is True else str(s) for s in computed], dtype=object)
        return DataArrayLite(self.grid, dims=dims, coords=coords, name=self.what)
