"""Memory tracking for aggregation buffers.

Counterpart of /root/reference/packages/vaex-core/vaex/memory.py (:24-50) +
the executor's allocation double-entry check (execution.py:413, agg.py:
311-318): trackers pre-account every grid-state allocation; the 'limit'
tracker raises before a pass would exceed the budget — memory protection for
long-running services."""

from __future__ import annotations

import threading

import numpy as np

from . import settings, utils

_trackers = {}


def register_tracker(name):
    def wrapper(cls):
        _trackers[name] = cls
        return cls
    return wrapper


@register_tracker("default")
class MemoryTracker:
    """Reference: memory.py MemoryTracker."""

    def __init__(self):
        self.used = 0
        self.peak = 0
        self._lock = threading.Lock()

    def pre_alloc(self, nbytes, reason=""):
        with self._lock:
            self.used += nbytes
            self.peak = max(self.peak, self.used)

    def release(self, nbytes):
        with self._lock:
            self.used -= nbytes


@register_tracker("limit")
class MemoryLimitTracker(MemoryTracker):
    def __init__(self, limit=None):
        super().__init__()
        limit = limit or settings.memory.limit or "4GB"
        self.limit = utils.parse_memory_size(limit)

    def pre_alloc(self, nbytes, reason=""):
        with self._lock:
            if self.used + nbytes > self.limit:
                raise MemoryError(
                    f"allocating {utils.filesize_format(nbytes)} for {reason!r} would exceed "
                    f"the memory limit {utils.filesize_format(self.limit)} "
                    f"(in use: {utils.filesize_format(self.used)})")
            self.used += nbytes
            self.peak = max(self.peak, self.used)


class _Local(threading.local):
    def __init__(self):
        self.agg = None


local = _Local()


def create_tracker():
    name = settings.memory.tracker
    cls = _trackers.get(name, MemoryTracker)
    return cls()


def track_state_bytes(states):
    """Bytes held by a pytree of grid accumulators."""
    import jax
    total = 0
    for leaf in jax.tree_util.tree_leaves(states):
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize
    return total
