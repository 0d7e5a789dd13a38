"""Task descriptions: promises the executor fulfills in streaming passes.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/tasks.py:
a Task is a Promise plus a declarative spec (fingerprintable for the result
cache, encodable for remote execution).  Aggregation tasks sharing identical
binners are merged into one device pass (reference: execution.py:141-169).
"""

from __future__ import annotations

import numpy as np

from . import utils
from .delayed import Promise


class Task(Promise):
    """Reference: vaex/tasks.py:75."""

    name = "task"
    cacheable = True
    requires_fingerprint = True

    def __init__(self, df=None, expressions=None, name="task", pre_filter=False):
        super().__init__()
        self.df = df
        self.expressions = [str(e) for e in (expressions or [])]
        self.name = name
        self.pre_filter = pre_filter
        self.cancelled = False
        self.progress_fraction = 0
        self._progress_callbacks = []

    def progress(self, callback):
        self._progress_callbacks.append(callback)

    def signal_progress(self, fraction):
        self.progress_fraction = fraction
        ok = True
        for cb in self._progress_callbacks:
            if cb(fraction) is False:
                ok = False
        if not ok:
            self.cancelled = True
        return ok

    def dependencies(self):
        """All leaf dataset columns needed (expanded through virtual columns)."""
        from .expression import Expression
        deps = set()
        for e in self.expressions:
            if e == "*":
                continue
            deps |= Expression(self.df, e).root_columns()
        return deps

    def fingerprint(self):
        fp = utils.fingerprint(self.name, self.expressions, self.spec(), self.df.fingerprint(dependencies=self.dependencies()))
        return f"task-{self.name}-{fp}"

    def spec(self):
        return {}


class TaskAggregation(Task):
    """One aggregation on one grid (reference: vaex/tasks.py:549)."""

    name = "aggregation"

    def __init__(self, df, binners, aggregator_descriptor):
        expressions = [b.expression for b in binners]
        for expr in aggregator_descriptor.expressions:
            if expr != "*" and expr not in expressions:
                expressions.append(expr)
        super().__init__(df, expressions, name="aggregation", pre_filter=df.filtered)
        self.binners = tuple(binners)
        self.dtypes = {}
        self.aggregation_description = aggregator_descriptor

    def dependencies(self):
        from .expression import Expression
        deps = super().dependencies()
        sel = self.aggregation_description.selection
        if sel is not None and sel is not False:
            deps |= self.df._selection_dependencies(sel)
        if self.df.filtered:
            deps |= self.df._selection_dependencies("__filter__")
        return deps

    def spec(self):
        return dict(
            binners=[b.encode(None) for b in self.binners],
            agg=self.aggregation_description.encode(None),
        )


class TaskAggregationCompound(TaskAggregation):
    """Several primitive aggregations on one grid whose results combine ON
    DEVICE into a single fetched grid (mean = Σv/n, var = Σv²/n - (Σv/n)², …).

    The host-side compound finalize (reference: vaex/agg.py:386-521 delayed
    division) fetches every constituent grid; on a TPU the result D2H is the
    per-query fixed cost — a 1M-cell mean paid 3 × 4MB grids over the wire.
    The device finalize fetches ONE output grid (VERDICT r2 next #3/#6).

    combine_name selects a registered jnp combine (execution.COMBINE_FNS);
    combine_args parameterize it (ddof, output dtype).  Sub-results are
    intermediate only — they are never fetched or cached individually.
    """

    name = "aggregation_compound"

    def __init__(self, df, binners, aggregator_descriptor, sub_descriptors,
                 combine_name, combine_args=None):
        super().__init__(df, binners, aggregator_descriptor)
        self.sub_descriptors = list(sub_descriptors)
        self.combine_name = combine_name
        self.combine_args = dict(combine_args or {})
        for sub in self.sub_descriptors:
            for expr in sub.expressions:
                if expr != "*" and expr not in self.expressions:
                    self.expressions.append(expr)

    def spec(self):
        return dict(
            binners=[b.encode(None) for b in self.binners],
            agg=self.aggregation_description.encode(None),
            subs=[d.encode(None) for d in self.sub_descriptors],
            combine=self.combine_name,
            combine_args=self.combine_args,
        )


class TaskMapReduce(Task):
    """Custom per-chunk host map + reduce (reference: vaex/tasks.py:256).

    map(thread_zero_based_chunk_index, i1, i2, *chunk_arrays) -> value
    """

    name = "map_reduce"
    cacheable = False
    requires_fingerprint = False

    def __init__(self, df, expressions, map, reduce, info=False, to_numpy=True,
                 ignore_filter=False, selection=None, pre_filter=False, name="map_reduce",
                 skip_masked=False):
        super().__init__(df, expressions, name=name, pre_filter=pre_filter)
        self._map = map
        self._reduce = reduce
        self.info = info
        self.to_numpy = to_numpy
        self.ignore_filter = ignore_filter
        self.selection = selection
        self.skip_masked = skip_masked
        self.values = []

    def map(self, i1, i2, *blocks):
        if self.info:
            return self._map(None, i1, i2, *blocks)
        return self._map(*blocks)

    def reduce(self, values):
        return self._reduce(values) if self._reduce is not None else values

    def dependencies(self):
        from .expression import Expression
        deps = super().dependencies()
        if self.selection is not None:
            deps |= self.df._selection_dependencies(self.selection)
        if self.df.filtered and not self.ignore_filter:
            deps |= self.df._selection_dependencies("__filter__")
        return deps


class TaskHashmapUniqueCreate(Task):
    """Build the key table of unique values for an expression
    (reference: vaex/tasks.py:187 + cpu.py:286).  Executed host-side per
    chunk with incremental merge; the resulting table is shipped to the
    device as a sorted key array for ordinal mapping (SURVEY.md §2.2)."""

    name = "hash_map_unique"

    def __init__(self, df, expression, flatten=True, limit=None, limit_raise=True,
                 selection=None, return_inverse=False):
        super().__init__(df, [expression], name="hash_map_unique", pre_filter=df.filtered)
        self.expression = str(expression)
        self.flatten = flatten
        self.limit = limit
        self.limit_raise = limit_raise
        self.selection = selection
        self.return_inverse = return_inverse

    def dependencies(self):
        from .expression import Expression
        deps = super().dependencies()
        if self.selection is not None:
            deps |= self.df._selection_dependencies(self.selection)
        if self.df.filtered:
            deps |= self.df._selection_dependencies("__filter__")
        return deps

    def spec(self):
        return dict(expression=self.expression, limit=self.limit, selection=str(self.selection),
                    return_inverse=self.return_inverse)
