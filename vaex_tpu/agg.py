"""Aggregation descriptors: the public `vaex.agg.*` registry.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/agg.py:
declarative aggregations; compound ones are composed from primitives exactly
like the reference (mean = sum/count, agg.py:386; var/std from moment grids,
:422; skew/kurtosis from 3rd/4th moments, :461-520) so numerical semantics
match.  The primitive descriptors map onto the device AggOps in
ops/gridagg.py.
"""

from __future__ import annotations

import numpy as np

from . import array_types, utils
from .delayed import delayed
from .tasks import TaskAggregation

aggregates = {}


_BINS_JIT = {}


def _bins_structural(binner, values, invalid):
    """Module-level bin-kernel cache keyed by binner STRUCTURE: the
    data-derived minimum/limits pass as runtime args (gridagg to_bins
    dynamic args), so sparse-path queries on fresh datasets reuse the
    compiled kernels instead of re-jitting per binner instance — the same
    design as execution's dynamic limits."""
    import jax
    import jax.numpy as jnp
    from . import settings
    from .ops import gridagg
    has_mask = invalid is not None
    inv = None if invalid is None else jnp.asarray(invalid)
    if isinstance(binner, gridagg.BinnerOrdinal):
        skey = ("ord", binner.count, binner.allow_other, binner.invert,
                binner.assume_in_range, binner.in_range32(), has_mask,
                str(values.dtype))
        fn = _BINS_JIT.get(skey)
        if fn is None:
            # the first same-structure binner donates the trace; later
            # instances only differ in `minimum`, which arrives as an arg
            fn = jax.jit(lambda v, i, mn, _b=binner: _b.to_bins(v, i, minimum=mn))
            _BINS_JIT[skey] = fn
        return fn(jnp.asarray(values), inv, jnp.int64(binner.minimum))
    if isinstance(binner, gridagg.BinnerScalar):
        use_f64 = str(values.dtype) == "float64" or settings.compute.precision == "float64"
        skey = ("scal", binner.count, has_mask, str(values.dtype), use_f64)
        fn = _BINS_JIT.get(skey)
        if fn is None:
            fn = jax.jit(lambda v, i, lims, _b=binner: _b.to_bins(v, i, limits=lims))
            _BINS_JIT[skey] = fn
        return fn(jnp.asarray(values), inv,
                  jnp.asarray(np.array([binner.minimum, binner.maximum], np.float64)))
    return jax.jit(lambda v, i, _b=binner: _b.to_bins(v, i))(jnp.asarray(values), inv)


def register(f, name=None):
    name = name or f.__name__
    aggregates[name] = f
    return f


class AggregatorDescriptor:
    def __repr__(self):
        return f"vaex.agg.{self.short_name}({self.expression!r})"

    @property
    def expression(self):
        return self.expressions[0] if self.expressions else "*"

    def pretty_name(self, id, df):
        id = id or self.expression.replace("*", "star")
        return f"{id}_{self.short_name}"

    def encode(self, encoding):
        sel = self.selection
        return dict(aggregation=self.short_name,
                    expression=self.expressions,
                    selection=str(sel) if sel is not None and not isinstance(sel, bool) else sel,
                    edges=self.edges)

    def get_result_slicing(self, binners):
        """edges=False strips edge slots (reference: vaex/agg.py:323-335)."""
        if self.edges:
            return tuple(slice(None) for _ in binners)
        return tuple(b.edges_slice() for b in binners)


class AggregatorDescriptorBasic(AggregatorDescriptor):
    """One primitive grid op (reference: vaex/agg.py:222)."""

    def __init__(self, name, expressions, short_name, selection=None, edges=False, agg_args=None):
        self.name = name
        self.short_name = short_name
        self.expressions = [str(e) for e in expressions]
        self.selection = selection
        self.edges = edges
        self.agg_args = agg_args or {}

    def encode(self, encoding):
        spec = super().encode(encoding)
        if self.agg_args:
            spec.update(self.agg_args)
        return spec

    def _prepare_types(self, df):
        from .datatype import DataType
        if self.expression == "*":
            self.dtype_in = DataType(np.dtype("int64"))
            self.dtype_out = DataType(np.dtype("int64"))
            return
        self.dtype_in = df.data_type(self.expression)
        self.dtype_out = self.dtype_in
        if self.short_name == "count":
            self.dtype_out = DataType(np.dtype("int64"))
        if self.short_name in ("sum", "summoment"):
            self.dtype_out = self.dtype_in.upcast()

    def add_tasks(self, df, binners, progress=None):
        self._prepare_types(df)
        task = TaskAggregation(df, binners, self)
        task = df.executor.schedule(task)
        if progress is not None and progress is not False:
            from . import progress as progress_mod
            progress_mod.tree(progress).add_task(task, repr(self))

        @delayed
        def finish(value):
            return self.finish(value)

        return [task], finish(task)

    def finish(self, value):
        # temporal min/max/first/last computed as int64 ns on device — view
        # the result back as the source temporal dtype (reference returns
        # datetime64/timedelta64)
        if (self.short_name in ("min", "max", "first", "last")
                and getattr(self, "dtype_in", None) is not None
                and getattr(self.dtype_in, "is_temporal", False)):
            out = np.asarray(value)
            if out.dtype == np.int64:
                # device values are i64 nanoseconds; convert to the source unit
                ns_unit = "datetime64[ns]" if self.dtype_in.numpy.kind == "M" else "timedelta64[ns]"
                return out.view(ns_unit).astype(self.dtype_in.numpy)
        return value

class AggregatorDescriptorMulti(AggregatorDescriptor):
    """Compound aggregation built from several primitive passes
    (reference: vaex/agg.py:360)."""

    def __init__(self, name, expressions, short_name, selection=None, edges=False):
        self.name = name
        self.short_name = short_name
        self.expressions = [str(e) for e in expressions]
        self.selection = selection
        self.edges = edges

    def finish(self, value):
        return value


def _use_device_finalize(df, dtype=None):
    """Compound stats combine on device and fetch ONE grid when the executor
    supports it (VERDICT r2 next #3/#6: the constituent-grid D2H is the
    per-query fixed cost).  Temporal means keep the host path — their int64
    nanosecond sums don't survive a float32 result grid."""
    from . import settings
    if not settings.compute.device_finalize:
        return False
    if dtype is not None and dtype.is_temporal:
        return False
    if settings.compute.precision == "float64":
        import jax
        from .ops.gridagg import EXACT_LIMB_BACKENDS
        if jax.default_backend() in EXACT_LIMB_BACKENDS:
            # parity mode: sums live in exact integer limb states whose f64
            # reconstruction is host-only (device f64 is dd-emulated) — the
            # compound division happens on host at full IEEE f64
            return False
    return getattr(df.executor, "supports_device_finalize", False)


def _compound_out_dtype(dtype):
    """float32 results only where the engine's own bf16 hi/lo error (~2.8e-6
    relative, pallas_gridagg.py) already dominates the f32 rounding; int and
    f64 inputs keep f64 results like the host numpy division."""
    from . import settings
    if settings.compute.precision != "float64" and dtype.is_float and dtype.numpy.itemsize <= 4:
        return "float32"
    return "float64"


def _add_compound_task(df, binners, desc, sub_descs, combine_name, combine_args, progress):
    from .tasks import TaskAggregationCompound
    for sub in sub_descs:
        sub._prepare_types(df)
    task = TaskAggregationCompound(df, binners, desc, sub_descs, combine_name, combine_args)
    task = df.executor.schedule(task)
    if progress is not None and progress is not False:
        from . import progress as progress_mod
        progress_mod.tree(progress).add_task(task, repr(desc))
    return task


class AggregatorDescriptorMean(AggregatorDescriptorMulti):
    """Reference: vaex/agg.py:386."""

    def add_tasks(self, df, binners, progress=None):
        expression = df[str(self.expressions[0])]
        dtype = expression.data_type()
        if dtype.is_temporal:
            sum_expr = expression.astype("int64")
        elif dtype.is_bool:
            sum_expr = expression.astype("int64")
        else:
            sum_expr = expression
        self._out_dtype = dtype
        if _use_device_finalize(df, dtype):
            sum_agg = sum(sum_expr, selection=self.selection, edges=self.edges)
            count_agg = count(expression, selection=self.selection, edges=self.edges)
            task = _add_compound_task(
                df, binners, self, [sum_agg, count_agg], "mean",
                dict(out=_compound_out_dtype(dtype)), progress)

            @delayed
            def finish_device(mean):
                if array_types.is_jax_array(mean):
                    return self.finish(mean)  # keep_device: stays in HBM
                return self.finish(np.array(mean))

            return [task], finish_device(task)
        sum_agg = sum(sum_expr, selection=self.selection, edges=self.edges)
        count_agg = count(expression, selection=self.selection, edges=self.edges)
        tasks_sum, result_sum = sum_agg.add_tasks(df, binners, progress)
        tasks_count, result_count = count_agg.add_tasks(df, binners, progress)

        @delayed
        def finish(sum_value, count_value):
            sum_value = np.array(sum_value)
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = sum_value / count_value
            if self._out_dtype.is_temporal:
                mean = mean.astype(self._out_dtype.numpy)
            return self.finish(mean)

        return tasks_sum + tasks_count, finish(result_sum, result_count)


def _moment_pivot(df, expression):
    """Sampled pivot for shifted-moment computation: var/skew/kurtosis are
    shift-invariant, and centering the values before Σx^k avoids the
    catastrophic cancellation of raw moments (critical under
    precision='mixed' where per-chunk partials are f32)."""
    try:
        n = min(4096, df._length_unfiltered)
        sample = df.evaluate(str(expression), 0, n, filtered=False)
        values = np.asarray(sample, dtype=np.float64)
        if np.ma.isMaskedArray(sample):
            values = sample.compressed().astype(np.float64)
        pivot = float(np.nanmean(values)) if len(values) else 0.0
        if not np.isfinite(pivot):
            return 0.0
        return pivot
    except Exception:  # noqa: BLE001
        return 0.0


class AggregatorDescriptorVar(AggregatorDescriptorMulti):
    """Reference: vaex/agg.py:422 (population variance, ddof applied by
    frontend only in the scalar API like the reference).  Moments are
    computed on pivot-shifted values for numerical stability (shift
    invariance of the variance)."""

    def __init__(self, name, expressions, short_name="var", ddof=0, selection=None, edges=False):
        super().__init__(name, expressions, short_name, selection=selection, edges=edges)
        self.ddof = ddof

    def add_tasks(self, df, binners, progress=None):
        from . import settings
        pivot = _moment_pivot(df, self.expressions[0])
        expression = df[f"(({self.expressions[0]}) - {pivot!r})"]
        in_dtype = df.data_type(self.expressions[0])
        if settings.compute.precision == "float64" or in_dtype.is_integer                 or in_dtype.is_bool:
            expression = expression.astype("float64")
        sum_moment = _sum_moment(str(expression), 2, selection=self.selection, edges=self.edges)
        sum_ = sum(str(expression), selection=self.selection, edges=self.edges)
        count_ = count(str(expression), selection=self.selection, edges=self.edges)
        if _use_device_finalize(df, in_dtype):
            task = _add_compound_task(
                df, binners, self, [sum_moment, sum_, count_],
                "std" if isinstance(self, AggregatorDescriptorStd) else "var",
                dict(out=_compound_out_dtype(in_dtype), ddof=self.ddof), progress)

            @delayed
            def finish_device(grid):
                # sqrt/var already applied on device; self.finish is identity
                # for var and sqrt for std (also applied on device) — so pass
                # the grid through as-is
                if array_types.is_jax_array(grid):
                    return grid  # keep_device: stays in HBM
                return np.array(grid)

            return [task], finish_device(task)
        t1, r1 = sum_moment.add_tasks(df, binners, progress)
        t2, r2 = sum_.add_tasks(df, binners, progress)
        t3, r3 = count_.add_tasks(df, binners, progress)

        @delayed
        def finish(sum_moment_v, sum_v, count_v):
            sum_v = np.array(sum_v)
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = sum_v / count_v
                raw2 = sum_moment_v / count_v
                variance = raw2 - mean**2
                if self.ddof:
                    variance = variance * (count_v / (count_v - self.ddof))
            return self.finish(variance)

        return t1 + t2 + t3, finish(r1, r2, r3)


class AggregatorDescriptorStd(AggregatorDescriptorVar):
    def finish(self, value):
        return value**0.5


class AggregatorDescriptorSkew(AggregatorDescriptorMulti):
    """Reference: vaex/agg.py:461."""

    def add_tasks(self, df, binners, progress=None):
        from . import settings
        pivot = _moment_pivot(df, self.expressions[0])
        expression = df[f"(({self.expressions[0]}) - {pivot!r})"]
        if settings.compute.precision == "float64" or not df.data_type(self.expressions[0]).is_float:
            expression = expression.astype("float64")
        aggs = [_sum_moment(str(expression), k, selection=self.selection, edges=self.edges) for k in (1, 2, 3)]
        aggs.append(count(str(expression), selection=self.selection, edges=self.edges))
        tasks, results = [], []
        for a in aggs:
            t, r = a.add_tasks(df, binners, progress)
            tasks += t
            results.append(r)

        @delayed
        def finish(m1s, m2s, m3s, counts):
            with np.errstate(divide="ignore", invalid="ignore"):
                m1 = m1s / counts
                m2 = m2s / counts
                m3 = m3s / counts
                skew = (m3 - 3 * m1 * m2 + 2 * m1**3) / (m2 - m1**2) ** (3 / 2)
            return skew

        return tasks, finish(*results)


class AggregatorDescriptorKurtosis(AggregatorDescriptorMulti):
    """Reference: vaex/agg.py:491."""

    def add_tasks(self, df, binners, progress=None):
        from . import settings
        pivot = _moment_pivot(df, self.expressions[0])
        expression = df[f"(({self.expressions[0]}) - {pivot!r})"]
        if settings.compute.precision == "float64" or not df.data_type(self.expressions[0]).is_float:
            expression = expression.astype("float64")
        aggs = [_sum_moment(str(expression), k, selection=self.selection, edges=self.edges) for k in (1, 2, 3, 4)]
        aggs.append(count(str(expression), selection=self.selection, edges=self.edges))
        tasks, results = [], []
        for a in aggs:
            t, r = a.add_tasks(df, binners, progress)
            tasks += t
            results.append(r)

        @delayed
        def finish(m1s, m2s, m3s, m4s, counts):
            with np.errstate(divide="ignore", invalid="ignore"):
                m1 = m1s / counts
                m2 = m2s / counts
                m3 = m3s / counts
                m4 = m4s / counts
                kurt = (m4 - 4 * m1 * m3 + 6 * m1**2 * m2 - 3 * m1**4) / (m2 - m1**2) ** 2 - 3.0
            return kurt

        return tasks, finish(*results)


def descriptor_device_ok(df, desc):
    """True when this descriptor's grids can be fulfilled as device-resident
    jax arrays (keep_device): numeric non-temporal inputs, device finalize
    available, and no host-side decode step (f64 minmax keys on TPU)."""
    import jax
    short = getattr(desc, "short_name", None)
    if short not in ("count", "sum", "summoment", "mean", "std", "var",
                     "min", "max", "first", "last"):
        return False
    if not _use_device_finalize(df):
        return False
    exprs = [e for e in getattr(desc, "expressions", []) if e != "*"]
    for e in exprs:
        try:
            dt = df.data_type(e)
        except Exception:  # noqa: BLE001
            return False
        if not dt.is_numeric or dt.is_temporal:
            return False
        if (short in ("min", "max") and dt.numpy == np.dtype("float64")
                and jax.default_backend() == "tpu"):
            return False  # order-preserving i64 keys decode host-side
    return True


def presence_tasks(df, binners, progress=None, keep_device=False):
    """Delayed presence grid (count > 0 per cell, full edge layout) fetched
    as a device-packed BITMAP — C/8 bytes instead of a count grid (the
    empty-group mask is the groupby's second-largest fetch at high
    cardinality).  Falls back to a plain count when the executor lacks
    device finalize."""
    if not _use_device_finalize(df):
        tasks, result = count(edges=True).add_tasks(df, binners, progress)

        @delayed
        def finish_counts(counts):
            return np.asarray(counts) > 0

        return finish_counts(result)
    from .tasks import TaskAggregationCompound
    count_desc = count(edges=True)
    count_desc._prepare_types(df)
    desc = AggregatorDescriptorBasic("AggPresence", [], "presence", edges=True)
    task = TaskAggregationCompound(df, binners, desc, [count_desc],
                                   "presence_bits", dict(raw=True))
    if keep_device:
        task.keep_device = True
    task = df.executor.schedule(task)
    if progress is not None and progress is not False:
        from . import progress as progress_mod
        progress_mod.tree(progress).add_task(task, "presence")
    shape = tuple(b.shape for b in binners)

    @delayed
    def finish(packed):
        n = int(np.prod(shape)) if shape else 1
        if array_types.is_jax_array(packed):
            # keep_device: unpack the bitmap on device (little-endian), so
            # the presence mask feeds device compaction with zero D2H
            import jax.numpy as jnp
            bits = (packed[:, None] >> jnp.arange(8, dtype=jnp.uint8)) & jnp.uint8(1)
            grid = bits.reshape(-1)[:n].astype(bool)
            return grid.reshape(shape) if shape else grid[0]
        bits = np.unpackbits(np.asarray(packed, dtype=np.uint8), bitorder="little")
        grid = bits[:n].astype(bool)
        return grid.reshape(shape) if shape else grid[0]

    return finish(task)


# dense nunique presence grids beyond this many (cells x values) entries
# switch to the sparse pair-set fallback (exact at any cardinality)
NUNIQUE_DENSE_CELL_LIMIT = 200_000_000


class AggregatorDescriptorNUnique(AggregatorDescriptorBasic):
    """Reference: vaex/agg.py:338 (C++ per-cell hashmaps, agg_nunique.cpp).

    TPU formulation: dictionary-encode the values (key-table pass), add the
    value ordinal as an extra grid axis, count presence, and reduce
    `(count > 0).sum()` over that axis — per-cell sets become one dense grid
    (SURVEY.md §2.2 'sort/segment or per-cell Bloom' plan, exact variant)."""

    def __init__(self, name, expression, short_name, dropmissing=False, dropnan=False, selection=None, edges=False):
        super().__init__(name, [expression], short_name, selection=selection, edges=edges,
                         agg_args=dict(dropmissing=dropmissing, dropnan=dropnan))
        self.dropmissing = dropmissing
        self.dropnan = dropnan

    def _prepare_types(self, df):
        from .datatype import DataType
        super()._prepare_types(df)
        self.dtype_out = DataType(np.dtype("int64"))

    def add_tasks(self, df, binners, progress=None):
        from .ops.gridagg import BinnerOrdinal
        expr = self.expressions[0]
        hashmap = df._hash_map_unique(expr)
        n_values = hashmap.count if hashmap.count > 0 else 1  # nb: `max` is the agg factory here
        cells = int(np.prod([b.shape for b in binners])) if binners else 1
        if cells * (n_values + 2) > NUNIQUE_DENSE_CELL_LIMIT:
            # dense presence grid would not fit: exact sparse fallback over
            # distinct (cell, value) PAIRS — memory proportional to actual
            # uniques like the reference's per-cell hashmaps
            # (agg_nunique.cpp:8-75), not to cells x values
            return self._add_tasks_pairs(df, binners, hashmap, n_values, progress)
        var = df.add_variable("hashmap_", hashmap, unique=True)
        value_binner = BinnerOrdinal(f"_ordinal_values({expr}, {var})", n_values)
        inner = count(expr, selection=self.selection, edges=True)
        tasks, result = inner.add_tasks(df, tuple(binners) + (value_binner,), progress)
        dropmissing, dropnan = self.dropmissing, self.dropnan
        edges = self.edges

        @delayed
        def finish(grid):
            grid = np.asarray(grid)
            # last axis layout: [value0..valueN-1, null, nan]; null/nan of the
            # *values* land inside the first N slots via their hashmap codes
            present = grid > 0
            keep = np.ones(grid.shape[-1], dtype=bool)
            keep[-2:] = False  # ordinal null/nan edge slots (codes < N cover them)
            if dropmissing and hashmap.has_null:
                keep[hashmap.null_index] = False
            if dropnan and hashmap.has_nan:
                keep[hashmap.nan_index] = False
            nunique = present[..., keep].sum(axis=-1).astype(np.int64)
            if binners and not edges:
                slices = tuple(b.edges_slice() for b in binners)
                nunique = nunique[slices]
            if not binners:
                nunique = nunique.reshape(())
            return nunique

        return tasks, finish(result)

    def _add_tasks_pairs(self, df, binners, hashmap, n_values, progress=None):
        """Sparse exact nunique: per chunk, dedupe combo keys
        ``cell * M + value_code`` and union them into a native ordered set —
        memory = O(distinct pairs), any cardinality (VERDICT r2 next #5)."""
        from .ops.gridagg import BinnerOrdinal, flat_index
        from .tasks import TaskMapReduce
        from . import native as native_mod

        expr = self.expressions[0]
        var = df.add_variable("hashmap_", hashmap, unique=True)
        ordinal_expr = f"_ordinal_values({expr}, {var})"
        value_binner = BinnerOrdinal(ordinal_expr, n_values)
        M = value_binner.shape  # n_values + null/nan slots
        binners = tuple(binners)
        cells = int(np.prod([b.shape for b in binners])) if binners else 1
        strides = np.ones(len(binners), dtype=np.int64)
        for i in range(len(binners) - 2, -1, -1):
            strides[i] = strides[i + 1] * binners[i + 1].shape

        oset = native_mod.NativeOrderedSet.create(np.int64)
        chunks_pairs = []  # python fallback when the extension is unbuilt

        _bins_jit = {}

        def _bins_of(binner, block):
            # bin under jit so the f32 edge arithmetic compiles (and fma-
            # contracts) exactly like the aggregation pass — eager op-by-op
            # rounding can put edge-straddling rows in the adjacent bin
            from . import array_types as at
            import jax
            import jax.numpy as jnp
            values, valid = at.extract_mask(at.to_numpy(block))
            invalid = None if valid is None else ~np.asarray(valid)
            values = np.asarray(values)
            from . import settings
            if settings.compute.dynamic_limits:
                return np.asarray(_bins_structural(binner, values, invalid))
            key = (binner, invalid is not None)
            fn = _bins_jit.get(key)
            if fn is None:
                fn = jax.jit(lambda v, inv: binner.to_bins(v, inv))
                _bins_jit[key] = fn
            return np.asarray(fn(jnp.asarray(values),
                                 None if invalid is None else jnp.asarray(invalid)))

        def map_chunk(*blocks):
            vblock = blocks[-1]
            vbin = _bins_of(value_binner, vblock).astype(np.int64)
            combo = vbin
            for binner, block, stride in zip(binners, blocks[:-1], strides):
                combo = combo + _bins_of(binner, block).astype(np.int64) * (int(stride) * M)
            # mirror the dense path's AggOpCount semantics: rows whose VALUE
            # is missing/nan never reach the presence grid
            drop = vbin >= n_values  # binner oor/nan slots
            if hashmap.has_nan:
                drop |= vbin == hashmap.nan_index
            if hashmap.has_null:
                drop |= vbin == hashmap.null_index
            combo = combo[~drop]
            uniq = np.unique(combo)
            if oset is not None:
                oset.update(uniq)
            else:
                chunks_pairs.append(uniq)
            return None

        def reduce_chunks(values):
            if oset is not None:
                return oset.keys()
            if not chunks_pairs:
                return np.zeros(0, np.int64)
            return np.unique(np.concatenate(chunks_pairs))

        exprs = [b.expression for b in binners] + [ordinal_expr]
        task = TaskMapReduce(df, exprs, map_chunk, reduce_chunks,
                             selection=self.selection if self.selection not in (None, False) else None,
                             pre_filter=df.filtered, name="nunique_pairs")
        task = df.executor.schedule(task)
        if progress is not None and progress is not False:
            from . import progress as progress_mod
            progress_mod.tree(progress).add_task(task, repr(self))
        edges = self.edges

        @delayed
        def finish(pairs):
            pairs = np.asarray(pairs, dtype=np.int64)
            cell_of = pairs // M
            counts = np.bincount(cell_of, minlength=cells).astype(np.int64)
            grid = counts.reshape(tuple(b.shape for b in binners)) if binners else counts
            if binners and not edges:
                grid = grid[tuple(b.edges_slice() for b in binners)]
            if not binners:
                grid = grid.reshape(())[()]
            return grid

        return [task], finish(task)


# -- expression-rewrite aggregations (reference: vaex/agg.py:77-221) --------

class AggregatorDescriptorExpressionRewrite(AggregatorDescriptor):
    """Rewrites the input expression and delegates to an inner descriptor."""

    def __init__(self, short_name, expression, rewrite, inner_factory, selection=None, edges=False):
        self.short_name = short_name
        self.expressions = [str(expression)]
        self.selection = selection
        self.edges = edges
        self._rewrite = rewrite
        self._inner_factory = inner_factory

    def add_tasks(self, df, binners, progress=None):
        rewritten = self._rewrite(str(self.expressions[0]))
        inner = self._inner_factory(rewritten, selection=self.selection, edges=self.edges)
        return inner.add_tasks(df, binners, progress)


@register
def count(expression="*", selection=None, edges=False):
    """Count of non-missing values, or rows for '*' (reference: agg.py:527)."""
    return AggregatorDescriptorBasic("AggCount", [expression], "count", selection=selection, edges=edges)


@register
def sum(expression, selection=None, edges=False):
    return AggregatorDescriptorBasic("AggSum", [expression], "sum", selection=selection, edges=edges)


def _sum_moment(expression, moment, selection=None, edges=False):
    return AggregatorDescriptorBasic("AggSumMoment", [expression], "summoment",
                                     selection=selection, edges=edges, agg_args=dict(moment=moment))


@register
def mean(expression, selection=None, edges=False):
    return AggregatorDescriptorMean("mean", [expression], "mean", selection=selection, edges=edges)


@register
def min(expression, selection=None, edges=False):
    return AggregatorDescriptorBasic("AggMin", [expression], "min", selection=selection, edges=edges)


@register
def max(expression, selection=None, edges=False):
    return AggregatorDescriptorBasic("AggMax", [expression], "max", selection=selection, edges=edges)


@register
def var(expression, ddof=0, selection=None, edges=False):
    return AggregatorDescriptorVar("var", [expression], "var", ddof=ddof, selection=selection, edges=edges)


@register
def std(expression, ddof=0, selection=None, edges=False):
    return AggregatorDescriptorStd("std", [expression], "std", ddof=ddof, selection=selection, edges=edges)


@register
def skew(expression, selection=None, edges=False):
    return AggregatorDescriptorSkew("skew", [expression], "skew", selection=selection, edges=edges)


@register
def kurtosis(expression, selection=None, edges=False):
    return AggregatorDescriptorKurtosis("kurtosis", [expression], "kurtosis", selection=selection, edges=edges)


@register
def first(expression, order_expression=None, selection=None, edges=False):
    """Value of `expression` at the minimum of `order_expression`
    (reference: agg.py first)."""
    exprs = [expression] if order_expression is None else [expression, order_expression]
    return AggregatorDescriptorBasic("AggFirst", exprs, "first", selection=selection, edges=edges)


@register
def last(expression, order_expression=None, selection=None, edges=False):
    exprs = [expression] if order_expression is None else [expression, order_expression]
    return AggregatorDescriptorBasic("AggLast", exprs, "last", selection=selection, edges=edges)


@register
def nunique(expression, dropna=False, dropnan=False, dropmissing=False, selection=None, edges=False):
    if dropna:
        dropnan = dropmissing = True
    return AggregatorDescriptorNUnique("AggNUnique", expression, "nunique",
                                       dropmissing=dropmissing, dropnan=dropnan,
                                       selection=selection, edges=edges)


class AggregatorDescriptorList(AggregatorDescriptor):
    """vaex.agg.list: collect per-cell value lists (reference: agg.py AggList
    / src/agg_list.cpp).  Values are gathered host-side per chunk (variable-
    length output cannot live on the device) keyed by the same device-computed
    cell indices, then split into lists."""

    def __init__(self, expression, selection=None, edges=False):
        self.short_name = "list"
        self.expressions = [str(expression)]
        self.selection = selection
        self.edges = edges

    def add_tasks(self, df, binners, progress=None):
        from .tasks import TaskMapReduce
        from .ops.gridagg import flat_index, grid_shape
        import jax.numpy as jnp

        binners = tuple(binners)
        expr = self.expressions[0]
        shape = grid_shape(binners)
        ncells = int(np.prod(shape)) if shape else 1

        def map_chunk(info, i1, i2, *blocks):
            value_block = blocks[-1]
            bin_blocks = blocks[:-1]
            if binners:
                bins = [np.asarray(b.to_bins(jnp.asarray(np.asarray(bb)), None))
                        for b, bb in zip(binners, bin_blocks)]
                flat = np.asarray(flat_index(binners, [jnp.asarray(b) for b in bins]))
            else:
                flat = np.zeros(len(value_block), dtype=np.int64)
            return flat, np.asarray(value_block)

        def reduce_parts(parts):
            flats = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
            values = np.concatenate([p[1] for p in parts]) if parts else np.empty(0)
            order = np.argsort(flats, kind="stable")
            flats, values = flats[order], values[order]
            starts = np.searchsorted(flats, np.arange(ncells))
            ends = np.searchsorted(flats, np.arange(ncells), side="right")
            out = np.empty(ncells, dtype=object)
            for c in range(ncells):
                out[c] = values[starts[c]:ends[c]].tolist()
            grid = out.reshape(shape) if shape else out[0]
            if shape and not self.edges:
                grid = grid[tuple(b.edges_slice() for b in binners)]
            return grid

        exprs = [b.expression for b in binners] + [expr]
        task = TaskMapReduce(df, exprs, map_chunk, reduce_parts, info=True,
                             selection=self.selection if self.selection not in (None, False) else None,
                             pre_filter=df.filtered, name="agg-list")
        task = df.executor.schedule(task)

        @delayed
        def finish(value):
            return value

        return [task], finish(task)


@register
def list(expression, selection=None, edges=False):
    """Collect values per cell into python lists (reference: agg.py list)."""
    return AggregatorDescriptorList(expression, selection=selection, edges=edges)


aggregates["list_"] = aggregates["list"]
list_ = aggregates["list"]


@register
def any(expression=None, selection=None, edges=False):
    """True when any value (or any selected row) falls in the cell
    (reference: agg.py any)."""
    if expression is None:
        inner = count("*", selection=selection, edges=edges)
    else:
        inner = sum(f"_astype(({expression}) != 0, 'int64')", selection=selection, edges=edges)
    return _FinishWrap(inner, lambda grid: np.asarray(grid) > 0, "any")


@register
def all(expression=None, selection=None, edges=False):
    if expression is None:
        total = count("*", edges=edges)
        selected = count("*", selection=selection, edges=edges)
        return _TwoGridFinish(total, selected, lambda t, s: (t == s) & (t > 0), "all")
    total = count(expression, selection=selection, edges=edges)
    true_count = sum(f"_astype(({expression}) != 0, 'int64')", selection=selection, edges=edges)
    return _TwoGridFinish(total, true_count, lambda t, s: (t == s) & (t > 0), "all")


class _FinishWrap(AggregatorDescriptor):
    def __init__(self, inner, post, short_name):
        self.inner = inner
        self.post = post
        self.short_name = short_name
        self.expressions = inner.expressions
        self.selection = inner.selection
        self.edges = inner.edges

    def add_tasks(self, df, binners, progress=None):
        tasks, result = self.inner.add_tasks(df, binners, progress)

        @delayed
        def finish(value):
            return self.post(value)

        return tasks, finish(result)


class _TwoGridFinish(AggregatorDescriptor):
    def __init__(self, a, b, post, short_name):
        self.a, self.b, self.post = a, b, post
        self.short_name = short_name
        self.expressions = a.expressions
        self.selection = b.selection
        self.edges = a.edges

    def add_tasks(self, df, binners, progress=None):
        t1, r1 = self.a.add_tasks(df, binners, progress)
        t2, r2 = self.b.add_tasks(df, binners, progress)

        @delayed
        def finish(v1, v2):
            return self.post(np.asarray(v1), np.asarray(v2))

        return t1 + t2, finish(r1, r2)


def _agg_from_spec(spec, df=None):
    """'sum' / vaex.agg descriptor / ('sum', expr) → descriptor
    (reference: groupby agg spec parsing)."""
    return spec


_pylist = __builtins__["list"] if isinstance(__builtins__, dict) else __builtins__.list


def decode(encoding, spec):
    spec = dict(spec)
    name = spec.pop("aggregation")
    expressions = spec.pop("expression")
    selection = spec.pop("selection", None)
    edges = spec.pop("edges", False)
    factory = aggregates[name if name != "summoment" else "sum"]
    if name == "summoment":
        return _sum_moment(expressions[0], spec.get("moment", 2), selection=selection, edges=edges)
    if name == "count":
        return factory(expressions[0] if expressions else "*", selection=selection, edges=edges)
    args = [expressions[0]] if isinstance(expressions, (_pylist, tuple)) else [expressions]
    return factory(*args, selection=selection, edges=edges)
