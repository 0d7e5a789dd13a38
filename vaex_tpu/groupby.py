"""GroupBy / BinBy: SQL-like aggregation on binned grids.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/groupby.py
(Grouper:226, GrouperCategory:398, BinnerInteger:147, GrouperCombined:330,
GroupBy.agg:878, BinBy.agg:836): group keys are discovered with a key-table
pass (hash.py), values map to ordinal codes on the device via sorted-table
binary search (`_ordinal_values`), and every aggregation runs on a
BinnerOrdinal grid with edges — exactly the `_EXPERIMENTAL_BINNER_HASH`
evolution the reference was heading toward (SURVEY.md §2.2 note).

Multi-key grids use the dense cartesian product when the cell count is
modest, else keys are combined into one int64 expression
(Σ code_i × multiplier_i) and re-grouped sparsely — the reference `_combine`
path (groupby.py:526)."""

from __future__ import annotations

import collections.abc
from functools import reduce

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

from . import agg as agg_mod
from . import dataset as dataset_mod
from . import array_types, expresso, settings, utils
from .delayed import delayed, delayed_list
from .ops.gridagg import BinnerOrdinal

_COMBINE_CELL_LIMIT = 2**24


def _str(e):
    from .expression import Expression
    return e.expression if isinstance(e, Expression) else str(e)


class BinnerBase:
    # output label names of requested keys that ALIAS this grouper's
    # expression (virtual-column aliases like h2o q10's id2/id4/id5 = id1):
    # the result emits one label column per alias from the shared grouper
    alias_labels = ()

    def supports_device_labels(self):
        """True when this grouper's bin labels can be produced as a device
        array (numeric keys, plain-slice extract_center) — enables the
        device-resident groupby result frame (settings.compute.device_result)."""
        bv = getattr(self, "bin_values", None)
        ok = (isinstance(bv, np.ndarray) and not np.ma.isMaskedArray(bv)
              and bv.dtype.kind in "iuf")
        if ok and bv.dtype == np.float64:
            # TPU stores f64 as an f32-pair (double-double, ~2^-49 relative):
            # the H2D transfer of f64 LABELS is lossy, and group keys must
            # round-trip bit-exactly (found by the round-5 full-suite TPU
            # run: misc_test.py::test_dynamic_hashmap_tables_program_reuse)
            import jax
            ok = jax.default_backend() != "tpu"
        return ok

    def device_labels(self):
        import jax.numpy as jnp
        return jnp.asarray(self.bin_values)

    def labels_take_device(self, indices):
        import jax.numpy as jnp
        return jnp.take(jnp.asarray(self.bin_values), indices)


class Grouper(BinnerBase):
    """Hashmap-discovered groups (reference: groupby.py:226)."""

    def __init__(self, df, expression, sort=False, ascending=True, row_limit=None, hashmap=None):
        self.df = df
        self.expression = _str(expression)
        self.label = self.expression
        if hashmap is None:
            hashmap = df._hash_map_unique(self.expression, limit=row_limit)
        if sort:
            hashmap = hashmap.sorted(ascending=ascending)
        self.hashmap = hashmap
        self.N = hashmap.count
        self.bin_values = hashmap.keys()
        self.dense = False
        self.sort_indices = None

    def create_binner(self, df):
        self.var_name = df.add_variable("hashmap_", self.hashmap, unique=True)
        self.binby_expression = f"_ordinal_values({self.expression}, {self.var_name})"
        count = max(self.N, 1)
        from . import settings
        if settings.compute.dynamic_limits:
            # bucket the cell count like GrouperIntRange: with the key table
            # a runtime input (execution dynamic tables), any group count in
            # the same power-of-two bucket reuses ONE compiled pass across
            # datasets.  extract_center slices back to the real N, so the
            # padded tail never reaches results.
            count = max(64, 1 << (count - 1).bit_length())
        self.binner = BinnerOrdinal(self.binby_expression, count)

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(0, max(self.N, 1) if self.N else 1)
        out = ar[tuple(slices)]
        if self.N == 0:
            slices[dim] = slice(0, 0)
            out = ar[tuple(slices)]
        return out

    def labels_take(self, indices):
        return _take_labels(self.bin_values, indices)


class GrouperCategory(BinnerBase):
    """Categorical fast path: no discovery pass (reference: groupby.py:398)."""

    def __init__(self, df, expression, sort=False, ascending=True, row_limit=None):
        self.df = df
        self.expression = _str(expression)
        self.label = self.expression
        labels = df.category_labels(self.expression)
        self.min_value = df.category_offset(self.expression)
        self.N = df.category_count(self.expression)
        if row_limit is not None and self.N > row_limit:
            from . import RowLimitException
            raise RowLimitException(f"number of unique values {self.N} exceeds row_limit {row_limit}")
        self.sort_indices = None
        if sort:
            order = np.argsort(np.asarray(labels, dtype=object), kind="stable")
            if not ascending:
                order = order[::-1]
            self._order = order
            labels = [labels[i] for i in order]
            # remap: code -> position after sort
            self._remap = np.empty(self.N, dtype=np.int64)
            self._remap[order] = np.arange(self.N)
        else:
            self._order = None
        self.bin_values = _labels_array(labels)
        self.dense = True

    def create_binner(self, df):
        expr = self.expression
        if df.is_category(expr) and df.data_type(expr).is_dictionary:
            expr = f"index_values({expr})"
        self.binby_expression = expr
        self.binner = BinnerOrdinal(self.binby_expression, self.N, self.min_value)

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(0, self.N)
        out = ar[tuple(slices)]
        if self._order is not None:
            # bins are in storage code order; reorder to sorted labels
            out = np.take(out, self._order, axis=dim)
        return out

    def labels_take(self, indices):
        return _take_labels(self.bin_values, indices)

    def supports_device_labels(self):
        # sorted categories reorder bins host-side in extract_center
        return self._order is None and super().supports_device_labels()


class BinnerInteger(BinnerBase):
    """Small-int fast path for uint8/int8/bool (reference: groupby.py:147)."""

    def __init__(self, df, expression, sort=False, ascending=True, row_limit=None):
        self.df = df
        self.expression = _str(expression)
        self.label = self.expression
        dtype = df.data_type(self.expression)
        if dtype.numpy == np.dtype(bool):
            self.min_value, self.N = 0, 2
            self.bin_values = np.array([False, True])
        elif dtype.numpy == np.dtype("uint8"):
            self.min_value, self.N = 0, 256
            self.bin_values = np.arange(256, dtype=np.uint8)
        else:  # int8
            self.min_value, self.N = -128, 256
            self.bin_values = np.arange(-128, 128, dtype=np.int8)
        self.dense = False  # mask empty bins like the sparse path
        self.sort_indices = None

    def create_binner(self, df):
        expr = self.expression
        dtype = self.df.data_type(self.expression)
        if dtype.numpy == np.dtype(bool):
            expr = f"_astype({self.expression}, 'uint8')"
        self.binby_expression = expr
        self.binner = BinnerOrdinal(expr, self.N, self.min_value)

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(0, self.N)
        return ar[tuple(slices)]

    def labels_take(self, indices):
        return _take_labels(self.bin_values, indices)


class GrouperIntRange(BinnerBase):
    """Integer-range fast path: keys bin by offset — no hashmap build, no
    per-row ordinal mapping.

    TPU-first design (no direct reference equivalent; the reference's C++
    hashmap probe is cheap, ours is a device binary search at ~27M rows/s for
    1M keys): when an integer key column's (max - min + 1) fits
    ``settings.compute.groupby_int_range_cells``, the group code is just
    ``value - min`` and the discovery pass shrinks to a minmax.  Empty bins
    are dropped after aggregation exactly like the sparse hashmap path, so
    results match ``Grouper`` (reference groupby.py:226) up to group order.
    """

    def __init__(self, df, expression, vmin, vmax, sort=False, ascending=True):
        self.df = df
        self.expression = _str(expression)
        self.label = self.expression
        self.min_value = int(vmin)
        self.N = int(vmax) - int(vmin) + 1
        from . import settings
        if settings.compute.dynamic_limits:
            # round the cell count up to a power-of-two bucket: with the
            # ordinal minimum a runtime arg (execution._binner_slots), every
            # int-range groupby whose span lands in the same bucket reuses
            # ONE compiled pass across datasets (a fresh span otherwise pays
            # a remote XLA recompile).  The padded tail bins are empty and
            # drop with the other empties; memory cost is <2x on grids that
            # are ~4 bytes/cell.
            self.N = max(64, 1 << (self.N - 1).bit_length())
        self._bin_values = None
        self.dense = False  # empty bins are masked out after aggregation
        self.sort_indices = None

    @property
    def bin_values(self):
        if self._bin_values is None:
            self._bin_values = np.arange(
                self.min_value, self.min_value + self.N, dtype=np.int64)
        return self._bin_values

    def create_binner(self, df):
        self.binby_expression = self.expression
        # bounds come from the data's own minmax, so every unmasked value is
        # in range: 64-bit keys may bin with a plain i32 narrowing convert
        self.binner = BinnerOrdinal(self.expression, self.N, self.min_value,
                                    assume_in_range=True)

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(0, self.N)
        return ar[tuple(slices)]

    def labels_take(self, indices):
        # labels ARE the key values: bin i ↔ key (min + i), no table needed
        return np.asarray(indices, dtype=np.int64) + self.min_value

    def supports_device_labels(self):
        return True

    def device_labels(self):
        import jax.numpy as jnp
        return jnp.arange(self.min_value, self.min_value + self.N, dtype=jnp.int64)

    def labels_take_device(self, indices):
        import jax.numpy as jnp
        return indices.astype(jnp.int64) + self.min_value


def _int_range_candidate(df, expr, row_limit):
    """Plain non-nullable integer columns are eligible for GrouperIntRange
    (sorting is natural ascending; nullable/virtual keys need the hashmap)."""
    if row_limit is not None:
        return False
    try:
        dtype = df.data_type(expr)
    except Exception:  # noqa: BLE001
        return False
    if dtype.is_string or not dtype.is_numeric:
        return False
    np_dtype = dtype.numpy
    if np_dtype.kind not in "iu" or np_dtype.itemsize < 2:
        return False
    if expr not in df.dataset:
        # virtual integer expressions (h2o's `df['id6'] = df['id3']` aliasing
        # is the canonical case): mask propagation is input-only for
        # arithmetic, so the column is non-nullable iff every leaf dataset
        # column is — except for the few functions that synthesize missing
        # values from clean inputs
        from .expression import Expression
        e = Expression(df, expr)
        expanded = e.expand().expression
        blocked = {"_map", "map", "hashmap_apply", "_ordinal_values", "_choose"}
        if blocked & set(expresso.names(expanded)):
            return False
        for dep in e.root_columns():
            if not _int_range_candidate_column(df.dataset[dep]):
                return False
        return True
    col = df.dataset[expr]
    return _int_range_candidate_column(col)


def _int_range_candidate_column(col):
    if array_types.is_jax_array(col):
        # device columns carry no missing mask by construction — without
        # this, a device-frame high-card groupby silently fell back to the
        # host hashmap build and paid a full-column D2H (measured 12.9s vs
        # 0.58s at 16.7M rows / 1M keys over the tunnel)
        return True
    if hasattr(col, "to_numpy") and not isinstance(col, np.ndarray):
        return False  # lazy/arrow columns may carry nulls
    return isinstance(col, np.ndarray) and not np.ma.isMaskedArray(col)


class Binner(BinnerBase):
    """Scalar-range binner for binby (reference: groupby.py Binner)."""

    def __init__(self, df, expression, limits=None, shape=128):
        from .ops.gridagg import BinnerScalar
        self.df = df
        self.expression = _str(expression)
        self.label = self.expression
        if limits is None or isinstance(limits, str):
            limits = df.limits(self.expression, limits)
        vmin, vmax = limits
        self.N = shape
        centers = np.linspace(vmin, vmax, shape + 1)
        self.bin_values = (centers[1:] + centers[:-1]) / 2
        self.binner = BinnerScalar(self.expression, vmin, vmax, shape)
        self.dense = True
        self.sort_indices = None

    def create_binner(self, df):
        pass

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(2, -1)
        return ar[tuple(slices)]

    def labels_take(self, indices):
        return _take_labels(self.bin_values, indices)


class BinnerTime(BinnerBase):
    """Time-resampled grouping (reference: groupby.py:64 BinnerTime,
    per_week/per_day/... constructors): datetimes floor-divide into fixed
    periods (W/D/h/m/s) or calendar units (M/Y via datetime64 casts),
    binned as ordinals on the device."""

    def __init__(self, expression, df=None, resolution="W", every=1):
        from .expression import Expression
        if isinstance(expression, Expression):
            df = expression.df
            expression = expression.expression
        assert df is not None, "BinnerTime needs a dataframe (pass an Expression)"
        self.df = df
        self.expression = str(expression)
        self.label = self.expression
        self.resolution = resolution
        self.every = every
        self.sort_indices = None
        tmin, tmax = df.minmax(self.expression)
        tmin = np.datetime64(int(tmin), "ns") if not isinstance(tmin, np.datetime64) else tmin
        tmax = np.datetime64(int(tmax), "ns") if not isinstance(tmax, np.datetime64) else tmax
        if resolution in ("M", "Y"):
            start = tmin.astype(f"M8[{resolution}]")
            end = tmax.astype(f"M8[{resolution}]")
            self._origin = start.astype(np.int64)
            n_units = int(end.astype(np.int64) - self._origin) + 1
            self.N = (n_units + every - 1) // every
            self.bin_values = (start + np.arange(self.N) * np.timedelta64(every, resolution)).astype("M8[ns]")
            self._calendar = resolution
        else:
            period = np.timedelta64(every, resolution).astype("m8[ns]").astype(np.int64)
            self._origin = tmin.astype("M8[ns]").astype(np.int64)
            self._period_ns = period
            span = int(tmax.astype("M8[ns]").astype(np.int64) - self._origin)
            self.N = span // period + 1
            self.bin_values = (tmin.astype("M8[ns]") + np.arange(self.N) * np.timedelta64(every, resolution)).astype("M8[ns]")
            self._calendar = None
        self.dense = True

    # constructors mirroring the reference API
    @classmethod
    def per_week(cls, expression, df=None):
        return cls(expression, df, resolution="W")

    @classmethod
    def per_day(cls, expression, df=None):
        return cls(expression, df, resolution="D")

    @classmethod
    def per_hour(cls, expression, df=None):
        return cls(expression, df, resolution="h")

    @classmethod
    def per_month(cls, expression, df=None):
        return cls(expression, df, resolution="M")

    @classmethod
    def per_year(cls, expression, df=None):
        return cls(expression, df, resolution="Y")

    def create_binner(self, df):
        if self._calendar:
            # calendar units need host evaluation (month arithmetic)
            values = df.evaluate(self.expression, filtered=False)
            np_values = np.asarray(values).astype(f"M8[{self._calendar}]").astype(np.int64)
            codes = ((np_values - self._origin) // self.every).astype(np.int64)
            # bin via a materialized codes column
            col_name = f"__time_codes_{abs(hash((self.expression, self.resolution)))}"
            if col_name not in df.get_column_names(hidden=True):
                df.add_column(col_name, codes)
            self.binby_expression = col_name
        else:
            origin = self._origin
            period = self._period_ns
            self.binby_expression = (f"_astype(_astype({self.expression}, 'int64') - {origin}, 'int64') // {period}")
        self.binner = BinnerOrdinal(self.binby_expression, self.N)

    def extract_center(self, dim, ar):
        slices = [slice(None)] * np.ndim(ar)
        slices[dim] = slice(0, self.N)
        return ar[tuple(slices)]

    def labels_take(self, indices):
        return _take_labels(self.bin_values, indices)


class GrouperCombined(Grouper):
    """Multi-key sparse path: one int64 combined key (reference:
    groupby.py:330 + _combine:526).  Labels decoded by div/mod."""

    def __init__(self, df, parents, sort=False, ascending=True, row_limit=None):
        Ns = [p.N for p in parents]
        multipliers = np.cumprod([1] + Ns[::-1][:-1])[::-1].astype(np.int64)
        # int32 combined key when the full product fits: i64 sorts/compares
        # are EMULATED on TPU — the i32 key makes the discovery sort and the
        # ordinal binary search native-rate (h2o q10's (id1, id3) combine is
        # 256 * 2^20 = 2^28)
        key_dtype = ("int32" if int(multipliers[0]) * max(int(Ns[0]), 1)
                     < 2**31 - 1 else "int64")
        terms = []
        for p, mult in zip(parents, multipliers):
            code = f"_astype(({p.binby_expression}), '{key_dtype}')"
            if getattr(p, "min_value", 0):
                code = f"(({code}) - {p.min_value})"
            terms.append(f"({code}) * {mult}" if mult != 1 else code)
        expression = " + ".join(terms)
        super().__init__(df, expression, sort=False, row_limit=row_limit)
        self.parents = parents
        self.multipliers = multipliers
        self.labels = None
        # combined keys (int64) decode into parent labels
        combined = np.asarray(self.bin_values)
        if np.ma.isMaskedArray(combined):
            combined = combined.data
        self.parent_indices = []
        rem = combined.astype(np.int64)
        for mult in multipliers:
            idx = rem // mult
            rem = rem % mult
            self.parent_indices.append(idx)
        if sort:
            order = np.lexsort([np.asarray(idx) for _, idx
                                in reversed(self.flat_parent_indices())])
            if not ascending:
                order = order[::-1]
            self._sort_hashmap(order)
            self.parent_indices = [idx[order] for idx in self.parent_indices]

    def flat_parent_indices(self):
        """(original grouper, index array) pairs with nested combined parents
        expanded — staged combining (reference _combine recursion,
        groupby.py:575-583) nests a GrouperCombined inside the next stage
        when the full cartesian product exceeds the int64 key space."""
        out = []
        for p, idx in zip(self.parents, self.parent_indices):
            if isinstance(p, GrouperCombined):
                for q, qidx in p.flat_parent_indices():
                    out.append((q, np.asarray(qidx)[np.asarray(idx)]))
            else:
                out.append((p, idx))
        return out

    def _sort_hashmap(self, order):
        from .hash import HashMapUnique
        keys = np.asarray(self.hashmap._keys)[order]
        new = HashMapUnique(self.hashmap.dtype)
        new._keys = keys
        new.null_index = -2 if self.hashmap.has_null else -1
        new.nan_index = -2 if self.hashmap.has_nan else -1
        new._finalize_indices()
        self.hashmap = new
        self.bin_values = new.keys()


def _combine_staged(df, groupers, sort, ascending, row_limit):
    """Combine groupers into one int64 key, in stages when needed (reference
    _combine, groupby.py:543-583): take groupers while the cartesian product
    fits 2^63-1, compress to the observed combinations via GrouperCombined's
    hashmap discovery (<= row count, regardless of the product), then combine
    the compressed grouper with the rest.  Sort happens only at the final
    stage, over the flattened original-parent indices."""
    remaining = list(groupers)
    while True:
        take = [remaining.pop(0)]
        prod = int(take[0].N)
        while remaining and prod * max(int(remaining[0].N), 1) < 2 ** 63 - 1:
            prod *= max(int(remaining[0].N), 1)
            take.append(remaining.pop(0))
        is_last = not remaining
        if len(take) == 1:
            raise RuntimeError(
                f"grouper {take[0].label!r} alone exceeds the int64 key space")
        combined = GrouperCombined(df, take, sort=sort and is_last,
                                   ascending=ascending, row_limit=row_limit)
        if is_last:
            return combined
        combined.label = "__combined__"
        combined.create_binner(df)
        remaining.insert(0, combined)


def _emit_label(columns, g, values):
    """One label column per requested key: the grouper's own label plus any
    aliased keys that share it (GroupByBase key dedupe)."""
    columns[g.label] = values
    for a in g.alias_labels:
        columns[a] = values


def _labels_array(labels):
    if any(isinstance(l, str) for l in labels):
        return pa.array(labels)
    return np.asarray(labels)


def _take_labels(bin_values, indices):
    if array_types.is_arrow_array(bin_values):
        return bin_values.take(pa.array(np.asarray(indices, dtype=np.int64)))
    bv = bin_values
    if isinstance(bv, list):
        bv = _labels_array(bv)
    if np.ma.isMaskedArray(bv):
        return bv[np.asarray(indices)]
    return np.take(bv, np.asarray(indices))


def make_grouper(df, by, sort=False, ascending=True, row_limit=None):
    if isinstance(by, BinnerBase):
        return by
    expr = _str(by)
    if df.is_category(expr):
        return GrouperCategory(df, expr, sort=sort, ascending=ascending, row_limit=row_limit)
    dtype = df.data_type(expr)
    if not dtype.is_string and dtype.numpy in (np.dtype("uint8"), np.dtype("int8"), np.dtype(bool)):
        return BinnerInteger(df, expr, sort=sort, ascending=ascending, row_limit=row_limit)
    return Grouper(df, expr, sort=sort, ascending=ascending, row_limit=row_limit)


class GroupByBase:
    # GroupBy collapses keys that canonicalize to the same expression into
    # one grouper (see __init__); BinBy keeps one grid axis per requested dim
    _dedupe_aliased_keys = False

    def __init__(self, df, by, sort=False, ascending=True, row_limit=None, combine="auto"):
        self.df_original = df
        self._by_spec = [str(b) for b in (by if isinstance(by, (list, tuple)) else [by])] if by is not None else []
        self._sort_spec = sort
        self.df = df.copy()
        if by is None:
            by = []
        from .expression import Expression as _Expression
        # Expression objects are iterable (element access) — a single one
        # must NOT be exploded by list(by)
        if isinstance(by, (str, _Expression, BinnerBase)) or not isinstance(by, collections.abc.Iterable):
            by = [by]
        by = list(by)
        sorts = sort if isinstance(sort, (list, tuple)) else [sort] * len(by)
        ascendings = ascending if isinstance(ascending, (list, tuple)) else [ascending] * len(by)
        # aliased keys collapse to ONE grouper (h2o q10: id2/id4/id5 alias
        # id1 and id6 aliases id3 as virtual columns -> 2 groupers instead
        # of 6, turning a staged 2^72-key combine into one 2^28 combine);
        # the result still emits a label column per requested key, copied
        # from the shared grouper (alias_labels).  GroupBy only: BinBy's
        # xarray output keeps one axis per requested dim.
        alias_of = {}
        if self._dedupe_aliased_keys and len(by) > 1:
            from .execution import _canonical_expr
            seen = {}
            for i, b in enumerate(by):
                if isinstance(b, BinnerBase):
                    continue
                canon = (_canonical_expr(self.df, _str(b)),
                         bool(sorts[i]), bool(ascendings[i]))
                if canon in seen:
                    alias_of[i] = seen[canon]
                else:
                    seen[canon] = i
        # build all key hashmaps in ONE streaming pass: schedule delayed
        # hashmap tasks for every plain expression key, execute once, then
        # hand the prebuilt maps to the groupers (reference schedules the
        # discovery tasks together the same way, groupby.py Grouper delay)
        prebuilt = {}
        pending = []
        range_pending = {}
        for i, (b, s, a) in enumerate(zip(by, sorts, ascendings)):
            if isinstance(b, BinnerBase) or i in alias_of:
                continue
            expr = _str(b)
            if self.df.is_category(expr):
                continue
            dtype = self.df.data_type(expr)
            if not dtype.is_string and dtype.numpy in (np.dtype("uint8"), np.dtype("int8"), np.dtype(bool)):
                continue
            if expr in prebuilt or expr in range_pending:
                continue
            # integer-range fast path: discovery = a minmax instead of a
            # hashmap build (descending sort needs the hashmap's reordering)
            if (not (s and not a)) and _int_range_candidate(self.df, expr, row_limit):
                range_pending[expr] = self.df.minmax(expr, delay=True)
            else:
                prebuilt[expr] = None
                pending.append((expr, self.df._hash_map_unique(expr, limit=row_limit, delay=True)))
        if pending or range_pending:
            self.df.execute()
            for expr, promise in pending:
                prebuilt[expr] = promise.get()
        ranges = {}
        max_cells = settings.compute.groupby_int_range_cells
        for expr, promise in range_pending.items():
            vmin, vmax = np.asarray(promise.get()).tolist()
            if vmax >= vmin and int(vmax) - int(vmin) + 1 <= max_cells:
                ranges[expr] = (int(vmin), int(vmax))
            # else: fall through to the hashmap Grouper (extra pass)
        self.by = []
        by_slot = {}            # original key index -> slot in self.by
        self._requested_to_by = []
        for i, (b, s, a) in enumerate(zip(by, sorts, ascendings)):
            if i in alias_of:
                g = self.by[by_slot[alias_of[i]]]
                if not g.alias_labels:
                    g.alias_labels = []
                g.alias_labels.append(_str(b))
                self._requested_to_by.append(by_slot[alias_of[i]])
                continue
            by_slot[i] = len(self.by)
            self._requested_to_by.append(len(self.by))
            if isinstance(b, BinnerBase):
                self.by.append(b)
                continue
            expr = _str(b)
            hm = prebuilt.get(expr)
            if hm is not None:
                self.by.append(Grouper(self.df, expr, sort=s, ascending=a, row_limit=row_limit, hashmap=hm))
            elif expr in ranges:
                vmin, vmax = ranges[expr]
                self.by.append(GrouperIntRange(self.df, expr, vmin, vmax, sort=s, ascending=a))
            else:
                self.by.append(make_grouper(self.df, b, sort=s, ascending=a, row_limit=row_limit))
        for g in self.by:
            g.create_binner(self.df)
        self.combine = False
        import math
        # exact python-int product: np.prod overflows int64 silently for
        # many-key groupbys (6 keys x 1e6 cardinality = 1e20 "cells")
        cells = math.prod(int(g.N) for g in self.by) if self.by else 0
        if len(self.by) >= 2 and cells > 0:
            rows = self.df.length_unfiltered
            occupancy = rows / cells
            if (combine is True) or (combine == "auto" and (cells > _COMBINE_CELL_LIMIT or occupancy < 10)):
                combined = _combine_staged(self.df, self.by,
                                           sort=sorts[0] if sorts else False,
                                           ascending=ascendings[0] if ascendings else True,
                                           row_limit=row_limit)
                combined.create_binner(self.df)
                self.parents = self.by
                self.by = [combined]
                self.combine = True
        self.binners = tuple(g.binner for g in self.by)
        self.dims = []
        for g in (self.parents if self.combine else self.by):
            self.dims.append(g.label)
            self.dims.extend(g.alias_labels)
        self.shape = [g.N for g in self.by]
        self.dense = all(getattr(g, "dense", False) for g in self.by)

    @property
    def groupby_expression(self):
        return [g.expression for g in self.by]

    def _agg_grids(self, actions):
        """Run all aggregations on the grid; returns dict name → promise."""
        df = self.df
        grids = {}
        self._counts_promise = None

        def add(aggregate, column_name=None, override_name=None):
            if column_name is None or override_name is not None:
                column_name = aggregate.pretty_name(override_name, df)
            aggregate.edges = True
            tasks, result = aggregate.add_tasks(df, self.binners)
            if getattr(self, "_keep_device", False) and agg_mod.descriptor_device_ok(df, aggregate):
                # device-resident result frame: the executor fulfills these
                # grids as jax arrays (no grid D2H); finish() compacts on
                # device.  A descriptor that can't stay on device clears the
                # flag — finish falls back to the host path for all grids.
                for t in tasks:
                    t.keep_device = True
            else:
                self._keep_device = False
            grids[column_name] = result
            if (isinstance(aggregate, agg_mod.AggregatorDescriptorBasic)
                    and aggregate.short_name == "count" and aggregate.expression == "*"
                    and aggregate.selection in (None, False)):
                self._counts_promise = result

        if isinstance(actions, collections.abc.Mapping):
            actions = list(actions.items())
        elif isinstance(actions, str) or not isinstance(actions, collections.abc.Iterable):
            actions = [actions]

        for item in actions:
            override_name = None
            if isinstance(item, tuple):
                name, aggregates = item
            else:
                name, aggregates = None, item
            if isinstance(aggregates, str) or not isinstance(aggregates, collections.abc.Iterable):
                aggregates = [aggregates]
            elif name is not None:
                override_name = name
            for aggregate in aggregates:
                if isinstance(aggregate, str) and aggregate == "count":
                    add(agg_mod.count(), "count" if name is None else name)
                else:
                    if isinstance(aggregate, str):
                        aggregate = agg_mod.aggregates[aggregate]
                    if callable(aggregate) and not isinstance(aggregate, agg_mod.AggregatorDescriptor):
                        if name is None:
                            for column_name in df.get_column_names():
                                if column_name not in self.groupby_expression and column_name not in self.dims:
                                    add(aggregate(column_name), override_name=override_name)
                        else:
                            add(aggregate(name), name, override_name=override_name)
                    else:
                        add(aggregate, name, override_name=override_name)
        return grids

    def _extract_center(self, array):
        for i, by in enumerate(self.by):
            array = by.extract_center(i, np.asarray(array))
        return array

    def __len__(self):
        counts = self._count_grid()
        return int((counts > 0).sum())

    def _count_grid(self):
        tasks, result = agg_mod.count(edges=True).add_tasks(self.df, self.binners)
        self.df.execute()
        return self._extract_center(np.asarray(result.get()))

    def _ordered_result_columns(self, columns):
        """Key label columns in the originally-requested order (alias dedupe
        emits canonical-then-alias), then the aggregates."""
        ordered = {}
        for name in self._by_spec:
            if name in columns:
                ordered[name] = columns.pop(name)
        ordered.update(columns)
        return ordered

    def __iter__(self):
        counts = self._count_grid()
        mask = counts > 0
        coords = [np.asarray(g.bin_values if not array_types.is_arrow_array(g.bin_values) else g.bin_values.to_pylist(), dtype=object)
                  for g in self.by]
        mesh = np.meshgrid(*[np.arange(len(c)) for c in coords], indexing="ij")
        # aliased keys (one grouper, several requested keys) repeat the
        # shared grouper's value in each requested slot
        slots = getattr(self, "_requested_to_by", None)
        if slots is None or self.combine:
            slots = list(range(len(self.by)))
        for flat_idx in zip(*[m[mask] for m in mesh]):
            values = tuple(coords[slots[k]][flat_idx[slots[k]]]
                           for k in range(len(slots)))
            yield values if len(values) > 1 else values[0], self.get_group(list(values))

    @property
    def groups(self):
        for group, df in self:
            yield group

    def get_group(self, group):
        if not isinstance(group, (list, tuple)):
            group = [group]
        exprs = []
        # one value per REQUESTED key (aliased keys carry equal values, so
        # filtering on every requested expression stays correct)
        key_exprs = [g.expression for g in self.by]
        if len(group) == len(self._by_spec) != len(self.by):
            key_exprs = self._by_spec
        for expr, value in zip(key_exprs, group):
            if isinstance(value, str):
                exprs.append(f'({expr} == {value!r})')
            else:
                exprs.append(f'({expr} == {value})')
        return self.df.filter(" & ".join(exprs))


class GroupBy(GroupByBase):
    """Reference: groupby.py GroupBy."""

    _dedupe_aliased_keys = True

    def agg(self, actions, delay=False):
        # device-resident result frame gate (settings.compute.device_result):
        # single numeric grouper, executor supports device finalize, and every
        # action survives descriptor_device_ok (checked per-add in _agg_grids)
        self._keep_device = (
            settings.compute.device_result
            and not self.combine and len(self.by) == 1
            and not getattr(self.by[0], "dense", False)
            and self.by[0].supports_device_labels()
            and getattr(self.df.executor, "supports_device_finalize", False))
        grids = self._agg_grids(actions)
        counts_promise = self._counts_promise
        if counts_promise is None:
            grouper = self.by[0] if (len(self.by) == 1 and not self.combine) else None
            if type(grouper) is Grouper and grouper.N > 0:
                # hashmap groupers: every key slot is non-empty by
                # construction (keys were discovered from this very df), so
                # the presence-count pass is synthesizable — saves one
                # full-column scatter per groupby
                synth = np.zeros(grouper.binner.shape, dtype=np.int64)
                synth[:grouper.N] = 1
                counts_promise = synth
            else:
                # presence only (the counts' values are never used): fetched
                # as a device-packed bitmap, C/8 bytes instead of a count grid
                counts_promise = agg_mod.presence_tasks(
                    self.df, self.binners, keep_device=getattr(self, "_keep_device", False))

        def finish_device(counts, values):
            """Device-resident result frame: extract-center, presence-mask and
            compact the grids with jax ops; the only host sync is the nonzero
            group count.  Result columns are jax.Arrays (first-class here) —
            at 1M groups this skips ~4MB of grid D2H per aggregation."""
            import jax.numpy as jnp
            g = self.by[0]
            names = list(grids.keys())
            arrays = {name: g.extract_center(0, jnp.atleast_1d(v))
                      for name, v in zip(names, values)}
            columns = {}
            if array_types.is_jax_array(counts):
                c = g.extract_center(0, jnp.atleast_1d(counts))
                mask = c if c.dtype == bool else (c > 0)
                idx = jnp.nonzero(mask)[0]
                all_present = int(idx.shape[0]) == g.N
            else:  # synthesized host presence (hashmap groupers: all slots live)
                counts_c = self._extract_center(np.atleast_1d(np.asarray(counts)))
                mask_h = counts_c > 0
                all_present = bool(mask_h.all())
                idx = None if all_present else jnp.asarray(np.nonzero(mask_h)[0])
            if all_present:
                _emit_label(columns, g, g.device_labels())
                columns.update(arrays)
            else:
                _emit_label(columns, g, g.labels_take_device(idx))
                for key, value in arrays.items():
                    columns[key] = jnp.take(value, idx)
            from . import from_arrays, from_dataset
            res = from_arrays(**self._ordered_result_columns(columns))
            wrapped = DatasetGroupby(res.dataset, self.df_original, self._by_spec,
                                     actions, sort=self._sort_spec)
            return from_dataset(wrapped)

        @delayed
        def finish(counts, *values):
            names = list(grids.keys())
            if (getattr(self, "_keep_device", False)
                    and values and all(array_types.is_jax_array(v) for v in values)):
                return finish_device(counts, values)
            arrays = {name: np.asarray(v) for name, v in zip(names, values)}
            arrays = {k: self._extract_center(np.atleast_1d(v)) for k, v in arrays.items()}
            counts = self._extract_center(np.atleast_1d(np.asarray(counts)))
            columns = {}
            if self.combine:
                combined = self.by[0]
                mask = counts > 0
                indices = np.nonzero(mask)[0]
                for parent, pidx in combined.flat_parent_indices():
                    _emit_label(columns, parent,
                                parent.labels_take(np.asarray(pidx)[indices]))
                for key, value in arrays.items():
                    columns[key] = value[mask]
            elif self.dense and len(self.by) == 1:
                _emit_label(columns, self.by[0], _as_column(self.by[0].bin_values))
                for key, value in arrays.items():
                    columns[key] = value
            else:
                mask = counts > 0
                if mask.all():
                    indices_nd = [np.ravel(m) for m in np.meshgrid(*[np.arange(g.N) for g in self.by], indexing="ij")]
                    for g, idx in zip(self.by, indices_nd):
                        _emit_label(columns, g, g.labels_take(idx))
                    for key, value in arrays.items():
                        columns[key] = value.ravel()
                else:
                    where = np.where(mask)
                    for g, idx in zip(self.by, where):
                        _emit_label(columns, g, g.labels_take(idx))
                    for key, value in arrays.items():
                        columns[key] = value[mask]
            from . import from_arrays, from_dataset
            res = from_arrays(**self._ordered_result_columns(columns))
            wrapped = DatasetGroupby(res.dataset, self.df_original, self._by_spec,
                                     actions, sort=self._sort_spec)
            return from_dataset(wrapped)

        promise = finish(counts_promise, *[grids[name] for name in grids])
        if delay:
            return promise
        self.df.execute()
        return promise.get()

    def describe(self, expression=None):
        if expression is None:
            expression = [c for c in self.df.get_column_names() if c not in self.groupby_expression]
        columns = [expression] if isinstance(expression, str) else list(expression)
        actions = {}
        for col in columns:
            actions[f"{col}_count"] = agg_mod.count(col)
            actions[f"{col}_mean"] = agg_mod.mean(col)
            actions[f"{col}_std"] = agg_mod.std(col)
            actions[f"{col}_min"] = agg_mod.min(col)
            actions[f"{col}_max"] = agg_mod.max(col)
        return self.agg(actions)


class BinBy(GroupByBase):
    """Returns labeled N-d arrays (reference: groupby.py BinBy.agg:836)."""

    def __init__(self, df, by, sort=False, ascending=True, limits=None, shape=128):
        if by is None:
            by = []
        from .expression import Expression as _Expression
        # Expression objects are iterable (element access) — a single one
        # must NOT be exploded by list(by)
        if isinstance(by, (str, _Expression, BinnerBase)) or not isinstance(by, collections.abc.Iterable):
            by = [by]
        by = list(by)
        limits_list = limits if isinstance(limits, (list, tuple)) and len(by) > 1 else [limits] * len(by)
        shapes = shape if isinstance(shape, (list, tuple)) else [shape] * len(by)
        resolved = []
        for b, lim, shp in zip(by, limits_list, shapes):
            if isinstance(b, BinnerBase):
                resolved.append(b)
                continue
            expr = _str(b)
            if df.is_category(expr):
                resolved.append(GrouperCategory(df, expr, sort=sort))
            else:
                dtype = df.data_type(expr)
                if dtype.is_string:
                    resolved.append(Grouper(df, expr, sort=sort))
                else:
                    resolved.append(Binner(df, expr, limits=lim, shape=shp))
        super().__init__(df, resolved, sort=sort, ascending=ascending, combine=False)

    def agg(self, actions, delay=False):
        from .xarray_lite import wrap
        grids = self._agg_grids(actions)

        @delayed
        def finish(*values):
            names = list(grids.keys())
            arrays = {name: self._extract_center(np.atleast_1d(np.asarray(v))) for name, v in zip(names, values)}
            coords1d = [_coords_list(g.bin_values) for g in self.by]
            if len(arrays) == 1 and (isinstance(actions, str) or isinstance(actions, agg_mod.AggregatorDescriptor)
                                     or (isinstance(actions, collections.abc.Mapping) and len(actions) == 1)):
                key0 = names[0]
                return wrap(arrays[key0], dims=self.dims, coords=dict(zip(self.dims, coords1d)))
            stacked = np.stack([arrays[k] for k in names])
            return wrap(stacked, dims=["statistic"] + self.dims,
                        coords={"statistic": names, **dict(zip(self.dims, coords1d))})

        promise = finish(*[grids[name] for name in grids])
        if delay:
            return promise
        self.df.execute()
        return promise.get()


def _as_column(bin_values):
    if isinstance(bin_values, list):
        return _labels_array(bin_values)
    return bin_values


def _coords_list(bin_values):
    if array_types.is_arrow_array(bin_values):
        return bin_values.to_pylist()
    if np.ma.isMaskedArray(bin_values):
        return [None if m else v for v, m in zip(bin_values.data, np.ma.getmaskarray(bin_values))]
    return np.asarray(bin_values).tolist()


@dataset_mod.register
class DatasetGroupby(dataset_mod.DatasetDecorator):
    """Wraps a groupby-result dataset so it can be serialized: pickling
    stores (source df, by, agg, sort) and re-executes the groupby on load
    (reference: groupby.py:1019 DatasetGroupby)."""

    snake_name = "groupby"

    def __init__(self, original, df, by, agg, sort=False):
        super().__init__(original)
        self.df = df
        self.by = by
        self.agg = agg
        self.sort = sort
        self._columns = dict(original._columns)
        self._row_count = original.row_count

    def _fingerprint(self):
        from . import utils as _utils
        by = self.by if isinstance(self.by, (list, tuple)) else str(self.by)
        # spec-only: the result is fully determined by (source, by, agg, sort).
        # The materialized columns must NOT contribute — device-resident
        # results carry identity fingerprints that differ per execution
        return _utils.fingerprint(self.df.fingerprint(),
                                  list(map(str, by)), str(self.agg), self.sort)

    def chunk_iterator(self, *args, **kwargs):
        yield from self.original.chunk_iterator(*args, **kwargs)

    def hashed(self):
        return self

    def slice(self, start, end):
        if start == 0 and end == self.row_count:
            return self
        return dataset_mod.DatasetSliced(self, start, end)

    def __getstate__(self):
        state = {k: v for k, v in self.__dict__.items()
                 if k not in ("original", "_columns", "_fingerprint_cached")}
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._fingerprint_cached = None
        result = self.df.groupby(self.by, agg=self.agg, sort=self.sort)
        ds = result.dataset
        while isinstance(ds, dataset_mod.DatasetDecorator):
            ds = ds.original
        self.original = ds
        self._columns = dict(ds._columns)
        self._row_count = ds.row_count
