"""Joins: hash-free sort-merge lookup with lazy indexed columns.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/join.py:125
(+ df._index, dataframe.py:514): the reference builds a C++ ``index_hash``
multimap over the right side and fills a per-row lookup array in a parallel
pass; here the right keys are ordinal-encoded through a key table (hash.py)
and sorted once, so the left-side lookup is a vectorized binary search
(classic sort-merge join — the TPU-friendly formulation, SURVEY.md §2.2).
Result columns stay lazy ``ColumnIndexed`` views: the right table is never
materialized (README claim: sub-second joins on 10⁹ rows)."""

from __future__ import annotations

import numpy as np

from . import array_types
from .column import ColumnIndexed
from .dataset import DatasetArrays, DatasetMerged
from .hash import HashMapUnique


def _device_lookup_fn(hashmap, n_codes):
    """Jitted (values, row_of_code) -> right rows; cached per key table so
    repeated joins against the same right side compile once."""
    import functools
    import jax
    import jax.numpy as jnp
    key = (hashmap.fingerprint, n_codes)
    fn = _device_lookup_cache.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(values, row_of_code):
        from .dispatch import MV
        codes = hashmap.map_ordinal_device(MV(values, None)).values
        ok = (codes >= 0) & (codes < n_codes)
        safe = jnp.where(ok, codes, 0)
        return jnp.where(ok, row_of_code[safe], jnp.int32(-1))

    if len(_device_lookup_cache) > 64:
        _device_lookup_cache.clear()
    _device_lookup_cache[key] = run
    return run


_device_lookup_cache = {}


def _lookup_first_best(index, left_values):
    """Pick the device lookup for large numeric left sides with unique right
    keys (single-gather bijection); host binary search otherwise.

    OPT-IN via VAEX_TPU_DEVICE_JOIN=1: on a direct-attached TPU the device
    path wins (one gather at HBM speed + one i32 fetch), but it ships
    len(left) key bytes each way — over a tunneled device the host path's
    zero transfers win (measured 15s device vs 6s host at 16.7M rows), and
    on the CPU backend the small-table broadcast mapping materializes a
    [rows, keys] compare."""
    import os
    values = left_values
    if not (os.environ.get("VAEX_TPU_DEVICE_JOIN")
            or os.environ.get("VAEX_TPU_FORCE_DEVICE_JOIN")):
        return index.lookup_first(values)
    min_rows = int(os.environ.get("VAEX_TPU_DEVICE_JOIN_MIN_ROWS", 1 << 22))
    eligible = (
        not index.has_duplicates
        and not index.hashmap._is_string
        and isinstance(values, np.ndarray)
        and not np.ma.isMaskedArray(values)
        and values.dtype.kind in "iufMm"
        and len(values) >= min_rows
    )
    if eligible:
        try:
            return index.lookup_first_device(values)
        except Exception:  # pragma: no cover - fall back on any device issue
            pass
    return index.lookup_first(values)


class RowIndex:
    """value → row(s) multimap over one column (reference: C++ index_hash,
    src/hash_primitives.hpp:732).

    Unique numeric right keys take the native C++ ``KeyIndex`` fast path
    (vaex_tpu._native: open-addressing or dense direct-address map, parallel
    GIL-released build + probes — the reference's multithreaded index_hash
    equivalent); duplicates and exotic dtypes use the ordinal sort-merge
    structures."""

    def __init__(self, hashmap, sorted_codes, order, native_index=None, n=None):
        self.hashmap = hashmap          # value → ordinal code
        self.sorted_codes = sorted_codes  # right codes, sorted
        self.order = order              # argsort: position → right row
        self._native = native_index     # NativeKeyIndex (unique keys only)
        self._n = n if n is not None else (len(order) if order is not None else 0)
        if native_index is not None:
            self.has_duplicates = False
        else:
            counts = np.bincount(sorted_codes[sorted_codes >= 0], minlength=hashmap.count) if len(sorted_codes) else np.zeros(0, np.int64)
            self.has_duplicates = bool((counts > 1).any())

    @classmethod
    def build(cls, values):
        import os

        from . import native as native_mod
        device_opt_in = bool(os.environ.get("VAEX_TPU_DEVICE_JOIN")
                             or os.environ.get("VAEX_TPU_FORCE_DEVICE_JOIN"))
        if (not device_opt_in and native_mod.available and isinstance(values, np.ndarray)
                and not np.ma.isMaskedArray(values) and values.dtype.kind in "iufMm"):
            v = values.view(np.int64) if values.dtype.kind in "Mm" else values
            kidx = native_mod.NativeKeyIndex.create(v.dtype)
            if kidx is not None:
                kidx.build(v)
                if not kidx.has_duplicates:
                    index = cls(None, None, None, native_index=kidx, n=len(v))
                    index._right_values = values  # for cross-dtype fallback
                    return index
        return cls._build_slow(values)

    @classmethod
    def _build_slow(cls, values):
        hashmap = HashMapUnique.from_keys(values)
        codes = hashmap.map_ordinal(values)
        order = np.argsort(codes, kind="stable").astype(np.int64)
        return cls(hashmap, codes[order], order)

    def __len__(self):
        return self._n

    def lookup_first_device(self, values):
        """Device-side first-match lookup for UNIQUE right keys: codes via
        the compiled ordinal mapping (hash.map_ordinal_device), then one
        small row_of_code gather — codes are a bijection onto right rows, so
        no binary search at all.  One i32 fetch replaces the chain of
        len(left)-sized host temporaries (which pay ~0.4ms/4KB first-touch
        faults in sandboxed runtimes)."""
        import jax
        import jax.numpy as jnp
        from .execution import _device_view
        # right row per ordinal code (unique keys → exactly one row per code)
        row_of_code = np.full(self.hashmap.count, -1, dtype=np.int32)
        row_of_code[self.sorted_codes] = self.order.astype(np.int32)
        dv = jax.device_put(_device_view(np.ascontiguousarray(values)))
        fn = _device_lookup_fn(self.hashmap, len(row_of_code))

        return np.asarray(fn(dv, jnp.asarray(row_of_code)))

    def lookup_first_device_keep(self, values):
        """Device-RESIDENT first-match lookup for a device (jax.Array) left
        key column: returns a device i32 row vector (-1 = no match) without
        any D2H, or None when unsupported.  Device-column frames join with
        zero host row traffic: codes via the compiled ordinal mapping, rows
        via one small row_of_code gather (unique right keys)."""
        if self.has_duplicates or not array_types.is_jax_array(values):
            return None
        if self._native is not None:
            slow = self.__dict__.setdefault(
                "_slow", RowIndex._build_slow(self._right_values))
            return slow.lookup_first_device_keep(values)
        if self.hashmap is None or getattr(self.hashmap, "_is_string", False):
            return None
        keys_dtype = self.hashmap.dtype
        keys_dtype = np.dtype(keys_dtype.numpy if hasattr(keys_dtype, "numpy") else keys_dtype)
        vdt = np.dtype(values.dtype)
        if vdt != keys_dtype and not (vdt.kind == keys_dtype.kind
                                      or np.can_cast(vdt, keys_dtype, "safe")):
            return None  # lossy cross-kind cast could fabricate matches
        import jax.numpy as jnp
        row_of_code = np.full(self.hashmap.count, -1, dtype=np.int32)
        row_of_code[self.sorted_codes] = self.order.astype(np.int32)
        fn = _device_lookup_fn(self.hashmap, len(row_of_code))
        return fn(values, jnp.asarray(row_of_code))

    def _native_lookup(self, values):
        """C++ probe when the left dtype casts safely into the index dtype;
        None → caller falls back to the ordinal path."""
        mask = None
        if np.ma.isMaskedArray(values):
            mask = np.ma.getmaskarray(values)
            values = values.data
        if not isinstance(values, np.ndarray):
            return None
        if values.dtype.kind in "Mm":
            values = values.view(np.int64)
        if values.dtype.kind not in "iuf":
            return None
        if values.dtype != self._native.dtype:
            if not np.can_cast(values.dtype, self._native.dtype, "safe"):
                return None
        rows = self._native.lookup(values)
        if mask is not None:
            rows = np.where(mask, np.int32(-1), rows)
        return rows

    def lookup_first(self, values):
        """(right_row or -1) per value — first match.  int32 rows when the
        right table fits: the lookup array is len(left)-sized, and halving
        it halves the page-fault/transfer cost of the join's hot path."""
        if self._native is not None:
            rows = self._native_lookup(values)
            if rows is not None:
                return rows
            # left dtype outside the native index domain (e.g. float left vs
            # int right): build the ordinal structures once and reuse them
            slow = self.__dict__.setdefault(
                "_slow", RowIndex._build_slow(self._right_values))
            return slow.lookup_first(values)
        cdt = np.int32 if len(self.order) < 2**31 - 1 else np.int64
        codes = self.hashmap.map_ordinal(values)
        start = np.searchsorted(self.sorted_codes, codes, side="left")
        start_c = np.minimum(start, max(len(self.sorted_codes) - 1, 0))
        found = (codes >= 0) & (len(self.sorted_codes) > 0)
        if len(self.sorted_codes):
            found = found & (self.sorted_codes[start_c] == codes)
        order = self.order.astype(cdt, copy=False)
        rows = np.where(found, order[start_c] if len(order) else cdt(0), cdt(-1))
        return rows.astype(cdt, copy=False)

    def lookup_ranges(self, values):
        """(start, count) ranges into self.order per value (for duplicates)."""
        codes = self.hashmap.map_ordinal(values)
        start = np.searchsorted(self.sorted_codes, codes, side="left")
        end = np.searchsorted(self.sorted_codes, codes, side="right")
        count = np.where(codes >= 0, end - start, 0)
        return start, count


def _joinable_on_device(right, name):
    """True when this right column can be materialized as a device array."""
    try:
        dt = right.data_type(name)
    except Exception:  # noqa: BLE001
        return False
    if dt.is_string or getattr(dt, "is_object", False) or dt.is_list or dt.is_struct:
        return False
    if name not in right.virtual_columns and name in right.dataset:
        col = right.dataset[name]
        if isinstance(col, np.ndarray) and np.ma.isMaskedArray(col):
            return False
        if array_types.is_arrow_array(col) and getattr(col, "null_count", 0):
            return False
    return True


def _to_device_column(values):
    """Host numeric column -> device jax array (temporals as i64 ns)."""
    import jax
    from .execution import _device_view
    if hasattr(values, "__len__") and not isinstance(values, np.ndarray):
        values = array_types.to_numpy(values)
    return jax.device_put(_device_view(np.ascontiguousarray(values)))


def join(df, other, on=None, left_on=None, right_on=None, lprefix="", rprefix="",
         lsuffix="", rsuffix="", how="left", allow_duplication=False, inplace=False,
         cardinality_other=None):
    """Reference: vaex/join.py:125."""
    left = df if inplace else df.copy()
    right = other

    if how == "right":
        # swap (reference: join.py same trick)
        return join(other, df, on=on, left_on=right_on or on, right_on=left_on or on,
                    lprefix=rprefix, rprefix=lprefix, lsuffix=rsuffix, rsuffix=lsuffix,
                    how="left", allow_duplication=allow_duplication)

    left_on = left_on or on
    right_on = right_on or on

    left = left.extract()
    right = right.extract()

    if left_on is None:
        # no key: row-number join; lengths must be compatible
        if len(left) != len(right):
            raise ValueError(f"cannot join dataframes of different length without a key: {len(left)} vs {len(right)}")
        lookup = np.arange(len(left), dtype=np.int64)
        masked = False
    else:
        right_values = right.evaluate(str(right_on))
        index = RowIndex.build(right_values)
        # device-resident left frame: grab the RAW device key column (public
        # evaluate() materializes to host by contract)
        left_values = None
        dev_keys = left._device_key_columns([str(left_on)])
        if dev_keys is not None:
            left_values = dev_keys[0]
        if left_values is None:
            left_values = left.evaluate(str(left_on))

        device_lookup = None
        if array_types.is_jax_array(left_values) and not index.has_duplicates:
            # device-resident left frame: keep the whole join on device when
            # the right columns can live there too (numeric); the lookup
            # vector and every joined column then never cross the link
            right_ok = all(_joinable_on_device(right, name) for name in right.get_column_names()
                           if name != str(right_on) or str(left_on) != str(right_on))
            if right_ok:
                device_lookup = index.lookup_first_device_keep(left_values)
        if array_types.is_jax_array(left_values) and device_lookup is None:
            left_values = np.asarray(left_values)

        if device_lookup is not None:
            import jax.numpy as jnp
            if how == "inner":
                matched = device_lookup != -1
                if not bool(matched.all()):
                    # i32 indices: with x64 on, i64 gathers are emulated on
                    # TPU (~20x slower at 1e8 rows)
                    keep_idx = jnp.nonzero(matched)[0].astype(jnp.int32)
                    left = left.take(keep_idx, filtered=False)
                    device_lookup = jnp.take(device_lookup, keep_idx)
                lookup, masked = device_lookup, False
            else:
                if bool((device_lookup == -1).any()):
                    # unmatched rows need missing-value masks, which device
                    # columns cannot carry: finish on host
                    lookup = np.asarray(device_lookup)
                    masked = True
                    device_lookup = None
                else:
                    lookup, masked = device_lookup, False
        elif index.has_duplicates:
            starts, counts = index.lookup_ranges(left_values)
            if (counts > 1).any():
                if not allow_duplication:
                    raise ValueError("joining with duplicate keys in the right table requires allow_duplication=True")
                keep = np.maximum(counts, 0 if how == "inner" else 1)
                left_take = np.repeat(np.arange(len(left), dtype=np.int64), keep)
                # per expanded row: which match (0..count-1); unmatched (count==0 in left join) get -1
                offsets = np.concatenate([[0], np.cumsum(keep)])
                within = np.arange(len(left_take), dtype=np.int64) - offsets[left_take]
                has_match = counts[left_take] > 0
                pos = starts[left_take] + within
                pos = np.where(has_match, np.minimum(pos, len(index.order) - 1 if len(index.order) else 0), 0)
                lookup = np.where(has_match, index.order[pos] if len(index.order) else 0, -1)
                left = left.take(left_take, filtered=False)
                masked = bool((lookup == -1).any())
            else:
                lookup = _lookup_first_best(index, left_values)
                masked = bool((lookup == -1).any())
        else:
            lookup = _lookup_first_best(index, left_values)
            masked = bool((lookup == -1).any())

        if how == "inner":
            matched = lookup != -1
            if not matched.all():
                left = left.take(np.nonzero(matched)[0], filtered=False)
                lookup = lookup[matched]
            masked = False

    # resolve column name collisions: prefixes/suffixes apply only to names
    # that clash (reference: join.py suffix semantics); the identical key
    # column is kept once (left's copy)
    left_names = left.get_column_names(hidden=True)
    right_names = right.get_column_names()
    right_dataset_cols = {}
    for name in right_names:
        if name == str(right_on) and str(left_on) == str(right_on):
            continue  # identical key column: keep left's
        if name in left_names:
            new_name = rprefix + name + rsuffix
            if new_name == name:
                if lprefix or lsuffix:
                    left.rename(name, lprefix + name + lsuffix)
                else:
                    raise NameError(f"duplicate column name {name!r}; use lsuffix/rsuffix")
        else:
            new_name = name
        right_dataset_cols[new_name] = name

    # materialize right columns as lazy indexed views
    device_lookup_mode = array_types.is_jax_array(lookup) if left_on is not None else False
    new_cols = {}
    for new_name, orig_name in right_dataset_cols.items():
        if orig_name in right.virtual_columns:
            values = right.evaluate(orig_name)
            if device_lookup_mode:
                values = _to_device_column(values)
            col = ColumnIndexed(values, lookup, masked=masked)
        else:
            base = right.dataset[orig_name]
            if device_lookup_mode and not array_types.is_jax_array(base):
                # small right table: one H2D per column, every later chunk
                # gather stays on device
                base = _to_device_column(base)
            col = ColumnIndexed.index(base, lookup, masked=masked)
        new_cols[new_name] = col

    if new_cols:
        left.dataset = left.dataset.merged(DatasetArrays(new_cols))
        for name in new_cols:
            if name not in left.column_names:
                left.column_names.append(name)
    left._index_start = 0
    left._index_end = left.dataset.row_count
    left._invalidate_length()
    return left
