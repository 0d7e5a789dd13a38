"""Unique-value key tables: the groupby/isin/unique backbone.

TPU-native re-design of the reference C++ hash containers
(/root/reference/packages/vaex-core/src/hash_primitives.hpp:345-760 via
vaex/hash.py:63): instead of sharded open-addressing hashmaps built on CPU
threads, the key table is built incrementally on the host (vectorized
first-occurrence unique per chunk) and shipped to the device as a **sorted
key array + permutation**, so mapping values→ordinal codes inside compiled
passes is a binary search (`jnp.searchsorted`) — static shapes, MXU-friendly,
no device hashing (SURVEY.md §2.2 'TPU-first' plan).

Code layout matches the reference HashMapUnique: codes [0, n) in
first-occurrence order, missing/null occupies one slot (null_index), NaN one
slot (nan_index), unknown values map to -1.
"""

from __future__ import annotations

import functools

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.compute as pc
except ImportError:  # pragma: no cover
    pa = None
    pc = None

from . import array_types, utils
from .datatype import DataType


class HashMapUnique:
    """Reference: vaex/hash.py:63."""

    # device-resident ascending key table padded to the runtime-table bucket
    # (set by _DeviceUniqueBuilder): the executor's dynamic-table inputs use
    # it directly, skipping the padded-host-copy H2D
    _device_sorted_keys = None
    # per-key occurrence counts aligned with keys() order (set by the range-
    # count build, which gets them for free): value_counts() consumes these
    # instead of paying a second full count pass over the data
    _key_counts = None

    def __init__(self, dtype, limit=None):
        self.dtype = DataType(dtype)
        self.limit = limit
        self._is_string = self.dtype.is_string or self.dtype.is_object
        if self._is_string:
            self._keys = []          # python list of str/None
            self._codes = {}         # str -> code
            self._native = None
        else:
            np_dtype = self.dtype.numpy if not self.dtype.is_temporal else np.dtype("int64")
            self._keys = np.empty(0, dtype=np_dtype)
            # C++ incremental ordered set (src/vaex_native.cpp) when built:
            # persistent across chunks, no per-chunk sort-merge
            from .native import NativeOrderedSet
            target = np_dtype if np_dtype.kind != "b" else np.dtype("int32")
            self._native = NativeOrderedSet.create(target) if np_dtype.kind in "iuf" and np_dtype.itemsize >= 4 else None
        self.null_index = -1
        self.nan_index = -1
        self._sorted_cache = None
        self._fingerprint = None

    # ------------------------------------------------------------------
    @classmethod
    def from_keys(cls, keys, dtype=None, fingerprint=""):
        dtype = array_types.data_type(keys) if dtype is None else DataType(dtype)
        hm = cls(dtype)
        hm.add(keys)
        # only adopt a caller fingerprint when one is given — an empty string
        # would make every from_keys hashmap fingerprint-identical and
        # collide result caches (two encodings of the same column with
        # different value orders returned each other's grids)
        hm._fingerprint = fingerprint or None
        return hm

    def __len__(self):
        return self.count

    @property
    def count(self):
        base = len(self._keys)
        extra = (1 if self.null_index != -1 else 0) + (1 if self.nan_index != -1 else 0)
        return base + extra

    def _keys_without_specials(self):
        return self._keys

    @property
    def has_null(self):
        return self.null_index != -1

    @property
    def has_nan(self):
        return self.nan_index != -1

    @property
    def fingerprint(self):
        if self._fingerprint is None:
            if self._is_string:
                self._fingerprint = utils.fingerprint("hashmap", self._keys, self.null_index, self.nan_index)
            else:
                self._fingerprint = utils.fingerprint("hashmap", utils.hash_array_data(self._keys),
                                                      self.null_index, self.nan_index)
        return self._fingerprint

    # ------------------------------------------------------------------
    def add(self, ar):
        """Incremental, order-preserving unique update (reference: the
        parallel hashmap build, hash_primitives.hpp:98-260)."""
        self._sorted_cache = None
        self._fingerprint = None
        if self._is_string:
            self._add_strings(ar)
        else:
            self._add_numeric(ar)
        if self.limit is not None and self.count > self.limit:
            from . import RowLimitException
            raise RowLimitException(f"number of unique values exceeds limit {self.limit}")

    def _add_numeric(self, ar):
        values, valid = array_types.extract_mask(array_types.to_numpy(ar))
        values = np.asarray(values)
        if values.dtype.kind in "Mm":
            values = values.view(np.int64)
        if valid is not None and not valid.all():
            if self.null_index == -1:
                self.null_index = -2  # placeholder, fixed in _finalize_indices
            values = values[valid]
        elif valid is not None:
            pass
        if values.dtype.kind == "f":
            nanmask = np.isnan(values)
            if nanmask.any():
                if self.nan_index == -1:
                    self.nan_index = -2
                values = values[~nanmask]
        if self._native is not None and len(self._native) != len(self._keys):
            # keys were reordered externally (e.g. sorted()); the native set
            # no longer mirrors them — fall back to the numpy merge path
            self._native = None
        if self._native is not None:
            self._native.update(values)
            self._keys = self._native.keys().astype(self._keys.dtype, copy=False)
            return
        import pandas as pd
        chunk_unique = pd.unique(values)
        if len(self._keys):
            sorted_existing = np.sort(self._keys)
            pos = np.searchsorted(sorted_existing, chunk_unique)
            pos = np.clip(pos, 0, len(sorted_existing) - 1)
            new_mask = sorted_existing[pos] != chunk_unique
            new_keys = chunk_unique[new_mask]
        else:
            new_keys = chunk_unique
        if len(new_keys):
            self._keys = np.concatenate([self._keys, new_keys.astype(self._keys.dtype, copy=False)])

    def _add_strings(self, ar):
        from .dispatch import StringOps
        if isinstance(ar, StringOps):
            ar = ar.ar
        if isinstance(ar, np.ndarray):
            ar = pa.array(ar.astype(object))
        if isinstance(ar, pa.ChunkedArray):
            ar = ar.combine_chunks()
        if pa.types.is_dictionary(ar.type):
            ar = ar.dictionary_decode()
        if ar.null_count and self.null_index == -1:
            self.null_index = -2
        uniques = pc.unique(ar.drop_null())
        for v in uniques.to_pylist():
            if v not in self._codes:
                self._codes[v] = len(self._keys)
                self._keys.append(v)

    def merge(self, others):
        for other in others:
            if self._is_string:
                for v in other._keys:
                    if v not in self._codes:
                        self._codes[v] = len(self._keys)
                        self._keys.append(v)
            else:
                self._add_numeric(other._keys)
            if other.null_index != -1 and self.null_index == -1:
                self.null_index = -2
            if other.nan_index != -1 and self.nan_index == -1:
                self.nan_index = -2
        self._finalize_indices()

    def _finalize_indices(self):
        """Assign final slots: base keys first, then nan, then null —
        matching the reference convention of appending special bins after the
        real keys (binner_ordinal layout [bins..., null, nan])."""
        n = len(self._keys)
        if self.nan_index == -2:
            self.nan_index = n
            n += 1
        if self.null_index == -2:
            self.null_index = n
            n += 1

    # ------------------------------------------------------------------
    def keys(self, mask=True):
        """Key array including special slots (reference: hash.py keys())."""
        self._finalize_indices()
        if self._is_string:
            out = list(self._keys)
            total = self.count
            full = [None] * total
            for i, v in enumerate(out):
                full[i] = v
            if self.has_nan:
                full[self.nan_index] = float("nan")
            return pa.array(full, type=pa.large_string() if not self.has_nan else None) if not self.has_nan else np.array(full, dtype=object)
        dtype = self._keys.dtype
        total = self.count
        if self.has_nan and dtype.kind != "f":
            dtype = np.dtype("float64")
        out = np.zeros(total, dtype=dtype)
        out[:len(self._keys)] = self._keys
        maskarr = np.zeros(total, dtype=bool)
        if self.has_nan:
            out[self.nan_index] = np.nan
        if self.has_null:
            maskarr[self.null_index] = True
        if self.dtype.is_temporal:
            out = out.view(self.dtype.numpy) if out.dtype == np.int64 else out.astype("int64").view(self.dtype.numpy)
        if mask and self.has_null:
            return np.ma.MaskedArray(out, mask=maskarr)
        return out

    def _ensure_sorted(self):
        if self._sorted_cache is None:
            self._finalize_indices()
            if self._is_string:
                self._sorted_cache = True  # strings map through dict/index_in
            else:
                order = np.argsort(self._keys, kind="stable")
                self._sorted_cache = (self._keys[order], order.astype(np.int64))
        return self._sorted_cache

    def map_ordinal(self, values):
        """values → codes; null→null_index, nan→nan_index, unknown→-1
        (reference: hash.py map())."""
        self._finalize_indices()
        if self._is_string:
            return self._map_strings(values)
        from .dispatch import StringOps
        if isinstance(values, StringOps):
            values = values.ar
        values_np, valid = array_types.extract_mask(array_types.to_numpy(values))
        values_np = np.asarray(values_np)
        if values_np.dtype.kind in "Mm":
            values_np = values_np.view(np.int64)
        # int32 codes: counts are < 2^31 and the narrower dtype halves the
        # host->device transfer when the executor ships host-mapped codes
        cdt = np.int32 if self.count < 2**31 - 4 else np.int64
        if (self._native is not None and len(self._native) == len(self._keys)
                and values_np.dtype == self._keys.dtype):
            # multithreaded C++ hash probes (src/vaex_native.cpp map):
            # insertion order IS the ordinal order; ~10x the numpy binary
            # search at 1M keys (which cache-thrashes the sorted table)
            codes = self._native.map(values_np).astype(cdt, copy=False)
            if values_np.dtype.kind == "f":
                codes = np.where(codes == -2, cdt(self.nan_index), codes)
        elif len(self._keys):
            sorted_keys, perm = self._ensure_sorted()
            pos = np.searchsorted(sorted_keys, values_np)
            pos_c = np.clip(pos, 0, len(sorted_keys) - 1)
            found = sorted_keys[pos_c] == values_np
            codes = np.where(found, perm[pos_c].astype(cdt), cdt(-1))
        else:
            codes = np.full(len(values_np), -1, dtype=cdt)
        if values_np.dtype.kind == "f":
            nanmask = np.isnan(values_np)
            codes[nanmask] = self.nan_index
        if valid is not None:
            codes[~valid] = self.null_index
        return codes

    def _map_strings(self, values):
        from .dispatch import StringOps
        ar = values.ar if isinstance(values, StringOps) else values
        if isinstance(ar, np.ndarray):
            ar = pa.array(ar.astype(object))
        if isinstance(ar, pa.ChunkedArray):
            ar = ar.combine_chunks()
        if pa.types.is_dictionary(ar.type):
            ar = ar.dictionary_decode()
        key_arr = pa.array(self._keys, type=ar.type if len(self._keys) else None)
        indices = pc.index_in(ar, value_set=key_arr)
        codes = np.asarray(indices.fill_null(-1)).astype(np.int64)
        if ar.null_count:
            nulls = np.asarray(ar.is_null())
            codes[nulls] = self.null_index
        return codes

    def _device_table_plan(self):
        """Host-side plan for the device mapping: (sorted_keys, perm_i32,
        i32_narrow).  Shared by the baked-constant and runtime-table paths
        so branch decisions stay identical (the i32-narrowing choice and the
        small/large method pick shape the traced program)."""
        sorted_keys, perm = self._ensure_sorted()
        i32 = False
        if (np.dtype(sorted_keys.dtype).kind in "iu"
                and np.dtype(sorted_keys.dtype).itemsize == 8 and len(sorted_keys)):
            tmin, tmax = int(sorted_keys[0]), int(sorted_keys[-1])
            if -2**31 + 2 < tmin and tmax < 2**31 - 2:
                i32 = True
        return sorted_keys, perm.astype(np.int32), i32

    def device_table_spec(self):
        """Structural descriptor for the compiled-program cache when the key
        table is a runtime input (execution dynamic tables): everything that
        shapes the traced program, nothing that is a value."""
        sorted_keys, _, i32 = self._device_table_plan()
        n = len(sorted_keys)
        bucket = max(64, 1 << (n - 1).bit_length()) if n else 0
        dtype = "int32" if i32 else str(np.dtype(sorted_keys.dtype))
        return dict(dtype=dtype, bucket=bucket, i32=i32)

    def device_table_meta(self):
        """meta=[nan_index, null_index, tmin, tmax] i64 for the runtime-table
        inputs (shared by the host-padded and device-resident key paths)."""
        sorted_keys, _, i32 = self._device_table_plan()
        tmin = int(sorted_keys[0]) if i32 and len(sorted_keys) else 0
        tmax = int(sorted_keys[-1]) if i32 and len(sorted_keys) else 0
        return np.array([self.nan_index, self.null_index, tmin, tmax], np.int64)

    def device_table_arrays(self):
        """Padded host arrays for the runtime-table inputs: (keys, perm,
        meta=[nan_index, null_index, tmin, tmax] i64).  Key count pads to a
        power-of-two bucket by REPEATING the last (key, perm) pair — safe
        for both mapping branches: broadcast-equality's max picks the same
        perm over the duplicates, and searchsorted('sort') lands inside a
        duplicate range whose perm is uniform."""
        sorted_keys, perm, i32 = self._device_table_plan()
        spec = self.device_table_spec()
        n = len(sorted_keys)
        skeys = sorted_keys.astype(np.int32) if i32 else sorted_keys
        pad = spec["bucket"] - n
        if pad > 0:
            skeys = np.concatenate([skeys, np.repeat(skeys[-1:], pad)])
            perm = np.concatenate([perm, np.repeat(perm[-1:], pad)])
        tmin = int(sorted_keys[0]) if i32 else 0
        tmax = int(sorted_keys[-1]) if i32 else 0
        meta = np.array([self.nan_index, self.null_index, tmin, tmax], np.int64)
        return skeys, perm, meta

    def map_ordinal_device(self, mv, tables=None):
        """Device-side mapping: binary search against the sorted key table.

        tables: optional (keys, perm, meta) traced runtime inputs (padded by
        device_table_arrays).  When given, the key table enters the compiled
        program as an ARGUMENT instead of baked constants — a fresh table of
        the same structure (dtype/bucket/narrowing) reuses the compiled pass
        (execution dynamic tables; same idea as dynamic bin limits).  When
        None, keys/perm become trace constants as before."""
        import jax.numpy as jnp
        from .dispatch import MV
        self._finalize_indices()
        if self._is_string:
            raise NotImplementedError("string mapping happens host-side (dictionary-encode at ingest)")
        sorted_keys, perm, i32 = self._device_table_plan()
        values = mv.values if isinstance(mv, MV) else mv
        mask = mv.mask if isinstance(mv, MV) else None
        if tables is not None and len(sorted_keys):
            skeys, jperm, meta = tables
            if i32:
                # 64-bit integer keys whose range fits int32: compare/sort in
                # 32-bit.  Values clip to [tmin-1, tmax+1] (runtime scalars
                # from meta) first so out-of-range rows map to a value NOT in
                # the table — a miss, never a false equality after the cast.
                values = jnp.clip(values, meta[2] - 1, meta[3] + 1).astype(jnp.int32)
            elif values.dtype != skeys.dtype:
                values = values.astype(skeys.dtype)
            nan_code = meta[0].astype(jnp.int32)
            null_code = meta[1].astype(jnp.int32)
        else:
            if values.dtype != sorted_keys.dtype:
                values = values.astype(sorted_keys.dtype)
            # int32 codes (counts < 2^31) keep the downstream pass in 32-bit;
            # searchsorted method picked by table size: the default 'scan' is
            # ~7-17x slower on TPU (measured 8M rows: scan 1.29s,
            # compare_all 0.17s small tables, sort 0.24s large tables)
            if i32:
                tmin, tmax = int(sorted_keys[0]), int(sorted_keys[-1])
                # see the runtime-table branch for the clip rationale
                sorted_keys = sorted_keys.astype(np.int32)
                values = jnp.clip(values, tmin - 1, tmax + 1).astype(jnp.int32)
            skeys = jnp.asarray(sorted_keys)
            jperm = jnp.asarray(perm)
            nan_code = np.int32(self.nan_index)
            null_code = np.int32(self.null_index)
        n_table = skeys.shape[0]
        dense = None
        if (tables is None and n_table
                and np.dtype(sorted_keys.dtype).kind in "iu"):
            # dense direct-address fast path for small-span integer keys
            # (trace-constant table): ONE gather per row instead of the
            # broadcast-equality's O(keys) compares — a 265-key zone join at
            # 1e8 rows was ~15s on the VPU compare, ~0.2s as a gather
            kmin = int(np.asarray(sorted_keys[0]))
            kmax = int(np.asarray(sorted_keys[-1]))
            span = kmax - kmin + 1
            if 0 < span <= max(65536, 4 * n_table):
                dense_np = np.full(span, -1, np.int32)
                dense_np[np.asarray(sorted_keys).astype(np.int64) - kmin] = \
                    np.asarray(perm, np.int32)
                wide = jnp.int64 if np.dtype(str(values.dtype)).itemsize == 8 \
                    else jnp.int32
                offs = values.astype(wide) - wide(kmin)
                in_range = (offs >= 0) & (offs < span)
                offs32 = jnp.clip(offs, 0, span - 1).astype(jnp.int32)
                dense = jnp.where(in_range,
                                  jnp.asarray(dense_np)[offs32], np.int32(-1))
        if dense is not None:
            codes = dense
        elif not n_table:
            codes = jnp.full(values.shape, -1, dtype=jnp.int32)
        elif n_table <= 512:
            # broadcast equality + reduce: no gathers (TPU gathers over
            # millions of rows dominate the pass; the [rows, keys] compare
            # fuses into a VPU reduction, measured ~10x faster than
            # searchsorted + found-check gathers at 16M rows x 100 keys)
            eq = values[:, None] == skeys[None, :]
            code1 = (eq * (jperm[None, :] + np.int32(1))).max(axis=1).astype(jnp.int32)
            codes = code1 - np.int32(1)
        else:
            pos = jnp.searchsorted(skeys, values, method="sort")
            pos_c = jnp.clip(pos, 0, n_table - 1).astype(jnp.int32)
            found = skeys[pos_c] == values
            codes = jnp.where(found, jperm[pos_c], np.int32(-1))
        if jnp.issubdtype(values.dtype, jnp.floating):
            codes = jnp.where(jnp.isnan(values), nan_code, codes)
        if mask is not None:
            codes = jnp.where(mask, null_code, codes)
        return MV(codes, None)

    def isin(self, values):
        codes = self.map_ordinal(values)
        return codes >= 0

    def sorted(self, keys=None, ascending=True, indices=None, return_keys=False):
        """New hashmap with keys sorted; codes remap via .map_ordinal
        (reference: hash.py:258)."""
        self._finalize_indices()
        if self._is_string:
            order = np.argsort(np.array(self._keys, dtype=object), kind="stable")
            if not ascending:
                order = order[::-1]
            new = HashMapUnique(self.dtype)
            for i in order:
                v = self._keys[i]
                new._codes[v] = len(new._keys)
                new._keys.append(v)
        else:
            order = np.argsort(self._keys, kind="stable")
            if not ascending:
                order = order[::-1]
            new = HashMapUnique(self.dtype)
            new._keys = self._keys[order]
        new.null_index = -2 if self.has_null else -1
        new.nan_index = -2 if self.has_nan else -1
        new._finalize_indices()
        if return_keys:
            return new, new.keys()
        return new

    def __getstate__(self):
        # the device-resident key table is a per-process accelerator cache:
        # pickling it would serialize the whole padded HBM array
        state = dict(self.__dict__)
        state.pop("_device_sorted_keys", None)
        return state

    def encode(self, encoding):
        keys = self._keys if not self._is_string else list(self._keys)
        return dict(dtype=str(self.dtype), keys=np.asarray(keys).tolist() if not self._is_string else keys,
                    null_index=self.null_index, nan_index=self.nan_index)

    @classmethod
    def decode(cls, encoding, spec):
        hm = cls(np.dtype(spec["dtype"]) if spec["dtype"] not in ("string", "object") else np.dtype(object))
        if hm._is_string:
            hm._keys = list(spec["keys"])
            hm._codes = {v: i for i, v in enumerate(hm._keys)}
        else:
            hm._keys = np.asarray(spec["keys"])
        hm.null_index = spec["null_index"]
        hm.nan_index = spec["nan_index"]
        return hm


class _HashMapDeviceView:
    """Trace-time proxy handed to device expressions when the key table
    arrives as a runtime input (execution dynamic tables): mapping reads the
    traced arrays instead of baking constants; everything else delegates."""

    def __init__(self, hm, tables):
        self._hm = hm
        self._tables = tables

    def map_ordinal_device(self, mv):
        return self._hm.map_ordinal_device(mv, tables=self._tables)

    def __getattr__(self, name):
        return getattr(self._hm, name)


class _DeviceUniqueBuilder:
    """Device sort-based unique build for plain integer columns.

    The host ordered-set probe (src/vaex_native.cpp) runs ~14M rows/s at 1M
    keys (measured, 16.7M rows) and dominates high-cardinality groupby
    (VERDICT r1 #3).  On device the whole build is: concat chunk arrays →
    one sort → segment-boundary mask → compaction scatter → fetch of the M
    unique keys.  Keys come out ASCENDING (the device-native order; group
    order is unspecified for sort=False, and ascending equals sort=True's
    order) and the facade's sorted-cache is primed for free.

    Eligibility is decided by `eligible()`: a stored non-masked integer or
    temporal column, no selection, no return_inverse, and total row bytes
    under VAEX_TPU_DEVICE_UNIQUE_MAX_BYTES (device memory bound).
    """

    MAX_BYTES = None  # resolved lazily from env

    def __init__(self, task):
        self.task = task
        self.dtype = task.df.data_type(task.expression)
        self.limit = task.limit
        self.limit_raise = task.limit_raise
        self._parts = []        # device value arrays (padded ok)
        self._valids = []       # device bool arrays or None (all valid)
        self._any_invalid = False
        self._host_fallback = None  # set when the cardinality probe says host
        self._saw_nan = False   # float keys: NaN rows excluded, nan_index set
        self._range_counts = None  # per-key counts from the range-count pass
        # f64 keys sort as order-preserving i64 (exact; device f64 compares
        # are dd-emulated with ulp noise AND the f64 H2D itself is lossy —
        # the transform runs host-side at memory bandwidth, gridagg._f64_to_key)
        self._f64_keys = self.dtype.numpy == np.dtype("float64")

    @classmethod
    def max_bytes(cls):
        if cls.MAX_BYTES is None:
            import os
            cls.MAX_BYTES = int(utils.parse_memory_size(
                os.environ.get("VAEX_TPU_DEVICE_UNIQUE_MAX_BYTES", "2GB")))
        return cls.MAX_BYTES

    MAX_DEVICE_BYTES = None

    @classmethod
    def device_max_bytes(cls):
        """Cap for already-device-resident columns (sort scratch bound; no
        H2D involved): 12GB default on a 16GB-HBM chip."""
        if cls.MAX_DEVICE_BYTES is None:
            import os
            cls.MAX_DEVICE_BYTES = int(utils.parse_memory_size(
                os.environ.get("VAEX_TPU_DEVICE_UNIQUE_MAX_DEVICE_BYTES", "12GB")))
        return cls.MAX_DEVICE_BYTES

    @classmethod
    def eligible(cls, task):
        df = task.df
        expr = task.expression
        if task.selection is not None or task.return_inverse:
            return False
        dtype = df.data_type(expr)
        if not (dtype.is_temporal or (dtype.is_numeric and dtype.numpy.kind in "iuf")):
            return False
        if dtype.numpy.kind == "f" and expr not in df.dataset:
            # float keys: plain stored columns only — NaN tracking and the
            # exact f64->i64 key transform both run host-side per chunk
            return False
        if expr in df.dataset:
            col = df.dataset[expr]
            if array_types.is_jax_array(col):
                # device-resident integer columns: ALWAYS build on device —
                # any host path pays a full-column D2H first (1e9 i32 = 4GB
                # over the link), and device columns carry no missing mask.
                # Bound by the sort scratch, not the H2D cap below.
                if dtype.numpy.kind not in "iu" and not dtype.is_temporal:
                    return False
                rows_d = df._length_unfiltered
                return rows_d * max(dtype.numpy.itemsize, 4) * 3 <= \
                    cls.device_max_bytes()
            if not isinstance(col, np.ndarray) or np.ma.isMaskedArray(col):
                return False
        else:
            # virtual integer keys (e.g. GrouperCombined's packed multi-key)
            # are eligible when the whole expression evaluates on device and
            # every root column is a plain stored numeric array
            from .scopes import expression_is_device_compatible
            from .expression import Expression
            if not expression_is_device_compatible(df, expr):
                return False
            for name in Expression(df, expr).root_columns():
                if name not in df.dataset:
                    return False
                col = df.dataset[name]
                if not (array_types.is_jax_array(col)
                        or (isinstance(col, np.ndarray)
                            and not np.ma.isMaskedArray(col))):
                    return False
                ct = df.data_type(name)
                if not (ct.is_temporal or ct.is_numeric or ct.is_bool):
                    return False
        rows = df._length_unfiltered
        if rows * max(dtype.numpy.itemsize, 8) > cls.max_bytes():
            return False
        return rows >= 262_144  # small data: host probe wins on latency

    # below this many uniques the host incremental probe is far cheaper than
    # a device sort (TPU i64 sorts are emulated; measured 12.6s for a 100-key
    # 16.7M-row unique that the host does in 53ms)
    LOW_CARDINALITY = 65_536
    _probe_decisions = {}  # (dataset fp, expr) -> "host" | "device"

    def process_chunks(self, chunks, i1, i2, filter_mask_host, get_host_scope=None,
                       cache_key=None):
        import jax
        import jax.numpy as jnp
        if self._host_fallback is not None:
            self._host_fallback.process(get_host_scope(), i1, i2, filter_mask_host)
            return
        expr = self.task.expression
        plain = expr in chunks
        if plain and array_types.is_jax_array(chunks[expr]):
            # device-resident column: no host probe, no D2H — append the
            # chunk slice as-is (the range-count/sort decision happens at
            # finish(), where the whole column's span is known)
            part = chunks[expr]
            self._parts.append(part)
            if filter_mask_host is not None:
                fm = jax.device_put(np.ascontiguousarray(filter_mask_host))
                self._valids.append(jnp.asarray(fm))
                self._any_invalid = True
            else:
                self._valids.append(None)
            return
        host_values = np.asarray(chunks[expr]) if plain else None
        if not self._parts and get_host_scope is not None:
            # first chunk: probe cardinality on host — low-cardinality keys
            # (the overwhelmingly common categorical case) are much cheaper
            # to build incrementally on host than to sort on device.  The
            # decision is cached per (dataset, expression) so repeat calls
            # skip the probe pass.
            probe_key = (self.task.df.dataset.fingerprint, expr)
            decision = self._probe_decisions.get(probe_key)
            if decision is None:
                import pandas as pd
                probe = host_values if plain else np.asarray(
                    array_types.to_numpy(get_host_scope().evaluate(expr)))
                decision = "host" if len(pd.unique(probe)) <= self.LOW_CARDINALITY \
                    else "device"
                if len(self._probe_decisions) > 1024:
                    self._probe_decisions.clear()
                self._probe_decisions[probe_key] = decision
            if decision == "host":
                self._host_fallback = _HashmapBuilder(self.task)
                self._host_fallback.process(get_host_scope(), i1, i2, filter_mask_host)
                return
        n = i2 - i1
        L = cache_key[3] if cache_key is not None else n
        nan_mask = None
        if plain and host_values.dtype.kind == "f":
            # float keys: canonicalize -0.0 == 0.0 (one key, like the
            # reference hash), exclude NaN rows (tracked -> nan_index)
            host_values = np.where(host_values == 0, 0.0, host_values).astype(
                host_values.dtype, copy=False)
            nans = np.isnan(host_values)
            if nans.any():
                self._saw_nan = True
                nan_mask = ~nans
            if self._f64_keys:
                # exact order-preserving i64 keys, computed host-side (the
                # f64 H2D path is lossy dd); cached under a derived name so
                # the raw column's cache slot stays untouched
                bits = host_values.view(np.int64)
                keys = np.where(bits < 0, bits ^ np.int64(0x7FFFFFFFFFFFFFFF), bits)
                values = self._put_cached(expr + "!f64key", keys, cache_key)
            else:
                values = self._put_cached(expr, host_values, cache_key)
        elif plain:
            values = self._put_cached(expr, host_values, cache_key)
        else:
            values = self._eval_device(chunks, cache_key)
        self._parts.append(values)
        # validity: real rows only, minus filtered rows.  Padding from the
        # shared device cache layout makes validity mandatory whenever L != n
        if filter_mask_host is not None or L != n or nan_mask is not None:
            valid = jnp.arange(L, dtype=jnp.int32) < n
            from .execution import _pad_to
            if filter_mask_host is not None:
                fm = jax.device_put(_pad_to(np.ascontiguousarray(filter_mask_host), L, fill=False))
                valid = valid & fm
            if nan_mask is not None:
                nm = jax.device_put(_pad_to(np.ascontiguousarray(nan_mask), L, fill=False))
                valid = valid & nm
            self._valids.append(valid)
            self._any_invalid = True
        else:
            self._valids.append(None)

    def _put_cached(self, name, values_np, cache_key):
        """Host chunk → device, through the executor's HBM column cache —
        the same (dataset, column, range, pad) keys the aggregation path
        uses, so repeated unique/groupby calls pay the H2D once (the r2
        regression: an uncached 134MB i64 upload per call over the tunnel)."""
        import jax
        from .execution import _device_cache, _device_view, _pad_to
        values_np = _device_view(values_np)
        if cache_key is None:
            return jax.device_put(values_np)
        ds_fp, a1, a2, L = cache_key
        key = (ds_fp, name, a1, a2, L)
        hit = _device_cache.get(key)
        if hit is not None:
            return hit[0]
        dv = jax.device_put(_pad_to(values_np, L))
        _device_cache.put(key, (dv, None))
        return dv

    def _eval_device(self, chunks, cache_key):
        """Virtual integer key: evaluate the expression on device (jitted
        DeviceScope over the chunk's cached root columns)."""
        import jax
        from .expression import Expression
        from .scopes import DeviceScope
        df = self.task.df
        names = sorted(Expression(df, self.task.expression).root_columns())
        L = cache_key[3] if cache_key is not None else None
        cols = {}
        for n in names:
            raw = chunks[n]
            if array_types.is_jax_array(raw):
                # device-resident root: no D2H round trip; pad to the cache
                # bucket length so mixed host/device roots shape-agree
                if L is not None and raw.shape[0] != L:
                    import jax.numpy as jnp
                    raw = jnp.concatenate(
                        [raw, jnp.zeros(L - raw.shape[0], raw.dtype)])
                cols[n] = raw
            else:
                cols[n] = self._put_cached(n, np.asarray(raw), cache_key)
        if not hasattr(self, "_eval_jit"):
            expr = self.task.expression

            def run(cols):
                mv = DeviceScope(df, values=cols, masks={}).evaluate(expr)
                return mv.values

            self._eval_jit = jax.jit(run)
        return self._eval_jit(cols)

    def finish(self):
        import jax
        import jax.numpy as jnp
        if self._host_fallback is not None:
            return self._host_fallback.finish()
        if not self._parts:
            hm = HashMapUnique(self.dtype)
            hm._finalize_indices()
            return hm
        keys_fast = self._range_count_keys()
        if keys_fast is not None:
            hm = self._build_result(keys_fast)
            if self._range_counts is not None:
                hm._key_counts = self._range_counts
            return hm
        cat = jnp.concatenate(self._parts)
        valid = None
        if self._any_invalid:
            valid = jnp.concatenate([
                v if v is not None else jnp.ones(p.shape[0], bool)
                for p, v in zip(self._parts, self._valids)])
        if valid is not None:
            # 2-key sort (validity major): invalid rows land at the end
            # regardless of value — no in-band sentinel that could collide
            inv_s, s = jax.lax.sort((~valid, cat), num_keys=2)
            valid_s = ~inv_s
        else:
            s = jnp.sort(cat)
            valid_s = None

        @jax.jit
        def boundaries(s, valid_s):
            first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
            if valid_s is not None:
                first = first & valid_s
            return first, first.sum()

        first, count = boundaries(s, valid_s)
        count = int(count)
        if self.limit is not None and count > self.limit:
            if self.limit_raise:
                from . import RowLimitException
                raise RowLimitException(
                    f"number of unique values {count} exceeds limit {self.limit}")
            count = self.limit

        @functools.partial(jax.jit, static_argnames=("k",))
        def compact(s, first, k):
            pos = jnp.cumsum(first) - 1
            tgt = jnp.where(first & (pos < k), pos, k)
            return jnp.zeros(k + 1, s.dtype).at[tgt].set(s)[:k]

        # power-of-two bucket for the compaction width: a static k equal to
        # the exact unique count would recompile for every dataset (remote
        # XLA compiles are ~30s; q10's combined-key discovery paid several)
        k_pad = max(64, 1 << (max(count, 1) - 1).bit_length())
        dev_keys = compact(s, first, k_pad)
        keys = np.asarray(jax.device_get(dev_keys))[:count]
        hm = self._build_result(keys)
        if count and k_pad == max(64, 1 << (count - 1).bit_length()):
            # stash the device-resident sorted keys, padded to the runtime-
            # table bucket by repeating the LAST key (compact's tail is
            # zeros): the executor's dynamic-table inputs reuse this array
            # directly instead of re-uploading the padded host copy — at 63M
            # combined keys over a ~35MB/s tunnel that upload alone is ~8s
            last = dev_keys[max(count - 1, 0)]
            hm._device_sorted_keys = jnp.where(
                jnp.arange(k_pad, dtype=jnp.int32) < count, dev_keys, last)
        return hm

    # int keys whose observed span fits a count grid skip the sort entirely:
    # one flat-cell count pass (Pallas MXU on TPU, ~2B rows/s) and the keys
    # are min + nonzero cells.  This is what makes `unique`/`value_counts`
    # on a 1e9-row device column interactive (the sort path is ~80M rows/s
    # at that scale; the old host fallback paid a 4GB D2H first).
    RANGE_COUNT_CELLS = 1 << 20

    # target element count per grouped device call: each dispatch over the
    # tunnel has a fixed RTT cost, so the 1e9-row build in 8M chunks pays
    # ~120 RTTs per pass if driven per-part; concatenating parts into ~64M-
    # element groups (<=512MB i64 scratch, never a full-column copy) brings
    # that to ~16 dispatches total
    GROUP_ELEMS = 64 << 20

    def _iter_part_groups(self):
        """Yield (values, valid|None) with per-chunk parts concatenated into
        ~GROUP_ELEMS groups (one device concat per group, freed after use)."""
        import jax.numpy as jnp

        def flush(group, gval):
            v = group[0] if len(group) == 1 else jnp.concatenate(group)
            if any(x is not None for x in gval):
                va = gval[0] if len(group) == 1 else jnp.concatenate([
                    x if x is not None else jnp.ones(p.shape[0], bool)
                    for p, x in zip(group, gval)])
            else:
                va = None
            return v, va

        group, gval, elems = [], [], 0
        for p, va in zip(self._parts, self._valids):
            if not p.shape[0]:
                continue
            group.append(p)
            gval.append(va)
            elems += p.shape[0]
            if elems >= self.GROUP_ELEMS:
                yield flush(group, gval)
                group, gval, elems = [], [], 0
        if group:
            yield flush(group, gval)

    def _range_count_keys(self):
        """Streaming grouped counts: NO full-column concat (a 1e9 i32 column
        would copy 4GB) and NO full-length int64 temporaries (the x64 cast of
        1e9 rows is 8GB and OOMed a 16GB chip).  The per-cell counts come out
        of the same pass for free and are stashed for value_counts()."""
        import jax
        import jax.numpy as jnp
        np_dt = np.dtype(str(self._parts[0].dtype))
        if np_dt.kind not in "iu" or self._f64_keys:
            return None

        big = np.iinfo(np_dt).max
        small = np.iinfo(np_dt).min

        @jax.jit
        def part_minmax(v, valid):
            if valid is not None:
                mn = jnp.min(jnp.where(valid, v, np_dt.type(big)))
                mx = jnp.max(jnp.where(valid, v, np_dt.type(small)))
                return mn, mx, jnp.any(valid)
            return jnp.min(v), jnp.max(v), jnp.asarray(v.shape[0] > 0)

        vmin, vmax, any_valid = big, small, False
        pending = [part_minmax(v, va) for v, va in self._iter_part_groups()]
        # ONE batched fetch: a per-group device_get is a tunnel round trip each
        for mn, mx, av in jax.device_get(pending):
            if bool(av):
                any_valid = True
                vmin = min(vmin, int(mn))
                vmax = max(vmax, int(mx))
        if not any_valid:
            return None
        span = vmax - vmin + 1
        if not (0 < span <= self.RANGE_COUNT_CELLS):
            return None
        # power-of-two bucket: spans in the same bucket share one compile
        C = max(64, 1 << (span - 1).bit_length())

        @functools.partial(jax.jit, static_argnames=("C",))
        def cell_counts(v, valid, vmin0, C):
            # subtract in the narrowest safe width: <=16-bit widens to i32,
            # i32 subtracts in i32 (invalid rows are pre-substituted with
            # vmin so the difference always lies in [0, span)), i64 in i64
            w = v.astype(jnp.int32) if np_dt.itemsize <= 2 else v
            vm = vmin0.astype(w.dtype)
            if valid is not None:
                w = jnp.where(valid, w, vm)
            c = (w - vm).astype(jnp.int32)
            if valid is not None:
                c = jnp.where(valid, c, -1)
            from .ops import pallas_gridagg
            if jax.default_backend() == "tpu" and pallas_gridagg.available():
                cnt, _ = pallas_gridagg.histflat_grid(c, (), C, with_count=True)
            else:
                routed = jnp.where(c >= 0, c, C)
                cnt = jnp.zeros(C + 1, jnp.int32).at[routed].add(1)[:C]
            # accumulate in i64: at 1e9+ rows a single hot cell can overflow
            # the per-group i32 count only across groups, never within one
            return cnt.astype(jnp.int64)

        acc = None
        vmin_arr = jnp.asarray(vmin, dtype=np_dt if np_dt.itemsize > 2 else np.int32)
        for v, va in self._iter_part_groups():
            cnt = cell_counts(v, va, vmin_arr, C)
            acc = cnt if acc is None else acc + cnt
        counts_np = np.asarray(jax.device_get(acc))[:span]
        idx = np.nonzero(counts_np)[0]
        if self.limit is not None and len(idx) > self.limit:
            if self.limit_raise:
                from . import RowLimitException
                raise RowLimitException(
                    f"number of unique values {len(idx)} exceeds limit {self.limit}")
            idx = idx[:self.limit]
        self._range_counts = counts_np[idx]
        return (vmin + idx).astype(np_dt, copy=False)

    def _build_result(self, keys):
        np_dtype = self.dtype.numpy if not self.dtype.is_temporal else np.dtype("int64")
        hm = HashMapUnique(self.dtype)
        hm._native = None
        if self._f64_keys:
            # decode the order-preserving i64 keys back to f64 (ascending
            # key order == ascending float order, gridagg._key_to_f64)
            from .ops.gridagg import _key_to_f64
            keys = _key_to_f64(np.asarray(keys))
        hm._keys = np.asarray(keys).astype(np_dtype, copy=False)
        hm._sorted_cache = (hm._keys, np.arange(len(hm._keys), dtype=np.int64))
        if self._saw_nan:
            hm.nan_index = -2
        hm._finalize_indices()
        return hm


class _HashmapBuilder:
    """Executor-side incremental builder for TaskHashmapUniqueCreate."""

    def __init__(self, task):
        self.task = task
        dtype = task.df.data_type(task.expression)
        self.hashmap = HashMapUnique(dtype, limit=task.limit if task.limit_raise else None)
        self.soft_limit = task.limit if not task.limit_raise else None
        self._limited = False

    def process(self, host_scope, i1, i2, filter_mask):
        from . import array_types as at
        values = host_scope.evaluate(self.task.expression)
        if self.task.pre_filter and filter_mask is not None:
            values = at.filter_array(values, filter_mask)
        if self.task.selection is not None:
            sel_expr = self.task.df._selection_expression(self.task.selection)
            from .execution import _to_bool_mask
            sel = _to_bool_mask(host_scope.evaluate(sel_expr))
            if self.task.pre_filter and filter_mask is not None:
                sel = sel[filter_mask]
            values = at.filter_array(values, sel)
        if self._limited:
            return
        self.hashmap.add(values)
        if self.soft_limit is not None and self.hashmap.count > self.soft_limit:
            self._limited = True

    def finish(self):
        self.hashmap._finalize_indices()
        return self.hashmap
