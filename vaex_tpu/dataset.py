"""Immutable datasets: ordered name→column mappings with structural sharing.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/dataset.py:
`Dataset` is a Mapping of column name → column (numpy / Arrow / lazy Column),
decorated lazily for rename/slice/take/drop/merge/concat, fingerprinted for
caching, and streamed through `chunk_iterator` — the host-side feed of the
TPU executor.
"""

from __future__ import annotations

import collections.abc
from functools import reduce

import numpy as np

from . import array_types, utils
from .column import Column, ColumnConcatenated, ColumnIndexed
from .datatype import DataType

_dataset_types = {}

# identity fingerprints for device-resident (jax.Array) columns: immutable
# objects, so one uuid per object; salted per process since device buffers
# never survive a process (keeps disk/redis cache keys collision-free)
_jax_fp_memo = {}   # id(array) -> fp; weakref.finalize evicts on GC so a
_jax_fp_salt = None  # recycled id can never alias a dead array's key


def _jax_array_fingerprint(col):
    global _jax_fp_salt
    key = id(col)
    fp = _jax_fp_memo.get(key)
    if fp is None:
        import uuid
        import weakref
        if _jax_fp_salt is None:
            _jax_fp_salt = uuid.uuid4().hex
        fp = utils.fingerprint(
            "jax", _jax_fp_salt, uuid.uuid4().hex, str(col.dtype), col.shape)
        _jax_fp_memo[key] = fp
        weakref.finalize(col, _jax_fp_memo.pop, key, None)
    return fp


def register(cls):
    _dataset_types[cls.snake_name] = cls
    return cls


def _len_of(col):
    return len(col)


def chunk_rechunk(chunk_iter, chunk_size, row_count):
    """Re-chunk a (i1, i2, chunks) stream to fixed-size chunks
    (reference: vaex/dataset.py:282)."""
    buffer = {}
    buffer_rows = 0
    start = 0
    for i1, i2, chunks in chunk_iter:
        for name, chunk in chunks.items():
            buffer.setdefault(name, []).append(chunk)
        buffer_rows += i2 - i1
        while buffer_rows >= chunk_size:
            out = {}
            rest = {}
            for name, parts in buffer.items():
                merged = array_types.concat(parts) if len(parts) > 1 else parts[0]
                out[name] = array_types.slice_array(merged, 0, chunk_size)
                rest[name] = [array_types.slice_array(merged, chunk_size, _len_of(merged))]
            yield start, start + chunk_size, out
            start += chunk_size
            buffer = rest
            buffer_rows -= chunk_size
    if buffer_rows:
        out = {name: (array_types.concat(parts) if len(parts) > 1 else parts[0]) for name, parts in buffer.items()}
        yield start, start + buffer_rows, out


def _column_is_masked(col):
    """Maskedness of any column form (ndarray, arrow, Column wrappers)."""
    from .column import ColumnNulls

    if isinstance(col, np.ndarray):
        return np.ma.isMaskedArray(col)
    if array_types.is_arrow_array(col):
        return col.null_count > 0
    if isinstance(col, ColumnIndexed):
        return col.masked
    if isinstance(col, ColumnNulls):
        return True
    if isinstance(col, ColumnConcatenated):
        return any(_column_is_masked(part) for part in col.columns)
    return False


class Dataset(collections.abc.Mapping):
    """Reference: vaex/dataset.py:323."""

    snake_name = "dataset"

    def __init__(self):
        self._columns = {}
        self._row_count = None
        self._fingerprint_cached = None

    # -- Mapping interface
    def __getitem__(self, name):
        return self._columns[name]

    def __iter__(self):
        return iter(self._columns)

    def __len__(self):
        return len(self._columns)

    def __eq__(self, other):
        if not isinstance(other, Dataset):
            return NotImplemented
        return self.fingerprint == other.fingerprint

    def __hash__(self):
        return hash(self.fingerprint)

    @property
    def row_count(self):
        return self._row_count

    @property
    def fingerprint(self):
        if self._fingerprint_cached is None:
            self._fingerprint_cached = "dataset-" + self.snake_name + "-" + self._fingerprint()
        return self._fingerprint_cached

    def _fingerprint(self):
        raise NotImplementedError

    def data_type(self, name) -> DataType:
        return array_types.data_type(self._columns[name])

    def schema(self):
        return {name: self.data_type(name) for name in self}

    def shapes(self):
        return {name: (self.row_count,) for name in self}

    # -- chunk streaming
    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        """Yield (i1, i2, {name: chunk}) over [start, end).

        Reference: vaex/dataset.py:528.  Chunks are host arrays; the executor
        pads and ships them to the device.
        """
        chunk_size = chunk_size or 1024 * 1024
        end = self.row_count if end is None else end
        yield from self._default_chunk_iterator(columns, chunk_size, start, end)

    def _default_chunk_iterator(self, columns, chunk_size, start, end):
        i1 = start
        while i1 < end:
            i2 = min(i1 + chunk_size, end)
            chunks = {}
            for name in columns:
                col = self._columns[name]
                if isinstance(col, Column):
                    chunks[name] = col[slice(int(i1), int(i2))]
                else:
                    chunks[name] = array_types.slice_array(col, i1, i2)
            yield i1 - start, i2 - start, chunks
            i1 = i2

    # -- lazy decorators (structural sharing)
    def renamed(self, renaming):
        return DatasetRenamed(self, renaming)

    def sliced(self, start, end):
        if start == 0 and end == self.row_count:
            return self
        return DatasetSliced(self, start, end)

    def take(self, indices, masked=False):
        return DatasetTake(self, indices, masked=masked)

    def filtered(self, mask):
        indices = np.nonzero(np.asarray(mask))[0]
        return DatasetTake(self, indices)

    def dropped(self, *names):
        return DatasetDropped(self, names)

    def project(self, *names):
        keep = set(names)
        drop = [n for n in self if n not in keep]
        return self.dropped(*drop) if drop else self

    def merged(self, other):
        return DatasetMerged(self, other)

    def concat(self, *others, resolver="flexible"):
        datasets = []
        for ds in (self,) + others:
            if isinstance(ds, DatasetConcatenated):
                datasets.extend(ds.datasets)
            else:
                datasets.append(ds)
        return DatasetConcatenated(datasets, resolver=resolver)

    def shifted(self, n, fill_value=None, column_names=None):
        from .shift import DatasetShifted
        return DatasetShifted(self, n, fill_value=fill_value, column_names=column_names)

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_fingerprint_cached", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._fingerprint_cached = None

    def close(self):
        pass

    def is_masked(self, name):
        return _column_is_masked(self._columns[name])


@register
class DatasetArrays(Dataset):
    """In-memory dict of arrays (reference: vaex/dataset.py `DatasetArrays`)."""

    snake_name = "arrays"

    def __init__(self, mapping=None, **kwargs):
        super().__init__()
        columns = dict(mapping or {})
        columns.update(kwargs)
        for name, col in columns.items():
            # plain python sequences become arrays first (reference:
            # dataset.py:204 to_supported_array np.asanyarray)
            if not isinstance(col, (np.ndarray, Column)) and not array_types.is_arrow_array(col) \
                    and not array_types.is_jax_array(col):
                col = columns[name] = np.asanyarray(col)
            # object/str numpy arrays become Arrow strings at ingestion (the
            # reference converts to superstrings the same way) so every
            # downstream consumer — exporters included — sees one string type
            if isinstance(col, np.ndarray) and col.dtype.kind in "OU" and not np.ma.isMaskedArray(col):
                values = col.tolist()
                if all(v is None or isinstance(v, str) for v in values):
                    try:
                        import pyarrow as pa
                        columns[name] = pa.array(values, type=pa.string())
                    except Exception:
                        pass
        lengths = {name: _len_of(col) for name, col in columns.items()}
        if lengths and len(set(lengths.values())) > 1:
            raise ValueError(f"columns have different lengths: {lengths}")
        self._columns = columns
        self._row_count = next(iter(lengths.values())) if lengths else 0

    def _fingerprint(self):
        parts = {}
        for name, col in self._columns.items():
            if isinstance(col, Column):
                parts[name] = col.fingerprint()
            elif isinstance(col, np.ndarray):
                if np.ma.isMaskedArray(col):
                    # the mask is content: without it a masked column hashes
                    # identically to its plain data and the result cache
                    # returns the unmasked answers (caught by dtypes_test)
                    parts[name] = (utils.hash_array_data(col.data),
                                   utils.hash_array_data(np.ma.getmaskarray(col)))
                else:
                    parts[name] = utils.hash_array_data(col)
            elif array_types.is_jax_array(col):
                # device array: identity fingerprint.  jax.Arrays are
                # immutable and device buffers cannot outlive the process,
                # so (per-process salt, per-object uuid) is a sound cache
                # key — and it needs ZERO device work (a content prefix
                # hash pays a remote slice compile + D2H; measured 170s on
                # a contended tunnel)
                parts[name] = _jax_array_fingerprint(col)
            else:  # arrow
                import hashlib
                h = hashlib.blake2b(digest_size=16)
                ar = col.combine_chunks() if hasattr(col, "combine_chunks") else col
                h.update(str(ar.type).encode())
                for buf in (ar.buffers() if hasattr(ar, "buffers") else []):
                    if buf is not None:
                        h.update(bytes(buf)[:1024 * 1024])
                parts[name] = h.hexdigest()
        return utils.fingerprint(parts)


class DatasetDecorator(Dataset):
    def __init__(self, original):
        super().__init__()
        self.original = original

    def close(self):
        self.original.close()


@register
class DatasetRenamed(DatasetDecorator):
    """Reference: vaex/dataset.py:614."""

    snake_name = "rename"

    def __init__(self, original, renaming):
        super().__init__(original)
        self.renaming = dict(renaming)
        self.reverse = {v: k for k, v in renaming.items()}
        self._columns = {renaming.get(name, name): col for name, col in original.items()}
        self._row_count = original.row_count

    def _fingerprint(self):
        return utils.fingerprint(self.original.fingerprint, self.renaming)

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        original_names = [self.reverse.get(name, name) for name in columns]
        for i1, i2, chunks in self.original.chunk_iterator(original_names, chunk_size, reverse, start=start, end=end):
            yield i1, i2, {new: chunks[old] for new, old in zip(columns, original_names)}


@register
class DatasetSliced(DatasetDecorator):
    """Row range view (reference: vaex/dataset.py DatasetSliced)."""

    snake_name = "slice"

    def __init__(self, original, start, end):
        super().__init__(original)
        self.start = start
        self.end = end
        self._row_count = end - start
        self._columns = {name: col for name, col in original.items()}

    def __getitem__(self, name):
        col = self.original[name]
        if isinstance(col, Column):
            return col.trim(self.start, self.end)
        return array_types.slice_array(col, self.start, self.end)

    def _fingerprint(self):
        return utils.fingerprint(self.original.fingerprint, self.start, self.end)

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        end = self._row_count if end is None else end
        yield from self.original.chunk_iterator(columns, chunk_size, reverse, start=self.start + start, end=self.start + end)


@register
class DatasetTake(DatasetDecorator):
    """Row subset via index array — joins and materialized filters
    (reference: vaex/dataset.py DatasetTake)."""

    snake_name = "take"

    def __init__(self, original, indices, masked=False):
        super().__init__(original)
        # device (jax.Array) index vectors stay resident: every column gather
        # then happens on device (sort/join over device-resident frames)
        self.indices = indices if array_types.is_jax_array(indices) else np.asarray(indices)
        self.masked = masked
        self._columns = {name: ColumnIndexed.index(col, self.indices, masked=masked) if isinstance(col, Column)
                         else ColumnIndexed(col, self.indices, masked=masked)
                         for name, col in original.items()}
        self._row_count = len(self.indices)

    def _fingerprint(self):
        if array_types.is_jax_array(self.indices):
            idx_fp = _jax_array_fingerprint(self.indices)
        else:
            idx_fp = utils.hash_array_data(self.indices)
        return utils.fingerprint(self.original.fingerprint, idx_fp, self.masked)


@register
class DatasetDropped(DatasetDecorator):
    snake_name = "drop"

    def __init__(self, original, names):
        super().__init__(original)
        self.names = tuple(names)
        self._columns = {name: col for name, col in original.items() if name not in self.names}
        self._row_count = original.row_count

    def _fingerprint(self):
        return utils.fingerprint(self.original.fingerprint, self.names)

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        for name in columns:
            if name in self.names:
                raise KeyError(f"column {name} was dropped")
        yield from self.original.chunk_iterator(columns, chunk_size, reverse, start=start, end=end)


@register
class DatasetMerged(Dataset):
    """Horizontal merge of two equal-length datasets (reference:
    vaex/dataset.py DatasetMerged)."""

    snake_name = "merge"

    def __init__(self, left, right):
        super().__init__()
        if left.row_count != right.row_count:
            raise ValueError(f"row counts differ: {left.row_count} != {right.row_count}")
        overlap = set(left) & set(right)
        if overlap:
            raise NameError(f"duplicate columns: {overlap}")
        self.left = left
        self.right = right
        self._columns = {**dict(left.items()), **dict(right.items())}
        self._row_count = left.row_count

    def _fingerprint(self):
        return utils.fingerprint(self.left.fingerprint, self.right.fingerprint)

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        left_cols = [n for n in columns if n in self.left]
        right_cols = [n for n in columns if n in self.right]
        if not right_cols:
            yield from self.left.chunk_iterator(columns, chunk_size, reverse, start=start, end=end)
        elif not left_cols:
            yield from self.right.chunk_iterator(columns, chunk_size, reverse, start=start, end=end)
        else:
            iters = [self.left.chunk_iterator(left_cols, chunk_size, reverse, start=start, end=end),
                     self.right.chunk_iterator(right_cols, chunk_size, reverse, start=start, end=end)]
            for (i1, i2, chunks_l), (j1, j2, chunks_r) in zip(*iters):
                assert (i1, i2) == (j1, j2), "merged datasets chunked differently"
                yield i1, i2, {**chunks_l, **chunks_r}


@register
class DatasetConcatenated(Dataset):
    """Vertical concatenation (reference: vaex/dataset.py DatasetConcatenated).

    resolver='strict' requires identical schemas; 'flexible' unifies by name
    (reference: vaex/schema.py resolvers)."""

    snake_name = "concat"

    def __init__(self, datasets, resolver="flexible"):
        super().__init__()
        self.datasets = list(datasets)
        self.resolver = resolver
        schemas = [set(ds.keys()) for ds in self.datasets]
        if resolver == "strict":
            for s in schemas[1:]:
                if s != schemas[0]:
                    raise NameError(f"schemas differ: {schemas[0]} vs {s}")
            names = list(self.datasets[0].keys())
        else:
            # union of names in first-seen order; missing parts fill with
            # nulls and dtypes promote (reference: dataset.py:709-738 +
            # schema.py resolver_flexible)
            names = []
            for ds in self.datasets:
                for n in ds.keys():
                    if n not in names:
                        names.append(n)
        self._resolved = {}
        for name in names:
            types = [array_types.data_type(ds[name]) for ds in self.datasets if name in ds.keys()]
            self._resolved[name] = reduce(array_types.type_promote, types)
        from .column import ColumnNulls
        self._columns = {
            name: ColumnConcatenated(
                [ds[name] if name in ds.keys() else ColumnNulls(ds.row_count, self._resolved[name])
                 for ds in self.datasets],
                dtype=self._resolved[name].internal)
            for name in names}
        self._row_count = sum(ds.row_count for ds in self.datasets)

    def _fingerprint(self):
        return utils.fingerprint([ds.fingerprint for ds in self.datasets])

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        chunk_size = chunk_size or 1024 * 1024
        end = self.row_count if end is None else end

        def adapt(ds, ds_start, ds_end):
            # request only the columns this fragment has; fill the rest with
            # nulls and cast to the resolved concat type (reference:
            # schema.py resolver_flexible.align)
            present = [n for n in columns if n in ds.keys()]
            missing = [n for n in columns if n not in ds.keys()]
            if not present:
                for i1 in range(ds_start, ds_end, chunk_size):
                    i2 = min(i1 + chunk_size, ds_end)
                    yield i1, i2, {n: array_types.nulls(i2 - i1, self._resolved[n]) for n in missing}
                return
            for i1, i2, chunks in ds.chunk_iterator(present, chunk_size, start=ds_start, end=ds_end):
                out = {}
                for n in present:
                    ar = chunks[n]
                    dt = self._resolved[n]
                    out[n] = ar if array_types.data_type(ar) == dt else array_types.cast(ar, dt)
                for n in missing:
                    out[n] = array_types.nulls(i2 - i1, self._resolved[n])
                yield i1, i2, out

        def raw_iter():
            offset = 0
            for ds in self.datasets:
                ds_start = max(start - offset, 0)
                ds_end = min(end - offset, ds.row_count)
                if ds_start < ds_end:
                    yield from adapt(ds, ds_start, ds_end)
                offset += ds.row_count

        yield from chunk_rechunk(raw_iter(), chunk_size, end - start)

    def close(self):
        for ds in self.datasets:
            ds.close()


class DatasetFile(Dataset):
    """Base for file-backed datasets (reference: vaex/dataset.py DatasetFile).

    Fingerprint is O(1): (path, mtime, size) — opening a 1 TB file stays
    O(metadata)."""

    snake_name = "file"

    def __init__(self, path, fs_options=None):
        super().__init__()
        self.path = str(path)
        self.fs_options = fs_options or {}

    def _fingerprint(self):
        import os
        try:
            st = os.stat(self.path)
            meta = (st.st_mtime_ns, st.st_size)
        except OSError:
            meta = None
        return utils.fingerprint(self.path, meta)

    def __getstate__(self):
        state = super().__getstate__()
        state.pop("_columns", None)
        return state

    def __setstate__(self, state):
        super().__setstate__(state)
        self._load()

    def _load(self):
        raise NotImplementedError


def dataset_from_arrays(**arrays):
    return DatasetArrays(arrays)


_openers = []


def register_opener(opener):
    _openers.append(opener)
    return opener


def open(path, fs_options=None, **kwargs):
    """Open a file as a Dataset by extension dispatch
    (reference: vaex/dataset.py:64 entry-point openers)."""
    from . import io as _io  # registers openers
    for opener in _openers:
        if opener.can_open(path, **kwargs):
            return opener.open(path, fs_options=fs_options, **kwargs)
    raise IOError(f"no opener for {path}")
