"""Lazy column views.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/column.py:
columns are host-side handles that materialize numpy/Arrow chunks on demand;
the executor slices them into device-bound chunks.  String storage stays in
Arrow layout (the reference's custom superstrings C++ module is replaced by
pyarrow; see SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

from . import array_types
from .datatype import DataType


class Column:
    """Abstract lazy column (reference: vaex/column.py:25)."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, slice_):
        raise NotImplementedError

    def data_type(self) -> DataType:
        raise NotImplementedError

    def to_numpy(self):
        return array_types.to_numpy(self[0:len(self)])

    def trim(self, i1, i2):
        return ColumnSlice(self, i1, i2)

    def fingerprint(self):
        from . import utils
        return utils.fingerprint(type(self).__name__, self._fingerprint_info())

    def _fingerprint_info(self):
        raise NotImplementedError


class ColumnSlice(Column):
    def __init__(self, column, start, stop):
        self.column = column
        self.start = start
        self.stop = stop

    def __len__(self):
        return self.stop - self.start

    def __getitem__(self, slice_):
        start, stop, step = slice_.indices(len(self))
        assert step in (None, 1)
        return self.column[self.start + start:self.start + stop]

    def data_type(self):
        return array_types.data_type(self.column)

    def _fingerprint_info(self):
        return dict(column=self.column, start=self.start, stop=self.stop)


class ColumnVirtualRange(Column):
    """Virtual arange column: `vaex.vrange` (reference: vaex/column.py:50).

    Backs billion-row dataframes with zero bytes of storage."""

    def __init__(self, start, stop, step=1, dtype=None):
        self.start = start
        self.stop = stop
        self.step = step
        self.dtype = np.dtype(dtype or np.int64)
        self.shape = (self.__len__(),)

    def __len__(self):
        return (self.stop - self.start) // self.step

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        lo = self.start + start * self.step
        hi = self.start + stop * self.step
        if self.dtype.kind == "f" and self.dtype.itemsize <= 4:
            # np.arange in f32 accumulates by repeated addition and STICKS
            # past 2^24 (every element == start); generate exactly, then cast
            return np.arange(lo, hi, self.step, dtype=np.float64).astype(self.dtype)
        return np.arange(lo, hi, self.step, dtype=self.dtype)

    def data_type(self):
        return DataType(self.dtype)

    def trim(self, i1, i2):
        return ColumnVirtualRange(self.start + i1 * self.step, self.start + i2 * self.step, self.step, self.dtype)

    def _fingerprint_info(self):
        return dict(start=self.start, stop=self.stop, step=self.step, dtype=str(self.dtype))


class ColumnVirtualConstant(Column):
    def __init__(self, value, length, dtype=None):
        self.value = value
        self.length = length
        self.dtype = np.dtype(dtype) if dtype is not None else np.array(value).dtype

    def __len__(self):
        return self.length

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        return np.full(stop - start, self.value, dtype=self.dtype)

    def data_type(self):
        return DataType(self.dtype)

    def trim(self, i1, i2):
        return ColumnVirtualConstant(self.value, i2 - i1, self.dtype)

    def _fingerprint_info(self):
        return dict(value=self.value, length=self.length, dtype=str(self.dtype))


class ColumnSparse(Column):
    """One column of a scipy.sparse matrix, densified per chunk (reference:
    vaex/column.py:147 — carries vaex-ml one-hot/vectorizer output without
    materializing the full dense matrix)."""

    def __init__(self, matrix, column_index):
        self.matrix = matrix
        self.column_index = column_index
        self.dtype = np.dtype(matrix.dtype)

    def __len__(self):
        return self.matrix.shape[0]

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        part = self.matrix[start:stop, self.column_index]
        return np.asarray(part.todense())[:, 0]

    def data_type(self):
        return DataType(self.dtype)

    def trim(self, i1, i2):
        return ColumnSparse(self.matrix[i1:i2], self.column_index)

    def _fingerprint_info(self):
        import hashlib
        m = self.matrix.tocsr()
        h = hashlib.md5()
        for part in (m.data, m.indices, m.indptr):
            h.update(np.ascontiguousarray(part).tobytes())
        return dict(matrix=h.hexdigest(), shape=tuple(m.shape),
                    column_index=self.column_index)


class ColumnIndexed(Column):
    """Column viewed through a row-index array — the join result column
    (reference: vaex/column.py:295).  Rows where `indices` is masked or == -1
    (when masked=True) become missing values."""

    def __init__(self, column, indices, masked=False):
        self.column = column
        self.indices = indices
        self.masked = masked

    @staticmethod
    def index(column, indices, direct_indices_map=None, masked=False):
        """Compose double indexing: if `column` is already indexed, flatten the
        indirection (reference: vaex/column.py:308)."""
        if isinstance(column, ColumnIndexed):
            base_indices = column.indices
            if array_types.is_jax_array(base_indices) or array_types.is_jax_array(indices):
                if not masked and not column.masked:
                    # device composition (sorted-then-sorted device frames):
                    # plain gather, no -1 sentinel handling needed
                    import jax.numpy as jnp
                    return ColumnIndexed(column.column,
                                         jnp.take(jnp.asarray(base_indices), jnp.asarray(indices)))
                base_indices = np.asarray(base_indices)
            indices = np.asarray(indices)
            new_indices = np.full(len(indices), -1, dtype=np.int64)
            ok = indices != -1
            new_indices[ok] = base_indices[indices[ok]]
            if column.masked:
                masked = True
            return ColumnIndexed(column.column, new_indices, masked=masked or bool((new_indices == -1).any()))
        return ColumnIndexed(column, indices, masked=masked)

    def __len__(self):
        return len(self.indices)

    def data_type(self):
        return array_types.data_type(self.column)

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        if array_types.is_jax_array(self.indices) and not self.masked:
            # device permutation (device sort/join): the chunk is gathered on
            # device — array_types.take keeps jax columns resident, and for a
            # host column it fetches only this chunk's index slice
            take_from = self.column
            if isinstance(take_from, Column):
                take_from = take_from[0:len(take_from)]
            return array_types.take(take_from, self.indices[start:stop])
        indices = np.asarray(self.indices[start:stop])
        if self.masked:
            mask = indices == -1
            safe = np.where(mask, 0, indices)
            take_from = self.column
            if isinstance(take_from, Column):
                ar = array_types.take(take_from[0:len(take_from)], safe)
            else:
                ar = array_types.take(take_from, safe)
            if array_types.is_arrow_array(ar):
                if mask.any():
                    import pyarrow.compute as pc
                    ar = pc.if_else(pa.array(~mask), ar, pa.nulls(len(safe), type=ar.type if not isinstance(ar, pa.ChunkedArray) else ar.type))
                return ar
            ar = array_types.to_numpy(ar)
            if np.ma.isMaskedArray(ar):
                return np.ma.MaskedArray(ar.data, mask=np.ma.getmaskarray(ar) | mask)
            return np.ma.MaskedArray(ar, mask=mask)
        else:
            take_from = self.column
            if isinstance(take_from, Column):
                take_from = take_from[0:len(take_from)]
            return array_types.take(take_from, indices)

    def _fingerprint_info(self):
        from . import utils
        if array_types.is_jax_array(self.indices):
            from .dataset import _jax_array_fingerprint
            return dict(column=self.column, indices=_jax_array_fingerprint(self.indices), masked=self.masked)
        return dict(column=self.column, indices=utils.hash_array_data(np.asarray(self.indices)), masked=self.masked)


class ColumnConcatenated(Column):
    """Lazy concatenation of columns (reference: vaex/column.py:400)."""

    def __init__(self, columns, dtype=None):
        self.columns = columns
        self._dtype = dtype
        self.offsets = np.cumsum([0] + [len(c) for c in columns])

    def __len__(self):
        return int(self.offsets[-1])

    def data_type(self):
        if self._dtype is not None:
            return DataType(self._dtype)
        # promote across parts (reference: schema.py resolver_flexible.resolve —
        # int32+float64 parts must report float64 or aggregations truncate)
        from functools import reduce
        dt = reduce(array_types.type_promote,
                    [array_types.data_type(c) for c in self.columns])
        self._dtype = dt.internal
        return dt

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        dt = self.data_type()
        parts = []
        for i, col in enumerate(self.columns):
            o1, o2 = self.offsets[i], self.offsets[i + 1]
            if stop <= o1 or start >= o2:
                continue
            s1 = max(start, o1) - o1
            s2 = min(stop, o2) - o1
            part = col[s1:s2] if not isinstance(col, Column) else col[slice(int(s1), int(s2))]
            if array_types.data_type(part) != dt:
                part = array_types.cast(part, dt)
            parts.append(part)
        if not parts:
            return np.empty(0, dtype=dt.numpy if not dt.is_arrow else object)
        return array_types.concat(parts)

    def _fingerprint_info(self):
        return dict(columns=list(self.columns))


class ColumnNulls(Column):
    """All-missing placeholder for a column absent from one concat fragment
    (reference: schema.py resolver_flexible.align pa.nulls fill)."""

    def __init__(self, length, dtype):
        self.length = int(length)
        self._dtype = DataType(dtype)

    def __len__(self):
        return self.length

    def data_type(self):
        return self._dtype

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        return array_types.nulls(stop - start, self._dtype)

    def _fingerprint_info(self):
        return dict(length=self.length, dtype=str(self._dtype))


class ColumnArrowDictionaryEncoded(Column):
    """Presents the integer codes of an Arrow dictionary column — the TPU
    ingest form of string/categorical data (SURVEY.md §2.2)."""

    def __init__(self, column):
        self.column = column

    def __len__(self):
        return len(self.column)

    def data_type(self):
        t = array_types.data_type(self.column)
        return DataType(t.internal.index_type)

    def __getitem__(self, slice_):
        ar = self.column[slice_] if isinstance(self.column, Column) else array_types.slice_array(self.column, *slice_.indices(len(self))[:2])
        if isinstance(ar, pa.ChunkedArray):
            ar = ar.combine_chunks()
        return np.asarray(ar.indices)

    def _fingerprint_info(self):
        return dict(column=self.column)
