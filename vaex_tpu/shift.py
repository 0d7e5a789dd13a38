"""Shifted datasets: lazy windowed views for shift/diff/rolling.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/shift.py
(DatasetShifted:204, chunk_* stream transformers :14-203): a shifted column
reads the original rows offset by ``n`` with fill at the boundary — the
sequence-parallel halo pattern (SURVEY.md §5.7); on a sharded mesh the halo
rides `ppermute` (parallel/mesh.py)."""

from __future__ import annotations

import numpy as np

from . import array_types
from .column import Column
from .dataset import DatasetDecorator, register
from .datatype import DataType


class ColumnShifted(Column):
    def __init__(self, column, n, fill_value=None, row_count=None):
        self.column = column
        self.n = n
        self.fill_value = fill_value
        self.row_count = row_count if row_count is not None else len(column)

    def __len__(self):
        return self.row_count

    def data_type(self):
        return array_types.data_type(self.column)

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        n = self.n
        # shifted[i] = original[i - n]
        src_start = start - n
        src_stop = stop - n
        clip_start = max(src_start, 0)
        clip_stop = min(src_stop, self.row_count)
        if clip_start < clip_stop:
            if isinstance(self.column, Column):
                core = self.column[slice(int(clip_start), int(clip_stop))]
            else:
                core = array_types.slice_array(self.column, clip_start, clip_stop)
        else:
            core = None
        pad_before = clip_start - src_start if src_stop > 0 else stop - start
        pad_before = max(0, min(pad_before, stop - start))
        pad_after = (stop - start) - pad_before - (0 if core is None else len(core))
        pad_after = max(0, pad_after)
        return _pad(core, pad_before, pad_after, self.fill_value, self.data_type())

    def _fingerprint_info(self):
        return dict(column=self.column, n=self.n, fill=self.fill_value)


def _pad(core, before, after, fill_value, dtype: DataType):
    parts = []
    np_dtype = dtype.numpy if not dtype.is_string else object
    use_mask = fill_value is None

    def fill_block(k):
        if dtype.is_string:
            import pyarrow as pa
            return pa.nulls(k, type=dtype.arrow) if use_mask else pa.array([fill_value] * k, type=dtype.arrow)
        if use_mask:
            if np_dtype.kind == "f":
                return np.full(k, np.nan, dtype=np_dtype)
            return np.ma.MaskedArray(np.zeros(k, dtype=np_dtype), mask=np.ones(k, dtype=bool))
        return np.full(k, fill_value, dtype=np_dtype)

    if before:
        parts.append(fill_block(before))
    if core is not None:
        parts.append(core)
    if after:
        parts.append(fill_block(after))
    if not parts:
        return fill_block(0)
    return array_types.concat(parts) if len(parts) > 1 else parts[0]


@register
class DatasetShifted(DatasetDecorator):
    snake_name = "shift"

    def __init__(self, original, n, fill_value=None, column_names=None):
        super().__init__(original)
        self.n = n
        self.fill_value = fill_value
        self.shifted_names = set(column_names) if column_names is not None else set(original)
        self._row_count = original.row_count
        self._columns = {
            name: (ColumnShifted(col, n, fill_value, original.row_count) if name in self.shifted_names else col)
            for name, col in original.items()
        }

    def _fingerprint(self):
        from . import utils
        return utils.fingerprint(self.original.fingerprint, self.n, self.fill_value, sorted(self.shifted_names))

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        chunk_size = chunk_size or 1024 * 1024
        end = self.row_count if end is None else end
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


def shift(df, periods, column=None, fill_value=None, trim=False, inplace=False):
    """Reference: vaex/dataframe.py shift + shift.py."""
    out = df if inplace else df.copy()
    out = out.extract() if out.filtered else out
    columns = column if column is not None else out.get_column_names(hidden=False)
    columns = [columns] if isinstance(columns, str) else [str(c) for c in columns]
    real = [c for c in columns if c not in out.virtual_columns]
    virtual = [c for c in columns if c in out.virtual_columns]
    ds = DatasetShifted(out.dataset.sliced(out._index_start, out._index_end) if (out._index_start, out._index_end) != (0, out.dataset.row_count) else out.dataset,
                        periods, fill_value=fill_value, column_names=real or None)
    out.dataset = ds
    out._index_start = 0
    out._index_end = ds.row_count
    for name in virtual:
        # shifting a virtual column by shifting its dependencies is incorrect
        # in general; materialize the shifted values instead
        values = df.evaluate(name)
        shifted = ColumnShifted(values, periods, fill_value, len(values))
        del out.virtual_columns[name]
        out.column_names.remove(name)
        out.add_column(name, shifted[0:len(shifted)])
    if trim:
        if periods > 0:
            out = out[periods:len(out)]
        elif periods < 0:
            out = out[0:len(out) + periods]
    out._invalidate_length()
    return out
