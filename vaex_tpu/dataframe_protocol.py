"""DataFrame Interchange Protocol (`__dataframe__`).

Counterpart of /root/reference/packages/vaex-core/vaex/dataframe_protocol.py
(779 LoC, hooked at dataframe.py:264): implements the dataframe-api
interchange spec so `pandas.api.interchange.from_dataframe(df)` and friends
can consume vaex_tpu DataFrames zero-copy where possible.
"""

from __future__ import annotations

import ctypes
import enum

import numpy as np


class DtypeKind(enum.IntEnum):
    INT = 0
    UINT = 1
    FLOAT = 2
    BOOL = 20
    STRING = 21
    DATETIME = 22
    CATEGORICAL = 23


_NP_KINDS = {"i": DtypeKind.INT, "u": DtypeKind.UINT, "f": DtypeKind.FLOAT,
             "b": DtypeKind.BOOL, "M": DtypeKind.DATETIME, "m": DtypeKind.DATETIME}


class _Buffer:
    def __init__(self, array):
        self._array = np.ascontiguousarray(array)

    @property
    def bufsize(self):
        return self._array.nbytes

    @property
    def ptr(self):
        return self._array.__array_interface__["data"][0]

    def __dlpack__(self):
        raise NotImplementedError("dlpack not supported")

    def __dlpack_device__(self):
        return (1, None)  # CPU

    def __repr__(self):
        return f"VaexTpuBuffer({self.bufsize} bytes)"


class _Column:
    def __init__(self, df, name, allow_copy=True):
        self._df = df
        self._name = name
        self._allow_copy = allow_copy
        self._values = None

    def _materialize(self):
        if self._values is None:
            self._values = self._df.evaluate(self._name)
        return self._values

    def size(self):
        return len(self._df)

    @property
    def offset(self):
        return 0

    @property
    def dtype(self):
        dt = self._df.data_type(self._name)
        if dt.is_string:
            return (DtypeKind.STRING, 8, "u", "=")
        np_dtype = dt.numpy
        kind = _NP_KINDS.get(np_dtype.kind)
        if kind is None:
            raise NotImplementedError(f"dtype {np_dtype} not supported by the interchange protocol")
        if np_dtype.kind == "M":
            return (DtypeKind.DATETIME, 64, f"ts{np_dtype.str[-2]}:", "=")
        return (kind, np_dtype.itemsize * 8, np_dtype.str[1:] if False else np_dtype.char, "=")

    @property
    def describe_categorical(self):
        if not self._df.is_category(self._name):
            raise TypeError(f"{self._name} is not categorical")
        labels = self._df.category_labels(self._name)
        return {"is_ordered": False, "is_dictionary": True,
                "categories": _VaexColumnWrapper(np.asarray(labels, dtype=object))}

    @property
    def describe_null(self):
        values = self._materialize()
        if np.ma.isMaskedArray(values):
            return (3, 0)  # boolean mask, 0 = null? spec: (kind=3 bytemask, value)
        from . import array_types
        if array_types.is_arrow_array(values) and values.null_count:
            return (3, 0)
        return (0, None)

    @property
    def null_count(self):
        values = self._materialize()
        if np.ma.isMaskedArray(values):
            return int(np.ma.getmaskarray(values).sum())
        from . import array_types
        if array_types.is_arrow_array(values):
            return values.null_count
        return 0

    @property
    def metadata(self):
        return {}

    def num_chunks(self):
        return 1

    def get_chunks(self, n_chunks=None):
        yield self

    def get_buffers(self):
        from . import array_types
        values = self._materialize()
        dt = self._df.data_type(self._name)
        if dt.is_string:
            import pyarrow as pa
            ar = array_types.to_arrow(values)
            if isinstance(ar, pa.ChunkedArray):
                ar = ar.combine_chunks()
            ar = ar.cast(pa.large_string())
            null_buf, offsets_buf, data_buf = ar.buffers()
            n = len(ar)
            offsets = np.frombuffer(offsets_buf, dtype=np.int64, count=n + 1)
            data = np.frombuffer(data_buf, dtype=np.uint8, count=int(offsets[-1]))
            validity = None
            if ar.null_count:
                valid = np.asarray(ar.is_valid()).astype(np.uint8)
                validity = (_Buffer(valid), (DtypeKind.BOOL, 8, "b", "="))
            return {
                "data": (_Buffer(data), (DtypeKind.STRING, 8, "u", "=")),
                "offsets": (_Buffer(offsets), (DtypeKind.INT, 64, "l", "=")),
                "validity": validity,
            }
        np_values = array_types.to_numpy(values)
        validity = None
        if np.ma.isMaskedArray(np_values):
            valid = (~np.ma.getmaskarray(np_values)).astype(np.uint8)
            validity = (_Buffer(valid), (DtypeKind.BOOL, 8, "b", "="))
            np_values = np_values.data
        if np_values.dtype.kind in "Mm":
            np_values = np_values.view(np.int64)
        return {
            "data": (_Buffer(np_values), self.dtype),
            "validity": validity,
            "offsets": None,
        }


class _VaexColumnWrapper:
    """Minimal column for categorical labels."""

    def __init__(self, values):
        self._values = values

    def size(self):
        return len(self._values)


class _DataFrameXchg:
    def __init__(self, df, nan_as_null=False, allow_copy=True):
        self._df = df
        self._nan_as_null = nan_as_null
        self._allow_copy = allow_copy

    @property
    def metadata(self):
        return {"vaex_tpu.version": 1}

    def num_columns(self):
        return len(self._df.get_column_names())

    def num_rows(self):
        return len(self._df)

    def num_chunks(self):
        return 1

    def column_names(self):
        return self._df.get_column_names()

    def get_column(self, i):
        return _Column(self._df, self._df.get_column_names()[i], self._allow_copy)

    def get_column_by_name(self, name):
        return _Column(self._df, name, self._allow_copy)

    def get_columns(self):
        return [_Column(self._df, name, self._allow_copy) for name in self._df.get_column_names()]

    def select_columns(self, indices):
        names = [self._df.get_column_names()[i] for i in indices]
        return _DataFrameXchg(self._df[names], self._nan_as_null, self._allow_copy)

    def select_columns_by_name(self, names):
        return _DataFrameXchg(self._df[list(names)], self._nan_as_null, self._allow_copy)

    def get_chunks(self, n_chunks=None):
        yield self

    def __dataframe__(self, nan_as_null=False, allow_copy=True):
        return _DataFrameXchg(self._df, nan_as_null, allow_copy)


def make_dataframe_interchange(df, nan_as_null=False, allow_copy=True):
    return _DataFrameXchg(df, nan_as_null=nan_as_null, allow_copy=allow_copy)
