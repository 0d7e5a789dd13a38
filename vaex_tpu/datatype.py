"""Uniform dtype wrapper over numpy and Arrow types.

TPU-native counterpart of the reference DataType
(/root/reference/packages/vaex-core/vaex/datatype.py): a single value-type
abstraction used across the frontend, with the extra notion of a *device
dtype* — what the value becomes once it is staged onto the TPU (strings are
dictionary-encoded to int32 codes at ingest, see SURVEY.md §2.2).
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None


def _is_arrow_type(t):
    return pa is not None and isinstance(t, pa.DataType)


class DataType:
    """Wraps either a numpy dtype or an Arrow DataType."""

    def __init__(self, internal):
        if isinstance(internal, DataType):
            internal = internal.internal
        if isinstance(internal, type) and issubclass(internal, np.generic):
            internal = np.dtype(internal)
        if isinstance(internal, str):
            internal = np.dtype(internal)
        self.internal = internal

    def __eq__(self, other):
        if other is None:
            return False
        if isinstance(other, str):
            tester = getattr(self, "is_" + other, None)
            if tester is not None:
                return tester
            other = DataType(np.dtype(other))
        if not isinstance(other, DataType):
            other = DataType(other)
        if self.is_arrow and other.is_arrow:
            return self.internal == other.internal
        if self.is_string and other.is_string:
            return True
        try:
            return self.numpy == other.numpy
        except (TypeError, ValueError):
            return False

    def __hash__(self):
        return hash(str(self.internal))

    def __repr__(self):
        return f"DataType({self.internal!r})"

    def __str__(self):
        if self.is_string:
            return "string"
        if self.is_arrow:
            return str(self.internal)
        return self.numpy.name

    @property
    def name(self):
        return str(self)

    @property
    def is_arrow(self):
        return _is_arrow_type(self.internal)

    @property
    def is_numpy(self):
        return isinstance(self.internal, np.dtype)

    @property
    def numpy(self) -> np.dtype:
        """Equivalent numpy dtype (strings map to object)."""
        if self.is_numpy:
            return self.internal
        if pa is not None:
            if self.is_string:
                return np.dtype(object)
            if pa.types.is_dictionary(self.internal):
                return DataType(self.internal.value_type).numpy
            if pa.types.is_timestamp(self.internal):
                return np.dtype(f"datetime64[{self.internal.unit}]")
            if pa.types.is_duration(self.internal):
                return np.dtype(f"timedelta64[{self.internal.unit}]")
            return np.dtype(self.internal.to_pandas_dtype())
        raise TypeError(f"cannot convert {self.internal} to numpy")

    @property
    def arrow(self):
        if self.is_arrow:
            return self.internal
        if pa is None:
            raise RuntimeError("pyarrow not available")
        if self.internal.kind in "OSU":
            return pa.string()
        return pa.from_numpy_dtype(self.internal)

    @property
    def kind(self):
        if self.is_string:
            return "S"
        return self.numpy.kind

    @property
    def is_string(self):
        if self.is_arrow:
            t = self.internal
            if pa.types.is_dictionary(t):
                t = t.value_type
            return pa.types.is_string(t) or pa.types.is_large_string(t)
        return self.is_numpy and self.internal.kind in "SU"

    @property
    def is_dictionary(self):
        return self.is_arrow and pa.types.is_dictionary(self.internal)

    @property
    def is_list(self):
        return self.is_arrow and (pa.types.is_list(self.internal) or pa.types.is_large_list(self.internal))

    @property
    def is_struct(self):
        return self.is_arrow and pa.types.is_struct(self.internal)

    @property
    def is_primitive(self):
        if self.is_arrow:
            return pa.types.is_primitive(self.internal) and not self.is_temporal
        return self.numpy.kind in "?iuf"

    @property
    def is_numeric(self):
        try:
            return self.numpy.kind in "iuf"
        except TypeError:
            return False

    @property
    def is_integer(self):
        try:
            return self.numpy.kind in "iu"
        except TypeError:
            return False

    @property
    def is_signed(self):
        return self.numpy.kind == "i"

    @property
    def is_unsigned(self):
        return self.numpy.kind == "u"

    @property
    def is_float(self):
        try:
            return self.numpy.kind == "f"
        except TypeError:
            return False

    @property
    def is_bool(self):
        try:
            return self.numpy.kind == "b"
        except TypeError:
            return False

    @property
    def is_datetime(self):
        if self.is_arrow:
            return pa.types.is_timestamp(self.internal) or pa.types.is_date(self.internal)
        return self.numpy.kind == "M"

    @property
    def is_timedelta(self):
        if self.is_arrow:
            return pa.types.is_duration(self.internal)
        return self.numpy.kind == "m"

    @property
    def is_temporal(self):
        return self.is_datetime or self.is_timedelta

    @property
    def is_object(self):
        return self.is_numpy and self.internal.kind == "O"

    @property
    def is_encoded(self):
        return self.is_dictionary

    @property
    def byte_size(self):
        return self.numpy.itemsize

    @property
    def value_type(self):
        if self.is_dictionary:
            return DataType(self.internal.value_type)
        if self.is_list:
            return DataType(self.internal.value_type)
        return self

    @property
    def index_type(self):
        if self.is_dictionary:
            return DataType(self.internal.index_type)
        return self

    def upcast(self) -> "DataType":
        """Sum accumulation dtype: float->float64, int->int64, uint->uint64,
        bool->int64 (reference: /root/reference/packages/vaex-core/src/
        agg_sum.cpp:7-60)."""
        if self.is_temporal:
            return self
        kind = self.numpy.kind
        if kind == "f":
            return DataType(np.dtype("float64"))
        if kind == "u":
            return DataType(np.dtype("uint64"))
        if kind in "ib":
            return DataType(np.dtype("int64"))
        if kind == "?":
            return DataType(np.dtype("int64"))
        return self

    @property
    def device_dtype(self) -> np.dtype:
        """dtype of this value once staged on the TPU: numerics unchanged,
        temporals viewed as int64, strings/objects dictionary-encoded int32."""
        if self.is_temporal:
            return np.dtype("int64")
        if self.is_string or self.is_object or self.is_dictionary:
            return np.dtype("int32")
        return self.numpy

    def create_array(self, values):
        if self.is_arrow:
            return pa.array(values, type=self.internal)
        return np.asarray(values, dtype=self.numpy)


def dtype_of(array) -> DataType:
    """DataType of a column/array of any supported backend."""
    from . import array_types

    return array_types.data_type(array)
