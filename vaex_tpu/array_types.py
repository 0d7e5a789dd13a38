"""Array backend helpers: uniform ops over numpy / numpy.ma / Arrow arrays.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/array_types.py:
conversion, slicing, concatenation and mask extraction for the host-side column
chunks that feed the device pipeline.  Device staging (`to_device_payload`)
produces the (values, validity) pair the compiled kernels consume.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.compute as pc
except ImportError:  # pragma: no cover
    pa = None
    pc = None

from .datatype import DataType

supported_arrow_array_types = ()
if pa is not None:
    supported_arrow_array_types = (pa.Array, pa.ChunkedArray)
supported_array_types = (np.ndarray,) + supported_arrow_array_types


def is_arrow_array(ar):
    return pa is not None and isinstance(ar, supported_arrow_array_types)

def is_numpy_array(ar):
    return isinstance(ar, np.ndarray)


def is_jax_array(ar):
    """Device-resident jax.Array columns are first-class on this engine:
    they skip the host pad/H2D path entirely (no reference equivalent —
    TPU-native feature)."""
    import sys
    jax = sys.modules.get("jax")
    return jax is not None and isinstance(ar, jax.Array)

def is_string_type(t: DataType):
    return t.is_string


def data_type(ar) -> DataType:
    if is_arrow_array(ar):
        return DataType(ar.type)
    if isinstance(ar, np.ndarray):
        return DataType(ar.dtype)
    if is_jax_array(ar):
        return DataType(np.dtype(ar.dtype))
    # lazy Column objects expose .data_type
    dt = getattr(ar, "data_type", None)
    if dt is not None:
        return dt() if callable(dt) else DataType(dt)
    return DataType(np.asarray(ar).dtype)


def length(ar):
    return len(ar)


def slice_array(ar, start, stop):
    if is_arrow_array(ar):
        return ar.slice(start, stop - start)
    return ar[start:stop]


def take(ar, indices):
    if is_jax_array(ar):
        # device gather: stays on device whether indices are host or device
        # (sorted/joined frames over device-resident columns never round-trip)
        import jax.numpy as jnp
        return jnp.take(ar, jnp.asarray(indices))
    if is_jax_array(indices):
        # host column, device indices (mixed frame): fetch the index slice
        indices = np.asarray(indices)
    if is_arrow_array(ar):
        return ar.take(pa.array(np.asarray(indices)))
    if np.ma.isMaskedArray(ar):
        return ar[indices]
    return ar.take(indices)


def filter_array(ar, mask):
    mask = to_numpy(mask).astype(bool)
    if is_arrow_array(ar):
        return ar.filter(pa.array(mask))
    return ar[mask]


def to_numpy(ar, strict=False):
    """Convert to a numpy (possibly masked) array; zero copy when possible."""
    if isinstance(ar, np.ndarray):
        return ar
    if is_arrow_array(ar):
        return arrow_to_numpy(ar, strict=strict)
    return np.asarray(ar)


def arrow_to_numpy(ar, strict=False):
    if isinstance(ar, pa.ChunkedArray):
        if ar.num_chunks == 1:
            return arrow_to_numpy(ar.chunk(0), strict=strict)
        parts = [arrow_to_numpy(c, strict=strict) for c in ar.chunks]
        if any(np.ma.isMaskedArray(p) for p in parts):
            return np.ma.concatenate(parts)
        return np.concatenate(parts) if parts else np.array([])
    t = ar.type
    if pa.types.is_dictionary(t):
        # decode to values (strings become object arrays)
        ar = ar.dictionary_decode() if hasattr(ar, "dictionary_decode") else ar.cast(t.value_type)
        t = ar.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return np.asarray(ar.to_pandas(), dtype=object)
    if ar.null_count:
        mask = np.asarray(ar.is_null())
        values = ar.combine_chunks() if isinstance(ar, pa.ChunkedArray) else ar
        np_dtype = DataType(t).numpy
        filled = values.fill_null(_null_fill_value(np_dtype))
        data = np.asarray(filled).astype(np_dtype, copy=False)
        return np.ma.MaskedArray(data, mask=mask)
    out = np.asarray(ar)
    return out


def _null_fill_value(np_dtype):
    if np_dtype.kind == "f":
        return np.nan
    if np_dtype.kind in "iu":
        return 0
    if np_dtype.kind == "b":
        return False
    if np_dtype.kind in "Mm":
        return 0
    return 0


def to_arrow(ar, convert_to_native=False):
    if is_arrow_array(ar):
        return ar
    if np.ma.isMaskedArray(ar):
        return pa.array(ar.data, mask=np.ma.getmaskarray(ar))
    if ar.dtype.kind == "O":
        return pa.array(ar)
    if ar.dtype.kind in "Mm":
        return pa.array(ar)
    if ar.dtype.kind in "SU":
        return pa.array(ar.astype(object))
    if not ar.dtype.isnative and convert_to_native:
        ar = ar.astype(ar.dtype.newbyteorder("="))
    return pa.array(ar)


def concat(arrays):
    arrays = list(arrays)
    if len(arrays) == 1:
        return arrays[0]
    if all(is_jax_array(a) for a in arrays):
        import jax.numpy as jnp
        return jnp.concatenate(arrays)
    if any(is_arrow_array(a) for a in arrays):
        chunks = []
        for a in arrays:
            a = to_arrow(a)
            if isinstance(a, pa.ChunkedArray):
                chunks.extend(a.chunks)
            else:
                chunks.append(a)
        types = {c.type for c in chunks}
        if len(types) > 1:
            target = _common_arrow_type([c.type for c in chunks])
            chunks = [c.cast(target) for c in chunks]
        return pa.chunked_array(chunks)
    if any(np.ma.isMaskedArray(a) for a in arrays):
        return np.ma.concatenate(arrays)
    return np.concatenate(arrays)


def _common_arrow_type(types):
    numpy_types = [DataType(t).numpy for t in types if not DataType(t).is_string]
    if len(numpy_types) != len(types):
        return pa.large_string() if any(pa.types.is_large_string(t) for t in types) else pa.string()
    return pa.from_numpy_dtype(np.result_type(*numpy_types))


def type_promote(t1, t2) -> DataType:
    """Common type for vertical concatenation (reference:
    array_types.py:336 ``type_promote`` / schema.py resolver_flexible).

    numpy×numpy promotes via numpy rules; strings unify to (large_)string;
    numeric/temporal arrow types promote through their numpy equivalents."""
    t1, t2 = DataType(t1), DataType(t2)
    if t1 == t2:
        return t1
    if t1.is_numpy and t2.is_numpy:
        return DataType(np.promote_types(t1.numpy, t2.numpy))
    if t1.is_string and t2.is_string:
        large = any(pa.types.is_large_string(t.arrow) for t in (t1, t2))
        return DataType(pa.large_string() if large else pa.string())
    if (t1.is_numeric or t1.is_temporal or t1.is_bool) and \
            (t2.is_numeric or t2.is_temporal or t2.is_bool):
        dt = np.promote_types(t1.numpy, t2.numpy)
        return DataType(pa.from_numpy_dtype(dt)) if (t1.is_arrow or t2.is_arrow) else DataType(dt)
    raise TypeError(f"cannot promote {t1} and {t2} to a common type")


def nulls(n, dtype) -> "np.ma.MaskedArray":
    """All-missing array of length n (reference: schema.py resolver_flexible.align
    uses pa.nulls; numpy-typed columns here stay numpy-masked so the device
    pipeline's MaskedArray path applies)."""
    dtype = DataType(dtype)
    if dtype.is_arrow:
        return pa.nulls(n, type=dtype.arrow)
    return np.ma.masked_all(n, dtype=dtype.numpy)


def cast(ar, dtype):
    """Cast a host chunk to a resolved concat type, preserving missing values."""
    dtype = DataType(dtype)
    if data_type(ar) == dtype:
        return ar
    if is_arrow_array(ar) or dtype.is_arrow:
        ar = to_arrow(ar)
        if isinstance(ar, pa.ChunkedArray):
            ar = ar.combine_chunks()
        if pa.types.is_null(ar.type):
            return pa.nulls(len(ar), type=dtype.arrow)
        return ar.cast(dtype.arrow)
    if np.ma.isMaskedArray(ar):
        return ar.astype(dtype.numpy)
    if is_jax_array(ar):
        import jax.numpy as jnp
        return ar.astype(jnp.dtype(dtype.numpy))
    return np.asarray(ar).astype(dtype.numpy)


def extract_mask(ar):
    """(values, validity_bool_or_None): validity True = valid.

    Follows numpy.ma convention inversion: reference uses mask==1 meaning
    *valid* on the C++ side after inversion (see /root/reference/packages/
    vaex-core/src/agg_count.cpp:50 'this follows numpy, 1 is masked' — the
    python layer passes ~mask).
    """
    if np.ma.isMaskedArray(ar):
        mask = np.ma.getmaskarray(ar)
        return ar.data, ~mask
    if is_arrow_array(ar):
        if ar.null_count:
            np_ar = arrow_to_numpy(ar)
            if np.ma.isMaskedArray(np_ar):
                return np_ar.data, ~np.ma.getmaskarray(np_ar)
            return np_ar, None
        return arrow_to_numpy(ar), None
    return ar, None


def same_type(type1, type2):
    return DataType(type1) == DataType(type2)


def upcast(dtype):
    return DataType(dtype).upcast()


def convert(ar, type_wanted):
    """Convert array to 'numpy', 'arrow', 'numpy-arrow' (numpy unless strings)."""
    if type_wanted == "numpy":
        return to_numpy(ar)
    if type_wanted == "arrow":
        return to_arrow(ar)
    if type_wanted in ("numpy-arrow", None):
        dt = data_type(ar)
        if dt.is_string or dt.is_list or dt.is_struct:
            return to_arrow(ar)
        return to_numpy(ar)
    if type_wanted in ("python", "list"):
        if hasattr(ar, "to_pylist"):
            return ar.to_pylist()
        ar = to_numpy(ar)
        if np.ma.isMaskedArray(ar):
            return [None if m else v.item() if hasattr(v, "item") else v
                    for v, m in zip(ar.data, np.ma.getmaskarray(ar))]
        return ar.tolist()
    raise ValueError(f"unknown array type {type_wanted!r}")
