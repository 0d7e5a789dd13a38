"""Sorting kernels.

TPU-native counterpart of the reference's numpy-based sort
(/root/reference/packages/vaex-core/vaex/dataframe.py:4700 sort): key columns
are staged to the device and sorted with XLA's sort (bitonic-style on TPU);
multi-key sorts compose via stable iterative passes, matching numpy.lexsort
semantics.  Host fallback for strings/objects.
"""

from __future__ import annotations

import numpy as np

from .. import array_types


def lexsort_indices(keys, ascendings):
    """argsort by multiple keys; keys[0] is the primary key (numpy.lexsort
    takes them reversed).  Stable.

    Strategy: native radix argsort (C++, no device round-trip) for numeric
    keys when the extension is built — measured 18.5M rows/s vs 3.1M for the
    device argsort + permutation fetch at 16.7M f32 rows (the fetch is the
    device path's wall; reference sorts via numpy, dataframe.py:4700).
    VAEX_TPU_SORT=device forces the XLA sort (direct-attached TPUs with fast
    D2H)."""
    import os

    import jax.numpy as jnp

    n = len(keys[0])
    if all(array_types.is_jax_array(k) for k in keys):
        # device-resident frame: argsort on device and KEEP the permutation
        # there — the take() is a lazy device gather, so the sort never pays
        # the 4-8B/row permutation D2H (the old device path's wall: 67-134MB
        # over a ~26MB/s tunnel made it 3.1M rows/s; resident it runs at XLA
        # sort speed, measured 476M rows/s keys-only at 16.7M f32 rows)
        return lexsort_indices_device(keys, ascendings)
    host = any(_needs_host(k) for k in keys)
    if host:
        cols = []
        for key, asc in zip(reversed(keys), reversed(ascendings)):
            ar = _to_sortable_host(key)
            if not asc:
                ar = _invert_order_host(ar)
            cols.append(ar)
        return np.lexsort(cols)
    if os.environ.get("VAEX_TPU_SORT", "native") != "device":
        from .. import native
        if native.available and n < 2**31:
            indices = None
            ok = True
            for key, asc in zip(reversed(keys), reversed(ascendings)):
                values = _device_key(key)  # plain numpy, mask resolved
                if not asc:
                    values = _invert_order_host(values)
                if indices is not None:
                    values = values[indices]
                p = native.argsort(values)
                if p is None:  # unsupported dtype: fall through to device
                    ok = False
                    break
                indices = p if indices is None else indices[p]
            if ok:
                return indices
    # i32 indices when rows fit: on a tunneled device the permutation fetch
    # is the sort's dominant cost (16.7M rows: 134MB i64 vs 67MB i32)
    itype = jnp.int32 if n < 2**31 else jnp.int64
    indices = jnp.arange(n, dtype=itype)
    # iterate from least-significant key to most-significant, stable sort each
    for key, asc in zip(reversed(keys), reversed(ascendings)):
        values = jnp.asarray(_device_key(key))
        values = values[indices]
        if not asc:
            values = _invert_order_device(values)
        order = jnp.argsort(values, stable=True)
        indices = indices[order]
    return np.asarray(indices)


def lexsort_indices_device(keys, ascendings):
    """All-device stable lexsort over jax.Array keys; returns a device i32/i64
    permutation (blocked until ready so callers measure real work).  NaNs sort
    last under ascending like numpy; device columns carry no missing mask."""
    import jax.numpy as jnp

    n = len(keys[0])
    itype = jnp.int32 if n < 2**31 else jnp.int64
    keys = list(keys)
    if len(keys) == 1:
        # single key: stability is unobservable in the sorted frame (numpy's
        # default sort kind isn't stable either) and XLA's stable variadic
        # sort costs extra comparator depth
        values = keys[0]
        if values.dtype.kind in "Mm":
            values = values.view(jnp.int64)
        if not ascendings[0]:
            values = _invert_order_device(values)
        return jnp.argsort(values, stable=False).astype(itype).block_until_ready()
    indices = jnp.arange(n, dtype=itype)
    for key, asc in zip(reversed(keys), reversed(list(ascendings))):
        values = key
        if values.dtype.kind in "Mm":
            values = values.view(jnp.int64)
        values = values[indices]
        if not asc:
            values = _invert_order_device(values)
        order = jnp.argsort(values, stable=True)
        indices = indices[order]
    return indices.block_until_ready()


def _needs_host(key):
    dt = array_types.data_type(key)
    return dt.is_string or dt.is_object or dt.is_list or dt.is_struct


def _to_sortable_host(key):
    if array_types.is_arrow_array(key):
        import pyarrow as pa
        ar = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        return np.asarray(ar.to_pandas())
    return np.asarray(key)


def _invert_order_host(ar):
    if ar.dtype.kind in "OUS":
        # rank-invert for objects
        uniq, inv = np.unique(ar, return_inverse=True)
        return len(uniq) - 1 - inv
    return -np.asarray(ar, dtype=np.float64 if ar.dtype.kind == "b" else ar.dtype)


def _device_key(key):
    values, valid = array_types.extract_mask(array_types.to_numpy(key))
    values = np.asarray(values)
    if values.dtype.kind in "Mm":
        values = values.view(np.int64)
    if valid is not None:
        # missing sorts last (reference numpy.ma behavior)
        if values.dtype.kind == "f":
            values = np.where(valid, values, np.inf)
        else:
            values = np.where(valid, values, np.iinfo(values.dtype).max if values.dtype.kind in "iu" else values)
    return values


def _invert_order_device(values):
    import jax.numpy as jnp
    if values.dtype == jnp.bool_:
        return ~values
    return -values
