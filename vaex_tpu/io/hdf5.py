"""HDF5 datasets: zero-copy mmap reader + chunked writer for the vaex layout.

Reads both vaex layouts (reference: /root/reference/packages/vaex-hdf5/vaex/
hdf5/dataset.py:57-420): v1 ``/data/<name>`` plain datasets and v2
``/table/columns/<name>/data`` (+ ``mask`` for masked values, string columns
as ``data``(uint8 bytes, attrs dtype='str') + ``indices`` + ``null_bitmap``,
``dictionary_encoded`` groups).  Columns are numpy views over one mmap of the
file — opening a 1 TB file is O(metadata).

Writes the v2 layout so files round-trip with the reference
(reference writer: /root/reference/packages/vaex-hdf5/vaex/hdf5/writer.py:22).
"""

from __future__ import annotations

import mmap as _mmap
import os

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

try:
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

from .. import array_types, utils
from ..dataset import DatasetFile, register, register_opener
from ..datatype import DataType


def _string_array_from_buffers(bytes_ar, indices, null_bitmap, length):
    """Build an Arrow string array over raw (bytes, offsets, validity) buffers,
    zero-copy (reference: vaex/arrow/convert.py arrow_string_array_from_buffers)."""
    offset_buf = pa.py_buffer(np.ascontiguousarray(indices))
    data_buf = pa.py_buffer(np.ascontiguousarray(bytes_ar))
    null_buf = pa.py_buffer(np.ascontiguousarray(null_bitmap)) if null_bitmap is not None else None
    if indices.dtype == np.int64:
        typ = pa.large_string()
    else:
        typ = pa.string()
    return pa.Array.from_buffers(typ, length, [null_buf, offset_buf, data_buf])


@register
class Hdf5Dataset(DatasetFile):
    snake_name = "hdf5"

    def __init__(self, path, fs_options=None, group=None):
        super().__init__(path, fs_options)
        self.group = group
        self._mmap = None
        self._file = None
        self._load()

    def _map_raw(self, h5dataset, dtype=None):
        """Zero-copy numpy view at the dataset's file offset; None if the
        dataset is chunked/compressed (then read through h5py lazily)."""
        offset = h5dataset.id.get_offset()
        if offset is None:
            return np.asarray(h5dataset[...])
        shape = h5dataset.shape
        dtype = np.dtype(dtype) if dtype is not None else h5dataset.dtype
        n = int(np.prod(shape)) if shape else 0
        ar = np.frombuffer(self._mmap, dtype=dtype, count=n, offset=offset)
        return ar.reshape(shape)

    def _map_column_group(self, group):
        data = group["data"]
        if "dtype" in data.attrs and _s(data.attrs["dtype"]) == "str":
            indices = self._map_raw(group["indices"])
            raw = self._map_raw(data)
            null_bitmap = self._map_raw(group["null_bitmap"]) if "null_bitmap" in group else None
            length = len(indices) - 1
            return _string_array_from_buffers(raw, indices, null_bitmap, length)
        dtype = None
        if "dtype" in data.attrs:
            dtype = np.dtype(_s(data.attrs["dtype"]))
        values = self._map_raw(data, dtype=dtype)
        if dtype is not None and values.dtype != dtype:
            values = values.view(dtype)
        if "mask" in group:
            mask = self._map_raw(group["mask"]).astype(bool, copy=False)
            return np.ma.MaskedArray(values, mask=mask)
        return values

    def _load(self):
        if h5py is None:
            raise RuntimeError("h5py not available")
        self._file = open(self.path, "rb")
        self._mmap = _mmap.mmap(self._file.fileno(), 0, access=_mmap.ACCESS_READ)
        self.h5 = h5py.File(self._file, "r")
        columns = {}
        h5 = self.h5
        group = self.group

        def load_v1(h5data):
            for name in h5data:
                item = h5data[name]
                if isinstance(item, h5py.Dataset):
                    dtype = None
                    if "dtype" in item.attrs:
                        dtype = np.dtype(_s(item.attrs["dtype"]))
                    ar = self._map_raw(item)
                    if dtype is not None and ar.dtype != dtype:
                        ar = ar.view(dtype)
                    columns[name] = ar

        def load_v2(h5table):
            h5columns = h5table["columns"]
            order = []
            if "column_order" in h5columns.attrs:
                order = _s(h5columns.attrs["column_order"]).split(",")
            names = [n for n in order if n in h5columns] + [n for n in h5columns if n not in order]
            for name in names:
                g = h5columns[name]
                if "type" in g.attrs and _s(g.attrs["type"]) == "dictionary_encoded":
                    indices = self._map_column_group(g["indices"])
                    values = self._map_column_group(g["dictionary"])
                    columns[name] = pa.DictionaryArray.from_arrays(pa.array(np.asarray(indices)), values, safe=False)
                else:
                    columns[name] = self._map_column_group(g)

        if group is not None:
            load_v2(h5[group]) if "columns" in h5[group] else load_v1(h5[group])
        elif "table" in h5:
            load_v2(h5["/table"])
        elif "data" in h5:
            load_v1(h5["/data"])
        elif "columns" in h5:
            load_v2(h5)
        else:
            load_v1(h5)
        self._columns = columns
        lengths = {len(c) for c in columns.values()}
        if len(lengths) > 1:
            raise ValueError(f"columns have differing lengths: {lengths}")
        self._row_count = lengths.pop() if lengths else 0

    def close(self):
        if self.h5 is not None:
            self.h5.close()
            self.h5 = None
        # note: mmap stays alive while column views reference it

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".hdf5", ".h5"))

    @classmethod
    def open(cls, path, fs_options=None, **kwargs):
        return cls(path, fs_options=fs_options, group=kwargs.get("group"))


def _s(v):
    return v.decode() if isinstance(v, bytes) else str(v)


register_opener(Hdf5Dataset)


class Writer:
    """Chunked HDF5 writer, v2 layout (reference: vaex-hdf5/vaex/hdf5/writer.py:22).

    layout() allocates all datasets up front (strings need total byte counts),
    write() streams evaluated chunks into the pre-allocated space.
    """

    def __init__(self, path, group="table", mode="w", byteorder="="):
        self.path = path
        self.h5 = h5py.File(path, mode)
        self.table = self.h5.require_group(group)
        self.table.attrs["type"] = "table"
        self.columns = self.h5.require_group(f"{group}/columns")
        self._datasets = {}

    def layout(self, df, progress=None):
        N = len(df)
        column_names = df.get_column_names()
        self.columns.attrs["column_order"] = ",".join(column_names)
        for name in column_names:
            dtype = df.data_type(name)
            g = self.columns.require_group(name)
            if dtype.is_string:
                # need total byte length: one cheap pass
                byte_length = df[name].str.byte_length().sum()
                ds = g.create_dataset("data", shape=(int(byte_length),), dtype=np.uint8, track_times=False)
                ds.attrs["dtype"] = "str"
                g.create_dataset("indices", shape=(N + 1,), dtype=np.int64, track_times=False)
                g.create_dataset("null_bitmap", shape=((N + 7) // 8,), dtype=np.uint8, track_times=False)
                self._datasets[name] = ("str", g)
            elif dtype.is_temporal:
                ds = g.create_dataset("data", shape=(N,), dtype=np.int64, track_times=False)
                ds.attrs["dtype"] = dtype.numpy.name
                self._datasets[name] = ("temporal", g)
            else:
                np_dtype = dtype.numpy
                ds = g.create_dataset("data", shape=(N,), dtype=np_dtype, track_times=False)
                if df.is_masked(name):
                    g.create_dataset("mask", shape=(N,), dtype=np.bool_, track_times=False)
                self._datasets[name] = ("numeric", g)

    def write(self, df, chunk_size=None, progress=None):
        column_names = list(self._datasets)
        offsets = {name: 0 for name in column_names}
        str_offsets = {name: 0 for name in column_names}
        for i1, i2, chunks in df.evaluate_iterator(column_names, chunk_size=chunk_size):
            for name, chunk in zip(column_names, chunks):
                kind, g = self._datasets[name]
                i = offsets[name]
                n = len(chunk)
                if kind == "str":
                    ar = array_types.to_arrow(chunk)
                    if isinstance(ar, pa.ChunkedArray):
                        ar = ar.combine_chunks()
                    ar = ar.cast(pa.large_string())
                    buf_null, buf_offsets, buf_data = ar.buffers()
                    # slice relative to the arrow array offset (reference:
                    # vaex/arrow/convert.py offset handling)
                    ar_offsets = np.frombuffer(
                        buf_offsets, dtype=np.int64, count=ar.offset + n + 1)[ar.offset:ar.offset + n + 1]
                    nbytes = int(ar_offsets[-1] - ar_offsets[0])
                    data = np.frombuffer(buf_data, dtype=np.uint8, count=int(ar_offsets[-1]))[int(ar_offsets[0]):]
                    so = str_offsets[name]
                    g["data"][so:so + nbytes] = data
                    g["indices"][i:i + n + 1] = ar_offsets - ar_offsets[0] + so
                    valid = np.ones(n, dtype=bool) if ar.null_count == 0 else ~np.asarray(ar.is_null())
                    # chunk boundaries need not be 8-row aligned: pad the
                    # leading bits and read-modify-write the boundary byte
                    # (writes are sequential, so bits past the current row are 0)
                    first, lead = i // 8, i % 8
                    bits = np.packbits(
                        np.concatenate([np.zeros(lead, dtype=bool), valid]), bitorder="little")
                    if lead:
                        bits[0] |= int(g["null_bitmap"][first])
                    g["null_bitmap"][first:first + len(bits)] = bits
                    str_offsets[name] = so + nbytes
                elif kind == "temporal":
                    ar = array_types.to_numpy(chunk)
                    g["data"][i:i + n] = ar.view(np.int64)
                else:
                    ar = array_types.to_numpy(chunk)
                    if np.ma.isMaskedArray(ar):
                        g["data"][i:i + n] = ar.data
                        if "mask" in g:
                            g["mask"][i:i + n] = np.ma.getmaskarray(ar)
                    else:
                        g["data"][i:i + n] = ar
                        if "mask" in g:
                            g["mask"][i:i + n] = False
                offsets[name] = i + n

    def close(self):
        self.h5.close()

    def __enter__(self):
        return self

    def __exit__(self, *args):
        self.close()


def export_hdf5(df, path, chunk_size=None, progress=None, group="table", mode="w"):
    with Writer(path, group=group, mode=mode) as writer:
        writer.layout(df, progress=progress)
        writer.write(df, chunk_size=chunk_size, progress=progress)
