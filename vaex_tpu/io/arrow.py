"""Arrow IPC / Feather / Parquet datasets.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/arrow/
dataset.py:22-380: Arrow IPC files are memory-mapped zero-copy; Parquet scans
lazily per row-group so out-of-core streaming never materializes the file.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.feather
    import pyarrow.parquet as pq
except ImportError:  # pragma: no cover
    pa = None
    pq = None

from .. import array_types, utils
from ..column import Column
from ..dataset import DatasetFile, register, register_opener
from ..datatype import DataType


@register
class ArrowDataset(DatasetFile):
    """Memory-mapped Arrow IPC file (feather v2 included)."""

    snake_name = "arrow"

    def __init__(self, path, fs_options=None):
        super().__init__(path, fs_options)
        self._load()

    def _load(self):
        source = pa.memory_map(self.path)
        try:
            reader = pa.ipc.open_file(source)
            table = reader.read_all()
        except pa.ArrowInvalid:
            source.seek(0)
            reader = pa.ipc.open_stream(source)
            table = reader.read_all()
        self._source = source
        self._columns = {name: table.column(name) for name in table.column_names}
        self._row_count = table.num_rows

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".arrow", ".feather", ".ipc"))

    @classmethod
    def open(cls, path, fs_options=None, **kwargs):
        p = str(path)
        if p.endswith(".feather"):
            # feather may be compressed; read via feather API
            table = pyarrow.feather.read_table(p)
            from ..dataset import DatasetArrays
            return DatasetArrays({name: table.column(name) for name in table.column_names})
        return cls(path, fs_options=fs_options)


class ColumnParquetLazy(Column):
    """Lazy column over parquet row groups: reads only the row-groups a chunk
    request touches (reference: vaex/arrow/dataset.py fragment scanning)."""

    def __init__(self, parquet_file, name, row_group_offsets, row_count):
        self.pf = parquet_file
        self.name = name
        self.offsets = row_group_offsets  # cumulative, len = n_groups+1
        self.row_count = row_count

    def __len__(self):
        return self.row_count

    def data_type(self):
        idx = self.pf.schema_arrow.get_field_index(self.name)
        return DataType(self.pf.schema_arrow.field(idx).type)

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        g1 = int(np.searchsorted(self.offsets, start, side="right") - 1)
        g2 = int(np.searchsorted(self.offsets, stop, side="left"))
        g2 = max(g2, g1 + 1)
        table = self.pf.read_row_groups(list(range(g1, g2)), columns=[self.name])
        col = table.column(0)
        local_start = start - self.offsets[g1]
        return col.slice(local_start, stop - start)

    def _fingerprint_info(self):
        return dict(path=getattr(self.pf, "_vaex_path", None), name=self.name)


@register
class ParquetDataset(DatasetFile):
    snake_name = "parquet"

    def __init__(self, path, fs_options=None):
        super().__init__(path, fs_options)
        self._load()

    def _load(self):
        self.pf = pq.ParquetFile(self.path)
        self.pf._vaex_path = self.path
        n_groups = self.pf.num_row_groups
        offsets = np.zeros(n_groups + 1, dtype=np.int64)
        for i in range(n_groups):
            offsets[i + 1] = offsets[i] + self.pf.metadata.row_group(i).num_rows
        self._row_count = int(offsets[-1])
        names = self.pf.schema_arrow.names
        self._columns = {name: ColumnParquetLazy(self.pf, name, offsets, self._row_count) for name in names}

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".parquet", ".pq"))

    @classmethod
    def open(cls, path, fs_options=None, **kwargs):
        return cls(path, fs_options=fs_options)


register_opener(ArrowDataset)
register_opener(ParquetDataset)


def export_arrow(df, path, chunk_size=None, progress=None, as_stream=False):
    """Write Arrow IPC file (reference: vaex/arrow/dataset.py export)."""
    schema = df.schema_arrow()
    open_ipc = pa.ipc.new_stream if as_stream else pa.ipc.new_file
    with pa.OSFile(str(path), "wb") as sink:
        with open_ipc(sink, schema) as writer:
            for i1, i2, chunks in df.evaluate_iterator(df.get_column_names(), chunk_size=chunk_size, array_type="arrow"):
                arrays = [_as_arrow_chunk(c, schema.field(i).type) for i, c in enumerate(chunks)]
                writer.write_batch(pa.record_batch(arrays, schema=schema))


def _as_arrow_chunk(chunk, typ):
    ar = array_types.to_arrow(chunk)
    if isinstance(ar, pa.ChunkedArray):
        ar = ar.combine_chunks()
    if ar.type != typ:
        ar = ar.cast(typ)
    return ar


def export_parquet(df, path, chunk_size=None, progress=None):
    schema = df.schema_arrow()
    with pq.ParquetWriter(str(path), schema) as writer:
        for i1, i2, chunks in df.evaluate_iterator(df.get_column_names(), chunk_size=chunk_size, array_type="arrow"):
            arrays = [_as_arrow_chunk(c, schema.field(i).type) for i, c in enumerate(chunks)]
            writer.write_table(pa.table(arrays, schema=schema))


def export_feather(df, path, chunk_size=None, progress=None, compression="lz4"):
    table = df.to_arrow_table()
    pyarrow.feather.write_feather(table, str(path), compression=compression)
