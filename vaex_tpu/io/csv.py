"""CSV datasets: lazy chunked reads via pyarrow.csv.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/csv.py:134
(DatasetCsvLazy): the file is scanned in streaming batches so arbitrarily
large CSVs can feed the chunked executor without materializing; a small eager
path covers files that fit in memory.
"""

from __future__ import annotations

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.csv as pacsv
except ImportError:  # pragma: no cover
    pa = None
    pacsv = None

from ..dataset import Dataset, DatasetArrays, DatasetFile, chunk_rechunk, register, register_opener


@register
class CsvDatasetLazy(DatasetFile):
    """Streams the CSV per block; row_count requires one metadata pass."""

    snake_name = "csv-lazy"

    def __init__(self, path, fs_options=None, read_options=None, parse_options=None, convert_options=None):
        super().__init__(path, fs_options)
        self.read_options = read_options
        self.parse_options = parse_options
        self.convert_options = convert_options
        self._load()

    def _open_reader(self):
        return pacsv.open_csv(
            self.path,
            read_options=self.read_options,
            parse_options=self.parse_options,
            convert_options=self.convert_options,
        )

    def _load(self):
        # one pass for schema + row count (row offsets per batch not knowable
        # without scanning; cheap relative to any aggregation pass)
        reader = self._open_reader()
        self._schema = reader.schema
        n = 0
        for batch in reader:
            n += batch.num_rows
        self._row_count = n
        self._columns = {name: _CsvColumnPlaceholder(self, name) for name in self._schema.names}

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        chunk_size = chunk_size or 1024 * 1024
        end = self.row_count if end is None else end

        def raw_iter():
            reader = self._open_reader()
            offset = 0
            for batch in reader:
                b1, b2 = offset, offset + batch.num_rows
                offset = b2
                if b2 <= start or b1 >= end:
                    continue
                s1 = max(start, b1) - b1
                s2 = min(end, b2) - b1
                sliced = batch.slice(s1, s2 - s1)
                yield 0, s2 - s1, {name: sliced.column(name) for name in columns}

        yield from chunk_rechunk(raw_iter(), chunk_size, end - start)

    def __getitem__(self, name):
        return self._columns[name]

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".csv", ".csv.gz", ".tsv"))

    @classmethod
    def open(cls, path, fs_options=None, lazy=False, **kwargs):
        if lazy:
            return cls(path, fs_options=fs_options)
        table = pacsv.read_csv(str(path))
        return DatasetArrays({name: table.column(name) for name in table.column_names})


class _CsvColumnPlaceholder:
    """Column handle for a lazy CSV: random access triggers a scan."""

    def __init__(self, ds, name):
        self.ds = ds
        self.name = name

    def __len__(self):
        return self.ds.row_count

    def data_type(self):
        from ..datatype import DataType
        return DataType(self.ds._schema.field(self.name).type)

    def __getitem__(self, slice_):
        start, stop, _ = slice_.indices(len(self))
        parts = []
        for i1, i2, chunks in self.ds.chunk_iterator([self.name], chunk_size=1024 * 1024, start=start, end=stop):
            parts.append(chunks[self.name])
        from .. import array_types
        return array_types.concat(parts) if parts else pa.array([], type=self.ds._schema.field(self.name).type)

    def fingerprint(self):
        from .. import utils
        return utils.fingerprint("csv-column", self.ds.fingerprint, self.name)


register_opener(CsvDatasetLazy)


def export_csv(df, path, chunk_size=None, progress=None, **kwargs):
    """Chunked CSV export via pandas (reference: vaex/dataframe.py export_csv)."""
    import pandas as pd
    first = True
    for i1, i2, chunks in df.evaluate_iterator(df.get_column_names(), chunk_size=chunk_size):
        pdf = pd.DataFrame({name: np.asarray(chunk) if not hasattr(chunk, "to_pandas") else chunk.to_pandas()
                            for name, chunk in zip(df.get_column_names(), chunks)})
        pdf.to_csv(path, mode="w" if first else "a", header=first, index=False, **kwargs)
        first = False
