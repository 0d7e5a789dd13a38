"""CSV datasets: byte-range lazy chunking via mmap + pyarrow.csv.

TPU-native counterpart of /root/reference/packages/vaex-core/vaex/csv.py:56-134
(file_chunks_mmap + DatasetCsvLazy): the file is memory-mapped and split into
newline-aligned byte fragments up front; per-fragment row offsets come from a
single parallel newline count, so ``chunk_iterator(start=X)`` seeks straight
to the covering fragment (O(range) work, random access + parallel prefetch)
instead of re-parsing from the top.  A small eager path covers files that fit
in memory.

Caveat (shared with the reference): row offsets are newline counts, so quoted
fields containing literal newlines break the fragment row accounting.  The
parse path validates counts per fragment and raises with a pointer to the
eager reader when that happens.
"""

from __future__ import annotations

import mmap
import os

import numpy as np

try:
    import pyarrow as pa
    import pyarrow.csv as pacsv
except ImportError:  # pragma: no cover
    pa = None
    pacsv = None

from ..dataset import Dataset, DatasetArrays, DatasetFile, chunk_rechunk, register, register_opener
from ..itertools import buffer as buffer_iter, pmap

MB = 1 << 20
DEFAULT_FRAGMENT_BYTES = 16 * MB
NEWLINE = 0x0A


def _open_mmap(path):
    f = open(path, "rb")
    size = os.fstat(f.fileno()).st_size
    if size == 0:
        f.close()
        raise ValueError(f"empty CSV file: {path}")
    mm = mmap.mmap(f.fileno(), size, prot=mmap.PROT_READ)
    f.close()
    return memoryview(mm)


def newline_fragments(data, target_bytes):
    """Split ``data`` into [(begin, end)) byte ranges cut at newline
    boundaries: each range ends just after a newline (or at EOF), so every
    range holds whole CSV records."""
    size = len(data)
    fragments = []
    begin = 0
    while begin < size:
        end = min(size, begin + target_bytes)
        if end < size:
            # scan forward for the next newline, widening the window as needed
            window = 4096
            nl = -1
            while nl < 0:
                probe_end = min(size, end + window)
                nl = bytes(data[end:probe_end]).find(b"\n")
                if nl < 0 and probe_end == size:
                    break
                window *= 8
            end = size if nl < 0 else end + nl + 1
        fragments.append((begin, end))
        begin = end
    return fragments


def _count_rows(data, begin, end):
    """Rows in a fragment = newlines (plus one if the file lacks a final
    newline — only possible for the last fragment)."""
    arr = np.frombuffer(data[begin:end], dtype=np.uint8)
    count = int(np.count_nonzero(arr == NEWLINE))
    if arr[-1] != NEWLINE:
        count += 1
    return count


@register
class CsvDatasetLazy(DatasetFile):
    """Newline-aligned byte-range fragments with O(1) row seeking."""

    snake_name = "csv-lazy"

    def __init__(self, path, fs_options=None, fragment_bytes=DEFAULT_FRAGMENT_BYTES,
                 read_options=None, parse_options=None, convert_options=None):
        super().__init__(path, fs_options)
        self.fragment_bytes = int(fragment_bytes)
        self.read_options = read_options
        self.parse_options = parse_options
        self.convert_options = convert_options
        self._data = None
        self._load()

    # -- metadata pass -----------------------------------------------------
    def _mmap(self):
        if self._data is None:
            self._data = _open_mmap(self.path)
        return self._data

    def _load(self):
        data = self._mmap()
        self._fragments = newline_fragments(data, self.fragment_bytes)
        # schema: parse the first fragment with header autodetection; its
        # types then pin every later fragment (no mid-file schema drift)
        first = pacsv.read_csv(
            pa.input_stream(data[slice(*self._fragments[0])]),
            read_options=self.read_options,
            parse_options=self.parse_options,
            convert_options=self.convert_options,
        )
        self._schema = first.schema
        # parallel newline count per fragment → cumulative row offsets
        counts = list(pmap(lambda be: _count_rows(data, *be), self._fragments,
                           max_workers=min(8, len(self._fragments))))
        counts[0] -= 1  # the header line
        offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._row_offsets = offsets
        self._row_count = int(offsets[-1])
        self._columns = {name: _CsvColumnPlaceholder(self, name) for name in self._schema.names}

    # -- fragment parsing ----------------------------------------------------
    def _parse_fragment(self, i, columns):
        begin, end = self._fragments[i]
        names = list(self._schema.names)
        read_options = pacsv.ReadOptions(
            column_names=names, skip_rows=1 if i == 0 else 0,
            block_size=end - begin,
        )
        convert_options = pacsv.ConvertOptions(
            column_types={name: self._schema.field(name).type for name in names},
            include_columns=list(columns),
        )
        table = pacsv.read_csv(
            pa.input_stream(self._mmap()[begin:end]),
            read_options=read_options,
            parse_options=self.parse_options,
            convert_options=convert_options,
        )
        expected = int(self._row_offsets[i + 1] - self._row_offsets[i])
        if len(table) != expected:
            raise ValueError(
                f"CSV fragment {i} of {self.path} parsed to {len(table)} rows, "
                f"expected {expected}: the file likely contains quoted fields "
                f"with embedded newlines; open it with lazy=False")
        return table

    def chunk_iterator(self, columns, chunk_size=None, reverse=False, start=0, end=None):
        chunk_size = chunk_size or 1024 * 1024
        end = self.row_count if end is None else end

        # seek: first fragment whose row range covers `start`
        first_frag = int(np.searchsorted(self._row_offsets, start, side="right") - 1)
        first_frag = max(0, first_frag)

        def fragment_tables():
            for i in range(first_frag, len(self._fragments)):
                row_start = int(self._row_offsets[i])
                if row_start >= end:
                    break
                yield i, row_start

        def raw_iter():
            parsed = buffer_iter(
                ((i, row_start, self._parse_fragment(i, columns)) for i, row_start in fragment_tables()),
                n=2)  # parse-ahead on a thread: IO overlaps the consumer
            for i, row_start, table in parsed:
                row_end = row_start + len(table)
                s1 = max(start, row_start) - row_start
                s2 = min(end, row_end) - row_start
                if s2 <= s1:
                    continue
                sliced = table.slice(s1, s2 - s1)
                yield 0, s2 - s1, {name: sliced.column(name) for name in columns}

        yield from chunk_rechunk(raw_iter(), chunk_size, end - start)

    def __getitem__(self, name):
        return self._columns[name]

    def __getstate__(self):
        state = super().__getstate__()
        state.pop("_data", None)      # mmap handle is not picklable
        return state

    def __setstate__(self, state):
        super().__setstate__(state)
        self._data = None

    def close(self):
        if self._data is not None:
            mm = self._data.obj
            self._data.release()
            self._data = None
            try:
                mm.close()
            except BufferError:
                # a parsed table still exports slices of the map; the mmap
                # closes when the last arrow buffer is collected
                pass

    @classmethod
    def can_open(cls, path, **kwargs):
        return str(path).endswith((".csv", ".csv.gz", ".tsv"))

    @classmethod
    def open(cls, path, fs_options=None, lazy=False, **kwargs):
        if lazy:
            return cls(path, fs_options=fs_options, **kwargs)
        table = pacsv.read_csv(str(path))
        return DatasetArrays({name: table.column(name) for name in table.column_names})


class _CsvColumnPlaceholder:
    """Column handle for a lazy CSV: random access parses only the covering
    fragments (O(range), not O(file))."""

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
