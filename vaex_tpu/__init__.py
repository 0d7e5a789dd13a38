"""vaex_tpu: a TPU-native out-of-core DataFrame engine.

Brand-new framework with the capabilities of vaex (reference mounted at
/root/reference): lazy string-expression DataFrames over memory-mapped
columns, where every statistic is computed on an N-d binned grid in one
streaming pass — but the pass is a fused XLA/Pallas program on TPU instead of
C++ evaluators on CPU threads.  See SURVEY.md for the design translation.
"""

from __future__ import annotations


def _tune_malloc():
    """OPT-IN (VAEX_TPU_MALLOC_TUNE=1): keep large buffers on the heap
    instead of per-call mmap/munmap.

    Round-2 measured heap retention as a 2x win; on the round-3 kernel the
    sign FLIPPED: sbrk-grown heap pages fault ~100x slower than fresh
    anonymous mmap pages (measured in-process: np.empty first-touch of 64MB
    = 6.5s on the heap vs 9-28ms via mmap; a warm 16.7M-row join = 2.1s vs
    0.11s).  Default is therefore glibc's stock behavior (mmap for >128KB);
    set VAEX_TPU_MALLOC_TUNE=1 on runtimes where heap reuse wins — measure
    one warm `np.empty(64<<20, np.uint8)[::4096] = 1` to decide.
    """
    import ctypes
    import os
    import sys
    if not sys.platform.startswith("linux"):
        return
    if os.environ.get("VAEX_TPU_MALLOC_TUNE", "0").lower() in ("0", "false", "no", ""):
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    except Exception:  # pragma: no cover - non-glibc platforms
        pass


_tune_malloc()

import jax

# Analytics semantics need int64/float64 (reference engine is numpy-based);
# hot kernels opt into f32/bf16 explicitly (settings.compute.precision).
jax.config.update("jax_enable_x64", True)

# persistent XLA compile cache: pass programs compile once per machine
import os as _os
if not _os.environ.get("VAEX_TPU_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("VAEX_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/vaex_tpu_xla")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from . import dataset as _dataset_mod  # noqa: E402
from . import settings  # noqa: E402
from .datatype import DataType  # noqa: E402
from .column import ColumnVirtualRange  # noqa: E402

__version__ = "0.1.0"


def dtype(t):
    return DataType(t)


def dtype_of(ar):
    from . import array_types
    return array_types.data_type(ar)


def from_dataset(ds, name=None):
    from .dataframe import DataFrameLocal
    return DataFrameLocal(ds, name=name)


def from_arrays(**arrays):
    """In-memory DataFrame from numpy/Arrow arrays
    (reference: vaex/__init__.py from_arrays)."""
    return from_dataset(_dataset_mod.DatasetArrays(arrays))


def from_dict(data):
    return from_arrays(**data)


def from_scalars(**kwargs):
    """Length-1 DataFrame from scalars (reference: vaex/__init__.py:403)."""
    import numpy as np
    return from_arrays(**{k: np.array([v]) for k, v in kwargs.items()})


def from_items(*items):
    return from_arrays(**dict(items))


def from_pandas(df, name=None, copy_index=False, index_name="index"):
    import pyarrow as pa
    arrays = {}

    def convert(values):
        if isinstance(values, np.ndarray):
            return values
        try:
            return values.to_numpy(copy=False)
        except (TypeError, ValueError):
            pass
        try:
            return pa.Array.from_pandas(values)
        except Exception:  # noqa: BLE001
            return np.asarray(values)

    for column in df.columns.tolist():
        series = df[column]
        if series.dtype == object or str(series.dtype) in ("string", "str", "large_string[pyarrow]", "string[pyarrow]"):
            arrays[str(column)] = pa.Array.from_pandas(series)
        else:
            arrays[str(column)] = convert(series.values)
    if copy_index:
        arrays[index_name] = np.asarray(df.index.values)
    return from_arrays(**arrays)


def from_arrow_table(table):
    return from_arrays(**{name: table.column(name) for name in table.column_names})


def from_records(records, array_type="arrow", defaults=None):
    """List-of-dicts → DataFrame (reference: vaex/__init__.py from_records)."""
    defaults = defaults or {}
    names = []
    for record in records:
        for name in record:
            if name not in names:
                names.append(name)
    arrays = {}
    for name in names:
        values = [record.get(name, defaults.get(name)) for record in records]
        try:
            arrays[name] = np.array(values)
        except Exception:
            import pyarrow as pa
            arrays[name] = pa.array(values)
    return from_arrays(**arrays)


def from_csv(path, **kwargs):
    from .io.csv import CsvDatasetLazy
    return from_dataset(CsvDatasetLazy.open(path, **kwargs))


def from_ascii(path, **kwargs):
    return from_csv(path, **kwargs)


def from_json(path, orient=None, **kwargs):
    import pandas as pd
    return from_pandas(pd.read_json(path, orient=orient, **kwargs))


class _Aliases(dict):
    """Persistent name -> path aliases (reference: vaex.aliases,
    vaex/__init__.py:185 resolution in open()).  Stored as JSON (valid YAML)
    at settings.main.aliases_path; loaded lazily, written on mutation."""

    def __init__(self):
        super().__init__()
        self._loaded = False

    def _load(self):
        if self._loaded:
            return
        self._loaded = True
        import json
        try:
            with builtins.open(settings.main.aliases_path) as f:
                self.update(json.load(f))
        except (OSError, ValueError):
            pass

    def _save(self):
        import json
        path = settings.main.aliases_path
        _os.makedirs(_os.path.dirname(path), exist_ok=True)
        with builtins.open(path, "w") as f:
            json.dump(dict(self), f, indent=2, sort_keys=True)

    def __getitem__(self, key):
        self._load()
        return super().__getitem__(key)

    def __contains__(self, key):
        self._load()
        return super().__contains__(key)

    def __setitem__(self, key, value):
        self._load()
        super().__setitem__(key, value)
        self._save()

    def __delitem__(self, key):
        self._load()
        super().__delitem__(key)
        self._save()

    def keys(self):
        self._load()
        return super().keys()

    def items(self):
        self._load()
        return super().items()


import builtins  # noqa: E402

aliases = _Aliases()


def open(path, convert=False, shuffle=False, fs_options=None, progress=None, **kwargs):
    """Open a file (hdf5/arrow/parquet/csv/fits/…) as a lazy DataFrame
    (reference: vaex/__init__.py:111).

    convert=True (or a path) converts non-mmappable formats (csv, …) to HDF5
    once and opens the converted file (reference: convert.py).  Remote paths
    (s3://, gs://, …) are fetched into the local file cache first
    (file.fetch_local)."""
    import glob as globlib
    import os as _os
    from . import file as file_mod
    if isinstance(path, (list, tuple)):
        return concat([open(p, fs_options=fs_options, **kwargs) for p in path])
    spath = str(path)
    if spath in aliases:
        spath = aliases[spath]
    if file_mod.is_remote(spath):
        spath = file_mod.fetch_local(spath, fs_options=fs_options, progress=progress)
    elif any(ch in spath for ch in "*?["):
        paths = sorted(globlib.glob(spath))
        if not paths:
            raise IOError(f"no files matching {spath}")
        if len(paths) > 1:
            return concat([open(p, fs_options=fs_options, **kwargs) for p in paths])
        spath = paths[0]
    if convert:
        converted = convert if isinstance(convert, str) else spath + ".hdf5"
        if not _os.path.exists(converted):
            df_src = from_dataset(_dataset_mod.open(spath, fs_options=fs_options, **kwargs))
            df_src.export_hdf5(converted)
        spath = converted
    ds = _dataset_mod.open(spath, fs_options=fs_options, **kwargs)
    df = from_dataset(ds)
    if shuffle:
        df = df.shuffle()
    return df


def open_many(paths, **kwargs):
    return concat([open(p, **kwargs) for p in paths])


def concat(dfs, resolver="flexible"):
    """Lazily concatenate DataFrames (reference: vaex/__init__.py concat)."""
    from .dataframe import DataFrameConcatenated
    return DataFrameConcatenated(dfs, resolver=resolver)


def vrange(start, stop, step=1, dtype="int64"):
    """Virtual range column: billions of rows, zero bytes
    (reference: vaex/__init__.py vrange)."""
    return ColumnVirtualRange(start, stop, step, dtype)


def vconstant(value, length, dtype=None):
    from .column import ColumnVirtualConstant
    return ColumnVirtualConstant(value, length, dtype)


def string_column(strings):
    import pyarrow as pa
    return pa.array(strings)


def connect(url, token=None):
    """Connect to a vaex_tpu server: `vaex_tpu.connect('ws://host:port')`
    (reference: vaex/__init__.py:649)."""
    from .server.client import connect as _connect
    return _connect(url, token=token)


def serve(dataframes, host="localhost", port=8765, token=None):
    """Start a websocket server for the given {name: df} mapping
    (the `server` name is taken by the subpackage)."""
    from .server.server import start_server
    return start_server(dataframes, host=host, port=port, token=token)


_examples = {}


def example(n_rows=330_000, seed=42):
    """Synthetic analogue of the reference example dataset (reference:
    vaex/__init__.py:659 downloads helmi-dezeeuw-2000-FeH-v2; we generate a
    deterministic gaussian mixture with the same column names instead —
    no egress in this environment)."""
    key = (n_rows, seed)
    if key not in _examples:
        rng = np.random.RandomState(seed)
        k = n_rows
        x, y, z = rng.normal(0, 1, (3, k))
        vx, vy, vz = rng.normal(0, 30, (3, k))
        E = -70000 + 0.5 * (vx**2 + vy**2 + vz**2) + 1000 * (x**2 + y**2 + z**2)
        L = np.sqrt((y * vz - z * vy) ** 2 + (z * vx - x * vz) ** 2 + (x * vy - y * vx) ** 2)
        Lz = x * vy - y * vx
        FeH = rng.uniform(-3, 0.5, k)
        _examples[key] = from_arrays(
            id=np.arange(k, dtype=np.int32), x=x, y=y, z=z, vx=vx, vy=vy, vz=vz,
            E=E, L=L, Lz=Lz, FeH=FeH)
    return _examples[key]


def register_function(f=None, name=None, on_expression=True, df_accessor=None, multiprocessing=False):
    from .functions import register_function as _rf
    return _rf(f=f, name=name, on_expression=on_expression)


def register_dataframe_accessor(name, cls=None, override=False):
    from .dataframe import register_dataframe_accessor as _rda
    return _rda(name, cls=cls, override=override)


# submodule conveniences (populated as the modules land)
from . import agg  # noqa: E402,F401
from . import cache  # noqa: E402,F401
from . import stat  # noqa: E402,F401


def _groupby_exports():
    from .groupby import Binner, BinnerTime, Grouper, GrouperCategory
    return Binner, BinnerTime, Grouper, GrouperCategory


def __getattr__(name):
    # lazy top-level exports (reference exposes these via vaex.groupby)
    if name in ("Binner", "BinnerTime", "Grouper", "GrouperCategory"):
        from . import groupby as _g
        return getattr(_g, name)
    if name in ("DataFrame", "DataFrameLocal", "Expression"):
        from . import dataframe as _d, expression as _e
        return getattr(_d, name, None) or getattr(_e, name)
    if name in ("ml", "viz", "widget", "geo", "astro", "server", "contrib",
                "vaexfast", "io"):
        # lazy subpackages: `vaex.ml.StandardScaler` works without an
        # explicit `import vaex_tpu.ml` (PEP 562)
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module 'vaex_tpu' has no attribute {name!r}")


class RowLimitException(Exception):
    """Raised when a groupby/unique explodes past row_limit
    (reference: vaex/__init__.py:870)."""


class UserAbort(Exception):
    """Raised on cancellation via progress callbacks
    (reference: vaex/execution.py:38)."""


def apply(f, *args, **kwargs):
    raise NotImplementedError("use df.apply")


def _scan_entry_points():
    """Load third-party plugins declared via package entry points
    (reference: vaex/__init__.py:735-808 scans 'vaex.plugin' and
    'vaex.dataframe.accessor' through pkg_resources).

    Groups: 'vaex_tpu.plugin' entries are called with this module;
    'vaex_tpu.dataframe.accessor' entries register as df accessors under
    their entry name.  Failures are warnings, never import errors."""
    if _os.environ.get("VAEX_TPU_NO_PLUGINS"):
        return
    import sys as _sys
    try:
        from importlib.metadata import entry_points as _entry_points
    except ImportError:  # pragma: no cover
        return
    this = _sys.modules[__name__]
    for ep in _entry_points(group="vaex_tpu.plugin"):
        try:
            ep.load()(this)
        except Exception as e:  # pragma: no cover - third-party code
            import warnings
            warnings.warn(f"vaex_tpu plugin {ep.name!r} failed to load: {e}")
    for ep in _entry_points(group="vaex_tpu.dataframe.accessor"):
        try:
            register_dataframe_accessor(ep.name, ep.load())
        except Exception as e:  # pragma: no cover - third-party code
            import warnings
            warnings.warn(f"vaex_tpu accessor {ep.name!r} failed to load: {e}")


_scan_entry_points()
