"""Scheme-dispatched file access: local, s3://, gs://, fsspec chains.

Counterpart of /root/reference/packages/vaex-core/vaex/file/ (open:285,
parse:211, fingerprint:243, s3/gcs modules, CachedFile block cache): remote
paths resolve through fsspec/pyarrow.fs; whole-file fetches are cached on
local disk so the mmap readers (hdf5/arrow/fits) work unchanged — a
file-granularity variant of the reference's block cache (file/cache.py:147).
"""

from __future__ import annotations

import builtins
import hashlib
import os
import shutil
import urllib.parse

from . import settings

SCHEMES = ("s3://", "gs://", "gcs://", "az://", "http://", "https://", "memory://")


def is_remote(path) -> bool:
    return isinstance(path, str) and path.startswith(SCHEMES)


def split_options(path):
    """'s3://bucket/key?anon=true' → ('s3://bucket/key', {'anon': 'true'})
    (reference: file/__init__.py parse:211)."""
    if not isinstance(path, str) or "?" not in path:
        return path, {}
    base, _, query = path.partition("?")
    options = dict(urllib.parse.parse_qsl(query))
    return base, options


stringyfy = str


def fingerprint(path, fs_options=None):
    """O(1) identity of a file path (reference: file/__init__.py:243)."""
    from . import utils
    if is_remote(path):
        return utils.fingerprint("file", path, fs_options or {})
    try:
        st = os.stat(path)
        return utils.fingerprint("file", os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        return utils.fingerprint("file", os.path.abspath(str(path)))


def open(path, mode="rb", fs_options=None, use_cache=None, **kwargs):
    """File object for local or remote paths.

    use_cache=True (or fs_options {'cache': 'block'}) wraps remote reads in
    the block-level CachedFile so only touched byte ranges download."""
    path, url_options = split_options(path)
    fs_options = {**url_options, **(fs_options or {})}
    if use_cache is None:
        use_cache = fs_options.pop("cache", None) in ("block", "true", True)
    else:
        fs_options.pop("cache", None)
    if not is_remote(path):
        return builtins.open(path, mode)
    import fsspec
    if use_cache and "r" in mode and "w" not in mode:
        return CachedFile(lambda: fsspec.open(path, "rb", **fs_options).open(), path)
    return fsspec.open(path, mode, **fs_options).open()


def memory_mappable(path) -> bool:
    return not is_remote(path)


def cache_dir():
    d = os.path.join(os.path.dirname(settings.cache.path), "file-cache")
    os.makedirs(d, exist_ok=True)
    return d


def fetch_local(path, fs_options=None, progress=None):
    """Materialize a remote file in the local cache; returns the local path
    (mmap readers then work unchanged).  Local paths pass through."""
    path, url_options = split_options(path)
    if not is_remote(path):
        return path
    fs_options = {**url_options, **(fs_options or {})}
    key = hashlib.blake2b(path.encode(), digest_size=12).hexdigest()
    suffix = os.path.splitext(path)[1]
    local = os.path.join(cache_dir(), key + suffix)
    if os.path.exists(local):
        return local
    import fsspec
    tmp = local + ".part"
    with fsspec.open(path, "rb", **fs_options).open() as src, \
            builtins.open(tmp, "wb") as dst:
        shutil.copyfileobj(src, dst, length=16 * 1024 * 1024)
    os.replace(tmp, local)
    return local


DEFAULT_BLOCK_SIZE = 1 << 20


class CachedFile:
    """Block-level lazily-populated local cache over a remote file
    (reference: file/cache.py:147 CachedFile — mmap'd data file + used-block
    mask; here a sparse data file + one mask byte per block).

    Reads pull only the missing blocks over the network, so readers that
    touch a fraction of a big remote file (arrow/hdf5 column slices) never
    download the rest.  The cache persists across processes under
    `<file-cache>/blocks/`.
    """

    def __init__(self, file, path, cache_dir_path=None, block_size=DEFAULT_BLOCK_SIZE, size=None):
        self.name = path
        self.path = path
        self._file_factory = file if callable(file) else (lambda f=file: f)
        self._file = None if callable(file) else file
        self.block_size = int(block_size)
        self.block_reads = 0
        self.reads = 0
        self.loc = 0
        key = hashlib.blake2b(f"{path}:{self.block_size}".encode(), digest_size=12).hexdigest()
        base = cache_dir_path or os.path.join(cache_dir(), "blocks")
        os.makedirs(base, exist_ok=True)
        self._data_path = os.path.join(base, key + ".data")
        self._mask_path = os.path.join(base, key + ".mask")
        if size is None:
            f = self._underlying()
            f.seek(0, 2)
            size = f.tell()
        self.size = int(size)
        n_blocks = (self.size + self.block_size - 1) // self.block_size
        if os.path.exists(self._mask_path) and os.path.getsize(self._mask_path) == n_blocks:
            with builtins.open(self._mask_path, "rb") as f:
                self._mask = bytearray(f.read())
        else:
            self._mask = bytearray(n_blocks)
            with builtins.open(self._data_path, "wb") as f:
                f.truncate(self.size)
            self._save_mask()
        self._data = builtins.open(self._data_path, "r+b") if self.size else None

    def _underlying(self):
        if self._file is None:
            self._file = self._file_factory()
        return self._file

    def _save_mask(self):
        with builtins.open(self._mask_path, "wb") as f:
            f.write(bytes(self._mask))

    def _ensure(self, start, end):
        if self.size == 0:
            return
        b0 = start // self.block_size
        b1 = (max(start, min(end, self.size) - 1)) // self.block_size
        b = b0
        dirty = False
        while b <= b1:
            if self._mask[b]:
                b += 1
                continue
            run0 = b
            while b <= b1 and not self._mask[b]:
                b += 1
            lo = run0 * self.block_size
            hi = min(b * self.block_size, self.size)
            f = self._underlying()
            f.seek(lo)
            data = f.read(hi - lo)
            self._data.seek(lo)
            self._data.write(data)
            for i in range(run0, b):
                self._mask[i] = 1
            self.block_reads += b - run0
            dirty = True
        if dirty:
            self._data.flush()
            self._save_mask()

    def read(self, length=-1):
        self.reads += 1
        if length < 0:
            length = self.size - self.loc
        length = max(0, min(length, self.size - self.loc))
        if length == 0:
            return b""
        self._ensure(self.loc, self.loc + length)
        self._data.seek(self.loc)
        out = self._data.read(length)
        self.loc += len(out)
        return out

    def seek(self, loc, whence=0):
        if whence == 0:
            self.loc = loc
        elif whence == 1:
            self.loc += loc
        else:
            self.loc = self.size + loc
        return self.loc

    def tell(self):
        return self.loc

    def readable(self):
        return True

    def seekable(self):
        return True

    def close(self):
        if self._data is not None:
            self._data.close()
        if self._file is not None:
            self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
