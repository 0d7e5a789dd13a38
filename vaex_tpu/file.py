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


def open(path, mode="rb", fs_options=None, **kwargs):
    """File object for local or remote paths."""
    path, url_options = split_options(path)
    fs_options = {**url_options, **(fs_options or {})}
    if not is_remote(path):
        return builtins.open(path, mode)
    import fsspec
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
