"""Small shared utilities (reference: /root/reference/packages/vaex-core/vaex/utils.py)."""

from __future__ import annotations

import collections.abc
import contextlib
import functools
import hashlib
import json
import os
import re
import sys

import numpy as np


def listify(*args):
    """Normalize scalar-or-list arguments: returns (was_list, [lists...]).

    Reference: vaex/utils.py `_ensure_strings_from_expressions` era helpers.
    """
    if isinstance(args[0], (list, tuple)):
        return True, [list(a) for a in args]
    return False, [[a] for a in args]


def unlistify(waslist, data):
    if waslist:
        return data
    return data[0]


def _issequence(x):
    return isinstance(x, (list, tuple, np.ndarray))


def as_flat_float(a):
    if a.dtype.type == np.float64 and a.strides[0] == 8:
        return a
    return a.astype(np.float64, copy=True)


def check_memory_usage(bytes_needed):
    return True


_fingerprint_primitives = (str, int, float, bool, bytes, type(None))


def _fingerprint_normalize(obj):
    if isinstance(obj, _fingerprint_primitives):
        return obj
    if isinstance(obj, (np.datetime64, np.timedelta64)):
        # np.timedelta64 subclasses np.signedinteger but int() can fail
        return f"{obj!r}"
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.dtype):
        return str(obj)
    if isinstance(obj, np.ndarray):
        return hash_array_data(obj)
    if isinstance(obj, collections.abc.Mapping):
        return {str(k): _fingerprint_normalize(v) for k, v in sorted(obj.items(), key=lambda kv: str(kv[0]))}
    if isinstance(obj, (list, tuple)):
        return [_fingerprint_normalize(v) for v in obj]
    if isinstance(obj, (set, frozenset)):
        return sorted(_fingerprint_normalize(v) for v in obj)
    fp = getattr(obj, "fingerprint", None)
    if fp is not None:
        return fp() if callable(fp) else fp
    return repr(obj)


def fingerprint(*args, **kwargs):
    """Deterministic fingerprint of (nested) python/numpy values.

    Counterpart of the reference's dask-tokenize based `vaex.cache.fingerprint`
    (/root/reference/packages/vaex-core/vaex/cache.py:387).
    """
    data = _fingerprint_normalize([list(args), kwargs])
    blob = json.dumps(data, default=str, sort_keys=True).encode()
    return hashlib.blake2b(blob, digest_size=16).hexdigest()


def hash_array_data(ar: np.ndarray, sample_limit=1024 * 1024 * 16) -> str:
    """Content hash of an ndarray; large arrays hashed by (head, tail, shape)
    sample for O(1)-ish cost (reference hashes full arrays with an on-disk
    cache, /root/reference/packages/vaex-core/vaex/dataset.py:163)."""
    ar = np.ascontiguousarray(ar)
    h = hashlib.blake2b(digest_size=16)
    h.update(str((ar.dtype.str, ar.shape)).encode())
    if ar.dtype.kind in "Mm":
        ar = ar.view(np.int64)
    elif ar.dtype.kind == "O":
        for item in ar[:65536]:
            h.update(repr(item).encode())
        return h.hexdigest()
    nbytes = ar.nbytes
    if nbytes <= sample_limit:
        h.update(memoryview(ar).cast("B"))
    else:
        flat = ar.reshape(-1)
        step = max(1, len(flat) // 1024)
        h.update(memoryview(np.ascontiguousarray(flat[::step])).cast("B"))
        h.update(memoryview(np.ascontiguousarray(flat[:65536])).cast("B"))
        h.update(memoryview(np.ascontiguousarray(flat[-65536:])).cast("B"))
    return h.hexdigest()


def hash_combine(*fps):
    h = hashlib.blake2b(digest_size=16)
    for fp in fps:
        h.update(str(fp).encode())
    return h.hexdigest()


def find_valid_name(name, used=None):
    """Make a string a valid python identifier, avoiding collisions."""
    used = used or []
    name = re.sub(r"\W", "_", str(name))
    if name and name[0].isdigit():
        name = "_" + name
    if name in used:
        i = 1
        while f"{name}_{i}" in used:
            i += 1
        name = f"{name}_{i}"
    return name


def counter_to_string(count):
    for unit, scale in [("T", 1e12), ("G", 1e9), ("M", 1e6), ("k", 1e3)]:
        if count >= scale:
            return f"{count / scale:.2f}{unit}"
    return str(count)


def filesize_format(size):
    for unit in ["bytes", "KiB", "MiB", "GiB", "TiB"]:
        if size < 1024:
            return f"{size:.1f} {unit}" if unit != "bytes" else f"{size} bytes"
        size /= 1024.0
    return f"{size:.1f} PiB"


def parse_memory_size(text):
    if isinstance(text, (int, float)):
        return int(text)
    m = re.match(r"^([\d.]+)\s*([kKmMgGtT]?)i?[bB]?$", text.strip())
    if not m:
        raise ValueError(f"cannot parse memory size {text!r}")
    value = float(m.group(1))
    scale = {"": 1, "k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}[m.group(2).lower()]
    return int(value * scale)


@contextlib.contextmanager
def env_override(name, value):
    old = os.environ.get(name)
    os.environ[name] = str(value)
    try:
        yield
    finally:
        if old is None:
            del os.environ[name]
        else:
            os.environ[name] = old


def required_dtype_for_max(n, signed=True):
    if signed:
        for dt in [np.int8, np.int16, np.int32, np.int64]:
            if n <= np.iinfo(dt).max:
                return np.dtype(dt)
    else:
        for dt in [np.uint8, np.uint16, np.uint32, np.uint64]:
            if n <= np.iinfo(dt).max:
                return np.dtype(dt)
    raise ValueError(f"{n} too large")
