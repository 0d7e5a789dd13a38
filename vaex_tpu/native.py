"""Python facade over the optional C++ extension (vaex_tpu._native).

Build with `python setup.py build_ext --inplace`; every entry point has a
pure-python fallback so the package works unbuilt (src/vaex_native.cpp
documents the native side)."""

from __future__ import annotations

import numpy as np

try:
    from . import _native
    available = True
except ImportError:  # pragma: no cover
    _native = None
    available = False

_SUPPORTED = {"int64", "uint64", "int32", "float64", "float32"}


class NativeOrderedSet:
    """Insertion-ordered unique set over numeric chunks; None when the dtype
    is unsupported or the extension is unbuilt."""

    def __init__(self, dtype):
        self.dtype = np.dtype(dtype)
        self._set = _native.OrderedSet(self.dtype.name)

    @classmethod
    def create(cls, dtype):
        dtype = np.dtype(dtype)
        if not available or dtype.name not in _SUPPORTED:
            return None
        return cls(dtype)

    def update(self, values: np.ndarray) -> int:
        values = np.ascontiguousarray(values, dtype=self.dtype)
        return self._set.update(values)

    def keys(self) -> np.ndarray:
        return np.frombuffer(self._set.keys(), dtype=self.dtype).copy()

    def map(self, values: np.ndarray) -> np.ndarray:
        """codes int32; -1 unknown, -2 NaN. Multithreaded hash probes."""
        values = np.ascontiguousarray(values, dtype=self.dtype)
        return np.frombuffer(self._set.map(values), dtype=np.int32).copy()

    def __len__(self):
        return self._set.length()


def pad_to(values: np.ndarray, L: int, fill=0):
    values = np.ascontiguousarray(values)
    if available and values.dtype.kind in "iuf" and values.dtype.isnative:
        fill_el = np.asarray(fill, dtype=values.dtype).tobytes()
        return np.frombuffer(_native.pad_to(values, L, fill_el), dtype=values.dtype)
    out = np.full(L, fill, dtype=values.dtype)
    out[: len(values)] = values
    return out


def unpack_bitmap(bits: bytes, n: int, offset: int = 0) -> np.ndarray:
    nbytes = memoryview(bits).nbytes
    if n < 0 or offset < 0 or nbytes * 8 < n + offset:
        raise ValueError(
            f"unpack_bitmap: bitmap of {nbytes} bytes cannot cover {n} bits at offset {offset}")
    if available:
        return np.frombuffer(_native.unpack_bitmap(bits, n, offset), dtype=np.uint8).astype(bool)
    unpacked = np.unpackbits(np.frombuffer(bits, dtype=np.uint8), bitorder="little")
    return unpacked[offset:offset + n].astype(bool)
