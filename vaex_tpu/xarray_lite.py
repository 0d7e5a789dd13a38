"""Minimal labeled-array container, used when xarray is unavailable.

The reference returns ``xarray.DataArray`` from ``binby`` (vaex/groupby.py:836);
this environment has no xarray, so this small stand-in carries (values, dims,
coords) with the same attribute surface used by tests and plotting.  If
xarray is installed it is used instead (see ``wrap``).
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover
    import xarray
except ImportError:
    xarray = None


class DataArrayLite:
    def __init__(self, data, dims=None, coords=None, name=None, attrs=None):
        self.values = np.asarray(data)
        self.dims = tuple(dims or [f"dim_{i}" for i in range(self.values.ndim)])
        self.coords = dict(coords or {})
        self.name = name
        self.attrs = dict(attrs or {})

    @property
    def data(self):
        return self.values

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    def __array__(self, dtype=None):
        return np.asarray(self.values, dtype=dtype) if dtype else self.values

    def __getitem__(self, item):
        return self.values[item]

    def sel(self, **kwargs):
        out = self
        for dim, value in kwargs.items():
            axis = out.dims.index(dim)
            coord = np.asarray(out.coords[dim])
            idx = int(np.where(coord == value)[0][0])
            values = np.take(out.values, idx, axis=axis)
            new_dims = tuple(d for d in out.dims if d != dim)
            new_coords = {k: v for k, v in out.coords.items() if k != dim}
            out = DataArrayLite(values, dims=new_dims, coords=new_coords, name=out.name)
        return out

    def __repr__(self):
        return f"<DataArrayLite {self.dims} shape={self.values.shape}>\n{self.values!r}"


def wrap(data, dims=None, coords=None, name=None):
    if xarray is not None:
        return xarray.DataArray(data, dims=dims, coords=coords, name=name)
    return DataArrayLite(data, dims=dims, coords=coords, name=name)
