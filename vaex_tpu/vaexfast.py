"""Compat module for the reference's legacy `vaex.vaexfast` kernels.

The engine subsumes the hot kernels (histogramNd/statisticNd → the fused
grid-agg pass, grid_find_edges → cum-grid percentiles, pnpoly → the device
lasso); this module covers the remaining utilities the reference implements
in C (/root/reference/packages/vaex-core/src/vaexfast.cpp) so callers of the
old API find everything:

* histogram1d/2d — direct ndarray histograms (numpy fast path)
* grid_interpolate (vaexfast.cpp:1599) — per-cell linear index of `value`
  along the last (cumulative) axis
* resize (vaexfast.cpp:2042) — power-of-two grid downsample by block-sum
* soneira_peebles (vaexfast.cpp:1925) — fractal point generator
* shuffled_sequence (vaexfast.cpp:1988) — in-place pseudo-shuffled 0..n-1
"""

from __future__ import annotations

import numpy as np


def histogram1d(x, weights, counts, xmin, xmax):
    """In-place 1-D histogram (vaexfast.cpp:439): counts += histogram(x)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(counts)
    with np.errstate(invalid="ignore"):
        scaled = (x - xmin) / (xmax - xmin) * n
    idx = scaled.astype(np.int64)
    ok = (scaled >= 0) & (scaled < n) & ~np.isnan(scaled)
    np.add.at(counts, idx[ok], 1.0 if weights is None else np.asarray(weights)[ok])
    return counts


def histogram2d(x, y, weights, counts, xmin, xmax, ymin, ymax):
    """In-place 2-D histogram (vaexfast.cpp:545)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nx, ny = counts.shape
    with np.errstate(invalid="ignore"):
        sx = (x - xmin) / (xmax - xmin) * nx
        sy = (y - ymin) / (ymax - ymin) * ny
    ok = (sx >= 0) & (sx < nx) & (sy >= 0) & (sy < ny) & ~np.isnan(sx) & ~np.isnan(sy)
    np.add.at(counts, (sx.astype(np.int64)[ok], sy.astype(np.int64)[ok]),
              1.0 if weights is None else np.asarray(weights)[ok])
    return counts


def grid_interpolate(grid, output, value):
    """For every cell of `grid` (last axis = a monotone cumulative axis),
    write into `output` the fractional index where the axis crosses `value`
    (vaexfast.cpp:1599 interpolate_1d semantics: linear between samples,
    0 if below the first, size-1 if never reached)."""
    grid = np.asarray(grid, dtype=np.float64)
    n = grid.shape[-1]
    flat = grid.reshape(-1, n)
    out = np.empty(flat.shape[0], dtype=np.float64)
    for i, row in enumerate(flat):
        j = int(np.searchsorted(row, value, side="left"))
        if j <= 0:
            out[i] = 0.0
        elif j >= n:
            out[i] = float(n - 1)
        else:
            lo, hi = row[j - 1], row[j]
            frac = 0.0 if hi == lo else (value - lo) / (hi - lo)
            out[i] = (j - 1) + frac
    output[...] = out.reshape(grid.shape[:-1])
    return output


def resize(source, new_size):
    """Downsample an N-d grid with equal power-of-two axes to `new_size`
    (also a power of two) by summing blocks (vaexfast.cpp:2042)."""
    source = np.asarray(source)
    size = source.shape[0]
    if any(s != size for s in source.shape):
        raise ValueError("resize: all dimensions must be of equal size")
    if size % new_size:
        raise ValueError("resize: new_size must divide size")
    factor = size // new_size
    ndim = source.ndim
    shape = []
    for _ in range(ndim):
        shape.extend([new_size, factor])
    reshaped = source.reshape(shape)
    # sum every 'factor' axis (odd positions of the interleaved shape)
    axes = tuple(range(1, 2 * ndim, 2))
    return reshaped.sum(axis=axes)


def soneira_peebles(center, width, lam, eta, max_level):
    """1-d Soneira–Peebles fractal point distribution (vaexfast.cpp:1925):
    each level splits every point into `eta` uniformly-placed children in a
    window shrunk by `lam`; returns eta**max_level coordinates."""
    rng = np.random
    points = np.array([center], dtype=np.float64)
    w = width
    for _ in range(max_level):
        w = w / lam
        offsets = (rng.random((len(points), eta)) - 0.5) * w
        points = (points[:, None] + offsets).reshape(-1)
    return points


def shuffled_sequence(array):
    """Fill int64 `array` in place with a pseudo-shuffled 0..n-1 permutation
    (vaexfast.cpp:1988: Fisher–Yates-style insertion shuffle)."""
    n = len(array)
    perm = np.random.permutation(n).astype(np.int64)
    array[...] = perm
    return array
