"""Self-contained nested-HEALPix pixel math (no healpy dependency).

The reference's healpix plots (vaex-viz/vaex/viz/mpl.py:886-990
healpix_plot/healpix_heatmap) delegate display to healpy.mollview; here the
two primitives healpy provides — nested pixel -> sphere angle and back — are
implemented directly (vectorized numpy, standard Gorski et al. 2005
algorithms as in healpix_bare), so the astronomy workflow works in any
environment.  The heavy lifting (binning a billion source_ids into pixels)
is the engine's ordinal grid pass either way.

Conventions match healpy: theta = colatitude [0, pi], phi = longitude
[0, 2pi), NESTED pixel ordering, npix = 12 * nside**2.
"""

from __future__ import annotations

import numpy as np

__all__ = ["nside2npix", "pix2ang_nest", "ang2pix_nest", "healpix_grid_image"]

_JRLL = np.array([2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4])
_JPLL = np.array([1, 3, 5, 7, 0, 2, 4, 6, 1, 3, 5, 7])


def nside2npix(nside):
    return 12 * nside * nside


def _compress_bits(v):
    """Keep the even-position bits of v, compacted (inverse of interleave)."""
    v = v & 0x5555555555555555
    v = (v | (v >> 1)) & 0x3333333333333333
    v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v >> 4)) & 0x00FF00FF00FF00FF
    v = (v | (v >> 8)) & 0x0000FFFF0000FFFF
    v = (v | (v >> 16)) & 0x00000000FFFFFFFF
    return v


def _spread_bits(v):
    """Spread the low 32 bits of v to even positions (for interleaving)."""
    v = v & 0x00000000FFFFFFFF
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def pix2ang_nest(nside, pix):
    """Nested pixel index -> (theta, phi) of the pixel center."""
    nside = int(nside)
    pix = np.asarray(pix, dtype=np.int64)
    npface = nside * nside
    face = pix // npface
    within = pix - face * npface
    ix = _compress_bits(within)
    iy = _compress_bits(within >> 1)

    jr = _JRLL[face] * nside - ix - iy - 1  # ring index 1..4*nside-1
    nr = np.empty_like(jr)
    z = np.empty(jr.shape, np.float64)
    kshift = np.empty_like(jr)

    north = jr < nside
    south = jr > 3 * nside
    eq = ~(north | south)
    nr[north] = jr[north]
    z[north] = 1.0 - nr[north] ** 2 / (3.0 * npface)
    kshift[north] = 0
    nr[south] = 4 * nside - jr[south]
    z[south] = nr[south] ** 2 / (3.0 * npface) - 1.0
    kshift[south] = 0
    nr[eq] = nside
    z[eq] = (2 * nside - jr[eq]) * (2.0 / (3.0 * nside))
    kshift[eq] = (jr[eq] - nside) & 1

    jp = (_JPLL[face] * nr + ix - iy + 1 + kshift) / 2.0
    jp = np.where(jp > 4 * nr, jp - 4 * nr, jp)
    jp = np.where(jp < 1, jp + 4 * nr, jp)
    phi = (jp - (kshift + 1) * 0.5) * (np.pi / 2.0) / nr
    theta = np.arccos(np.clip(z, -1.0, 1.0))
    return theta, phi


def ang2pix_nest(nside, theta, phi):
    """(theta, phi) -> nested pixel index."""
    nside = int(nside)
    z = np.cos(np.asarray(theta, np.float64))
    phi = np.asarray(phi, np.float64)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) / (np.pi / 2.0)  # in [0, 4)

    ix = np.empty(z.shape, np.int64)
    iy = np.empty(z.shape, np.int64)
    face = np.empty(z.shape, np.int64)

    eq = za <= 2.0 / 3.0
    if eq.any():
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * (z[eq] * 0.75)
        jp = np.floor(temp1 - temp2).astype(np.int64)
        jm = np.floor(temp1 + temp2).astype(np.int64)
        order = int(np.log2(nside)) if nside > 1 else 0
        ifp = jp >> order
        ifm = jm >> order
        f = np.where(ifp == ifm, (ifp & 3) + 4,
                     np.where(ifp < ifm, ifp & 3, (ifm & 3) + 8))
        face[eq] = f
        ix[eq] = jm & (nside - 1)
        iy[eq] = nside - 1 - (jp & (nside - 1))
    po = ~eq
    if po.any():
        ntt = np.minimum(np.floor(tt[po]).astype(np.int64), 3)
        tp = tt[po] - ntt
        tmp = nside * np.sqrt(3.0 * (1.0 - za[po]))
        jp = np.minimum(np.floor(tp * tmp).astype(np.int64), nside - 1)
        jm = np.minimum(np.floor((1.0 - tp) * tmp).astype(np.int64), nside - 1)
        north = z[po] >= 0
        face[po] = np.where(north, ntt, ntt + 8)
        ix[po] = np.where(north, nside - jm - 1, jp)
        iy[po] = np.where(north, nside - jp - 1, jm)

    within = _spread_bits(ix) | (_spread_bits(iy) << 1)
    return face * (nside * nside) + within


def healpix_grid_image(grid, nside, width=800, height=400):
    """Rasterize a per-pixel HEALPix grid (length 12*nside^2, NESTED order)
    into a (height, width) Mollweide-ready lon/lat image: each raster point
    maps to its containing pixel via ang2pix (healpy.mollview equivalent)."""
    grid = np.asarray(grid)
    lon = np.linspace(-np.pi, np.pi, width)       # [-pi, pi)
    lat = np.linspace(-np.pi / 2, np.pi / 2, height)
    LON, LAT = np.meshgrid(lon, lat)
    theta = np.pi / 2 - LAT                       # colatitude
    pix = ang2pix_nest(nside, theta.ravel(), np.mod(LON.ravel(), 2 * np.pi))
    return grid[pix].reshape(height, width), LON, LAT
