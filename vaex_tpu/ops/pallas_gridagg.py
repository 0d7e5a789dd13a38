"""Pallas TPU kernel: 2-D binned count/sum as MXU outer products.

The reference's hot loop is a C++ scalar scatter (agg.hpp:84-143).  The
XLA path in gridagg.py uses `.at[].add` scatters; this kernel is the
speed-of-light alternative for the headline 2-D heatmap workload
(`df.mean(E, binby=[x, y], shape=256)`, BASELINE.md): instead of scattering
into a [nx*ny] grid, each row tile builds two one-hot matrices

    Hx = one_hot(bx_tile)  [T, nx]      Hy = one_hot(by_tile)  [T, ny]

and accumulates

    count += Hxᵀ @ Hy                   (MXU matmul, [nx, ny])
    sum   += (Hx * E_tile[:, None])ᵀ @ Hy

— the 2-D histogram becomes dense matmuls with zero scatter, mapping the
FLOPs onto the systolic array.  Grids up to 256×256 fit the accumulators in
VMEM; rows stream through the kernel grid with the accumulator revisited
every step (constant index_map).

Enable with VAEX_TPU_STRATEGY=pallas (see execution.py) — the scatter path
remains the default until this wins on the target hardware.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bx_ref, by_ref, values_ref, count_ref, sum_ref, *, nx, ny, tile):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    bx = bx_ref[0]            # [T, 1] int32 (void rows = -1)
    by = by_ref[0]
    v = values_ref[0]         # [T, 1] f32 (void rows = 0)

    cols_x = jax.lax.broadcasted_iota(jnp.int32, (tile, nx), 1)
    cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)
    # bf16 one-hots: exact (values are 0/1) and native MXU rate; the MXU
    # accumulates in f32, so the only precision loss would be truncating the
    # *values* to bf16 — recovered with a hi/lo split (two weighted matmuls):
    # v = hi + lo exactly, each half bf16-representable.
    hx = (bx == cols_x).astype(jnp.bfloat16)         # [T, nx]
    hy = (by == cols_y).astype(jnp.bfloat16)         # [T, ny]

    count_ref[...] += jax.lax.dot_general(
        hx, hy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    v_hi = v.astype(jnp.bfloat16)
    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sum_ref[...] += jax.lax.dot_general(
        hx * v_hi, hy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    sum_ref[...] += jax.lax.dot_general(
        hx * v_lo, hy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_count_sum(bx, by, values, nx, ny, tile=512):
    """(count [nx,ny] f32, sum [nx,ny] f32) over flat int32 bin indices.

    bx/by: [N] int32 in [0, nx)/[0, ny); out-of-range rows (e.g. -1) drop out
    of both one-hots, which is exactly the void-cell semantics of the scatter
    path.  values: [N] f32.
    """
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    bx = bx.reshape(n_tiles, tile, 1)
    by = by.reshape(n_tiles, tile, 1)
    values = values.reshape(n_tiles, tile, 1).astype(jnp.float32)

    kernel = functools.partial(_kernel, nx=nx, ny=ny, tile=tile)
    # Mosaic rejects the i64 grid-index types that x64 mode leaks into the
    # BlockSpec index maps; trace the kernel in 32-bit
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
            ],
        )(bx, by, values)
    return count, total


def available():
    try:
        import jax.experimental.pallas  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False
