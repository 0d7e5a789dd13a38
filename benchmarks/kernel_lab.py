"""Kernel lab: 2-D binned count+sum variants, measured on the real device.

The headline workload (BASELINE.md) is `df.mean(E, binby=[x,y], shape=256)`:
per chunk, accumulate count[nx,ny] and sum[nx,ny] from int32 bins bx/by and
f32 values.  Round-1 kernel (ops/pallas_gridagg.py) measured ~113M rows/s on
v5e — ~23% of the one-hot-matmul roofline (~500M rows/s bf16).  Variants here
probe where the loss is:

  v0  round-1 kernel (two one-hots, lhs-contracted dot_general, 3 matmuls)
  v1  v0 with bigger tiles
  v2  single fused matmul: A[3nx,T] built directly in transposed layout
      (count block + sum_hi + sum_lo), B[T,ny]; one native (1,0) contraction
  v3  v2 + int8 count matmul split from bf16 sum matmul
  v4  pure-XLA lax.scan over tiles of the v2 formulation (no pallas)
  v5  XLA scatter-add baseline
  v8  payload on the B side: A=onehot(bx) built once, B=[hy|hy*vhi|hy*vlo]
  v9  v8 with 3-level int8 quantization: one s8xs8 matmul [nx,T]@[T,4ny]

Round-2 measurements (8.4M rows, 256², marginal over tunnel RTT):
v3 378M rows/s (production), v8 259-262M, v9 205-225M, scatter 70M.
NEGATIVE RESULT: every variant converges to ~100-120 T(fl)ops/s effective
on these one-hot shapes — int8's nominal 2x MXU rate does NOT materialize,
and tile size / in-kernel sub-tiling change nothing (Mosaic already
pipelines).  The binding constraint is raw op count, so v3 (fewest
effective blocks: int8 count=0.5 + bf16 hi/lo=2) is the optimum of this
design family; ~380M rows/s is the practical one-hot ceiling at 256².

Usage: python benchmarks/kernel_lab.py [N_rows] [variant-substr,...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- v2 kernel
def _kernel_v2(bx_ref, by_ref, v_ref, out_ref, *, nx, ny, tile):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bx = bx_ref[0]       # [1, T] int32 (void rows = -1)
    by = by_ref[0]       # [1, T, 1] -> [T, 1]
    v = v_ref[0]         # [1, T] f32
    # hi/lo split computed IN-kernel: outside, XLA's excess-precision pass
    # elides the f32->bf16->f32 convert pair and vlo folds to exactly 0
    vhi = v.astype(jnp.bfloat16)
    vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)

    # A [3nx, T]: rows 0:nx = one-hot (count), nx:2nx = one-hot * v_hi,
    # 2nx:3nx = one-hot * v_lo — all built in the transposed layout the MXU
    # wants for a native (1,0)-contraction, no relayout.
    iota = jax.lax.broadcasted_iota(jnp.int32, (3 * nx, tile), 0)
    cell = iota % nx
    blk = iota // nx
    eq = (cell == bx).astype(jnp.bfloat16)            # bx broadcasts [1,T]
    # NB: a nested bf16 jnp.where here fails to compile in Mosaic; the
    # arithmetic select is equivalent (masks are disjoint 0/1)
    m0 = (blk == 0).astype(jnp.bfloat16)
    m1 = (blk == 1).astype(jnp.bfloat16)
    m2 = (blk == 2).astype(jnp.bfloat16)
    A = eq * (m0 + m1 * vhi + m2 * vlo)

    cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)
    B = (by == cols_y).astype(jnp.bfloat16)           # [T, ny]

    out_ref[...] += jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_v2(bx, by, values, nx, ny, tile=2048):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v2d = values.astype(jnp.float32).reshape(n_tiles, 1, tile)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, tile, 1)

    kernel = functools.partial(_kernel_v2, nx=nx, ny=ny, tile=tile)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3 * nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((3 * nx, ny), jnp.float32),
        )(bx2, by2, v2d)
    count = out[:nx]
    total = out[nx:2 * nx] + out[2 * nx:]
    return count, total


# ---------------------------------------------------------------- v3 kernel
def _kernel_v3(bx_ref, by_ref, v_ref, count_ref, sum_ref, *, nx, ny, tile):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    bx = bx_ref[0]
    by = by_ref[0]
    v = v_ref[0]
    vhi = v.astype(jnp.bfloat16)
    vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)

    cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)

    # count: int8 one-hots -> s32 accumulate (2x MXU rate vs bf16)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, tile), 0)
    hxT8 = (iota_x == bx).astype(jnp.int8)
    hy8 = (by == cols_y).astype(jnp.int8)
    count_ref[...] += jax.lax.dot_general(
        hxT8, hy8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    # sum: bf16 hi/lo fused [2nx, T] @ [T, ny]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (2 * nx, tile), 0)
    cell = iota2 % nx
    blk = iota2 // nx
    eq = (cell == bx).astype(jnp.bfloat16)
    m0 = (blk == 0).astype(jnp.bfloat16)
    A = eq * (m0 * vhi + (1 - m0) * vlo)
    hy16 = hy8.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        A, hy16, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    sum_ref[...] += out[:nx] + out[nx:]


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_v3(bx, by, values, nx, ny, tile=2048):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v2d = values.astype(jnp.float32).reshape(n_tiles, 1, tile)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, tile, 1)

    kernel = functools.partial(_kernel_v3, nx=nx, ny=ny, tile=tile)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.int32),
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
            ],
        )(bx2, by2, v2d)
    return count.astype(jnp.float32), total


# ---------------------------------------------------------------- v6 kernel
def _kernel_v6(bx_ref, by_ref, v_ref, count_ref, sum_ref, *, nx, ny, tile):
    """All-int8: count + 3-level int8 quantization of v in ONE s8xs8->s32
    matmul [4nx, T] @ [T, ny] at the int8 MXU rate (2x bf16).

    v = s1*q1 + s2*q2 + s3*q3 + eps, si+1 = si/254, |eps| <= max|v|/(127*254^2)
    ~ 6e-8 relative — better than the bf16 hi/lo split.  Scales are per-tile
    scalars applied on the [nx, ny] partials before f32 accumulation."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    bx = bx_ref[0]       # [1, T]
    by = by_ref[0]       # [T, 1]
    v = v_ref[0]         # [1, T] f32

    s1 = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-30)
    q1 = jnp.round(v / s1)
    r1 = v - s1 * q1
    s2 = s1 / 254.0
    q2 = jnp.round(r1 / s2)
    r2 = r1 - s2 * q2
    s3 = s2 / 254.0
    q3 = jnp.round(r2 / s3)

    iota = jax.lax.broadcasted_iota(jnp.int32, (4 * nx, tile), 0)
    cell = iota % nx
    blk = iota // nx
    eq = cell == bx
    m0 = (blk == 0).astype(jnp.float32)
    m1 = (blk == 1).astype(jnp.float32)
    m2 = (blk == 2).astype(jnp.float32)
    m3 = (blk == 3).astype(jnp.float32)
    A = jnp.where(eq, m0 + m1 * q1 + m2 * q2 + m3 * q3, 0.0).astype(jnp.int8)

    cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)
    B = (by == cols_y).astype(jnp.int8)

    out = jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    count_ref[...] += out[:nx]
    sum_ref[...] += (s1 * out[nx:2 * nx].astype(jnp.float32)
                     + s2 * out[2 * nx:3 * nx].astype(jnp.float32)
                     + s3 * out[3 * nx:].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_v6(bx, by, values, nx, ny, tile=2048):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v2d = values.astype(jnp.float32).reshape(n_tiles, 1, tile)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, tile, 1)

    kernel = functools.partial(_kernel_v6, nx=nx, ny=ny, tile=tile)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.int32),
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
            ],
        )(bx2, by2, v2d)
    return count.astype(jnp.float32), total


# ---------------------------------------------------------------- v8 kernel
def _kernel_v8(bx_ref, by_ref, v_ref, count_ref, sum_ref, *, nx, ny, tile, subtiles):
    """Payload on the B side: A = one-hot(bx) [nx,T] built ONCE (no payload
    multiplies on the big [k*nx, T] matrix), B = [hy | hy*vhi | hy*vlo]
    [T, 3ny].  VPU work drops ~4x vs v3 (nx*T + 3ny*T vs ~8nx*T) for +20%
    MXU (3 bf16 blocks vs int8 count + 2 bf16).  Count block accumulates in
    f32 — exact while per-cell rows per call < 2^24 (chunks are <= 8M rows).

    subtiles > 1 splits the row tile inside the kernel so Mosaic can overlap
    the VPU one-hot build of sub-tile j+1 with the MXU matmul of sub-tile j.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    t = tile // subtiles
    acc = None
    for j in range(subtiles):
        bx = bx_ref[0, 0, j * t:(j + 1) * t].reshape(1, t)       # [1, t]
        by = by_ref[0, j * t:(j + 1) * t]                        # [t, 1]
        v = v_ref[0, j * t:(j + 1) * t]                          # [t, 1] f32
        vhi = v.astype(jnp.bfloat16)
        vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)

        iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, t), 0)
        A = (iota_x == bx).astype(jnp.bfloat16)                  # [nx, t]
        cols_y = jax.lax.broadcasted_iota(jnp.int32, (t, ny), 1)
        hy = (by == cols_y).astype(jnp.bfloat16)                 # [t, ny]
        B = jnp.concatenate([hy, hy * vhi, hy * vlo], axis=1)    # [t, 3ny]
        out = jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = out if acc is None else acc + out
    count_ref[...] += acc[:, :ny]
    sum_ref[...] += acc[:, ny:2 * ny] + acc[:, 2 * ny:]


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile", "subtiles"))
def hist2d_v8(bx, by, values, nx, ny, tile=8192, subtiles=1):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v2d = values.astype(jnp.float32).reshape(n_tiles, tile, 1)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, tile, 1)

    kernel = functools.partial(_kernel_v8, nx=nx, ny=ny, tile=tile, subtiles=subtiles)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(bx2, by2, v2d)
    return count, total


# ---------------------------------------------------------------- v9 kernel
def _kernel_v9(bx_ref, by_ref, v_ref, count_ref, sum_ref, *, nx, ny, tile):
    """All-int8 with B-side quantized payload: ONE s8xs8->s32 matmul
    [nx,T] @ [T,4ny] at the int8 MXU rate (2x bf16).

    Combines v8's B-side layout (one-hot A built once, payload multiplies on
    the smaller [T, ny] side) with v6's 3-level int8 decomposition
    v = s1*q1 + s2*q2 + s3*q3 (+eps, |eps| <= max|v|/(127*254^2) ~ 6e-8
    relative — tighter than bf16 hi/lo).  Scales are per-tile scalars applied
    to the int32 partials before f32 accumulation; per-cell int32 partials
    can't overflow (127 * T < 2^31)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    bx = bx_ref[0]       # [1, T]
    by = by_ref[0]       # [T, 1]
    v = v_ref[0]         # [T, 1] f32

    s1 = jnp.maximum(jnp.max(jnp.abs(v)) / 127.0, 1e-30)
    q1 = jnp.round(v / s1)
    r1 = v - s1 * q1
    s2 = s1 / 254.0
    q2 = jnp.round(r1 / s2)
    r2 = r1 - s2 * q2
    s3 = s2 / 254.0
    q3 = jnp.round(r2 / s3)

    iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, tile), 0)
    A = (iota_x == bx).astype(jnp.int8)                 # [nx, T]
    cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)
    hy = (by == cols_y)                                 # [T, ny] bool
    hyf = hy.astype(jnp.float32)
    B = jnp.concatenate([
        hy.astype(jnp.int8),
        (hyf * q1).astype(jnp.int8),
        (hyf * q2).astype(jnp.int8),
        (hyf * q3).astype(jnp.int8),
    ], axis=1)                                          # [T, 4ny]
    out = jax.lax.dot_general(
        A, B, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    count_ref[...] += out[:, :ny]
    sum_ref[...] += (s1 * out[:, ny:2 * ny].astype(jnp.float32)
                     + s2 * out[:, 2 * ny:3 * ny].astype(jnp.float32)
                     + s3 * out[:, 3 * ny:].astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_v9(bx, by, values, nx, ny, tile=8192):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v2d = values.astype(jnp.float32).reshape(n_tiles, tile, 1)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, tile, 1)

    kernel = functools.partial(_kernel_v9, nx=nx, ny=ny, tile=tile)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nx, ny), jnp.int32),
                jax.ShapeDtypeStruct((nx, ny), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(bx2, by2, v2d)
    return count, total


# ---------------------------------------------------------------- v4 XLA scan
@functools.partial(jax.jit, static_argnames=("nx", "ny", "tile"))
def hist2d_v4(bx, by, values, nx, ny, tile=8192):
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = jnp.concatenate([values, jnp.zeros(pad, values.dtype)])
    v = values.astype(jnp.float32)
    # bit-level split (XLA would elide a convert-pair round trip): hi = top 16
    # bits of the f32 pattern (exactly bf16-representable), lo = exact residual
    vhi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(v, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    vhi = vhi_f32.astype(jnp.bfloat16)
    vlo = (v - vhi_f32).astype(jnp.bfloat16)

    def body(acc, xs):
        bx_t, by_t, vhi_t, vlo_t = xs
        cols_x = jax.lax.broadcasted_iota(jnp.int32, (tile, nx), 1)
        cols_y = jax.lax.broadcasted_iota(jnp.int32, (tile, ny), 1)
        hx = (bx_t[:, None] == cols_x).astype(jnp.bfloat16)
        hy = (by_t[:, None] == cols_y).astype(jnp.bfloat16)
        A = jnp.concatenate([hx, hx * vhi_t[:, None], hx * vlo_t[:, None]], axis=1)
        out = jax.lax.dot_general(
            A, hy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc + out, None

    acc = jnp.zeros((3 * nx, ny), jnp.float32)
    acc, _ = jax.lax.scan(
        body, acc,
        (bx.reshape(n_tiles, tile), by.reshape(n_tiles, tile),
         vhi.reshape(n_tiles, tile), vlo.reshape(n_tiles, tile)))
    return acc[:nx], acc[nx:2 * nx] + acc[2 * nx:]


# ---------------------------------------------------------------- v5 scatter
@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def hist2d_scatter(bx, by, values, nx, ny):
    ncells = nx * ny
    flat = jnp.where((bx >= 0) & (by >= 0), bx * ny + by, ncells)
    count = jnp.zeros(ncells + 1, jnp.int32).at[flat].add(1)
    total = jnp.zeros(ncells + 1, jnp.float32).at[flat].add(
        jnp.where(flat < ncells, values, 0.0).astype(jnp.float32))
    return count[:ncells].reshape(nx, ny), total[:ncells].reshape(nx, ny)


def _fetch(out):
    """Force real remote execution: on the tunneled device, block_until_ready
    returns before the work runs — only a D2H fetch (~30ms RTT) synchronizes."""
    return jax.tree.map(np.asarray, out)


def measure(name, fn, inputs_list, repeats=3):
    """Marginal-cost timing robust to the tunnel's ~30ms fixed fetch RTT:
    time 1 call and K calls (distinct inputs, one fetch each), report the
    slope (t_K - t_1)/(K-1) as the true per-call kernel time."""
    K = len(inputs_list)

    def run(k):
        outs = fn(*inputs_list[0])
        for i in range(1, k):
            o = fn(*inputs_list[i])
            outs = jax.tree.map(jnp.add, outs, o)
        return _fetch(outs)

    out1 = run(1)  # warm compile
    t1s, tks = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K); tks.append(time.perf_counter() - t0)
    t1, tk = min(t1s), min(tks)
    marginal = max(1e-9, (tk - t1) / (K - 1))
    return name, marginal, t1, out1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    K = 5
    nx = ny = 256
    rng = np.random.RandomState(0)
    # K distinct input sets (cache-busting), uploaded once up front
    inputs_h, inputs_d = [], []
    for k in range(K):
        bx_h = rng.randint(0, nx, n).astype(np.int32)
        by_h = rng.randint(0, ny, n).astype(np.int32)
        v_h = rng.normal(0, 1, n).astype(np.float32)
        inputs_h.append((bx_h, by_h, v_h))
        inputs_d.append(tuple(jax.device_put(a) for a in (bx_h, by_h, v_h)))
    _fetch(jnp.sum(inputs_d[-1][2]))  # ensure uploads landed

    bx_h, by_h, v_h = inputs_h[0]
    ref_c = np.zeros((nx, ny), np.int64)
    np.add.at(ref_c, (bx_h, by_h), 1)
    ref_s = np.zeros((nx, ny), np.float64)
    np.add.at(ref_s, (bx_h, by_h), v_h.astype(np.float64))

    from vaex_tpu.ops.pallas_gridagg import hist2d_count_sum

    variants = [
        ("v0 round1 t2048", lambda bx, by, v: hist2d_count_sum(bx, by, v, nx, ny, tile=2048)),
        ("v1 round1 t4096", lambda bx, by, v: hist2d_count_sum(bx, by, v, nx, ny, tile=4096)),
        ("v2 fusedT t1024", lambda bx, by, v: hist2d_v2(bx, by, v, nx, ny, tile=1024)),
        ("v2 fusedT t2048", lambda bx, by, v: hist2d_v2(bx, by, v, nx, ny, tile=2048)),
        ("v2 fusedT t4096", lambda bx, by, v: hist2d_v2(bx, by, v, nx, ny, tile=4096)),
        ("v3 int8ct t2048", lambda bx, by, v: hist2d_v3(bx, by, v, nx, ny, tile=2048)),
        ("v3 int8ct t4096", lambda bx, by, v: hist2d_v3(bx, by, v, nx, ny, tile=4096)),
        ("v6 int8all t2048", lambda bx, by, v: hist2d_v6(bx, by, v, nx, ny, tile=2048)),
        ("v6 int8all t4096", lambda bx, by, v: hist2d_v6(bx, by, v, nx, ny, tile=4096)),
        ("v3 int8ct t8192", lambda bx, by, v: hist2d_v3(bx, by, v, nx, ny, tile=8192)),
        ("v8 Bside t4096", lambda bx, by, v: hist2d_v8(bx, by, v, nx, ny, tile=4096)),
        ("v8 Bside t8192", lambda bx, by, v: hist2d_v8(bx, by, v, nx, ny, tile=8192)),
        ("v8 Bside t16384", lambda bx, by, v: hist2d_v8(bx, by, v, nx, ny, tile=16384)),
        ("v8 Bside t8192 s2", lambda bx, by, v: hist2d_v8(bx, by, v, nx, ny, tile=8192, subtiles=2)),
        ("v8 Bside t16384 s4", lambda bx, by, v: hist2d_v8(bx, by, v, nx, ny, tile=16384, subtiles=4)),
        ("v9 int8B t4096", lambda bx, by, v: hist2d_v9(bx, by, v, nx, ny, tile=4096)),
        ("v9 int8B t8192", lambda bx, by, v: hist2d_v9(bx, by, v, nx, ny, tile=8192)),
        ("v9 int8B t16384", lambda bx, by, v: hist2d_v9(bx, by, v, nx, ny, tile=16384)),
        ("v4 xla-scan t8192", lambda bx, by, v: hist2d_v4(bx, by, v, nx, ny, tile=8192)),
        ("v5 xla-scatter", lambda bx, by, v: hist2d_scatter(bx, by, v, nx, ny)),
    ]
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only:
        variants = [v for v in variants if any(tok in v[0] for tok in only.split(","))]
    for name, thunk in variants:
        try:
            name, dt, t1, out = measure(name, thunk, inputs_d)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        c, s = out
        c_np = np.asarray(c, np.float64)
        s_np = np.asarray(s, np.float64)
        cerr = np.abs(c_np - ref_c).max()
        serr = np.abs(s_np - ref_s).max() / max(1.0, np.abs(ref_s).max())
        print(f"{name:>20}: {n/dt/1e6:8.1f} M rows/s marginal ({dt*1e3:7.2f} ms/call, "
              f"1-call+RTT {t1*1e3:6.1f} ms)  count_err={cerr:.1f} sum_relerr={serr:.2e}")


if __name__ == "__main__":
    main()
