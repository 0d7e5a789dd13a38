"""Pallas TPU kernel: 2-D binned count/sum as MXU matmuls.

The reference's hot loop is a C++ scalar scatter (agg.hpp:84-143).  The XLA
path in gridagg.py uses `.at[].add` scatters (~70M rows/s on v5e); this
kernel maps the same accumulation onto the systolic array and is the default
2-D strategy on TPU.

Design (round 2 — measured on v5e, benchmarks/kernel_lab.py):

* count: two int8 one-hots, ``hxT[nx,T] @ hy[T,ny] -> int32`` at the int8
  MXU rate.  Exact.
* sums (P value columns): each value is split in-kernel into ``v = hi + lo``
  bf16 halves (the split MUST happen inside the kernel: outside, XLA's
  excess-precision pass elides the f32->bf16->f32 convert pair and lo folds
  to exactly 0).  All payloads fuse into ONE matmul ``A[2P*nx,T] @ hy[T,ny]``
  with A built directly in the transposed layout the MXU consumes — no
  relayout, and the hi/lo accumulation in f32 keeps per-chunk error ~2^-17
  relative (measured 3e-6 over 8M rows vs f64).
* one-hot A/B matrices are built on the VPU with compares against iota
  (constant, hoisted); rows routed out of range (e.g. -1 for
  filtered/padded rows) drop out of every one-hot — void-cell semantics.

Measured (v5e, 8.4M rows, 259x259 grid, marginal over tunnel RTT):
count-only 747M rows/s, count+1 sum 378M, scatter baseline 70M.

Why not scatter on TPU: the VPU has no vector scatter; XLA serializes
`.at[].add` updates.  Why not all-int8 quantization: the extra VPU
quantization arithmetic outweighs the MXU saving (273M rows/s measured).

Grid limits: accumulators + one-hots must fit VMEM; tile size auto-shrinks
with grid area (see `_pick_tile`), grids beyond ``MAX_CELLS`` fall back to
the scatter path in execution.py.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this many cells the one-hot FLOPs (nx*ny MACs/row/payload) lose to
# the scatter path; 2-D grids of interest (<=512^2 incl. edge slots) fit
MAX_CELLS = 520 * 520

_VMEM_BUDGET = 48 * 1024 * 1024


def _pick_tile(nx, ny, n_payloads, with_count):
    """Largest power-of-two row tile whose working set fits the VMEM budget."""
    for tile in (16384, 8192, 4096, 2048, 1024, 512):
        a_bytes = 2 * (2 * n_payloads) * nx * tile      # A bf16 [2P*nx, T]
        eq_bytes = 2 * nx * tile                        # eq bf16 [nx, T]
        hy_bytes = 3 * tile * ny                        # hy int8 + bf16
        count_bytes = (nx * tile) if with_count else 0  # hxT int8
        out_bytes = 4 * (n_payloads + (1 if with_count else 0)) * nx * ny
        total = a_bytes + eq_bytes + hy_bytes + count_bytes + out_bytes
        if total * 3 // 2 <= _VMEM_BUDGET:              # 50% slack for Mosaic temps
            return tile
    return 256


def _kernel(bx_ref, by_ref, *rest, nx, ny, tile, n_payloads, with_count):
    v_refs = rest[:n_payloads]
    out_refs = rest[n_payloads:]
    if with_count:
        count_ref, *sum_refs = out_refs
    else:
        count_ref, sum_refs = None, list(out_refs)

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for r in out_refs:
            r[...] = jnp.zeros_like(r)

    # ALL inputs arrive lane-major [1, T]: a [T, 1] input block would force a
    # 128x lane-padded HBM layout for the reshaped [n_tiles, T, 1] array
    # (s32[8192,8192,1]{T(8,128)} = 34 GB at 67M rows — measured OOM); both
    # one-hots are built transposed [n, T] and the dot contracts rhs dim 1
    bx = bx_ref[0]            # [1, T] int32 (void rows < 0 or >= nx)
    by = by_ref[0]            # [1, T] int32

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (ny, tile), 0)
    hyT8 = (iota_y == by).astype(jnp.int8)              # [ny, T]

    if with_count:
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, tile), 0)
        hxT8 = (iota_x == bx).astype(jnp.int8)          # [nx, T]
        count_ref[...] += jax.lax.dot_general(
            hxT8, hyT8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    if n_payloads:
        iota_x = jax.lax.broadcasted_iota(jnp.int32, (nx, tile), 0)
        eq = (iota_x == bx).astype(jnp.bfloat16)        # [nx, T]
        blocks = []
        for p in range(n_payloads):
            v = v_refs[p][0]                            # [1, T] f32
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            blocks.append(eq * vhi)
            blocks.append(eq * vlo)
        A = jnp.concatenate(blocks, axis=0)             # [2P*nx, T]
        hyT16 = hyT8.astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            A, hyT16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [2P*nx, ny]
        for p in range(n_payloads):
            sum_refs[p][...] += out[2 * p * nx:(2 * p + 1) * nx] + \
                out[(2 * p + 1) * nx:(2 * p + 2) * nx]


@functools.partial(jax.jit, static_argnames=("nx", "ny", "with_count", "tile"))
def hist2d_grid(bx, by, values, nx, ny, with_count=True, tile=None):
    """Fused 2-D binned count + P sums over full-edge-layout bin indices.

    bx/by: [N] int32 in [0, nx)/[0, ny) — indices INCLUDING the reference
    edge slots; out-of-range rows (e.g. -1 for filtered/padded) drop out of
    both one-hots (void-cell semantics).  values: tuple of [N] f32 arrays,
    pre-masked (excluded rows must already be 0 — they contribute nothing).

    Returns (count [nx,ny] int32 or None, tuple of sum [nx,ny] f32).
    """
    values = tuple(values)
    P = len(values)
    if tile is None:
        tile = _pick_tile(nx, ny, P, with_count)
    n = bx.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        bx = jnp.concatenate([bx, jnp.full(pad, -1, jnp.int32)])
        by = jnp.concatenate([by, jnp.full(pad, -1, jnp.int32)])
        values = tuple(jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) for v in values)
    bx2 = bx.reshape(n_tiles, 1, tile)
    by2 = by.reshape(n_tiles, 1, tile)
    v2d = tuple(v.astype(jnp.float32).reshape(n_tiles, 1, tile) for v in values)

    kernel = functools.partial(
        _kernel, nx=nx, ny=ny, tile=tile, n_payloads=P, with_count=with_count)
    out_specs = []
    out_shape = []
    if with_count:
        out_specs.append(pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nx, ny), jnp.int32))
    for _ in range(P):
        out_specs.append(pl.BlockSpec((nx, ny), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nx, ny), jnp.float32))

    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    # Mosaic rejects the i64 grid-index types that x64 mode leaks into the
    # BlockSpec index maps; trace the kernel in 32-bit
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec, row_spec] + [row_spec] * P,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(bx2, by2, *v2d)
    if with_count:
        return outs[0], tuple(outs[1:])
    return None, tuple(outs)


def hist2d_count_sum(bx, by, values, nx, ny, tile=None):
    """Back-compat wrapper (round-1 API): paired count+sum, f32 count."""
    count, sums = hist2d_grid(bx, by, (values,), nx, ny, with_count=True, tile=tile)
    return count.astype(jnp.float32), sums[0]


def available():
    try:
        import jax.experimental.pallas  # noqa: F401
        return True
    except ImportError:  # pragma: no cover
        return False
