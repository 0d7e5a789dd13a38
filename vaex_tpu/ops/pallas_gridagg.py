"""Pallas TPU kernel: flat-cell binned count/sum as MXU matmuls (any rank).

The reference's hot loop is a C++ scalar scatter over a flattened N-d grid
(agg.hpp:84-143).  The XLA path in gridagg.py uses `.at[].add` scatters
(~70M rows/s on v5e); this kernel maps the same accumulation onto the
systolic array and is the default strategy on TPU for any grid that fits.

Design (round 3 — measured on v5e, benchmarks/kernel_lab3.py):

* One **flat cell index** ``c = q*128 + r`` (q = c>>7, r = c&127) instead of
  per-axis bin indices: works for 1-D, 2-D, N-D and ordinal (groupby) grids
  alike, and the matmul output ``[nq, 128]`` has **no lane padding** for any
  grid size (the round-2 per-axis kernel wasted 384/259 = 48% of the matmul
  N dimension on 259² grids).
* count: two int8 one-hots, ``q8[nq,T] ·_T r8[128,T] -> int32`` — measured
  136 T-MACs/s (69% of the v5e int8 peak) on one-hot operands.  Exact.
* sums (P ≤ 4 payloads): each value splits in-kernel into bf16 hi/lo halves
  (the split MUST happen inside the kernel: outside, XLA's excess-precision
  pass elides the f32->bf16->f32 convert pair and lo folds to exactly 0).
  Payload products ride the narrow 128-wide r side (``rf*vhi``), all blocks
  fuse into ONE matmul ``qf[nq,T] ·_T P[2P*128,T] -> [nq, 2P*128]`` and the
  hi/lo pairs recombine in f32 — per-chunk error ~2^-17 relative (measured
  2.8e-6 over 8.4M rows vs f64, identical to the round-2 kernel).
* rows routed out of range (e.g. -1 for filtered/padded rows) have q = -1,
  miss the q one-hot, and drop out of every product — void-cell semantics.

Measured (v5e, 8.4M rows, 259² grid, marginal over tunnel RTT):
count+sum 522M rows/s (round-2 kernel: 327M), count-only 2.02B rows/s,
XLA scatter baseline 70M.

Why not scatter on TPU: the VPU has no vector scatter; XLA serializes
`.at[].add` updates.  Why not int16 compares for the one-hot build or a
scalar dynamic-sublane store loop: both die in the remote Mosaic compiler
(HTTP 500, rounds 1-3).

Grid limits: accumulators + one-hots must fit VMEM; tile size auto-shrinks
with nq (see `_pick_tile`), larger grids fall back to the scatter path in
execution.py.  MXU work is O(C) per row, so beyond ~350k cells (payload)
the scatter path wins anyway.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# crossover vs the XLA scatter path (~70M rows/s): kernel time/row is
# ~C * 0.028 ns (count+sum; measured rates above), so it wins up to ~350k
# cells with payloads and much further for count-only
MAX_CELLS_PAYLOAD = 350_000
MAX_CELLS_COUNT = 1_100_000
MIN_CELLS = 8  # below this the fused XLA one-hot reduce needs no kernel

_VMEM_BUDGET = 96 * 1024 * 1024


def _pick_tile(nq, n_payloads, i8lo=False):
    """Largest row tile whose working set fits the VMEM budget."""
    for tile in (16384, 8192, 4096, 2048, 1024, 512):
        per_row = 4 + nq + 128                    # c i32, q8, r8
        if n_payloads:
            per_row += 2 * nq                     # qf bf16
            per_row += 2 * 128 + 4                # rf bf16 + v f32
            if i8lo:
                per_row += (1 + n_payloads) * 128       # int8 B blocks
                per_row += (1 + n_payloads) * 512       # int32 build temps
                per_row += 2 * n_payloads * 128         # bf16 hi blocks
            else:
                per_row += 2 * 2 * n_payloads * 128     # P bf16 blocks
        out_bytes = nq * 128 * 4 * (1 + n_payloads)
        total = per_row * tile + out_bytes
        if total * 3 // 2 <= _VMEM_BUDGET:        # 50% slack for Mosaic temps
            return tile
    return 256


def payload_mode():
    """'hilo' (default, ~2.8e-6 rel) or 'i8lo' (~11% faster, ~2.2e-5 rel):
    the count one-hot and an int8-quantized lo residual share one int8
    matmul, so the sum costs C·(2/136 + 1/98.5) instead of C·(1/136 +
    2/98.5) T-MACs (602M vs 540M rows/s measured at 259²,
    benchmarks/kernel_lab3.py flat_i8lo)."""
    from .. import settings
    return settings.compute.pallas_payload


def _kernel(c_ref, *rest, nq, tile, n_payloads, with_count, mode="hilo"):
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

    # input arrives lane-major [1, T]; both one-hots are built transposed
    # [n, T] and the dots contract dim 1 of both operands (native layout,
    # no relayout — see round-2 notes on the [T, 1] 34GB-layout trap)
    c = c_ref[0]                                        # [1, T] int32
    q = jax.lax.shift_right_arithmetic(c, 7)            # -1 stays -1 (void)
    r = jax.lax.bitwise_and(c, 127)

    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)                  # [nq, T]

    if mode == "i8lo" and n_payloads:
        # count one-hot + per-payload int8-quantized lo residuals share ONE
        # int8 matmul [nq,T]·[(1+P)*128,T]^T; only the bf16 hi blocks remain
        # on the slower bf16 path.  MXU cost (1+P)C int8 + PC bf16 vs
        # C int8 + 2PC bf16 — measured 602M vs 540M rows/s at 259², P=1
        # (benchmarks/kernel_lab3.py flat_i8lo).  qlo = round(lo/s), s =
        # max|lo|/127 per tile -> per-row error <= s/2 ~ 7.7e-6*max|v|_tile;
        # the scaled lo partial folds into the f32 accumulator every step
        # (s varies per tile, so the int32 lo cannot accumulate across steps).
        r_oh32 = (ir == r).astype(jnp.int32)
        r_oh8 = r_oh32.astype(jnp.int8)
        i8_blocks = [r_oh32] if with_count else []
        hi_blocks = []
        scales = []
        rf = r_oh8.astype(jnp.bfloat16)
        for p in range(n_payloads):
            v = v_refs[p][0]                            # [1, T] f32
            vhi = v.astype(jnp.bfloat16)
            lo = v - vhi.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(lo)), 1e-30) / 127.0
            # int8 elementwise products crash the remote Mosaic compiler
            # (PROGRESS round-3 negatives): build int32, cast at the boundary
            i8_blocks.append(r_oh32 * jnp.round(lo / s).astype(jnp.int32))
            hi_blocks.append(rf * vhi)
            scales.append(s)
        B8 = jnp.concatenate(i8_blocks, axis=0).astype(jnp.int8)
        out8 = jax.lax.dot_general(
            q_oh8, B8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)           # [nq, (wc+P)*128]
        off = 0
        if with_count:
            count_ref[...] += out8[:, :128]
            off = 1
        qf = q_oh8.astype(jnp.bfloat16)
        outh = jax.lax.dot_general(
            qf, jnp.concatenate(hi_blocks, axis=0), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [nq, P*128]
        for p in range(n_payloads):
            hi = outh[:, p * 128:(p + 1) * 128]
            lo = out8[:, (off + p) * 128:(off + p + 1) * 128]
            sum_refs[p][...] += hi + lo.astype(jnp.float32) * scales[p]
        return

    r_oh8 = (ir == r).astype(jnp.int8)                  # [128, T]

    if with_count:
        count_ref[...] += jax.lax.dot_general(
            q_oh8, r_oh8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    if n_payloads:
        rf = r_oh8.astype(jnp.bfloat16)
        blocks = []
        for p in range(n_payloads):
            v = v_refs[p][0]                            # [1, T] f32
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            blocks.append(rf * vhi)
            blocks.append(rf * vlo)
        P = jnp.concatenate(blocks, axis=0)             # [2P*128, T]
        qf = q_oh8.astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            qf, P, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [nq, 2P*128]
        for p in range(n_payloads):
            hi = out[:, 2 * p * 128:(2 * p + 1) * 128]
            lo = out[:, (2 * p + 1) * 128:(2 * p + 2) * 128]
            sum_refs[p][...] += hi + lo


def histflat_grid(c, values, C, with_count=True, tile=None, mode=None):
    """Fused flat-cell binned count + P sums.

    c: [N] int32 in [0, C) — the flattened full-edge-layout cell index
    (gridagg.flat_index); out-of-range rows (e.g. -1 for filtered/padded)
    drop out of the q one-hot (void-cell semantics).  values: tuple of [N]
    f32 arrays, pre-masked (excluded rows must already be 0).

    mode: 'hilo' (default) | 'i8lo' — see `payload_mode`; resolved at trace
    time from settings when None.

    Returns (count [C] int32 or None, tuple of sum [C] f32) — flat arrays;
    the caller reshapes to the grid shape.
    """
    values = tuple(values)
    if mode is None:
        mode = payload_mode() if values else "hilo"
    return _histflat_grid(c, values, C, with_count, tile, mode)


@functools.partial(jax.jit, static_argnames=("C", "with_count", "tile", "mode"))
def _histflat_grid(c, values, C, with_count, tile, mode):
    P = len(values)
    nq = -(-C // 128)
    if tile is None:
        tile = _pick_tile(nq, P, i8lo=mode == "i8lo")
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        values = tuple(jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) for v in values)
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = tuple(v.astype(jnp.float32).reshape(n_tiles, 1, tile) for v in values)

    kernel = functools.partial(
        _kernel, nq=nq, tile=tile, n_payloads=P, with_count=with_count,
        mode=mode)
    out_specs, out_shape = [], []
    if with_count:
        out_specs.append(pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nq, 128), jnp.int32))
    for _ in range(P):
        out_specs.append(pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nq, 128), jnp.float32))
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    # Mosaic rejects the i64 grid-index types that x64 mode leaks into the
    # BlockSpec index maps; trace the kernel in 32-bit
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec] * (1 + P),
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2, *v2)
    outs = [o.reshape(-1)[:C] for o in outs]
    if with_count:
        return outs[0], tuple(outs[1:])
    return None, tuple(outs)


def max_cells(n_payloads):
    return MAX_CELLS_PAYLOAD if n_payloads else MAX_CELLS_COUNT


# ---------------------------------------------------------------------------
# back-compat wrappers (round-2 API; tests_tpu/test_pallas_parity.py)
# ---------------------------------------------------------------------------

MAX_CELLS = MAX_CELLS_PAYLOAD


def hist2d_grid(bx, by, values, nx, ny, with_count=True, tile=None):
    """2-D wrapper: flatten (bx, by) and run the flat-cell kernel."""
    valid = (bx >= 0) & (bx < nx) & (by >= 0) & (by < ny)
    c = jnp.where(valid, bx.astype(jnp.int32) * np.int32(ny) + by.astype(jnp.int32),
                  np.int32(-1))
    count, sums = histflat_grid(c, values, nx * ny, with_count=with_count, tile=tile)
    if count is not None:
        count = count.reshape(nx, ny)
    return count, tuple(s.reshape(nx, ny) for s in sums)


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
