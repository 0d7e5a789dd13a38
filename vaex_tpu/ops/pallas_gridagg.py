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
* count-only: two int8 one-hots, ``q8[nq,T] ·_T r8[W,T] -> int32`` with a
  512-wide r side — the wide-N int8 matmul runs at ~194 T-MACs/s (98% of
  the v5e int8 peak; N=128 only reaches 136).  Exact.
* sums (P ≤ 4 payloads), digit modes 'i24' (default) / 'i16' / 'i8sr':
  count + 3/2/1 balanced base-256 int8 digits per value share ONE int8
  matmul ``q8[nq,T] ·_T B8[(1+dP)*128,T] -> int32``.  Round 4: all digit
  modes center values at the tile midrange (mid·count added back from the
  exact count block — a free control variate), snap to BIT-EXACT sums for
  small-range integer payloads, and 'i8sr' stochastically rounds its single
  digit so the error is zero-mean (SD(sum_cell) = s·sqrt(n_cell/6),
  s = halfrange_tile/125) — 2C MACs/row puts its ceiling at 1.45B rows/s
  (measured 1.18-1.28B marginal at 259²).  Modes 'hilo' (bf16 hi/lo pair,
  error relative to each value — better for magnitudes spanning decades
  within a tile) and 'i8lo' remain selectable
  (settings.compute.pallas_payload).
* rows routed out of range (e.g. -1 for filtered/padded rows) have q = -1,
  miss the q one-hot, and drop out of every product — void-cell semantics.

Measured (v5e, 8.4M rows, 259² grid, marginal over tunnel RTT):
count+sum 946M rows/s i24 / 540M hilo (round-2 kernel: 327M), count-only
2.23B rows/s at W=512, XLA scatter baseline 70M.

Why not scatter on TPU: the VPU has no vector scatter; XLA serializes
`.at[].add` updates.  Why not int16 compares for the one-hot build or a
scalar dynamic-sublane store loop: both die in the remote Mosaic compiler
(HTTP 500, rounds 1-3).

Grid limits: accumulators + one-hots must fit VMEM; tile size auto-shrinks
with nq (see `_pick_tile`), larger grids fall back to the scatter path in
execution.py.  MXU work is O(C) per row, so beyond ~700k cells (payload)
the scatter path wins anyway.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# crossover vs the XLA scatter path (~70M rows/s): i24 measured 125M rows/s
# at 350k cells and ~66M (scatter parity) at 700k, so payload kernels win up
# to ~700k cells; count-only much further (capped where VMEM tiling degrades)
MAX_CELLS_PAYLOAD = 700_000
MAX_CELLS_COUNT = 1_100_000
MIN_CELLS = 8  # below this the fused XLA one-hot reduce needs no kernel

_VMEM_BUDGET = 96 * 1024 * 1024

# payload-digit modes: count + N balanced base-256 int8 digits per value
_DIGIT_MODES = {"i24": 3, "i16": 2, "i8sr": 1}

# exact integer payloads: balanced base-256 digit count per input dtype.
# Digits accumulate in int32 across row tiles (|digit| <= 128, so one kernel
# launch stays exact up to 2^31/128 = 16.7M rows — the slab loop in
# `_histflat_exact` splits longer inputs and recombines in int64).  The digit
# count covers the dtype's FULL range: 2 balanced digits top out at 32639 <
# int16's 32767, hence 3; 4 top out at 2147450751 < 2^31-1, hence 5.
# (offset, ndigits): executor passes values as int32 `v - offset` (uint32
# rides the bias trick v ^ 2^31 reinterpreted, see exact_int_spec).
_EXACT_SPECS = {
    np.dtype(np.bool_): (0, 1),
    np.dtype(np.int8): (0, 1), np.dtype(np.uint8): (128, 1),
    np.dtype(np.int16): (0, 3), np.dtype(np.uint16): (32768, 3),
    np.dtype(np.int32): (0, 5), np.dtype(np.uint32): (1 << 31, 5),
}

# one kernel launch keeps int32 digit accumulators exact up to this many rows
SLAB_ROWS_EXACT = 16_000_000


def exact_int_spec(dtype):
    """(offset, ndigits) for an exact integer payload, or None.

    The payload array handed to `histflat_grid` must be int32 ``v - offset``
    with excluded rows set to ``-offset`` (i.e. zero v first, then shift):
    an excluded-but-counted row then contributes digit(-offset) + offset*count
    = 0, so per-payload validity masks need no separate count."""
    return _EXACT_SPECS.get(np.dtype(dtype))


def _uniform01(shape):
    """U[0,1) f32 from the per-core PRNG (seeded by caller).

    prng_random_bits can come back as int32: bitcast to uint32 BEFORE the
    shift (an arithmetic shift of negatives would yield u in [-0.5, 0.5),
    biasing the stochastic rounding by -1/2 quantum); Mosaic has no
    uint32->f32 cast, but after >>8 the sign bit is clear so the int32
    reinterpretation is value-preserving."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24))


def _pick_tile(nq, n_payloads, mode="hilo", W=128, exact_digits=()):
    """Largest row tile whose working set fits the VMEM budget.

    exact_digits: per-exact-payload digit counts (these payloads ride the
    int8 matmul with int32 accumulators; n_payloads counts ONLY the
    float/approx payloads here)."""
    n_exact = len(exact_digits)
    d_exact = sum(exact_digits)
    for tile in (16384, 8192, 4096, 2048, 1024, 512):
        per_row = 4 + nq + W                      # c i32, q8, r8
        if n_payloads or n_exact:
            per_row += 2 * nq                     # qf bf16
            per_row += 2 * 128 + 4                # rf bf16 + v f32
            per_row += d_exact * 128              # exact int8 digit blocks
            per_row += d_exact * 512              # int32 build temps
            per_row += 4 * n_exact                # int32 inputs
            if mode == "i24":
                per_row += (1 + 3 * n_payloads) * 128   # int8 B blocks
                per_row += (1 + 3 * n_payloads) * 512   # int32 build temps
            elif mode == "i16":
                per_row += (1 + 2 * n_payloads) * 128   # int8 B blocks
                per_row += (1 + 2 * n_payloads) * 512   # int32 build temps
            elif mode == "i8sr":
                per_row += (1 + n_payloads) * 128       # int8 B blocks
                per_row += (1 + n_payloads) * 512       # int32 build temps
                per_row += 8 * n_payloads               # u + x f32
            elif mode == "i8lo":
                per_row += (1 + n_payloads) * 128       # int8 B blocks
                per_row += (1 + n_payloads) * 512       # int32 build temps
                per_row += 2 * n_payloads * 128         # bf16 hi blocks
            else:
                per_row += 2 * 2 * n_payloads * 128     # P bf16 blocks
        out_bytes = nq * W * 4 * (1 + n_payloads + d_exact)
        total = per_row * tile + out_bytes
        if total * 3 // 2 <= _VMEM_BUDGET:        # 50% slack for Mosaic temps
            return tile
    return 256


def payload_mode():
    """Sum-payload encoding (measured at 259², benchmarks/kernel_lab{3,4}.py).

    All digit modes ('i24'/'i16'/'i8sr') center values at the tile midrange
    (mid*count added back from the exact count block) and snap to EXACT
    integer sums when the tile's values are integral with centered range
    <= digit capacity (252/65024/16M).  Per-row error bounds below are in
    units of halfrange_tile = (max-min)/2 per row tile; a larger row tile
    widens the window one outlier degrades (t16384 by default — quoted
    errors were measured there unless noted).

    - 'i24' (default): count + three balanced base-256 int8 digits per value
      in ONE wide int8 matmul — 946M rows/s marginal r3 / 641M on the
      slower r4 chip, ~5e-7 relative error (per-row bound halfrange/2^23).
    - 'i16': count + TWO digits — 25% fewer MACs/row than i24
      ((1+2P)·C vs (1+3P)·C), 764-854M rows/s, per-row bound
      halfrange/2^15 ≈ 3e-5 measured.
    - 'i8sr': count + ONE stochastically-rounded digit ((1+P)·C MACs/row) —
      1.18-1.28B rows/s measured.  SR makes the quantization error
      zero-mean: SD(sum_cell) = s*sqrt(n_cell/6), s = halfrange/125, so
      dense cells see sqrt(n) cancellation (heatmap/visualization grade;
      exact counts; exact small-int sums).
    - 'hilo': bf16 hi/lo split pair — 540M, 2.8e-6 (error relative to each
      VALUE rather than the tile range: preferable for data whose
      magnitudes span many decades within one row tile).
    - 'i8lo': bf16 hi + int8-quantized lo sharing the count matmul — 643M,
      2.2e-5."""
    from .. import settings
    return settings.compute.pallas_payload


def _kernel(c_ref, *rest, nq, tile, n_payloads, with_count, mode="hilo", W=128,
            int_digits=None):
    v_refs = rest[:n_payloads]
    out_refs = rest[n_payloads:]
    if int_digits is None:
        int_digits = (None,) * n_payloads
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
    shift = {128: 7, 256: 8, 512: 9}[W]
    c = c_ref[0]                                        # [1, T] int32
    q = jax.lax.shift_right_arithmetic(c, shift)        # -1 stays -1 (void)
    r = jax.lax.bitwise_and(c, W - 1)

    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (W, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)                  # [nq, T]

    if n_payloads == 0:
        # count-only rides a W-wide r one-hot: same MACs (C per row) but the
        # wide-N int8 matmul runs at ~194 T-MACs/s vs 136 at N=128 —
        # measured 2.23B rows/s at 259²/W=512 vs 1.8B at W=128
        # (benchmarks/kernel_lab3.py countw512)
        count_ref[...] += jax.lax.dot_general(
            q_oh8, (ir == r).astype(jnp.int8), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return

    if any(nd is not None for nd in int_digits):
        # mixed exact-int / approx-float payloads, ALL in ONE wide int8
        # matmul.  Exact payloads (int_digits[p] = nd) arrive as int32
        # ``v - offset`` (excluded rows = -offset, see exact_int_spec) and
        # decompose into nd balanced base-256 digits EXACTLY; their digit
        # blocks accumulate in int32 out refs across tiles (|digit| <= 128,
        # so the wrapper slabs inputs at SLAB_ROWS_EXACT and recombines in
        # int64 — BIT-EXACT integer sums on the MXU).  Approx payloads ride
        # the existing per-tile scale/mid digit encoding (f32 out refs).
        ndigits_flt = _DIGIT_MODES.get(mode, 3)
        sr = mode == "i8sr"
        denom = {1: 126.0, 2: 32512.0, 3: 8323072.0}[ndigits_flt]
        r_oh32 = (ir == r).astype(jnp.int32)
        i8_blocks = [r_oh32]
        recon = []   # per payload: ('exact', j0, nd) | ('flt', j0, s, mid)
        if sr and any(nd is None for nd in int_digits):
            pltpu.prng_seed(step)
        blk = 1
        for p in range(n_payloads):
            if int_digits[p] is not None:
                nd = int_digits[p]
                rem = v_refs[p][0]                      # [1, T] int32
                digs = []
                for _ in range(nd - 1):
                    # low = rem mod 256 in [0,255] (arith shift floors), then
                    # balance to [-128,127] with the carry absorbed upward;
                    # avoids the rem+128 overflow at int32 extremes
                    hi = jax.lax.shift_right_arithmetic(rem, 8)
                    low = rem - hi * 256
                    up = (low >= 128).astype(jnp.int32)
                    digs.append(low - up * 256)
                    rem = hi + up
                digs.append(rem)                        # top digit, in range
                for d in digs[::-1]:                    # most significant first
                    i8_blocks.append(r_oh32 * d)
                recon.append(("exact", blk, nd))
                blk += nd
            else:
                v = v_refs[p][0]                        # [1, T] f32
                vmax = jnp.max(v)
                vmin = jnp.min(v)
                mid = jnp.round((vmax + vmin) * 0.5)
                half = jnp.maximum(
                    jnp.maximum(vmax - mid, mid - vmin), 1e-30)
                integral = jnp.max(jnp.abs(v - jnp.round(v))) == 0.0
                snap = jnp.logical_and(integral, half <= denom - 1.0)
                s = jnp.where(snap, 1.0, half / (denom - 1.0))
                x = (v - mid) / s
                if sr:
                    u = _uniform01(x.shape)
                    u = jnp.where(snap, 0.5, u)
                    qv = jnp.floor(x + u).astype(jnp.int32)
                else:
                    qv = jnp.round(x).astype(jnp.int32)
                digs = []
                rem = qv
                for _ in range(ndigits_flt - 1):
                    hi = jax.lax.shift_right_arithmetic(rem + 128, 8)
                    digs.append(rem - hi * 256)
                    rem = hi
                digs.append(rem)
                for d in digs[::-1]:
                    i8_blocks.append(r_oh32 * d)
                recon.append(("flt", blk, s, mid))
                blk += ndigits_flt
        B8 = jnp.concatenate(i8_blocks, axis=0).astype(jnp.int8)
        out8 = jax.lax.dot_general(
            q_oh8, B8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)           # [nq, (1+SUMd)*128]
        cnt = out8[:, :128]
        if with_count:
            count_ref[...] += cnt
        for p, spec in enumerate(recon):
            if spec[0] == "exact":
                _, j0, nd = spec
                sum_refs[p][...] += out8[:, j0 * 128:(j0 + nd) * 128]
            else:
                _, j0, s, mid = spec
                acc = out8[:, j0 * 128:(j0 + 1) * 128].astype(jnp.float32)
                for d in range(1, ndigits_flt):
                    acc = acc * 256.0 + out8[
                        :, (j0 + d) * 128:(j0 + d + 1) * 128].astype(jnp.float32)
                sum_refs[p][...] += acc * s + cnt.astype(jnp.float32) * mid
        return

    if mode in _DIGIT_MODES and n_payloads:
        # count + each value as `ndigits` balanced base-256 int8 digits, ALL
        # in ONE int8 matmul [nq,T]·[(1+dP)*128,T]^T.  The wide-N int8
        # matmul runs at ~194 T-MACs/s (98% of v5e peak) vs 136 for the
        # narrow count/bf16 pair (benchmarks/kernel_lab3.py, kernel_lab4.py).
        #
        # Round-4 upgrades (kernel_lab4):
        # * midrange centering: the digits encode v - mid with mid =
        #   round((max+min)/2) per tile; mid*count is added back from the
        #   EXACT count block (a free control variate).  Offset data
        #   (N(1000,1)) improves ~400x; constants become (near-)exact.
        # * integral snap: when the tile's values are integers whose
        #   centered range fits the digit capacity, s snaps to 1 and the
        #   sum is BIT-EXACT (e.g. h2o v1 in 1..5 is exact even at i8sr).
        # * 'i8sr': count + ONE stochastically-rounded digit (2C MACs/row
        #   -> 1.45B rows/s ceiling, measured 1.18-1.28B marginal at 259²).
        #   SR makes the quantization error zero-mean, so per-cell sums see
        #   sqrt(n) cancellation instead of worst-case n*s/2 drift:
        #   SD(sum_cell) = s*sqrt(n_cell/6), s = halfrange_tile/125.
        #
        # Centering needs the count block, so digit modes ALWAYS carry one —
        # even when the caller didn't ask for counts (a lone df.sum pass):
        # without it, integer sums silently lose the snap exactness to f32
        # recombination ulps (caught by the round-4 end-to-end verify).
        ndigits = _DIGIT_MODES[mode]
        sr = mode == "i8sr"
        denom = {1: 126.0, 2: 32512.0, 3: 8323072.0}[ndigits]
        r_oh32 = (ir == r).astype(jnp.int32)
        i8_blocks = [r_oh32]
        scales, mids = [], []
        if sr:
            pltpu.prng_seed(step)
        for p in range(n_payloads):
            v = v_refs[p][0]                            # [1, T] f32
            vmax = jnp.max(v)
            vmin = jnp.min(v)
            mid = jnp.round((vmax + vmin) * 0.5)
            half = jnp.maximum(
                jnp.maximum(vmax - mid, mid - vmin), 1e-30)
            integral = jnp.max(jnp.abs(v - jnp.round(v))) == 0.0
            snap = jnp.logical_and(integral, half <= denom - 1.0)
            s = jnp.where(snap, 1.0, half / (denom - 1.0))
            x = (v - mid) / s
            if sr:
                u = _uniform01(x.shape)
                # snapped tiles hold exact integers: deterministic rounding
                # keeps them exact (floor(int+u) can round up through f32)
                u = jnp.where(snap, 0.5, u)
                qv = jnp.floor(x + u).astype(jnp.int32)
            else:
                qv = jnp.round(x).astype(jnp.int32)
            # balanced digits d in [-128, 127], carry absorbed upward;
            # int8 elementwise products crash the remote Mosaic compiler
            # (PROGRESS round-3 negatives): build int32, cast at the boundary
            digs = []
            rem = qv
            for _ in range(ndigits - 1):
                hi = jax.lax.shift_right_arithmetic(rem + 128, 8)
                digs.append(rem - hi * 256)
                rem = hi
            digs.append(rem)
            for d in digs[::-1]:                        # most significant first
                i8_blocks.append(r_oh32 * d)
            scales.append(s)
            mids.append(mid)
        B8 = jnp.concatenate(i8_blocks, axis=0).astype(jnp.int8)
        out8 = jax.lax.dot_general(
            q_oh8, B8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)           # [nq, (1+dP)*128]
        cnt = out8[:, :128]
        if with_count:
            count_ref[...] += cnt
        for p in range(n_payloads):
            j = (1 + ndigits * p) * 128
            acc = out8[:, j:j + 128].astype(jnp.float32)
            for d in range(1, ndigits):
                acc = acc * 256.0 + out8[
                    :, j + d * 128:j + (d + 1) * 128].astype(jnp.float32)
            sum_refs[p][...] += acc * scales[p] + cnt.astype(jnp.float32) * mids[p]
        return

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


def histflat_grid(c, values, C, with_count=True, tile=None, mode=None,
                  int_specs=None):
    """Fused flat-cell binned count + P sums.

    c: [N] int32 in [0, C) — the flattened full-edge-layout cell index
    (gridagg.flat_index); out-of-range rows (e.g. -1 for filtered/padded)
    drop out of the q one-hot (void-cell semantics).  values: tuple of [N]
    arrays, pre-masked (excluded rows must already be 0 — or ``-offset``
    for exact integer payloads, see `exact_int_spec`).

    mode: 'i24' (default) | 'hilo' | 'i8lo' — see `payload_mode`; resolved
    at trace time from settings when None.  Applies to float/approx payloads.

    int_specs: optional per-payload tuple; entry p is None (float/approx
    payload, f32 input) or ``(offset, ndigits)`` (exact integer payload:
    int32 input holding ``v - offset``).  Exact payloads decompose into
    balanced base-256 int8 digits that accumulate in int32 — the input is
    slabbed at SLAB_ROWS_EXACT rows per kernel launch and recombined in
    int64, so integer sums are BIT-EXACT at any magnitude (reference
    agg_sum.cpp parity on the MXU).

    Returns (count [C] int32 or None, tuple of sum grids: [C] f32 for
    approx payloads, [C] int64 for exact payloads) — flat arrays; the
    caller reshapes to the grid shape.
    """
    values = tuple(values)
    if mode is None:
        mode = payload_mode() if values else "i24"
    if mode == "auto":
        # 'auto' (the settings default): float payloads ride i8sr (exact
        # counts, zero-mean sum error — see sr_error_sd); integer payloads
        # are routed to EXACT digit encodings by the caller via int_specs
        # regardless of mode, so 'auto' only picks the float encoding
        mode = "i8sr"
    if int_specs is None:
        int_specs = (None,) * len(values)
    int_specs = tuple(tuple(s) if s is not None else None for s in int_specs)
    has_exact = any(s is not None for s in int_specs)
    if has_exact and mode not in _DIGIT_MODES:
        mode = "i24"   # exact digits need the int8-matmul branch
    if mode not in ("i24", "i16", "i8sr", "i8lo", "hilo"):
        raise ValueError(
            f"unknown pallas payload mode {mode!r} "
            "(expected 'auto', 'i24', 'i16', 'i8sr', 'i8lo' or 'hilo')")
    int_digits = tuple(None if s is None else s[1] for s in int_specs)
    if not has_exact:
        return _histflat_grid(c, values, C, with_count, tile, mode, int_digits)

    # exact path: internal count is required for the offset reconstruction;
    # slab the rows so each launch's int32 digit accumulators stay exact
    n = int(c.shape[0])
    n_slabs = max(1, -(-n // SLAB_ROWS_EXACT))
    slab = -(-n // n_slabs)
    count_acc = None
    flt_acc = [None] * len(values)
    dig_acc = [None] * len(values)   # int64 [nd, C] per exact payload
    for s0 in range(0, n, slab):
        cs = jax.lax.slice_in_dim(c, s0, min(s0 + slab, n))
        vs = tuple(jax.lax.slice_in_dim(v, s0, min(s0 + slab, n))
                   for v in values)
        cnt, sums = _histflat_grid(cs, vs, C, True, tile, mode, int_digits)
        count_acc = cnt if count_acc is None else count_acc + cnt
        for p, g in enumerate(sums):
            if int_digits[p] is not None:
                g64 = g.astype(jnp.int64)
                dig_acc[p] = g64 if dig_acc[p] is None else dig_acc[p] + g64
            else:
                flt_acc[p] = g if flt_acc[p] is None else flt_acc[p] + g
    out_sums = []
    cnt64 = count_acc.astype(jnp.int64)
    for p, spec in enumerate(int_specs):
        if spec is not None:
            offset, nd = spec
            acc = dig_acc[p][0]
            for d in range(1, nd):
                acc = acc * 256 + dig_acc[p][d]
            out_sums.append(acc + np.int64(offset) * cnt64)
        else:
            out_sums.append(flt_acc[p])
    return (count_acc if with_count else None), tuple(out_sums)


@functools.partial(jax.jit, static_argnames=("C", "with_count", "tile", "mode",
                                              "int_digits"))
def _histflat_grid(c, values, C, with_count, tile, mode, int_digits=None):
    P = len(values)
    if int_digits is None:
        int_digits = (None,) * P
    P_flt = sum(1 for nd in int_digits if nd is None)
    exact_digits = tuple(nd for nd in int_digits if nd is not None)
    # count-only rides 512 lanes (wide-N matmul, ~2.2B rows/s); payload
    # modes keep the narrow 128-wide r side for the value products
    W = 512 if (P == 0 and C >= 4096) else 128
    nq = -(-C // W)
    if tile is None:
        tile = _pick_tile(nq, P_flt, mode=mode, W=W, exact_digits=exact_digits)
        if mode == "i24" and P_flt:
            tile = min(tile, 8192)   # measured optimum (kernel_lab3 flat_i24
            # t8192 700M vs t4096 616M rows/s marginal at 259², re-measured)
        # i16's smaller working set fits t16384 in VMEM and measures faster
        # there: 854M rows/s marginal vs 751M at t8192 (kernel_lab3 flat_i16,
        # 8.4M rows, real chip) — let _pick_tile's 16384 stand; i8sr measured
        # fastest at t16384 too (1.18-1.28B vs 1.13-1.20B at t8192,
        # kernel_lab4 i8src)
        if P == 0:
            tile = min(tile, 8192)   # measured optimum (countw512 t8192)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        values = tuple(jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) for v in values)
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = tuple(
        v.astype(jnp.int32 if int_digits[p] is not None else jnp.float32
                 ).reshape(n_tiles, 1, tile)
        for p, v in enumerate(values))

    kernel = functools.partial(
        _kernel, nq=nq, tile=tile, n_payloads=P, with_count=with_count,
        mode=mode, W=W, int_digits=int_digits)
    out_specs, out_shape = [], []
    if with_count:
        out_specs.append(pl.BlockSpec((nq, W), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nq, W), jnp.int32))
    for nd in int_digits:
        if nd is not None:
            # exact payload: nd int32 digit blocks side by side
            out_specs.append(pl.BlockSpec((nq, nd * 128), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nq, nd * 128), jnp.int32))
        else:
            out_specs.append(pl.BlockSpec((nq, W), lambda i: (0, 0), memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((nq, W), jnp.float32))
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
    res = []
    j = 0
    if with_count:
        res.append(outs[0].reshape(-1)[:C])
        j = 1
    for nd in int_digits:
        o = outs[j]
        j += 1
        if nd is not None:
            # [nq, nd*128] -> [nd, C]: per-digit q-major flat grids
            res.append(jnp.stack(
                [o[:, d * 128:(d + 1) * 128].reshape(-1)[:C]
                 for d in range(nd)]))
        else:
            res.append(o.reshape(-1)[:C])
    if with_count:
        return res[0], tuple(res[1:])
    return None, tuple(res)


def max_cells(n_payloads):
    return MAX_CELLS_PAYLOAD if n_payloads else MAX_CELLS_COUNT


def sr_error_sd(count, halfrange):
    """Per-cell standard deviation of an 'i8sr'/'auto' float sum.

    The stochastically-rounded digit's quantization error is zero-mean with
    per-row variance s^2/6 where s = halfrange_tile/125 <= halfrange/125
    (halfrange = (max-min)/2 over the data; per-tile ranges are narrower, so
    this is an upper bound).  Independent rows give
    SD(sum_cell) <= (halfrange/125) * sqrt(n_cell/6).

    count: per-cell row counts (the exact count grid from the same launch);
    halfrange: scalar (max-min)/2 of the payload data.  Returns the per-cell
    SD array — a ~3-sigma band covers the observed error (verified on-chip
    in tests_tpu/test_auto_mode.py)."""
    count = np.asarray(count, dtype=np.float64)
    return (float(halfrange) / 125.0) * np.sqrt(count / 6.0)


# ---------------------------------------------------------------------------
# sorted tile-local kernel: high-cardinality grids (C beyond max_cells)
# ---------------------------------------------------------------------------

# merge cost and grid memory scale with C: cap where the [C] partials
# (4 bytes x (1+P)) start to crowd HBM alongside the column cache
MAX_CELLS_SORTED = 64 * 1024 * 1024


def _tile_local_kernel(base_ref, c_ref, *rest, nq, tile, int_offsets,
                       with_count):
    """One SORTED row tile -> local [nq, 128] grids based at bases[tile].

    After sorting rows by cell, a tile of `tile` consecutive rows spans a
    narrow cell range, so the one-hot matmul trick applies with a tiny
    local grid (nq*128 cells based at the tile's first cell) — MACs/row =
    (1+2P)*local_C instead of (1+dP)*C.  Float payloads ride bf16 hi/lo
    pairs (hilo mode, ~2.8e-6 per-value error); small-int payloads
    (int_offsets[p] is not None: values - offset fit int8) ride the int8
    count matmul as ONE exact digit — int32 accumulation, bit-exact.
    Rows outside the local window (extreme cell-space sparsity) and void
    rows (c < 0, sorted to the front) are dropped here; the caller
    scatter-corrects overflow rows under a lax.cond."""
    n_payloads = len(int_offsets)
    v_refs = rest[:n_payloads]
    out_refs = rest[n_payloads:]
    # output order: [count?] + payloads in order (int -> int32, float -> f32)
    idx = 0
    count_ref = None
    if with_count:
        count_ref = out_refs[0]
        idx = 1
    sum_refs = out_refs[idx:]

    base = base_ref[pl.program_id(0)]
    c = c_ref[0]                                        # [1, T] int32
    local = c - base
    valid = (c >= 0) & (local >= 0) & (local < nq * 128)
    local = jnp.where(valid, local, -1)
    q = jax.lax.shift_right_arithmetic(local, 7)
    r = jax.lax.bitwise_and(local, 127)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh8 = (ir == r).astype(jnp.int8)

    int_idx = [p for p, off in enumerate(int_offsets) if off is not None]
    flt_idx = [p for p, off in enumerate(int_offsets) if off is None]

    if with_count or int_idx:
        # count + exact int digits share ONE int8 matmul; int8 elementwise
        # products crash the remote Mosaic compiler (round-3 negatives):
        # build int32, cast at the boundary
        r_oh32 = r_oh8.astype(jnp.int32)
        i8_blocks = [r_oh32]
        for p in int_idx:
            v = v_refs[p][0]                            # [1, T] f32, integral
            d = jnp.round(v - float(int_offsets[p])).astype(jnp.int32)
            d = jnp.where(valid, d, 0)
            i8_blocks.append(r_oh32 * d)
        B8 = jnp.concatenate(i8_blocks, axis=0).astype(jnp.int8)
        out8 = jax.lax.dot_general(
            q_oh8, B8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)           # [nq, (1+I)*128]
        if with_count:
            count_ref[0] = out8[:, :128]
        for j, p in enumerate(int_idx):
            sum_refs[p][0] = out8[:, (1 + j) * 128:(2 + j) * 128]

    if flt_idx:
        rf = r_oh8.astype(jnp.bfloat16)
        blocks = []
        for p in flt_idx:
            v = v_refs[p][0]                            # [1, T] f32
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            blocks.append(rf * vhi)
            blocks.append(rf * vlo)
        P = jnp.concatenate(blocks, axis=0)             # [2F*128, T]
        qf = q_oh8.astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            qf, P, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [nq, 2F*128]
        for j, p in enumerate(flt_idx):
            hi = out[:, 2 * j * 128:(2 * j + 1) * 128]
            lo = out[:, (2 * j + 1) * 128:(2 * j + 2) * 128]
            sum_refs[p][0] = hi + lo


def sorted_histflat_grid(c, values, C, with_count=True, tile=8192,
                         local_C=8192, int_offsets=None):
    """High-cardinality fused count + P sums: sort + tile-local MXU kernel.

    Strategy for C beyond `max_cells` where the flat kernel's O(C) MACs/row
    lose to scatter (~70M rows/s/op): sort rows by cell (XLA TPU sort, 337M
    rows/s at 16.7M), aggregate each 8192-row tile over a local 8192-cell
    window based at its first cell (tile spans ~C*T/N cells after sorting),
    then merge per-tile local grids into the global grid with a sequential
    fori_loop of dynamic_update_slice adds — no searchsorted, no N-length
    scatter (both round-3 negative results, PROGRESS.md).  Overflow rows
    (tile span > local_C, impossible for dense ordinals with <= `tile`
    distinct cells per tile and rare otherwise) are voided by the kernel
    and scatter-corrected under a lax.cond that only pays when they exist.

    int_offsets: optional per-payload tuple; entry p is None for float
    payloads (bf16 hi/lo, ~2.8e-6 per-value error) or an integer offset
    meaning values[p] - offset fits int8 (int8/uint8/bool data) — the
    payload then rides the int8 count matmul as ONE exact digit: int32
    locals/global (exact while rows * 128 < 2^31, i.e. chunks <= 2^24
    rows), reconstructed as digit + offset*count in int64.  BIT-EXACT
    integer sums at any cardinality (reference agg_sum.cpp parity).

    Measured (v5e, benchmarks/sortkernel_lab.py, count+sum): 266M rows/s at
    16.7M rows/1M cells (scatter fallback: 44M), 257M at C=10M — the rate is
    cardinality-independent.  Counts exact; float sums bf16-hilo (~3.9e-6).

    Returns (count [C] int32 or None, tuple of per-payload [C] grids:
    f32 for float payloads, int64 for int payloads).
    """
    values = tuple(values)
    P_n = len(values)
    if int_offsets is None:
        int_offsets = (None,) * P_n
    int_offsets = tuple(int_offsets)
    has_int = any(off is not None for off in int_offsets)
    # int payloads reconstruct as digit + offset*count: the count block is
    # required even when the caller didn't ask for counts
    need_count = with_count or has_int
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        values = tuple(jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
                       for v in values)
    c = c.astype(jnp.int32)
    values = tuple(v.astype(jnp.float32) for v in values)
    sorted_all = jax.lax.sort((c,) + values, num_keys=1)
    sc, svs = sorted_all[0], sorted_all[1:]
    bases = jnp.maximum(sc[::tile], 0)                  # [n_tiles]
    over_row = ((sc - jnp.repeat(bases, tile)) >= local_C) & (sc >= 0)
    n_over = jnp.sum(over_row.astype(jnp.int32))

    nq = local_C // 128
    c2 = sc.reshape(n_tiles, 1, tile)
    v2 = tuple(v.reshape(n_tiles, 1, tile) for v in svs)

    kernel = functools.partial(
        _tile_local_kernel, nq=nq, tile=tile, int_offsets=int_offsets,
        with_count=need_count)
    payload_dtypes = [jnp.float32 if off is None else jnp.int32
                      for off in int_offsets]
    out_dtypes = ([jnp.int32] if need_count else []) + payload_dtypes
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [row_spec] * (1 + P_n),
            out_specs=[pl.BlockSpec((1, nq, 128), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * len(out_dtypes),
            out_shape=[jax.ShapeDtypeStruct((n_tiles, nq, 128), dt)
                       for dt in out_dtypes],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(bases, c2, *v2)
    locals_ = [o.reshape(n_tiles, local_C) for o in outs]

    # merge: sequential read-modify-write of [local_C] windows at each base
    # (bases are sorted, windows overlap -> must be sequential; each step is
    # a vectorized dynamic slice add, no scatter)
    Gs = tuple(jnp.zeros(C + local_C, dt) for dt in out_dtypes)

    def body(t, G):
        out = []
        for g, loc in zip(G, locals_):
            w = jax.lax.dynamic_slice(g, (bases[t],), (local_C,)) + loc[t]
            out.append(jax.lax.dynamic_update_slice(g, w, (bases[t],)))
        return tuple(out)

    Gs = jax.lax.fori_loop(0, n_tiles, body, Gs)

    # overflow correction: scatter just the overflowed rows (routed to the
    # padding tail otherwise); the N-length scatter only runs when needed
    def correct(G):
        routed = jnp.where(over_row, sc, np.int32(C))
        out = []
        for i, g in enumerate(G):
            if need_count and i == 0:
                contrib = jnp.where(over_row, 1, 0).astype(jnp.int32)
            else:
                p = i - (1 if need_count else 0)
                v = svs[p]
                if int_offsets[p] is not None:
                    contrib = jnp.where(
                        over_row,
                        jnp.round(v - float(int_offsets[p])).astype(jnp.int32), 0)
                else:
                    contrib = jnp.where(over_row, v, 0.0)
            out.append(g.at[routed].add(contrib))
        return tuple(out)

    Gs = jax.lax.cond(n_over > 0, correct, lambda G: G, Gs)

    flat = [g[:C] for g in Gs]
    cnt = flat[0] if need_count else None
    sums = list(flat[1:] if need_count else flat)
    for p, off in enumerate(int_offsets):
        if off is not None:
            # exact reconstruction: digit grid + offset * count, in int64
            sums[p] = (sums[p].astype(jnp.int64)
                       + np.int64(off) * cnt.astype(jnp.int64))
    if with_count:
        return cnt, tuple(sums)
    return None, tuple(sums)


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
