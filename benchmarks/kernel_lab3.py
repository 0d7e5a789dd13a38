"""Kernel lab round 3: flat-cell q/r factorization + limiter isolation probes.

Round-2 conclusion was "one-hot family capped ~380M rows/s at 256^2".  This
lab (a) isolates WHERE the cap lives (MXU rate on one-hot operands vs VPU
one-hot build rate), and (b) measures the new flat-cell kernel family:

  histflat  — single flat cell index c = q*128 + r; one-hot q [nq,T] and
              one-hot r [128,T]; count = int8 dot(q8, r8^T) -> [nq,128];
              payloads ride the 128-wide r side as bf16 hi/lo blocks.
              No lane padding for any grid size (v3 wastes 384/259 = 48%
              on the matmul N dim for 259^2 grids), rank-agnostic.
  probes    — mxu_int8 / mxu_bf16: matmul-only rate on prebuilt one-hot
              operands (one build at step 0 into scratch, R matmuls/step).
              build_i32 / build_i16: one-hot build + row-reduce only.
  scalar    — Mosaic dynamic-sublane scatter loop (the round-1 crasher).

Usage: python benchmarks/kernel_lab3.py [N_rows] [variant-substr,...]
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


# ------------------------------------------------------------------ histflat
def _kernel_flat_r(c_ref, *rest, nq, tile, n_payloads, with_count, cmp16):
    """Payload-on-r variant without the transpose: payload matmul is
    q_bf16 [nq, T] @ P [T-contract] -> [nq, 2P*128]."""
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

    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    r = jax.lax.bitwise_and(c, 127)

    if cmp16:
        iq = jax.lax.broadcasted_iota(jnp.int16, (nq, tile), 0)
        ir = jax.lax.broadcasted_iota(jnp.int16, (128, tile), 0)
        q_oh8 = (iq == q.astype(jnp.int16)).astype(jnp.int8)
        r_oh8 = (ir == r.astype(jnp.int16)).astype(jnp.int8)
    else:
        iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
        ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
        q_oh8 = (iq == q).astype(jnp.int8)
        r_oh8 = (ir == r).astype(jnp.int8)

    if with_count:
        count_ref[...] += jax.lax.dot_general(
            q_oh8, r_oh8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    if n_payloads:
        rf = r_oh8.astype(jnp.bfloat16)              # [128, T]
        blocks = []
        for p in range(n_payloads):
            v = v_refs[p][0]
            vhi = v.astype(jnp.bfloat16)
            vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
            blocks.append(rf * vhi)
            blocks.append(rf * vlo)
        P = jnp.concatenate(blocks, axis=0)          # [2P*128, T]
        qf = q_oh8.astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            qf, P, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # [nq, 2P*128]
        for p in range(n_payloads):
            hi = out[:, 2 * p * 128:(2 * p + 1) * 128]
            lo = out[:, (2 * p + 1) * 128:(2 * p + 2) * 128]
            sum_refs[p][...] += hi + lo


@functools.partial(jax.jit, static_argnames=("C", "with_count", "tile", "cmp16"))
def histflat(c, values, C, with_count=True, tile=8192, cmp16=False):
    """Flat-cell binned count + P sums.  c: [N] int32 in [0, C) or -1."""
    values = tuple(values)
    P = len(values)
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        values = tuple(jnp.concatenate([v, jnp.zeros(pad, v.dtype)]) for v in values)
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = tuple(v.astype(jnp.float32).reshape(n_tiles, 1, tile) for v in values)

    kernel = functools.partial(
        _kernel_flat_r, nq=nq, tile=tile, n_payloads=P,
        with_count=with_count, cmp16=cmp16)
    out_specs, out_shape = [], []
    if with_count:
        out_specs.append(pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nq, 128), jnp.int32))
    for _ in range(P):
        out_specs.append(pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((nq, 128), jnp.float32))
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
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


# ------------------------------------------------------------------- probes
def _kernel_mxu_probe(c_ref, out_ref, q_s, r_s, *, nq, tile, reps, dtype8):
    """Build one-hots once per step, then run `reps` matmuls on them.
    Marginal time per extra rep = pure MXU rate on one-hot operands."""
    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    r = jax.lax.bitwise_and(c, 127)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    if dtype8:
        q_s[...] = (iq == q).astype(jnp.int8)
        r_s[...] = (ir == r).astype(jnp.int8)
        acc = jnp.zeros((nq, 128), jnp.int32)
        for k in range(reps):
            acc = acc + jax.lax.dot_general(
                q_s[...], r_s[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        out_ref[...] = acc
    else:
        q_s[...] = (iq == q).astype(jnp.bfloat16)
        r_s[...] = (ir == r).astype(jnp.bfloat16)
        acc = jnp.zeros((nq, 128), jnp.float32)
        for k in range(reps):
            acc = acc + jax.lax.dot_general(
                q_s[...], r_s[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[...] = acc.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("C", "tile", "reps", "dtype8"))
def mxu_probe(c, C, tile=8192, reps=1, dtype8=True):
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, n // tile)
    c2 = c[:n_tiles * tile].reshape(n_tiles, 1, tile)
    sdt = jnp.int8 if dtype8 else jnp.bfloat16
    kernel = functools.partial(_kernel_mxu_probe, nq=nq, tile=tile, reps=reps, dtype8=dtype8)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.int32 if dtype8 else jnp.float32),
            scratch_shapes=[pltpu.VMEM((nq, tile), sdt), pltpu.VMEM((128, tile), sdt)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2)
    return out


def _kernel_build_probe(c_ref, out_ref, *, nq, tile, cmp16, reps):
    """One-hot build + cheap row-reduce only (no matmul): isolates VPU."""
    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    acc = jnp.zeros((nq, 128), jnp.int32)
    for k in range(reps):
        qq = q + k  # defeat CSE across reps
        if cmp16:
            iq = jax.lax.broadcasted_iota(jnp.int16, (nq, tile), 0)
            oh = (iq == qq.astype(jnp.int16)).astype(jnp.int8)
        else:
            iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
            oh = (iq == qq).astype(jnp.int8)
        acc = acc + jnp.sum(oh.reshape(nq, tile // 128, 128).astype(jnp.int32), axis=1)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("C", "tile", "cmp16", "reps"))
def build_probe(c, C, tile=8192, cmp16=False, reps=1):
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, n // tile)
    c2 = c[:n_tiles * tile].reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_build_probe, nq=nq, tile=tile, cmp16=cmp16, reps=reps)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2)
    return out


# --------------------------------------------------------- scalar scatter
def _kernel_scalar(c_pref, v_pref, out_ref, *, nq, tile):
    """Per-row dynamic-sublane accumulate: out[q, :] += v * onehot128(r).
    c and v arrive as scalar-prefetch (SMEM) arrays."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(t, _):
        c = c_pref[step * tile + t]
        q = jnp.maximum(c >> 7, 0)
        r = jax.lax.bitwise_and(c, 127)
        v = v_pref[step * tile + t]
        v = jnp.where(c >= 0, v, 0.0)
        add = jnp.where(lane == r, v, 0.0)
        out_ref[pl.ds(q, 1), :] += add
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("C", "tile"))
def scalar_scatter(c, values, C, tile=2048):
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, n // tile)
    m = n_tiles * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[],
        out_specs=pl.BlockSpec((nq, 128), lambda i, *_: (0, 0)),
    )
    kernel = functools.partial(_kernel_scalar, nq=nq, tile=tile)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nq, 128), jnp.float32),
        )(c[:m], values[:m].astype(jnp.float32))
    return out.reshape(-1)[:C]


# ------------------------------------------------------------------ harness
def _fetch(out):
    return jax.tree.map(np.asarray, out)


def measure(name, fn, inputs_list, repeats=3):
    K = len(inputs_list)

    def run(k):
        outs = fn(*inputs_list[0])
        for i in range(1, k):
            o = fn(*inputs_list[i])
            outs = jax.tree.map(jnp.add, outs, o)
        return _fetch(outs)

    out1 = run(1)
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
    nx = ny = 259   # the real bench grid: 256 bins + 3 edge slots
    C = nx * ny
    rng = np.random.RandomState(0)
    inputs_h, inputs_d = [], []
    for k in range(K):
        bx_h = rng.randint(0, nx, n).astype(np.int32)
        by_h = rng.randint(0, ny, n).astype(np.int32)
        c_h = (bx_h.astype(np.int64) * ny + by_h).astype(np.int32)
        v_h = rng.normal(0, 1, n).astype(np.float32)
        inputs_h.append((c_h, v_h))
        inputs_d.append(tuple(jax.device_put(a) for a in (c_h, v_h)))
    _fetch(jnp.sum(inputs_d[-1][1]))

    c_h, v_h = inputs_h[0]
    ref_c = np.zeros(C, np.int64)
    np.add.at(ref_c, c_h, 1)
    ref_s = np.zeros(C, np.float64)
    np.add.at(ref_s, c_h, v_h.astype(np.float64))

    import vaex_tpu  # noqa: F401  (malloc tuning)
    from vaex_tpu.ops.pallas_gridagg import hist2d_grid

    def v3_flatwrap(c, v):
        bx = c // ny
        by = c % ny
        cnt, sums = hist2d_grid(bx, by, (v,), nx, ny, with_count=True)
        return cnt.reshape(-1), (sums[0].reshape(-1),)

    variants = [
        ("v3 259 baseline", v3_flatwrap),
        ("flat t4096", lambda c, v: histflat(c, (v,), C, tile=4096)),
        ("flat t8192", lambda c, v: histflat(c, (v,), C, tile=8192)),
        ("flat t16384", lambda c, v: histflat(c, (v,), C, tile=16384)),
        ("flat16 t8192", lambda c, v: histflat(c, (v,), C, tile=8192, cmp16=True)),
        ("flat16 t16384", lambda c, v: histflat(c, (v,), C, tile=16384, cmp16=True)),
        ("flat count t8192", lambda c, v: histflat(c, (), C, tile=8192)),
        ("flat_i8lo t8192", lambda c, v: histflat_i8lo(c, (v,), C, tile=8192)),
        ("flat_i8lo t16384", lambda c, v: histflat_i8lo(c, (v,), C, tile=16384)),
        ("flat_i16 t8192", lambda c, v: histflat_i16(c, (v,), C, tile=8192)),
        ("flat_i16 t16384", lambda c, v: histflat_i16(c, (v,), C, tile=16384)),
        ("flat_i24 t4096", lambda c, v: histflat_i24(c, (v,), C, tile=4096)),
        ("flat_i24 t8192", lambda c, v: histflat_i24(c, (v,), C, tile=8192)),
        ("flat_i24 t16384", lambda c, v: histflat_i24(c, (v,), C, tile=16384)),
        ("countw128 t16384", lambda c, v: histflat_countw(c, C, tile=16384, W=128)),
        ("countw256 t16384", lambda c, v: histflat_countw(c, C, tile=16384, W=256)),
        ("countw512 t8192", lambda c, v: histflat_countw(c, C, tile=8192, W=512)),
        ("countw512 t16384", lambda c, v: histflat_countw(c, C, tile=16384, W=512)),
        ("flat16 count t16k", lambda c, v: histflat(c, (), C, tile=16384, cmp16=True)),
        ("probe mxu8 r4", lambda c, v: mxu_probe(c, C, reps=4, dtype8=True)),
        ("probe mxu8 r1", lambda c, v: mxu_probe(c, C, reps=1, dtype8=True)),
        ("probe mxubf r4", lambda c, v: mxu_probe(c, C, reps=4, dtype8=False)),
        ("probe mxubf r1", lambda c, v: mxu_probe(c, C, reps=1, dtype8=False)),
        ("probe build32 r1", lambda c, v: build_probe(c, C, reps=1)),
        ("probe build32 r4", lambda c, v: build_probe(c, C, reps=4)),
        ("probe build16 r1", lambda c, v: build_probe(c, C, cmp16=True, reps=1)),
        ("probe build16 r4", lambda c, v: build_probe(c, C, cmp16=True, reps=4)),
        ("scalar t2048", lambda c, v: scalar_scatter(c, v, C)),
    ]
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only:
        variants = [v for v in variants if any(tok in v[0] for tok in only.split(","))]
    for name, thunk in variants:
        try:
            name, dt, t1, out = measure(name, thunk, inputs_d)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>20}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        line = f"{name:>20}: {n/dt/1e6:8.1f} M rows/s marginal ({dt*1e3:7.2f} ms/call, 1-call+RTT {t1*1e3:6.1f} ms)"
        if isinstance(out, tuple) and len(out) == 2 and out[0] is not None:
            cgrid, sums = out
            c_np = np.asarray(cgrid, np.float64).reshape(-1)[:C]
            cerr = np.abs(c_np - ref_c).max()
            line += f"  count_err={cerr:.1f}"
            if isinstance(sums, (tuple, list)) and len(sums):
                s_np = np.asarray(sums[0], np.float64).reshape(-1)[:C]
                serr = np.abs(s_np - ref_s).max() / max(1.0, np.abs(ref_s).max())
                line += f" sum_relerr={serr:.2e}"
        print(line)


# ------------------------------------------------------- flat int8-lo payload
def _kernel_flat_i8lo(c_ref, v_ref, count_ref, sum_ref, *, nq, tile):
    """count + int8-quantized lo residual share ONE int8 matmul
    [nq,T]@[T,256] -> int32; hi rides a bf16 matmul [nq,T]@[T,128].

    v = vhi(bf16) + lo, |lo| <= 2^-9 max|v|; qlo = round(lo/s) with
    s = max|lo|/127 per tile -> per-row error <= s/2 ~ 7.7e-6 * max|v|_tile.
    MXU cost: 2C int8 + C bf16 (vs C int8 + 2C bf16 for hi/lo) — ~15% less
    matmul time at the measured 136 T-MACs int8 / 98.5 bf16 rates.  The
    scaled lo partial folds into the f32 sum accumulator per step (the
    scale varies per tile, so int32 lo cannot accumulate across steps)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    r = jax.lax.bitwise_and(c, 127)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh32 = (ir == r).astype(jnp.int32)
    r_oh8 = r_oh32.astype(jnp.int8)

    v = v_ref[0]
    vhi = v.astype(jnp.bfloat16)
    lo = v - vhi.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(lo)), 1e-30) / 127.0
    qlo = jnp.round(lo / s).astype(jnp.int32)

    # int8 elementwise products crash the remote Mosaic compiler (see
    # PROGRESS round-3 negatives): stay int32 elementwise, cast the
    # concatenated operand to int8 once at the matmul boundary
    B8 = jnp.concatenate([r_oh32, r_oh32 * qlo], axis=0).astype(jnp.int8)  # [256, T]
    out = jax.lax.dot_general(
        q_oh8, B8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    count_ref[...] += out[:, :128]

    rf = r_oh8.astype(jnp.bfloat16)
    qf = q_oh8.astype(jnp.bfloat16)
    hi = jax.lax.dot_general(
        qf, rf * vhi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    sum_ref[...] += hi + out[:, 128:].astype(jnp.float32) * s


@functools.partial(jax.jit, static_argnames=("C", "tile"))
def histflat_i8lo(c, values, C, tile=8192):
    (v,) = values
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = v.astype(jnp.float32).reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_flat_i8lo, nq=nq, tile=tile)
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec, row_spec],
            out_specs=[
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq, 128), jnp.int32),
                jax.ShapeDtypeStruct((nq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2, v2)
    return count.reshape(-1)[:C], (total.reshape(-1)[:C],)

# --------------------------------------------- all-int8 two-channel payload
def _kernel_flat_i16(c_ref, v_ref, count_ref, sum_ref, *, nq, tile):
    """count + value quantized to TWO int8 channels (shared per-tile scale)
    share ONE int8 matmul [nq,T]@[T,384] -> int32.  No bf16 matmul at all:
    MXU cost 3C int8 = 3C/136 vs i8lo's 2C/136 + C/98.5 — predicted ~674M
    vs 602M rows/s at 259².

    qv = round(v/s), s = max|v|/32512 per tile; a = (qv+128)>>8 in [-127,127],
    b = qv - 256a in [-128,127]; sum = s*(256A + B) with A,B exact int32.
    Per-row error <= s/2 ~ 1.54e-5 * max|v|_tile."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    r = jax.lax.bitwise_and(c, 127)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh32 = (ir == r).astype(jnp.int32)

    v = v_ref[0]
    s = jnp.maximum(jnp.max(jnp.abs(v)), 1e-30) / 32512.0
    qv = jnp.round(v / s).astype(jnp.int32)
    a = jax.lax.shift_right_arithmetic(qv + 128, 8)
    b = qv - a * 256
    # int8 elementwise crashes remote Mosaic: build int32, cast at boundary
    B8 = jnp.concatenate([r_oh32, r_oh32 * a, r_oh32 * b], axis=0).astype(jnp.int8)
    out = jax.lax.dot_general(
        q_oh8, B8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    count_ref[...] += out[:, :128]
    sum_ref[...] += (out[:, 128:256].astype(jnp.float32) * 256.0
                     + out[:, 256:].astype(jnp.float32)) * s


@functools.partial(jax.jit, static_argnames=("C", "tile"))
def histflat_i16(c, values, C, tile=8192):
    (v,) = values
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = v.astype(jnp.float32).reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_flat_i16, nq=nq, tile=tile)
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec, row_spec],
            out_specs=[
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq, 128), jnp.int32),
                jax.ShapeDtypeStruct((nq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2, v2)
    return count.reshape(-1)[:C], (total.reshape(-1)[:C],)


# ------------------------------------------- all-int8 three-channel payload
def _kernel_flat_i24(c_ref, v_ref, count_ref, sum_ref, *, nq, tile):
    """count + value as THREE balanced base-256 int8 digits in ONE int8
    matmul [nq,T]@[T,512].  24-bit mantissa per tile: error <= s/2 =
    max|v|/2^24 — BETTER than bf16 hi/lo (2^-17) and all-int8 speed.
    qv = round(v/s), s = max|v|/8323072 (=127*2^16, keeps the top digit in
    int8 after balanced carries)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)
        sum_ref[...] = jnp.zeros_like(sum_ref)

    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, 7)
    r = jax.lax.bitwise_and(c, 127)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh32 = (ir == r).astype(jnp.int32)

    v = v_ref[0]
    s = jnp.maximum(jnp.max(jnp.abs(v)), 1e-30) / 8323072.0
    qv = jnp.round(v / s).astype(jnp.int32)
    # balanced base-256 digits: d in [-128, 127], carry absorbed upward
    q1 = jax.lax.shift_right_arithmetic(qv + 128, 8)
    d0 = qv - q1 * 256
    q2 = jax.lax.shift_right_arithmetic(q1 + 128, 8)
    d1 = q1 - q2 * 256
    B8 = jnp.concatenate(
        [r_oh32, r_oh32 * q2, r_oh32 * d1, r_oh32 * d0], axis=0).astype(jnp.int8)
    out = jax.lax.dot_general(
        q_oh8, B8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    count_ref[...] += out[:, :128]
    sum_ref[...] += (out[:, 128:256].astype(jnp.float32) * 65536.0
                     + out[:, 256:384].astype(jnp.float32) * 256.0
                     + out[:, 384:].astype(jnp.float32)) * s


@functools.partial(jax.jit, static_argnames=("C", "tile"))
def histflat_i24(c, values, C, tile=8192):
    (v,) = values
    nq = -(-C // 128)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = v.astype(jnp.float32).reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_flat_i24, nq=nq, tile=tile)
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        count, total = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec, row_spec],
            out_specs=[
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nq, 128), jnp.int32),
                jax.ShapeDtypeStruct((nq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2, v2)
    return count.reshape(-1)[:C], (total.reshape(-1)[:C],)


# ----------------------------------------- wide-lane count-only (W=256/512)
def _kernel_flat_countw(c_ref, count_ref, *, nq, tile, W):
    """count-only with an r one-hot of width W (lanes = W instead of 128):
    same total MACs (C/row) but a wider matmul N dim — probes whether the
    194-T-MACs near-peak rate of [T,384+] extends to the count kernel."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        count_ref[...] = jnp.zeros_like(count_ref)

    shift = {128: 7, 256: 8, 512: 9}[W]
    c = c_ref[0]
    q = jax.lax.shift_right_arithmetic(c, shift)
    r = jax.lax.bitwise_and(c, W - 1)
    iq = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (W, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh8 = (ir == r).astype(jnp.int8)
    count_ref[...] += jax.lax.dot_general(
        q_oh8, r_oh8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


@functools.partial(jax.jit, static_argnames=("C", "tile", "W"))
def histflat_countw(c, C, tile=8192, W=256):
    nq = -(-C // W)
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
    c2 = c.reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_flat_countw, nq=nq, tile=tile, W=W)
    row_spec = pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        count = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[row_spec],
            out_specs=[pl.BlockSpec((nq, W), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((nq, W), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(c2)[0]
    return count.reshape(-1)[:C], ()


if __name__ == "__main__":
    main()
