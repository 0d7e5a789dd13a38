"""Scatter lab: high-cardinality groupby accumulation variants (1M cells).

The groupby_highcard workload (VERDICT r1 #3): count[c] += 1, sum[c] += v
for c in [0, 1M).  Round-1 measurements: XLA f32/i32 scatter ~50M updates/s
per op at 1M cells; sort+segment 13% faster but loses f32-cumsum accuracy.

Variants here:
  s0  two XLA scatters (count i32 + sum f32) — production baseline
  s1  ONE windowed scatter: updates [N, 2] -> grid [C, 2] (count rides as
      f32 1.0; exact while per-cell rows/chunk < 2^24)
  s2  ONE windowed scatter, 4 payloads [N, 4] -> [C, 4]
  s3  Pallas scalar-loop kernel: fori_loop over rows, dynamic VMEM
      read-modify-write on a [C, 2] grid resident in VMEM (C*8B <= 8MB)
  s4  Pallas scalar-loop, 8-way interleaved accumulators ([8, C/8...] no —
      8 independent row streams into ONE grid; tests scalar-unit ILP)

Usage: python benchmarks/scatter_lab.py [N_rows] [s0,s1,...]
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

C = 1 << 20  # 1M cells


@functools.partial(jax.jit, static_argnames=("ncells",))
def s0_two_scatters(c, v, ncells):
    count = jnp.zeros(ncells, jnp.int32).at[c].add(1)
    total = jnp.zeros(ncells, jnp.float32).at[c].add(v)
    return count, total


@functools.partial(jax.jit, static_argnames=("ncells",))
def s1_windowed(c, v, ncells):
    upd = jnp.stack([jnp.ones_like(v), v], axis=1)           # [N, 2]
    grid = jnp.zeros((ncells, 2), jnp.float32).at[c].add(upd)
    return grid[:, 0].astype(jnp.int32), grid[:, 1]


@functools.partial(jax.jit, static_argnames=("ncells",))
def s2_windowed4(c, v, ncells):
    upd = jnp.stack([jnp.ones_like(v), v, v * v, jnp.abs(v)], axis=1)
    grid = jnp.zeros((ncells, 4), jnp.float32).at[c].add(upd)
    return grid[:, 0].astype(jnp.int32), grid[:, 1]


def _kernel_s3(c_ref, v_ref, grid_ref, *, tile, ncells, lanes):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        grid_ref[...] = jnp.zeros_like(grid_ref)

    one = jnp.ones((1,), jnp.float32)

    def body(i, _):
        cell = c_ref[0, 0, i]
        val = v_ref[0, 0, i]
        row = grid_ref[cell, :]       # [lanes] f32 (dynamic sublane index)
        add = jnp.concatenate([one, val.reshape(1)])  # no in-kernel scatter
        grid_ref[cell, :] = row + add
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("ncells", "tile"))
def s3_pallas_scalar(c, v, ncells, tile=1 << 15):
    n = c.shape[0]
    n_tiles = max(1, -(-n // tile))
    pad = n_tiles * tile - n
    if pad:
        c = jnp.concatenate([c, jnp.zeros(pad, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    lanes = 128  # VMEM min lane width; [C, 128] f32 = C*512B... too big for 1M
    # instead: flat [C*2] grid viewed as [C, 2]? sublane granularity — use
    # a [C, 8] padded layout only if it fits; for C=1M use [C] pairs packed:
    # grid [C, 2] f32 = 8MB VMEM — within the 64MB scratch budget
    lanes = 2
    c2 = c.reshape(n_tiles, 1, tile)
    v2 = v.astype(jnp.float32).reshape(n_tiles, 1, tile)
    kernel = functools.partial(_kernel_s3, tile=tile, ncells=ncells, lanes=lanes)
    with jax.enable_x64(False):
        grid = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ncells, lanes), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ncells, lanes), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(c2, v2)
    return grid[:, 0].astype(jnp.int32), grid[:, 1]


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
    only = sys.argv[2] if len(sys.argv) > 2 else None
    K = 4
    rng = np.random.RandomState(0)
    inputs_d = []
    for _ in range(K):
        c_h = rng.randint(0, C, n).astype(np.int32)
        v_h = rng.normal(0, 1, n).astype(np.float32)
        inputs_d.append((jax.device_put(c_h), jax.device_put(v_h)))
    _fetch(jnp.sum(inputs_d[-1][1]))

    c0, v0 = (np.asarray(a) for a in inputs_d[0])
    ref_c = np.zeros(C, np.int64)
    np.add.at(ref_c, c0, 1)
    ref_s = np.zeros(C, np.float64)
    np.add.at(ref_s, c0, v0.astype(np.float64))

    variants = [
        ("s0 two-scatters", lambda c, v: s0_two_scatters(c, v, C)),
        ("s1 windowed2", lambda c, v: s1_windowed(c, v, C)),
        ("s2 windowed4", lambda c, v: s2_windowed4(c, v, C)),
        ("s3 pallas-scalar", lambda c, v: s3_pallas_scalar(c, v, C)),
    ]
    if only:
        variants = [x for x in variants if any(t in x[0] for t in only.split(","))]
    for name, thunk in variants:
        try:
            name, dt, t1, out = measure(name, thunk, inputs_d)
        except Exception as e:  # noqa: BLE001
            print(f"{name:>18}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        cnt, tot = out
        cerr = np.abs(np.asarray(cnt, np.int64) - ref_c).max()
        serr = np.abs(np.asarray(tot, np.float64) - ref_s).max() / max(1.0, np.abs(ref_s).max())
        print(f"{name:>18}: {n/dt/1e6:8.1f} M rows/s marginal ({dt*1e3:7.2f} ms/call)  "
              f"count_err={cerr} sum_relerr={serr:.2e}", flush=True)


if __name__ == "__main__":
    main()
