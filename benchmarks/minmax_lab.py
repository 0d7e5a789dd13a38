"""Binned min/max strategy lab (h2o q7: max/min of int8 values per 1M-card key).

Candidates at N=1e8 rows, C=1M cells, int8 values:
  scatter   — state.at[routed].max(v)            (the current 41M rows/s floor)
  sort2     — 2-key lax.sort(cell, v) + segment boundaries (the 64-bit path)
  composite — ONE i32 key = cell*256 + (v+128): single-array sort, per-cell
              max = low byte of the last entry per segment (int8/uint8/bool
              only; needs C*256 < 2^31)

Run: python benchmarks/minmax_lab.py [--rows 1e8] [--cells 1e6]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, repeats=3):
    r = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        r = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e8)
    ap.add_argument("--cells", type=float, default=1e6)
    args = ap.parse_args()
    n, C = int(args.rows), int(args.cells)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    cell = jax.random.randint(k1, (n,), 0, C, jnp.int32)
    v = jax.random.randint(k2, (n,), -128, 128, jnp.int8)

    @jax.jit
    def scatter_max(cell, v):
        state = jnp.full(C + 1, np.iinfo(np.int8).min, jnp.int8)
        return state.at[cell].max(v)

    @jax.jit
    def sort2_max(cell, v):
        sb, sv = jax.lax.sort((cell, v), num_keys=2)
        cells = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).squeeze(-1)
        ends = jnp.searchsorted(sb, cells, side="right")
        starts = jnp.searchsorted(sb, cells, side="left")
        picked = sv[jnp.clip(ends - 1, 0, n - 1)]
        return jnp.where(ends > starts, picked,
                         np.iinfo(np.int8).min).astype(jnp.int8)

    @jax.jit
    def composite_max(cell, v):
        key = cell * np.int32(256) + (v.astype(jnp.int32) + 128)
        sk = jax.lax.sort(key)
        bounds = jax.lax.broadcasted_iota(
            jnp.int32, (C, 1), 0).squeeze(-1) * np.int32(256)
        ends = jnp.searchsorted(sk, bounds + 256, side="left")
        starts = jnp.searchsorted(sk, bounds, side="left")
        picked = sk[jnp.clip(ends - 1, 0, n - 1)]
        byte = picked - (picked // 256) * 256 - 128
        return jnp.where(ends > starts, byte,
                         np.iinfo(np.int8).min).astype(jnp.int8)

    for name, fn in [("scatter", scatter_max), ("sort2", sort2_max),
                     ("composite", composite_max)]:
        try:
            sec, r = timeit(fn, cell, v)
            print(f"{name:10s} {sec:8.4f}s  {n/sec/1e6:8.1f}M rows/s")
            if name == "scatter":
                ref = np.asarray(r)[:C]
            else:
                np.testing.assert_array_equal(np.asarray(r)[:C], ref)
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
