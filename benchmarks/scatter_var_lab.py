"""Lab: scatter-add variants for the high-cardinality groupby pass.

The suite's groupby_highcard_mean sums a float64 payload over int64 keys;
TPU has no native f64, so the scatter-add runs in emulated f64.  Variants:
  a. i32 keys + f64 payload scatter (current path, emulation cost)
  b. i32 keys + f32 payload (precision reference point)
  c. hi/lo split: f64 -> hi=f32(v), lo=f32(v-hi); two f32 scatters,
     recombined in f64 at finalize.  Error: per-cell f32 accumulation of
     the lo residual only -> bounded by n_cell * eps_f32 * |lo|max,
     |lo| <= eps_f32 * |v| -> relative error ~ n_cell * eps^2 (~1e-13 at
     n_cell=1e3), vs eps_f64 ~ 1e-16 exact.
  d. count-only scatter (int32)

Run: python benchmarks/scatter_var_lab.py [--rows 16777216] [--cells 1048576]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def marginal(fn, *args, repeats=3, K=4):
    @jax.jit
    def probe(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.reshape(-1)[:8].astype(jnp.float32)) for l in leaves)

    def run(k):
        acc = None
        for _ in range(k):
            o = fn(*args)
            p = probe(o)
            acc = p if acc is None else acc + p
        return float(acc)

    run(1)
    t1s, tks = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K); tks.append(time.perf_counter() - t0)
    return max(1e-9, (min(tks) - min(t1s)) / (K - 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 24)
    ap.add_argument("--cells", type=int, default=1 << 20)
    args = ap.parse_args()
    N, C = args.rows, args.cells

    jax.config.update("jax_enable_x64", True)
    key = jax.random.PRNGKey(0)
    kc, kv = jax.random.split(key)
    c = jax.random.randint(kc, (N,), 0, C, jnp.int32)
    v64 = jax.random.uniform(kv, (N,), jnp.float64)
    v32 = v64.astype(jnp.float32)

    @functools.partial(jax.jit, static_argnames=("C",))
    def scat_f64(c, v, C):
        cnt = jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")
        s = jnp.zeros(C, jnp.float64).at[c].add(v, mode="drop")
        return cnt, s

    @functools.partial(jax.jit, static_argnames=("C",))
    def scat_f32(c, v, C):
        cnt = jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")
        s = jnp.zeros(C, jnp.float32).at[c].add(v, mode="drop")
        return cnt, s

    @functools.partial(jax.jit, static_argnames=("C",))
    def scat_hilo(c, v, C):
        hi = v.astype(jnp.float32)
        lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
        cnt = jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")
        shi = jnp.zeros(C, jnp.float32).at[c].add(hi, mode="drop")
        slo = jnp.zeros(C, jnp.float32).at[c].add(lo, mode="drop")
        return cnt, shi.astype(jnp.float64) + slo.astype(jnp.float64)

    @functools.partial(jax.jit, static_argnames=("C",))
    def scat_hilo_2d(c, v, C):
        # one scatter of a [N,2] payload instead of two scatters
        hi = v.astype(jnp.float32)
        lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
        pair = jnp.stack([hi, lo], axis=-1)
        cnt = jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")
        s = jnp.zeros((C, 2), jnp.float32).at[c].add(pair, mode="drop")
        return cnt, s[:, 0].astype(jnp.float64) + s[:, 1].astype(jnp.float64)

    @functools.partial(jax.jit, static_argnames=("C",))
    def scat_count(c, C):
        return jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")

    for name, fn, a in [
        ("count only (i32)", scat_count, (c, C)),
        ("count + f32 sum", scat_f32, (c, v32, C)),
        ("count + f64 sum (emul)", scat_f64, (c, v64, C)),
        ("count + hi/lo f32 x2", scat_hilo, (c, v64, C)),
        ("count + hi/lo [N,2]", scat_hilo_2d, (c, v64, C)),
    ]:
        m = marginal(fn, *a)
        print(f"{name:26s} {m*1e3:9.1f}ms  {N/m/1e6:9.1f}M rows/s", flush=True)

    # correctness
    cn, vn = np.asarray(c), np.asarray(v64, np.float64)
    ref = np.bincount(cn, weights=vn, minlength=C)
    _, s64 = scat_f64(c, v64, C)
    _, shl = scat_hilo(c, v64, C)
    print("f64 max err:", np.abs(np.asarray(s64) - ref).max())
    print("hilo max err:", np.abs(np.asarray(shl) - ref).max())


if __name__ == "__main__":
    main()
