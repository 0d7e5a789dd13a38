"""Profile the headline 2-D binned mean: where does wall marginal (611M rows/s)
lose vs the i24 kernel's standalone 946M rows/s?

Stages measured independently (marginal over K chained calls, tiny-fetch sync):
  A. full df.mean(binby=...) engine call (the bench path)
  B. raw histflat_grid kernel on premade (cflat, vals)
  C. prologue only: bin x,y -> cflat + masked payload
  D. prologue + kernel fused in one jit (what the executor's step compiles)

Run: python benchmarks/headline_prof.py [--rows 33554432]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def marginal(fn, args_list, repeats=3, K=4):
    @jax.jit
    def probe(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(l.reshape(-1)[:8].astype(jnp.float32)) for l in leaves)

    def run(k):
        acc = None
        for i in range(k):
            o = fn(*args_list[i % len(args_list)])
            p = probe(o)
            acc = p if acc is None else acc + p
        return float(acc)

    run(1)
    t1s, tks = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K); tks.append(time.perf_counter() - t0)
    return max(1e-9, (min(tks) - min(t1s)) / (K - 1)), min(t1s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 25)
    args = ap.parse_args()
    n = args.rows

    import vaex_tpu as vaex
    from vaex_tpu.ops.pallas_gridagg import histflat_grid

    @jax.jit
    def make(seed):
        kx, ky = jax.random.split(jax.random.PRNGKey(seed))
        x = jax.random.normal(kx, (n,), jnp.float32)
        y = jax.random.normal(ky, (n,), jnp.float32)
        return x, y, x * x + y * y

    x, y, E = make(42)
    limits = [[-3.0, 3.0], [-3.0, 3.0]]
    ncells = 256 * 256

    # A: full engine call
    df = vaex.from_arrays(x=x, y=y, E=E)
    def engine():
        return df.mean("E", binby=["x", "y"], limits=limits, shape=256)
    t0 = time.perf_counter(); engine(); warm = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); engine(); times.append(time.perf_counter() - t0)
    print(f"A full engine        wall {min(times)*1e3:8.1f}ms  {n/min(times)/1e6:8.0f}M rows/s  (warm {warm:.1f}s)")

    # C: prologue only
    @jax.jit
    def prologue(x, y, E):
        sx = 256 / 6.0
        bx = jnp.floor((x - (-3.0)) * sx).astype(jnp.int32)
        by = jnp.floor((y - (-3.0)) * sx).astype(jnp.int32)
        ok = (bx >= 0) & (bx < 256) & (by >= 0) & (by < 256) & ~jnp.isnan(E)
        flat = bx * 256 + by
        cflat = jnp.where(ok, flat, np.int32(-1))
        vals = jnp.where(ok, E, 0.0).astype(jnp.float32)
        return cflat, vals

    mC, t1C = marginal(prologue, [(x, y, E)])
    print(f"C prologue only      marg {mC*1e3:8.1f}ms  {n/mC/1e6:8.0f}M rows/s")

    cflat, vals = prologue(x, y, E)

    # B: raw kernel
    @jax.jit
    def kernel(cflat, vals):
        return histflat_grid(cflat, (vals,), ncells, with_count=True)

    mB, t1B = marginal(kernel, [(cflat, vals)])
    print(f"B kernel only        marg {mB*1e3:8.1f}ms  {n/mB/1e6:8.0f}M rows/s")

    # D: prologue + kernel in one jit
    @jax.jit
    def fused(x, y, E):
        cflat, vals = prologue(x, y, E)
        return histflat_grid(cflat, (vals,), ncells, with_count=True)

    mD, t1D = marginal(fused, [(x, y, E)])
    print(f"D prologue+kernel    marg {mD*1e3:8.1f}ms  {n/mD/1e6:8.0f}M rows/s")

    # E: D with an explicit chunk loop like the executor (slice per chunk)
    L = 1 << 24
    @jax.jit
    def fused_chunk(x, y, E, i0):
        xs = jax.lax.dynamic_slice(x, (i0,), (L,))
        ys = jax.lax.dynamic_slice(y, (i0,), (L,))
        Es = jax.lax.dynamic_slice(E, (i0,), (L,))
        return fused(xs, ys, Es)

    def chunked():
        outs = None
        for i0 in range(0, n, L):
            o = fused_chunk(x, y, E, i0)
            outs = o if outs is None else jax.tree.map(jnp.add, outs, o)
        return outs

    mE, t1E = marginal(lambda: chunked(), [()])
    print(f"E chunked (L=2^24)   marg {mE*1e3:8.1f}ms  {n/mE/1e6:8.0f}M rows/s")


if __name__ == "__main__":
    main()
