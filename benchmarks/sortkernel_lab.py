"""Lab: sort + tile-local Pallas kernel for high-cardinality grids.

Round-3 negatives: at C=1M cells the flat MXU kernel loses (MACs/row = C),
scatter runs 75M rows/s/op, and sort+segment dies on the segment stage
(cumsum + searchsorted ~420ms) and on N-length boundary scatters.

New design ("sortkernel"): sort rows by cell, then exploit LOCALITY — after
sorting, a tile of T consecutive rows spans a narrow contiguous cell range
(~T*C/N cells for uniform keys, <= a few k for any aggregation-regime data).
Aggregate each tile with the existing one-hot matmul TRICK but over a small
LOCAL grid [local_C] based at the tile's first cell, then merge the per-tile
local grids into the global [C] grid with a sequential fori_loop of
dynamic_update_slice adds (vectorized, no scatter).

  sort (c, v)              ~50ms at 16.7M (337M rows/s, round-3 lab)
  bases = sc[::T]          n_tiles gathers, free
  tile kernel              (1+2P)*local_C bf16 MACs/row -> few ms
  merge fori               n_tiles * local_C element adds, vectorized

Rows whose cell overflows the tile's local window (possible under extreme
cell-space sparsity) are voided by the kernel; production handles them with
a lax.cond fallback scatter (counted here).

Run: python benchmarks/sortkernel_lab.py [N] [C] [local_C]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, repeats=3, K=4):
    """Marginal seconds per call, synced by fetching a tiny reduction
    (block_until_ready is a no-op on the tunneled axon platform)."""
    @jax.jit
    def probe(out):
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(jnp.ravel(l)[:64].astype(jnp.float32)) for l in leaves)

    def run(k):
        acc = None
        o = None
        for _ in range(k):
            o = fn(*args)
            p = probe(o)
            acc = p if acc is None else acc + p
        return float(acc), o

    _, out = run(1)
    t1s, tks = [], []
    for _ in range(repeats):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K); tks.append(time.perf_counter() - t0)
    t1, tk = min(t1s), min(tks)
    marginal = max(1e-9, (tk - t1) / (K - 1))
    return marginal, out


def _tile_kernel(base_ref, c_ref, v_ref, count_ref, sum_ref, *, nq, tile):
    """One sorted row tile -> local [nq, 128] count+sum grids based at
    base_ref.  hilo bf16 payload (exact count, ~2.8e-6 value error)."""
    base = base_ref[pl.program_id(0)]
    c = c_ref[0]                                        # [1, T] int32
    local = c - base
    valid = (c >= 0) & (local >= 0) & (local < nq * 128)
    local = jnp.where(valid, local, -1)
    q = lax.shift_right_arithmetic(local, 7)
    r = lax.bitwise_and(local, 127)
    iq = lax.broadcasted_iota(jnp.int32, (nq, tile), 0)
    ir = lax.broadcasted_iota(jnp.int32, (128, tile), 0)
    q_oh8 = (iq == q).astype(jnp.int8)
    r_oh8 = (ir == r).astype(jnp.int8)
    count_ref[0] = lax.dot_general(
        q_oh8, r_oh8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    v = v_ref[0]
    vhi = v.astype(jnp.bfloat16)
    vlo = (v - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
    rf = r_oh8.astype(jnp.bfloat16)
    P = jnp.concatenate([rf * vhi, rf * vlo], axis=0)   # [2*128, T]
    qf = q_oh8.astype(jnp.bfloat16)
    out = lax.dot_general(
        qf, P, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # [nq, 2*128]
    sum_ref[0] = out[:, :128] + out[:, 128:]


@functools.partial(jax.jit, static_argnames=("C", "T", "local_C"))
def sortkernel(c, v, C, T=8192, local_C=16384):
    n = c.shape[0]
    n_tiles = -(-n // T)
    pad = n_tiles * T - n
    if pad:
        c = jnp.concatenate([c, jnp.full(pad, -1, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, v.dtype)])
    sc, sv = lax.sort((c, v), num_keys=1)
    bases = sc[::T]                                     # [n_tiles]
    # overflow rows (cell-space sparsity beyond local_C per tile): voided by
    # the kernel; production falls back to scatter for them under lax.cond
    over = jnp.sum(((sc - jnp.repeat(bases, T)) >= local_C) & (sc >= 0))

    nq = local_C // 128
    c2 = sc.reshape(n_tiles, 1, T)
    v2 = sv.astype(jnp.float32).reshape(n_tiles, 1, T)
    b2 = jnp.maximum(bases, 0)

    kernel = functools.partial(_tile_kernel, nq=nq, tile=T)
    with jax.enable_x64(False):
        lc, ls = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, nq, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nq, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, nq, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles, nq, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(b2, c2, v2)

    lc = lc.reshape(n_tiles, local_C)
    ls = ls.reshape(n_tiles, local_C)
    # merge: sequential read-modify-write of [local_C] windows at each base
    Gc = jnp.zeros(C + 2 * local_C, jnp.int32)
    Gs = jnp.zeros(C + 2 * local_C, jnp.float32)
    b0 = jnp.maximum(bases, 0) + local_C

    def body(t, G):
        Gc, Gs = G
        off = b0[t]
        wc = lax.dynamic_slice(Gc, (off,), (local_C,)) + lc[t]
        ws = lax.dynamic_slice(Gs, (off,), (local_C,)) + ls[t]
        return (lax.dynamic_update_slice(Gc, wc, (off,)),
                lax.dynamic_update_slice(Gs, ws, (off,)))

    Gc, Gs = lax.fori_loop(0, n_tiles, body, (Gc, Gs))
    return Gc[local_C:local_C + C], Gs[local_C:local_C + C], over


def main():
    args = sys.argv[1:]
    N = int(float(args[0])) if len(args) > 0 else 16_777_216
    C = int(float(args[1])) if len(args) > 1 else 1_000_000
    local_C = int(float(args[2])) if len(args) > 2 else 16384
    T = 8192

    rng = np.random.default_rng(0)
    c_h = rng.integers(0, C, N).astype(np.int32)
    v_h = rng.normal(10.0, 3.0, N).astype(np.float32)
    c = jnp.asarray(c_h)
    v = jnp.asarray(v_h)

    ref_cnt = np.bincount(c_h, minlength=C)
    ref_sum = np.bincount(c_h, weights=v_h.astype(np.float64), minlength=C)
    denom = np.maximum(np.abs(ref_sum), 1.0)

    t, (cnt, ssum, over) = timeit(
        functools.partial(sortkernel, C=C, T=T, local_C=local_C), c, v)
    cnt = np.asarray(cnt)
    ssum = np.asarray(ssum, np.float64)
    err = np.max(np.abs(ssum - ref_sum) / denom)
    print(f"sortkernel T={T} local_C={local_C}: {t*1e3:8.1f} ms  "
          f"{N/t/1e6:7.0f} M rows/s  count_exact={bool((cnt == ref_cnt).all())} "
          f"sum_relerr={err:.2e} overflow_rows={int(over)}")


if __name__ == "__main__":
    main()
