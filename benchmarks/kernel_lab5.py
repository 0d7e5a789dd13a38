"""Kernel lab round 5: high-cardinality (C ~ 1M cells) count+sum strategies.

Round-3/4 wall: grids beyond MAX_CELLS_PAYLOAD=700k bypass the Pallas MXU
kernel (MACs/row = (1+dP)*C makes the matmul itself lose to scatter there)
and fall back to XLA scatter (~70M rows/s/op, 37M marginal for the fused
count+sum of a mean).  The reference claims >1e9 rows/s groupby
(README.md:60); VERDICT r3 item 3 sets >=120M rows/s at 16.7M rows / 1M keys.

Candidate strategies measured here (N rows, C cells, f32 values):

  scatter2        two separate .at[].add scatters (count int32 + sum f32)
                  -- the current fallback, the baseline
  scatter_packed  ONE scatter into [C, 2] (count and sum ride one
                  index-dedup pass)
  sort_only       lax.sort((c, v), num_keys=1) alone -- the primitive that
                  bounds every sort-based strategy
  sortagg_i64     full sorted-segment path: sort, quantize v to int32
                  (per-call midrange centering + integral snap, error
                  <= halfrange/2^31), int64 cumsum, segment boundaries via
                  flag+cummax (NO per-cell searchsorted), one unique-index
                  scatter of <=C segment totals
  sortagg_f32     same but raw f32 cumsum (accuracy foil: diff-of-prefix
                  error grows with N)
  seg_searchsort  sort + cumsum + per-cell searchsorted ends (the existing
                  _segment_sum_sorted shape) -- measures the searchsorted tax
  slab_i8sr       histflat_grid i8sr per 512k-cell slab, all rows
                  void-routed through every slab (S*(1+P)*C/S MACs/row --
                  arithmetic says ~97M ceiling; confirm)

Usage: python benchmarks/kernel_lab5.py [N_rows] [C_cells] [variant-substr,...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


# ---------------------------------------------------------------------------
# scatter baselines
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("C",))
def scatter2(c, v, C):
    cnt = jnp.zeros(C, jnp.int32).at[c].add(1, mode="drop")
    s = jnp.zeros(C, jnp.float32).at[c].add(v, mode="drop")
    return cnt, s


@functools.partial(jax.jit, static_argnames=("C",))
def scatter_packed(c, v, C):
    upd = jnp.stack([jnp.ones_like(v), v], axis=1)          # [N, 2]
    grid = jnp.zeros((C, 2), jnp.float32).at[c].add(upd, mode="drop")
    return grid[:, 0].astype(jnp.int32), grid[:, 1]


# ---------------------------------------------------------------------------
# sort-based
# ---------------------------------------------------------------------------

@jax.jit
def sort_only(c, v):
    return jax.lax.sort((c, v), num_keys=1)


def _segment_bounds(sc):
    """start-of-run index per row via flag + cummax (no searchsorted)."""
    n = sc.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), sc[1:] != sc[:-1]])
    start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    last = jnp.concatenate([sc[1:] != sc[:-1], jnp.ones(1, bool)])
    return start, last


@functools.partial(jax.jit, static_argnames=("C",))
def sortagg_i64(c, v, C):
    sc, sv = jax.lax.sort((c, v), num_keys=1)
    vmax = jnp.max(sv)
    vmin = jnp.min(sv)
    mid = jnp.round((vmax + vmin) * 0.5)
    half = jnp.maximum(jnp.maximum(vmax - mid, mid - vmin), 1e-30)
    denom = 2147480000.0  # ~2^31, int32-safe after round
    integral = jnp.max(jnp.abs(sv - jnp.round(sv))) == 0.0
    snap = jnp.logical_and(integral, half <= denom - 1.0)
    s = jnp.where(snap, 1.0, half / (denom - 1.0))
    x = jnp.round((sv - mid) / s).astype(jnp.int32)
    cum = jnp.cumsum(x.astype(jnp.int64))
    start, last = _segment_bounds(sc)
    idx = jnp.arange(sc.shape[0], dtype=jnp.int32)
    cum0 = jnp.concatenate([jnp.zeros(1, jnp.int64), cum])
    seg_int = cum - cum0[start]                              # int64 exact
    seg_cnt = idx - start + 1
    cell = jnp.where(last, sc, C)                            # void non-ends
    cnt = jnp.zeros(C + 1, jnp.int32).at[cell].add(
        jnp.where(last, seg_cnt, 0), unique_indices=False)[:C]
    total = seg_int.astype(jnp.float64) * s + seg_cnt.astype(jnp.float64) * mid
    ssum = jnp.zeros(C + 1, jnp.float32).at[cell].add(
        jnp.where(last, total.astype(jnp.float32), 0.0))[:C]
    return cnt, ssum


@functools.partial(jax.jit, static_argnames=("C",))
def sortagg_f32(c, v, C):
    sc, sv = jax.lax.sort((c, v), num_keys=1)
    cum = jnp.cumsum(sv)
    start, last = _segment_bounds(sc)
    idx = jnp.arange(sc.shape[0], dtype=jnp.int32)
    cum0 = jnp.concatenate([jnp.zeros(1, jnp.float32), cum])
    seg = cum - cum0[start]
    seg_cnt = idx - start + 1
    cell = jnp.where(last, sc, C)
    cnt = jnp.zeros(C + 1, jnp.int32).at[cell].add(
        jnp.where(last, seg_cnt, 0))[:C]
    ssum = jnp.zeros(C + 1, jnp.float32).at[cell].add(
        jnp.where(last, seg, 0.0))[:C]
    return cnt, ssum


@functools.partial(jax.jit, static_argnames=("C",))
def seg_searchsort(c, v, C):
    sc, sv = jax.lax.sort((c, v), num_keys=1)
    cum = jnp.cumsum(sv)
    cells = jnp.arange(C, dtype=jnp.int32)
    ends = jnp.searchsorted(sc, cells, side="right")
    cum0 = jnp.concatenate([jnp.zeros(1, jnp.float32), cum])
    totals = cum0[ends]
    ssum = totals - jnp.concatenate([jnp.zeros(1, jnp.float32), totals[:-1]])
    cnt = ends - jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])
    return cnt.astype(jnp.int32), ssum


# ---------------------------------------------------------------------------
# slab void-routing through the existing Pallas kernel
# ---------------------------------------------------------------------------

def slab_i8sr(c, v, C, slab=524288):
    from vaex_tpu.ops.pallas_gridagg import histflat_grid
    cnts, sums = [], []
    for lo in range(0, C, slab):
        hi = min(lo + slab, C)
        cl = jnp.where((c >= lo) & (c < hi), c - lo, -1)
        cnt, (s,) = histflat_grid(cl, (v,), hi - lo, with_count=True, mode="i8sr")
        cnts.append(cnt)
        sums.append(s)
    return jnp.concatenate(cnts), jnp.concatenate(sums)


# ---------------------------------------------------------------------------

def main():
    args = [a for a in sys.argv[1:]]
    N = int(float(args[0])) if len(args) > 0 else 16_777_216
    C = int(float(args[1])) if len(args) > 1 else 1_000_000
    only = args[2].split(",") if len(args) > 2 else None

    rng = np.random.default_rng(0)
    c_h = rng.integers(0, C, N).astype(np.int32)
    v_h = rng.normal(10.0, 3.0, N).astype(np.float32)
    c = jnp.asarray(c_h)
    v = jnp.asarray(v_h)

    # oracle (numpy, f64)
    ref_cnt = np.bincount(c_h, minlength=C)
    ref_sum = np.bincount(c_h, weights=v_h.astype(np.float64), minlength=C)
    denom = np.maximum(np.abs(ref_sum), 1.0)

    variants = {
        "scatter2": lambda: timed(scatter2, (c, v, C)),
        "scatter_packed": lambda: timed(scatter_packed, (c, v, C)),
        "sort_only": lambda: timed(sort_only, (c, v)),
        "sortagg_i64": lambda: timed(sortagg_i64, (c, v, C)),
        "sortagg_f32": lambda: timed(sortagg_f32, (c, v, C)),
        "seg_searchsort": lambda: timed(seg_searchsort, (c, v, C)),
        "slab_i8sr": lambda: timed(jax.jit(functools.partial(slab_i8sr, C=C)), (c, v)),
    }
    for name, run in variants.items():
        if only and not any(s in name for s in only):
            continue
        try:
            t, out = run()
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        rate = N / t / 1e6
        acc = ""
        if name != "sort_only":
            cnt, ssum = out
            cnt = np.asarray(cnt)
            ssum = np.asarray(ssum, dtype=np.float64)
            cnt_ok = (cnt == ref_cnt).all()
            err = np.max(np.abs(ssum - ref_sum) / denom)
            acc = f" count_exact={bool(cnt_ok)} sum_relerr={err:.2e}"
        print(f"{name:16s} {t*1e3:8.1f} ms  {rate:7.0f} M rows/s{acc}")


if __name__ == "__main__":
    main()
