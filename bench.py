"""Benchmark: 2-D binned mean/std throughput (the reference's headline claim,
/root/reference/README.md:8-14: >1e9 rows/s for N-d binned statistics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1e9 rows/s (reference claim on a laptop; BASELINE.md north star:
>=1e9 rows/s/chip on v5e)."""

import json
import os
import sys
import time

import numpy as np

BASELINE_ROWS_PER_S = 1e9


def main():
    n = int(os.environ.get("BENCH_ROWS", 1 << 24))  # 16M rows default (cold remote-compile latency on the tunnel dominates bigger sizes)
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    import vaex_tpu as vaex

    rng = np.random.RandomState(42)
    # float32 columns: the TPU-native layout (bench data; accumulation is
    # still exact for counts and f64 for sums per settings.compute.precision)
    x = rng.normal(0, 1, n).astype(np.float32)
    y = rng.normal(0, 1, n).astype(np.float32)
    E = (x * x + y * y).astype(np.float32)
    df = vaex.from_arrays(x=x, y=y, E=E)

    limits = [[-3.0, 3.0], [-3.0, 3.0]]

    def run():
        t0 = time.perf_counter()
        mean = df.mean("E", binby=["x", "y"], limits=limits, shape=256)
        dt = time.perf_counter() - t0
        return dt, mean

    # warmup (compile)
    dt, mean = run()
    times = []
    for _ in range(repeats):
        dt, mean = run()
        times.append(dt)
    best = min(times)
    rows_per_s = n / best

    result = {
        "metric": "2d_binned_mean_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / BASELINE_ROWS_PER_S,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
