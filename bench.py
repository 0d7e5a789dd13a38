"""Benchmark: 2-D binned mean throughput (the reference's headline claim,
/root/reference/README.md:8-14: >1e9 rows/s for N-d binned statistics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1e9 rows/s (reference claim on a laptop; BASELINE.md north star:
>=1e9 rows/s/chip on v5e).

A per-stage breakdown (fixed overhead vs marginal engine rate) goes to
stderr: on the tunneled single-chip dev setup every result fetch pays a
~30ms round-trip, so the headline number is measured at a row count large
enough to amortize it (BENCH_ROWS, default 512M).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_ROWS_PER_S = 1e9


def _claim_devices_or_die():
    """Claiming the tunneled TPU hangs indefinitely when the tunnel is down;
    probe in a daemon thread and keep retrying until BENCH_CLAIM_TIMEOUT
    (default 30min), then exit(1) with a clear message instead of hanging."""
    import threading

    deadline = time.time() + float(os.environ.get("BENCH_CLAIM_TIMEOUT", 1800))
    attempt = 0
    while True:
        attempt += 1
        got = []

        def probe():
            try:
                import jax
                got.append(jax.devices())
            except Exception as e:
                got.append(e)

        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout=180)
        if got and not isinstance(got[0], Exception):
            return got[0]
        if time.time() > deadline:
            print(f"[bench] ERROR: no device claimable after {attempt} attempts "
                  f"(tunnel down?) — aborting instead of hanging", file=sys.stderr)
            sys.exit(1)
        print(f"[bench] device claim attempt {attempt} failed; retrying", file=sys.stderr)
        time.sleep(60)


def main():
    _claim_devices_or_die()
    # 768M rows (9GB of f32 device columns in 16GB HBM — fits since the
    # executor stopped double-caching slices of device-resident columns):
    # large enough that the tunnel's fixed per-query cost (~40ms ≈ one
    # result-fetch RTT that production hardware doesn't pay) is <3% of the
    # pass; the marginal rate is reported alongside.  Measured r3: 597M
    # rows/s wall, 615-622M marginal, fixed ~39ms.  The marginal rate is
    # chunking-invariant (8M chunks vs one 512M monolithic chunk both
    # measure ~617M): the i24 flat-cell MXU kernel is the wall.
    n = int(os.environ.get("BENCH_ROWS", 768 * 1024 * 1024))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    import vaex_tpu as vaex

    # float32 columns generated ON DEVICE (jax.Array columns are first-class
    # in this engine): 256M rows x 3 cols = 3GB stays in HBM, skipping both
    # host-side generation (which pays this sandbox's ~0.4ms/4KB first-touch
    # page faults — minutes at this size) and the ~1GB/s tunnel H2D.  The
    # timed query path is identical to host-backed columns once the HBM
    # column cache is warm, which the old 128M host-numpy bench also relied
    # on; counts stay exact (int accumulation) and sums carry the documented
    # i24 error bound (pallas_gridagg.payload_mode).
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make(seed):
        kx, ky = jax.random.split(jax.random.PRNGKey(seed))
        x = jax.random.normal(kx, (n,), jnp.float32)
        y = jax.random.normal(ky, (n,), jnp.float32)
        return x, y, x * x + y * y

    x, y, E = make(42)
    df = vaex.from_arrays(x=x, y=y, E=E)

    limits = [[-3.0, 3.0], [-3.0, 3.0]]

    def run(rows=None):
        d = df if rows is None else df[:rows]
        t0 = time.perf_counter()
        mean = d.mean("E", binby=["x", "y"], limits=limits, shape=256)
        dt = time.perf_counter() - t0
        return dt, mean

    t0 = time.perf_counter()
    dt, mean = run()  # warmup: compile + one-time H2D of the columns
    warm = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        dt, mean = run()
        times.append(dt)
    best = min(times)
    rows_per_s = n / best

    # stage breakdown: small-N run isolates the fixed per-query cost
    # (result-fetch round-trips + dispatch); the marginal rate is the
    # engine's true streaming throughput
    n_small = n // 8
    run(n_small)
    t_small = min(run(n_small)[0] for _ in range(repeats))
    marginal = (best - t_small) / (n - n_small)
    fixed = best - marginal * n
    print(
        f"[bench] warmup(compile+H2D)={warm:.1f}s  t({n})={best*1e3:.0f}ms  "
        f"t({n_small})={t_small*1e3:.0f}ms  fixed~{fixed*1e3:.0f}ms  "
        f"marginal~{1/marginal/1e6:.0f}M rows/s",
        file=sys.stderr,
    )

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
