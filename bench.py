"""Benchmark: 2-D binned mean throughput (the reference's headline claim,
/root/reference/README.md:8-14: >1e9 rows/s for N-d binned statistics).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = 1e9 rows/s (reference claim on a laptop; BASELINE.md north star:
>=1e9 rows/s/chip on v5e).

Headline mode: the LIBRARY DEFAULT ('auto', no override): integer payloads
ride EXACT digit encodings (bitwise-equal to the int64 oracle); float
payloads ride i8sr — exact counts + ONE stochastically-rounded int8 digit
per sum payload (2C MACs/row on the MXU; see vaex_tpu/ops/pallas_gridagg.py).
The float sum error is zero-mean with SD(sum_cell) = s*sqrt(n_cell/6),
s = halfrange_tile/125 (closed form: pallas_gridagg.sr_error_sd) — at the
bench's ~11k rows/cell that is visualization-grade; both the OBSERVED error
and the analytic 6-sigma bound are printed below.  The stderr breakdown also
reports the analytic-grade float mode (i24, ~5e-7) and the bit-parity mode
(VAEX_TPU_PRECISION=float64) so the accuracy/throughput trade is visible
next to the headline number.

A per-stage breakdown (fixed overhead vs marginal engine rate) goes to
stderr: on the tunneled single-chip dev setup every result fetch pays a
~30ms round-trip, so the headline number is measured at a row count large
enough to amortize it (BENCH_ROWS, default 768M).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_ROWS_PER_S = 1e9

# The headline runs the LIBRARY DEFAULT payload mode ('auto': exact integer
# digits + i8sr floats) with NO override — the recorded number is the
# out-of-box number (VERDICT r4 #4).  BENCH_PAYLOAD still forces a mode for
# companion studies.
if os.environ.get("BENCH_PAYLOAD"):
    os.environ["VAEX_TPU_PALLAS_PAYLOAD"] = os.environ["BENCH_PAYLOAD"]


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


def _oocore_path(n):
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/root/bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    return os.path.join(cache_dir, f"oocore_{n}.hdf5")


def _make_oocore_file(path, n):
    """Create-once disk artifact: n rows x (x, y, E) f32 in the vaex-hdf5 v2
    layout, written with reused buffers (a fresh numpy temp per chunk would
    pay this sandbox's ~0.4ms/4KB first-touch faults)."""
    chunk = 64 * 1024 * 1024
    rng = np.random.default_rng(42)
    bufx = np.empty(chunk, np.float32)
    bufy = np.empty(chunk, np.float32)
    bufe = np.empty(chunk, np.float32)

    def gen_into(i0):
        m = min(chunk, n - i0)
        rng.standard_normal(out=bufx[:m], dtype=np.float32)
        rng.standard_normal(out=bufy[:m], dtype=np.float32)
        np.multiply(bufx[:m], bufx[:m], out=bufe[:m])
        bufe[:m] += bufy[:m] * bufy[:m]
        return [("x", bufx[:m]), ("y", bufy[:m]), ("E", bufe[:m])]

    t0 = time.perf_counter()
    import h5py
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as h5:
        table = h5.require_group("table")
        table.attrs["type"] = "table"
        cols = h5.require_group("table/columns")
        cols.attrs["column_order"] = "x,y,E"
        ds = {name: cols.require_group(name).create_dataset(
                  "data", shape=(n,), dtype=np.float32, track_times=False)
              for name in ("x", "y", "E")}
        for i0 in range(0, n, chunk):
            for name, ar in gen_into(i0):
                ds[name][i0:i0 + len(ar)] = ar
    os.replace(tmp, path)
    print(f"[bench] wrote {path} ({n*12/1e9:.1f}GB) in "
          f"{time.perf_counter()-t0:.0f}s", file=sys.stderr)


def run_oocore():
    """BENCH_SOURCE=hdf5: stream a disk-backed HDF5 LARGER THAN HBM through
    the chunked H2D pipeline — the engine's out-of-core identity claim
    (reference README.md:33-38).  Default 1.75e9 rows x 3 f32 = 21GB vs
    16GB HBM, so the HBM column cache evicts under pressure.  The OS page
    cache (125GB host RAM) stays warm across repeats: this measures the
    host->HBM pipeline + compute overlap, not disk."""
    n = int(os.environ.get("BENCH_ROWS", int(1.75e9)))
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    path = _oocore_path(n)
    if not os.path.exists(path):
        _make_oocore_file(path, n)

    import vaex_tpu as vaex

    df = vaex.open(path)
    ex = df.executor
    limits = [[-3.0, 3.0], [-3.0, 3.0]]

    def run():
        t0 = time.perf_counter()
        mean = df.mean("E", binby=["x", "y"], limits=limits, shape=256)
        return time.perf_counter() - t0, mean

    warm_t0 = time.perf_counter()
    run()  # compile
    warm = time.perf_counter() - warm_t0
    times, h2d = [], []
    for _ in range(repeats):
        ex.pass_log.clear()
        dt, _ = run()
        times.append(dt)
        h2d.append(sum(p.get("bytes_h2d", 0) for p in ex.pass_log))
    best = min(times)
    bytes_h2d = h2d[int(np.argmin(times))]
    rows_per_s = n / best
    # overlap: pure-H2D lower bound at the measured link rate vs wall
    link = float(os.environ.get("BENCH_H2D_GBPS", 0)) or None
    print(f"[bench] oocore n={n} file={n*12/1e9:.1f}GB wall={best:.1f}s "
          f"({rows_per_s/1e6:.0f}M rows/s) h2d={bytes_h2d/1e9:.1f}GB "
          f"warmup={warm:.1f}s", file=sys.stderr)
    if link:
        t_h2d = bytes_h2d / (link * 1e9)
        print(f"[bench] oocore h2d lower bound at {link}GB/s = {t_h2d:.1f}s; "
              f"overlap efficiency = {t_h2d/best:.0%} of wall is pure H2D",
              file=sys.stderr)
    result = {
        "metric": "oocore_2d_binned_mean_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / BASELINE_ROWS_PER_S,
    }
    print(json.dumps(result))
    return result


def main():
    _claim_devices_or_die()
    if os.environ.get("BENCH_SOURCE") == "hdf5":
        return run_oocore()
    # 768M rows (9GB of f32 device columns in 16GB HBM — fits since the
    # executor stopped double-caching slices of device-resident columns):
    # large enough that the tunnel's fixed per-query cost (~40ms ≈ one
    # result-fetch RTT that production hardware doesn't pay) is <4% of the
    # pass; the marginal rate is reported alongside.  The marginal rate is
    # chunking-invariant (r3: 8M chunks vs one monolithic chunk within 1%):
    # the flat-cell MXU kernel is the wall.
    n = int(os.environ.get("BENCH_ROWS", 768 * 1024 * 1024))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    import vaex_tpu as vaex
    from vaex_tpu import settings

    # float32 columns generated ON DEVICE (jax.Array columns are first-class
    # in this engine): 768M rows x 3 cols = 9GB stays in HBM, skipping both
    # host-side generation (which pays this sandbox's ~0.4ms/4KB first-touch
    # page faults — minutes at this size) and the ~1GB/s tunnel H2D.  The
    # timed query path is identical to host-backed columns once the HBM
    # column cache is warm, which the old 128M host-numpy bench also relied
    # on; counts stay exact (int accumulation), sum error measured below.
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

    payload = settings.compute.pallas_payload
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
        f"[bench] mode={payload}  warmup(compile+H2D)={warm:.1f}s  "
        f"t({n})={best*1e3:.0f}ms  t({n_small})={t_small*1e3:.0f}ms  "
        f"fixed~{fixed*1e3:.0f}ms  marginal~{1/marginal/1e6:.0f}M rows/s",
        file=sys.stderr,
    )

    if os.environ.get("BENCH_COMPANIONS", "1") == "1":
        # companion numbers at n/8 (compile time dominates; rates reported
        # as marginal-free wall rates at that size)
        mean_head = np.asarray(run(n_small)[1])
        comps = {}
        grids = {}
        try:
            old_payload = settings.compute.pallas_payload
            settings.compute.pallas_payload = "i24"
            run(n_small)
            comps["i24"] = min(run(n_small)[0] for _ in range(2))
            grids["i24"] = np.asarray(run(n_small)[1])
            settings.compute.pallas_payload = old_payload

            old_prec = settings.compute.precision
            settings.compute.precision = "float64"
            run(n_small)
            comps["float64-parity"] = min(run(n_small)[0] for _ in range(2))
            grids["f64"] = np.asarray(run(n_small)[1])
            settings.compute.precision = old_prec
        except Exception as e:  # pragma: no cover - companions are advisory
            print(f"[bench] companion modes failed: {e!r}", file=sys.stderr)
        for name, t in comps.items():
            print(f"[bench] companion {name}: t({n_small})={t*1e3:.0f}ms "
                  f"({n_small/t/1e6:.0f}M rows/s wall at n/8)", file=sys.stderr)
        if "i24" in grids:
            # auto/i8sr vs i24 share IDENTICAL f32 bin arithmetic, so this
            # diff isolates the stochastic-rounding payload error (i24's own
            # bound is ~5e-7)
            ref = grids["i24"]
            scale = np.nanmax(np.abs(ref))
            err = np.nanmax(np.abs(mean_head - ref)) / scale
            print(f"[bench] accuracy mode={payload}: max|mean-mean_i24| "
                  f"/ max|mean| = {err:.2e}", file=sys.stderr)
            # analytic bound for the default mode: SD(sum) <=
            # (halfrange/125)*sqrt(n_cell/6) (pallas_gridagg.sr_error_sd) —
            # per-cell mean error <= 6*SD/n_cell at 6-sigma
            try:
                from vaex_tpu.ops.pallas_gridagg import sr_error_sd
                d_small = df[:n_small]
                cnt = np.asarray(d_small.count(binby=["x", "y"],
                                               limits=limits, shape=256))
                e_arr = np.asarray(d_small.minmax("E"))
                half = (e_arr[1] - e_arr[0]) / 2
                with np.errstate(divide="ignore", invalid="ignore"):
                    mean_bound = 6 * sr_error_sd(cnt, half) / np.maximum(cnt, 1)
                obs = np.abs(mean_head - ref)
                ok = np.nanmax(np.where(cnt > 0, obs - mean_bound, 0)) <= scale * 1e-6
                print(f"[bench] sr analytic 6-sigma mean-error bound: "
                      f"max={np.nanmax(mean_bound[cnt > 0]):.2e} "
                      f"(observed within bound: {bool(ok)})", file=sys.stderr)
            except Exception as e:  # pragma: no cover
                print(f"[bench] sr bound print failed: {e!r}", file=sys.stderr)
        if "f64" in grids and "i24" in grids:
            # mixed-precision bins in f32 (documented: BinnerScalar.to_bins),
            # so vs float64 a handful of boundary rows land one bin over —
            # at sparse cells that dominates a max metric; report max and a
            # boundary-insensitive median
            d = np.abs(grids["i24"] - grids["f64"])
            scale = np.nanmax(np.abs(grids["f64"]))
            print(f"[bench] mixed-vs-float64 (incl. f32-bin boundary rows): "
                  f"max={np.nanmax(d)/scale:.2e} "
                  f"median={np.nanmedian(d[np.isfinite(d)])/scale:.2e}",
                  file=sys.stderr)

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
