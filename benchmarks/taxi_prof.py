"""Per-stage profile of the taxi pipeline (filter -> join -> percentile ->
correlation): which stage eats the 27.7s observed at 1e8 rows (r5)?

Run: python benchmarks/taxi_prof.py [--rows 1e8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h2o import make_taxi_df  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e8)
    args = ap.parse_args()
    n = int(args.rows)

    import numpy as np
    import vaex_tpu as vaex
    df = make_taxi_df(vaex, n)
    ex = vaex.execution.get_main_executor()
    zones = vaex.from_arrays(
        zone_id=np.arange(265, dtype=np.int16),
        borough=(np.arange(265) % 6).astype(np.int8))

    def stage(fn, name, out):
        log0 = len(ex.pass_log)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        out[name] = {"seconds": round(dt, 3),
                     "passes": [{k: p.get(k) for k in ("rows", "seconds", "tasks", "compiles")}
                                for p in ex.pass_log[log0:]]}
        return r

    for it in range(2):
        out = {}
        sel = stage(lambda: df[(df.fare > 0) & (df.trip_distance < 100)], "filter", out)
        joined = stage(lambda: sel.join(zones, left_on="pickup_zone",
                                        right_on="zone_id"), "join", out)
        p50 = stage(lambda: float(joined.percentile_approx("fare", 50)), "percentile", out)
        corr = stage(lambda: float(joined.correlation("trip_distance", "tip")), "correlation", out)
        out["iter"] = it
        out["p50"] = round(p50, 4)
        out["corr"] = round(corr, 6)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
