"""Per-stage profile of h2o q1/q4 (VERDICT r4 weak #3): where does the
grouped pass lose >10x vs the 2.0B rows/s flat-cell kernel?

Stages timed separately:
  - grouper: df.groupby(...) construction (key discovery / binner setup)
  - agg: the aggregation pass(es) through the executor
  - materialize: building the result DataFrame + checksum fetch

Run: python benchmarks/h2o_prof.py [--rows 1e8] [--which q1,q4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from h2o import make_h2o_df  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=float, default=1e8)
    parser.add_argument("--which", default="q1,q4")
    args = parser.parse_args()
    n = int(args.rows)
    which = set(args.which.split(","))

    import vaex_tpu as vaex
    df = make_h2o_df(vaex, n)
    ex = vaex.execution.get_main_executor()

    specs = {
        "q1": (["id1"], {"v1": "sum"}),
        "q2": (["id1", "id2"], {"v1": "sum"}),
        "q3": (["id3"], {"v1": "sum", "v3": "mean"}),
        "q4": (["id4"], {"v1": "mean", "v2": "mean", "v3": "mean"}),
        "q5": (["id6"], {"v1": "sum", "v2": "sum", "v3": "sum"}),
    }
    for name in specs:
        if name not in which:
            continue
        keys, aggs = specs[name]
        # warm everything once
        res = df.groupby(keys, agg=aggs)
        float(res.sum(list(aggs)[0]))
        for _ in range(2):
            log0 = len(ex.pass_log)
            t0 = time.perf_counter()
            gb = df.groupby(keys)
            t1 = time.perf_counter()
            res = gb.agg(aggs)
            t2 = time.perf_counter()
            chk = float(res.sum(list(aggs)[0]))
            t3 = time.perf_counter()
            passes = ex.pass_log[log0:]
            print(json.dumps({
                "name": name, "rows": n,
                "grouper_s": round(t1 - t0, 4),
                "agg_s": round(t2 - t1, 4),
                "materialize_s": round(t3 - t2, 4),
                "total_s": round(t3 - t0, 4),
                "rows_per_s": round(n / (t3 - t0)),
                "passes": [{k: p[k] for k in ("rows", "seconds", "tasks", "compiles")}
                           for p in passes],
                "chk": chk,
            }), flush=True)


if __name__ == "__main__":
    main()
