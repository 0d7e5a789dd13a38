"""Assemble benchmarks/results_r5.jsonl from the round-5 measurement files.

Usage: python benchmarks/assemble_r5.py /tmp/r5_final_warm.jsonl [/tmp/r5_cold.jsonl ...]

Adds a `note` field describing the configuration to every row and sorts
rows by name for a stable file.  Existing rows whose name collides are
replaced by the newest input.
"""
import json
import os
import sys

NOTES = {
    "h2o_q1": "groupby id1(int8,100-card) sum v1",
    "h2o_q2": "groupby id1,id2 (aliased) sum v1",
    "h2o_q3": "groupby id3(int32,1M-card) sum v1 + mean v3",
    "h2o_q4": "groupby id4(alias of id1) mean v1,v2,v3",
    "h2o_q5": "groupby id6(alias of id3) sum v1,v2,v3",
    "h2o_q7": "groupby id3 max v1 - min v2 (1M-card)",
    "h2o_q10": "groupby 6 keys (aliased: (id1,id3) pairs, ~63M groups) sum v3 + count",
    "taxi_pipeline": "filter -> join(265 zones) -> percentile_approx -> correlation",
    "big_isin": "count(isin 4 keys) on 1e9-row i32 device column",
    "big_unique": "unique on 1e9-row i32 device column (1000 keys)",
    "big_value_counts": "value_counts on 1e9-row i32 device column",
    "big_sort": "sort 1e9-row i32 device column (lazy take result)",
}
SUFFIX_NOTES = {"_cold": " [COLD: HBM cache cleared per iteration, mmap->H2D->compute]",
                "_disk": " [disk-backed hdf5 source, warm HBM]"}

ENV = "tunneled v5e (1 chip; link ~35MB/s each way), warm unless noted, best-of-N"


def main():
    rows = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                r = json.loads(line)
                base = r["name"]
                note = ""
                for suf, extra in SUFFIX_NOTES.items():
                    if base.endswith(suf):
                        base = base[: -len(suf)]
                        note = extra
                r["note"] = NOTES.get(base, "") + note
                rows[r["name"]] = r
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results_r5.jsonl")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    if "name" in r:
                        existing[r["name"]] = r
    existing.update(rows)
    with open(out, "w") as f:
        f.write(json.dumps({"env": ENV}) + "\n")
        for name in sorted(k for k in existing if k != "env"):
            if name == "env":
                continue
            f.write(json.dumps(existing[name]) + "\n")
    print(f"wrote {out} ({len(existing)} rows)")


if __name__ == "__main__":
    main()
