#!/usr/bin/env python3
"""Min-merge N solo Bench records into one definitive BENCH_full.json.

Usage: python3 tools/minmerge.py OUT RUN1.json RUN2.json [RUN3.json ...]

Per query, takes the MIN across every run's `queries_min` (the
least-noise statistic on a shared sandbox) and the MEDIAN-of-medians for
`queries`; totals are recomputed from the merged maps. Run markers
(loadavg, wall, iters) of every input are kept under `run_markers` so
the record stays attributable.
"""
import json, statistics, sys

out, paths = sys.argv[1], sys.argv[2:]
runs = [json.load(open(p)) for p in paths]
# ADVICE r14: refuse to min-merge records with different `queries_min`
# semantics (pre-r14 records fold the warm run into queries_min; r14+
# records are timed-only) — a silent mix would produce a mixed-basis
# min_total stamped with runs[0]'s basis.
bases = {r.get("min_basis", "<pre-r14 warm-folded>") for r in runs}
assert len(bases) == 1, (
    f"refusing to merge mixed min_basis records: {sorted(bases)} — "
    "normalize older records (use queries_min_warm) before merging")
names = sorted(set().union(*[r["queries"].keys() for r in runs]))
qmed, qmin = {}, {}
qminw = {}
for n in names:
    meds = [r["queries"][n] for r in runs if r["queries"].get(n, -1) >= 0]
    mins = [r["queries_min"][n] for r in runs if r["queries_min"].get(n, -1) >= 0]
    # warm-inclusive mins (reported under their own key since r14 so the
    # timed-only min stays comparable round over round)
    warms = [r["queries_min_warm"][n] for r in runs
             if r.get("queries_min_warm", {}).get(n, -1) >= 0]
    qmed[n] = statistics.median(meds) if meds else -1.0
    qmin[n] = min(mins) if mins else -1.0
    qminw[n] = min(warms) if warms else -1.0
failed = sorted(set().union(*[set(r.get("failed", [])) for r in runs]))
rec = {
    "metric": "total",
    "value": sum(v for v in qmed.values() if v >= 0),
    "unit": "sec",
    "min_total": sum(v for v in qmin.values() if v >= 0),
    "queries": qmed,
    "queries_min": qmin,
    "queries_min_warm": qminw,
    "min_total_warm": sum(v for v in qminw.values() if v >= 0),
    "min_basis": runs[0].get("min_basis", ""),
    "sf": runs[0]["sf"],
    "iters": runs[0]["iters"],
    "iter_policy": runs[0].get("iter_policy", ""),
    "runs_merged": len(runs),
    "master": runs[0]["master"],
    "shuffle_partitions": runs[0]["shuffle_partitions"],
    "failed": failed,
    "run_markers": [
        {k: r.get(k) for k in
         ("loadavg_before", "loadavg_after", "bench_wall_sec", "iters")}
        for r in runs],
}
json.dump(rec, open(out, "w"))
print(f"merged {len(runs)} runs -> {out}: min_total="
      f"{rec['min_total']:.1f}s median_total={rec['value']:.1f}s failed={failed}")
