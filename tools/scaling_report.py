#!/usr/bin/env python3
"""Build BENCH_SCALING_r{N}.json from three per-SF bench_out files.

Usage: python3 tools/scaling_report.py <out.json> <sf001.json> <sf01.json> <sf1.json>

The headline statistic is the per-query wall-time ratio across each
10x data step: 10.0 = linear in data, < 10 = overhead-amortized,
> 10 = super-linear (a scale cliff). Queries are measured best-of-2
by graft.Bench on the same local[32] harness.
"""
import json, statistics, sys

def load(p):
    d = json.load(open(p))
    return d, d["queries"]

def ratios(lo, hi):
    r = {k: round(hi[k] / lo[k], 2) for k in hi if k in lo and lo[k] > 0}
    vals = sorted(r.values())
    return r, {
        "median": round(statistics.median(vals), 2),
        "max": max(vals),
        "n_queries_measured": len(vals),
        "n_superlinear": sum(1 for v in vals if v > 10.0),
        "superlinear": sorted([k for k, v in r.items() if v > 10.0]),
        "worst10": dict(sorted(r.items(), key=lambda kv: -kv[1])[:10]),
    }

def main():
    out, p001, p01, p1 = sys.argv[1:5]
    d001, q001 = load(p001)
    d01, q01 = load(p01)
    d1, q1 = load(p1)
    r01, s01 = ratios(q001, q01)
    r1, s1 = ratios(q01, q1)
    doc = {
        "what": ("Full bench suite at three GENERATED scale factors "
                 "(tools/GenData — same-shape corpus; the shipped testdata "
                 "tops out at sf0.1), local[32], best-of-2 per query. Each "
                 "10x-data ratio: 10.0 = data-linear, <10 = overhead-"
                 "amortized, >10 = super-linear (scale cliff)."),
        "totals_sec": {"sf0.01": d001["value"], "sf0.1": d01["value"],
                       "sf1": d1["value"]},
        "n_queries": {"sf0.01": d001["n_queries"], "sf0.1": d01["n_queries"],
                      "sf1": d1["n_queries"]},
        "failed": {"sf0.01": d001["failed"], "sf0.1": d01["failed"],
                   "sf1": d1["failed"]},
        "ratio_sf01_over_sf001": s01,
        "ratio_sf1_over_sf01": s1,
        "env": {"sf0.01": d001.get("env"), "sf0.1": d01.get("env"),
                "sf1": d1.get("env")},
        "per_query_ratio_sf1_over_sf01": dict(sorted(r1.items())),
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"sf0.01 {d001['value']}s  sf0.1 {d01['value']}s  sf1 {d1['value']}s")
    print("10x step sf0.01->sf0.1:", {k: s01[k] for k in
          ("median", "max", "n_superlinear")}, s01["superlinear"])
    print("10x step sf0.1 ->sf1  :", {k: s1[k] for k in
          ("median", "max", "n_superlinear")}, s1["superlinear"])

if __name__ == "__main__":
    main()
