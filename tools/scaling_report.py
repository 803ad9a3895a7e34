#!/usr/bin/env python3
"""Build BENCH_SCALING_r{N}.json from per-SF bench_out files.

Usage: python3 tools/scaling_report.py <out.json> <sf>=<bench.json> ...

e.g.  scaling_report.py BENCH_SCALING_r7.json \
          sf0.01=/tmp/a.json sf0.1=/tmp/b.json sf1=/tmp/c.json sf10=/tmp/d.json

SF points are treated as a ladder in the order given; a ratio section
is emitted for each consecutive pair over the queries both runs
measured (deeper decades may bench a curated subset of the most
expensive queries — the ratio set shrinks accordingly and
n_queries_measured records it). The headline statistic is the
per-query wall-time ratio across each 10x data step: 10.0 = linear in
data, < 10 = overhead-amortized, > 10 = super-linear (a scale cliff).
Queries are measured best-of-2 by graft.Bench on the same local[32]
harness.
"""
import json, statistics, sys


def load(p):
    d = json.load(open(p))
    return d, d["queries"]


def ratios(lo, hi):
    common = sorted(k for k in hi if k in lo)
    if not common:
        sys.exit("scaling_report: adjacent SF points share no measured "
                 "queries — cannot form a ratio section (check the "
                 "bench subset passed at the deeper decade)")
    dropped = sorted(k for k in common if lo[k] <= 0)
    if dropped:
        print(f"note: {len(dropped)} zero-time queries dropped from "
              f"ratios: {dropped}")
    r = {k: round(hi[k] / lo[k], 2) for k in common if lo[k] > 0}
    if not r:
        sys.exit("scaling_report: every shared query had zero time at "
                 "the shallower SF — no ratios computable")
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
    out = sys.argv[1]
    points = []
    for arg in sys.argv[2:]:
        sf, path = arg.split("=", 1)
        points.append((sf, *load(path)))
    doc = {
        "what": ("Bench suite at GENERATED scale factors (tools/GenData — "
                 "same-shape corpus; the shipped testdata tops out at "
                 "sf0.1), local[32], best-of-2 per query. Each 10x-data "
                 "ratio: 10.0 = data-linear, <10 = overhead-amortized, "
                 ">10 = super-linear (scale cliff). Decades past sf1 bench "
                 "the most expensive query subset, not the full suite."),
        "totals_sec": {sf: d["value"] for sf, d, _ in points},
        "n_queries": {sf: d["n_queries"] for sf, d, _ in points},
        "failed": {sf: d["failed"] for sf, d, _ in points},
        "env": {sf: d.get("env") for sf, d, _ in points},
    }
    for (sfa, _, qa), (sfb, _, qb) in zip(points, points[1:]):
        r, s = ratios(qa, qb)
        key = f"ratio_{sfb}_over_{sfa}".replace(".", "")
        doc[key] = s
        doc[f"per_query_{key}"] = dict(sorted(r.items()))
        print(f"10x step {sfa} -> {sfb}:",
              {k: s[k] for k in ("median", "max", "n_superlinear")},
              s["superlinear"])
    json.dump(doc, open(out, "w"), indent=1)
    print("totals:", doc["totals_sec"])


if __name__ == "__main__":
    main()
