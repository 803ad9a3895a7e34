#!/usr/bin/env python3
"""Fold /tmp/ladder_r13/sf{1,10,100}.json into BENCH_SCALING_r13.json.

Per-entry adjudication is IN the artifact (the r12 convention): each
query carries its two decade ratios and a verdict bucket —
  ~linear      ratio <= 14x/decade (the measured data-linear band for
               scan/shuffle-dominated plans at fixed partitions)
  sublinear    ratio < 6x (index/memo effects or output-bound)
  superlinear  ratio > 14x (named for follow-up, with the round's
               adjudication notes)
Fails hard if any rung was contended, or recorded a failure that is
not in ADJUDICATED_FAILURES (a failure the round already diagnosed
and fixed, carried in the artifact with its adjudication rather than
silently laundered — the ladder's whole point is to surface these).
"""
import json
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_r13.json"
LADDER = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ladder_r13"

# query -> (rung, adjudication) for failures the round diagnosed; the
# artifact records them as first-class findings, not omissions
ADJUDICATED_FAILURES = {
    "ann_knn_join": (100, (
        "both samples died spilling the window top-k's per-partition "
        "SORT of the ~1.1e10-row candidate stream (~300 GB > the "
        "host's 57 GB free) — the defect the decade existed to "
        "surface. Fixed in-round: the top-k is now a bounded-heap "
        "selection aggregate (graft.functions.TopK) whose partials "
        "consume candidates inside the join stage, so nothing "
        "candidate-sized is sorted, shuffled, or spilled; the fixed "
        "path's solo re-measure is KNN_SF100_FIX_r13.json")),
}

rungs = {}
for sf in (1, 10, 100):
    with open(f"{LADDER}/sf{sf}.json") as f:
        d = json.load(f)
    for q in d.get("failed") or []:
        adj = ADJUDICATED_FAILURES.get(q)
        assert adj and adj[0] == sf, f"unadjudicated sf{sf} failure: {q}"
    env = d.get("env", {})
    assert not env.get("contended"), f"sf{sf} bench ran contended: {env}"
    rungs[sf] = d

queries = sorted(rungs[1]["queries"])
entries = {}
for q in queries:
    t1, t10, t100 = (rungs[sf]["queries"].get(q) for sf in (1, 10, 100))
    r1 = round(t10 / t1, 2) if t1 and t10 else None
    r2 = round(t100 / t10, 2) if t10 and t100 else None
    if q in ADJUDICATED_FAILURES:
        entries[q] = {"sf1_sec": round(t1, 2) if t1 else None,
                      "sf10_sec": round(t10, 2) if t10 else None,
                      "sf100_sec": None, "ratio_1_10": r1,
                      "ratio_10_100": None, "verdict": "failed+fixed",
                      "adjudication": ADJUDICATED_FAILURES[q][1]}
        continue
    worst = max(x for x in (r1, r2) if x is not None)
    verdict = ("sublinear" if worst < 6 else
               "~linear" if worst <= 14 else "superlinear")
    entries[q] = {"sf1_sec": round(t1, 2), "sf10_sec": round(t10, 2),
                  "sf100_sec": round(t100, 2), "ratio_1_10": r1,
                  "ratio_10_100": r2, "verdict": verdict}

doc = {
    "metric": "flagship_scale_ladder_sf1_sf10_sf100",
    "settings": {
        "cold": True, "shuffle_partitions": 320, "emb_dim": 256,
        "fresh_jvm_per_rung": True, "require_quiet": True,
        "env": {f"sf{sf}": rungs[sf].get("env") for sf in (1, 10, 100)},
    },
    "totals_sec": {f"sf{sf}": round(rungs[sf]["value"], 1)
                   for sf in (1, 10, 100)},
    "queries": entries,
    "superlinear": sorted(q for q, e in entries.items()
                          if e["verdict"] == "superlinear"),
}
with open(OUT, "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps({"totals": doc["totals_sec"],
                  "superlinear": doc["superlinear"]}))
