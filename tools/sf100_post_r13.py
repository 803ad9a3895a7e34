#!/usr/bin/env python3
"""Fold the r13 flagship ladder into BENCH_SCALING_r13.json.

Inputs (all under /tmp/ladder_r13):
  sf{1,10,100}.json       the 14-query suite rungs (fresh JVM, cold,
                          quiet-gated, 320 shuffle partitions)
  fix_*.json              solo re-measures (tools/run_sf100_fix_r13.sh)
                          for the rows the rung failed or measured
                          under a defect that got FIXED in-round —
                          each entry below carries its adjudication

Per-entry adjudication is IN the artifact (the r12 convention): each
query carries its two decade ratios and a verdict bucket —
  ~linear      ratio <= 14x/decade (the measured data-linear band for
               scan/shuffle-dominated plans at fixed partitions)
  sublinear    ratio < 6x (index/memo effects or output-bound)
  superlinear  ratio > 14x (named for follow-up, with the round's
               adjudication notes)
Rows with a rung failure or an in-round fix additionally carry the
diagnosis and what replaced the failing plan — the ladder's whole
point is to surface these, so they are first-class findings, never
silent omissions. Fails hard on any contended rung or any failure
without an adjudication.
"""
import json
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_r13.json"
LADDER = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ladder_r13"

# query -> ({sf: fix-file}, adjudication). Fix values OVERRIDE the
# main-rung values for that query at those rungs.
ADJUDICATED = {
    "ann_knn_join": (
        {1: "fix_knn_sf1", 10: "fix_knn_sf10", 100: "fix_knn_sf100"},
        "rung failure (sf100, both samples): the per-cell window "
        "top-k SORTED the ~1.1e10-row candidate stream per partition "
        "(~300 GB > the host's 57 GB free) — the defect the decade "
        "existed to surface. Fixed in-round: top-k is a bounded-heap "
        "selection aggregate (graft.functions.TopK, O(k) state) whose "
        "partials consume candidates inside the join stage, so "
        "nothing candidate-sized is sorted, shuffled, or spilled; "
        "AnnSpec pins TopK == window equality. All three rungs are "
        "solo fresh-JVM re-measures of the fixed path. Its decade "
        "ratio is the DESIGNED exponent, not a defect: the cell-keyed "
        "self-kNN join does n*nprobe*n/cells work with cells ~ "
        "sqrt(n), i.e. n^1.5 — 10^1.5 ~ 31.6x per decade by "
        "construction (plus KMeans training growth)"),
    "dedup_embedding_srp": (
        {1: "fix_srp_sf1", 10: "fix_srp_sf10", 100: "fix_srp_sf100"},
        "rung failure (sf100; reproduced solo): the (band, s) window "
        "bookkeeping + self-join sorted the 236M-row signature set "
        "three times, and the exact-verify fetch attached 2 KB "
        "vectors to the candidate stream before a second shuffle "
        "(~230 GB at 2M rows) — ~59 GB of spill filled the disk. "
        "Fixed in-round: candidates come from ONE aggregation "
        "(collect-per-bucket, pairs emitted inside the sorted member "
        "array — same pair set, chain cap included), and the verify "
        "broadcasts the packed vectors under a budget "
        "(spark.graft.srp.verifyBroadcastBytes) and filters "
        "candidates in place; past the budget the shuffle-hash fetch "
        "shape a multi-node cluster's distributed disk absorbs. "
        "AnnSpec pins the two verify paths pair-identical. All three "
        "rungs are solo fresh-JVM re-measures of the fixed path"),
    "graph_pagerank": (
        {100: "fix_pagerank_sf100"},
        "rung failure (sf100): the plan is unchanged — disk-full from "
        "DEAD state: shuffle files and stale localCheckpoint blocks "
        "are deleted only when their owning objects are garbage-"
        "collected, and the 48 GB bench heap never GC'd, so ~54 GB "
        "of dead superstep output accumulated (plus sibling-query "
        "spill in the shared rung JVM). Fixed in-round: Bench sets "
        "spark.cleaner.periodicGC.interval=1min and every checkpoint "
        "loop unpersists its dead predecessor explicitly (shim "
        "reaching the internal checkpointed RDD). sf100 is the solo "
        "re-measure under the fix; sf1/sf10 stand from the main rung"),
    "q01_pricing_summary": (
        {100: "fix_q01_sf100"},
        "no rung failure, but its sample ran 12th in the shared JVM "
        "immediately after the knn/srp disk-full failures (page "
        "cache polluted, disk ~full) and read 20.9x across the "
        "sf10->sf100 decade for a one-scan two-phase aggregate; the "
        "sf100 value is the solo clean-host re-measure adjudicating "
        "that reading"),
    "ch_quantile_disc": (
        {1: "fix_rank_sf1", 10: "fix_rank_sf10", 100: "fix_rank_sf100"},
        "no rung failure, but ~14.5x across the sf10->sf100 decade "
        "exposed the 5-key partitionBy window: every group sorted in "
        "ONE task while 315 partitions idled — a parallelism ceiling "
        "that caps ANY cluster at #groups cores. Re-engineered "
        "in-round to distributed rank selection "
        "(graft.plans.RankSelect: range-partitioned prefix sum over "
        "the value distribution, no WindowExec in the plan — "
        "PrefixSumSpec pins plan + equality). All three rungs are "
        "re-measures of the new plan"),
    "ch_equidepth": (
        {1: "fix_rank_sf1", 10: "fix_rank_sf10", 100: "fix_rank_sf100"},
        "same defect and fix as ch_quantile_disc: ntile's buckets are "
        "fixed rank intervals, so count/lo/hi come from rank "
        "selection over the distributed cumulative distribution — "
        "no per-group ntile sort, no WindowExec. All three rungs are "
        "re-measures of the new plan"),
}

# rows whose super-linear decade ratio is the operator's DESIGNED
# complexity exponent, not a surfaced defect — noted in-artifact so
# the superlinear list reads as adjudicated, not unexplained
DESIGN_NOTES = {
    "dedup_embedding_srp": (
        "designed n x bands growth: auto-banding holds the recall "
        "contract under the 64/n false-positive budget, so rows-per-"
        "band grows with log n and bands grow 57 (200k rows) -> 118 "
        "(2M) — signature volume n*b grows ~20.7x per decade by "
        "construction while candidates/row stay flat "
        "(EMB_SCALE_r12.json pins 0.0048-0.0050 pairs/row across the "
        "ladder)"),
    "dedup_semantic": (
        "designed n^1.5: SemDeDup confines pairwise work to trained "
        "cells sized cells ~ sqrt(n), so per-decade cost is 10^1.5 ~ "
        "31.6x by construction (plus KMeans training growth); the "
        "alternative — global pairwise — is n^2. Cross-cell recall "
        "is pinned in DedupSpec"),
}

def load(path):
    with open(path) as f:
        d = json.load(f)
    env = d.get("env", {})
    assert not env.get("contended"), f"{path} ran contended: {env}"
    return d

rungs = {sf: load(f"{LADDER}/sf{sf}.json") for sf in (1, 10, 100)}
for sf in (1, 10, 100):
    for q in rungs[sf].get("failed") or []:
        assert q in ADJUDICATED, f"unadjudicated sf{sf} failure: {q}"

# fix re-measures: {query: {sf: seconds}}
fixes, fix_env = {}, {}
for q, (files, _) in ADJUDICATED.items():
    fixes[q] = {}
    for sf, stem in files.items():
        d = load(f"{LADDER}/{stem}.json")
        assert not d.get("failed"), f"{stem} failed: {d['failed']}"
        fixes[q][sf] = d["queries"][q]
        fix_env[stem] = d.get("env")

queries = sorted(rungs[1]["queries"])
entries = {}
for q in queries:
    t = {sf: rungs[sf]["queries"].get(q) for sf in (1, 10, 100)}
    note = None
    if q in ADJUDICATED:
        t.update(fixes[q])          # fix/solo values override
        note = ADJUDICATED[q][1]
    r1 = round(t[10] / t[1], 2) if t[1] and t[10] else None
    r2 = round(t[100] / t[10], 2) if t[10] and t[100] else None
    worst = max(x for x in (r1, r2) if x is not None)
    verdict = ("sublinear" if worst < 6 else
               "~linear" if worst <= 14 else "superlinear")
    e = {"sf1_sec": round(t[1], 2), "sf10_sec": round(t[10], 2),
         "sf100_sec": round(t[100], 2), "ratio_1_10": r1,
         "ratio_10_100": r2, "verdict": verdict}
    if note:
        e["adjudication"] = note
    if q in DESIGN_NOTES:
        e["design_note"] = DESIGN_NOTES[q]
    entries[q] = e

doc = {
    "metric": "flagship_scale_ladder_sf1_sf10_sf100",
    "settings": {
        "cold": True, "shuffle_partitions": 320, "emb_dim": 256,
        "fresh_jvm_per_rung": True, "require_quiet": True,
        "env": {f"sf{sf}": rungs[sf].get("env") for sf in (1, 10, 100)},
        "fix_env": fix_env,
    },
    # suite totals are the MAIN rungs' (sf100's covers its 11 clean
    # queries; the adjudicated rows' sf100 costs are per-entry)
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
