#!/usr/bin/env python3
"""Assemble the round-11 scale-evidence artifacts from a completed
tools/run_ladder_r11.sh output directory (/tmp/ladder_r11):

  BENCH_SCALING_r11.json  — scaling_report over the COLD-mode
                            sf0.1/1/10 rungs + a solo-adjudication
                            section (suite-vs-solo pairs for the r10
                            superlinear family and q01) + per-rung
                            memo_hits (which queries still reuse a
                            warm within-run memo under COLD=1)
  EMB_SCALE_r11.json      — the dim-64 and dim-256 EmbScale probes
                            merged under one roof
  BENCH_SOLO_r11.json     — the write-family suite/solo pairs at
                            sf0.1 (r9 prescription #5, finally in a
                            committed artifact the driver's own bench
                            run cannot clobber)

Adjudication prose is added by the builder after reading the numbers;
this script only assembles measurements.
"""
import json
import os
import subprocess
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ladder_r11"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(name):
    with open(os.path.join(SRC, name)) as f:
        return json.load(f)


def solo_time(name, query):
    try:
        return load(name)["queries"][query]
    except Exception:
        return None


def main():
    # 1. the ladder itself, via the existing reporter. The sf0.1 BASE
    # rung is the GENERATED corpus (same GenData layout family as
    # sf1/sf10 — constant-size files, so scan parallelism scales with
    # data); the SHIPPED sf0.1 corpus (single-file tables, 1-wide
    # scans) is recorded alongside but kept out of the ratios: a
    # layout change across a rung pair measures the layout, not the
    # operator (exactly the q01 sf0.1->sf1 11.9x confusion of r10).
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_report.py"),
         os.path.join(SRC, "scaling_base.json"),
         f"sf0.1={SRC}/bench_sf01gen.json",
         f"sf1={SRC}/bench_sf1.json",
         f"sf10={SRC}/bench_sf10.json"],
        check=True)
    doc = json.load(open(os.path.join(SRC, "scaling_base.json")))
    shipped = load("bench_sf01.json")
    doc["shipped_sf01"] = {
        "what": ("driver corpus (/root/testdata/sf0.1, single-file "
                 "tables), cold memo mode — the corpus the per-round "
                 "driver bench runs on; not a ladder rung because its "
                 "layout family differs from GenData's"),
        "total_sec": shipped["value"],
        "n_queries": shipped["n_queries"],
        "failed": shipped["failed"],
    }

    # memo_hits per rung: COLD=1 zeroes cross-query warmth, so any
    # remaining hits are within-query multi-leg reuse (legit)
    doc["memo_hits"] = {
        sf: load(f"bench_{tag}.json").get("memo_hits", {})
        for sf, tag in (("sf0.1", "sf01gen"), ("sf1", "sf1"),
                        ("sf10", "sf10"))}

    # solo adjudication pairs at sf10 (fresh JVM each, clean disk)
    sf10 = load("bench_sf10.json")["queries"]
    solo = {}
    for q in ["ch_final_write", "ch_collapsing_mt", "ch_quantile_disc",
              "src_jdbc", "txt_quality", "ch_equidepth",
              "q01_pricing_summary"]:
        t = solo_time(f"solo_sf10_{q}.json", q)
        if t is not None:
            solo[q] = {"suite": sf10.get(q), "solo": t}
    doc["solo_sf10"] = solo
    q01sf1 = solo_time("solo_sf1_q01.json", "q01_pricing_summary")
    if q01sf1 is not None:
        doc["solo_sf1_q01"] = q01sf1
    doc["adjudication"] = {}  # builder fills per-query sentences

    with open(os.path.join(REPO, "BENCH_SCALING_r11.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print("BENCH_SCALING_r11.json:", doc["totals_sec"], doc["failed"])

    # 2. EmbScale merge
    d64 = load("embscale_d64.json")
    d64["what"] = (
        "dim-64 shipped-construction corpora (sf0.01/0.1 = the driver "
        "testdata, sf1 = GenData default). Random-pair cosine mass "
        "sits near the 0.45 threshold, so the exact >=0.45 pair set "
        "grows ~n^2 (the r7-adjudicated output-bound regime) and "
        "srp_recall_vs_exact is measured against that near-threshold "
        "mass — far BELOW the SRP banding's 0.87 contract point, "
        "hence the low values: they quantify why dim-64 is the wrong "
        "regime for banded LSH, which is the dim256 section's point.")
    emb = {
        "what": ("Embedding near-dup + serving scaling at r11 HEAD "
                 "(auto-banded SRP). dim64 = the shipped-corpus "
                 "construction (true pairs grow ~n^2 — the documented "
                 "output-bound regime, measured to sf1). dim256 = the "
                 "measurable construction (~0.5% planted clones, true "
                 "pairs ~n) to sf10 (200k rows) — the rung that failed "
                 "r10. Each probe best-of-2, local[32]."),
        "dim64": d64,
        "dim256": load("embscale_d256.json"),
    }
    with open(os.path.join(REPO, "EMB_SCALE_r11.json"), "w") as f:
        json.dump(emb, f, indent=1)
    print("EMB_SCALE_r11.json: dim256 keys:",
          [k for k in emb["dim256"] if k != "what"])

    # 3. write-family solo pairs at sf0.1
    sf01 = load("bench_sf01.json")["queries"]
    ws = {}
    for q in ["sink_update_mutation", "sink_delete_mutation",
              "sink_dynamic_overwrite"]:
        t = solo_time(f"solo_sf01_{q}.json", q)
        if t is not None:
            ws[q] = {"suite": sf01.get(q), "solo": t}
    out = {
        "what": ("Suite-vs-solo wall times, sf0.1 shipped corpus, "
                 "COLD memo mode, fresh JVM per solo run (a solo run "
                 "pays JIT/page-cache/codegen warmup a suite neighbor "
                 "pre-paid — the r10 anomaly was the copy-on-write "
                 "write family running 1.5-2.5x slower solo)."),
        "pairs": ws,
        "adjudication": "",  # builder fills after reading the numbers
    }
    with open(os.path.join(REPO, "BENCH_SOLO_r11.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("BENCH_SOLO_r11.json:", ws)


if __name__ == "__main__":
    main()
