#!/usr/bin/env python3
"""Assemble BAND_ADJUDICATION_r12.json from tools/run_band_r12.sh's
per-rung bench outputs: per query, the sf1->sf10 decade ratio at fixed
32 shuffle partitions vs at input-scaled 320, plus the mechanical
verdict (band flattens => partition-size growth; persists => real
cliff needing a fix)."""
import json
import sys

out_dir, dest = sys.argv[1], sys.argv[2]


def load(name):
    with open(f"{out_dir}/{name}.json") as f:
        return json.load(f)


sf1 = load("sf1_p32")["queries"]
p32 = load("sf10_p32")["queries"]
p320 = load("sf10_p320")["queries"]

entries = {}
for q in sorted(sf1):
    r_fixed = p32[q] / sf1[q]
    r_scaled = p320[q] / sf1[q]
    # three distinguishable outcomes for a 10x data decade:
    #  - ~10x at BOTH partition settings: the operator is data-linear
    #    and the r11 band (11.7-14.1x, measured inside the full-suite
    #    ladder) was measurement context, not a mechanism
    #  - fixed >> scaled: per-partition-size growth was the mechanism
    #  - >>10x at both: a real operator cliff needing a named fix
    if r_fixed <= 12.0 and r_scaled <= 12.0:
        verdict = (
            "data-linear (~10x per 10x decade) at BOTH partition "
            "settings - the r11 band was full-suite measurement "
            "context, not a partition-size effect; no fix needed"
        )
    elif r_scaled <= 0.7 * r_fixed:
        verdict = (
            "partition-size growth confirmed: scaling shuffle "
            "partitions with input flattens the decade"
        )
    else:
        verdict = (
            "band persists under scaled partitions - real cliff, "
            "needs a named fix"
        )
    entries[q] = {
        "sf1_sec_p32": round(sf1[q], 3),
        "sf10_sec_p32": round(p32[q], 3),
        "sf10_sec_p320": round(p320[q], 3),
        "decade_ratio_fixed_parts": round(r_fixed, 2),
        "decade_ratio_scaled_parts": round(r_scaled, 2),
        "verdict": verdict,
    }

doc = {
    "what": (
        "Mechanized adjudication of the r11 ladder's 10-14x/decade band "
        "(ch_quantile_disc/ch_auc/ch_equidepth). All three are "
        "single-shuffle aggregations over orders; rungs are GenData "
        "orders-only corpora (sf1=1.5M rows, sf10=15M). Each cell is a "
        "fresh-JVM cold best-of-2 (graft.Bench, SPARK_GRAFT_COLD=1). "
        "The knob: spark.sql.shuffle.partitions fixed at 32 (the ladder "
        "config - bytes/partition grows 10x per decade) vs scaled to "
        "320 at sf10 (constant bytes/partition, what AQE advisory "
        "sizing does on a real cluster)."
    ),
    "queries": entries,
}
with open(dest, "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps(doc, indent=1))
