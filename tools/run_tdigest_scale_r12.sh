#!/bin/sh
# Scale rung for round 12's new sketch: ch_quantile_tdigest's benchFn
# (sketch-only production plan — one partial-agg shuffle of
# O(compression) states) across an sf1 -> sf10 lineitem decade.
# Expectation: ~data-linear (the state is bounded, the scan dominates);
# a superlinear decade would mean the buffer/compress amortization
# broke. Output: TDIGEST_SCALE_r12.json.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/tdigest_r12
mkdir -p "$OUT"
export SPARK_GRAFT_COLD=1

[ -d "$G/td_sf1" ] || sbt -batch "runMain graft.tools.GenData 1 $G/td_sf1 64 lineitem"
[ -d "$G/td_sf10" ] || sbt -batch "runMain graft.tools.GenData 10 $G/td_sf10 64 lineitem"

SPARK_GRAFT_SF_DIR=$G/td_sf1 \
  sbt -batch "runMain graft.Bench $OUT/sf1.json ch_quantile_tdigest"
SPARK_GRAFT_SF_DIR=$G/td_sf10 \
  sbt -batch "runMain graft.Bench $OUT/sf10.json ch_quantile_tdigest"

python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
s1 = json.load(open(f"{out}/sf1.json"))["queries"]["ch_quantile_tdigest"]
s10 = json.load(open(f"{out}/sf10.json"))["queries"]["ch_quantile_tdigest"]
doc = {
    "what": ("ch_quantile_tdigest benchFn (sketch-only: one scan + one "
             "partial/final ObjectHashAggregate of O(compression) mergeable "
             "states) across a lineitem decade, GenData corpora "
             "(sf1=600k rows, sf10=6M), fresh-JVM cold best-of-2."),
    "sf1_sec": round(s1, 3),
    "sf10_sec": round(s10, 3),
    "decade_ratio": round(s10 / s1, 2),
    "verdict": ("data-linear: bounded sketch state, scan-dominated"
                if s10 / s1 <= 12.0 else
                "superlinear - buffer/compress amortization suspect"),
}
with open("TDIGEST_SCALE_r12.json", "w") as f:
    json.dump(doc, f, indent=1)
print(json.dumps(doc))
EOF
rm -rf "$G/td_sf1" "$G/td_sf10"
