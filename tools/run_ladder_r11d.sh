#!/bin/sh
# CLEAN post-additions ladder at final r11 HEAD (264-op registry:
# ann_knn_join, dedup_semantic, ch_lttb, stream_cdc_upsert,
# src_iceberg_pos_delete all in the bench set; minhash/final_write
# fixes in the per-query table at last). Full-suite COLD bench at
# GENERATED sf0.1/1/10; rung corpora deleted before the next
# generates; NOTHING else may run on the host during this script —
# the first r11c attempt was discarded because concurrent builds
# contaminated its rungs (the r10 lesson, re-learned).
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/ladder_r11d
mkdir -p "$OUT" "$G"
export SPARK_GRAFT_COLD=1

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

step gen_sf01gen
sbt -batch "runMain graft.tools.GenData 0.1 $G/sf01gen"
step bench_sf01gen
SPARK_GRAFT_SF_DIR=$G/sf01gen sbt -batch "runMain graft.Bench $OUT/bench_sf01.json"
rm -rf "$G/sf01gen"

step gen_sf1
sbt -batch "runMain graft.tools.GenData 1 $G/sf1"
step bench_sf1
SPARK_GRAFT_SF_DIR=$G/sf1 sbt -batch "runMain graft.Bench $OUT/bench_sf1.json"
rm -rf "$G/sf1"

step gen_sf10
sbt -batch "runMain graft.tools.GenData 10 $G/sf10"
step bench_sf10
SPARK_GRAFT_SF_DIR=$G/sf10 sbt -batch "runMain graft.Bench $OUT/bench_sf10.json"
rm -rf "$G/sf10"
step done
