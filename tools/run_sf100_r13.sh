#!/bin/sh
# Round-13 scale ladder, one decade past r11's: a ~15-query flagship
# subset (the r12 verdict's prescription #3 list: TPC-H heads, the
# write family's compactor, the sketch pair, the embedding family, CC,
# pagerank, and the band trio) measured COLD at sf1 -> sf10 -> sf100,
# identical settings per rung (dim-256 embeddings — the measurable
# near-dup construction; shuffle partitions input-scaled to 320;
# fresh-JVM per rung via tools/jrun.sh, so no sbt lock is held).
# Disk-managed: each rung is deleted before the next is generated
# (sf100 is ~17 GB; the host has ~79 GB free), df logged per step.
# SPARK_GRAFT_REQUIRE_QUIET=1: a contended start REFUSES the rung
# (exit 3) instead of committing a contaminated artifact — the r12
# lesson made structural.
#
# Output: /tmp/ladder_r13/sf{1,10,100}.json; post-processing into
# BENCH_SCALING_r13.json is tools/sf100_post_r13.py.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/ladder_r13
mkdir -p "$OUT" "$G"
export SPARK_GRAFT_COLD=1
export SPARK_GRAFT_REQUIRE_QUIET=1
export SPARK_GRAFT_SHUFFLE_PARTITIONS=320
QS="q01_pricing_summary q09_profit_by_nation_year ch_final_write \
ch_quantile_tdigest ch_quantile_tdigest_k1 dedup_embedding_srp \
dedup_semantic ann_knn_join dedup_clusters graph_pagerank sink_compact \
ch_quantile_disc ch_auc ch_equidepth"

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

for SF in 1 10 100; do
  case $SF in
    1) MEM=16g ;;
    10) MEM=24g ;;
    100) MEM=48g ;;
  esac
  step gen_sf$SF
  SPARK_DRIVER_MEM=$MEM tools/jrun.sh graft.tools.GenData $SF "$G/sf$SF" 256
  # load1m decays with a ~1-min time constant; after a 32-core
  # generation burst the contention gate would (correctly) refuse an
  # immediate bench — wait it out, then retry on a refusal (exit 3)
  step cooldown_sf$SF
  sleep 240
  step bench_sf$SF
  ATTEMPT=0
  until SPARK_DRIVER_MEM=$MEM SPARK_GRAFT_SF_DIR="$G/sf$SF" \
      tools/jrun.sh graft.Bench "$OUT/sf$SF.json" $QS; do
    RC=$?
    ATTEMPT=$((ATTEMPT + 1))
    [ "$RC" -eq 3 ] && [ "$ATTEMPT" -le 3 ] || exit "$RC"
    step "bench_sf$SF refused (contended) - retry $ATTEMPT"
    sleep 300
  done
  rm -rf "$G/sf$SF"
  rm -rf /tmp/graft_bench_emb256_*
done
step done
