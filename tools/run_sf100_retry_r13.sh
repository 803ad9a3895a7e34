#!/bin/sh
# Clean-disk sf100 retry of the three rows the r13 ladder rung failed:
# ann_knn_join (the window-sort defect, FIXED in-round — this measures
# the fixed path), and dedup_embedding_srp + graph_pagerank (both died
# in the rung's disk-full window: the bench JVM had accumulated ~26 GB
# of shuffle spill across 11 prior cold queries on top of the 21 GB
# corpus — an artifact of the single-JVM suite, not of either plan;
# solo JVMs on a clean disk are the controlled re-measure).
# Pagerank needs orders+lineitem regenerated (the rung deleted sf100);
# the embedding twin regenerates itself from the dir name.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/ladder_r13
export SPARK_GRAFT_COLD=1
export SPARK_GRAFT_REQUIRE_QUIET=1
export SPARK_GRAFT_SHUFFLE_PARTITIONS=320
step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }
step gen
SPARK_DRIVER_MEM=48g tools/jrun.sh graft.tools.GenData 100 "$G/sf100" 256 orders,lineitem
step cooldown
sleep 240
run_rows() {
  ATTEMPT=0
  until SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$G/sf100" \
      tools/jrun.sh graft.Bench "$1" "$2" $3; do
    RC=$?
    ATTEMPT=$((ATTEMPT + 1))
    [ "$RC" -eq 3 ] && [ "$ATTEMPT" -le 3 ] || exit "$RC"
    step "refused (contended) - retry $ATTEMPT"
    sleep 300
  done
}
step bench_srp_pagerank
run_rows "$OUT/sf100_retry_a.json" dedup_embedding_srp graph_pagerank
step bench_knn_fixed
run_rows "$OUT/sf100_retry_b.json" ann_knn_join
rm -rf "$G/sf100" /tmp/graft_bench_emb256_*sf100*
step done
