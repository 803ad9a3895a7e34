#!/bin/sh
# Re-measure dedup_embedding_srp at the sf100 rung after the
# maxResultSize budget-cap fix (the only row run_sf100_fix_r13.sh
# could not complete: the broadcast-verify collect of the 4.2 GB
# packed corpus exceeded the 1g default result-size ceiling).
set -ex
cd "$(dirname "$0")/.."
OUT=/tmp/ladder_r13
export SPARK_GRAFT_COLD=1
export SPARK_GRAFT_REQUIRE_QUIET=1
export SPARK_GRAFT_SHUFFLE_PARTITIONS=320
sleep 150
ATTEMPT=0
until SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/gendata/sf100 \
    tools/jrun.sh graft.Bench "$OUT/fix_srp_sf100.json" dedup_embedding_srp; do
  RC=$?
  ATTEMPT=$((ATTEMPT + 1))
  [ "$RC" -eq 3 ] && [ "$ATTEMPT" -le 3 ] || exit "$RC"
  sleep 300
done
rm -rf /tmp/graft_bench_emb256_*sf100*
