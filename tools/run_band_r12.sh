#!/bin/sh
# Round-12 adjudication of the 10-14x/decade shuffle band (VERDICT r11
# "What's wrong" #3): ch_quantile_disc (14.1x), ch_auc (11.8x),
# ch_equidepth (11.7x) carried a "partition-count/shuffle second-order
# effects" label without a measurement. Mechanism test: all three read
# ONLY the orders table and aggregate through one shuffle, so if the
# band is per-partition-size growth (32 fixed partitions x 10x data =
# 10x bytes/partition), re-running the sf10 rung with shuffle
# partitions scaled to input (320) must flatten the decade toward
# data-linear. If it does not, the band is a real operator cliff.
#
# Output: /tmp/band_r12/*.json -> tools/band_post_r12.py assembles
# BAND_ADJUDICATION_r12.json.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/band_r12
mkdir -p "$OUT"
export SPARK_GRAFT_COLD=1
QS="ch_quantile_disc ch_auc ch_equidepth"

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

step gen
[ -d "$G/band_sf1" ] || sbt -batch "runMain graft.tools.GenData 1 $G/band_sf1 64 orders"
[ -d "$G/band_sf10" ] || sbt -batch "runMain graft.tools.GenData 10 $G/band_sf10 64 orders"

# fresh JVM per (rung, partition-count) x all three queries in one
# bench invocation (they share nothing: separate one-shuffle aggs)
step sf1_p32
SPARK_GRAFT_SF_DIR=$G/band_sf1 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  sbt -batch "runMain graft.Bench $OUT/sf1_p32.json $QS"
step sf10_p32
SPARK_GRAFT_SF_DIR=$G/band_sf10 SPARK_GRAFT_SHUFFLE_PARTITIONS=32 \
  sbt -batch "runMain graft.Bench $OUT/sf10_p32.json $QS"
step sf10_p320
SPARK_GRAFT_SF_DIR=$G/band_sf10 SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
  sbt -batch "runMain graft.Bench $OUT/sf10_p320.json $QS"
step done
python3 tools/band_post_r12.py $OUT BAND_ADJUDICATION_r12.json
