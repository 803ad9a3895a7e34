#!/bin/sh
# Continuation of tools/run_ladder_r11.sh after the first sf10 bench
# attempt OOMed (cold-mode async unpersist left old+new index copies
# co-resident — fixed by a blocking clear, DfCache.scala). Assumes
# target/gendata/sf10 still exists and /tmp/ladder_r11/bench_sf10.json
# was produced by the retried rung.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/ladder_r11
export SPARK_GRAFT_COLD=1

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

# sf10 superlinear-family solo adjudication (fresh JVM each)
for q in ch_final_write ch_collapsing_mt ch_quantile_disc src_jdbc \
         txt_quality ch_equidepth q01_pricing_summary dedup_clusters; do
  step solo_sf10_$q
  SPARK_GRAFT_SF_DIR=$G/sf10 \
    sbt -batch "runMain graft.Bench $OUT/solo_sf10_$q.json $q"
done

# dim-256 EmbScale corpora (embeddings only)
step gen_emb256
for sf in 0.1 1 10; do
  sbt -batch "runMain graft.tools.GenData $sf $G/emb256_sf$sf 256 embeddings"
done
rm -rf "$G/sf10"
step embscale_d256
sbt -batch "runMain graft.tools.EmbScale $OUT/embscale_d256.json sf0.1=$G/emb256_sf0.1 sf1=$G/emb256_sf1 sf10=$G/emb256_sf10"
rm -rf "$G/emb256_sf0.1" "$G/emb256_sf1" "$G/emb256_sf10"

# GENERATED sf0.1 base rung — same layout family as sf1/sf10, so the
# ladder's first decade ratio measures data, not file layout (the
# shipped-corpus rung stays a side datapoint in the artifact)
step gen_sf01gen
sbt -batch "runMain graft.tools.GenData 0.1 $G/sf01gen"
step bench_sf01gen
SPARK_GRAFT_SF_DIR=$G/sf01gen \
  sbt -batch "runMain graft.Bench $OUT/bench_sf01gen.json"
rm -rf "$G/sf01gen"
step done
