#!/bin/sh
# Disk-managed round-11 scale ladder (the r10 verdict's prescription
# #1): full-suite bench at sf0.1 (shipped) / sf1 / sf10 (GenData),
# COLD memo mode (SPARK_GRAFT_COLD=1 — no query rides a sibling's
# DfCache index, the r10 contamination), plus the dim-64/dim-256
# EmbScale probes and the sf10 + write-family solo adjudication runs.
# Each generated rung is DELETED before the next is generated, and df
# is logged at every step — the r10 EmbScale run died on disk
# exhaustion mid-ladder.
#
# Outputs under /tmp/ladder_r11/; post-processing into
# BENCH_SCALING_r11.json / EMB_SCALE_r11.json / BENCH_SOLO_r11.json
# is tools/scaling_report.py + the round's build notes.
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/ladder_r11
mkdir -p "$OUT" "$G"
export SPARK_GRAFT_COLD=1

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

# ---- rung sf0.1 (shipped corpus) ------------------------------------
step bench_sf0.1
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench $OUT/bench_sf01.json"

# write-family solo adjudication at sf0.1 (r9 prescription #5, still
# owed): each query in a fresh JVM == solo; suite pair comes from
# bench_sf01.json
for q in sink_update_mutation sink_delete_mutation sink_dynamic_overwrite; do
  step solo_sf01_$q
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    sbt -batch "runMain graft.Bench $OUT/solo_sf01_$q.json $q"
done

# ---- rung sf1 --------------------------------------------------------
step gen_sf1
sbt -batch "runMain graft.tools.GenData 1 $G/sf1"
step bench_sf1
SPARK_GRAFT_SF_DIR=$G/sf1 sbt -batch "runMain graft.Bench $OUT/bench_sf1.json"

# dim-64 EmbScale while the sf1 corpus still exists (shipped corpora
# are dim-64; sf1's GenData default matches). The dim-64 construction
# is the documented output-bound regime — measured to sf1 only.
step embscale_d64
sbt -batch "runMain graft.tools.EmbScale $OUT/embscale_d64.json sf0.01=/root/testdata/sf0.01 sf0.1=/root/testdata/sf0.1 sf1=$G/sf1"

# q01 scaling adjudication probe: solo q01 at sf1 (fresh JVM), for the
# 11.9x sf0.1->sf1 step investigation
step solo_sf1_q01
SPARK_GRAFT_SF_DIR=$G/sf1 sbt -batch "runMain graft.Bench $OUT/solo_sf1_q01.json q01_pricing_summary"

rm -rf "$G/sf1"

# ---- rung sf10 -------------------------------------------------------
step gen_sf10
sbt -batch "runMain graft.tools.GenData 10 $G/sf10"
step bench_sf10
SPARK_GRAFT_SF_DIR=$G/sf10 sbt -batch "runMain graft.Bench $OUT/bench_sf10.json"

# sf10 superlinear-family solo adjudication (fresh JVM each, clean
# disk): real cliff vs suite/spill-pressure artifact
for q in ch_final_write ch_collapsing_mt ch_quantile_disc src_jdbc \
         txt_quality ch_equidepth q01_pricing_summary; do
  step solo_sf10_$q
  SPARK_GRAFT_SF_DIR=$G/sf10 \
    sbt -batch "runMain graft.Bench $OUT/solo_sf10_$q.json $q"
done

# ---- dim-256 EmbScale (the measurable high-dim construction) --------
# embeddings-only corpora; sf10 = 200k rows x 256 dims — THE rung the
# r10 srp failure and this round's auto-banding fix are about
step gen_emb256
for sf in 0.1 1 10; do
  sbt -batch "runMain graft.tools.GenData $sf $G/emb256_sf$sf 256 embeddings"
done
rm -rf "$G/sf10"
step embscale_d256
sbt -batch "runMain graft.tools.EmbScale $OUT/embscale_d256.json sf0.1=$G/emb256_sf0.1 sf1=$G/emb256_sf1 sf10=$G/emb256_sf10"

rm -rf "$G/emb256_sf0.1" "$G/emb256_sf1" "$G/emb256_sf10"
step done
