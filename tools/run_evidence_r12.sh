#!/bin/sh
# Round-12 evidence runner: (1) EMB_SCALE_r12 — the dim-256 embedding
# family ladder with the NEW recall-contract serving sizing
# (Ann.ivfServingParams), whose 200k rung is the r11 verdict's done
# criterion (recall@10 >= 0.9 at measured latency); (2) the shuffle-
# band adjudication (tools/run_band_r12.sh).
set -ex
cd "$(dirname "$0")/.."
G=target/gendata
OUT=/tmp/evidence_r12
mkdir -p "$OUT"

step() { echo "=== $* $(date -u +%H:%M:%S) $(df -h / | tail -1)"; }

step gen_emb256
for sf in 0.1 1 10; do
  [ -d "$G/emb256_sf$sf" ] || \
    sbt -batch "runMain graft.tools.GenData $sf $G/emb256_sf$sf 256 embeddings"
done
step embscale
sbt -batch "runMain graft.tools.EmbScale EMB_SCALE_r12.json sf0.1=$G/emb256_sf0.1 sf1=$G/emb256_sf1 sf10=$G/emb256_sf10"
rm -rf "$G/emb256_sf0.1" "$G/emb256_sf1" "$G/emb256_sf10"

step band
sh tools/run_band_r12.sh
rm -rf "$G/band_sf1" "$G/band_sf10"
step done
