#!/bin/sh
# Complete the round-13 full-registry sf0.1 cross-check. The earlier
# r13 session's run was cut off mid-registry (76 rows committed,
# alphabetically through dedup_incremental); this driver re-dumps the
# FULL registry at sf0.1 and re-checks every row, cheap rows first so
# a session cut-off leaves the maximum verified surface:
#   pass 1 — everything except the all-pairs dedup oracles (minutes);
#   pass 2 — the slow dedup oracles (DuckDB all-pairs jaccard at 5k
#            docs — the multi-hour tail, isolated so it can't starve
#            the rest).
# Output: CROSSCHECK_SF01_r13.log (append-ordered; PASS lines are
# what SURVEY §8k's gate paragraph counts).
set -ex
cd "$(dirname "$0")/.."
OUT=/tmp/verify_sf01_r13
SF=/root/testdata/sf0.1
# the rows the earlier r13 session's run died in front of (its
# committed partial log PASSes everything alphabetically through
# dedup_incremental): the all-pairs-oracle dedup family + the chunk
# variant — isolated in pass 2 so they cannot starve the rest
SLOW="dedup_minhash_lsh dedup_ngram_jaccard dedup_rep_select \
dedup_semantic dedup_simhash txt_chunk_dedup"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} tools/jrun.sh graft.Verify "$SF" "$OUT"
ALL=$(python3 -c "import json; print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
FAST=$(python3 - "$ALL" "$SLOW" <<'EOF'
import sys
all_q = set(sys.argv[1].split()); slow = set(sys.argv[2].split())
print(' '.join(sorted(all_q - slow)))
EOF
)
python3 tools/check.py "$SF" "$OUT" $FAST 2>&1 | tee /tmp/crosscheck_fast.log
python3 tools/check.py "$SF" "$OUT" $SLOW 2>&1 | tee /tmp/crosscheck_slow.log
grep -h "^PASS\|^FAIL" /tmp/crosscheck_fast.log /tmp/crosscheck_slow.log \
  | sort > CROSSCHECK_SF01_r13.log
grep -c "^PASS" CROSSCHECK_SF01_r13.log
