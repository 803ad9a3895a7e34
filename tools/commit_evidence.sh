#!/bin/sh
# Commit the current round's driver/judge evidence artifacts so they
# are tracked at judging time (rounds 4-6 each left BENCH_r0N.json /
# CORRECTNESS_r0N.json untracked — third ADVICE repeat). Safe to run
# any time: commits only when one of the artifacts is new or dirty.
set -e
cd "$(dirname "$0")/.."
git add -A -- 'BENCH_r'*.json 'CORRECTNESS_r'*.json 'BENCH_SCALING'*.json \
  LEAKCHECK.json COPYCHECK.json bench_out.json ANN_RECALL*.json \
  VERDICT.md ADVICE.md PROGRESS.jsonl 2>/dev/null || true
if ! git diff --cached --quiet; then
  git commit -m "Track round evidence artifacts (bench/correctness/leakcheck)"
  echo "committed round evidence"
else
  echo "no evidence changes to commit"
fi
