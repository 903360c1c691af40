#!/bin/bash
# Retry the 16M-row ceiling runs (first attempt hit remote-compile HTTP 500s
# with cycling helper ports — tunnel instability, not necessarily a real
# capacity limit).
set -u
cd /root/repo
LOG=benchmarks/results/r5_queue6.log
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }
for rep in 1 2; do
  say config4 rows=16000000 retry rep=$rep
  T4R_LARGE_VOCAB_ROWS=16000000 T4R_LARGE_VOCAB_SPARSE_ONLY=1 \
    timeout 3000 python benchmarks/run_all.py --configs 4 \
    >> benchmarks/results/r5_ceiling.jsonl 2>> "$LOG"
done
say DONE-Q6
