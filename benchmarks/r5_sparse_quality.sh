#!/bin/bash
# Round-5 VERDICT #1: quality-pin the sparse fast path.
# 2000-step sessionized A/B at the REES46 config (V=390k, sampled softmax
# n=8192): dense fused_adafactor vs sparse_adam vs sparse_adafactor (bf16
# moments = the trainer default, plus an f32 sparse_adafactor arm to
# separate the rule effect from the dtype effect). Arms run SEQUENTIALLY —
# concurrent TPU compiles contend badly on the tunnel.
set -u
cd /root/repo
OUT=benchmarks/results/r5_sparse_quality.jsonl
mkdir -p benchmarks/results
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> "$OUT.log"
  timeout 3000 python benchmarks/convergence_check.py --arm sampled \
    --steps 2000 "$@" >> "$OUT" 2>> "$OUT.log"
}
run --embedding-optimizer adafactor --seed 0
run --embedding-optimizer sparse_adafactor --moment-dtype bf16 --seed 0
run --embedding-optimizer sparse_adam --moment-dtype bf16 --seed 0
run --embedding-optimizer sparse_adafactor --seed 0
echo "DONE $(date -u +%H:%M:%S)" >> "$OUT.log"
