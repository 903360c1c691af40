#!/bin/bash
# Quality gate for the bf16-STORED item table (measured +8% throughput:
# 8.32 -> 7.70 ms/step): 2000-step sessionized full-softmax A/B, paired
# seeds, fused_adafactor + bf16 moments on both arms.
set -u
cd /root/repo
OUT=benchmarks/results/r5_table_bf16_quality.jsonl
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$OUT.log"; }
run() {
  say "$@"
  timeout 3000 python benchmarks/convergence_check.py \
    --embedding-optimizer fused_adafactor --moment-dtype bf16 --steps 2000 \
    "$@" >> "$OUT" 2>> "$OUT.log"
}
run --seed 0
run --table-dtype bf16 --seed 0
run --seed 1
run --table-dtype bf16 --seed 1
say DONE-TBF16
