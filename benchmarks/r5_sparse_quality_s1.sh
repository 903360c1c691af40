#!/bin/bash
# Seed-1 pair for the sparse-path quality A/B (2-seed standard).
set -u
cd /root/repo
OUT=benchmarks/results/r5_sparse_quality.jsonl
run() {
  echo "=== $* $(date -u +%H:%M:%S) ===" >> "$OUT.log"
  timeout 3000 python benchmarks/convergence_check.py --arm sampled \
    --steps 2000 "$@" >> "$OUT" 2>> "$OUT.log"
}
run --embedding-optimizer adafactor --seed 1
run --embedding-optimizer sparse_adam --moment-dtype bf16 --seed 1
run --embedding-optimizer sparse_adafactor --moment-dtype bf16 --seed 1
echo "DONE-S1 $(date -u +%H:%M:%S)" >> "$OUT.log"
