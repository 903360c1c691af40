#!/bin/bash
# Round-5 TPU queue 3: bf16-stored-table bench A/B (VERDICT #5 second half)
# + packed-PLM quality rows (VERDICT #6), after queue 2 drains.
set -u
cd /root/repo
LOG=benchmarks/results/r5_queue3.log
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

say bench table-bf16 run1
T4R_BENCH_TABLE_BF16=1 timeout 1200 python bench.py \
  >> benchmarks/results/r5_bench_tablebf16.jsonl 2>> "$LOG"
say bench table-bf16 run2
T4R_BENCH_TABLE_BF16=1 timeout 1200 python bench.py \
  >> benchmarks/results/r5_bench_tablebf16.jsonl 2>> "$LOG"

for seed in 0 1; do
  say plm packed seed=$seed
  timeout 3000 python benchmarks/convergence_check.py --masking plm --packed \
    --plm-probability 0.5 --plm-span 3 --steps 2000 --seed $seed \
    >> benchmarks/results/r5_plm_packed.jsonl 2>> "$LOG"
done
say DONE-Q3
