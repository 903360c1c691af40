#!/bin/bash
# Round-5 TPU queue 2 (after the sparse-quality A/B):
# 1. step re-decomposition at the CURRENT operating point (K=32 + bf16
#    moments — VERDICT r4 #5)
# 2. bench.py 2x (confirm the r5 changes cost nothing on the headline)
# 3. packed RTD second quality run (seed 1 — VERDICT #8)
# 4. config-4 HBM ceiling: sparse_adam at 8M / 16M / 24M rows (VERDICT #2)
set -u
cd /root/repo
LOG=benchmarks/results/r5_queue2.log
mkdir -p benchmarks/results
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

say step_ablation op-point
timeout 3000 python benchmarks/step_ablation.py \
  packed32+bf16m no_ce+packed32+bf16m table_sgd+packed32 all_sgd+packed32 \
  >> benchmarks/results/r5_step_ablation.jsonl 2>> "$LOG"

say bench run1
timeout 1200 python bench.py >> benchmarks/results/r5_bench.jsonl 2>> "$LOG"
say bench run2
timeout 1200 python bench.py >> benchmarks/results/r5_bench.jsonl 2>> "$LOG"

say rtd packed seed1
timeout 3000 python benchmarks/convergence_check.py --masking rtd --packed \
  --steps 2000 --seed 1 >> benchmarks/results/r5_rtd_packed.jsonl 2>> "$LOG"

for rows in 8000000 16000000 24000000; do
  for rep in 1 2; do
    say config4 rows=$rows rep=$rep
    T4R_LARGE_VOCAB_ROWS=$rows T4R_LARGE_VOCAB_SPARSE_ONLY=1 \
      timeout 3000 python benchmarks/run_all.py --configs 4 \
      >> benchmarks/results/r5_ceiling.jsonl 2>> "$LOG"
  done
done
say DONE-Q2
