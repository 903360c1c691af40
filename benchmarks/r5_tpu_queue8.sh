#!/bin/bash
# Round-5 TPU queue 8 (final batch):
# 1. packed PLM at the 20k/1M cosine budget (extends the scaling story)
# 2. dense-vs-sparse quality pair at V=1M (scaling the sparse quality pin
#    toward the 4M config; eval-loss is the comparable signal at this V)
# 3. kernel parity sweep (end-of-round hygiene)
set -u
cd /root/repo
LOG=benchmarks/results/r5_queue8.log
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

say plm 20k/1M
timeout 4500 python benchmarks/convergence_check.py --masking plm --packed \
  --plm-probability 0.5 --plm-span 3 --steps 20000 --train-rows 1024000 \
  --lr-schedule cosine --seed 0 \
  >> benchmarks/results/r5_plm_packed.jsonl 2>> "$LOG"

say v1m dense
timeout 3000 python benchmarks/convergence_check.py --arm sampled \
  --num-items 1000000 --steps 2000 --embedding-optimizer adafactor --seed 0 \
  >> benchmarks/results/r5_sparse_quality_v1m.jsonl 2>> "$LOG"
say v1m sparse
timeout 3000 python benchmarks/convergence_check.py --arm sampled \
  --num-items 1000000 --steps 2000 --embedding-optimizer sparse_adam \
  --moment-dtype bf16 --seed 0 \
  >> benchmarks/results/r5_sparse_quality_v1m.jsonl 2>> "$LOG"

say kernel parity
timeout 3000 python benchmarks/kernel_parity_check.py \
  >> benchmarks/results/r5_kernel_parity.log 2>> "$LOG"
say DONE-Q8
