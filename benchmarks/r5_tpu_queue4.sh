#!/bin/bash
# Round-5 TPU queue 4: on-chip serving latency for the model-parallel runner
# (jit path vs AOT artifact; model_axis=1 on the single dev chip).
set -u
cd /root/repo
LOG=benchmarks/results/r5_queue4.log
say() { echo "=== $* $(date -u +%H:%M:%S) ===" >> "$LOG"; }

say sharded serving latency
timeout 3000 python benchmarks/serving_latency.py --sharded 1 \
  --batch-sizes 1,32,128 \
  >> benchmarks/results/r5_serving_sharded.jsonl 2>> "$LOG"
say DONE-Q4
