#!/bin/bash
# Round-3 matmul-mode A/B on the exact driver workloads (VERDICT item 1).
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
for mode in f32 bf16; do
  echo "=== mode=$mode start $(date -u +%H:%M:%S) ===" >> .bench_logs/ab_r3.log
  DCA_TPU_MATMUL=$mode timeout 3600 python bench.py \
    > .bench_logs/ab_${mode}.json 2> .bench_logs/ab_${mode}.log
  echo "=== mode=$mode rc=$? end $(date -u +%H:%M:%S) ===" >> .bench_logs/ab_r3.log
done
echo DONE >> .bench_logs/ab_r3.log
