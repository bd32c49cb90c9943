#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bf16 retry start $(date -u +%H:%M:%S) ===" >> .bench_logs/ab_r3.log
DCA_TPU_MATMUL=bf16 timeout 2400 python bench.py \
  > .bench_logs/ab_bf16.json 2> .bench_logs/ab_bf16.log
echo "=== bf16 retry rc=$? end $(date -u +%H:%M:%S) ===" >> .bench_logs/ab_r3.log
