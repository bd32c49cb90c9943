#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== fused-loss=0 A/B start $(date -u +%H:%M:%S) ===" >> .bench_logs/fusedloss_ab.log
DCA_TPU_FUSED_LOSS=0 timeout 3000 python bench.py \
  > .bench_logs/fusedloss0.json 2>> .bench_logs/fusedloss_ab.log
echo "rc=$? $(date -u +%H:%M:%S)" >> .bench_logs/fusedloss_ab.log
cat .bench_logs/fusedloss0.json >> .bench_logs/fusedloss_ab.log
