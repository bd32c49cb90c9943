#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== derive-input v3 run start $(date -u +%H:%M:%S) ===" >> .bench_logs/scale_v3.log
EPOCHS=3 timeout 4200 python scripts/scale_1p3m.py >> .bench_logs/scale_v3.log 2>&1
echo "rc=$? $(date -u +%H:%M:%S)" >> .bench_logs/scale_v3.log
