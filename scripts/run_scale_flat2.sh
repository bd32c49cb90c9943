#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== flat-L-fix rerun start $(date -u +%H:%M:%S) ===" >> .bench_logs/scale_flat2.log
EPOCHS=3 timeout 4800 python scripts/scale_1p3m.py >> .bench_logs/scale_flat2.log 2>&1
echo "rc=$? $(date -u +%H:%M:%S)" >> .bench_logs/scale_flat2.log
