#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== scale1p3m start $(date -u +%H:%M:%S) ===" >> .bench_logs/scale.log
EPOCHS=3 timeout 5400 python scripts/scale_1p3m.py >> .bench_logs/scale.log 2>&1
echo "=== scale1p3m rc=$? end $(date -u +%H:%M:%S) ===" >> .bench_logs/scale.log
