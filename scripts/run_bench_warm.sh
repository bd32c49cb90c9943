#!/bin/bash
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== bench warm start $(date -u +%H:%M:%S) ===" >> .bench_logs/bench_warm.log
timeout 3600 python bench.py > .bench_logs/bench_warm.json 2>> .bench_logs/bench_warm.log
echo "rc=$? $(date -u +%H:%M:%S)" >> .bench_logs/bench_warm.log
cat .bench_logs/bench_warm.json >> .bench_logs/bench_warm.log
