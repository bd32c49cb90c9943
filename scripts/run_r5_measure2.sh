#!/bin/bash
# Round-5 TPU measurement session 2 (run AFTER run_r5_measure.sh ends):
#   1. wide 50k x 28k denoise->write TSV re-run (OOM-fixed formatter)
#   2. single-chip hyper pipelining A/B
#   3. bench warm + bench (driver contract)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== 1.3M single-call epochs (amortized setup) $(date) ==="
rm -f .scale_cache/tl_1p3m_v2.jsonl
EPOCHS=4 BATCH=32 \
  DCA_TPU_TIMELINE=/root/repo/.scale_cache/tl_1p3m_v2.jsonl \
  timeout 3600 python scripts/scale_1p3m.py 2>&1
python scripts/timeline_report.py .scale_cache/tl_1p3m_v2.jsonl 2>&1

echo "=== wide write_tsv (retry, fixed formatter) $(date) ==="
rm -rf .scale_cache/out_wide_tsv
N_CELLS=50000 N_GENES=28672 EPOCHS=3 ARMS="write_tsv" \
  timeout 7200 python scripts/wide_e2e.py 2>&1
rm -rf .scale_cache/out_wide_tsv

echo "=== hyper pipelining A/B $(date) ==="
TRIALS=10 HYPEREPOCH=20 timeout 5400 python scripts/hyper_pipeline_ab.py 2>&1

echo "=== bench warm + bench $(date) ==="
timeout 3600 python bench.py 2>&1 | tail -5
timeout 3600 python bench.py 2>.bench_logs/bench_stderr.log | tail -3
tail -6 .bench_logs/bench_stderr.log

echo "=== DONE2 $(date) ==="
