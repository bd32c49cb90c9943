#!/bin/bash
# Round-5 TPU measurement session (serial — ONE JAX process at a time):
#   1. wide 50k x 28k: pipelined predict + full denoise->write (TSV contract)
#   2. 1.3M x 3451: fresh epoch measure WITH full timeline + denoise->write
#      (h5ad, aliases off: X + latent — the reference deliverable)
# Logs to .scale_cache/r5_*.log; run via setsid nohup.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

echo "=== wide predict+write $(date) ==="
N_CELLS=50000 N_GENES=28672 EPOCHS=3 ARMS="predict,write_tsv" \
  timeout 7200 python scripts/wide_e2e.py 2>&1

echo "=== 1.3M epochs(+timeline) + h5ad write $(date) ==="
rm -f .scale_cache/tl_1p3m.jsonl
EPOCHS=3 BATCH=32 WRITE=h5ad WRITE_MODE=full \
  DCA_TPU_TIMELINE=/root/repo/.scale_cache/tl_1p3m.jsonl \
  DCA_TPU_WRITE_ALIASES=0 \
  timeout 14400 python scripts/scale_1p3m.py 2>&1

echo "=== timeline report ==="
python scripts/timeline_report.py .scale_cache/tl_1p3m.jsonl 2>&1

echo "=== DONE $(date) ==="
