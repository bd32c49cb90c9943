#!/bin/bash
# Round-5 session 3: prefetch-depth A/B on the 1.3M corpus (single-call protocol)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

for d in 1 2 3; do
  echo "=== depth $d $(date) ==="
  EPOCHS=4 BATCH=32 DCA_TPU_PREFETCH=$d \
    DCA_TPU_TIMELINE=/root/repo/.scale_cache/tl_depth$d.jsonl \
    timeout 3600 python scripts/scale_1p3m.py 2>&1 | grep -E "epoch |RESULT"
done
echo "=== DONE3 $(date) ==="
