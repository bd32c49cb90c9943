#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo "=== convergent 1.3M run $(date) ==="
EPOCHS=300 CONVERGE=1 BATCH=32 WRITE=h5ad WRITE_MODE=full \
  DCA_TPU_WRITE_ALIASES=0 \
  timeout 12000 python scripts/scale_1p3m.py 2>&1
echo "=== DONE-CONVERGE $(date) ==="
