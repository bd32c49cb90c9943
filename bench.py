"""Benchmark: cells/sec training throughput + end-to-end dca() wall time.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference's end-to-end `dca()` on a 2000-cell x
~200-gene splatter sim takes 24 s on CPU => ~83 cells/s end-to-end.  We run
the same workload shape (2000x200, nb-conddisp 64-32-64, early stopping,
batch 32, 300 max epochs) on one TPU chip and report end-to-end cells/sec.
"""

import json
import os
import sys
import time

import numpy as np

# Persistent compile cache: first-ever run pays the (remote) XLA compiles,
# every later run reuses them — steady-state is what we measure vs baseline.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def make_splatter_like(n_cells=2000, n_genes=200, seed=42):
    """Synthetic ZINB counts mimicking the tutorial's splatter sim
    (2 groups, dropout) — scripts/simulate.R:39-87."""
    rs = np.random.RandomState(seed)
    n_half = n_cells // 2
    base = rs.gamma(2.0, 1.0, size=(1, n_genes))
    de = np.ones((2, n_genes))
    de_genes = rs.choice(n_genes, n_genes // 5, replace=False)
    de[0, de_genes[: len(de_genes) // 2]] = 4.0
    de[1, de_genes[len(de_genes) // 2 :]] = 4.0
    groups = np.repeat([0, 1], [n_half, n_cells - n_half])
    depth = rs.lognormal(0.0, 0.35, size=(n_cells, 1))
    mu = base * de[groups] * depth * 3.0
    theta = 2.0
    counts = rs.negative_binomial(theta, theta / (theta + mu)).astype(np.float32)
    drop = rs.uniform(size=counts.shape) < np.exp(-0.3 * mu)
    counts = np.where(drop, 0.0, counts).astype(np.float32)
    counts[:, counts.sum(0) == 0] += 1.0
    counts[counts.sum(1) == 0, 0] += 1.0
    return counts, groups


def main():
    import pandas as pd

    from dca_tpu import dca
    from dca_tpu.data.adata import AnnData

    n_cells, n_genes = 2000, 200
    counts, _ = make_splatter_like(n_cells, n_genes)
    adata = AnnData(
        counts,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(n_genes)])),
    )

    # warmup: backend init only (tiny op); model compiles hit the disk cache
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(jnp.zeros((8, 128)) @ jnp.zeros((128, 8)))

    t0 = time.time()
    dca(adata, mode="denoise", ae_type="nb-conddisp", epochs=300, verbose=False)
    wall = time.time() - t0

    cells_per_sec = n_cells / wall
    baseline = 2000.0 / 24.0  # reference tutorial.ipynb cell 11: 24 s end-to-end
    print(
        json.dumps(
            {
                "metric": "end_to_end_dca_cells_per_sec_2000x200",
                "value": round(cells_per_sec, 2),
                "unit": "cells/s",
                "vs_baseline": round(cells_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
