"""End-to-end denoising tutorial — the reference tutorial.ipynb workflow
(splatter-style simulation -> dca() -> PCA/silhouette evaluation) as a
runnable script.

Usage:  python examples/tutorial.py [outdir]
"""

import sys
import time

import numpy as np
import pandas as pd
from sklearn.decomposition import PCA
from sklearn.metrics import silhouette_score

from dca_tpu import dca
from dca_tpu.data.adata import AnnData


def simulate(n_cells=2000, n_genes=200, seed=42, dropout=0.35):
    """Two-group ZINB simulation in the spirit of scripts/simulate.R."""
    rs = np.random.RandomState(seed)
    n_half = n_cells // 2
    base = rs.gamma(2.0, 1.0, size=(1, n_genes))
    de = np.ones((2, n_genes))
    de_genes = rs.choice(n_genes, n_genes // 4, replace=False)
    de[0, de_genes[: len(de_genes) // 2]] = 5.0
    de[1, de_genes[len(de_genes) // 2 :]] = 5.0
    groups = np.repeat([0, 1], [n_half, n_cells - n_half])
    depth = rs.lognormal(0.0, 0.3, size=(n_cells, 1))
    mu = base * de[groups] * depth * 3.0
    theta = 2.0
    true_counts = rs.negative_binomial(theta, theta / (theta + mu)).astype(np.float32)
    drop = rs.uniform(size=true_counts.shape) < dropout
    noisy = np.where(drop, 0.0, true_counts).astype(np.float32)
    noisy[:, noisy.sum(0) == 0] += 1.0
    noisy[noisy.sum(1) == 0, 0] += 1.0
    return noisy, true_counts, groups


def silhouette(X, groups):
    p = PCA(n_components=10, random_state=0).fit_transform(np.log1p(X))
    return silhouette_score(p, groups)


def main():
    noisy, true_counts, groups = simulate()
    adata = AnnData(
        noisy.copy(),
        pd.DataFrame({"group": groups},
                     index=pd.Index([f"cell{i}" for i in range(len(groups))])),
        pd.DataFrame(index=pd.Index([f"gene{i}" for i in range(noisy.shape[1])])),
    )

    t0 = time.time()
    ret = dca(adata, mode="denoise", ae_type="zinb-conddisp", copy=True,
              return_info=True, verbose=False)
    print(f"dca() wall time: {time.time() - t0:.1f} s "
          f"({len(ret.uns['dca_loss_history']['loss'])} epochs)")

    print(f"silhouette  noisy:    {silhouette(noisy, groups):+.3f}")
    print(f"silhouette  denoised: {silhouette(ret.X, groups):+.3f}")
    print(f"silhouette  true:     {silhouette(true_counts, groups):+.3f}")

    if len(sys.argv) > 1:
        from dca_tpu.models import AE_types  # noqa: F401 (doc pointer)

        outdir = sys.argv[1]
        net = dca(adata, mode="denoise", ae_type="zinb-conddisp",
                  return_model=True, verbose=False)
        net.predict(adata, mode="full", return_info=True)
        net.write(adata, outdir, mode="full")
        print(f"outputs written to {outdir}")


if __name__ == "__main__":
    main()
