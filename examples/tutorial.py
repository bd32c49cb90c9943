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


def simulate(n_cells=2000, n_genes=200, seed=42, dropout_mid=3.0):
    """Two-group splatter-style simulation (dca_tpu.data.simulate mirrors
    the reference scripts/simulate.R generator)."""
    from dca_tpu.data.simulate import simulate_counts

    sim = simulate_counts(
        n_cells=n_cells, n_genes=n_genes, n_groups=2,
        dropout_mid=dropout_mid, de_strength=4.0, seed=seed,
    )
    return sim.counts, sim.true_counts, sim.groups


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
