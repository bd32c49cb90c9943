"""Denoising-quality oracle: silhouette of PCA(denoised) must beat
silhouette of PCA(noisy counts) on a 2-group zero-inflated simulation —
the reference's tutorial evaluation (tutorial.ipynb cells 15/26,
scripts/simulate.R:39-87), turned into a checked-in asserting test
(SURVEY.md §4)."""

import numpy as np
import pandas as pd
import pytest

from sklearn.decomposition import PCA
from sklearn.metrics import silhouette_score

from dca_tpu import dca
from dca_tpu.data.adata import AnnData


def make_grouped_counts(n_cells=600, n_genes=120, seed=42, dropout=0.35):
    """Two cell groups with differential genes + multiplicative dropout."""
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


def _silhouette(X, groups):
    Xl = np.log1p(X)
    p = PCA(n_components=10, random_state=0).fit_transform(Xl)
    return silhouette_score(p, groups)


@pytest.mark.slow
def test_denoising_improves_silhouette():
    noisy, true_counts, groups = make_grouped_counts()
    adata = AnnData(
        noisy.copy(),
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(noisy.shape[0])])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(noisy.shape[1])])),
    )
    ret = dca(
        adata, mode="denoise", ae_type="zinb-conddisp", copy=True, epochs=80,
        verbose=False, random_state=0,
    )
    sil_noisy = _silhouette(noisy, groups)
    sil_denoised = _silhouette(ret.X, groups)
    sil_true = _silhouette(true_counts, groups)
    print(f"silhouette noisy={sil_noisy:.3f} denoised={sil_denoised:.3f} "
          f"true={sil_true:.3f}")
    # tutorial claim: silhouette(denoised) ~ silhouette(true) >> noisy.
    # deterministic seeds measure 0.398 vs 0.166 vs 0.434 here; thresholds
    # leave real headroom while still failing on any quality regression
    assert sil_denoised > sil_noisy + 0.15, (sil_noisy, sil_denoised)
    assert sil_denoised > 0.8 * sil_true, (sil_denoised, sil_true)


@pytest.mark.slow
def test_latent_space_separates_groups():
    noisy, _, groups = make_grouped_counts(seed=7)
    adata = AnnData(noisy.copy())
    ret = dca(adata, mode="latent", copy=True, epochs=80, verbose=False,
              random_state=0)
    sil_latent = silhouette_score(ret.obsm["X_dca"], groups)
    # center pre-activations (reference latent contract) give modest but
    # real separation; deterministic seeds measure 0.079 here
    assert sil_latent > 0.06, sil_latent
