"""Paper-figure evaluation logic on self-contained simulations with
asserted thresholds (VERDICT r3 item 8) — the Figure-5 (DE fold-change vs
bulk) and Figure-6 (CITE-seq protein/RNA Spearman) analogues in
examples/, run small.  Figure 4's port is examples/correlation_recovery.py
(covered by its own quality tests)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
))


@pytest.mark.slow
def test_figure5_de_foldchange_preserved():
    """Denoising must keep single-cell fold changes tracking bulk (no DE
    smearing) and far above an over-smoothing control (Figure5.R:12-25)."""
    from de_foldchange import run_evaluation

    rho_orig, rho_dca, rho_smooth = run_evaluation(
        n_cells=300, n_genes=100, epochs=80, verbose=False
    )
    assert rho_dca >= rho_orig - 0.05, (rho_dca, rho_orig)
    assert rho_dca > 0.6, rho_dca
    assert rho_dca > rho_smooth + 0.3, (rho_dca, rho_smooth)


@pytest.mark.slow
def test_figure8_nk_subtype_mclust_recovers_protein_split():
    """Mixture clustering of the IMPUTED marker transcripts must recover
    the protein-defined NK-subtype split that the raw transcripts miss
    (Figure8.R:28-40: Mclust on CITE vs original vs imputed + fisher.test)."""
    from nk_subtype_mclust import run_evaluation

    acc_o, p_o, acc_d, p_d = run_evaluation(
        n_cells=400, n_genes=100, epochs=80, verbose=False
    )
    assert acc_d > acc_o + 0.05, (acc_o, acc_d)
    assert acc_d > 0.9, acc_d
    assert p_d < 1e-6, p_d
    assert p_d < p_o, (p_o, p_d)


@pytest.mark.slow
def test_figure9_pseudotime_branching_metrics():
    """The Paul15 workflow's claims on a simulated two-branch trajectory
    (Figure9.ipynb cells 3-20): denoising strengthens the Gata1/Pu.1
    anti-correlation, sharpens the lineage-module structure, imputes
    anti-correlated values into double-zero cells, and supports the
    diffusion-pseudotime workflow."""
    from pseudotime_branching import run_evaluation

    res = run_evaluation(n_cells=500, n_genes=100, epochs=100,
                         verbose=False)
    assert res["anti_dca"] < res["anti_raw"] - 0.05, res
    assert res["anti_dca"] < -0.4, res
    assert res["contrast_dca"] > res["contrast_raw"] + 0.1, res
    assert res["n_double_zero"] >= 10, res
    assert res["anti_double_zero"] < -0.15, res
    assert res["dpt_spearman_dca"] > 0.75, res
    assert res["dpt_spearman_dca"] > res["dpt_spearman_raw"] - 0.05, res


@pytest.mark.slow
def test_figure6_protein_rna_spearman_improves():
    """Denoising must RAISE the per-marker Spearman correlation between
    RNA and its matched protein (Figure6.R:66-75 panel D)."""
    from protein_rna_correlation import run_evaluation

    r_orig, r_dca = run_evaluation(
        n_cells=400, n_genes=100, epochs=100, verbose=False
    )
    assert np.median(r_dca) > np.median(r_orig) + 0.05, (
        np.median(r_orig), np.median(r_dca)
    )
    # and it must not wreck any individual marker catastrophically
    assert np.min(r_dca) > np.min(r_orig) - 0.15, (r_orig, r_dca)
