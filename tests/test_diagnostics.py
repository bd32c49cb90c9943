"""Diagnostics module tests (reference utils.py statistical logic)."""

import numpy as np
import pytest

from dca_tpu import diagnostics as dg

from conftest import make_counts


def test_nb_zero_closed_form():
    # P(X=0) for NB(mu=2, theta=1) = (1/3)^1
    assert abs(dg.nb_zero(1.0, 2.0) - 1.0 / 3.0) < 1e-12
    assert abs(dg.zinb_zero(1.0, 2.0, 0.5) - (0.5 + 0.5 / 3.0)) < 1e-12


def test_estimate_theta_moments():
    rs = np.random.RandomState(0)
    theta = 2.0
    mu = rs.gamma(3.0, 2.0, size=(1, 300))
    X = rs.negative_binomial(theta, theta / (theta + mu), size=(3000, 300))
    est = dg.estimate_theta_moments(X.astype(np.float32))
    assert 1.0 < est < 4.0, est  # moment estimator is coarse but in range


def test_fit_zinb_recovers_params():
    rs = np.random.RandomState(1)
    mu_t, theta_t, pi_t = 4.0, 2.0, 0.3
    y = rs.negative_binomial(theta_t, theta_t / (theta_t + mu_t), size=5000)
    y = np.where(rs.uniform(size=y.shape) < pi_t, 0, y).astype(np.float32)
    fit = dg.fit_zinb(y, maxiter=1500)
    assert abs(fit["mu"] - mu_t) / mu_t < 0.15, fit
    assert abs(fit["pi"] - pi_t) < 0.1, fit
    assert abs(fit["theta"] - theta_t) / theta_t < 0.5, fit


def test_zero_inflation_test_detects():
    rs = np.random.RandomState(2)
    mu_t, theta_t = 4.0, 2.0
    y_zi = rs.negative_binomial(theta_t, theta_t / (theta_t + mu_t), size=3000)
    y_zi = np.where(rs.uniform(size=y_zi.shape) < 0.4, 0, y_zi).astype(np.float32)
    res = dg.zero_inflation_test(y_zi, maxiter=1200)
    assert res["pvalue"] < 0.01, res  # strong zero inflation detected


def test_plots(tmp_path):
    pytest.importorskip("matplotlib")
    from dca_tpu.data.adata import AnnData

    ad = AnnData(make_counts(100, 40, seed=3))
    for fn in (dg.plot_mean_var, dg.plot_mean_dropout, dg.plot_zeroinf):
        out = fn(ad, out_file=str(tmp_path / f"{fn.__name__}.png"))
        import os

        assert os.path.exists(out)
