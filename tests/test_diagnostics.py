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
    import os

    pytest.importorskip("matplotlib")
    from dca_tpu.data.adata import AnnData

    ad = AnnData(make_counts(100, 40, seed=3))
    out = dg.plot_mean_var(ad, out_file=str(tmp_path / "mv.png"))
    assert os.path.exists(out)
    for fn in (dg.plot_mean_dropout, dg.plot_zeroinf):
        path = str(tmp_path / f"{fn.__name__}.png")
        ret = fn(ad, out_file=path)
        assert os.path.exists(path)
        assert np.isfinite(ret["zinb_ll"]) and np.isfinite(ret["pvalue"])
    ret = dg.plot_zeroinf(ad, out_file=str(tmp_path / "zi_mv.png"),
                          mean_var_plot=True)
    assert os.path.exists(str(tmp_path / "zi_mv.png"))


def _sim_counts(pi, n=2000, g=200, seed=5):
    """NB counts with optional extra zero-inflation pi."""
    rs = np.random.RandomState(seed)
    theta = 2.0
    mu = rs.gamma(3.0, 1.5, size=(1, g))
    y = rs.negative_binomial(theta, theta / (theta + mu), size=(n, g))
    if pi > 0:
        y = np.where(rs.uniform(size=y.shape) < pi, 0, y)
    return y.astype(np.float32)


def test_zinb_zero_fit_rises_on_zero_inflated_sim():
    """The fitted pi curve (reference utils.py:52-70 model) must be clearly
    higher on a zero-inflated sim than on a pure-NB sim — VERDICT r2 item 7."""
    from dca_tpu.diagnostics import optimize_zinb, sigmoid

    def fitted_pi(counts):
        mu = counts.mean(0)
        dropout = (counts == 0).mean(0)
        theta = dg.estimate_theta_moments(counts)
        a, b, _ = optimize_zinb(mu, dropout, theta=theta)
        # evaluate the fitted pi at the typical gene mean
        return float(sigmoid(np.log(np.median(mu) + 1e-7) * a + b))

    pi_nb = fitted_pi(_sim_counts(0.0))
    pi_zi = fitted_pi(_sim_counts(0.35))
    # the absolute level is damped because the moment theta absorbs part of
    # the extra zeros as overdispersion (same behavior as the reference's
    # pipeline, which feeds the same quadratic-fit theta) — the separation
    # is what matters
    assert pi_zi > 0.1, pi_zi
    assert pi_nb < 0.05, pi_nb
    assert pi_zi > pi_nb + 0.08, (pi_zi, pi_nb)


def test_plot_zeroinf_pvalue_discriminates():
    pytest.importorskip("matplotlib")
    from dca_tpu.data.adata import AnnData

    ret_zi = dg.plot_mean_dropout(AnnData(_sim_counts(0.35)))
    ret_nb = dg.plot_mean_dropout(AnnData(_sim_counts(0.0)))
    assert ret_zi["pvalue"] < 0.01, ret_zi
    assert ret_zi["zinb_ll"] < ret_zi["nb_ll"]  # ZINB fits ZI data better
    # and on pure NB data the ZINB improvement is comparatively small
    gain_zi = ret_zi["nb_ll"] - ret_zi["zinb_ll"]
    gain_nb = ret_nb["nb_ll"] - ret_nb["zinb_ll"]
    assert gain_zi > gain_nb
