"""Model-checking diagnostics (reference dca/utils.py re-implemented).

The reference's utils module is stale TF1 (imports tensorflow.contrib,
utils.py:39-70); this is a working JAX/numpy port of its statistical logic:

  * closed-form NB/ZINB zero probabilities (utils.py:11-12)
  * likelihood-ratio test for zero-inflation (utils.py:19-27)
  * quadratic mean-variance fit for a moment estimate of theta (utils.py:30-36)
  * ZINB fit of per-gene (mean, dropout) via gradient optimization, replacing
    the TF1 ScipyOptimizerInterface fit (utils.py:39-70)
  * plot_mean_dropout / plot_mean_var / plot_zeroinf (utils.py:73-156),
    gated on matplotlib availability
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.stats import chi2

import jax
import jax.numpy as jnp

from .losses import zinb_nll, nb_nll


def _dense(X):
    if sp.issparse(X):
        return np.asarray(X.todense())
    return np.asarray(X)


# ---------------------------------------------------------------------------
# closed forms (utils.py:11-12)
# ---------------------------------------------------------------------------


def nb_zero(theta, mu):
    """P(X=0) under NB(mean=mu, dispersion=theta)."""
    return (theta / (theta + mu)) ** theta


def zinb_zero(theta, mu, pi):
    """P(X=0) under ZINB."""
    return pi + (1.0 - pi) * nb_zero(theta, mu)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def log_loss(pred, true):
    """Bernoulli cross-entropy (utils.py:14-16)."""
    eps = 1e-10
    return -(true * np.log(pred + eps) + (1.0 - true) * np.log(1.0 - pred + eps))


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


def lrt(ll_full, ll_reduced, df_full, df_reduced):
    """Likelihood ratio test p-value (utils.py:19-27)."""
    stat = 2.0 * (ll_full - ll_reduced)
    return chi2.sf(stat, df_full - df_reduced)


def estimate_theta_moments(X):
    """Moment estimate of a global theta from the quadratic mean-variance
    relation var = mu + mu^2/theta (utils.py:30-36)."""
    X = _dense(X)
    mu = X.mean(0)
    var = X.var(0)
    # least squares of var - mu ~ mu^2 / theta
    coef = np.linalg.lstsq(
        (mu**2).reshape(-1, 1), np.maximum(var - mu, 1e-10), rcond=None
    )[0][0]
    theta = 1.0 / max(coef, 1e-10)
    return float(theta)


def _adam_minimize(loss, p0, maxiter=2000, lr=0.05, b1=0.9, b2=0.999,
                   eps=1e-8):
    """Shared scalar-parameter Adam loop for the diagnostic ML fits."""
    p = jnp.asarray(p0, jnp.float32)
    m = jnp.zeros_like(p)
    v = jnp.zeros_like(p)
    g_fn = jax.jit(jax.value_and_grad(loss))
    for t_i in range(1, maxiter + 1):
        _, g = g_fn(p)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        mhat = m / (1 - b1**t_i)
        vhat = v / (1 - b2**t_i)
        p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
    return p


def fit_zinb(y, maxiter=2000, lr=0.05, seed=0):
    """Fit scalar (mu, theta, pi) ZINB to a 1-D count sample by Adam on the
    exact ZINB NLL — the working replacement for the TF1 fit (utils.py:39-70).

    Returns dict(mu, theta, pi, nll)."""
    y = np.asarray(y, np.float32).ravel()

    def unpack(p):
        mu = jnp.exp(p[0])
        theta = jnp.exp(p[1])
        pi = jax.nn.sigmoid(p[2])
        return mu, theta, pi

    def loss(p):
        mu, theta, pi = unpack(p)
        m = jnp.broadcast_to(mu, y.shape)
        t = jnp.broadcast_to(theta, y.shape)
        pp = jnp.broadcast_to(pi, y.shape)
        return zinb_nll(y, m, t, pp)

    p = _adam_minimize(loss, [np.log(y.mean() + 1e-3), 0.0, 0.0],
                       maxiter=maxiter, lr=lr)
    mu, theta, pi = (float(x) for x in unpack(p))
    return {"mu": mu, "theta": theta, "pi": pi, "nll": float(loss(p))}


def zero_inflation_test(y, maxiter=2000):
    """LRT of ZINB vs NB on a count sample: fits both, returns p-value of the
    zero-inflation term (small p => zero-inflated)."""
    y = np.asarray(y, np.float32).ravel()
    z = fit_zinb(y, maxiter=maxiter)

    def nb_loss(p):
        mu = jnp.exp(p[0])
        theta = jnp.exp(p[1])
        return nb_nll(y, jnp.broadcast_to(mu, y.shape), jnp.broadcast_to(theta, y.shape))

    p = _adam_minimize(nb_loss, [np.log(y.mean() + 1e-3), 0.0], maxiter=maxiter)
    nb_nll_val = float(nb_loss(p))
    n = y.size
    ll_full = -z["nll"] * n
    ll_red = -nb_nll_val * n
    return {"pvalue": float(lrt(ll_full, ll_red, 3, 2)), "zinb": z, "nb_nll": nb_nll_val}


# ---------------------------------------------------------------------------
# plots (matplotlib optional)
# ---------------------------------------------------------------------------


def _plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover
        raise ImportError("matplotlib is required for diagnostics plots") from e


def plot_mean_var(adata, out_file=None):
    """Per-gene mean-variance scatter with the fitted NB curve
    (utils.py:73-95)."""
    plt = _plt()
    X = _dense(adata.X if not hasattr(adata, "raw") or adata.raw is None else adata.raw.X)
    mu = X.mean(0)
    var = X.var(0)
    theta = estimate_theta_moments(X)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.loglog(np.maximum(mu, 1e-3), np.maximum(var, 1e-3), ".", alpha=0.3, label="genes")
    xs = np.logspace(-3, np.log10(max(mu.max(), 1.0)), 100)
    ax.loglog(xs, xs + xs**2 / theta, "r-", label=f"NB fit (theta={theta:.2f})")
    ax.loglog(xs, xs, "k--", label="Poisson")
    ax.set_xlabel("gene mean")
    ax.set_ylabel("gene variance")
    ax.legend()
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_file
    return fig


def plot_mean_dropout(adata, out_file=None):
    """Per-gene mean vs empirical dropout with NB/ZINB zero curves
    (utils.py:119-156)."""
    plt = _plt()
    X = _dense(adata.X if not hasattr(adata, "raw") or adata.raw is None else adata.raw.X)
    mu = X.mean(0)
    dropout = (X == 0).mean(0)
    theta = estimate_theta_moments(X)
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.semilogx(np.maximum(mu, 1e-3), dropout, ".", alpha=0.3, label="genes")
    xs = np.logspace(-3, np.log10(max(mu.max(), 1.0)), 100)
    ax.semilogx(xs, nb_zero(theta, xs), "r-", label=f"NB zeros (theta={theta:.2f})")
    ax.semilogx(xs, np.exp(-xs), "k--", label="Poisson zeros")
    ax.set_xlabel("gene mean")
    ax.set_ylabel("empirical dropout")
    ax.legend()
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_file
    return fig


def plot_zeroinf(adata, out_file=None):
    """Zero-inflation check (utils.py:98-117 spirit): per-gene EXCESS zero
    fraction — empirical zeros minus the NB expectation at a moment-estimated
    global theta — against the gene mean.  Points above zero indicate
    zero-inflation.  (No per-bin ZINB fit is performed; use
    :func:`zero_inflation_test` for a formal LRT.)"""
    plt = _plt()
    X = _dense(adata.X if not hasattr(adata, "raw") or adata.raw is None else adata.raw.X)
    mu = X.mean(0)
    dropout = (X == 0).mean(0)
    theta = estimate_theta_moments(X)
    expected = nb_zero(theta, mu)
    excess = dropout - expected
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.semilogx(np.maximum(mu, 1e-3), excess, ".", alpha=0.4)
    ax.axhline(0.0, color="k", lw=1)
    ax.set_xlabel("gene mean")
    ax.set_ylabel("empirical - NB expected zero fraction")
    if out_file:
        fig.savefig(out_file, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return out_file
    return fig
