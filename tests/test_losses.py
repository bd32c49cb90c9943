"""Loss kernels vs scipy / closed forms — the correctness keystone
(SURVEY.md §7 step 1).  Oracles: scipy.stats.{poisson,nbinom}.logpmf and the
explicit ZINB zero-probability mixture (reference utils.py:11-12)."""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

from dca_tpu import losses


def _rand(shape, seed=0, scale=5.0):
    rs = np.random.RandomState(seed)
    return rs.uniform(0.1, scale, size=shape).astype(np.float32)


class TestPoisson:
    def test_matches_scipy(self):
        rs = np.random.RandomState(1)
        y = rs.poisson(3.0, size=(16, 8)).astype(np.float32)
        mu = _rand((16, 8), 2)
        ours = float(losses.poisson_loss(y, mu))
        ref = -st.poisson.logpmf(y, mu).mean()
        assert abs(ours - ref) < 1e-3

    def test_nan_masking(self):
        y = np.array([[1.0, np.nan], [2.0, 3.0]], np.float32)
        mu = np.ones_like(y) * 2.0
        ours = float(losses.poisson_loss(y, mu))
        valid = -st.poisson.logpmf(np.array([1.0, 2.0, 3.0]), 2.0)
        # reference divides the sum over nan-zeroed entries by n_valid; the
        # NaN element contributes y_pred - 0*log + lgamma(1) = mu
        expected = (valid.sum() + 2.0) / 3.0
        assert abs(ours - expected) < 1e-4


class TestNB:
    @pytest.mark.parametrize("theta_shape", [(16, 8), (1, 8), (16, 1)])
    def test_matches_scipy(self, theta_shape):
        rs = np.random.RandomState(3)
        y = rs.negative_binomial(2, 0.4, size=(16, 8)).astype(np.float32)
        mu = _rand((16, 8), 4)
        theta = _rand(theta_shape, 5, scale=3.0)
        ours = float(losses.nb_nll(y, mu, theta))
        t = np.broadcast_to(theta, y.shape)
        # NB param conversion: n=theta, p=theta/(theta+mu)
        ref = -st.nbinom.logpmf(y, t, t / (t + mu)).mean()
        assert abs(ours - ref) / abs(ref) < 1e-4

    def test_elementwise_mode(self):
        y = _rand((4, 4), 6).round()
        mu = _rand((4, 4), 7)
        theta = _rand((4, 4), 8)
        elem = losses.nb_nll(y, mu, theta, mean=False)
        assert elem.shape == (4, 4)
        assert abs(float(jnp.mean(elem)) - float(losses.nb_nll(y, mu, theta))) < 1e-5

    def test_masking_flag(self):
        y = np.array([[1.0, np.nan], [0.0, 3.0]], np.float32)
        mu = _rand((2, 2), 9)
        theta = np.full((2, 2), 2.0, np.float32)
        masked = float(losses.nb_nll(y, mu, theta, masking=True))
        assert np.isfinite(masked)
        unmasked = float(losses.nb_nll(y, mu, theta, masking=False))
        assert np.isinf(unmasked)  # nan2inf then mean -> inf

    def test_theta_clip(self):
        y = _rand((4, 4), 10).round()
        mu = _rand((4, 4), 11)
        big = np.full((4, 4), 1e12, np.float32)
        clipped = np.full((4, 4), 1e6, np.float32)
        a = float(losses.nb_nll(y, mu, big))
        b = float(losses.nb_nll(y, mu, clipped))
        assert abs(a - b) < 1e-6

    def test_scale_factor(self):
        y = _rand((4, 4), 12).round()
        mu = _rand((4, 4), 13)
        theta = _rand((4, 4), 14)
        a = float(losses.nb_nll(y, mu * 2.0, theta))
        b = float(losses.nb_nll(y, mu, theta, scale_factor=2.0))
        assert abs(a - b) < 1e-5


class TestZINB:
    def test_matches_explicit_mixture(self):
        rs = np.random.RandomState(15)
        y = rs.negative_binomial(2, 0.4, size=(32, 16)).astype(np.float32)
        y[rs.uniform(size=y.shape) < 0.3] = 0.0
        mu = _rand((32, 16), 16)
        theta = _rand((32, 16), 17, scale=3.0)
        pi = rs.uniform(0.05, 0.6, size=(32, 16)).astype(np.float32)

        ours = float(losses.zinb_nll(y, mu, theta, pi))

        nb_logpmf = st.nbinom.logpmf(y, theta, theta / (theta + mu))
        ll = np.where(
            y < 1e-8,
            np.log(pi + (1 - pi) * np.power(theta / (theta + mu), theta)),
            np.log(1 - pi) + nb_logpmf,
        )
        ref = -ll.mean()
        assert abs(ours - ref) / abs(ref) < 1e-4

    def test_ridge(self):
        y = _rand((8, 4), 18).round()
        mu = _rand((8, 4), 19)
        theta = _rand((8, 4), 20)
        pi = np.full((8, 4), 0.3, np.float32)
        base = float(losses.zinb_nll(y, mu, theta, pi, ridge_lambda=0.0))
        ridged = float(losses.zinb_nll(y, mu, theta, pi, ridge_lambda=0.5))
        assert abs((ridged - base) - 0.5 * 0.09) < 1e-5

    def test_pi_zero_reduces_to_nb(self):
        y = _rand((8, 4), 21).round()
        y[0, 0] = 0.0
        mu = _rand((8, 4), 22)
        theta = _rand((8, 4), 23)
        pi = np.zeros((8, 4), np.float32)
        z = float(losses.zinb_nll(y, mu, theta, pi))
        n = float(losses.nb_nll(y, mu, theta))
        assert abs(z - n) < 1e-4

    def test_sample_weights_match_subset(self):
        """Weighted loss over padded rows == unweighted loss over the valid
        subset (the static-shape padding contract)."""
        y = _rand((8, 4), 24).round()
        mu = _rand((8, 4), 25)
        theta = _rand((8, 4), 26)
        pi = np.full((8, 4), 0.2, np.float32)
        w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
        weighted = float(losses.zinb_nll(y, mu, theta, pi, sample_weights=w))
        subset = float(losses.zinb_nll(y[:5], mu[:5], theta[:5], pi[:5]))
        assert abs(weighted - subset) < 1e-5


class TestMSE:
    def test_basic(self):
        y = _rand((4, 4), 27)
        p = _rand((4, 4), 28)
        assert abs(float(losses.mse_loss(y, p)) - np.mean((y - p) ** 2)) < 1e-6

    def test_nan(self):
        y = np.array([[1.0, np.nan]], np.float32)
        p = np.array([[2.0, 5.0]], np.float32)
        assert abs(float(losses.mse_loss(y, p)) - 1.0) < 1e-6


class TestGradients:
    def test_zinb_grads_finite(self):
        y = _rand((8, 4), 29).round()
        y[0, :2] = 0.0
        mu = _rand((8, 4), 30)
        theta = _rand((8, 4), 31)
        pi = np.full((8, 4), 0.3, np.float32)

        def f(mu, theta, pi):
            return losses.zinb_nll(y, mu, theta, pi, ridge_lambda=0.1)

        g = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(mu), jnp.asarray(theta), jnp.asarray(pi)
        )
        for gi in g:
            assert np.all(np.isfinite(np.asarray(gi)))

    def test_zinb_grad_matches_analytic(self):
        """Autodiff vs closed-form d(mean ZINB NLL)/d mu for both branches."""
        y = np.array([[0.0, 3.0]], np.float32)
        mu0 = np.array([[1.5, 2.5]], np.float32)
        theta = np.array([[2.0, 2.0]], np.float32)
        pi = np.array([[0.3, 0.3]], np.float32)
        n_elem = y.size

        def f(mu):
            return losses.zinb_nll(y, mu, theta, pi)

        g = np.asarray(jax.grad(f)(jnp.asarray(mu0)))

        # NB branch (y>0): d/dmu = (theta+y)/(theta+mu) - y/mu
        nb_grad = ((theta[0, 1] + y[0, 1]) / (theta[0, 1] + mu0[0, 1]) - y[0, 1] / mu0[0, 1])
        # zero branch: d/dmu = (1-pi)*zero_nb*theta / ((theta+mu)*(pi+(1-pi)*zero_nb))
        zero_nb = (theta[0, 0] / (theta[0, 0] + mu0[0, 0])) ** theta[0, 0]
        denom = pi[0, 0] + (1 - pi[0, 0]) * zero_nb
        zero_grad = (1 - pi[0, 0]) * zero_nb * theta[0, 0] / (
            (theta[0, 0] + mu0[0, 0]) * denom
        )
        assert abs(g[0, 0] - zero_grad / n_elem) < 1e-5
        assert abs(g[0, 1] - nb_grad / n_elem) < 1e-5
