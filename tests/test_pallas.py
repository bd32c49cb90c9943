"""Pallas fused-loss kernels vs the pure-JAX reference implementation
(interpret mode on CPU; the same kernels compile on TPU — exercised by
bench.py and scripts/tpu_smoke.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dca_tpu import losses
from dca_tpu.ops import special
from dca_tpu.ops.fused_loss import zinb_nll_fused, nb_nll_fused

import scipy.special as ss


def _data(B, G, seed=0):
    rs = np.random.RandomState(seed)
    y = rs.negative_binomial(2, 0.4, size=(B, G)).astype(np.float32)
    y[rs.uniform(size=y.shape) < 0.3] = 0.0
    mu = rs.uniform(0.1, 8.0, size=(B, G)).astype(np.float32)
    th = rs.uniform(0.1, 5.0, size=(B, G)).astype(np.float32)
    pi = rs.uniform(0.05, 0.7, size=(B, G)).astype(np.float32)
    return jnp.asarray(y), jnp.asarray(mu), jnp.asarray(th), jnp.asarray(pi)


class TestSpecialFunctions:
    def test_lgamma(self):
        x = np.logspace(-4, 6, 500).astype(np.float32)
        got = np.asarray(special.lgamma(x))
        ref = ss.gammaln(x.astype(np.float64))
        assert np.max(np.abs(got - ref) / (np.abs(ref) + 1.0)) < 1e-5

    def test_digamma(self):
        x = np.logspace(-4, 6, 500).astype(np.float32)
        got = np.asarray(special.digamma(x))
        ref = ss.digamma(x.astype(np.float64))
        assert np.max(np.abs(got - ref) / (np.abs(ref) + 1.0)) < 1e-5


@pytest.mark.parametrize("shape", [(16, 128), (32, 200), (100, 300), (7, 50)])
def test_zinb_forward_matches_reference(shape):
    y, mu, th, pi = _data(*shape)
    ref = float(losses.zinb_nll(y, mu, th, pi, ridge_lambda=0.1))
    got = float(zinb_nll_fused(y, mu, th, pi, 0.1, True))
    assert abs(got - ref) / abs(ref) < 1e-4, (got, ref)


@pytest.mark.parametrize("shape", [(16, 128), (33, 170)])
def test_nb_forward_matches_reference(shape):
    y, mu, th, _ = _data(*shape, seed=3)
    ref = float(losses.nb_nll(y, mu, th))
    got = float(nb_nll_fused(y, mu, th, 1.0, True))
    assert abs(got - ref) / abs(ref) < 1e-4, (got, ref)


def test_zinb_gradients_match_autodiff():
    y, mu, th, pi = _data(24, 96, seed=5)

    ref_g = jax.grad(
        lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05),
        argnums=(0, 1, 2),
    )(mu, th, pi)
    got_g = jax.grad(
        lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, True), argnums=(0, 1, 2)
    )(mu, th, pi)
    for r, g in zip(ref_g, got_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-3, atol=1e-5)


def test_nb_gradients_match_autodiff():
    y, mu, th, _ = _data(16, 130, seed=6)
    ref_g = jax.grad(lambda m, t: losses.nb_nll(y, m, t), argnums=(0, 1))(mu, th)
    got_g = jax.grad(
        lambda m, t: nb_nll_fused(y, m, t, 1.0, True), argnums=(0, 1)
    )(mu, th)
    for r, g in zip(ref_g, got_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-3, atol=1e-5)


def test_theta_clip_grad_zero():
    y, mu, th, pi = _data(8, 128, seed=7)
    th = th.at[0, 0].set(2e6)  # above clip
    g = jax.grad(lambda t: zinb_nll_fused(y, mu, t, pi, 0.0, True))(th)
    assert float(g[0, 0]) == 0.0


def test_edge_padding_masked():
    """Non-tile-aligned shapes must not leak padding into the sum."""
    y, mu, th, pi = _data(13, 77, seed=8)
    ref = float(losses.zinb_nll(y, mu, th, pi))
    got = float(zinb_nll_fused(y, mu, th, pi, 0.0, True))
    assert abs(got - ref) / abs(ref) < 1e-4
