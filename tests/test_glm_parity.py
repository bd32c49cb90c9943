"""Statistical parity oracle: recover R's NB/ZINB GLM dispersion on the
biochemists dataset (the reference's only numerical correctness oracle,
SURVEY.md §4; ground truth from data/biochemists-{nb,zinb}-coef.tsv generated
by data/biochemists.R:16-42).

A zero-hidden-layer 'nb'/'zinb' autoencoder with exp mean link IS the GLM:
mean = clip(exp(Wx+b)), theta = clip(exp(theta_param)) gene-wise constant —
resurrecting the stale data/test-biochemists-*.py scripts as asserting tests.
"""

import os

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from dca_tpu.models import AE_types
from dca_tpu.train.optim import get_optimizer

REF_DATA = "/root/reference/data"

R_NB_THETA = 2.2643876948599235  # biochemists-nb-coef.tsv
R_ZINB_THETA = 2.6547660033812437  # biochemists-zinb-coef.tsv


@pytest.fixture(scope="module")
def biochemists():
    df = pd.read_csv(os.path.join(REF_DATA, "biochemists.tsv"), sep="\t")
    y = df["art"].to_numpy(np.float32).reshape(-1, 1)
    X = df[["fem", "mar", "kid5", "phd", "ment"]].to_numpy(np.float32)
    return X, y


def _fit(net, X, y, steps, lr=0.05, seed=0):
    """Full-batch Adam on the model's own loss_fn (GLM-style fit)."""
    opt = get_optimizer("adam", clipvalue=None)
    params, state = net.params, net.state
    opt_state = opt.init(params)
    sf = np.ones((X.shape[0],), np.float32)

    @jax.jit
    def step(params, state, opt_state):
        (loss, new_state), grads = jax.value_and_grad(net.loss_fn, has_aux=True)(
            params, state, X, sf, y, False, None
        )
        params, opt_state = opt.update(grads, opt_state, params, jnp.float32(lr))
        return params, new_state, opt_state, loss

    for i in range(steps):
        params, state, opt_state, loss = step(params, state, opt_state)
    net.params, net.state = params, state
    return float(loss)


@pytest.mark.slow
def test_nb_glm_theta_recovery(biochemists):
    X, y = biochemists
    net = AE_types["nb"](
        input_size=X.shape[1], output_size=1, hidden_size=(), batchnorm=False
    )
    net.build()
    _fit(net, X, y, steps=4000, lr=0.03)
    theta_hat = float(net.dispersion())
    assert abs(theta_hat - R_NB_THETA) / R_NB_THETA < 0.05, theta_hat


@pytest.mark.slow
def test_nb_glm_predictions(biochemists):
    """Fitted means vs R glm.nb predictions (biochemists-nb-predictions.tsv)."""
    X, y = biochemists
    net = AE_types["nb"](
        input_size=X.shape[1], output_size=1, hidden_size=(), batchnorm=False
    )
    net.build()
    _fit(net, X, y, steps=4000, lr=0.03)
    preds = net.forward(X)["mean"].ravel()
    ref = pd.read_csv(os.path.join(REF_DATA, "biochemists-nb-predictions.tsv"))[
        "count"
    ].to_numpy()
    corr = np.corrcoef(preds, ref)[0, 1]
    assert corr > 0.99, corr
    assert abs(preds.mean() - ref.mean()) / ref.mean() < 0.05


@pytest.mark.slow
def test_zinb_glm_theta_recovery(biochemists):
    X, y = biochemists
    net = AE_types["zinb"](
        input_size=X.shape[1], output_size=1, hidden_size=(), batchnorm=False
    )
    net.build()
    _fit(net, X, y, steps=6000, lr=0.03)
    theta_hat = float(net.dispersion())
    # pscl::zeroinfl theta = 2.6548; tolerance 10% (different optimizer path)
    assert abs(theta_hat - R_ZINB_THETA) / R_ZINB_THETA < 0.10, theta_hat
