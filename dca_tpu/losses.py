"""Count-likelihood loss library (pure JAX reference implementations).

TPU-native re-implementation of the reference loss surface
(``/root/reference/dca/loss.py:6-156``).  These are pure functions over
``(y_true, mean, theta, pi)`` arrays instead of TF graph closures; the model
forward pass returns the distribution-parameter pytree directly and the loss
consumes it (no SliceLayer tricks, cf. reference ``network.py:382``).

Numerical contract (must match the reference bit-for-bit in op order):
  * eps = 1e-10                      (loss.py:65)
  * theta clipped at 1e6             (loss.py:85)
  * zero-count threshold y < 1e-8    (loss.py:138)
  * ridge penalty  lambda * pi**2    (loss.py:139-140)
  * mean (not sum) reduction         (loss.py:111,146)
  * NaN-masking: NaN entries of y_true are masked out; the mean divides by
    the count of non-NaN elements    (loss.py:6-20)
  * NB: nan2inf applied elementwise BEFORE reduction (loss.py:105)
  * ZINB: nan2inf applied AFTER reduction (loss.py:148)

All computations are float32 — the reference casts inputs to float32
(loss.py:77-78) and TPU lgamma is evaluated in f32.

``sample_weights`` is a rebuild extension (not in the reference): a per-row
weight vector used by the padded-batch training path so that padding rows
contribute exactly zero loss and zero gradient while keeping shapes static
for XLA.  With ``sample_weights=None`` the semantics are exactly the
reference's.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp

EPS = 1e-10
THETA_CLIP = 1e6
ZERO_THRESHOLD = 1e-8


def _nan2zero(x):
    # loss.py:6-7
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def _nan2inf(x):
    # loss.py:9-10
    return jnp.where(jnp.isnan(x), jnp.full_like(x, jnp.inf), x)


def _nelem(x):
    # loss.py:12-14 — number of non-NaN elements, clamped to 1 to avoid 0/0
    nelem = jnp.sum((~jnp.isnan(x)).astype(jnp.float32))
    return jnp.where(nelem == 0.0, 1.0, nelem).astype(x.dtype)


def _reduce_mean_nan(x):
    # loss.py:17-20
    nelem = _nelem(x)
    return jnp.sum(_nan2zero(x)) / nelem


def _apply_weights(elem, y_true, sample_weights):
    """Weighted mean over elements; weights broadcast per row.

    Used only by the padded static-shape training path.  NaN elements of
    ``y_true`` are additionally masked (weight 0) to compose with the
    reference's masking semantics.
    """
    w = jnp.broadcast_to(sample_weights[:, None], elem.shape).astype(elem.dtype)
    valid = ~jnp.isnan(y_true)
    w = w * valid.astype(elem.dtype)
    total = jnp.sum(w)
    total = jnp.where(total == 0.0, 1.0, total)
    return jnp.sum(_nan2zero(elem) * w) / total


def mse_loss(y_true, y_pred, sample_weights: Optional[jax.Array] = None):
    """Masked MSE (loss.py:23-26)."""
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32)
    ret = jnp.square(y_pred - y_true)
    if sample_weights is not None:
        return _apply_weights(ret, y_true, sample_weights)
    return _reduce_mean_nan(ret)


def poisson_loss(y_true, y_pred, sample_weights: Optional[jax.Array] = None):
    """Poisson NLL averaged over non-NaN elements (loss.py:33-48).

    ``ret = y_pred - y*log(y_pred + 1e-10) + lgamma(y+1)``
    """
    y_pred = jnp.asarray(y_pred, jnp.float32)
    y_true = jnp.asarray(y_true, jnp.float32)

    if sample_weights is not None:
        y_masked = _nan2zero(y_true)
        ret = (
            y_pred
            - y_masked * jnp.log(y_pred + 1e-10)
            + jax.lax.lgamma(y_masked + 1.0)
        )
        return _apply_weights(ret, y_true, sample_weights)

    nelem = _nelem(y_true)
    y_true = _nan2zero(y_true)
    ret = y_pred - y_true * jnp.log(y_pred + 1e-10) + jax.lax.lgamma(y_true + 1.0)
    return jnp.sum(ret) / nelem


def nb_nll(
    y_true,
    y_pred,
    theta,
    *,
    masking: bool = False,
    scale_factor: float = 1.0,
    mean: bool = True,
    sample_weights: Optional[jax.Array] = None,
    debug: bool = False,
):
    """Negative binomial negative log-likelihood (loss.py:60-114).

    ``theta`` broadcasts against ``y_pred`` — per-(cell,gene) for conddisp,
    (1, G) for constant dispersion, (B, 1) for shared dispersion.

    ``debug=True`` adds checkify finite-ness asserts on ``y_pred``, ``t1``
    and ``t2`` — the reference's tf.verify_tensor_all_finite sanitizer
    (loss.py:90-97); the caller must discharge the checks with
    jax.experimental.checkify (see train/loop.py).
    """
    eps = EPS
    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32) * scale_factor

    if masking and sample_weights is None:
        # loss.py:80-82 — applied regardless of `mean` (the ZINB caller relies
        # on the elementwise path seeing NaN-zeroed counts)
        nelem = _nelem(y_true)
        y_true = _nan2zero(y_true)

    theta = jnp.minimum(jnp.asarray(theta, jnp.float32), THETA_CLIP)  # loss.py:85

    if debug:
        _debug_assert_finite(y_pred, "y_pred")  # loss.py:90-91

    y_for_terms = _nan2zero(y_true) if sample_weights is not None else y_true

    t1 = (
        jax.lax.lgamma(theta + eps)
        + jax.lax.lgamma(y_for_terms + 1.0)
        - jax.lax.lgamma(y_for_terms + theta + eps)
    )  # loss.py:87
    # log(1.0 + x), NOT log1p: the reference forms 1+x then takes the log
    # (loss.py:88) and this module is the bit-for-bit op-order oracle; the
    # Pallas kernel may use log1p (equivalence-tested within tolerance)
    t2 = (theta + y_for_terms) * jnp.log(1.0 + y_pred / (theta + eps)) + (
        y_for_terms * (jnp.log(theta + eps) - jnp.log(y_pred + eps))
    )  # loss.py:88

    if debug:
        _debug_assert_finite(t1, "t1")  # loss.py:92-97
        _debug_assert_finite(t2, "t2")

    final = _nan2inf(t1 + t2)  # loss.py:105

    if not mean:
        return final

    if sample_weights is not None:
        return _apply_weights(final, y_true, sample_weights)
    if masking:
        return jnp.sum(final) / nelem  # loss.py:109
    return jnp.mean(final)  # loss.py:111


def zinb_nll(
    y_true,
    y_pred,
    theta,
    pi,
    *,
    ridge_lambda: float = 0.0,
    masking: bool = False,
    scale_factor: float = 1.0,
    mean: bool = True,
    sample_weights: Optional[jax.Array] = None,
    debug: bool = False,
):
    """Zero-inflated NB negative log-likelihood (loss.py:116-156).

    ``nb_case  = NB_elementwise - log(1 - pi + eps)``        (loss.py:130)
    ``zero_nb  = (theta / (theta + mu + eps)) ** theta``     (loss.py:136)
    ``zero_case = -log(pi + (1 - pi) * zero_nb + eps)``      (loss.py:137)
    selected where ``y < 1e-8``; plus ``ridge_lambda*pi^2``  (loss.py:138-140)
    """
    eps = EPS
    nb_elem = nb_nll(
        y_true,
        y_pred,
        theta,
        masking=masking,
        scale_factor=scale_factor,
        mean=False,
        sample_weights=sample_weights,
        debug=debug,  # NB.loss carries the asserts (reference loss.py:130)
    )
    pi = jnp.asarray(pi, jnp.float32)
    nb_case = nb_elem - jnp.log(1.0 - pi + eps)  # loss.py:130

    y_true = jnp.asarray(y_true, jnp.float32)
    y_pred = jnp.asarray(y_pred, jnp.float32) * scale_factor
    theta = jnp.minimum(jnp.asarray(theta, jnp.float32), THETA_CLIP)

    zero_nb = jnp.power(theta / (theta + y_pred + eps), theta)  # loss.py:136
    zero_case = -jnp.log(pi + ((1.0 - pi) * zero_nb) + eps)  # loss.py:137
    result = jnp.where(y_true < ZERO_THRESHOLD, zero_case, nb_case)  # loss.py:138
    ridge = ridge_lambda * jnp.square(pi)  # loss.py:139
    result = result + ridge

    if mean:
        if sample_weights is not None:
            result = _apply_weights(result, y_true, sample_weights)
        elif masking:
            result = _reduce_mean_nan(result)  # loss.py:144
        else:
            result = jnp.mean(result)  # loss.py:146

    result = _nan2inf(result)  # loss.py:148 — after reduction
    return result


def nb_terms(y_true, y_pred, theta, *, scale_factor: float = 1.0):
    """The two NB NLL summands the reference's debug mode histograms to
    TensorBoard (loss.py:87-88,96-97: ``t1`` = lgamma terms, ``t2`` = the
    log-ratio terms).  Used by the trainer's ``--debug --tensorboard``
    per-epoch histogram logging (train/loop.py _TBLogger)."""
    eps = EPS
    y_true = _nan2zero(jnp.asarray(y_true, jnp.float32))
    y_pred = jnp.asarray(y_pred, jnp.float32) * scale_factor
    theta = jnp.minimum(jnp.asarray(theta, jnp.float32), THETA_CLIP)
    t1 = (
        jax.lax.lgamma(theta + eps)
        + jax.lax.lgamma(y_true + 1.0)
        - jax.lax.lgamma(y_true + theta + eps)
    )
    t2 = (theta + y_true) * jnp.log(1.0 + y_pred / (theta + eps)) + (
        y_true * (jnp.log(theta + eps) - jnp.log(y_pred + eps))
    )
    return t1, t2


def _debug_assert_finite(x, name):
    """Numerical sanitizer: the checkify analogue of the reference's
    tf.verify_tensor_all_finite asserts (loss.py:90-97).  The check is
    functionalized by jax.experimental.checkify, survives jit/grad/scan,
    and surfaces as a JaxRuntimeError at the training loop's per-epoch
    err.throw() (train/loop.py)."""
    from jax.experimental import checkify

    checkify.check(
        jnp.all(jnp.isfinite(x)), "dca_tpu debug: " + name + " has inf/nan"
    )
