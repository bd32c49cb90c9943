"""Fused Pallas TPU kernels for the ZINB/NB negative log-likelihood.

The reference's hot loss is a long elementwise chain over (B, G) built from
TF ops (loss.py:60-156).  Here it is a single Pallas kernel per direction:

  * forward: one pass over (y, mu, theta, pi) tiles in VMEM producing
    per-block partial sums — no (B, G) intermediate ever hits HBM;
  * backward: custom VJP with ANALYTIC gradients (d/dmu, d/dtheta, d/dpi)
    recomputed in one fused pass, instead of XLA taping ~20 intermediates.

lgamma/digamma are not available in Mosaic (probed: NotImplementedError), so
the kernels use the in-package Stirling implementations (ops/special.py,
verified to ~2e-6 against scipy).

Numerics match ``dca_tpu.losses.zinb_nll``/``nb_nll`` with
masking=True, mean reduction (the training configuration — identical to
masking=False on finite targets): eps=1e-10, theta clip 1e6, zero branch at
y<1e-8, ridge*pi^2, and the reference's NaN-target masking
(loss.py:6-20,80-82): NaN counts are zeroed before the elementwise terms
(contributing the y=0 likelihood to the numerator, exactly as the
reference does) and the NB mean divides by the number of non-NaN targets.
mu/theta/pi must still be finite.  Equivalence + gradient tests:
tests/test_pallas.py (interpret mode on CPU, compiled on TPU), including
NaN-target cases.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .special import lgamma, digamma

EPS = 1e-10
THETA_CLIP = 1e6
ZERO_THRESHOLD = 1e-8


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tiles(B, G):
    # (256, 512) f32 tiles: 4 operands + 3 outputs + ~10 live temporaries of
    # 512 KB each stay well under the 16 MB VMEM scoped limit (a (512, 1024)
    # tile OOMed at 36 MB on v5e).
    BM = min(_round_up(B, 8), 256)
    BN = min(_round_up(G, 128), 512)
    return BM, BN


def _elem_terms(y, mu, th_raw, pi, ridge):
    """Shared elementwise forward math (ZINB). Returns per-element NLL.

    NaN targets follow the reference's masking semantics (loss.py:80-82):
    the NLL terms are evaluated at y=0 (nan2zero), while the ZINB zero-count
    branch selects on the ORIGINAL y, so NaN (not < 1e-8) takes the NB case
    — exactly what losses.zinb_nll(masking=True) computes."""
    eps = EPS
    y0 = jnp.where(jnp.isnan(y), 0.0, y)
    th = jnp.minimum(th_raw, THETA_CLIP)
    t1 = lgamma(th + eps) + lgamma(y0 + 1.0) - lgamma(y0 + th + eps)
    t2 = (th + y0) * jnp.log1p(mu / (th + eps)) + y0 * (
        jnp.log(th + eps) - jnp.log(mu + eps)
    )
    nb = t1 + t2
    if pi is None:
        return nb
    nb_case = nb - jnp.log(1.0 - pi + eps)
    # pow via exp/log (pow not relied upon in Mosaic); th == 0 would give
    # 0 * log(0) = NaN, but losses.zinb_nll's jnp.power(0, 0) == 1 — guard
    # so the kernel stays equivalent on the full input domain
    zero_nb = jnp.where(
        th > 0.0,
        jnp.exp(th * (jnp.log(jnp.maximum(th, eps)) - jnp.log(th + mu + eps))),
        1.0,
    )
    zero_case = -jnp.log(pi + (1.0 - pi) * zero_nb + eps)
    res = jnp.where(y < ZERO_THRESHOLD, zero_case, nb_case)
    return res + ridge * pi * pi


def _elem_grads(y, mu, th_raw, pi, ridge):
    """Analytic elementwise gradients wrt (mu, theta, pi).

    NaN targets: the terms are evaluated at y=0 (matching the forward's
    nan2zero), so masked elements still contribute the y=0 likelihood's
    gradient — identical to autodiff through losses.*(masking=True)."""
    eps = EPS
    y0 = jnp.where(jnp.isnan(y), 0.0, y)
    th = jnp.minimum(th_raw, THETA_CLIP)
    th_e = th + eps
    mu_e = mu + eps
    thmu = th_e + mu

    dmu_nb = (th + y0) / thmu - y0 / mu_e
    dth_nb = (
        digamma(th_e)
        - digamma(y0 + th_e)
        + jnp.log1p(mu / th_e)
        + (th + y0) * (1.0 / thmu - 1.0 / th_e)
        + y0 / th_e
    )

    if pi is None:
        dth = jnp.where(th_raw > THETA_CLIP, 0.0, dth_nb)
        return dmu_nb, dth, None

    # same th == 0 guard as the forward (0*log(0) -> NaN; power(0,0) == 1)
    safe_th = jnp.maximum(th, eps)
    z = jnp.where(
        th > 0.0, jnp.exp(th * (jnp.log(safe_th) - jnp.log(th + mu + eps))), 1.0
    )
    denom = pi + (1.0 - pi) * z + eps
    dz_dmu = -z * th / (th + mu + eps)
    dz_dth = z * (
        jnp.log(safe_th) - jnp.log(th + mu + eps) + 1.0 - th / (th + mu + eps)
    )
    dmu_zero = -(1.0 - pi) * dz_dmu / denom
    dth_zero = -(1.0 - pi) * dz_dth / denom
    dpi_nb = 1.0 / (1.0 - pi + eps)
    dpi_zero = -(1.0 - z) / denom

    is_zero = y < ZERO_THRESHOLD
    dmu = jnp.where(is_zero, dmu_zero, dmu_nb)
    dth = jnp.where(is_zero, dth_zero, dth_nb)
    dth = jnp.where(th_raw > THETA_CLIP, 0.0, dth)
    dpi = jnp.where(is_zero, dpi_zero, dpi_nb) + 2.0 * ridge * pi
    return dmu, dth, dpi


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(y_ref, mu_ref, th_ref, pi_ref, w_ref, out_ref, cnt_ref, *, B,
                G, BM, BN, ridge, with_pi, with_w):
    i = pl.program_id(0)
    j = pl.program_id(1)
    y = y_ref[:]
    mu = mu_ref[:]
    th = th_ref[:]
    pi = pi_ref[:] if with_pi else None
    res = _elem_terms(y, mu, th, pi, ridge)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0) + i * BM
    cols = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1) + j * BN
    mask = (rows < B) & (cols < G)
    # out_ref/cnt_ref are the FULL (grid_i, grid_j) partial arrays in SMEM
    # (block == array, constant index_map — satisfies the TPU tile rule); each
    # grid step writes its own element, the host sums them.
    if with_w:
        # losses._apply_weights semantics: per-row weights broadcast over
        # genes, NaN targets additionally weight 0; the mean divides by the
        # total effective weight.  The (BM, 1) weight block broadcasts in
        # registers like the shared-theta operands.
        w = w_ref[:]
        valid = mask & ~jnp.isnan(y)
        out_ref[i, j] = jnp.sum(jnp.where(valid, res * w, 0.0))
        cnt_ref[i, j] = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        out_ref[i, j] = jnp.sum(jnp.where(mask, res, 0.0))
        # denominator contribution — reference masking semantics: NB divides
        # by the number of non-NaN TARGETS (loss.py:12-14,109); ZINB's
        # _reduce_mean_nan divides by the number of non-NaN RESULT elements
        # (loss.py:17-20,144), which for finite mu/theta/pi is every element.
        valid = mask & (~jnp.isnan(res) if with_pi else ~jnp.isnan(y))
        cnt_ref[i, j] = jnp.sum(valid.astype(jnp.float32))


def _bwd_kernel(scale_ref, y_ref, mu_ref, th_ref, pi_ref, w_ref, *out_refs,
                B, G, BM, BN, ridge, with_pi, with_w):
    i = pl.program_id(0)
    j = pl.program_id(1)
    scale = scale_ref[0, 0]
    y = y_ref[:]
    mu = mu_ref[:]
    th = th_ref[:]  # may be a (1, BN)/(BM, 1) broadcast block (see _op_spec)
    pi = pi_ref[:] if with_pi else None
    dmu, dth, dpi = _elem_grads(y, mu, th, pi, ridge)
    rows = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 0) + i * BM
    cols = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1) + j * BN
    mask = (rows < B) & (cols < G)
    zero = jnp.zeros((BM, BN), jnp.float32)
    if with_w:
        # d(weighted mean)/dx = g * w_eff / denom per element; the (B, 1)
        # weights broadcast over the gene dim, NaN targets get weight 0 —
        # padded rows therefore contribute EXACTLY zero gradient
        sel = mask & ~jnp.isnan(y)
        f = w_ref[:] * scale
        out_refs[0][:] = jnp.where(sel, dmu * f, zero)
        out_refs[1][:] = jnp.where(sel, dth * f, zero)
        if with_pi:
            out_refs[2][:] = jnp.where(sel, dpi * f, zero)
        return
    out_refs[0][:] = jnp.where(mask, dmu * scale, zero)
    out_refs[1][:] = jnp.where(mask, dth * scale, zero)
    if with_pi:
        out_refs[2][:] = jnp.where(mask, dpi * scale, zero)


def _op_spec(shape, BM, BN):
    """BlockSpec for a (B, G), (1, G) or (B, 1) operand.  Broadcast dims get
    block extent 1 with the block index pinned to 0, so the tile loads the
    shared row/column once and the elementwise math broadcasts IN REGISTERS
    — the (B, G) operand is never materialized in HBM (constant-dispersion
    NB/ZINB θ is (1, G); the *-shared variants' θ/π are (B, 1))."""
    rb, cb = shape
    bm = BM if rb != 1 else 1
    bn = BN if cb != 1 else 1
    row_bcast, col_bcast = rb == 1, cb == 1

    def imap(i, j):
        return (0 if row_bcast else i, 0 if col_bcast else j)

    return pl.BlockSpec((bm, bn), imap)


def _reduce_to(g, shape):
    """Sum a full (B, G) cotangent down to a broadcast operand's shape."""
    if tuple(g.shape) == tuple(shape):
        return g
    axes = tuple(a for a in range(2) if shape[a] == 1 and g.shape[a] != 1)
    return jnp.sum(g, axis=axes, keepdims=True)


def _pallas_fwd(y, mu, th, pi, ridge, interpret, w=None):
    B, G = y.shape
    BM, BN = _tiles(B, G)
    grid = (pl.cdiv(B, BM), pl.cdiv(G, BN))
    with_pi = pi is not None
    with_w = w is not None
    pi_in = pi if with_pi else th  # dummy operand to keep arity static
    w_in = w if with_w else th

    block = pl.BlockSpec((BM, BN), lambda i, j: (i, j))
    kernel = functools.partial(
        _fwd_kernel, B=B, G=G, BM=BM, BN=BN, ridge=ridge, with_pi=with_pi,
        with_w=with_w,
    )
    smem_out = pl.BlockSpec(grid, lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    partials, counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block, block, _op_spec(th.shape, BM, BN),
                  _op_spec(pi_in.shape, BM, BN),
                  _op_spec(w_in.shape, BM, BN)],
        out_specs=[smem_out, smem_out],
        out_shape=[
            jax.ShapeDtypeStruct(grid, jnp.float32),
            jax.ShapeDtypeStruct(grid, jnp.float32),
        ],
        interpret=interpret,
    )(y, mu, th, pi_in, w_in)
    total = jnp.sum(counts)
    if with_w:
        # losses._apply_weights clamps only EXACT zero (fractional totals
        # must divide as-is); the unweighted denominator is a whole count,
        # where max() and the reference's where(==0, 1) agree (loss.py:14)
        denom = jnp.where(total == 0.0, 1.0, total)
    else:
        denom = jnp.maximum(total, 1.0)
    return jnp.sum(partials) / denom, denom


def _pallas_bwd(y, mu, th, pi, ridge, scale, interpret, w=None):
    B, G = y.shape
    BM, BN = _tiles(B, G)
    grid = (pl.cdiv(B, BM), pl.cdiv(G, BN))
    with_pi = pi is not None
    with_w = w is not None
    pi_in = pi if with_pi else th
    w_in = w if with_w else th

    block = pl.BlockSpec((BM, BN), lambda i, j: (i, j))
    kernel = functools.partial(
        _bwd_kernel, B=B, G=G, BM=BM, BN=BN, ridge=ridge, with_pi=with_pi,
        with_w=with_w,
    )
    out_shape = jax.ShapeDtypeStruct((B, G), jnp.float32)
    n_out = 3 if with_pi else 2  # no dummy all-zero dpi HBM write for NB
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            block,
            block,
            _op_spec(th.shape, BM, BN),
            _op_spec(pi_in.shape, BM, BN),
            _op_spec(w_in.shape, BM, BN),
        ],
        out_specs=[block] * n_out,
        out_shape=[out_shape] * n_out,
        interpret=interpret,
    )(scale.reshape((1, 1)), y, mu, th, pi_in, w_in)
    dmu, dth = outs[0], outs[1]
    # broadcast θ/π cotangents reduce to the operand's shape — the grads are
    # computed full-tile in registers, summed here by XLA (training batches
    # only; eval never reaches the bwd pass)
    dth = _reduce_to(dth, th.shape)
    if with_pi:
        return dmu, dth, _reduce_to(outs[2], pi.shape)
    return dmu, dth, None


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def zinb_nll_fused(y, mu, theta, pi, ridge_lambda=0.0, interpret=False):
    """Mean ZINB NLL over (B, G) f32 arrays — fused Pallas forward+backward.

    Semantics == losses.zinb_nll(y, mu, theta, pi, ridge_lambda=...,
    masking=True, mean=True) — identical to masking=False on finite
    targets, and NaN targets are masked per the reference's semantics.
    mu must be (B, G); theta/pi may be (B, G), (1, G) (constant
    dispersion) or (B, 1) (*-shared) — broadcast dims are expanded inside
    the tile, never materialized in HBM, and their cotangents are
    sum-reduced back to the operand shape (the reference broadcasts θ
    implicitly, loss.py:60-156).  All values must be finite.
    """
    loss, _ = _pallas_fwd(y, mu, theta, pi, ridge_lambda, interpret)
    return loss


def _zinb_fwd(y, mu, theta, pi, ridge_lambda, interpret):
    loss, denom = _pallas_fwd(y, mu, theta, pi, ridge_lambda, interpret)
    return loss, (y, mu, theta, pi, denom)


def _zinb_bwd(ridge_lambda, interpret, res, g):
    y, mu, theta, pi, denom = res
    scale = (g / denom).astype(jnp.float32)
    dmu, dth, dpi = _pallas_bwd(y, mu, theta, pi, ridge_lambda, scale, interpret)
    return jnp.zeros_like(y), dmu, dth, dpi


zinb_nll_fused.defvjp(_zinb_fwd, _zinb_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def nb_nll_fused(y, mu, theta, scale_factor=1.0, interpret=False):
    """Mean NB NLL over (B, G) f32 arrays — fused Pallas forward+backward.

    Semantics == losses.nb_nll(y, mu, theta, masking=True, mean=True):
    NaN targets are zeroed for the terms and excluded from the mean's
    denominator (reference loss.py:80-82,109).  theta may be (B, G),
    (1, G) or (B, 1) — see zinb_nll_fused."""
    del scale_factor  # parity arg; callers pre-scale mu (always 1.0 in-tree)
    loss, _ = _pallas_fwd(y, mu, theta, None, 0.0, interpret)
    return loss


def _nb_fwd(y, mu, theta, scale_factor, interpret):
    loss, denom = _pallas_fwd(y, mu, theta, None, 0.0, interpret)
    return loss, (y, mu, theta, denom)


def _nb_bwd(scale_factor, interpret, res, g):
    y, mu, theta, denom = res
    scale = (g / denom).astype(jnp.float32)
    dmu, dth, _ = _pallas_bwd(y, mu, theta, None, 0.0, scale, interpret)
    return jnp.zeros_like(y), dmu, dth


nb_nll_fused.defvjp(_nb_fwd, _nb_bwd)


# ---------------------------------------------------------------------------
# weighted variants (rebuild extension — VERDICT r4 item 4)
# ---------------------------------------------------------------------------
#
# The auto-padded multi-process parts and validation chunks carry per-row
# sample weights (train/loop.py), which used to force those runs off the
# fused kernels.  These wrappers add a (B, 1) weight operand that rides the
# same in-tile broadcast machinery as shared theta/pi: semantics equal
# losses.*(sample_weights=w) — weighted mean with NaN targets weight 0,
# zero-weight (padding) rows contributing exactly nothing to value or
# gradient.


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def zinb_nll_fused_w(y, mu, theta, pi, w, ridge_lambda=0.0, interpret=False):
    """Weighted mean ZINB NLL == losses.zinb_nll(..., sample_weights=w).

    ``w`` is the per-row weight column, shape (B, 1) f32; everything else
    as zinb_nll_fused."""
    loss, _ = _pallas_fwd(y, mu, theta, pi, ridge_lambda, interpret, w=w)
    return loss


def _zinb_w_fwd(y, mu, theta, pi, w, ridge_lambda, interpret):
    loss, denom = _pallas_fwd(y, mu, theta, pi, ridge_lambda, interpret, w=w)
    return loss, (y, mu, theta, pi, w, denom)


def _zinb_w_bwd(ridge_lambda, interpret, res, g):
    y, mu, theta, pi, w, denom = res
    scale = (g / denom).astype(jnp.float32)
    dmu, dth, dpi = _pallas_bwd(y, mu, theta, pi, ridge_lambda, scale,
                                interpret, w=w)
    return jnp.zeros_like(y), dmu, dth, dpi, jnp.zeros_like(w)


zinb_nll_fused_w.defvjp(_zinb_w_fwd, _zinb_w_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def nb_nll_fused_w(y, mu, theta, w, interpret=False):
    """Weighted mean NB NLL == losses.nb_nll(..., sample_weights=w).

    ``w`` is the per-row weight column, shape (B, 1) f32."""
    loss, _ = _pallas_fwd(y, mu, theta, None, 0.0, interpret, w=w)
    return loss


def _nb_w_fwd(y, mu, theta, w, interpret):
    loss, denom = _pallas_fwd(y, mu, theta, None, 0.0, interpret, w=w)
    return loss, (y, mu, theta, w, denom)


def _nb_w_bwd(interpret, res, g):
    y, mu, theta, w, denom = res
    scale = (g / denom).astype(jnp.float32)
    dmu, dth, _ = _pallas_bwd(y, mu, theta, None, 0.0, scale, interpret, w=w)
    return jnp.zeros_like(y), dmu, dth, jnp.zeros_like(w)


nb_nll_fused_w.defvjp(_nb_w_fwd, _nb_w_bwd)
