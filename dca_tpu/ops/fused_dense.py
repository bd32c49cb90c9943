"""Fused Pallas TPU kernel: Dense -> BatchNorm(center-only) -> Activation
[-> size-factor ColwiseMult] in a single pass.

This is the TPU-native equivalent of the reference's per-layer Keras stack
Dense -> BatchNormalization(center=True, scale=False) -> Activation
(/root/reference/dca/network.py:124-138) and of the output-head epilogues
MeanAct/DispAct/sigmoid + ColwiseMultLayer
(/root/reference/dca/network.py:368-381, layers.py:85), collapsed into one
kernel so the (B, N) pre-activation never round-trips through HBM:

    out = act((x @ W + b) * s + t) [* sf]        # inference BN folded:
    s = rsqrt(moving_var + eps), t = beta - moving_mean * s

The matmul runs on the MXU with a K-blocked f32 VMEM accumulator; the BN
affine, activation, and column-wise size-factor multiply are applied as the
epilogue of the LAST K step, on the tile already resident in VMEM.

Scope: inference path only (training BN needs cross-batch statistics, which
XLA already handles well in the jitted train step).  Intended for the big
denoising predicts — the heads are (B, 64) @ (64, G) with G up to ~30k genes,
where the fused epilogue saves one full (B, G) HBM round trip per head.
XLA remains the default executor (it fuses most of this on its own); enable
with DCA_TPU_FUSED_DENSE=1 (config.use_fused_dense).

Equivalence tests vs the pure-JAX model stack: tests/test_pallas.py
(interpret mode on CPU; compiled on TPU via scripts/tpu_smoke.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import MeanAct, DispAct, get_activation

BN_EPS = 1e-3  # Keras BatchNormalization default (models/core.py BN_EPS)

# epilogue activations usable inside the kernel (pure elementwise jnp/lax)
_EPILOGUES = {
    "mean": MeanAct,        # clip(exp(x), 1e-5, 1e6)   network.py:38
    "disp": DispAct,        # clip(softplus(x),1e-4,1e4) network.py:39
    "sigmoid": jax.nn.sigmoid,
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


def supported_activation(name) -> bool:
    return name in _EPILOGUES


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, b_ref, s_ref, t_ref, sf_ref, o_ref, acc_ref, *,
            nk, activation, with_bn, with_sf):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _epilogue():
        z = acc_ref[:] + b_ref[:]
        if with_bn:
            z = z * s_ref[:] + t_ref[:]
        z = _EPILOGUES[activation](z)
        if with_sf:
            z = z * sf_ref[:]
        o_ref[:] = z


def fused_dense_block(
    x,
    kernel,
    bias,
    *,
    bn=None,
    activation="linear",
    size_factors=None,
    interpret=False,
    block_b=256,
    block_n=512,
    block_k=512,
):
    """act(BN(x @ kernel + bias)) [* size_factors] in one fused Pallas pass.

    x: (B, K) f32; kernel: (K, N); bias: (N,);
    bn: None or (moving_mean, moving_var, beta) each (N,) — inference
    statistics, folded into a per-column affine;
    activation: one of _EPILOGUES (incl. the head epilogues 'mean'/'disp');
    size_factors: None or (B,) column-wise multiplier (ColwiseMultLayer).
    """
    x = jnp.asarray(x, jnp.float32)
    kernel = jnp.asarray(kernel, jnp.float32)
    B, K = x.shape
    K2, N = kernel.shape
    assert K == K2, (x.shape, kernel.shape)
    if activation not in _EPILOGUES:
        raise ValueError(f"activation {activation!r} not fusable; "
                         f"available: {sorted(_EPILOGUES)}")

    # honor DCA_TPU_MATMUL: bf16 operands (MXU-native, halves the weight
    # stream's HBM bytes) with the f32 VMEM accumulator unchanged
    from ..config import matmul_dtype

    _dt = matmul_dtype()
    # bf16 blocks need sublane multiples of 16 (Mosaic's (16, 128) bf16
    # tile) — f32 only needs 8; BK is already a 128-multiple either way
    sublane = 16 if _dt is not None else 8
    BM = min(_round_up(B, sublane), block_b)
    BN = min(_round_up(N, 128), block_n)
    BK = min(_round_up(K, 128), block_k)
    Bp, Kp, Np = _round_up(B, BM), _round_up(K, BK), _round_up(N, BN)

    # zero-pad to tile multiples: zero K-padding adds 0 to the dot; padded
    # rows/cols are sliced off after the call (MeanAct of a padded 0 is
    # finite, so no NaN/inf leaks into the real region).
    xp = jnp.pad(x, ((0, Bp - B), (0, Kp - K)))
    wp = jnp.pad(kernel, ((0, Kp - K), (0, Np - N)))
    if _dt is not None:
        xp = xp.astype(_dt)
        wp = wp.astype(_dt)
    bp = jnp.pad(jnp.asarray(bias, jnp.float32).reshape(1, -1),
                 ((0, 0), (0, Np - N)))

    with_bn = bn is not None
    if with_bn:
        mm, mv, beta = (jnp.asarray(a, jnp.float32).reshape(-1) for a in bn)
        s = jax.lax.rsqrt(mv + BN_EPS)
        t = beta - mm * s
        # pad var-scale with 1s so padded columns stay finite
        sp = jnp.pad(s.reshape(1, -1), ((0, 0), (0, Np - N)), constant_values=1.0)
        tp = jnp.pad(t.reshape(1, -1), ((0, 0), (0, Np - N)))
    else:
        sp = jnp.ones((1, Np), jnp.float32)
        tp = jnp.zeros((1, Np), jnp.float32)

    with_sf = size_factors is not None
    if with_sf:
        sfp = jnp.pad(
            jnp.asarray(size_factors, jnp.float32).reshape(-1, 1),
            ((0, Bp - B), (0, 0)),
        )
    else:
        sfp = jnp.ones((Bp, 1), jnp.float32)

    grid = (Bp // BM, Np // BN, Kp // BK)
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            nk=grid[2],
            activation=activation,
            with_bn=with_bn,
            with_sf=with_sf,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),   # x
            pl.BlockSpec((BK, BN), lambda i, j, k: (k, j)),   # W
            pl.BlockSpec((1, BN), lambda i, j, k: (0, j)),    # bias
            pl.BlockSpec((1, BN), lambda i, j, k: (0, j)),    # BN scale
            pl.BlockSpec((1, BN), lambda i, j, k: (0, j)),    # BN shift
            pl.BlockSpec((BM, 1), lambda i, j, k: (i, 0)),    # size factors
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        interpret=interpret,
    )(xp, wp, bp, sp, tp, sfp)
    return out[:B, :N]
