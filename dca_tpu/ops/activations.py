"""Activation functions with the reference's exact output-head clips.

``MeanAct``/``DispAct`` reproduce /root/reference/dca/network.py:38-39:
    MeanAct = clip(exp(x), 1e-5, 1e6)
    DispAct = clip(softplus(x), 1e-4, 1e4)

The hidden-layer activation registry covers the names resolvable by the
reference from ``keras.layers``/keras activation strings (network.py:41,
132-135; hyper.py:32-33 searches over relu/selu/elu/PReLU/linear/LeakyReLU).

PReLU is stateful (trainable per-feature alpha, Keras zero-initialized) and is
handled by the model trunk, not this registry; ``get_activation`` returns a
sentinel for it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def MeanAct(x):
    return jnp.clip(jnp.exp(x), 1e-5, 1e6)


def DispAct(x):
    return jnp.clip(jax.nn.softplus(x), 1e-4, 1e4)


def _linear(x):
    return x


def _leaky_relu(x):
    # Keras LeakyReLU default alpha=0.3
    return jax.nn.leaky_relu(x, negative_slope=0.3)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "softsign": jax.nn.soft_sign,
    "hard_sigmoid": jax.nn.hard_sigmoid,
    "exponential": jnp.exp,
    "linear": _linear,
    "LeakyReLU": _leaky_relu,
    "leaky_relu": _leaky_relu,
}

# Activations that carry trainable parameters; resolved inside the trunk.
PARAMETRIC_ACTIVATIONS = ("PReLU",)


def get_activation(name):
    if callable(name):
        return name
    if name in PARAMETRIC_ACTIVATIONS:
        return name  # sentinel — trunk owns the parameter
    if name not in ACTIVATIONS:
        raise ValueError(
            f"Unknown activation {name!r}; available: {sorted(ACTIVATIONS)} + "
            f"{PARAMETRIC_ACTIVATIONS}"
        )
    return ACTIVATIONS[name]
