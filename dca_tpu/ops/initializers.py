"""Weight initializers with Keras-parity semantics.

The reference resolves initializers by Keras name, default
``glorot_uniform`` (network.py:57, __main__.py:82-83).  Exact bit parity with
Keras RNG streams is neither possible nor required (tests assert statistical
recovery, not bit equality); the distributions match Keras definitions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


# Keras VarianceScaling divides the target stddev by the stddev of a
# [-2, 2]-truncated standard normal so the DRAWN values hit the target
# std exactly; without it every *_normal init lands ~12% small
_TRUNC_STD = 0.87962566103838207


def _trunc_normal(key, shape, dtype, stddev):
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * (
        stddev / _TRUNC_STD
    )


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def glorot_normal(key, shape, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    return _trunc_normal(key, shape, dtype, jnp.sqrt(2.0 / (fan_in + fan_out)))


def he_uniform(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    limit = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def he_normal(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    return _trunc_normal(key, shape, dtype, jnp.sqrt(2.0 / fan_in))


def lecun_uniform(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    limit = jnp.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def lecun_normal(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    return _trunc_normal(key, shape, dtype, jnp.sqrt(1.0 / fan_in))


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def random_uniform(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


def random_normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * 0.05


INITIALIZERS = {
    "glorot_uniform": glorot_uniform,
    "glorot_normal": glorot_normal,
    "he_uniform": he_uniform,
    "he_normal": he_normal,
    "lecun_uniform": lecun_uniform,
    "lecun_normal": lecun_normal,
    "zeros": zeros,
    "ones": ones,
    "random_uniform": random_uniform,
    "random_normal": random_normal,
}


def get_initializer(name):
    if callable(name):
        return name
    if name not in INITIALIZERS:
        raise ValueError(f"Unknown initializer {name!r}; available: {sorted(INITIALIZERS)}")
    return INITIALIZERS[name]
