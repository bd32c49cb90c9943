"""Special functions (lgamma, digamma) implemented with basic elementwise
ops only, so they lower inside Pallas TPU kernels (Mosaic has no lgamma/
digamma primitive — probed: NotImplementedError in Pallas lowering).

Method: branch-free recurrence pushes to z >= 8, then Stirling/asymptotic
series.  Valid for x > 0 (all loss arguments are positive: theta >= ~1e-4,
y+1 >= 1).  f32 accuracy ~1e-6 relative for x >= 1e-4, verified against
scipy in tests/test_pallas.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_HALF_LOG_2PI = 0.5 * float(np.log(2.0 * np.pi))
_N_PUSH = 8  # x + 8 >= 8 for all x > 0 in our domain


def lgamma(x):
    """log Gamma(x) for x > 0, Pallas-lowerable."""
    x = jnp.asarray(x, jnp.float32)
    shift = jnp.zeros_like(x)
    z = x
    for _ in range(_N_PUSH):
        small = z < 8.0
        shift = shift + jnp.where(small, jnp.log(z), 0.0)
        z = jnp.where(small, z + 1.0, z)
    zi = 1.0 / z
    zi2 = zi * zi
    # Stirling series: (z-1/2)ln z - z + ln(2pi)/2 + 1/(12z) - 1/(360z^3) + 1/(1260z^5)
    series = zi * (1.0 / 12.0 + zi2 * (-1.0 / 360.0 + zi2 * (1.0 / 1260.0)))
    return (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series - shift


def digamma(x):
    """psi(x) for x > 0, Pallas-lowerable."""
    x = jnp.asarray(x, jnp.float32)
    shift = jnp.zeros_like(x)
    z = x
    for _ in range(_N_PUSH):
        small = z < 8.0
        shift = shift + jnp.where(small, 1.0 / z, 0.0)
        z = jnp.where(small, z + 1.0, z)
    zi = 1.0 / z
    zi2 = zi * zi
    # psi(z) ~ ln z - 1/(2z) - 1/(12z^2) + 1/(120z^4) - 1/(252z^6)
    series = zi2 * (-1.0 / 12.0 + zi2 * (1.0 / 120.0 - zi2 * (1.0 / 252.0)))
    return jnp.log(z) - 0.5 * zi + series - shift
