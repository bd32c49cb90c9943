"""Keras-parity optimizers as pure JAX gradient transforms.

The reference resolves optimizers by name from ``keras.optimizers`` with
``clipvalue=5.0`` (train.py:54-57) — elementwise value clipping, NOT global
norm.  Defaults reproduce the TF2-era Keras hyperparameters, most importantly
RMSprop(lr=1e-3, rho=0.9, epsilon=1e-7) with epsilon added OUTSIDE the sqrt
(`p -= lr * g / (sqrt(a) + eps)`), which differs from optax.scale_by_rms's
in-sqrt epsilon — hence the hand-rolled transforms.

Learning rate is a runtime argument of ``update`` (not baked into the jaxpr)
so ReduceLROnPlateau can change it between epochs without recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Optimizer(NamedTuple):
    name: str
    default_lr: float
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any, jax.Array], Any]  # (grads, opt_state, params, lr)
    # update returns (new_params, new_opt_state)


def _clip(grads, clipvalue):
    if clipvalue is None:
        return grads
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -clipvalue, clipvalue), grads)


def _zeros_like(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def sgd(clipvalue=None, momentum=0.0, nesterov=False):
    def init(params):
        if momentum:
            return {"m": _zeros_like(params)}
        return {}

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        if momentum:
            m = jax.tree_util.tree_map(
                lambda mm, g: momentum * mm - lr * g, opt_state["m"], grads
            )
            if nesterov:
                new_params = jax.tree_util.tree_map(
                    lambda p, mm, g: p + momentum * mm - lr * g, params, m, grads
                )
            else:
                new_params = jax.tree_util.tree_map(lambda p, mm: p + mm, params, m)
            return new_params, {"m": m}
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, opt_state

    return Optimizer("SGD", 0.01, init, update)


def rmsprop(clipvalue=None, rho=0.9, eps=1e-7):
    def init(params):
        return {"a": _zeros_like(params)}

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        a = jax.tree_util.tree_map(
            lambda aa, g: rho * aa + (1.0 - rho) * jnp.square(g), opt_state["a"], grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g, aa: p - lr * g / (jnp.sqrt(aa) + eps), params, grads, a
        )
        return new_params, {"a": a}

    return Optimizer("RMSprop", 1e-3, init, update)


def adam(clipvalue=None, b1=0.9, b2=0.999, eps=1e-7, amsgrad=False):
    def init(params):
        s = {"m": _zeros_like(params), "v": _zeros_like(params), "t": jnp.zeros((), jnp.int32)}
        if amsgrad:
            s["vhat"] = _zeros_like(params)
        return s

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        t = opt_state["t"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, opt_state["m"], grads
        )
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * jnp.square(g), opt_state["v"], grads
        )
        lr_t = lr * jnp.sqrt(1.0 - b2**tf) / (1.0 - b1**tf)
        if amsgrad:
            vhat = jax.tree_util.tree_map(jnp.maximum, opt_state["vhat"], v)
            new_params = jax.tree_util.tree_map(
                lambda p, mm, vv: p - lr_t * mm / (jnp.sqrt(vv) + eps), params, m, vhat
            )
            return new_params, {"m": m, "v": v, "t": t, "vhat": vhat}
        new_params = jax.tree_util.tree_map(
            lambda p, mm, vv: p - lr_t * mm / (jnp.sqrt(vv) + eps), params, m, v
        )
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer("Adam", 1e-3, init, update)


def adamax(clipvalue=None, b1=0.9, b2=0.999, eps=1e-7):
    def init(params):
        return {"m": _zeros_like(params), "u": _zeros_like(params), "t": jnp.zeros((), jnp.int32)}

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        t = opt_state["t"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree_util.tree_map(lambda mm, g: b1 * mm + (1 - b1) * g, opt_state["m"], grads)
        u = jax.tree_util.tree_map(
            lambda uu, g: jnp.maximum(b2 * uu, jnp.abs(g)), opt_state["u"], grads
        )
        lr_t = lr / (1.0 - b1**tf)
        new_params = jax.tree_util.tree_map(
            lambda p, mm, uu: p - lr_t * mm / (uu + eps), params, m, u
        )
        return new_params, {"m": m, "u": u, "t": t}

    return Optimizer("Adamax", 1e-3, init, update)


def nadam(clipvalue=None, b1=0.9, b2=0.999, eps=1e-7):
    def init(params):
        return {"m": _zeros_like(params), "v": _zeros_like(params), "t": jnp.zeros((), jnp.int32)}

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        t = opt_state["t"] + 1
        tf = t.astype(jnp.float32)
        m = jax.tree_util.tree_map(lambda mm, g: b1 * mm + (1 - b1) * g, opt_state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda vv, g: b2 * vv + (1 - b2) * jnp.square(g), opt_state["v"], grads
        )
        mhat = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm / (1 - b1 ** (tf + 1)) + (1 - b1) * g / (1 - b1**tf),
            m,
            grads,
        )
        vhat = jax.tree_util.tree_map(lambda vv: vv / (1 - b2**tf), v)
        new_params = jax.tree_util.tree_map(
            lambda p, mm, vv: p - lr * mm / (jnp.sqrt(vv) + eps), params, mhat, vhat
        )
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer("Nadam", 1e-3, init, update)


def adagrad(clipvalue=None, eps=1e-7, initial_accumulator=0.1):
    def init(params):
        return {
            "a": jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, initial_accumulator), params
            )
        }

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        a = jax.tree_util.tree_map(
            lambda aa, g: aa + jnp.square(g), opt_state["a"], grads
        )
        new_params = jax.tree_util.tree_map(
            lambda p, g, aa: p - lr * g / (jnp.sqrt(aa) + eps), params, grads, a
        )
        return new_params, {"a": a}

    return Optimizer("Adagrad", 1e-3, init, update)


def adadelta(clipvalue=None, rho=0.95, eps=1e-7):
    def init(params):
        return {"a": _zeros_like(params), "d": _zeros_like(params)}

    def update(grads, opt_state, params, lr):
        grads = _clip(grads, clipvalue)
        a = jax.tree_util.tree_map(
            lambda aa, g: rho * aa + (1 - rho) * jnp.square(g), opt_state["a"], grads
        )
        delta = jax.tree_util.tree_map(
            lambda g, aa, dd: g * jnp.sqrt(dd + eps) / jnp.sqrt(aa + eps),
            grads,
            a,
            opt_state["d"],
        )
        d = jax.tree_util.tree_map(
            lambda dd, dl: rho * dd + (1 - rho) * jnp.square(dl), opt_state["d"], delta
        )
        new_params = jax.tree_util.tree_map(lambda p, dl: p - lr * dl, params, delta)
        return new_params, {"a": a, "d": d}

    return Optimizer("Adadelta", 1e-3, init, update)


_FACTORIES = {
    "sgd": sgd,
    "rmsprop": rmsprop,
    "adam": adam,
    "adamax": adamax,
    "nadam": nadam,
    "adagrad": adagrad,
    "adadelta": adadelta,
}


def get_optimizer(name: str, clipvalue=None) -> Optimizer:
    """Resolve by (case-insensitive) Keras optimizer name."""
    key = name.lower()
    if key not in _FACTORIES:
        raise ValueError(f"Unknown optimizer {name!r}; available: {sorted(_FACTORIES)}")
    return _FACTORIES[key](clipvalue=clipvalue)
