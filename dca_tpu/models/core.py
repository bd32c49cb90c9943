"""Functional autoencoder core covering all 11 reference architectures.

The reference (``/root/reference/dca/network.py``) builds Keras graphs where
the loss closure captures dispersion/pi tensors via ``SliceLayer`` tricks
(network.py:382-385).  Here the model is a pure function

    apply(definition, params, state, count, size_factors, training, rng)
        -> (outputs, new_state)

returning the full distribution-parameter pytree:

    outputs = {
      'output':    MeanAct(mean_logits) * size_factors   # ColwiseMult, layers.py:85
      'mean':      MeanAct(mean_logits)                  # == extra 'mean_norm' model
      'disp':      dispersion (per arch: (B,G)/(1,G)/(B,1))
      'pi':        dropout mixture weight or None
      'latent':    center Dense pre-BN/pre-activation    # get_encoder(), network.py:179-186
      'decoded':   last trunk hidden (None for fork archs)
    }

Architecture contract replicated from the reference:
  * trunk layer = Dense(no act) -> BatchNorm(center=True, scale=False)
    -> Activation -> Dropout, center at floor(n/2) (network.py:92-141)
  * encoder-specific l1/l2 override for stages {encoder, center}
    (network.py:113-122)
  * MeanAct/DispAct clips (network.py:38-39)
  * ConstantDispersionLayer: trainable theta (1,G), exposed as
    clip(exp(theta), 1e-3, 1e4) (layers.py:8-28)
  * ElementwiseDense diagonal kernel for zinb-elempi (layers.py:50-81),
    applied to the NEGATED mean pre-activation (network.py:424-461)
  * fork archs triplicate the post-center decoder per head
    (network.py:553-760)

BatchNorm uses Keras defaults: epsilon=1e-3, momentum=0.99, biased batch
variance, moving stats for inference.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.activations import get_activation, MeanAct, DispAct, PARAMETRIC_ACTIVATIONS
from ..ops.initializers import get_initializer

BN_EPS = 1e-3
BN_MOMENTUM = 0.99
THETA_EXP_CLIP = (1e-3, 1e4)  # layers.py:21


def _fused_dense_enabled(n_out=None) -> bool:
    from ..config import use_fused_dense

    return use_fused_dense(n_out)


def _dot(x, w):
    """Dense matmul in the configured MXU compute dtype (config.matmul_dtype):
    bf16 operands with f32 accumulation when enabled, plain f32 otherwise.
    The result is f32 either way, so bias/BN/activation/loss numerics are
    untouched by the mode."""
    from ..config import matmul_dtype

    dt = matmul_dtype()
    if dt is not None:
        x = x.astype(dt)
        w = w.astype(dt)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def _fused_interpret() -> bool:
    # compiled on TPU, interpreter elsewhere (tests force the path on CPU)
    return jax.default_backend() != "tpu"


@dataclasses.dataclass(frozen=True)
class LayerDef:
    name: str
    in_dim: int
    units: int
    l1: float
    l2: float
    dropout: float
    batchnorm: bool


@dataclasses.dataclass(frozen=True)
class HeadDef:
    name: str
    in_dim: int
    units: int
    l1: float
    l2: float
    kind: str  # 'dense' | 'elementwise' | 'constant'
    activation: str  # 'mean' | 'disp' | 'sigmoid' | 'linear' | 'none'


@dataclasses.dataclass(frozen=True)
class NetworkDef:
    ae_type: str
    input_size: int
    output_size: int
    likelihood: str  # 'mse' | 'poisson' | 'nb' | 'zinb'
    activation: str
    init: str
    input_dropout: float
    shared: Tuple[LayerDef, ...]
    branches: Dict[str, Tuple[LayerDef, ...]]  # fork decoder branches, {} if not fork
    heads: Dict[str, HeadDef]
    branch_of_head: Dict[str, str]  # head name -> branch feeding it ('' = shared trunk)
    elempi_shared: bool = False
    ridge: float = 0.0
    debug: bool = False


# ---------------------------------------------------------------------------
# definition builder
# ---------------------------------------------------------------------------

_STAGE_HEADS = {
    # ae_type -> (disp_kind, has_pi, fork)
    "normal": (None, False, False),
    "poisson": (None, False, False),
    "nb": ("constant", False, False),
    "nb-conddisp": ("conddisp", False, False),
    "nb-shared": ("shared", False, False),
    "nb-fork": ("conddisp", False, True),
    "zinb": ("constant", True, False),
    "zinb-conddisp": ("conddisp", True, False),
    "zinb-shared": ("shared", True, False),
    "zinb-fork": ("conddisp", True, True),
    "zinb-elempi": ("conddisp", True, False),
}

LIKELIHOODS = {
    "normal": "mse",
    "poisson": "poisson",
    "nb": "nb",
    "nb-conddisp": "nb",
    "nb-shared": "nb",
    "nb-fork": "nb",
    "zinb": "zinb",
    "zinb-conddisp": "zinb",
    "zinb-shared": "zinb",
    "zinb-fork": "zinb",
    "zinb-elempi": "zinb",
}


def build_definition(
    ae_type: str,
    input_size: int,
    output_size: Optional[int] = None,
    hidden_size: Sequence[int] = (64, 32, 64),
    l2_coef: float = 0.0,
    l1_coef: float = 0.0,
    l2_enc_coef: float = 0.0,
    l1_enc_coef: float = 0.0,
    ridge: float = 0.0,
    hidden_dropout=0.0,
    input_dropout: float = 0.0,
    batchnorm: bool = True,
    activation: str = "relu",
    init: str = "glorot_uniform",
    sharedpi: bool = False,
    debug: bool = False,
) -> NetworkDef:
    if ae_type not in _STAGE_HEADS:
        raise ValueError(f"Unknown ae_type {ae_type!r}; available: {sorted(_STAGE_HEADS)}")
    disp_kind, has_pi, fork = _STAGE_HEADS[ae_type]
    output_size = input_size if output_size is None else output_size
    hidden_size = tuple(int(h) for h in hidden_size)

    if isinstance(hidden_dropout, (list, tuple)):
        assert len(hidden_dropout) == len(hidden_size)  # network.py:87-88
        dropouts = tuple(float(d) for d in hidden_dropout)
    else:
        dropouts = (float(hidden_dropout),) * len(hidden_size)

    center_idx = int(np.floor(len(hidden_size) / 2.0))  # network.py:102

    shared: List[LayerDef] = []
    branch_names: List[str]
    if not fork:
        branch_names = []
    elif has_pi:
        branch_names = ["mean", "disp", "pi"]
    else:
        branch_names = ["mean", "disp"]
    branches: Dict[str, List[LayerDef]] = {b: [] for b in branch_names}

    in_dim = input_size
    branch_in = None
    for i, (hid_size, hid_drop) in enumerate(zip(hidden_size, dropouts)):
        if i == center_idx:
            layer_name, stage = "center", "center"
        elif i < center_idx:
            layer_name, stage = f"enc{i}", "encoder"
        else:
            layer_name, stage = f"dec{i - center_idx}", "decoder"

        # encoder-specific l1/l2 overrides (network.py:113-122)
        l1 = l1_enc_coef if (l1_enc_coef != 0.0 and stage in ("center", "encoder")) else l1_coef
        l2 = l2_enc_coef if (l2_enc_coef != 0.0 and stage in ("center", "encoder")) else l2_coef

        if fork and i > center_idx:
            for b in branch_names:
                prev = branches[b][-1].units if branches[b] else branch_in
                branches[b].append(
                    LayerDef(
                        name=f"{layer_name}_last_{b}",
                        in_dim=prev,
                        units=hid_size,
                        l1=l1,
                        l2=l2,
                        dropout=hid_drop,
                        batchnorm=batchnorm,
                    )
                )
        else:
            shared.append(
                LayerDef(
                    name=layer_name,
                    in_dim=in_dim,
                    units=hid_size,
                    l1=l1,
                    l2=l2,
                    dropout=hid_drop,
                    batchnorm=batchnorm,
                )
            )
            in_dim = hid_size
            branch_in = hid_size

    trunk_out = shared[-1].units if shared else input_size

    def _branch_out(b: str) -> int:
        if branches.get(b):
            return branches[b][-1].units
        return trunk_out

    heads: Dict[str, HeadDef] = {}
    branch_of_head: Dict[str, str] = {}

    # mean head
    if ae_type == "normal":
        mean_act = "linear"  # network.py:146-148: Dense with no activation
    elif ae_type == "zinb-elempi":
        mean_act = "none"  # raw logits; MeanAct applied to the NEGATED logits later
    else:
        mean_act = "mean"
    heads["mean"] = HeadDef(
        name="mean" if ae_type != "zinb-elempi" else "mean_no_act",
        in_dim=_branch_out("mean"),
        units=output_size,
        l1=l1_coef,
        l2=l2_coef,
        kind="dense",
        activation=mean_act,
    )
    branch_of_head["mean"] = "mean" if fork else ""

    # dispersion head
    if disp_kind == "constant":
        heads["dispersion"] = HeadDef(
            name="dispersion",
            in_dim=0,
            units=output_size,
            l1=0.0,
            l2=0.0,
            kind="constant",
            activation="none",
        )
        branch_of_head["dispersion"] = ""
    elif disp_kind == "conddisp":
        heads["dispersion"] = HeadDef(
            name="dispersion",
            in_dim=_branch_out("disp"),
            units=output_size,
            l1=l1_coef,
            l2=l2_coef,
            kind="dense",
            activation="disp",
        )
        branch_of_head["dispersion"] = "disp" if fork else ""
    elif disp_kind == "shared":
        heads["dispersion"] = HeadDef(
            name="dispersion",
            in_dim=trunk_out,
            units=1,
            l1=l1_coef,
            l2=l2_coef,
            kind="dense",
            activation="disp",
        )
        branch_of_head["dispersion"] = ""

    # pi head
    if has_pi:
        if ae_type == "zinb-elempi":
            pidim = 1 if sharedpi else output_size  # network.py:441
            heads["pi"] = HeadDef(
                name="pi",
                in_dim=output_size,
                units=pidim,
                l1=l1_coef,
                l2=l2_coef,
                kind="elementwise",
                activation="sigmoid",
            )
            branch_of_head["pi"] = ""
        elif ae_type == "zinb-shared":
            heads["pi"] = HeadDef(
                name="pi",
                in_dim=trunk_out,
                units=1,
                l1=l1_coef,
                l2=l2_coef,
                kind="dense",
                activation="sigmoid",
            )
            branch_of_head["pi"] = ""
        else:
            heads["pi"] = HeadDef(
                name="pi",
                in_dim=_branch_out("pi"),
                units=output_size,
                l1=l1_coef,
                l2=l2_coef,
                kind="dense",
                activation="sigmoid",
            )
            branch_of_head["pi"] = "pi" if fork else ""

    return NetworkDef(
        ae_type=ae_type,
        input_size=input_size,
        output_size=output_size,
        likelihood=LIKELIHOODS[ae_type],
        activation=activation,
        init=init,
        input_dropout=float(input_dropout),
        shared=tuple(shared),
        branches={b: tuple(v) for b, v in branches.items()},
        heads=heads,
        branch_of_head=branch_of_head,
        elempi_shared=sharedpi,
        ridge=ridge,
        debug=debug,
    )


# ---------------------------------------------------------------------------
# parameter initialization
# ---------------------------------------------------------------------------


def _init_layer(key, layer: LayerDef, init_fn, parametric_act: bool):
    p = {
        "kernel": init_fn(key, (layer.in_dim, layer.units)),
        "bias": jnp.zeros((layer.units,), jnp.float32),
    }
    if layer.batchnorm:
        p["bn_beta"] = jnp.zeros((layer.units,), jnp.float32)
    if parametric_act:
        # Keras PReLU alpha_initializer='zeros'
        p["prelu_alpha"] = jnp.zeros((layer.units,), jnp.float32)
    return p


def _init_layer_state(layer: LayerDef):
    if not layer.batchnorm:
        return {}
    return {
        "moving_mean": jnp.zeros((layer.units,), jnp.float32),
        "moving_var": jnp.ones((layer.units,), jnp.float32),
    }


def init_params(definition: NetworkDef, rng: jax.Array):
    init_fn = get_initializer(definition.init)
    parametric = definition.activation in PARAMETRIC_ACTIVATIONS

    n_layers = (
        len(definition.shared)
        + sum(len(v) for v in definition.branches.values())
        + len(definition.heads)
    )
    keys = iter(jax.random.split(rng, max(n_layers, 1)))

    params = {"trunk": {}, "branches": {}, "heads": {}}
    state = {"trunk": {}, "branches": {}}

    for layer in definition.shared:
        params["trunk"][layer.name] = _init_layer(next(keys), layer, init_fn, parametric)
        state["trunk"][layer.name] = _init_layer_state(layer)

    for bname, layers in definition.branches.items():
        params["branches"][bname] = {}
        state["branches"][bname] = {}
        for layer in layers:
            params["branches"][bname][layer.name] = _init_layer(
                next(keys), layer, init_fn, parametric
            )
            state["branches"][bname][layer.name] = _init_layer_state(layer)

    for hname, head in definition.heads.items():
        k = next(keys)
        if head.kind == "constant":
            # ConstantDispersionLayer theta zeros-init (layers.py:17-20)
            params["heads"][hname] = {"theta": jnp.zeros((1, head.units), jnp.float32)}
        elif head.kind == "elementwise":
            # ElementwiseDense: vector kernel shape (units,) (layers.py:58)
            params["heads"][hname] = {
                "kernel": init_fn(k, (head.units,)),
                "bias": jnp.zeros((head.units,), jnp.float32),
            }
        else:
            params["heads"][hname] = {
                "kernel": init_fn(k, (head.in_dim, head.units)),
                "bias": jnp.zeros((head.units,), jnp.float32),
            }

    return params, state


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------


def _batchnorm(p, s, x, training: bool):
    """Keras BatchNormalization(center=True, scale=False) semantics."""
    if training:
        mu = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mu), axis=0)  # biased, as Keras
        xn = (x - mu) * jax.lax.rsqrt(var + BN_EPS) + p["bn_beta"]
        new_s = {
            "moving_mean": s["moving_mean"] * BN_MOMENTUM + mu * (1.0 - BN_MOMENTUM),
            "moving_var": s["moving_var"] * BN_MOMENTUM + var * (1.0 - BN_MOMENTUM),
        }
        return xn, new_s
    xn = (x - s["moving_mean"]) * jax.lax.rsqrt(s["moving_var"] + BN_EPS) + p["bn_beta"]
    return xn, s


def _dropout(x, rate: float, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def _apply_stack(
    layers: Sequence[LayerDef],
    params,
    state,
    x,
    *,
    activation,
    training: bool,
    rng,
    capture_center: bool = False,
):
    """Dense -> BN -> Activation -> Dropout per layer (network.py:124-138)."""
    parametric = activation in PARAMETRIC_ACTIVATIONS
    act_fn = None if parametric else get_activation(activation)
    latent = None
    decoded_preact = None
    new_state = {}
    if not training and not parametric and _fused_dense_enabled():
        from ..ops.fused_dense import fused_dense_block, supported_activation

        if supported_activation(activation):
            for layer in layers:
                p = params[layer.name]
                if capture_center and layer.name == "center":
                    break  # latent needs the pre-BN value; fall through below
                bn = None
                if layer.batchnorm:
                    s = state[layer.name]
                    bn = (s["moving_mean"], s["moving_var"], p["bn_beta"])
                x = fused_dense_block(
                    x, p["kernel"], p["bias"], bn=bn, activation=activation,
                    interpret=_fused_interpret(),
                )
                new_state[layer.name] = dict(state[layer.name])
            else:
                return x, latent, new_state
            layers = layers[len(new_state):]
    for li, layer in enumerate(layers):
        p = params[layer.name]
        x = _dot(x, p["kernel"]) + p["bias"]
        if capture_center and layer.name == "center":
            latent = x  # encoder output = center Dense pre-BN/act (network.py:184-185)
        if layer.batchnorm:
            x, ns = _batchnorm(p, state[layer.name], x, training)
            new_state[layer.name] = ns
        else:
            new_state[layer.name] = {}
        if parametric:
            alpha = p["prelu_alpha"]
            x = jnp.where(x >= 0, x, alpha * x)
        else:
            x = act_fn(x)
        if layer.dropout > 0.0 and training:
            rng, sub = jax.random.split(rng)
            x = _dropout(x, layer.dropout, sub)
    return x, latent, new_state


_HEAD_EPILOGUES = {"mean": "mean", "disp": "disp", "sigmoid": "sigmoid",
                   "linear": "linear", "none": "linear"}


def _apply_head(head: HeadDef, p, x, fused: bool = False):
    if head.kind == "constant":
        raise AssertionError("constant head handled separately")
    if head.kind == "elementwise":
        z = x * p["kernel"] + p["bias"]  # layers.py:74-78 broadcasting
    else:
        if fused and head.activation in _HEAD_EPILOGUES:
            from ..ops.fused_dense import fused_dense_block

            return fused_dense_block(
                x, p["kernel"], p["bias"],
                activation=_HEAD_EPILOGUES[head.activation],
                interpret=_fused_interpret(),
            )
        z = _dot(x, p["kernel"]) + p["bias"]
    if head.activation == "mean":
        return MeanAct(z)
    if head.activation == "disp":
        return DispAct(z)
    if head.activation == "sigmoid":
        return jax.nn.sigmoid(z)
    return z  # 'linear' / 'none'


def theta_exp(params):
    """ConstantDispersionLayer exposed dispersion: clip(exp(theta), 1e-3, 1e4)
    (layers.py:21)."""
    t = params["heads"]["dispersion"]["theta"]
    return jnp.clip(jnp.exp(t), *THETA_EXP_CLIP)


def apply(
    definition: NetworkDef,
    params,
    state,
    count,
    size_factors,
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Full forward pass. Returns (outputs dict, new_state)."""
    if training and rng is None:
        rng = jax.random.PRNGKey(0)
    x = jnp.asarray(count, jnp.float32)
    sf = jnp.asarray(size_factors, jnp.float32).reshape(-1, 1)  # layers.py:85

    if definition.input_dropout > 0.0 and training:
        rng, sub = jax.random.split(rng)
        x = _dropout(x, definition.input_dropout, sub)

    if rng is not None:
        rng, trunk_rng = jax.random.split(rng)
    else:
        trunk_rng = None
    x, latent, trunk_state = _apply_stack(
        definition.shared,
        params["trunk"],
        state["trunk"],
        x,
        activation=definition.activation,
        training=training,
        rng=trunk_rng,
        capture_center=True,
    )
    new_state = {"trunk": trunk_state, "branches": {}}

    # branch outputs (fork archs); '' denotes the shared trunk output
    branch_out = {"": x}
    for bname, layers in definition.branches.items():
        if rng is not None:
            rng, brng = jax.random.split(rng)
        else:
            brng = None
        bx, _, bstate = _apply_stack(
            layers,
            params["branches"][bname],
            state["branches"][bname],
            x,
            activation=definition.activation,
            training=training,
            rng=brng,
        )
        branch_out[bname] = bx
        new_state["branches"][bname] = bstate

    heads = definition.heads
    out: Dict[str, Optional[jax.Array]] = {}
    # heads are the wide (64 -> G) matmuls where the fused Pallas block wins
    # (docs/benchmarks.md); auto mode engages it on TPU for large G only
    fused = (not training) and _fused_dense_enabled(definition.output_size)

    if definition.ae_type == "zinb-elempi":
        # network.py:429-447: z = -Dense(decoder); pi = ElemDense(sigmoid)(z);
        # mean = MeanAct(z)
        z = (
            _dot(
                branch_out[definition.branch_of_head["mean"]],
                params["heads"]["mean"]["kernel"],
            )
            + params["heads"]["mean"]["bias"]
        )
        z = -z
        out["mean"] = MeanAct(z)
        out["pi"] = _apply_head(heads["pi"], params["heads"]["pi"], z)
    else:
        out["mean"] = _apply_head(
            heads["mean"], params["heads"]["mean"],
            branch_out[definition.branch_of_head["mean"]], fused=fused,
        )
        if "pi" in heads:
            out["pi"] = _apply_head(
                heads["pi"], params["heads"]["pi"],
                branch_out[definition.branch_of_head["pi"]], fused=fused,
            )
        else:
            out["pi"] = None

    if "dispersion" in heads:
        if heads["dispersion"].kind == "constant":
            out["disp"] = theta_exp(params)
        else:
            out["disp"] = _apply_head(
                heads["dispersion"],
                params["heads"]["dispersion"],
                branch_out[definition.branch_of_head["dispersion"]],
                fused=fused,
            )
    else:
        out["disp"] = None

    out["output"] = out["mean"] * sf  # ColwiseMultLayer (layers.py:85)
    out["mean_norm"] = out["mean"]
    out["latent"] = latent
    out["decoded"] = x if not definition.branches else None
    return out, new_state


# ---------------------------------------------------------------------------
# regularization
# ---------------------------------------------------------------------------


def regularization_loss(definition: NetworkDef, params) -> jax.Array:
    """Sum of Keras l1_l2 kernel penalties the reference adds to the loss
    (network.py:124-126 and every head Dense)."""
    total = jnp.zeros((), jnp.float32)

    def add(kernel, l1, l2):
        nonlocal total
        if l1:
            total = total + l1 * jnp.sum(jnp.abs(kernel))
        if l2:
            total = total + l2 * jnp.sum(jnp.square(kernel))

    for layer in definition.shared:
        add(params["trunk"][layer.name]["kernel"], layer.l1, layer.l2)
    for bname, layers in definition.branches.items():
        for layer in layers:
            add(params["branches"][bname][layer.name]["kernel"], layer.l1, layer.l2)
    for hname, head in definition.heads.items():
        if head.kind == "constant":
            continue  # ConstantDispersionLayer theta is unregularized
        add(params["heads"][hname]["kernel"], head.l1, head.l2)
    return total


def apply_decoder(definition: NetworkDef, params, state, latent_act, size_factors):
    """Decoder-only forward: from post-center activations to the output heads
    (the analogue of the reference get_decoder, network.py:169-177).

    ``latent_act`` is the center layer AFTER BN/activation/dropout — i.e.
    what the decoder stack consumes in the full forward pass."""
    x = jnp.asarray(latent_act, jnp.float32)
    sf = jnp.asarray(size_factors, jnp.float32).reshape(-1, 1)

    center_idx = next(
        i for i, l in enumerate(definition.shared) if l.name == "center"
    )
    decoder_layers = definition.shared[center_idx + 1 :]

    x, _, _ = _apply_stack(
        decoder_layers,
        params["trunk"],
        state["trunk"],
        x,
        activation=definition.activation,
        training=False,
        rng=None,
    )

    branch_out = {"": x}
    for bname, layers in definition.branches.items():
        bx, _, _ = _apply_stack(
            layers,
            params["branches"][bname],
            state["branches"][bname],
            x,
            activation=definition.activation,
            training=False,
            rng=None,
        )
        branch_out[bname] = bx

    heads = definition.heads
    out: Dict[str, Optional[jax.Array]] = {}
    fused = _fused_dense_enabled(definition.output_size)
    if definition.ae_type == "zinb-elempi":
        z = (
            _dot(
                branch_out[definition.branch_of_head["mean"]],
                params["heads"]["mean"]["kernel"],
            )
            + params["heads"]["mean"]["bias"]
        )
        z = -z
        out["mean"] = MeanAct(z)
        out["pi"] = _apply_head(heads["pi"], params["heads"]["pi"], z)
    else:
        out["mean"] = _apply_head(
            heads["mean"], params["heads"]["mean"],
            branch_out[definition.branch_of_head["mean"]], fused=fused,
        )
        out["pi"] = (
            _apply_head(heads["pi"], params["heads"]["pi"],
                        branch_out[definition.branch_of_head["pi"]], fused=fused)
            if "pi" in heads
            else None
        )
    if "dispersion" in heads:
        if heads["dispersion"].kind == "constant":
            out["disp"] = theta_exp(params)
        else:
            out["disp"] = _apply_head(
                heads["dispersion"], params["heads"]["dispersion"],
                branch_out[definition.branch_of_head["dispersion"]],
                fused=fused,
            )
    else:
        out["disp"] = None
    out["output"] = out["mean"] * sf
    return out, x
