"""Sharded training step: jit + GSPMD over a ('data','model') mesh.

The full train step (forward, ZINB/NB NLL, backward, optimizer update) is one
compiled program; XLA inserts the collectives implied by the shardings laid
out in ``mesh.py`` (psum of gene-sharded partial products, psum of the scalar
loss, all-reduce of data-parallel gradients).  Nothing here translates the
reference — it had no distributed path at all (SURVEY.md §2.10).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import batch_sharding, batch_vector_sharding, param_sharding, replicated


def shard_train_data(mesh: Mesh, X, target, sf):
    """Place host arrays on the mesh: cells over 'data', genes replicated.

    Multi-host: when more than one process is attached, the inputs are this
    process's LOCAL row shard (multihost.process_row_range) and the global
    sharded arrays are assembled without host-to-host copies via
    jax.make_array_from_process_local_data (multihost.host_local_to_global).

    Single-process, jax.device_put needs the sharded dimension to divide
    evenly; when the row count doesn't divide the data axis the array is
    placed replicated — compute still runs data-parallel because the
    per-batch with_sharding_constraint (loop._batch_constrainer) re-shards
    every minibatch, GSPMD padding included.
    """
    if jax.process_count() > 1:
        from .multihost import host_local_to_global

        return (
            host_local_to_global(mesh, P("data", None), X),
            host_local_to_global(mesh, P("data", None), target),
            host_local_to_global(mesh, P("data"), sf),
        )
    n_data = mesh.shape["data"]
    bsh = batch_sharding(mesh) if X.shape[0] % n_data == 0 else replicated(mesh)
    vsh = (
        batch_vector_sharding(mesh)
        if len(sf) % n_data == 0
        else replicated(mesh)
    )
    return (
        jax.device_put(X, bsh),
        jax.device_put(target, bsh),
        jax.device_put(sf, vsh),
    )


def make_sharded_train_step(network, opt, mesh: Mesh, donate: bool = True):
    """Compile one SGD step over the mesh.

    Returns (step_fn, place_state) where
      step_fn(params, state, opt_state, xb, tb, sfb, lr, rng)
        -> (params, state, opt_state, loss)
      place_state(params, state, opt_state) pins the pytrees to their mesh
        shardings (gene-dim over 'model', rest replicated).
    """
    definition = network.definition
    loss_fn = network.loss_fn

    p_sh = lambda tree: param_sharding(tree, definition, mesh)
    b_sh = batch_sharding(mesh)
    v_sh = batch_vector_sharding(mesh)
    r_sh = replicated(mesh)

    def place_state(params, state, opt_state):
        params = jax.device_put(params, p_sh(params))
        state = jax.device_put(state, jax.tree_util.tree_map(lambda _: r_sh, state))
        opt_state = jax.device_put(opt_state, p_sh(opt_state))
        return params, state, opt_state

    def _step(params, state, opt_state, xb, tb, sfb, lr, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, xb, sfb, tb, True, rng
        )
        params, opt_state = opt.update(grads, opt_state, params, lr)
        return params, new_state, opt_state, loss

    # NamedSharding on the inputs carries the mesh — no mesh context needed;
    # GSPMD propagates shardings through the whole step.
    step_fn = jax.jit(
        _step,
        donate_argnums=(0, 1, 2) if donate else (),
    )

    return step_fn, place_state


def place_train_state(network, mesh: Mesh, params, state, opt_state):
    """Pin a (params, state, opt_state) triple to its mesh layout: gene-dim
    tensors over 'model' (mesh.param_sharding), BN statistics replicated.
    Used by the train() mesh path (train/loop.py)."""
    p_sh = param_sharding(params, network.definition, mesh)
    o_sh = param_sharding(opt_state, network.definition, mesh)
    r_sh = replicated(mesh)
    params = jax.device_put(params, p_sh)
    state = jax.device_put(state, jax.tree_util.tree_map(lambda _: r_sh, state))
    opt_state = jax.device_put(opt_state, o_sh)
    return params, state, opt_state
