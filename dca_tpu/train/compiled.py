"""Whole-fit-on-device training: the complete Keras ``model.fit`` semantics —
epoch loop, per-epoch reshuffling, minibatch SGD, validation, EarlyStopping,
ReduceLROnPlateau, best-weights tracking — compiled into ONE XLA program
(``lax.while_loop`` over epochs, ``lax.scan`` over steps).

Why: the reference dispatches Python->device per batch (Keras fit,
train.py:91-98); even our scan-based epoch loop pays host round trips per
epoch.  On TPU (especially through remote/tunneled dispatch) those RTTs
dominate small-model training, so the entire fit becomes a single device
call.  Callback logic is implemented with jnp.where arithmetic on a carried
state, with Keras defaults (EarlyStopping min_delta=0, ReduceLROnPlateau
factor=0.1 min_delta=1e-4 — train.py:70-75).

Differences vs the Python loop (documented, tested):
  * per-epoch shuffling uses jax.random.permutation instead of numpy
    RandomState (seed-for-seed Keras parity is impossible either way);
  * ModelCheckpoint writes the tracked best weights once after the fit
    rather than per epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_fit_fn(
    network,
    opt,
    *,
    n_train: int,
    batch_size: int,
    epochs: int,
    has_val: bool,
    reduce_lr: int,
    early_stop: int,
    track_best: bool,
    mesh=None,
):
    """Returns a jittable fit(params, state, opt_state, Xtr, Ttr, SFtr,
    Xval, Tval, SFval, lr0, rng) -> (params, state, best_params, best_state,
    loss_hist, val_hist, lr_hist, epochs_run).

    With ``mesh`` the minibatches are pinned to the ('data','model') batch
    layout so the multi-epoch program partitions data-parallel instead of
    replicating gathered batches (see loop._batch_constrainer)."""
    from .loop import _batch_constrainer

    loss_fn = network.loss_fn
    constrain_batch = _batch_constrainer(mesh)
    bs = min(batch_size, max(n_train, 1))
    n_full = n_train // bs
    rem = n_train - n_full * bs

    RLR_FACTOR, RLR_MIN_DELTA = 0.1, 1e-4

    def one_step(params, state, opt_state, xb, tb, sfb, lr, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, xb, sfb, tb, True, rng
        )
        params, opt_state = opt.update(grads, opt_state, params, lr)
        return params, new_state, opt_state, loss

    def fit(params, state, opt_state, Xtr, Ttr, SFtr, Xval, Tval, SFval, lr0, rng):
        def epoch_body(carry):
            (params, state, opt_state, best_params, best_state, lr, best_monitor,
             rlr_best, es_wait, rlr_wait, epoch, stop, loss_h, val_h, lr_h) = carry

            # the shuffle stream must be disjoint from the dropout streams:
            # dropout keys are fold_in(fold_in(rng, epoch), step), so tag the
            # permutation stream with a constant no epoch index can reach
            perm = jax.random.permutation(
                jax.random.fold_in(jax.random.fold_in(rng, 2**31 - 2), epoch),
                n_train,
            )
            epoch_rng = jax.random.fold_in(rng, epoch)

            total = jnp.float32(0.0)
            if n_full > 0:
                batches = perm[: n_full * bs].reshape(n_full, bs)

                def body(c, inp):
                    params, state, opt_state = c
                    idx, step_i = inp
                    xb, tb, sfb = constrain_batch(
                        jnp.take(Xtr, idx, axis=0),
                        jnp.take(Ttr, idx, axis=0),
                        jnp.take(SFtr, idx, axis=0),
                    )
                    params, state, opt_state, loss = one_step(
                        params, state, opt_state, xb, tb, sfb, lr,
                        jax.random.fold_in(epoch_rng, step_i),
                    )
                    return (params, state, opt_state), loss

                (params, state, opt_state), losses_seq = jax.lax.scan(
                    body,
                    (params, state, opt_state),
                    (batches, jnp.arange(n_full, dtype=jnp.int32)),
                )
                total = total + jnp.sum(losses_seq) * bs
            if rem > 0:
                idx = perm[n_full * bs :]
                xb, tb, sfb = constrain_batch(
                    jnp.take(Xtr, idx, axis=0),
                    jnp.take(Ttr, idx, axis=0),
                    jnp.take(SFtr, idx, axis=0),
                )
                params, state, opt_state, loss = one_step(
                    params, state, opt_state, xb, tb, sfb, lr,
                    jax.random.fold_in(epoch_rng, n_full),
                )
                total = total + loss * rem

            train_loss = total / max(n_train, 1)

            if has_val:
                val_loss, _ = loss_fn(params, state, Xval, SFval, Tval, False, None)
                monitor = val_loss
            else:
                val_loss = jnp.float32(jnp.nan)
                monitor = train_loss

            loss_h = loss_h.at[epoch].set(train_loss)
            val_h = val_h.at[epoch].set(val_loss)
            lr_h = lr_h.at[epoch].set(lr)

            improved = monitor < best_monitor
            best_monitor = jnp.where(improved, monitor, best_monitor)
            es_wait = jnp.where(improved, 0, es_wait + 1)
            if early_stop:
                stop = es_wait >= early_stop
            if track_best:
                best_params = jax.tree_util.tree_map(
                    lambda b, p: jnp.where(improved, p, b), best_params, params
                )
                best_state = jax.tree_util.tree_map(
                    lambda b, s: jnp.where(improved, s, b), best_state, state
                )

            if reduce_lr:
                rlr_improved = monitor < rlr_best - RLR_MIN_DELTA
                rlr_best = jnp.where(rlr_improved, monitor, rlr_best)
                rlr_wait = jnp.where(rlr_improved, 0, rlr_wait + 1)
                trigger = rlr_wait >= reduce_lr
                lr = jnp.where(trigger, lr * RLR_FACTOR, lr)
                rlr_wait = jnp.where(trigger, 0, rlr_wait)

            return (params, state, opt_state, best_params, best_state, lr,
                    best_monitor, rlr_best, es_wait, rlr_wait, epoch + 1, stop,
                    loss_h, val_h, lr_h)

        def cond(carry):
            epoch, stop = carry[10], carry[11]
            return (epoch < epochs) & (~stop)

        nan_h = jnp.full((max(epochs, 1),), jnp.nan, jnp.float32)
        init = (
            params, state, opt_state,
            params, state,  # best trackers start at init
            jnp.float32(lr0),
            jnp.float32(jnp.inf), jnp.float32(jnp.inf),
            jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.bool_(False),
            nan_h, nan_h, nan_h,
        )
        out = jax.lax.while_loop(cond, epoch_body, init)
        (params, state, opt_state, best_params, best_state, lr, best_monitor,
         rlr_best, es_wait, rlr_wait, epoch, stop, loss_h, val_h, lr_h) = out
        return params, state, best_params, best_state, loss_h, val_h, lr_h, epoch

    return fit
