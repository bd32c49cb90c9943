"""Training loop: jitted scan-over-batches epochs + Keras-parity callbacks.

Replaces the reference's Keras ``model.fit`` path (train.py:35-100) with a
TPU-first design:

  * the train split lives on device; one compiled ``epoch_fn`` runs ALL full
    minibatch steps of an epoch as a single ``lax.scan`` (no per-step Python
    dispatch, no host↔device traffic inside the epoch);
  * the trailing partial batch gets its own (second) compiled step so every
    shape stays static — no padding, hence bit-identical loss semantics to
    per-batch Keras;
  * learning rate is a runtime scalar argument, so ReduceLROnPlateau never
    recompiles;
  * callbacks (ReduceLROnPlateau patience=10 / EarlyStopping patience=15 /
    best-weights checkpoint, train.py:62-79) are plain Python state between
    epochs, with Keras defaults (factor=0.1, min_delta=1e-4 / 0.0).

Validation follows Keras ``validation_split`` semantics: the LAST fraction of
the data is held out before any shuffling; only the training portion is
reshuffled each epoch.
"""

from __future__ import annotations

import math
import os
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from .optim import get_optimizer


class History:
    """Keras-style history object (.history dict of per-epoch lists)."""

    def __init__(self):
        self.history = {}

    def append(self, key, value):
        self.history.setdefault(key, []).append(float(value))


class _TBLogger:
    """Per-epoch TensorBoard scalar + weight-histogram logging — the Keras
    ``TensorBoard(histogram_freq=1, write_grads=True)`` analogue the
    reference attaches under ``--tensorboard`` (train.py:76-79), written
    with the in-package tf-free event writer (dca_tpu/tbevents.py).

    Scalars ``loss``/``val_loss``/``lr`` are logged every epoch; weight
    histograms per epoch in the Python-loop paths, and once at the end in
    the whole-fit-as-one-XLA-program path (no per-epoch host hop exists
    there to log from)."""

    def __init__(self, logdir):
        from ..tbevents import EventWriter

        self.writer = EventWriter(logdir)

    def epoch(self, step, scalars, params=None, grads=None):
        for k, v in scalars.items():
            if v is not None:
                self.writer.scalar(k, float(v), step)
        if params is not None:
            self.histograms(step, params)
        if grads is not None:
            # the reference's write_grads=True (train.py:76-79): per-epoch
            # GRADIENT distributions, evaluated on the monitored split
            self.histograms(step, grads, prefix="grads/")
        self.writer.flush()

    def histograms(self, step, params, prefix="weights/"):
        from jax.tree_util import tree_flatten_with_path

        leaves, _ = tree_flatten_with_path(params)
        for path, leaf in leaves:
            tag = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            self.writer.histogram(tag, np.asarray(leaf), step)

    def loss_terms(self, step, network, params, state, Xv, SFv, Tv):
        """Debug-mode per-epoch histograms of the NLL summands — the
        reference's ``tf.summary.histogram('t1'/'t2', ...)`` in NB.loss
        (loss.py:96-97), evaluated on the validation split."""
        from .. import losses as _losses

        lk = network.definition.likelihood
        if lk not in ("nb", "zinb"):
            return
        out, _ = network.apply(params, state, Xv, SFv, training=False)
        if out["disp"] is None:
            return
        t1, t2 = _losses.nb_terms(Tv, out["output"], out["disp"])
        self.writer.histogram("debug/t1", np.asarray(t1), step)
        self.writer.histogram("debug/t2", np.asarray(t2), step)
        self.writer.flush()

    def close(self):
        self.writer.close()


class _FitCallbacks:
    """Keras-parity per-epoch callback state shared by the dense and
    streaming Python loops (reference train.py:62-79): EarlyStopping
    (patience), ReduceLROnPlateau (factor=0.1, min_delta=1e-4, min_lr=0),
    best-validation weight saving.  One implementation so the two loops
    cannot drift apart."""

    FACTOR, MIN_DELTA, MIN_LR = 0.1, 1e-4, 0.0

    def __init__(self, lr, reduce_lr, early_stop, save_weights, output_dir,
                 network, verbose, monitor_name):
        self.lr = lr
        self.reduce_lr = reduce_lr
        self.early_stop = early_stop
        self.save_weights = save_weights
        self.output_dir = output_dir
        self.network = network
        self.verbose = verbose
        self.monitor_name = monitor_name
        self.best_monitor = math.inf
        self.es_wait = 0
        self.rlr_best = math.inf  # ReduceLROnPlateau tracks its own best
        self.rlr_wait = 0

    def restore(self, meta):
        self.lr = meta["lr"]
        cb = meta.get("callback_state", {})
        self.best_monitor = cb.get("best_monitor", self.best_monitor)
        self.es_wait = cb.get("es_wait", 0)
        self.rlr_best = cb.get("rlr_best", self.rlr_best)
        self.rlr_wait = cb.get("rlr_wait", 0)

    def state_dict(self):
        return dict(best_monitor=self.best_monitor, es_wait=self.es_wait,
                    rlr_best=self.rlr_best, rlr_wait=self.rlr_wait)

    def end_epoch(self, epoch, monitor, params, state) -> bool:
        """Apply all callbacks for one finished epoch; True => stop."""
        stop = False
        if monitor < self.best_monitor:
            self.best_monitor = monitor
            self.es_wait = 0
            if self.save_weights and self.output_dir is not None:
                self.network.params, self.network.state = params, state
                self.network.save_weights(
                    os.path.join(self.output_dir, "weights.hdf5")
                )
        else:
            self.es_wait += 1
            if self.early_stop and self.es_wait >= self.early_stop:
                if self.verbose:
                    print(f"Epoch {epoch + 1}: early stopping "
                          f"({self.monitor_name})")
                stop = True
        if self.reduce_lr:
            if monitor < self.rlr_best - self.MIN_DELTA:
                self.rlr_best = monitor
                self.rlr_wait = 0
            else:
                self.rlr_wait += 1
                if self.rlr_wait >= self.reduce_lr:
                    new_lr = max(self.lr * self.FACTOR, self.MIN_LR)
                    if self.verbose and new_lr < self.lr:
                        print(f"Epoch {epoch + 1}: ReduceLROnPlateau "
                              f"reducing lr to {new_lr:.2e}")
                    self.lr = new_lr
                    self.rlr_wait = 0
        return stop


class _StreamTimeline:
    """Opt-in (``DCA_TPU_TIMELINE=<path>``) wall-clock event log for
    streaming epochs, one JSONL record per (epoch, part, stage) with
    absolute perf_counter stamps — so the epoch decomposition SUMS to the
    measured wall time instead of extrapolating from one probed part
    (VERDICT r4 weak item 3).  Stages:

      prep      host payload build                (prefetch thread)
      ship      device upload + scatter dispatch  (prefetch thread 1-proc)
      wait      main-thread block on the staged part (fut.result())
      dispatch  main-thread jit dispatch of the part's scan/eval
      fetch     epoch-end bulk loss fetch (the device sync point)
      epoch     whole-epoch envelope

    Main-thread time ≈ Σwait + Σdispatch + fetch + (unattributed gap);
    the prefetch thread's prep/ship rows show what each wait was hiding.
    Analyze with scripts/timeline_report.py."""

    def __init__(self, path):
        self.path = path
        self.events = []
        self.epoch = -1

    def rec(self, part, kind, stage, t0, t1):
        self.events.append((self.epoch, part, kind, stage, t0, t1))

    def flush(self):
        import json

        with open(self.path, "a") as f:
            for e, part, kind, stage, t0, t1 in self.events:
                f.write(json.dumps(dict(
                    epoch=e, part=part, kind=kind, stage=stage,
                    t0=round(t0, 4), t1=round(t1, 4),
                    dur=round(t1 - t0, 4))) + "\n")
        self.events = []


def _densify(X):
    if sp.issparse(X):
        return np.asarray(X.todense(), dtype=np.float32)
    return np.asarray(X, dtype=np.float32)


def _pad_rows(arr, n_pad):
    """Append ``n_pad`` copies of row 0 (any content works: padding rows are
    either never gathered by the minibatch permutation or carry sample
    weight 0 through the loss)."""
    if n_pad == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[:1], n_pad, axis=0)], axis=0)


def _checked_jit(fn, debug: bool):
    """jit, optionally discharging checkify asserts (--debug sanitizer).

    With ``debug`` the loss carries checkify finite-ness checks on
    y_pred/t1/t2 (losses.py); checkify functionalizes them through
    grad/scan and this wrapper throws the accumulated error on the host
    after each device call — the reference's tf.verify_tensor_all_finite
    behavior (loss.py:90-97): training aborts with the failing tensor's
    name in the message."""
    if not debug:
        return jax.jit(fn)
    from jax.experimental import checkify

    cfn = jax.jit(checkify.checkify(fn, errors=checkify.user_checks))

    def wrapper(*args):
        err, out = cfn(*args)
        err.throw()
        return out

    return wrapper


def _batch_constrainer(mesh):
    """Returns a fn pinning a gathered (xb, tb, sfb) minibatch to the mesh's
    batch layout (cells over 'data').  Without the constraint GSPMD is free
    to replicate the post-gather batch on every device, turning the
    data-parallel step into redundant work; with it the per-epoch reshuffle
    gather lowers to an all-to-all over ICI and each device keeps 1/N of the
    batch."""
    if mesh is None:
        return lambda xb, tb, sfb: (xb, tb, sfb)
    from ..parallel.mesh import batch_sharding, batch_vector_sharding

    bsh, vsh = batch_sharding(mesh), batch_vector_sharding(mesh)

    def constrain(xb, tb, sfb):
        return (
            jax.lax.with_sharding_constraint(xb, bsh),
            jax.lax.with_sharding_constraint(tb, bsh),
            jax.lax.with_sharding_constraint(sfb, vsh),
        )

    return constrain


def _size_factors(adata):
    if "size_factors" in adata.obs:
        return np.asarray(adata.obs["size_factors"], np.float32)
    return np.ones((adata.n_obs,), np.float32)


def train(
    adata,
    network,
    output_dir=None,
    optimizer="RMSprop",
    learning_rate=None,
    epochs=300,
    reduce_lr=10,
    output_subset=None,
    use_raw_as_output=True,
    early_stop=15,
    batch_size=32,
    clip_grad=5.0,
    save_weights=False,
    validation_split=0.1,
    tensorboard=False,
    verbose=True,
    threads=None,
    seed=42,
    compiled="auto",
    checkpoint_every=0,
    resume=False,
    max_device_cells=None,
    devices=None,
    model_parallel=1,
    **kwds,
):
    """Reference-compatible ``train`` (train.py:35-100). Returns History.

    ``compiled='auto'`` runs the ENTIRE fit (epochs + callbacks) as one XLA
    program on TPU backends (see compiled.py) and falls back to the
    Python-epoch loop elsewhere; pass True/False to force.

    ``devices``/``model_parallel`` (rebuild extensions — the reference is
    single-device, SURVEY.md §2.10): train over a ('data','model') device
    mesh.  ``devices`` is 'all', an int, or an explicit device list; cells
    shard over the data axis, the gene dimension of the input kernel and the
    output heads shards over a model axis of size ``model_parallel``.  The
    step stays ONE compiled program; XLA/GSPMD inserts the psum/all-gather
    collectives implied by the shardings, so loss and parameter trajectories
    match single-device training up to float reduction order.

    ``checkpoint_every=N`` saves the FULL train state (params, BN state,
    optimizer accumulators, lr, callback counters) every N epochs under
    <output_dir>/checkpoints; ``resume=True`` restores the latest one —
    true crash-resume, which the reference lacks (SURVEY.md §5.4). Forces
    the Python-epoch loop.

    ``tensorboard=True`` writes per-epoch loss/val_loss/lr scalars and
    weight histograms as standard TensorBoard event files under
    <output_dir>/tb (the reference's TensorBoard(histogram_freq=1,
    write_grads=True) callback, train.py:76-79 — tf-free writer in
    dca_tpu/tbevents.py), plus a jax.profiler trace in the same
    directory."""
    if threads:
        # XLA owns its own device threading; the host-side hot loops (C++
        # TSV parse/format, CSR densify/gather) honor the cap, matching the
        # reference's TF thread-pool knob (reference train.py:41-48)
        from .. import native

        native.set_threads(threads)
    assert network.params is not None, "network.build() must be called before train()"
    if checkpoint_every or resume:
        compiled = False
    if getattr(network.definition, "debug", False):
        # the sanitizer throws per-epoch on the host; the whole-fit-as-one-
        # program path has no per-epoch host hop to throw from
        compiled = False
    if compiled == "auto":
        compiled = jax.default_backend() == "tpu"

    if output_dir is not None:
        os.makedirs(output_dir, exist_ok=True)

    opt = get_optimizer(optimizer, clipvalue=clip_grad)
    lr = float(learning_rate) if learning_rate is not None else opt.default_lr

    from ..parallel.mesh import resolve_mesh

    # predict/write need no mesh handle: sharded outputs are detected via
    # jax.Array.is_fully_addressable and gathered in network._gathered_numpy
    mesh = resolve_mesh(devices, model_parallel)

    # ----- streaming path for larger-than-device datasets -----
    n_cells, n_genes = adata.n_obs, adata.n_vars
    est_bytes = n_cells * n_genes * 4 * 2  # input + target, f32
    if max_device_cells is not None:
        stream = n_cells > max_device_cells
    else:
        stream = est_bytes > int(os.environ.get("DCA_TPU_DEVICE_BYTES", 6_000_000_000))
    tb = None
    if tensorboard and output_dir is not None:
        tb = _TBLogger(os.path.join(output_dir, "tb"))
    if stream:
        if tb is not None:
            jax.profiler.start_trace(os.path.join(output_dir, "tb"))
        try:
            return _train_streaming(
                adata, network, opt, lr, epochs=epochs, reduce_lr=reduce_lr,
                early_stop=early_stop, batch_size=batch_size,
                validation_split=validation_split, use_raw_as_output=use_raw_as_output,
                output_subset=output_subset, seed=seed, verbose=verbose,
                max_device_cells=max_device_cells or 131072, mesh=mesh,
                output_dir=output_dir, save_weights=save_weights,
                checkpoint_every=checkpoint_every, resume=resume, tb=tb,
            )
        finally:
            if tb is not None:
                jax.profiler.stop_trace()
                tb.close()

    # ----- assemble host arrays (train.py:83-89) -----
    X = _densify(adata.X)
    if "dca_scale_mean" in adata.uns:
        # deferred z-scale (normalize(lazy_scale=True)): the dense path
        # applies it at assembly so lazy-normalized data trains identically
        # whether it lands here or in the streaming trainer
        X = (X - np.asarray(adata.uns["dca_scale_mean"], np.float32)) / \
            np.asarray(adata.uns["dca_scale_std"], np.float32)
    sf = _size_factors(adata)
    if output_subset:
        gene_idx = [np.where(adata.raw.var_names == x)[0][0] for x in output_subset]
        target = adata.raw.X[:, gene_idx] if use_raw_as_output else X[:, gene_idx]
    else:
        target = adata.raw.X if use_raw_as_output else X
    target = _densify(target)

    n = X.shape[0]
    split_at = int(n * (1.0 - validation_split))  # Keras tail split
    X_tr, X_val = X[:split_at], X[split_at:]
    T_tr, T_val = target[:split_at], target[split_at:]
    sf_tr, sf_val = sf[:split_at], sf[split_at:]
    n_train, n_val = X_tr.shape[0], X_val.shape[0]
    has_val = n_val > 0

    bs = min(batch_size, max(n_train, 1))
    n_full = n_train // bs
    rem = n_train - n_full * bs

    if mesh is not None:
        from ..parallel.step import shard_train_data

        val_weights = None
        if jax.process_count() > 1:
            # multi-host contract: every process calls train() with the SAME
            # global adata and identical seeds; each stages only its row
            # block of each split segment (docs/parallelism.md).  Row counts
            # that do not divide the data axis are AUTO-PADDED (VERDICT r3
            # item 5): train rows get copies of row 0 that the per-epoch
            # permutation (drawn over the REAL n_train only) never gathers;
            # validation rows get zero sample weights through the losses'
            # sample_weights plumbing, so val_loss stays exact.
            from ..parallel.multihost import host_local_to_global, process_row_range
            from jax.sharding import PartitionSpec as P

            n_data = mesh.shape["data"]
            pad_tr = (-n_train) % n_data
            pad_val = (-n_val) % n_data if has_val else 0
            if (pad_tr or pad_val) and compiled:
                # the one-XLA-program fit has no weighted-validation path
                compiled = False
                if verbose:
                    print("dca_tpu: padded multi-process split -> "
                          "python-epoch fit")
            lo, hi = process_row_range(n_train + pad_tr)
            X_tr = _pad_rows(X_tr, pad_tr)[lo:hi]
            T_tr = _pad_rows(T_tr, pad_tr)[lo:hi]
            sf_tr = _pad_rows(sf_tr, pad_tr)[lo:hi]
            if has_val:
                vlo, vhi = process_row_range(n_val + pad_val)
                X_val = _pad_rows(X_val, pad_val)[vlo:vhi]
                T_val = _pad_rows(T_val, pad_val)[vlo:vhi]
                sf_val = _pad_rows(sf_val, pad_val)[vlo:vhi]
                if pad_val:
                    w_val = np.ones((n_val + pad_val,), np.float32)
                    w_val[n_val:] = 0.0
                    val_weights = host_local_to_global(
                        mesh, P("data"), w_val[vlo:vhi]
                    )

        dev_Xtr, dev_Ttr, dev_sftr = shard_train_data(mesh, X_tr, T_tr, sf_tr)
        if has_val:
            dev_Xval, dev_Tval, dev_sfval = shard_train_data(mesh, X_val, T_val, sf_val)
    else:
        val_weights = None
        dev_Xtr, dev_Ttr, dev_sftr = jnp.asarray(X_tr), jnp.asarray(T_tr), jnp.asarray(sf_tr)
        if has_val:
            dev_Xval, dev_Tval, dev_sfval = (
                jnp.asarray(X_val),
                jnp.asarray(T_val),
                jnp.asarray(sf_val),
            )

    if tb is not None:
        jax.profiler.start_trace(os.path.join(output_dir, "tb"))

    try:
        return _train_inner(
            network, opt, lr, epochs, reduce_lr, early_stop, save_weights,
            output_dir, seed, verbose, compiled, checkpoint_every, resume,
            dev_Xtr, dev_Ttr, dev_sftr,
            (dev_Xval, dev_Tval, dev_sfval) if has_val else None,
            n_train, bs, n_full, rem, has_val, mesh, tb, val_weights,
        )
    finally:
        if tb is not None:
            jax.profiler.stop_trace()
            tb.close()


def _train_inner(
    network, opt, lr, epochs, reduce_lr, early_stop, save_weights, output_dir,
    seed, verbose, compiled, checkpoint_every, resume,
    dev_Xtr, dev_Ttr, dev_sftr, val, n_train, bs, n_full, rem, has_val,
    mesh=None, tb=None, val_weights=None,
):
    if has_val:
        dev_Xval, dev_Tval, dev_sfval = val

    if compiled:
        return _train_compiled(
            network, opt, lr, dev_Xtr, dev_Ttr, dev_sftr,
            (dev_Xval, dev_Tval, dev_sfval) if has_val else None,
            n_train=n_train, batch_size=bs, epochs=epochs, reduce_lr=reduce_lr,
            early_stop=early_stop, save_weights=save_weights,
            output_dir=output_dir, seed=seed, verbose=verbose, mesh=mesh,
            tb=tb,
        )

    loss_fn = network.loss_fn
    debug = bool(getattr(network.definition, "debug", False))
    constrain_batch = _batch_constrainer(mesh)

    def _step(params, state, opt_state, xb, tb, sfb, lr_arr, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, xb, sfb, tb, True, rng
        )
        params, opt_state = opt.update(grads, opt_state, params, lr_arr)
        return params, new_state, opt_state, loss

    def epoch_fn(params, state, opt_state, Xd, Td, SFd, batches, lr_arr, rng):
        def body(carry, inp):
            params, state, opt_state = carry
            idx, step_i = inp
            xb, tb, sfb = constrain_batch(
                jnp.take(Xd, idx, axis=0),
                jnp.take(Td, idx, axis=0),
                jnp.take(SFd, idx, axis=0),
            )
            step_rng = jax.random.fold_in(rng, step_i)
            params, state, opt_state, loss = _step(
                params, state, opt_state, xb, tb, sfb, lr_arr, step_rng
            )
            return (params, state, opt_state), loss

        (params, state, opt_state), losses_seq = jax.lax.scan(
            body,
            (params, state, opt_state),
            (batches, jnp.arange(batches.shape[0], dtype=jnp.int32)),
        )
        return params, state, opt_state, losses_seq

    def eval_fn_impl(params, state, xb, sfb, tb):
        loss, _ = loss_fn(params, state, xb, sfb, tb, False, None)
        return loss

    def eval_w_impl(params, state, xb, sfb, tb, w):
        # padded multi-process validation: zero-weight padding rows drop out
        # of both the numerator and the weighted-element denominator, so the
        # value equals the unpadded masked mean (losses._apply_weights)
        loss, _ = loss_fn(params, state, xb, sfb, tb, False, None, w)
        return loss

    def rem_step_impl(params, state, opt_state, Xd, Td, SFd, idx, lr_arr, rng):
        # same batch-sharding constraint as the epoch body — without it the
        # remainder minibatch replicates on every device of the mesh
        xb, tb, sfb = constrain_batch(
            jnp.take(Xd, idx, axis=0),
            jnp.take(Td, idx, axis=0),
            jnp.take(SFd, idx, axis=0),
        )
        return _step(params, state, opt_state, xb, tb, sfb, lr_arr, rng)

    epoch_fn = _checked_jit(epoch_fn, debug)
    rem_step_fn = _checked_jit(rem_step_impl, debug)
    eval_fn = _checked_jit(eval_fn_impl, debug)
    eval_w_fn = (_checked_jit(eval_w_impl, debug)
                 if val_weights is not None else None)

    grad_fn = None
    if tb is not None:
        # write_grads=True analogue (reference train.py:76-79): per-epoch
        # gradient histograms, evaluated on the monitored split like Keras
        # evaluates its histogram_freq summaries on the validation data
        def _grads_impl(params, state, xb, sfb, tbatch, w=None):
            return jax.grad(
                lambda p: loss_fn(p, state, xb, sfb, tbatch, False, None, w)[0]
            )(params)

        grad_fn = _checked_jit(_grads_impl, debug)

    params, state = network.params, network.state
    opt_state = opt.init(params)
    if mesh is not None:
        from ..parallel.step import place_train_state

        params, state, opt_state = place_train_state(
            network, mesh, params, state, opt_state
        )

    rng_np = np.random.RandomState(seed)
    base_rng = jax.random.PRNGKey(seed)

    hist = History()
    cbs = _FitCallbacks(lr, reduce_lr, early_stop, save_weights, output_dir,
                        network, verbose, "val_loss" if has_val else "loss")
    stop = False
    start_epoch = 0

    ckpt = None
    if (checkpoint_every or resume) and output_dir is not None:
        from .checkpoint import TrainCheckpoint

        ckpt = TrainCheckpoint(os.path.join(output_dir, "checkpoints"))
        if resume:
            tree, meta = ckpt.restore(
                {"params": params, "state": state, "opt_state": opt_state}
            )
            if tree is not None:
                params, state, opt_state = (
                    tree["params"], tree["state"], tree["opt_state"]
                )
                cbs.restore(meta)
                start_epoch = int(meta["step"]) + 1
                # replay the shuffle stream so resumed epochs see the same perms
                for _ in range(start_epoch):
                    rng_np.permutation(n_train)
                if mesh is not None:
                    from ..parallel.step import place_train_state

                    params, state, opt_state = place_train_state(
                        network, mesh, params, state, opt_state
                    )
                if verbose:
                    print(f"dca_tpu: resumed from epoch {start_epoch}")

    for epoch in range(start_epoch, epochs):
        perm = rng_np.permutation(n_train).astype(np.int32)
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        lr_arr = jnp.float32(cbs.lr)

        total_loss = 0.0
        if n_full > 0:
            batches = jnp.asarray(perm[: n_full * bs].reshape(n_full, bs))
            params, state, opt_state, losses_seq = epoch_fn(
                params, state, opt_state, dev_Xtr, dev_Ttr, dev_sftr, batches, lr_arr,
                epoch_rng,
            )
            total_loss += float(jnp.sum(losses_seq)) * bs
        if rem > 0:
            idx = jnp.asarray(perm[n_full * bs :])
            params, state, opt_state, loss = rem_step_fn(
                params, state, opt_state, dev_Xtr, dev_Ttr, dev_sftr, idx,
                lr_arr, jax.random.fold_in(epoch_rng, n_full),
            )
            total_loss += float(loss) * rem

        train_loss = total_loss / max(n_train, 1)
        hist.append("loss", train_loss)
        hist.append("lr", cbs.lr)

        if has_val:
            if eval_w_fn is not None:
                val_loss = float(eval_w_fn(params, state, dev_Xval, dev_sfval,
                                           dev_Tval, val_weights))
            else:
                val_loss = float(eval_fn(params, state, dev_Xval, dev_sfval,
                                         dev_Tval))
            hist.append("val_loss", val_loss)
            monitor = val_loss
        else:
            monitor = train_loss

        if verbose:
            msg = f"Epoch {epoch + 1}/{epochs} - loss: {train_loss:.4f}"
            if has_val:
                msg += f" - val_loss: {val_loss:.4f}"
            msg += f" - lr: {cbs.lr:.2e}"
            print(msg)

        if tb is not None:
            if has_val:
                grads = grad_fn(params, state, dev_Xval, dev_sfval, dev_Tval,
                                val_weights)
            else:
                grads = grad_fn(params, state, dev_Xtr, dev_sftr, dev_Ttr)
            tb.epoch(
                epoch,
                {"loss": train_loss, "lr": cbs.lr,
                 "val_loss": val_loss if has_val else None},
                params,
                grads,
            )
            if debug and has_val:
                tb.loss_terms(epoch, network, params, state,
                              dev_Xval, dev_sfval, dev_Tval)

        # ----- callbacks (train.py:62-79) -----
        stop = cbs.end_epoch(epoch, monitor, params, state)

        if ckpt is not None and checkpoint_every and (
            (epoch + 1) % checkpoint_every == 0 or stop or epoch == epochs - 1
        ):
            ckpt.save(epoch, params, state, opt_state, lr=cbs.lr, seed=seed,
                      callback_state=cbs.state_dict())

        if stop:
            break

    network.params, network.state = params, state
    network._predict_jit = None
    return hist


def train_with_args(args):
    """CLI driver (reference train.py:103-191): read → normalize → build →
    train on the train split → predict full → write TSVs."""
    import random as _random

    from ..data import io as dio
    from ..models import AE_types

    _random.seed(42)
    np.random.seed(42)
    os.environ["PYTHONHASHSEED"] = "0"

    if args.hyper:
        from ..hyper import hyper

        hyper(args)
        return

    adata = dio.read_dataset(
        args.input,
        transpose=(not args.transpose),  # assume gene x cell by default (train.py:125)
        check_counts=args.checkcounts,
        test_split=args.testsplit,
    )

    adata = dio.normalize(
        adata,
        size_factors=args.sizefactors,
        logtrans_input=args.loginput,
        normalize_input=args.norminput,
        # large sparse inputs stay sparse end-to-end (z-scale deferred to
        # the streaming trainer's on-device epilogue)
        lazy_scale=dio.auto_lazy_scale(adata),
    )

    if args.denoisesubset:
        genelist = list(set(dio.read_genelist(args.denoisesubset)))
        assert len(set(genelist) - set(adata.var_names.values)) == 0, (
            "Gene list is not overlapping with genes from the dataset"
        )
        output_size = len(genelist)
    else:
        genelist = None
        output_size = adata.n_vars

    hidden_size = [int(x) for x in args.hiddensize.split(",")]
    hidden_dropout = [float(x) for x in args.dropoutrate.split(",")]
    if len(hidden_dropout) == 1:
        hidden_dropout = hidden_dropout[0]

    assert args.type in AE_types, "loss type not supported"
    input_size = adata.n_vars

    net = AE_types[args.type](
        input_size=input_size,
        output_size=output_size,
        hidden_size=hidden_size,
        l2_coef=args.l2,
        l1_coef=args.l1,
        l2_enc_coef=args.l2enc,
        l1_enc_coef=args.l1enc,
        ridge=args.ridge,
        hidden_dropout=hidden_dropout,
        input_dropout=args.inputdropout,
        batchnorm=args.batchnorm,
        activation=args.activation,
        init=args.init,
        debug=args.debug,
        file_path=args.outputdir,
    )

    net.save()
    net.build()

    devices = getattr(args, "devices", None)
    if devices is not None and devices != "all":
        devices = int(devices)

    train(
        adata[adata.obs.dca_split == "train"],
        net,
        output_dir=args.outputdir,
        learning_rate=args.learningrate,
        epochs=args.epochs,
        batch_size=args.batchsize,
        early_stop=args.earlystop,
        reduce_lr=args.reducelr,
        output_subset=genelist,
        optimizer=args.optimizer,
        clip_grad=args.gradclip,
        save_weights=args.saveweights,
        tensorboard=args.tensorboard,
        threads=args.threads,
        devices=devices,
        model_parallel=getattr(args, "modelparallel", 1),
    )

    if genelist:
        predict_columns = adata.var_names[
            [np.where(adata.var_names == x)[0][0] for x in genelist]
        ]
    else:
        predict_columns = adata.var_names

    # corpus-scale outputs stream block-wise to disk instead of
    # materializing every (N, G) output in host memory (the reference's
    # predict-then-write, train.py:190-191, needs the full dense matrix
    # resident — ~18 GB at the paper's 1.3M-cell scale)
    out_fmt = getattr(args, "outputformat", "tsv")
    out_bytes = adata.n_obs * output_size * 4
    limit = int(os.environ.get("DCA_TPU_HOST_DENSE_BYTES", 2_000_000_000))
    if out_fmt == "h5ad" or out_bytes > limit:
        net.write_streaming(adata, args.outputdir, mode="full",
                            colnames=predict_columns, return_info=True,
                            output_format=out_fmt)
    else:
        net.predict(adata, mode="full", return_info=True)
        net.write(adata, args.outputdir, mode="full", colnames=predict_columns)


def _train_compiled(
    network, opt, lr, Xtr, Ttr, SFtr, val, *, n_train, batch_size, epochs,
    reduce_lr, early_stop, save_weights, output_dir, seed, verbose, mesh=None,
    tb=None,
):
    """One-device-call fit (see compiled.py); with a mesh the whole
    multi-epoch program is GSPMD-partitioned over it."""
    from .compiled import build_fit_fn

    has_val = val is not None
    track_best = bool(save_weights and output_dir is not None)
    fit = jax.jit(
        build_fit_fn(
            network,
            opt,
            n_train=n_train,
            batch_size=batch_size,
            epochs=epochs,
            has_val=has_val,
            reduce_lr=reduce_lr,
            early_stop=early_stop,
            track_best=track_best,
            mesh=mesh,
        )
    )
    if has_val:
        Xval, Tval, SFval = val
    else:
        # zero-size placeholders keep the signature static
        Xval = jnp.zeros((1, Xtr.shape[1]), jnp.float32)
        Tval = jnp.zeros((1, Ttr.shape[1]), jnp.float32)
        SFval = jnp.ones((1,), jnp.float32)

    params0, state0 = network.params, network.state
    opt_state = opt.init(params0)
    if mesh is not None:
        from ..parallel.step import place_train_state

        params0, state0, opt_state = place_train_state(
            network, mesh, params0, state0, opt_state
        )
    (params, state, best_params, best_state, loss_h, val_h, lr_h, epochs_run) = fit(
        params0, state0, opt_state, Xtr, Ttr, SFtr,
        Xval, Tval, SFval, jnp.float32(lr), jax.random.PRNGKey(seed),
    )
    n_run = int(epochs_run)

    hist = History()
    loss_np = np.asarray(loss_h)[:n_run]
    lr_np = np.asarray(lr_h)[:n_run]
    val_np = np.asarray(val_h)[:n_run]
    for e in range(n_run):
        hist.append("loss", loss_np[e])
        hist.append("lr", lr_np[e])
        if has_val:
            hist.append("val_loss", val_np[e])
        if verbose:
            msg = f"Epoch {e + 1}/{epochs} - loss: {loss_np[e]:.4f}"
            if has_val:
                msg += f" - val_loss: {val_np[e]:.4f}"
            print(msg + f" - lr: {lr_np[e]:.2e}")
        if tb is not None:  # scalars post-hoc: the fit was ONE XLA program
            tb.epoch(e, {"loss": loss_np[e], "lr": lr_np[e],
                         "val_loss": val_np[e] if has_val else None})
    if tb is not None and n_run > 0:
        tb.histograms(n_run - 1, params)  # final weights only (see _TBLogger)
        if has_val:
            # final-epoch gradient histograms (write_grads analogue; the
            # whole-fit-as-one-program path has no per-epoch host hop)
            loss_fn = network.loss_fn
            grads = jax.jit(
                lambda p, s, x, sf, t: jax.grad(
                    lambda pp: loss_fn(pp, s, x, sf, t, False, None)[0]
                )(p)
            )(params, state, Xval, SFval, Tval)
            tb.histograms(n_run - 1, grads, prefix="grads/")

    network.params, network.state = params, state
    network._predict_jit = None
    if track_best:
        final_params, final_state = network.params, network.state
        network.params, network.state = best_params, best_state
        network.save_weights(os.path.join(output_dir, "weights.hdf5"))
        network.params, network.state = final_params, final_state
    return hist


def _derivable_row_scale(Xn, raw):
    """Per-row multiplier ``m`` with ``Xn == log1p(raw * m)`` elementwise,
    or None when the normalized input is not derivable from the raw target
    that way (different pattern, subset target, non-default normalize
    flags, ...).

    The multiplier is recovered EMPIRICALLY from the first nonzero of each
    row and verified on a random sample of entries, so no normalization
    bookkeeping needs to be threaded through — any "per-row scale then
    log1p" pipeline qualifies, anything else fails verification and falls
    back to shipping both payloads."""
    if Xn is raw:
        return None
    if not (sp.isspmatrix_csr(Xn) and sp.isspmatrix_csr(raw)):
        return None
    if Xn.shape != raw.shape or Xn.nnz != raw.nnz or Xn.nnz == 0:
        return None
    from ..data.loader import canonicalize_csr

    canonicalize_csr(Xn)
    canonicalize_csr(raw)
    if not (np.array_equal(Xn.indptr, raw.indptr)
            and np.array_equal(Xn.indices, raw.indices)):
        return None
    lens = np.diff(Xn.indptr)
    nonempty = lens > 0
    first = Xn.indptr[:-1][nonempty]
    with np.errstate(divide="ignore", invalid="ignore"):
        m = np.ones(Xn.shape[0], np.float64)
        m[nonempty] = np.expm1(Xn.data[first].astype(np.float64)) / raw.data[first]
    if not np.all(np.isfinite(m)) or np.any(m <= 0):
        return None
    k = min(50000, Xn.nnz)
    sel = np.random.RandomState(0).randint(0, Xn.nnz, k)
    rows_of = np.searchsorted(Xn.indptr, sel, side="right") - 1
    recon = np.log1p(raw.data[sel].astype(np.float64) * m[rows_of])
    if not np.allclose(recon, Xn.data[sel], rtol=1e-5, atol=1e-6):
        return None
    return m.astype(np.float32)


def _train_streaming(
    adata, network, opt, lr, *, epochs, reduce_lr, early_stop, batch_size,
    validation_split, use_raw_as_output, output_subset, seed, verbose,
    max_device_cells, mesh=None, output_dir=None, save_weights=False,
    checkpoint_every=0, resume=False, tb=None,
):
    """Chunked training for datasets too large to stage on device whole
    (data/loader.py).  The count matrix stays sparse on the host; shuffled
    fixed-size chunks are densified (+ lazily z-scaled), shipped to HBM once
    per epoch, and all their minibatch steps run as one on-device scan.

    Carries the full dense-path callback surface — best-weights save,
    checkpoint_every/resume crash recovery — since the 1M-cell runs this
    path exists for are exactly the ones that need them."""
    from ..config import use_device_densify
    from ..data.loader import Flat8Chunk, FlatChunk, SparseChunk, StreamingData

    X = adata.X
    sf = _size_factors(adata)
    if output_subset:
        gene_idx = [np.where(adata.raw.var_names == x)[0][0] for x in output_subset]
        target = adata.raw.X[:, gene_idx] if use_raw_as_output else X[:, gene_idx]
    else:
        target = adata.raw.X if use_raw_as_output else X

    scale_mean = scale_std = sm_dev = ss_dev = None
    if "dca_scale_mean" in adata.uns:  # lazy-scale mode (normalize(lazy=True))
        scale_mean = np.asarray(adata.uns["dca_scale_mean"], np.float32)
        scale_std = np.asarray(adata.uns["dca_scale_std"], np.float32)
        # device-resident copies uploaded ONCE: a per-part jnp.asarray of
        # the same vectors costs two link round trips per staged part
        sm_dev = jnp.asarray(scale_mean)
        ss_dev = jnp.asarray(scale_std)

    n = X.shape[0]
    split_at = int(n * (1.0 - validation_split))
    bs = min(batch_size, max(split_at, 1))
    chunk = max((min(max_device_cells, split_at) // bs) * bs, bs)

    # on-device densify (DCA_TPU_DEVICE_DENSIFY=1): ship O(nnz) payloads,
    # scatter + z-scale on-chip (ops/densify.py); dense host tier otherwise.
    # Composes with the mesh path too: payloads are row-sharded over 'data'
    # and scattered shard-locally (make_sharded_densifier).
    dev_densify = use_device_densify()
    # single-process meshes stream the flat encoding as per-shard stacks
    # (FlatShardedChunk -> make_sharded_flat_densifier, VERDICT r4 item 2);
    # MULTI-process staging still row-slices (B, K) slabs per host, which
    # the flat COO stream does not support, so it forces padded payloads
    pmode = ("padded" if mesh is not None and jax.process_count() > 1
             else "auto")

    # ship-one-payload mode: when the normalized input is an elementwise
    # per-row function of the raw target (the default normalize pipeline:
    # x = log1p(raw * m_r), z-scale fused on device), only the target
    # payload crosses the link and the input is DERIVED on device —
    # halves the transfer of the transfer-bound 1M-cell epochs.  Composes
    # with single-process meshes (the derive is elementwise, GSPMD shards
    # it with the row-sharded target); multi-process staging ships both.
    X_tr, X_va = X[:split_at], X[split_at:]
    T_tr, T_va = target[:split_at], target[split_at:]
    m_tr = m_va = None
    if (dev_densify and jax.process_count() == 1 and scale_mean is not None
            and os.environ.get("DCA_TPU_DERIVE_INPUT", "1") != "0"):
        m_tr = _derivable_row_scale(X_tr, T_tr)
        if m_tr is not None and split_at < n:
            m_va = _derivable_row_scale(X_va, T_va)
            if m_va is None:
                m_tr = None  # both splits or neither

    tr = StreamingData(X_tr, T_tr, sf[:split_at], chunk,
                       scale_mean, scale_std, device_densify=dev_densify,
                       payload_mode=pmode, derive_input=m_tr is not None)
    tr.derive_m = m_tr
    has_val = split_at < n
    if has_val:
        va = StreamingData(X_va, T_va, sf[split_at:], chunk,
                           scale_mean, scale_std, device_densify=dev_densify,
                           payload_mode=pmode, derive_input=m_va is not None)
        va.derive_m = m_va
    n_train = split_at

    # device-RESIDENT corpus (ops/resident.py): upload the compressed CSR
    # payload ONCE and rebuild every shuffled part on device with
    # slice-form gathers — zero per-epoch payload transfer (only the
    # ~4 B/cell row ids cross the link, vs ~4 B/nonzero of payload per
    # epoch on the wire path).  Measured at 1.3M x 3451: 22.4 s steady
    # epochs (58,008 cells/s), ±0.1 s across epochs, vs the wire path's
    # link-bound 29 s — and the win only exists with the dynamic_slice
    # gather form; the first (elementwise-gather) cut measured 3.2x
    # SLOWER than the wire (docs/benchmarks.md round 5).  Auto-engages
    # for single-device ship-one-payload runs whose payload fits the
    # DCA_TPU_RESIDENT_MIN_BYTES..DCA_TPU_RESIDENT_BYTES HBM budget;
    # DCA_TPU_RESIDENT=1/0 forces on/off.
    resident = None
    if m_tr is not None and mesh is None and sp.isspmatrix_csr(target):
        from ..ops.resident import ResidentCSR

        _rmode = os.environ.get("DCA_TPU_RESIDENT", "auto")
        _rlo = int(os.environ.get("DCA_TPU_RESIDENT_MIN_BYTES", 64_000_000))
        _rhi = int(os.environ.get("DCA_TPU_RESIDENT_BYTES", 4_000_000_000))
        _rest = ResidentCSR.payload_bytes(target)
        # padded-rebuild HBM guard: per-part idx/dat intermediates are
        # chunk x K(=max nnz/row) x 8 B, so a single heavy row inflates
        # K and can blow the part past HBM on wide panels even when the
        # compressed payload itself is small — auto declines those
        # (force with DCA_TPU_RESIDENT=1 after shrinking max_device_cells)
        _kmax = int(np.diff(target.indptr).max()) if target.shape[0] else 0
        _part_b = int(os.environ.get("DCA_TPU_RESIDENT_PART_BYTES",
                                     6_000_000_000))
        _auto_ok = _rlo <= _rest <= _rhi and chunk * _kmax * 8 <= _part_b
        if _rmode == "1" or (_rmode != "0" and _auto_ok):
            m_full = np.concatenate([m_tr, m_va]) if has_val else m_tr
            resident = ResidentCSR(target, m_full,
                                   np.asarray(sf, np.float32),
                                   scale_mean, scale_std)
            if verbose:
                print(f"dca_tpu: corpus resident on device "
                      f"({_rest / 1e6:.0f} MB payload) [streaming]")

    loss_fn = network.loss_fn
    debug = bool(getattr(network.definition, "debug", False))
    constrain_batch = _batch_constrainer(mesh)

    def _step(params, state, opt_state, xb, tb, sfb, lr_arr, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state, xb, sfb, tb, True, rng
        )
        params, opt_state = opt.update(grads, opt_state, params, lr_arr)
        return params, new_state, opt_state, loss

    def chunk_fn(params, state, opt_state, Xc, Tc, SFc, lr_arr, rng):
        nb = Xc.shape[0] // bs

        def body(carry, step_i):
            params, state, opt_state = carry
            lo = step_i * bs
            xb, tb, sfb = constrain_batch(
                jax.lax.dynamic_slice_in_dim(Xc, lo, bs, 0),
                jax.lax.dynamic_slice_in_dim(Tc, lo, bs, 0),
                jax.lax.dynamic_slice_in_dim(SFc, lo, bs, 0),
            )
            params, state, opt_state, loss = _step(
                params, state, opt_state, xb, tb, sfb, lr_arr,
                jax.random.fold_in(rng, step_i),
            )
            return (params, state, opt_state), loss

        (params, state, opt_state), losses_seq = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(nb, dtype=jnp.int32)
        )
        return params, state, opt_state, jnp.sum(losses_seq) * bs

    def rem_fn(params, state, opt_state, xb, tb, sfb, lr_arr, rng):
        params, state, opt_state, loss = _step(
            params, state, opt_state, xb, tb, sfb, lr_arr, rng
        )
        return params, state, opt_state, loss * xb.shape[0]

    def eval_chunk_impl(params, state, xb, sfb, tb):
        loss, _ = loss_fn(params, state, xb, sfb, tb, False, None)
        return loss * xb.shape[0]

    def eval_chunk_w_impl(params, state, xb, sfb, tb, wb):
        # auto-padded multi-process validation: zero-weight padding rows
        # drop out of the weighted mean (losses._apply_weights) and eval
        # mode uses the RUNNING BatchNorm statistics, so the value equals
        # the unpadded chunk's exactly
        loss, _ = loss_fn(params, state, xb, sfb, tb, False, None, wb)
        return loss * jnp.sum(wb)

    chunk_fn = _checked_jit(chunk_fn, debug)
    rem_fn = _checked_jit(rem_fn, debug)
    eval_chunk = _checked_jit(eval_chunk_impl, debug)
    eval_chunk_w = _checked_jit(eval_chunk_w_impl, debug)

    grad_fn = None
    if tb is not None:
        # write_grads=True analogue — evaluated per epoch on the first
        # validation chunk (Keras computes its histogram summaries on the
        # validation data), or the last staged train part without a split
        def _grads_impl(params, state, xb, sfb, tbatch, w=None):
            return jax.grad(
                lambda p: loss_fn(p, state, xb, sfb, tbatch, False, None, w)[0]
            )(params)

        grad_fn = _checked_jit(_grads_impl, debug)

    params, state = network.params, network.state
    opt_state = opt.init(params)
    _derive_impl = jax.jit(
        lambda t, m, mu, sd_: (jnp.log1p(t * m[:, None]) - mu) / sd_
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from ..data.loader import FlatShardedChunk
        from ..ops.densify import (
            make_sharded_densifier,
            make_sharded_flat_densifier,
        )
        from ..parallel.mesh import batch_sharding, batch_vector_sharding, replicated
        from ..parallel.step import place_train_state, shard_train_data as _shard

        params, state, opt_state = place_train_state(
            network, mesh, params, state, opt_state
        )

        bsh, vsh, rsh = batch_sharding(mesh), batch_vector_sharding(mesh), replicated(mesh)
        n_data_axis = mesh.shape["data"]
        _densifiers = {}  # (n_cols, scaled, even) -> compiled sharded scatter
        _flat_densifiers = {}  # (L, Bs, scaled, dtypes) -> compiled scatter

        def _flat_sharded_ship(c, scaled, reuse=None):
            """Upload a FlatShardedChunk (one device_put) and scatter it
            shard-local; returns (dense P('data', None), (counts_d, col_d))
            for index-stream reuse when input/target share the pattern."""
            key = (c.n_cols, c.col.shape, c.counts.shape[1], scaled,
                   str(c.col.dtype), str(c.val.dtype))
            if key not in _flat_densifiers:
                _flat_densifiers[key] = make_sharded_flat_densifier(
                    mesh, c.n_cols, scaled
                )
            stack_sh = jax.sharding.NamedSharding(mesh, P("data", None))
            if reuse is not None:
                counts_d, col_d = reuse
                val_d = jax.device_put(c.val, stack_sh)
            else:
                counts_d, col_d, val_d = jax.device_put(
                    (c.counts, c.col, c.val), stack_sh
                )
            if scaled:
                d = _flat_densifiers[key](counts_d, col_d, val_d,
                                          sm_dev, ss_dev)
            else:
                d = _flat_densifiers[key](counts_d, col_d, val_d)
            return d, (counts_d, col_d)

        def _put_rows(arr, even):
            """Row-partitioned host->mesh placement for a payload slab.
            Odd GLOBAL row counts place replicated — multi-process odd parts
            arrive as the FULL part on every process (stage_part 'rem')."""
            if jax.process_count() > 1:
                from ..parallel.multihost import host_local_to_global

                return host_local_to_global(
                    mesh, P("data", None) if even else P(), arr
                )
            sh = bsh if even else rsh
            return jax.device_put(arr, sh)

        def _mesh_densify(c, scaled, even, idx_dev=None):
            # pjit out_shardings require divisibility; an odd-sized GLOBAL
            # part falls back to a replicated dense block (single-process
            # only — multi-process parts are auto-padded to the data axis,
            # and evenness MUST be judged on the global row count: local
            # counts can disagree across ranks, which would pick divergent
            # out_shardings and desync the SPMD programs — ADVICE r3)
            key = (c.n_cols, scaled, even)
            if key not in _densifiers:
                _densifiers[key] = make_sharded_densifier(
                    c.n_cols, bsh if even else rsh, scaled
                )
            idx = idx_dev if idx_dev is not None else _put_rows(
                np.ascontiguousarray(c.idx), even
            )
            dat = _put_rows(np.ascontiguousarray(c.dat), even)
            if scaled:
                return _densifiers[key](idx, dat, sm_dev, ss_dev), idx
            return _densifiers[key](idx, dat), idx

        def _stage(xc, tc, sfc, global_rows, m_part=None):
            even = global_rows % n_data_axis == 0

            def _sf_dev(repl=False):
                s = np.asarray(sfc, np.float32)
                if jax.process_count() > 1:
                    from ..parallel.multihost import host_local_to_global

                    return host_local_to_global(
                        mesh, P("data") if even and not repl else P(), s
                    )
                return jax.device_put(s, vsh if even and not repl else rsh)

            # ship-one-payload under the mesh (single-process): densify the
            # target row-sharded, derive the input elementwise on device —
            # GSPMD keeps the derive shard-local (no collective)
            if m_part is not None and xc is tc:
                if isinstance(tc, FlatShardedChunk):
                    td, _ = _flat_sharded_ship(tc, False)
                elif isinstance(tc, SparseChunk):
                    td, _ = _mesh_densify(tc, False, even)
                else:
                    td = _put_rows(np.asarray(tc, np.float32), even)
                m_dev = jax.device_put(
                    np.asarray(m_part, np.float32), vsh if even else rsh
                )
                xd = _derive_impl(td, m_dev, sm_dev, ss_dev)
                return xd, td, _sf_dev()

            if isinstance(xc, FlatShardedChunk) or isinstance(tc, FlatShardedChunk):
                reuse = None
                if isinstance(xc, FlatShardedChunk):
                    xd, reuse = _flat_sharded_ship(xc, scale_mean is not None)
                else:
                    xd = _put_rows(np.asarray(xc, np.float32), even)
                if isinstance(tc, FlatShardedChunk):
                    shared = (isinstance(xc, FlatShardedChunk)
                              and tc.col is xc.col)
                    td, _ = _flat_sharded_ship(
                        tc, False, reuse if shared else None
                    )
                else:
                    td = _put_rows(np.asarray(tc, np.float32), even)
                return xd, td, _sf_dev()

            if isinstance(xc, SparseChunk) or isinstance(tc, SparseChunk):
                idx_dev = None
                if isinstance(xc, SparseChunk):
                    xd, idx_dev = _mesh_densify(xc, scale_mean is not None, even)
                else:
                    xd = _put_rows(np.asarray(xc, np.float32), even)
                if isinstance(tc, SparseChunk):
                    shared = isinstance(xc, SparseChunk) and tc.idx is xc.idx
                    td, _ = _mesh_densify(
                        tc, False, even, idx_dev if shared else None
                    )
                else:
                    td = _put_rows(np.asarray(tc, np.float32), even)
                sfc = np.asarray(sfc, np.float32)
                if jax.process_count() > 1:
                    from ..parallel.multihost import host_local_to_global

                    sfd = host_local_to_global(
                        mesh, P("data") if even else P(), sfc
                    )
                else:
                    sfd = jax.device_put(sfc, vsh if even else rsh)
                return xd, td, sfd
            if jax.process_count() > 1 and not even:
                from ..parallel.multihost import host_local_to_global

                return (
                    host_local_to_global(mesh, P(), np.asarray(xc, np.float32)),
                    host_local_to_global(mesh, P(), np.asarray(tc, np.float32)),
                    host_local_to_global(mesh, P(), np.asarray(sfc, np.float32)),
                )
            return _shard(mesh, np.asarray(xc, np.float32),
                          np.asarray(tc, np.float32), np.asarray(sfc, np.float32))
    else:
        from ..ops.densify import (
            device_densify as _dev_densify,
            device_densify_flat as _dev_densify_flat,
            device_densify_flat8 as _dev_densify_flat8,
        )

        def _to_device(c, scaled):
            # payload streams go up in ONE device_put: each separate
            # asarray is a dispatch round trip and the tunnel's per-call
            # latency drifts 40-400 ms (scripts/scatter_probe.py era note)
            if isinstance(c, SparseChunk):
                idx, dat = jax.device_put((c.idx, c.dat))
                return _dev_densify(
                    idx, dat, c.n_cols,
                    sm_dev if scaled else None,
                    ss_dev if scaled else None,
                )
            if isinstance(c, Flat8Chunk):
                return _dev_densify_flat8(
                    c,
                    sm_dev if scaled else None,
                    ss_dev if scaled else None,
                )
            if isinstance(c, FlatChunk):
                cnt, col, val = jax.device_put((c.counts, c.col, c.val))
                return _dev_densify_flat(
                    cnt, col, val, c.n_rows, c.n_cols,
                    sm_dev if scaled else None,
                    ss_dev if scaled else None,
                )
            return jnp.asarray(c)

        def _stage(xc, tc, sfc, m_part=None):
            # ship-one-payload mode: the loader returned the TARGET for both
            # slots (xc is tc); densify it once and derive the normalized
            # input on device: x = (log1p(t * m_r) - mean) / std
            if m_part is not None and xc is tc:
                td = _to_device(tc, False)
                xd = _derive_impl(td, jnp.asarray(m_part, jnp.float32),
                                  sm_dev, ss_dev)
                return xd, td, jnp.asarray(sfc)
            # input chunks get the z-scale epilogue fused into the on-device
            # scatter (the loader defers host scaling in payload mode).
            # When input and target share the sparsity pattern the loader
            # aliases their index arrays by identity — transfer them ONCE
            # and reuse the device copy for both scatters.
            scaled = scale_mean is not None
            if (isinstance(xc, FlatChunk) and isinstance(tc, FlatChunk)
                    and xc.counts is tc.counts and xc.col is tc.col):
                cnt_d = jnp.asarray(xc.counts)
                col_d = jnp.asarray(xc.col)
                return (
                    _dev_densify_flat(cnt_d, col_d, xc.val, xc.n_rows,
                                      xc.n_cols, scale_mean if scaled else None,
                                      scale_std if scaled else None),
                    _dev_densify_flat(cnt_d, col_d, tc.val, tc.n_rows,
                                      tc.n_cols),
                    jnp.asarray(sfc),
                )
            if (isinstance(xc, SparseChunk) and isinstance(tc, SparseChunk)
                    and xc.idx is tc.idx):
                idx_d = jnp.asarray(xc.idx)
                return (
                    _dev_densify(idx_d, xc.dat, xc.n_cols,
                                 scale_mean if scaled else None,
                                 scale_std if scaled else None),
                    _dev_densify(idx_d, tc.dat, tc.n_cols),
                    jnp.asarray(sfc),
                )
            return (_to_device(xc, scaled), _to_device(tc, False),
                    jnp.asarray(sfc))

    multiproc = mesh is not None and jax.process_count() > 1
    if multiproc:
        from ..parallel.multihost import process_row_range

        n_data = mesh.shape["data"]
        if n_data > bs:
            raise ValueError(
                f"multi-process streaming needs batch_size >= the data axis "
                f"({n_data}); got batch_size {bs} — data parallelism needs "
                f"at least one row per device per batch"
            )

    def stage_part(sd, idx_part, kind="full"):
        """Materialize + upload one staged part of a chunk; returns
        (x, t, sf, w).  Multi-process: each process materializes ONLY its
        row block (no wasted host densify/z-scale work).  Parts whose GLOBAL
        row count does not divide the data axis are handled per ``kind``
        (VERDICT r3 item 5) with EXACT single-process semantics:

          * 'full' (scanned train part, nb*bs real rows): padded with
            repeats of the first row; the padding (< batch_size rows) sits
            past the last scanned batch and is never consumed, so every
            training batch — and its BatchNorm batch statistics / dropout
            masks — is identical to the single-process one;
          * 'rem' (trailing partial batch, trained as ONE step): staged
            REPLICATED — every process materializes the whole part — since
            zero-weight padding would still alter the step's BatchNorm
            batch statistics and dropout mask shapes;
          * 'val' (eval only): padded + a staged per-row weight vector (0
            on padding) for the weighted eval — exact because eval mode
            uses running BN statistics and no dropout.

        ``w`` is the weight vector ('val' with padding) or None."""
        return _ship(_prepare(sd, idx_part, kind))

    def _prepare(sd, idx_part, kind):
        """Host half of staging: pad/slice the index part and materialize
        the chunk payloads (C++ tier).  NO JAX calls — safe to run on the
        prefetch thread even in multi-process mode."""
        w_local = None
        if multiproc:
            n_real = len(idx_part)
            pad = (-n_real) % n_data
            if pad and kind == "rem":
                g_rows = n_real  # odd => _stage routes replicated placement
            else:
                if pad:
                    idx_part = np.concatenate(
                        [idx_part, np.repeat(idx_part[:1], pad)]
                    )
                g_rows = len(idx_part)
                lo, hi = process_row_range(g_rows)
                if pad and kind == "val":
                    w_g = np.ones((g_rows,), np.float32)
                    w_g[n_real:] = 0.0
                    w_local = w_g[lo:hi]
                idx_part = idx_part[lo:hi]
        else:
            g_rows = len(idx_part)
        m = getattr(sd, "derive_m", None) if not multiproc else None
        m_part = m[idx_part] if m is not None else None
        shards = (mesh.shape["data"]
                  if mesh is not None and not multiproc else None)
        return (sd.materialize(idx_part, mesh_shards=shards),
                g_rows, w_local, m_part)

    def _ship(prep):
        """Device half of staging: upload + on-device densify."""
        mats, g_rows, w_local, m_part = prep
        w = None
        if w_local is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.multihost import host_local_to_global

            w = host_local_to_global(mesh, P("data"), w_local)
        if mesh is not None:
            return (*_stage(*mats, g_rows, m_part), w)
        if m_part is not None:
            return (*_stage(*mats, m_part), w)
        return (*_stage(*mats), w)

    # pipelined staging (DCA_TPU_PREFETCH=<depth>, 0 disables): one
    # background thread prepares up to ``depth`` parts ahead while the
    # main thread blocks on part k's device scan — hides the host prep
    # (and, single-process, the transfer too) behind compute (VERDICT r3
    # item 3).  Depth > 1 keeps the link busy during the C++ payload
    # builds that otherwise serialize between transfers (the round-5
    # timeline showed ~10 s/epoch of prep-induced link idle at depth 1);
    # each level of depth costs one more staged part in HBM — halve
    # max_device_cells if that overflows.  Single-process the thread runs
    # the full stage (C++ payload build releases the GIL; device_put is
    # async); MULTI-PROCESS it runs only the JAX-free host half and the
    # main thread ships: concurrent dispatch would let ranks interleave
    # collective programs in different orders and desync Gloo/ICI
    # (measured: gloo size-mismatch crash).
    prefetch_pool = None
    _pf = os.environ.get("DCA_TPU_PREFETCH", "1")
    prefetch_depth = max(int(_pf) if _pf.isdigit() else 1, 0)
    if resident is not None:
        prefetch_depth = 0  # no host staging to hide; dispatch is async
    if prefetch_depth > 0:
        from concurrent.futures import ThreadPoolExecutor

        prefetch_pool = ThreadPoolExecutor(max_workers=1)

    from time import perf_counter as _pc

    tl_path = os.environ.get("DCA_TPU_TIMELINE")
    tl = _StreamTimeline(tl_path) if tl_path else None

    def _staged(tasks):
        """Yield staged (x, t, sf, w) for (kind, sd, idx, ci) tasks, staging
        one task ahead on the prefetch thread when enabled."""
        if resident is not None:
            # parts rebuild on device from the resident corpus; row-id
            # uploads are tiny and dispatch is async, so no pipeline
            # thread is needed (validation rows offset past the split).
            # THROTTLE: with no host staging to pace it, Python could
            # dispatch a whole epoch of multi-GB parts ahead of execution
            # and overflow HBM — bound in-flight parts by syncing on an
            # older part's (tiny) sf output: programs retire in dispatch
            # order, so that proves every earlier gather AND scan is done.
            ahead = max(int(os.environ.get("DCA_TPU_RESIDENT_AHEAD", "1")), 0)
            window = []
            for pi, (kind, sd, idx, _) in enumerate(tasks):
                t0 = _pc()
                if ahead and len(window) >= ahead:
                    np.asarray(window.pop(0))
                rows = idx if sd is tr else np.asarray(idx) + split_at
                out = (*resident.part(rows), None)
                if ahead:
                    window.append(out[2])
                if tl is not None:
                    tl.rec(pi, kind, "wait", t0, _pc())
                yield out
            return
        if prefetch_pool is None:
            for pi, (kind, sd, idx, _) in enumerate(tasks):
                t0 = _pc()
                out = stage_part(sd, idx, kind=kind)
                if tl is not None:
                    tl.rec(pi, kind, "wait", t0, _pc())
                yield out
            return

        def work(pi, kind, sd, idx):
            t0 = _pc()
            p = _prepare(sd, idx, kind)
            t1 = _pc()
            if tl is not None:
                tl.rec(pi, kind, "prep", t0, t1)
            if multiproc:
                return p  # JAX-free half only; main thread ships
            out = _ship(p)
            if tl is not None:
                tl.rec(pi, kind, "ship", t1, _pc())
            return out

        finish = _ship if multiproc else (lambda r: r)
        from collections import deque

        pending = deque()  # (part_index, kind, future), up to `depth` deep
        for pi, (kind, sd, idx, _) in enumerate(tasks):
            pending.append((pi, kind,
                            prefetch_pool.submit(work, pi, kind, sd, idx)))
            while len(pending) > prefetch_depth:
                ppi, pkind, fut = pending.popleft()
                t0 = _pc()
                out = finish(fut.result())
                if tl is not None:
                    tl.rec(ppi, pkind, "wait", t0, _pc())
                yield out
        while pending:
            ppi, pkind, fut = pending.popleft()
            t0 = _pc()
            out = finish(fut.result())
            if tl is not None:
                tl.rec(ppi, pkind, "wait", t0, _pc())
            yield out

    rng_np = np.random.RandomState(seed)
    base_rng = jax.random.PRNGKey(seed)

    hist = History()
    cbs = _FitCallbacks(lr, reduce_lr, early_stop, save_weights, output_dir,
                        network, verbose, "val_loss" if has_val else "loss")
    stop = False
    start_epoch = 0

    ckpt = None
    if (checkpoint_every or resume) and output_dir is not None:
        from .checkpoint import TrainCheckpoint

        ckpt = TrainCheckpoint(os.path.join(output_dir, "checkpoints"))
        if resume:
            tree, meta = ckpt.restore(
                {"params": params, "state": state, "opt_state": opt_state}
            )
            if tree is not None:
                params, state, opt_state = (
                    tree["params"], tree["state"], tree["opt_state"]
                )
                cbs.restore(meta)
                start_epoch = int(meta["step"]) + 1
                # replay the shuffle stream so resumed epochs see the same perms
                for _ in range(start_epoch):
                    rng_np.permutation(n_train)
                if mesh is not None:
                    from ..parallel.step import place_train_state

                    params, state, opt_state = place_train_state(
                        network, mesh, params, state, opt_state
                    )
                if verbose:
                    print(f"dca_tpu: resumed from epoch {start_epoch} [streaming]")

    for epoch in range(start_epoch, epochs):
        perm = rng_np.permutation(n_train)
        epoch_rng = jax.random.fold_in(base_rng, epoch)
        lr_arr = jnp.float32(cbs.lr)

        # the epoch's full staging schedule (train parts, then validation
        # chunks — val data does not depend on params, so it can prefetch
        # behind the last train scans too)
        tasks = []  # (stage_kind, StreamingData, idx, chunk_counter)
        ci = 0
        for idx_chunk in tr.index_chunks(perm):
            n_c = len(idx_chunk)
            nb = n_c // bs
            if nb > 0:
                tasks.append(("full", tr, idx_chunk[: nb * bs], ci))
            if n_c - nb * bs > 0:
                tasks.append(("rem", tr, idx_chunk[nb * bs:], ci))
            ci += 1
        if has_val:
            for idx_chunk in va.index_chunks(np.arange(va.n)):
                tasks.append(("val", va, idx_chunk, 0))

        # per-part losses stay ON DEVICE and are fetched in ONE bulk sync at
        # epoch end: a float(s) after every part costs a host round trip
        # (tunnel latency drifts 40-400 ms per call) and stalls the
        # dispatch pipeline the prefetcher exists to keep full
        if tl is not None:
            tl.epoch = epoch
            ep_t0 = _pc()
        part_losses, val_losses = [], []
        vn = 0
        grad_src = last_train = None
        for pi, ((kind, _, idx, ci_k), staged) in enumerate(
            zip(tasks, _staged(tasks))
        ):
            xcs, tcs, sfcs, wcs = staged
            d_t0 = _pc() if tl is not None else None
            if kind == "full":
                params, state, opt_state, s = chunk_fn(
                    params, state, opt_state, xcs, tcs, sfcs, lr_arr,
                    jax.random.fold_in(epoch_rng, ci_k),
                )
                part_losses.append(s)
                last_train = (xcs, sfcs, tcs, None)
            elif kind == "rem":
                params, state, opt_state, s = rem_fn(
                    params, state, opt_state, xcs, tcs, sfcs, lr_arr,
                    # scan step keys are fold_in(crng, step) — tag the
                    # remainder with a constant no step index can reach
                    jax.random.fold_in(
                        jax.random.fold_in(epoch_rng, ci_k), 2**31 - 1
                    ),
                )
                part_losses.append(s)
                last_train = (xcs, sfcs, tcs, None)
            else:
                if grad_src is None:
                    grad_src = (xcs, sfcs, tcs, wcs)
                if wcs is None:
                    val_losses.append(
                        eval_chunk(params, state, xcs, sfcs, tcs))
                else:
                    val_losses.append(
                        eval_chunk_w(params, state, xcs, sfcs, tcs, wcs))
                vn += len(idx)
            if tl is not None:
                tl.rec(pi, kind, "dispatch", d_t0, _pc())

        f_t0 = _pc() if tl is not None else None
        fetched = np.asarray(jnp.stack(part_losses + val_losses))
        if tl is not None:
            now = _pc()
            tl.rec(-1, "", "fetch", f_t0, now)
            tl.rec(-1, "", "epoch", ep_t0, now)
            tl.flush()
        total = float(fetched[: len(part_losses)].sum())
        vtot = float(fetched[len(part_losses):].sum())

        train_loss = total / max(n_train, 1)
        hist.append("loss", train_loss)
        hist.append("lr", cbs.lr)

        if tb is not None and not has_val:
            grad_src = last_train  # last staged train part
        if has_val:
            val_loss = vtot / max(vn, 1)
            hist.append("val_loss", val_loss)
            monitor = val_loss
        else:
            monitor = train_loss

        if verbose:
            msg = f"Epoch {epoch + 1}/{epochs} - loss: {train_loss:.4f}"
            if has_val:
                msg += f" - val_loss: {monitor:.4f}"
            print(msg + f" - lr: {cbs.lr:.2e} [streaming]")

        if tb is not None:
            grads = (grad_fn(params, state, *grad_src)
                     if grad_src is not None else None)
            tb.epoch(
                epoch,
                {"loss": train_loss, "lr": cbs.lr,
                 "val_loss": val_loss if has_val else None},
                params,
                grads,
            )

        stop = cbs.end_epoch(epoch, monitor, params, state)

        if ckpt is not None and checkpoint_every and (
            (epoch + 1) % checkpoint_every == 0 or stop or epoch == epochs - 1
        ):
            ckpt.save(epoch, params, state, opt_state, lr=cbs.lr, seed=seed,
                      callback_state=cbs.state_dict())

        if stop:
            break

    if prefetch_pool is not None:
        prefetch_pool.shutdown(wait=False)
    network.params, network.state = params, state
    network._predict_jit = None
    return hist
