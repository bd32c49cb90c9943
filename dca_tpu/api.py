"""Scanpy-compatible single-function API.

Parity re-implementation of ``dca()`` (``/root/reference/dca/api.py:19-211``):
same signature, defaults (``ae_type='nb-conddisp'``, epochs=300, batch 32,
RMSprop, reduce_lr=10, early_stop=15), side-effect contract
(``adata.X`` overwritten in denoise mode, ``obsm['X_dca']`` in latent mode,
``obsm['X_dca_dropout']``/``obsm['X_dca_dispersion']``/``var['X_dca_dispersion']``
with ``return_info``, loss history in ``uns['dca_loss_history']``) and return
matrix (copy × return_model).
"""

from __future__ import annotations

import os
import random

import numpy as np

from .data.adata import AnnData, is_anndata_like
from .data.io import read_dataset, normalize, _col_sums
from .models import AE_types
from .train.loop import train


def dca(
    adata,
    mode="denoise",
    ae_type="nb-conddisp",
    normalize_per_cell=True,
    scale=True,
    log1p=True,
    hidden_size=(64, 32, 64),  # network args
    hidden_dropout=0.0,
    batchnorm=True,
    activation="relu",
    init="glorot_uniform",
    network_kwds={},
    epochs=300,  # training args
    reduce_lr=10,
    early_stop=15,
    batch_size=32,
    optimizer="RMSprop",
    learning_rate=None,
    random_state=0,
    threads=None,
    verbose=False,
    training_kwds={},
    return_model=False,
    return_info=False,
    copy=False,
    check_counts=True,
    devices=None,
    model_parallel=1,
):
    """Deep count autoencoder — TPU-native. See reference api.py:46-144 for
    the full parameter/return documentation; the contract is identical.

    ``devices``/``model_parallel`` are rebuild extensions: train over a
    ('data','model') jax device mesh — ``devices='all'``, an int, or an
    explicit device list; ``model_parallel=M`` additionally shards the gene
    dimension over M devices.  Loss trajectories match single-device
    training up to float reduction order (tests/test_parallel.py)."""
    assert is_anndata_like(adata), "adata must be an AnnData instance"
    assert mode in ("denoise", "latent"), "%s is not a valid mode." % mode

    # seeds (api.py:149-153)
    random.seed(random_state)
    np.random.seed(random_state)
    os.environ["PYTHONHASHSEED"] = "0"

    adata = read_dataset(
        adata, transpose=False, test_split=False, copy=copy, check_counts=check_counts
    )

    # check for zero genes (api.py:162-164)
    nonzero_genes = _col_sums(adata.X) >= 1
    assert nonzero_genes.all(), "Please remove all-zero genes before using DCA."

    from .data.io import auto_lazy_scale

    adata = normalize(
        adata,
        filter_min_counts=False,  # no filtering, keep cell and gene idxs same
        size_factors=normalize_per_cell,
        normalize_input=scale,
        logtrans_input=log1p,
        # large sparse inputs keep X sparse end-to-end: z-scale is deferred
        # to the on-device epilogue of the streaming trainer/predict
        lazy_scale=auto_lazy_scale(adata),
    )

    network_kwds = {
        **network_kwds,
        "hidden_size": hidden_size,
        "hidden_dropout": hidden_dropout,
        "batchnorm": batchnorm,
        "activation": activation,
        "init": init,
    }

    input_size = output_size = adata.n_vars
    net = AE_types[ae_type](
        input_size=input_size, output_size=output_size, seed=random_state, **network_kwds
    )
    net.save()
    net.build()

    training_kwds = {
        "devices": devices,
        "model_parallel": model_parallel,
        **training_kwds,  # may override the mesh args
        "epochs": epochs,
        "reduce_lr": reduce_lr,
        "early_stop": early_stop,
        "batch_size": batch_size,
        "optimizer": optimizer,
        "verbose": verbose,
        "threads": threads,
        "learning_rate": learning_rate,
        "seed": random_state,
    }

    hist = train(adata[adata.obs.dca_split == "train"], net, **training_kwds)
    res = net.predict(adata, mode, return_info, copy)
    adata = res if copy else adata

    if return_info:
        adata.uns["dca_loss_history"] = hist.history  # api.py:205-206

    if return_model:
        return (adata, net) if copy else net
    return adata if copy else None
