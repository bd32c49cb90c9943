"""Device mesh + sharding layout for distributed training.

The reference has no parallelism beyond TF thread knobs (train.py:41-48);
this module is the rebuild's first-class distributed story (SURVEY.md §2.10):

  * mesh axes ``('data', 'model')`` — cells are embarrassingly parallel over
    ``data``; the gene dimension G (the only large axis: the G×H input kernel
    and the three H×G head kernels) shards over ``model``;
  * with GSPMD/jit auto-partitioning the per-step collectives are exactly the
    cheap ones: one psum after the gene-sharded input matmul and a scalar
    psum for the loss — the ZINB NLL is elementwise in G so head shards never
    materialize the full (B, G) on one device;
  * BatchNorm batch statistics over the global (data-sharded) batch are
    XLA-inserted psums, keeping reference semantics at any device count.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
pass the global device list; arrays are built per-host via
``jax.make_array_from_process_local_data`` in the input pipeline.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data: int = -1, model: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 absorbs remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def resolve_mesh(devices, model_parallel: int = 1):
    """Normalize the user-facing ``devices`` argument of train()/dca()/CLI
    into a ('data','model') Mesh.

    devices: None -> no mesh (single-device path); 'all'/True -> every
    visible device; int N -> the first N devices; or an explicit device
    list.  model_parallel M splits the gene dimension over a model axis of
    size M (the remaining devices form the data axis)."""
    # falsy spellings (None/False/0) all mean "no mesh" — an empty mesh
    # would only crash later inside device_put with an opaque error
    if devices is None or devices is False or (
        isinstance(devices, int) and not isinstance(devices, bool) and devices == 0
    ):
        # CLI contract: --modelparallel requires --devices; never silently
        # commandeer every visible device
        assert model_parallel <= 1, (
            "model_parallel > 1 requires devices= ('all', an int, or a list)"
        )
        return None
    if devices is True or devices == "all":
        devices = jax.devices()
    elif isinstance(devices, int):
        avail = jax.devices()
        assert devices <= len(avail), (
            f"requested {devices} devices, only {len(avail)} visible"
        )
        devices = avail[:devices]
    devices = list(devices)
    assert devices, "resolve_mesh: empty device list"
    return make_mesh(devices, model=max(int(model_parallel), 1))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Cells sharded over 'data', features replicated."""
    return NamedSharding(mesh, P("data", None))


def batch_vector_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _gene_spec(path_keys, leaf, definition, model_size: int):
    """PartitionSpec for one parameter leaf: shard the gene dimension over
    'model' where it exists and divides evenly; replicate otherwise."""
    G_in = definition.input_size
    G_out = definition.output_size

    def divisible(d):
        return d % model_size == 0 and model_size > 1

    shape = leaf.shape
    # trunk input kernel: (G_in, H) -> row-shard over genes
    if "trunk" in path_keys and path_keys[-1] == "kernel" and len(shape) == 2:
        if shape[0] == G_in and divisible(shape[0]):
            return P("model", None)
        return P()
    # head kernels: (H, G_out) -> column-shard over genes
    if "heads" in path_keys and path_keys[-1] == "kernel" and len(shape) == 2:
        if shape[1] == G_out and divisible(shape[1]):
            return P(None, "model")
        return P()
    # head biases / elementwise kernels: (G_out,)
    if "heads" in path_keys and len(shape) == 1:
        if shape[0] == G_out and divisible(shape[0]):
            return P("model")
        return P()
    # constant dispersion theta: (1, G_out)
    if "heads" in path_keys and path_keys[-1] == "theta":
        if shape[1] == G_out and divisible(shape[1]):
            return P(None, "model")
        return P()
    return P()


def _path_keys(path):
    keys = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "idx", None)
        keys.append(str(k))
    return keys


def param_sharding(params, definition, mesh: Mesh):
    """NamedSharding pytree for a parameter/optimizer-state pytree: gene-dim
    tensors sharded over 'model', everything else replicated."""
    model_size = mesh.shape["model"]

    def spec(path, leaf):
        return NamedSharding(mesh, _gene_spec(_path_keys(path), leaf, definition, model_size))

    return jax.tree_util.tree_map_with_path(spec, params)
