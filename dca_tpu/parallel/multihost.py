"""Multi-host process-group setup and per-host data sharding.

The reference is strictly single-process (SURVEY.md §2.10); this module is
the rebuild's multi-host story.  Usage on a pod slice:

    from dca_tpu.parallel import multihost
    multihost.initialize()                    # jax.distributed over DCN
    mesh = make_mesh(jax.devices(), model=M)  # GLOBAL devices
    arrs = multihost.host_local_to_global(mesh, P('data', None), local_rows)

Each host reads only its own row shard of the (backed/sparse) count matrix;
``host_local_to_global`` assembles the logical global array without any
host-to-host copies (jax.make_array_from_process_local_data).  Gradient and
loss reductions ride ICI via GSPMD-inserted collectives; nothing here sends
data over DCN except the initial process handshake.

Prediction outputs: each host computes its local shard; ``gather_to_host``
pulls a fully-replicated copy for the rank-0 TSV writers, or use
``write_sharded`` to emit per-host files and concatenate.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process or already initialized."""
    if jax.process_count() > 1:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("DCA_TPU_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return  # single-process mode
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_row_range(n_rows: int) -> tuple[int, int]:
    """[start, stop) of the cell rows this process is responsible for
    (contiguous block partitioning over processes)."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_rows // np_)
    start = min(p * per, n_rows)
    stop = min(start + per, n_rows)
    return start, stop


def host_local_to_global(mesh: Mesh, spec: P, local_data: np.ndarray):
    """Assemble a global sharded array from this process's local rows."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_data, sharding)
    return jax.make_array_from_process_local_data(sharding, local_data)


def gather_to_host(arr) -> np.ndarray:
    """Fully-replicated numpy copy of a (possibly sharded) global array —
    for the rank-0 TSV writers (all_gather over ICI happens in XLA)."""
    out = jax.jit(lambda x: x, out_shardings=NamedSharding(
        arr.sharding.mesh, P()
    ))(arr) if hasattr(arr.sharding, "mesh") else arr
    return np.asarray(out)


def is_primary() -> bool:
    return jax.process_index() == 0


def write_sharded(local_rows: np.ndarray, path: str, rownames=None,
                  colnames=None, transpose: bool = False) -> str:
    """Emit this process's row shard as ``<path>.part<rank>`` (same %.6f TSV
    format as the global writers); rank 0 can later ``concat_shards``.

    Avoids gathering a full (cells, genes) matrix on one host for very large
    predictions — each host writes what it computed.  Pass
    ``has_header=colnames is not None`` to ``concat_shards`` so it knows
    whether each part leads with a column-name line."""
    from ..data.io import write_text_matrix

    part = f"{path}.part{jax.process_index()}"
    write_text_matrix(np.asarray(local_rows), part, rownames=rownames,
                      colnames=colnames, transpose=transpose)
    return part


def concat_shards(path: str, n_parts: Optional[int] = None,
                  has_header: bool = True) -> str:
    """Concatenate ``<path>.part*`` row shards (written by ``write_sharded``
    with transpose=False) into ``<path>``.

    ``has_header`` must mirror whether ``write_sharded`` was called with
    colnames: write_text_matrix only emits a header line when colnames is
    set, so skipping the first line of headerless parts would silently drop
    one data row per part."""
    n_parts = n_parts if n_parts is not None else jax.process_count()
    with open(path, "wt") as out:
        for p in range(n_parts):
            part = f"{path}.part{p}"
            with open(part, "rt") as f:
                if has_header:
                    header = f.readline()
                    if p == 0:
                        out.write(header)
                for line in f:
                    out.write(line)
            os.remove(part)
    return path
