"""On-chip sparse->dense densification kernel (Pallas TPU).

TPU-native replacement for the reference's host-side scipy CSR slicing +
`.toarray()` batch extraction (/root/reference/dca/io.py:67-68,
train.py:83): instead of densifying on the host and shipping a dense
(B, G) f32 block over PCIe/DCN, ship the CSR payload — row-padded
``(indices, data)`` at O(nnz) bytes — and scatter it into dense tiles in
VMEM on the chip.  For typical scRNA-seq sparsity (~90% zeros) that cuts
host->device bytes ~5x; the scatter itself runs at VPU speed.

Kernel design (no scatter primitive on the TPU vector unit):
  * rows are padded to a fixed K = max nnz/row; padded entries carry the
    out-of-range column id ``n_cols`` so they never match;
  * grid = (row tiles, column tiles); each step builds its (BM, BN) output
    tile as  sum_k data[:, k] * (indices[:, k] == column_iota);
  * CSR column indices are sorted per row, so for each (row-block, column
    tile) only a contiguous k-range can hit the tile.  Those [lo, hi)
    bounds are precomputed on the host and prefetched to SMEM; the kernel's
    fori_loop runs only that subrange, making total work O(B * (nnz + #tiles))
    instead of O(B * K * #tiles).

The host-side batch path stays the default (the native C++ densifier in
dca_tpu/native handles it at memory bandwidth); this kernel is the on-device
alternative for transfer-bound pipelines.  Equivalence tests vs scipy:
tests/test_pallas.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _kernel(bounds_ref, idx_ref, dat_ref, o_ref, *, BM, BN, col_tile):
    i = pl.program_id(0)
    j = pl.program_id(1)
    lo = bounds_ref[i, j, 0]
    hi = bounds_ref[i, j, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (BM, BN), 1) + j * col_tile

    def body(k, acc):
        idx_k = idx_ref[:, pl.ds(k, 1)]  # (BM, 1)
        dat_k = dat_ref[:, pl.ds(k, 1)]
        return acc + jnp.where(idx_k == cols, dat_k, 0.0)

    o_ref[:] = jax.lax.fori_loop(lo, hi, body, jnp.zeros((BM, BN), jnp.float32))


def _pick_tiles(B, K, n_cols):
    BN = min(_round_up(n_cols, 128), 512)
    # keep the (BM, K) idx+data blocks under ~4 MB of VMEM
    budget_rows = max(8, (4 << 20) // max(K * 8, 1))
    BM = min(_round_up(B, 8), 256, _round_up(min(budget_rows, 256), 8))
    return BM, BN


def densify_padded(indices, data, n_cols, *, interpret=False):
    """Densify row-padded sparse batches on-chip.

    indices: (B, K) int32, column ids sorted ascending per row, padded with
    ``n_cols`` (any value >= n_cols works); data: (B, K) f32, padded with 0.
    Returns the dense (B, n_cols) f32 array.
    """
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    B, K = indices.shape
    assert data.shape == (B, K)
    BM, BN = _pick_tiles(B, K, n_cols)
    Bp = _round_up(B, BM)
    Gp = _round_up(n_cols, BN)
    gi, gj = Bp // BM, Gp // BN

    idx_p = np.full((Bp, K), n_cols, np.int32)
    idx_p[:B] = indices
    dat_p = np.zeros((Bp, K), np.float32)
    dat_p[:B] = data

    # per (row-block, column-tile) contiguous k-bounds from the sorted rows:
    # lo_r(j) = #{k : idx[r,k] < j*BN};   block bound = min/max over its rows
    edges = np.arange(gj + 1, dtype=np.int64) * BN
    counts = np.empty((Bp, gj + 1), np.int64)
    for r in range(Bp):  # C-speed searchsorted per row; ~us each
        counts[r] = np.searchsorted(idx_p[r], edges, side="left")
    lo = counts[:, :-1].reshape(gi, BM, gj).min(axis=1)
    hi = counts[:, 1:].reshape(gi, BM, gj).max(axis=1)
    bounds = np.stack([lo, hi], axis=-1).astype(np.int32)  # (gi, gj, 2)

    out = _densify_call(
        jnp.asarray(bounds), jnp.asarray(idx_p), jnp.asarray(dat_p),
        BM=BM, BN=BN, gi=gi, gj=gj, K=K, interpret=interpret,
    )
    return out[:B, :n_cols]


@functools.partial(jax.jit, static_argnames=("BM", "BN", "gi", "gj", "K", "interpret"))
def _densify_call(bounds, idx_p, dat_p, *, BM, BN, gi, gj, K, interpret):
    return pl.pallas_call(
        functools.partial(_kernel, BM=BM, BN=BN, col_tile=BN),
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # bounds
            pl.BlockSpec((BM, K), lambda i, j: (i, 0)),          # indices
            pl.BlockSpec((BM, K), lambda i, j: (i, 0)),          # data
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((gi * BM, gj * BN), jnp.float32),
        interpret=interpret,
    )(bounds, idx_p, dat_p)


def densify_csr(indptr, indices, data, n_cols, *, interpret=False):
    """Densify a scipy-style CSR triplet on-chip; returns (B, n_cols) f32."""
    indptr = np.asarray(indptr, np.int64)
    B = len(indptr) - 1
    nnz = np.diff(indptr)
    K = max(int(nnz.max()) if B else 0, 1)
    idx = np.full((B, K), n_cols, np.int32)
    dat = np.zeros((B, K), np.float32)
    for r in range(B):
        s, e = indptr[r], indptr[r + 1]
        idx[r, : e - s] = indices[s:e]
        dat[r, : e - s] = data[s:e]
    return densify_padded(idx, dat, n_cols, interpret=interpret)
