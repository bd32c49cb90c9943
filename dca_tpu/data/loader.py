"""Sharded/streaming input pipeline for datasets larger than device memory.

The reference feeds the whole dense matrix to Keras fit (train.py:83-91) and
scanpy's ``scale`` densifies on the host (io.py:108-109) — at the paper's
1.3M-cell scale neither fits.  This pipeline keeps the count matrix SPARSE
(CSR) on the host and materializes only one shuffled chunk of cells at a
time:

  * ``lazy_scale_stats`` computes per-gene mean/std in one sparse pass, so
    z-scaling (sc.pp.scale semantics, ddof=1) is applied chunk-wise at
    batch-assembly time instead of densifying everything up front;
  * ``StreamingData.epoch_chunks`` yields fixed-size (chunk_cells, G) dense
    f32 blocks following a global permutation — fixed shapes mean at most
    three compiled programs (full chunk / final partial chunk / remainder
    batch) regardless of dataset size;
  * chunks go to device once and an on-device ``lax.scan`` runs all their
    minibatch steps (loop.py), so host->HBM traffic is one pass per epoch.

Multi-host: each process constructs a StreamingData over its own row shard
and builds global arrays with jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np
import scipy.sparse as sp


def lazy_scale_stats(X) -> Tuple[np.ndarray, np.ndarray]:
    """Per-gene (mean, std) with sc.pp.scale semantics (ddof=1, std 0 -> 1)
    computed without densifying a sparse X."""
    n = X.shape[0]
    if sp.issparse(X):
        mean = np.asarray(X.mean(axis=0)).ravel()
        sq = np.asarray(X.multiply(X).mean(axis=0)).ravel()
        var = (sq - mean**2) * (n / max(n - 1, 1))
    else:
        X = np.asarray(X)
        mean = X.mean(axis=0)
        var = X.var(axis=0, ddof=1) if n > 1 else np.zeros(X.shape[1])
    std = np.sqrt(np.maximum(var, 0.0))
    std[std == 0] = 1.0
    return mean.astype(np.float32), std.astype(np.float32)


class SparseChunk:
    """Padded CSR payload of a chunk, densified ON DEVICE (ops/densify.py).

    Carries (B, K) column-id/value slabs; behaves enough like an array for
    the chunk loop (``.shape``, row slicing) and is turned dense by the
    training loop's staging function after transfer.
    """

    __slots__ = ("idx", "dat", "n_cols")

    def __init__(self, idx, dat, n_cols):
        self.idx, self.dat, self.n_cols = idx, dat, int(n_cols)

    @property
    def shape(self):
        return (self.idx.shape[0], self.n_cols)

    def __getitem__(self, sl):
        return SparseChunk(self.idx[sl], self.dat[sl], self.n_cols)


def _gather_dense(X, idx) -> np.ndarray:
    from .. import native

    if sp.issparse(X) and sp.isspmatrix_csr(X) and native.available():
        return native.densify_rows(X.indptr, X.indices, X.data, idx, X.shape[1])
    if (
        isinstance(X, np.ndarray)
        and X.dtype == np.float32
        and X.flags.c_contiguous
        and native.available()
    ):
        return native.gather_rows(X, idx)
    rows = X[idx]
    if sp.issparse(rows):
        rows = np.asarray(rows.todense())
    return np.asarray(rows, dtype=np.float32)


class StreamingData:
    """Host-side shuffled chunk iterator over (input, target, size_factors).

    ``scale_mean``/``scale_std`` (from lazy_scale_stats) are applied to the
    INPUT chunk only — the target stays raw counts, as the loss requires.
    """

    def __init__(
        self,
        X,
        target,
        size_factors,
        chunk_cells: int,
        scale_mean: Optional[np.ndarray] = None,
        scale_std: Optional[np.ndarray] = None,
        device_densify: bool = False,
    ):
        assert X.shape[0] == target.shape[0] == len(size_factors)
        self.X = X
        self.target = target
        self.sf = np.asarray(size_factors, np.float32)
        self.n = X.shape[0]
        self.chunk_cells = int(chunk_cells)
        self.scale_mean = scale_mean
        self.scale_std = scale_std
        # device-densify mode: CSR components are shipped as padded payloads
        # (SparseChunk) and scattered dense on-device; the slot width K is
        # fixed matrix-wide so every chunk reuses one compiled scatter.
        # Input z-scaling is then deferred to the on-device epilogue — the
        # staging fn in train/loop.py applies scale_mean/std to SparseChunk x.
        self.device_densify = bool(device_densify)
        self._K_x = self._payload_width(X) if device_densify else None
        self._K_t = self._payload_width(target) if device_densify else None

    @staticmethod
    def _payload_width(M):
        if not sp.isspmatrix_csr(M):
            return None
        nnz = np.diff(M.indptr)
        return max(int(nnz.max()) if nnz.size else 0, 1)

    def _component(self, M, idx, K, is_input):
        if K is not None:
            from ..ops.densify import payload_from_csr

            pi, pd = payload_from_csr(M, idx, K)
            return SparseChunk(pi, pd, M.shape[1])
        x = _gather_dense(M, idx)
        if is_input and self.scale_mean is not None:
            x = (x - self.scale_mean) / self.scale_std
        return x

    def materialize(self, idx) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        x = self._component(self.X, idx, self._K_x, True)
        t = self._component(self.target, idx, self._K_t, False)
        return x, t, self.sf[idx]

    def index_chunks(self, perm: np.ndarray) -> Iterator[np.ndarray]:
        """Yield fixed-size index slices of ``perm`` (last may be short).

        Callers materialize each part themselves (possibly only their local
        row block in multi-process runs, train/loop.py)."""
        c = self.chunk_cells
        for start in range(0, len(perm), c):
            yield perm[start : start + c]

    def epoch_chunks(self, perm: np.ndarray) -> Iterator[Tuple[np.ndarray, ...]]:
        """Yield (x, t, sf, is_full) materialized chunks following ``perm``."""
        c = self.chunk_cells
        for idx in self.index_chunks(perm):
            x, t, sfc = self.materialize(idx)
            yield x, t, sfc, len(idx) == c

    @property
    def n_full_chunks(self):
        return self.n // self.chunk_cells
