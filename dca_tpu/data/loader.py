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


def canonicalize_csr(M):
    """Sort/dedup a CSR matrix's indices in place, once (idempotent via the
    ``_dca_canonical`` marker shared with ops/densify.py)."""
    if sp.isspmatrix_csr(M) and not getattr(M, "_dca_canonical", False):
        M.sum_duplicates()
        M.sort_indices()
        try:
            M._dca_canonical = True
        except AttributeError:
            pass
    return M


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


class Flat8Chunk:
    """FLAT8 payload (ops.densify.flat8_payload_from_csr): uint8 column-gap
    deltas + uint8 values with int32/f32 exception side-streams — ~2 bytes
    per nonzero, half the flat format's wire bytes, LOSSLESS for arbitrary
    values (non-uint8 values ride the exception stream).  Columns and row
    ids are rebuilt on device (ops.densify.device_densify_flat8).
    OPT-IN via DCA_TPU_PAYLOAD=flat8: the on-chip A/B measured no ship-time
    win on this platform (the delta decode eats the transfer saving and
    the numpy encode is 8x flat's host cost — see _pick_mode and
    docs/benchmarks.md); kept for links far slower than ~50 MB/s."""

    __slots__ = ("counts", "firstcol", "gaps", "vals", "gpos", "gval",
                 "vpos", "vval", "n_rows", "n_cols")

    def __init__(self, counts, firstcol, gaps, vals, gpos, gval, vpos, vval,
                 n_rows, n_cols):
        self.counts, self.firstcol, self.gaps, self.vals = (
            counts, firstcol, gaps, vals)
        self.gpos, self.gval, self.vpos, self.vval = gpos, gval, vpos, vval
        self.n_rows, self.n_cols = int(n_rows), int(n_cols)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


class FlatChunk:
    """FLAT padded COO payload of a chunk (ops.densify.flat_payload_from_csr),
    densified on device by ops.densify.device_densify_flat.

    Wire format: per-row ``counts`` (B+1 int32 — row ids are rebuilt ON
    DEVICE from them), ``col`` ids (int16 when the panel fits), ``val``
    f32: ~6-8 bytes per nonzero vs SparseChunk's 8 bytes per max-width
    slot — the better encoding on heavy-tailed row-nnz distributions (the
    loader picks per matrix; DCA_TPU_PAYLOAD overrides)."""

    __slots__ = ("counts", "col", "val", "n_rows", "n_cols")

    def __init__(self, counts, col, val, n_rows, n_cols):
        self.counts, self.col, self.val = counts, col, val
        self.n_rows, self.n_cols = int(n_rows), int(n_cols)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


class FlatShardedChunk:
    """Per-device-shard FLAT payloads stacked on a leading shard axis, for
    mesh streaming (ops.densify.make_sharded_flat_densifier): ``counts``
    (S, Bs+1) int32, ``col`` (S, L), ``val`` (S, L) — shard s holds the
    flat encoding of rows [s*Bs, (s+1)*Bs), matching the dense chunk's
    ``P('data', None)`` row partition, with one common padded slot count L
    so the stack is rectangular.  Same ~6-8 bytes/nonzero on the wire as
    FlatChunk (plus slack where shards are lighter than the heaviest)."""

    __slots__ = ("counts", "col", "val", "n_rows", "n_cols", "n_shards")

    def __init__(self, counts, col, val, n_rows, n_cols, n_shards):
        self.counts, self.col, self.val = counts, col, val
        self.n_rows, self.n_cols = int(n_rows), int(n_cols)
        self.n_shards = int(n_shards)

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)


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
        payload_mode: str = "auto",
        derive_input: bool = False,
    ):
        assert X.shape[0] == target.shape[0] == len(size_factors)
        self.X = X
        self.target = target
        self.sf = np.asarray(size_factors, np.float32)
        self.n = X.shape[0]
        self.chunk_cells = int(chunk_cells)
        self.scale_mean = scale_mean
        self.scale_std = scale_std
        # device-densify mode: CSR components ship as payloads scattered
        # dense on-device.  Two encodings (ops/densify.py):
        #   padded (SparseChunk): (B, K) slabs, K = matrix max nnz/row,
        #     8 B/slot — best when rows are balanced;
        #   flat (FlatChunk): (row, col, val) COO, 12 B/nonzero — best when
        #     the row-nnz tail makes K >> mean (real scRNA depth tails).
        # 'auto' picks by measured payload bytes; DCA_TPU_PAYLOAD or the
        # payload_mode arg overrides (the mesh path forces 'padded': its
        # staging row-shards (B, K) slabs cleanly, train/loop.py).
        # Input z-scaling is deferred to the on-device scatter epilogue.
        self.device_densify = bool(device_densify)
        import os

        # an explicit payload_mode (e.g. the mesh path's forced 'padded')
        # wins over the env knob; the env only steers 'auto'
        mode = (payload_mode if payload_mode not in (None, "auto")
                else os.environ.get("DCA_TPU_PAYLOAD", "auto"))
        self._K_x = self._payload_width(X) if device_densify else None
        self._K_t = self._payload_width(target) if device_densify else None
        self._mode_x = self._pick_mode(X, self._K_x, mode)
        self._mode_t = self._pick_mode(target, self._K_t, mode)
        # input and target usually share the sparsity PATTERN (normalize
        # only rescales values: size factors, log1p, lazy z-scale — the
        # nonzero structure of raw counts survives).  When they do, the
        # index stream of each chunk is built and SHIPPED once; the target
        # payload reuses the input's row/col arrays by identity and the
        # staging layer transfers them a single time (train/loop.py).
        self._shared_pattern = bool(
            device_densify and self._pattern_shared(X, target)
        )
        # derive_input (trainer-verified): the normalized input is an
        # elementwise per-row function of the raw TARGET, so only the
        # target payload is built and shipped; the trainer reconstructs
        # the input on device (train/loop.py _derivable_row_scale)
        self.derive_input = bool(derive_input and device_densify)
        # lossless uint16 value stream for integer count matrices
        self._int_vals = {}

    @staticmethod
    def _pattern_shared(A, B):
        if A is B:
            return True
        if not (sp.isspmatrix_csr(A) and sp.isspmatrix_csr(B)):
            return False
        if A.shape != B.shape or A.nnz != B.nnz:
            return False
        # normalize's `diags @ X` leaves within-row index order unspecified
        # — canonicalize before comparing (payload builders require it too)
        canonicalize_csr(A)
        canonicalize_csr(B)
        return np.array_equal(A.indptr, B.indptr) and np.array_equal(
            A.indices, B.indices
        )

    @staticmethod
    def _payload_width(M):
        if not sp.isspmatrix_csr(M):
            return None
        nnz = np.diff(M.indptr)
        return max(int(nnz.max()) if nnz.size else 0, 1)

    def _pick_mode(self, M, K, mode):
        if K is None:
            return None  # dense host tier
        if mode in ("padded", "flat", "flat8"):
            return mode
        mean_nnz = max(M.nnz / max(M.shape[0], 1), 1.0)
        # bytes/row: padded 8*K vs flat 12*mean*1.15 (bucket margin)
        # flat8 (half the wire bytes) stays OPT-IN (DCA_TPU_PAYLOAD=flat8):
        # the round-4 on-chip A/B measured ship(flat8, 101 MB) ==
        # ship(flat, 202 MB) — the saved transfer is eaten by the on-device
        # delta decode — while the numpy gap/exception encode costs 7.6 s
        # vs flat's 0.9 s per 131k-row part (docs/benchmarks.md).  It may
        # pay on links far slower than the ~50-70 MB/s tunnel once the
        # encoder moves to the C++ tier.
        return "flat" if 8.0 * K > 12.0 * mean_nnz * 1.15 else "padded"

    def _val_exc_rate(self, M):
        """Fraction of values a flat8 payload must carry as exceptions
        (outside integer [0, 255]) — one cached O(nnz) pass per matrix."""
        if not hasattr(self, "_vexc_rates"):
            self._vexc_rates = {}
        if id(M) not in self._vexc_rates:
            d = M.data
            if d.size == 0:
                self._vexc_rates[id(M)] = 0.0
            else:
                bad = (d < 0) | (d > 255) | (d != np.floor(d))
                self._vexc_rates[id(M)] = float(np.count_nonzero(bad)) / d.size
        return self._vexc_rates[id(M)]

    def _gap_exc_rate(self, M):
        """Fraction of within-row column gaps > 255 — cached per matrix."""
        if not hasattr(self, "_gexc_rates"):
            self._gexc_rates = {}
        if id(M) not in self._gexc_rates:
            canonicalize_csr(M)
            ind = M.indices
            if ind.size < 2:
                self._gexc_rates[id(M)] = 0.0
            else:
                d = ind[1:].astype(np.int64) - ind[:-1]
                is_start = np.zeros(ind.size - 1, bool)
                bnd = M.indptr[1:-1] - 1  # gap positions that cross rows
                is_start[bnd[(bnd >= 0) & (bnd < ind.size - 1)]] = True
                self._gexc_rates[id(M)] = float(
                    np.count_nonzero((d > 255) & ~is_start)) / ind.size
        return self._gexc_rates[id(M)]

    def _flat_bucket(self, M, idx):
        """Padded slot count for a part of ``len(idx)`` rows — DETERMINISTIC
        in the part size via ops.densify.flat_slots_for, so every epoch's
        permutation reuses the scatter compiled for its part size (a
        data-dependent L caused per-epoch recompiles — measured 1347 s vs
        326 s steady flat epochs at the 1.3M corpus before this fix)."""
        from ..ops.densify import flat_slots_for

        moments, nnz = self._nnz_cache(M)
        return flat_slots_for(M, idx, moments, nnz=nnz)

    def _integral_vals(self, M):
        """True when M's values are exact uint16 integers (raw counts) —
        checked once per matrix, enables the lossless half-width value
        stream."""
        if id(M) not in self._int_vals:
            d = M.data
            self._int_vals[id(M)] = bool(
                d.size == 0
                or (
                    d.min() >= 0
                    and d.max() < np.iinfo(np.uint16).max
                    and np.all(d == np.floor(d))
                )
            )
        return self._int_vals[id(M)]

    def _exc_bucket(self, M, L, kind):
        """Deterministic exception-bucket size for a part with ``L`` flat
        slots — a function of the part SIZE and the matrix's exception
        rate (cached), laddered x1.25 on overflow and remembered per
        (matrix, L) so repeated same-size parts reuse one compiled
        scatter."""
        if not hasattr(self, "_exc_buckets"):
            self._exc_buckets = {}
        key = (id(M), L, kind)
        if key not in self._exc_buckets:
            rate = (self._gap_exc_rate(M) if kind == "g"
                    else self._val_exc_rate(M))
            self._exc_buckets[key] = int(
                2.0 * L * rate + 8.0 * np.sqrt(L * rate)) + 64
        return self._exc_buckets[key]

    def _nnz_cache(self, M):
        """(moments, nnz vector) for M, computed once (see _flat_bucket)."""
        if not hasattr(self, "_nnz_moments"):
            self._nnz_moments = {}
            self._nnz_vec = {}
        if id(M) not in self._nnz_moments:
            nnz = np.diff(M.indptr)
            self._nnz_vec[id(M)] = nnz
            self._nnz_moments[id(M)] = (float(nnz.mean()), float(nnz.std()))
        return self._nnz_moments[id(M)], self._nnz_vec[id(M)]

    def _flat_sharded_component(self, M, idx, shards):
        """Per-shard flat payloads with ONE common slot bucket L: the
        deterministic shard-size bucket (flat_slots_for) laddered on the
        heaviest shard, so same-size parts reuse one compiled sharded
        scatter and every shard stacks rectangular."""
        from ..ops.densify import flat_payload_from_csr, flat_slots_for

        moments, nnz = self._nnz_cache(M)
        idx = np.asarray(idx, np.int64)
        S = int(shards)
        Bs = len(idx) // S
        totals = nnz[idx].reshape(S, Bs).sum(axis=1)
        heavy = int(np.argmax(totals))
        L = flat_slots_for(M, idx[heavy * Bs:(heavy + 1) * Bs], moments,
                           nnz=nnz)
        int_vals = self._integral_vals(M)
        counts = np.empty((S, Bs + 1), np.int32)
        cols = vals = None
        for s in range(S):
            c_s, col_s, v_s = flat_payload_from_csr(
                M, idx[s * Bs:(s + 1) * Bs], L, int_vals=int_vals
            )
            if cols is None:
                cols = np.empty((S, L), col_s.dtype)
                vals = np.empty((S, L), v_s.dtype)
            counts[s] = c_s
            cols[s] = col_s
            vals[s] = v_s
        return FlatShardedChunk(counts, cols, vals, len(idx), M.shape[1], S)

    def _component(self, M, idx, K, is_input, mesh_shards=None):
        mode = self._mode_x if is_input else self._mode_t
        if mesh_shards is not None and mode in ("flat", "flat8"):
            if mode == "flat" and len(idx) >= mesh_shards and (
                len(idx) % mesh_shards == 0
            ):
                return self._flat_sharded_component(M, idx, mesh_shards)
            # odd part sizes (and flat8, which stays single-device) fall
            # back to padded slabs — they row-shard/replicate cleanly in
            # the mesh staging layer (train/loop.py _mesh_densify)
            mode = "padded"
        if mode == "flat8":
            from ..ops.densify import Flat8Overflow, flat8_payload_from_csr

            L = self._flat_bucket(M, idx)
            while True:
                Lg = self._exc_bucket(M, L, "g")
                Lv = self._exc_bucket(M, L, "v")
                try:
                    payload = flat8_payload_from_csr(M, idx, L, Lg, Lv)
                    break
                except Flat8Overflow as e:
                    # ladder the overflowing bucket(s) and remember
                    if e.need_g > Lg:
                        self._exc_buckets[(id(M), L, "g")] = int(
                            max(Lg, e.need_g) * 1.25) + 64
                    if e.need_v > Lv:
                        self._exc_buckets[(id(M), L, "v")] = int(
                            max(Lv, e.need_v) * 1.25) + 64
            return Flat8Chunk(*payload, len(idx), M.shape[1])
        if mode == "flat":
            from ..ops.densify import flat_payload_from_csr

            L = self._flat_bucket(M, idx)
            counts, c, v = flat_payload_from_csr(
                M, idx, L, int_vals=self._integral_vals(M)
            )
            return FlatChunk(counts, c, v, len(idx), M.shape[1])
        if mode == "padded":
            from ..ops.densify import payload_from_csr

            pi, pd = payload_from_csr(M, idx, K,
                                      int_vals=self._integral_vals(M))
            return SparseChunk(pi, pd, M.shape[1])
        x = _gather_dense(M, idx)
        if is_input and self.scale_mean is not None:
            x = (x - self.scale_mean) / self.scale_std
        return x

    def materialize(self, idx, mesh_shards=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``mesh_shards``: set by the mesh staging layer (= |data axis|) —
        flat components come back as FlatShardedChunk (per-shard stacks)
        when the part divides the axis, padded slabs otherwise."""
        if self.derive_input:
            # ship ONE payload: the trainer derives the input from the
            # densified target on device (x is t by IDENTITY — the staging
            # layer keys on that)
            t = self._component(self.target, idx, self._K_t, False,
                                mesh_shards=mesh_shards)
            return t, t, self.sf[idx]
        x = self._component(self.X, idx, self._K_x, True,
                            mesh_shards=mesh_shards)
        t = self._component(self.target, idx, self._K_t, False,
                            mesh_shards=mesh_shards)
        if self._shared_pattern:
            # equal by construction — alias by IDENTITY so the staging
            # layer ships the index stream once per chunk
            if (isinstance(x, (FlatChunk, FlatShardedChunk))
                    and type(t) is type(x)
                    and x.col.shape == t.col.shape
                    and x.col.dtype == t.col.dtype):
                t.counts, t.col = x.counts, x.col
            elif isinstance(x, Flat8Chunk) and isinstance(t, Flat8Chunk) and (
                x.gaps.shape == t.gaps.shape
                and x.gpos.shape == t.gpos.shape
            ):
                t.counts, t.firstcol, t.gaps = x.counts, x.firstcol, x.gaps
                t.gpos, t.gval = x.gpos, x.gval
            elif isinstance(x, SparseChunk) and isinstance(t, SparseChunk) and (
                x.idx.shape == t.idx.shape
            ):
                t.idx = x.idx
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
