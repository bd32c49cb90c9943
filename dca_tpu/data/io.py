"""Dataset ingestion, preprocessing and TSV output.

Parity re-implementation of ``/root/reference/dca/io.py`` without the
scanpy/anndata dependency: ``read_dataset`` (io.py:53-85), ``normalize``
(io.py:88-111), ``read_genelist`` (io.py:113-118), ``write_text_matrix``
(io.py:120-129), ``read_pickle`` (io.py:130-131).

The scanpy preprocessing calls are re-implemented with identical semantics:
  * ``sc.pp.filter_genes/filter_cells(min_counts=1)``  — io.py:90-92
  * ``sc.pp.normalize_per_cell()``: scales every cell to the median total
    count, records pre-normalization totals in ``obs['n_counts']`` and drops
    zero-count cells (scanpy behavior)
  * size factors ``n_counts / median(n_counts)``       — io.py:101
  * ``sc.pp.log1p``                                    — io.py:105-106
  * ``sc.pp.scale``: per-gene z-score with ddof=1, zero-variance genes keep
    std=1, densifies sparse input                      — io.py:108-109
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pandas as pd
import scipy.sparse as sp
from sklearn.model_selection import train_test_split

from .adata import AnnData, is_anndata_like, read_h5ad


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


def read_text(path, first_column_names=True) -> AnnData:
    """Read a delimited text matrix (rows × cols as given in the file).

    Uses the native parallel parser (dca_tpu/native) when available, with a
    pandas fallback producing identical results."""
    sep = "\t"
    p = str(path)
    if p.endswith(".csv") or p.endswith(".csv.gz"):
        sep = ","

    from .. import native

    parsed = native.parse_text_matrix(path, sep=sep, first_column_names=first_column_names)
    if parsed is not None:
        X, rownames, colnames = parsed
        obs = pd.DataFrame(
            index=pd.Index(rownames if rownames is not None else range(X.shape[0])).astype(str)
        )
        var = pd.DataFrame(index=pd.Index(colnames).astype(str))
        return AnnData(X, obs, var)

    df = pd.read_csv(path, sep=sep, index_col=0 if first_column_names else None)
    X = df.to_numpy(dtype=np.float32)
    obs = pd.DataFrame(index=pd.Index(df.index.astype(str)))
    var = pd.DataFrame(index=pd.Index(df.columns.astype(str)))
    return AnnData(X, obs, var)


def read_any(path, first_column_names=True) -> AnnData:
    p = str(path)
    if p.endswith(".h5ad"):
        return read_h5ad(p)
    if p.endswith((".mtx", ".mtx.gz")):
        from scipy.io import mmread

        X = sp.csr_matrix(mmread(p))
        return AnnData(X)
    return read_text(p, first_column_names=first_column_names)


def read_dataset(adata, transpose=False, test_split=False, copy=False, check_counts=True):
    """Reference io.py:53-85."""
    if is_anndata_like(adata):
        if copy:
            adata = adata.copy()
    elif isinstance(adata, (str, os.PathLike)):
        adata = read_any(adata, first_column_names=True)
    else:
        raise NotImplementedError(f"Cannot interpret {type(adata)} as a dataset")

    if check_counts:
        # reference checks integer-ness of the first 10 rows (io.py:63-70)
        X_subset = adata.X[:10]
        norm_error = (
            "Make sure that the dataset (adata.X) contains unnormalized count data."
        )
        if sp.issparse(X_subset):
            assert (X_subset.astype(int) != X_subset).nnz == 0, norm_error
        else:
            assert np.all(X_subset.astype(int) == X_subset), norm_error

    if transpose:
        adata = adata.transpose()

    if test_split:
        train_idx, test_idx = train_test_split(
            np.arange(adata.n_obs), test_size=0.1, random_state=42
        )  # io.py:75
        spl = pd.Series(["train"] * adata.n_obs)
        spl.iloc[test_idx] = "test"
        adata.obs["dca_split"] = spl.values
    else:
        adata.obs["dca_split"] = "train"
    adata.obs["dca_split"] = adata.obs["dca_split"].astype("category")

    print(
        "dca_tpu: Successfully preprocessed {} genes and {} cells.".format(
            adata.n_vars, adata.n_obs
        )
    )
    return adata


# ---------------------------------------------------------------------------
# preprocessing (scanpy-parity primitives)
# ---------------------------------------------------------------------------


def _row_sums(X):
    return np.asarray(X.sum(axis=1)).ravel()


def _col_sums(X):
    return np.asarray(X.sum(axis=0)).ravel()


def filter_genes(adata, min_counts=1):
    """sc.pp.filter_genes(min_counts=...) parity: keep genes with
    total count >= min_counts; record totals in var['n_counts']."""
    counts = _col_sums(adata.X)
    keep = counts >= min_counts
    _subset_inplace(adata, keep, axis=1)
    adata.var["n_counts"] = counts[keep]
    return adata


def filter_cells(adata, min_counts=1):
    counts = _row_sums(adata.X)
    keep = counts >= min_counts
    _subset_inplace(adata, keep, axis=0)
    adata.obs["n_counts"] = counts[keep]
    return adata


def _subset_inplace(adata, keep, axis):
    """Row/col in-place subset keeping EVERY aligned attribute consistent.

    Real anndata validates `.X` against (n_obs, n_vars), so member-by-member
    assignment crashes there — use its in-place subset helpers.  The bundled
    AnnData-lite copies the subset view's members back, including `_raw`
    (dropping rows from X but not raw would silently row-shift the loss
    target for every later positional slice)."""
    if hasattr(adata, "_inplace_subset_obs"):  # real anndata
        if axis == 0:
            adata._inplace_subset_obs(np.asarray(keep))
        else:
            adata._inplace_subset_var(np.asarray(keep))
        return adata
    sub = adata[keep] if axis == 0 else adata[:, keep]
    adata.X = sub.X
    adata.obs = sub.obs
    adata.var = sub.var
    adata.obsm = sub.obsm
    if getattr(sub, "_raw", None) is not None:
        adata._raw = sub._raw
    return adata


def normalize_per_cell(adata, counts_per_cell_after=None):
    """sc.pp.normalize_per_cell parity: records obs['n_counts'], drops
    zero-count cells, scales each cell to the median (or given) total."""
    counts = _row_sums(adata.X)
    keep = counts > 0
    if not np.all(keep):
        _subset_inplace(adata, keep, axis=0)
        counts = counts[keep]
    adata.obs["n_counts"] = counts
    after = (
        np.median(counts) if counts_per_cell_after is None else counts_per_cell_after
    )
    scale = after / counts
    if sp.issparse(adata.X):
        d = sp.diags(scale.astype(adata.X.dtype))
        adata.X = (d @ adata.X).tocsr()
    else:
        adata.X = adata.X * scale[:, None].astype(adata.X.dtype)
    return adata


def log1p(adata):
    if sp.issparse(adata.X):
        adata.X = adata.X.copy()
        adata.X.data = np.log1p(adata.X.data)
    else:
        adata.X = np.log1p(adata.X)
    return adata


def scale(adata):
    """sc.pp.scale parity: per-gene z-score (ddof=1), zero-variance genes get
    std=1, output densified float32+."""
    X = adata.X
    if sp.issparse(X):
        X = np.asarray(X.todense())
    X = np.asarray(X, dtype=np.float64)
    mean = X.mean(axis=0)
    n = X.shape[0]
    if n > 1:
        var = X.var(axis=0, ddof=1)
    else:
        var = np.zeros(X.shape[1])
    std = np.sqrt(var)
    std[std == 0] = 1.0
    adata.X = ((X - mean) / std).astype(np.float32)
    return adata


def auto_lazy_scale(adata) -> bool:
    """Should the public entry points defer z-scaling (``normalize(...,
    lazy_scale=True)``) for this input?

    True for SPARSE matrices whose dense form would exceed
    ``DCA_TPU_HOST_DENSE_BYTES`` (default 2 GB) — `scale()` would densify
    them on the host (float64!) and the streaming trainer would then ship
    dense chunks, defeating the sparse pipeline the matrix size calls for.
    Small or dense inputs keep the eager reference-parity path."""
    import os

    if not sp.issparse(adata.X):
        return False
    limit = int(os.environ.get("DCA_TPU_HOST_DENSE_BYTES", 2_000_000_000))
    return adata.X.shape[0] * adata.X.shape[1] * 4 > limit


def normalize(
    adata,
    filter_min_counts=True,
    size_factors=True,
    normalize_input=True,
    logtrans_input=True,
    lazy_scale=False,
):
    """Reference io.py:88-111.

    Net effect: model input = scaled log counts in ``adata.X``; loss target =
    raw counts in ``adata.raw.X``; size factors in ``adata.obs.size_factors``.

    ``lazy_scale=True`` (rebuild extension for larger-than-memory data):
    compute the per-gene scale statistics but do NOT densify — ``adata.X``
    stays sparse and the streaming trainer applies
    ``(x - mean) / std`` chunk-wise (data/loader.py).
    """
    if filter_min_counts:
        filter_genes(adata, min_counts=1)
        filter_cells(adata, min_counts=1)

    if size_factors or normalize_input or logtrans_input:
        adata.raw = adata.copy()
    else:
        adata.raw = adata

    if size_factors:
        normalize_per_cell(adata)
        adata.obs["size_factors"] = adata.obs.n_counts / np.median(adata.obs.n_counts)
    else:
        adata.obs["size_factors"] = 1.0

    if logtrans_input:
        log1p(adata)

    if normalize_input:
        if lazy_scale:
            from .loader import lazy_scale_stats

            mean, std = lazy_scale_stats(adata.X)
            adata.uns["dca_scale_mean"] = mean
            adata.uns["dca_scale_std"] = std
        else:
            scale(adata)

    return adata


# ---------------------------------------------------------------------------
# misc I/O
# ---------------------------------------------------------------------------


def read_genelist(filename):
    genelist = list(set(open(filename, "rt").read().strip().split("\n")))
    assert len(genelist) > 0, "No genes detected in genelist file"
    print("dca_tpu: Subset of {} genes will be denoised.".format(len(genelist)))
    return genelist


def write_text_matrix(matrix, filename, rownames=None, colnames=None, transpose=False):
    """Reference io.py:120-129: tab-separated, %.6f, optional transpose that
    swaps row/col names.  Uses the native parallel formatter when available
    (byte-identical to the pandas fallback)."""
    matrix = np.asarray(matrix)
    if transpose:
        matrix = matrix.T
        rownames, colnames = colnames, rownames

    if matrix.ndim == 2:
        from .. import native

        if native.write_matrix(matrix, filename, rownames, colnames, sep="\t"):
            return

    pd.DataFrame(matrix, index=rownames, columns=colnames).to_csv(
        filename,
        sep="\t",
        index=(rownames is not None),
        header=(colnames is not None),
        float_format="%.6f",
    )


def read_pickle(inputfile):
    return pickle.load(open(inputfile, "rb"))


class AnnSequence:
    """Minibatch sequence over (matrix, size_factors) — API-compatible with
    the reference's Keras Sequence stub (io.py:32-50).  The real streaming
    path is data/loader.StreamingData; this exists for drop-in import
    compatibility."""

    def __init__(self, matrix, batch_size, sf=None):
        self.matrix = matrix
        if sf is None:
            self.size_factors = np.ones((self.matrix.shape[0], 1), dtype=np.float32)
        else:
            self.size_factors = sf
        self.batch_size = batch_size

    def __len__(self):
        return len(self.matrix) // self.batch_size

    def __getitem__(self, idx):
        batch = self.matrix[idx * self.batch_size : (idx + 1) * self.batch_size]
        batch_sf = self.size_factors[idx * self.batch_size : (idx + 1) * self.batch_size]
        return {"count": batch, "size_factors": batch_sf}, batch
