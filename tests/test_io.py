"""Data layer tests: read_dataset/normalize parity (reference io.py:53-111),
TSV writer format, h5ad roundtrip, AnnData-lite container semantics."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from dca_tpu.data import (
    AnnData,
    read_dataset,
    normalize,
    write_text_matrix,
    read_h5ad,
    write_h5ad,
    read_text,
)

from conftest import make_adata, make_counts


class TestAnnDataLite:
    def test_basic(self, adata):
        assert adata.n_obs == 200 and adata.n_vars == 50
        assert adata.obs_names[0] == "cell0"
        c = adata.copy()
        c.X[0, 0] += 1
        assert c.X[0, 0] != adata.X[0, 0]

    def test_transpose(self, adata):
        t = adata.transpose()
        assert t.n_obs == 50 and t.n_vars == 200
        assert t.obs_names[0] == "gene0"

    def test_row_slicing(self, adata):
        adata.obs["grp"] = ["a"] * 100 + ["b"] * 100
        sub = adata[adata.obs["grp"] == "a"]
        assert sub.n_obs == 100
        np.testing.assert_array_equal(sub.X, adata.X[:100])

    def test_raw_snapshot(self, adata):
        adata.raw = adata.copy()
        adata.X = adata.X * 2
        np.testing.assert_array_equal(adata.raw.X * 2, adata.X)


class TestReadDataset:
    def test_from_adata(self, adata):
        out = read_dataset(adata, copy=True)
        assert "dca_split" in out.obs
        assert (out.obs["dca_split"] == "train").all()
        assert str(out.obs["dca_split"].dtype) == "category"

    def test_check_counts_rejects_normalized(self, adata):
        adata.X = adata.X + 0.5
        with pytest.raises(AssertionError):
            read_dataset(adata, copy=True)

    def test_test_split_fraction_and_seed(self, adata):
        a = read_dataset(adata.copy(), test_split=True)
        b = read_dataset(adata.copy(), test_split=True)
        n_test = (a.obs["dca_split"] == "test").sum()
        assert n_test == 20  # 10% of 200, train_test_split(random_state=42)
        # deterministic across calls
        np.testing.assert_array_equal(
            a.obs["dca_split"].values.astype(str), b.obs["dca_split"].values.astype(str)
        )

    def test_transpose_flag(self, adata):
        t = read_dataset(adata.copy(), transpose=True, check_counts=False)
        assert t.n_obs == adata.n_vars


class TestNormalize:
    def test_full_pipeline(self, adata):
        raw = adata.X.copy()
        out = normalize(read_dataset(adata))
        # raw counts preserved
        np.testing.assert_array_equal(out.raw.X, raw)
        # size factors = n_counts / median (io.py:101)
        n_counts = raw.sum(1)
        np.testing.assert_allclose(
            out.obs["size_factors"], n_counts / np.median(n_counts), rtol=1e-6
        )
        # X is z-scaled log1p of cell-normalized counts
        med = np.median(n_counts)
        expected = np.log1p(raw * (med / n_counts)[:, None])
        mean = expected.mean(0)
        std = expected.std(0, ddof=1)
        std[std == 0] = 1.0
        np.testing.assert_allclose(out.X, (expected - mean) / std, rtol=1e-4, atol=1e-4)

    def test_no_size_factors(self, adata):
        out = normalize(read_dataset(adata), size_factors=False)
        assert (out.obs["size_factors"] == 1.0).all()

    def test_raw_only_flags_off(self, adata):
        raw = adata.X.copy()
        out = normalize(
            read_dataset(adata),
            size_factors=False,
            normalize_input=False,
            logtrans_input=False,
        )
        np.testing.assert_array_equal(out.X, raw)

    def test_filter_removes_empty(self):
        X = make_counts(50, 20, seed=3)
        X[:, 5] = 0.0  # dead gene
        X[7, :] = 0.0  # dead cell
        ad = AnnData(X)
        out = normalize(read_dataset(ad), filter_min_counts=True)
        assert out.n_vars == 19
        assert out.n_obs == 49

    def test_sparse_input(self):
        X = make_counts(50, 20, seed=4)
        X[X < 3] = 0
        ad = AnnData(sp.csr_matrix(X))
        out = normalize(read_dataset(ad))
        assert not sp.issparse(out.X)  # scale densifies
        assert sp.issparse(out.raw.X)


class TestWriters:
    def test_write_text_matrix_format(self, tmp_path):
        m = np.array([[1.23456789, 2.0], [3.0, 4.5]])
        f = str(tmp_path / "m.tsv")
        write_text_matrix(m, f, rownames=["r1", "r2"], colnames=["c1", "c2"])
        df = pd.read_csv(f, sep="\t", index_col=0)
        assert df.loc["r1", "c1"] == pytest.approx(1.234568)  # %.6f
        # the %.6f fixed format itself must appear in the file bytes — a
        # full-precision write would still pass the approx check above
        text = open(f).read()
        assert "1.234568\t" in text and "2.000000" in text, text
        # transpose swaps names (io.py:121-123)
        f2 = str(tmp_path / "t.tsv")
        write_text_matrix(m, f2, rownames=["r1", "r2"], colnames=["c1", "c2"], transpose=True)
        df2 = pd.read_csv(f2, sep="\t", index_col=0)
        assert list(df2.index) == ["c1", "c2"]
        assert list(df2.columns) == ["r1", "r2"]

    def test_read_text_roundtrip(self, tmp_path):
        m = np.arange(12, dtype=np.float32).reshape(3, 4)
        f = str(tmp_path / "m.tsv")
        write_text_matrix(m, f, rownames=["a", "b", "c"], colnames=list("wxyz"))
        ad = read_text(f)
        np.testing.assert_array_equal(ad.X, m)
        assert list(ad.obs_names) == ["a", "b", "c"]

    def test_h5ad_roundtrip_dense(self, tmp_path, adata):
        adata.obs["grp"] = pd.Categorical(["a"] * 100 + ["b"] * 100)
        adata.obsm["X_test"] = np.random.RandomState(0).normal(size=(200, 3))
        f = str(tmp_path / "a.h5ad")
        write_h5ad(adata, f)
        back = read_h5ad(f)
        np.testing.assert_allclose(back.X, adata.X)
        assert list(back.obs_names) == list(adata.obs_names)
        assert list(back.obs["grp"]) == list(adata.obs["grp"])
        assert "X_test" in back.obsm

    def test_h5ad_roundtrip_sparse(self, tmp_path):
        X = make_counts(30, 10, seed=5)
        X[X < 3] = 0
        ad = AnnData(sp.csr_matrix(X))
        f = str(tmp_path / "s.h5ad")
        write_h5ad(ad, f)
        back = read_h5ad(f)
        assert sp.issparse(back.X)
        np.testing.assert_allclose(np.asarray(back.X.todense()), X)


def test_normalize_keeps_raw_aligned_when_cells_dropped():
    """normalize_per_cell drops zero-count cells AFTER raw is snapshotted;
    raw must shrink with X or every later positional slice row-shifts the
    loss target (silent corruption)."""
    from dca_tpu.data.adata import AnnData

    X = make_counts(10, 6, seed=50)
    X[3, :] = 0.0  # zero-count cell survives gene filtering, dies in sf norm
    orig = X.copy()
    ad = normalize(read_dataset(AnnData(X.copy()), check_counts=False),
                   filter_min_counts=False)
    assert ad.n_obs == 9
    assert ad.raw.X.shape[0] == 9
    expect = np.delete(orig, 3, axis=0)
    np.testing.assert_array_equal(np.asarray(ad.raw.X), expect)


def test_filters_on_real_anndata():
    """adata.py promises transparent support for the real anndata package;
    the filters must use its in-place subset API (plain member assignment
    raises there)."""
    anndata = pytest.importorskip("anndata")

    X = make_counts(30, 12, seed=51)
    X[:, 5] = 0.0  # a gene to filter out
    X[7, :] = 0.0  # a cell to filter out
    ad = anndata.AnnData(X.copy())
    ad = normalize(read_dataset(ad, check_counts=False), filter_min_counts=True)
    assert ad.n_vars == 11 and ad.n_obs == 29
    assert ad.raw is not None and ad.raw.X.shape[0] == ad.n_obs


def test_h5ad_roundtrip_preserves_uns(tmp_path):
    """uns carries contract keys (dca_loss_history, lazy-scale stats) and
    must survive write_h5ad/read_h5ad."""
    from dca_tpu.data.adata import AnnData

    ad = AnnData(make_counts(20, 8, seed=52))
    ad.uns["dca_loss_history"] = {"loss": np.asarray([3.0, 2.0]),
                                  "lr": np.asarray([1e-3, 1e-3])}
    ad.uns["dca_scale_mean"] = np.arange(8, dtype=np.float32)
    ad.uns["note"] = "hello"
    path = str(tmp_path / "u.h5ad")
    write_h5ad(ad, path)
    back = read_h5ad(path)
    np.testing.assert_allclose(back.uns["dca_loss_history"]["loss"], [3.0, 2.0])
    np.testing.assert_allclose(back.uns["dca_scale_mean"], np.arange(8))
    assert back.uns["note"] == "hello"
