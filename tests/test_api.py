"""API tests mirroring the reference integration test (dca/test.py:6-59) on a
synthetic dataset instead of the paul15 download, plus the copy/return
matrix of api.py:123-144."""

import numpy as np
import pytest

from dca_tpu import dca

from conftest import make_adata

EPOCHS = 1
HID = (10, 2, 10)


@pytest.fixture()
def adata():
    return make_adata(120, 25, seed=10)


def test_denoise_default(adata):
    ret = dca(adata, mode="denoise", copy=True, epochs=EPOCHS, verbose=False)
    assert not np.allclose(ret.X[:10], adata.X[:10])


def test_denoise_return_model_and_info(adata):
    ret, model = dca(
        adata, mode="denoise", ae_type="nb-conddisp", copy=True, epochs=EPOCHS,
        return_model=True, return_info=True,
    )
    assert not np.allclose(ret.X[:10], adata.X[:10])
    assert "X_dca_dispersion" in ret.obsm_keys()
    assert model is not None


def test_denoise_nb_constant(adata):
    ret = dca(adata, mode="denoise", ae_type="nb", copy=True, epochs=EPOCHS,
              return_info=True)
    assert not np.allclose(ret.X[:10], adata.X[:10])
    assert "X_dca_dispersion" in ret.var_keys()


def test_denoise_zinb(adata):
    ret = dca(adata, mode="denoise", ae_type="zinb", copy=True, epochs=EPOCHS,
              return_info=True)
    assert not np.allclose(ret.X[:10], adata.X[:10])
    assert "X_dca_dropout" in ret.obsm_keys()
    assert "dca_loss_history" in ret.uns_keys()


def test_denoise_zinb_elempi(adata):
    ret = dca(adata, mode="denoise", ae_type="zinb-elempi", copy=True, epochs=EPOCHS,
              return_info=True)
    assert "X_dca_dropout" in ret.obsm_keys()

    ret = dca(adata, mode="denoise", ae_type="zinb-elempi", copy=True, epochs=EPOCHS,
              return_info=True, network_kwds={"sharedpi": True})
    assert "X_dca_dropout" in ret.obsm_keys()


@pytest.mark.parametrize("ae_type", ["normal", "nb-conddisp", "nb", "zinb"])
def test_latent_mode(adata, ae_type):
    ret = dca(adata, mode="latent", ae_type=ae_type, hidden_size=HID, copy=True,
              epochs=EPOCHS)
    assert "X_dca" in ret.obsm_keys()
    assert ret.obsm["X_dca"].shape[1] == HID[1]
    # latent mode restores raw counts into X (network.py:208-209)
    np.testing.assert_array_equal(ret.X, ret.raw.X)


def test_inplace_modification(adata):
    orig = adata.X.copy()
    ret = dca(adata, mode="denoise", epochs=EPOCHS)
    assert ret is None  # copy=False returns None
    assert not np.allclose(adata.X, orig)


def test_rejects_allzero_genes(adata):
    adata.X[:, 3] = 0.0
    with pytest.raises(AssertionError, match="all-zero genes"):
        dca(adata, copy=True, epochs=EPOCHS)


def test_rejects_bad_mode(adata):
    with pytest.raises(AssertionError):
        dca(adata, mode="full", copy=True, epochs=EPOCHS)


def test_loss_history_in_uns(adata):
    ret = dca(adata, copy=True, epochs=2, return_info=True)
    h = ret.uns["dca_loss_history"]
    assert "loss" in h and len(h["loss"]) <= 2


def test_fork_types_end_to_end(adata):
    for ae_type in ("nb-fork", "zinb-fork", "nb-shared", "zinb-shared", "poisson"):
        ret = dca(adata, ae_type=ae_type, copy=True, epochs=EPOCHS, verbose=False)
        denoised = np.asarray(ret.X)
        assert denoised.shape == adata.shape
        assert np.isfinite(denoised).all(), ae_type
        assert (denoised >= 0).all(), ae_type
        # denoise mode must actually overwrite X (network.py:199-203)
        assert not np.allclose(denoised, np.asarray(adata.X)), ae_type


def test_nb_conddisp_dispersion_from_denoised_matrix(adata):
    """Predict-order quirk pin (reference network.py:318-328): the NB
    conddisp family computes return_info dispersion AFTER denoising, i.e.
    by forwarding the DENOISED matrix — unlike the ZINB family, which
    captures info from the input first (network.py:395-405)."""
    net = dca(adata, ae_type="nb-conddisp", epochs=2, copy=False,
              return_model=True, return_info=True)
    denoised = np.asarray(adata.X)
    sf = np.asarray(adata.obs["size_factors"], np.float32)
    expected = net.forward(denoised, sf)["disp"]
    np.testing.assert_allclose(
        adata.obsm["X_dca_dispersion"], expected, rtol=1e-5
    )


def test_zinb_conddisp_info_from_input_matrix(adata):
    """ZINB predict-order quirk: dispersion/dropout computed from the INPUT
    matrix before denoise overwrites it (reference network.py:399-401)."""
    raw = adata.copy()
    net = dca(adata, ae_type="zinb-conddisp", epochs=2, copy=False,
              return_model=True, return_info=True)
    # re-create the preprocessed input the model saw
    from dca_tpu.data.io import read_dataset, normalize
    pre = normalize(read_dataset(raw, copy=True), filter_min_counts=False)
    sf = np.asarray(pre.obs["size_factors"], np.float32)
    out = net.forward(np.asarray(pre.X), sf)
    np.testing.assert_allclose(adata.obsm["X_dca_dispersion"], out["disp"], rtol=1e-5)
    np.testing.assert_allclose(adata.obsm["X_dca_dropout"], out["pi"], rtol=1e-5)
    # and they differ from what the denoised matrix would give
    out_post = net.forward(np.asarray(adata.X), sf)
    assert not np.allclose(adata.obsm["X_dca_dispersion"], out_post["disp"], rtol=1e-3)


def test_dca_auto_lazy_scale_keeps_sparse(monkeypatch):
    """dca() on a large SPARSE matrix must keep X sparse end-to-end (lazy
    z-scale + streaming + on-device epilogue) instead of densifying on the
    host — gated by DCA_TPU_HOST_DENSE_BYTES; small inputs keep the eager
    reference-parity path."""
    import scipy.sparse as sp

    from conftest import make_counts
    from dca_tpu import dca
    from dca_tpu.data.adata import AnnData
    from dca_tpu.data.io import auto_lazy_scale

    X = make_counts(150, 20, seed=50)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1
    ad_small = AnnData(sp.csr_matrix(X.copy()))
    assert not auto_lazy_scale(ad_small)  # under the 2 GB default

    monkeypatch.setenv("DCA_TPU_HOST_DENSE_BYTES", "1000")  # force lazy
    ad = AnnData(sp.csr_matrix(X.copy()))
    assert auto_lazy_scale(ad)
    ret = dca(ad, mode="denoise", epochs=2, copy=True, verbose=False,
              ae_type="nb-conddisp", return_info=True)
    assert np.isfinite(np.asarray(ret.X)).all()
    assert ret.X.shape == (150, 20)
    assert "dca_loss_history" in ret.uns
