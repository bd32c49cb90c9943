"""On-device densification tests (ops/densify.py + C++ payload prep +
the streaming-pipeline integration behind DCA_TPU_DEVICE_DENSIFY).

TPU-native replacement of the reference's host CSR slicing + .toarray()
batch extraction (/root/reference/dca/io.py:67-68, train.py:83)."""

import numpy as np
import pytest
import scipy.sparse as sp

from dca_tpu import native
from dca_tpu.ops.densify import densify_csr, device_densify, payload_from_csr


def _random_csr(B, G, density, seed=0):
    rs = np.random.RandomState(seed)
    m = sp.random(B, G, density=density, format="csr", random_state=rs,
                  data_rvs=lambda n: rs.poisson(3.0, n) + 1.0)
    m.sort_indices()
    return m


@pytest.mark.parametrize("shape,density", [((32, 300), 0.1), ((13, 513), 0.05),
                                           ((64, 128), 0.5)])
def test_densify_csr_matches_scipy(shape, density):
    B, G = shape
    m = _random_csr(B, G, density)
    got = np.asarray(densify_csr(m.indptr, m.indices, m.data, G))
    np.testing.assert_allclose(got, m.toarray(), rtol=0, atol=0)


def test_densify_empty_rows():
    B, G = 9, 260
    m = _random_csr(B, G, 0.1, seed=1)
    lil = m.tolil()
    lil[0] = 0
    lil[5] = 0
    m = lil.tocsr()
    m.eliminate_zeros()
    got = np.asarray(densify_csr(m.indptr, m.indices, m.data, G))
    np.testing.assert_allclose(got, m.toarray())


def test_payload_from_csr_shape_and_padding():
    m = _random_csr(20, 90, 0.15, seed=2)
    K_global = int(np.diff(m.indptr).max())
    rows = np.array([3, 0, 7, 7, 19])
    idx, dat = payload_from_csr(m, rows, K=K_global + 5)
    assert idx.shape == dat.shape == (5, K_global + 5)
    ref = m.toarray()[rows]
    got = np.asarray(device_densify(idx, dat, 90))
    np.testing.assert_allclose(got, ref)
    # padding slots carry ascending out-of-range ids and zero data; every
    # row's id sequence is strictly increasing (the scatter hints rely on it)
    nnz = np.diff(m.indptr)[rows]
    for r in range(5):
        assert (idx[r, nnz[r]:] >= 90).all()
        assert (np.diff(idx[r].astype(np.int64)) > 0).all()
        assert (dat[r, nnz[r]:] == 0).all()


def test_csr_to_padded_native_matches_fallback(monkeypatch):
    m = _random_csr(40, 70, 0.2, seed=3)
    rows = np.arange(40, dtype=np.int64)[::-1]
    n_i, n_d = native.csr_to_padded(m.indptr, m.indices, m.data, rows, 12, 70)
    # force the pure-numpy fallback
    monkeypatch.setattr(native, "_load", lambda: None)
    f_i, f_d = native.csr_to_padded(m.indptr, m.indices, m.data, rows, 12, 70)
    np.testing.assert_array_equal(n_i, f_i)
    np.testing.assert_array_equal(n_d, f_d)


def test_device_densify_fused_scale():
    m = _random_csr(25, 60, 0.3, seed=4)
    mean = np.linspace(0.1, 2.0, 60).astype(np.float32)
    std = np.linspace(0.5, 3.0, 60).astype(np.float32)
    idx, dat = payload_from_csr(m, np.arange(25))
    got = np.asarray(device_densify(idx, dat, 60, mean, std))
    ref = (m.toarray() - mean) / std
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_streaming_device_densify_matches_host(monkeypatch):
    """End-to-end: the sparse streaming train path with on-device densify
    produces the same loss trajectory as the host-densify default."""
    from conftest import make_counts
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    X = make_counts(120, 12, seed=40)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1

    def run():
        ad = normalize(read_dataset(AnnData(sp.csr_matrix(X))), lazy_scale=True)
        net = AE_types["nb-conddisp"](input_size=12, hidden_size=(8, 4, 8), seed=1)
        net.build()
        return train(ad, net, epochs=3, verbose=False, seed=0,
                     max_device_cells=48)

    monkeypatch.delenv("DCA_TPU_DEVICE_DENSIFY", raising=False)
    h_host = run()
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
    h_dev = run()

    np.testing.assert_allclose(h_host.history["loss"], h_dev.history["loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(
        h_host.history["val_loss"], h_dev.history["val_loss"], rtol=1e-4
    )
