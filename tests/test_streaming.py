"""Streaming (larger-than-device) input pipeline tests (data/loader.py +
the chunked trainer path)."""

import numpy as np
import pytest
import scipy.sparse as sp

from dca_tpu.data import read_dataset, normalize
from dca_tpu.data.adata import AnnData
from dca_tpu.data.loader import StreamingData, lazy_scale_stats
from dca_tpu.models import AE_types
from dca_tpu.train import train

from conftest import make_counts


def test_lazy_scale_stats_match_dense():
    X = make_counts(200, 40, seed=30)
    Xs = sp.csr_matrix(X)
    m_s, s_s = lazy_scale_stats(Xs)
    m_d, s_d = lazy_scale_stats(X)
    np.testing.assert_allclose(m_s, m_d, rtol=1e-5)
    np.testing.assert_allclose(s_s, s_d, rtol=1e-4)
    np.testing.assert_allclose(m_d, X.mean(0), rtol=1e-5)
    ref_std = X.std(0, ddof=1)
    ref_std[ref_std == 0] = 1.0
    np.testing.assert_allclose(s_d, ref_std, rtol=1e-4)


def test_streaming_chunks_cover_everything():
    X = make_counts(105, 10, seed=31)
    target = X * 3.0  # distinct from X so x/t swaps are caught
    sf = np.arange(105, dtype=np.float32) + 1.0
    sd = StreamingData(sp.csr_matrix(X), target, sf, chunk_cells=32)
    perm = np.random.RandomState(0).permutation(105)
    seen, xs, ts, sfs = [], [], [], []
    for xc, tc, sfc, is_full in sd.epoch_chunks(perm):
        assert xc.shape[1] == 10
        assert xc.dtype == np.float32
        seen.append(xc.shape[0])
        xs.append(xc)
        ts.append(tc)
        sfs.append(sfc)
    assert sum(seen) == 105
    assert seen[:-1] == [32, 32, 32]
    # contents follow the permutation, for input, target AND size factors
    np.testing.assert_array_equal(np.concatenate(xs), X[perm])
    np.testing.assert_array_equal(np.concatenate(ts), target[perm])
    np.testing.assert_array_equal(np.concatenate(sfs), sf[perm])


def test_streaming_scale_applied():
    X = make_counts(50, 8, seed=32)
    mean, std = lazy_scale_stats(X)
    sd = StreamingData(sp.csr_matrix(X), X, np.ones(50, np.float32), 50, mean, std)
    xc, tc, _, _ = next(sd.epoch_chunks(np.arange(50)))
    np.testing.assert_allclose(xc, (X - mean) / std, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(tc, X)  # target stays raw


def test_normalize_lazy_scale_keeps_sparse():
    X = make_counts(80, 20, seed=33)
    X[X < 3] = 0
    X[:, 0] += 1
    X[0, :] += 1
    ad = AnnData(sp.csr_matrix(X))
    out = normalize(read_dataset(ad), lazy_scale=True)
    assert sp.issparse(out.X)
    assert "dca_scale_mean" in out.uns and "dca_scale_std" in out.uns


def test_streaming_training_matches_dense_path():
    """Force streaming with small chunks; loss trajectory must be close to
    the dense device-resident path (same batches, same order)."""
    X = make_counts(140, 16, seed=34)
    ad = normalize(read_dataset(AnnData(X)))

    net_a = AE_types["nb-conddisp"](input_size=16, hidden_size=(8, 4, 8), seed=1)
    net_a.build()
    h_a = train(ad, net_a, epochs=4, verbose=False, seed=5, compiled=False)

    net_b = AE_types["nb-conddisp"](input_size=16, hidden_size=(8, 4, 8), seed=1)
    net_b.build()
    h_b = train(ad, net_b, epochs=4, verbose=False, seed=5, max_device_cells=64)

    # same seed -> same global permutation; batches are sliced identically
    np.testing.assert_allclose(h_a.history["loss"], h_b.history["loss"], rtol=2e-3)
    np.testing.assert_allclose(
        h_a.history["val_loss"], h_b.history["val_loss"], rtol=2e-3
    )


def test_prefetch_depth_is_trajectory_invariant(monkeypatch):
    """DCA_TPU_PREFETCH is a pure pipeline knob: depth 0 (serial), 1
    (double-buffer) and 3 (deep queue) must produce IDENTICAL loss
    trajectories — staging order and RNG folding do not depend on it."""
    X = make_counts(150, 14, seed=36)
    ad = normalize(read_dataset(AnnData(X)))

    def fit(depth):
        monkeypatch.setenv("DCA_TPU_PREFETCH", depth)
        net = AE_types["nb-conddisp"](input_size=14, hidden_size=(8, 4, 8),
                                      seed=1)
        net.build()
        return train(ad, net, epochs=3, verbose=False, seed=5,
                     max_device_cells=48).history

    h0, h1, h3 = fit("0"), fit("1"), fit("3")
    np.testing.assert_allclose(h1["loss"], h0["loss"], rtol=1e-6)
    np.testing.assert_allclose(h3["loss"], h0["loss"], rtol=1e-6)
    np.testing.assert_allclose(h3["val_loss"], h0["val_loss"], rtol=1e-6)


def _lazy_sparse_adata(n=150, g=14, seed=36):
    X = make_counts(n, g, seed=seed)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1
    return X, normalize(read_dataset(AnnData(sp.csr_matrix(X))),
                        lazy_scale=True)


def test_resident_part_matches_scipy():
    """ops/resident.ResidentCSR rebuilds a shuffled part on device exactly:
    the raw target equals the scipy dense rows and the derived input is
    (log1p(t*m) - mu) / sd."""
    from dca_tpu.ops.resident import ResidentCSR

    rs = np.random.RandomState(40)
    X = make_counts(80, 12, seed=40)
    X[X < 2] = 0
    X[:, 0] += 1
    Xs = sp.csr_matrix(X)
    m = rs.uniform(0.5, 2.0, 80).astype(np.float32)
    sf = rs.uniform(0.5, 2.0, 80).astype(np.float32)
    mu = rs.normal(size=12).astype(np.float32)
    sd = rs.uniform(0.5, 2.0, 12).astype(np.float32)
    r = ResidentCSR(Xs, m, sf, mu, sd)
    rows = rs.permutation(80)[:33]
    x, t, sfp = r.part(rows)
    np.testing.assert_array_equal(np.asarray(t), X[rows])
    np.testing.assert_allclose(
        np.asarray(x), (np.log1p(X[rows] * m[rows, None]) - mu) / sd,
        rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sfp), sf[rows])


def test_resident_matches_streaming(monkeypatch):
    """DCA_TPU_RESIDENT is a pure staging knob: the device-resident corpus
    path must produce the IDENTICAL trajectory to the wire-staged run
    (same perm, same raw values, same scatter/derive programs)."""
    X, _ = _lazy_sparse_adata()

    def fit(resident):
        monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
        monkeypatch.setenv("DCA_TPU_RESIDENT", resident)
        ad = normalize(read_dataset(AnnData(sp.csr_matrix(X.copy()))),
                       lazy_scale=True)
        net = AE_types["nb-conddisp"](input_size=14, hidden_size=(8, 4, 8),
                                      seed=1)
        net.build()
        return train(ad, net, epochs=3, verbose=False, seed=5,
                     max_device_cells=48).history

    h_off, h_on = fit("0"), fit("1")
    np.testing.assert_allclose(h_on["loss"], h_off["loss"], rtol=1e-6)
    np.testing.assert_allclose(h_on["val_loss"], h_off["val_loss"],
                               rtol=1e-6)


def test_resident_auto_gates_on_size(monkeypatch, capsys):
    """auto mode engages only between the MIN/MAX byte bounds: tiny runs
    stay on the wire path by default, dropping the floor pulls them in."""
    X, _ = _lazy_sparse_adata()

    def fit(**env):
        monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
        monkeypatch.delenv("DCA_TPU_RESIDENT", raising=False)
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        ad = normalize(read_dataset(AnnData(sp.csr_matrix(X.copy()))),
                       lazy_scale=True)
        net = AE_types["nb-conddisp"](input_size=14, hidden_size=(8, 4, 8),
                                      seed=1)
        net.build()
        train(ad, net, epochs=1, verbose=True, seed=5, max_device_cells=48)
        return capsys.readouterr().out

    assert "corpus resident" not in fit()  # default 64 MB floor
    assert "corpus resident" in fit(DCA_TPU_RESIDENT_MIN_BYTES="0")
    assert "corpus resident" in fit(DCA_TPU_RESIDENT="1")


def test_streaming_sparse_end_to_end():
    X = make_counts(120, 12, seed=35)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1
    ad = normalize(read_dataset(AnnData(sp.csr_matrix(X))), lazy_scale=True)
    net = AE_types["zinb-conddisp"](input_size=12, hidden_size=(8, 4, 8))
    net.build()
    h = train(ad, net, epochs=3, verbose=False, seed=0, max_device_cells=48)
    assert np.isfinite(h.history["loss"]).all()
    assert h.history["loss"][-1] < h.history["loss"][0]


def test_streaming_crash_resume(tmp_path):
    """checkpoint_every/resume on the streaming path: train 4 epochs with
    checkpoints == train 2, crash, resume 2 more (the 1M-cell runs this
    path exists for are the ones that need crash recovery)."""
    X = make_counts(140, 16, seed=36)
    ad = normalize(read_dataset(AnnData(X)))

    def _n():
        n = AE_types["nb-conddisp"](input_size=16, hidden_size=(8, 4, 8), seed=1)
        n.build()
        return n

    out_a = str(tmp_path / "a")
    h_a = train(ad, _n(), epochs=4, verbose=False, seed=5, max_device_cells=64,
                output_dir=out_a, checkpoint_every=1, reduce_lr=0, early_stop=0)

    out_b = str(tmp_path / "b")
    train(ad, _n(), epochs=2, verbose=False, seed=5, max_device_cells=64,
          output_dir=out_b, checkpoint_every=1, reduce_lr=0, early_stop=0)
    h_b = train(ad, _n(), epochs=4, verbose=False, seed=5, max_device_cells=64,
                output_dir=out_b, checkpoint_every=1, resume=True,
                reduce_lr=0, early_stop=0)

    assert len(h_b.history["loss"]) == 2  # epochs 3-4 only
    np.testing.assert_allclose(
        h_b.history["loss"], h_a.history["loss"][2:], rtol=1e-4
    )


def test_streaming_save_weights(tmp_path):
    """save_weights on the streaming path writes best-val weights.hdf5 that
    load back into a fresh network."""
    import os

    X = make_counts(120, 12, seed=37)
    ad = normalize(read_dataset(AnnData(X)))
    net = AE_types["nb-conddisp"](input_size=12, hidden_size=(8, 4, 8), seed=1)
    net.build()
    out = str(tmp_path / "w")
    train(ad, net, epochs=3, verbose=False, seed=0, max_device_cells=48,
          output_dir=out, save_weights=True)
    f = os.path.join(out, "weights.hdf5")
    assert os.path.exists(f)
    net2 = AE_types["nb-conddisp"](input_size=12, hidden_size=(8, 4, 8), seed=2)
    net2.build()
    net2.load_weights(f)
    a = np.asarray(net.params["heads"]["mean"]["kernel"])
    # loaded weights are the BEST epoch's, not necessarily the last —
    # just require a successful, shape-correct round trip
    assert np.asarray(net2.params["heads"]["mean"]["kernel"]).shape == a.shape
    assert np.isfinite(np.asarray(net2.params["heads"]["mean"]["kernel"])).all()


def test_lazy_scale_predict_applies_deferred_scaling():
    """In lazy-scale mode adata.X still holds RAW counts; predict must apply
    the stored per-gene stats before the forward or every output is wrong."""
    X = make_counts(150, 20, seed=38)
    # dense reference pipeline (eager scaling)
    ad_d = normalize(read_dataset(AnnData(X.copy())))
    net = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8), seed=1)
    net.build()
    train(ad_d, net, epochs=3, verbose=False, seed=0, compiled=False)
    ref = net.forward(ad_d.X, np.asarray(ad_d.obs["size_factors"], np.float32))

    # same weights, lazy-scale adata (raw sparse X + stats in uns)
    ad_s = normalize(read_dataset(AnnData(sp.csr_matrix(X.copy()))),
                     lazy_scale=True)
    assert sp.issparse(ad_s.X)
    net.predict(ad_s, mode="denoise")
    np.testing.assert_allclose(np.asarray(ad_s.X), ref["output"],
                               rtol=1e-4, atol=1e-5)


def test_forward_chunked_matches_single_shot():
    """Blockwise forward (the 1M-cell predict path) must merge to exactly the
    single-shot result, for per-row outputs and per-gene constants alike."""
    X = make_counts(70, 12, seed=39)
    ad = normalize(read_dataset(AnnData(X)))
    sf = np.asarray(ad.obs["size_factors"], np.float32)
    for ae in ("zinb-conddisp", "nb"):  # nb = constant per-gene dispersion
        net = AE_types[ae](input_size=12, hidden_size=(6, 3, 6), seed=2)
        net.build()
        whole = net.forward(ad.X, sf)
        blocked = net.forward(ad.X, sf, chunk_rows=16)
        assert set(whole) == set(blocked)
        for k, v in whole.items():
            if v is None:
                assert blocked[k] is None
            else:
                assert blocked[k].shape == v.shape, k
                np.testing.assert_allclose(blocked[k], v, rtol=1e-5,
                                           atol=1e-6, err_msg=k)


def test_lazy_scale_dense_path_matches_eager():
    """Lazy-normalized data that lands in the DENSE trainer (small enough
    not to stream) must train exactly like eagerly scaled data — the
    deferred z-scale is applied at assembly (auto-lazy can route mid-size
    matrices here)."""
    X = make_counts(100, 14, seed=36)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1

    ad_eager = normalize(read_dataset(AnnData(sp.csr_matrix(X.copy()))))
    net_a = AE_types["nb-conddisp"](input_size=14, hidden_size=(8, 4, 8), seed=1)
    net_a.build()
    h_a = train(ad_eager, net_a, epochs=3, verbose=False, seed=5, compiled=False)

    ad_lazy = normalize(read_dataset(AnnData(sp.csr_matrix(X.copy()))),
                        lazy_scale=True)
    assert sp.issparse(ad_lazy.X)
    net_b = AE_types["nb-conddisp"](input_size=14, hidden_size=(8, 4, 8), seed=1)
    net_b.build()
    h_b = train(ad_lazy, net_b, epochs=3, verbose=False, seed=5, compiled=False)

    # lazy stats use the one-pass sparse variance (E[x^2]-E[x]^2) vs
    # eager scale()'s two-pass float64 — ~1e-6 relative std difference
    # drifts trajectories to ~1e-4 over epochs (same tolerance as the
    # other lazy-vs-eager comparisons in this file)
    np.testing.assert_allclose(h_a.history["loss"], h_b.history["loss"],
                               rtol=1e-3)
    np.testing.assert_allclose(h_a.history["val_loss"], h_b.history["val_loss"],
                               rtol=1e-3)
