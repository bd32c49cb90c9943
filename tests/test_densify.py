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
    # exact-transfer mode: shipped input values are bit-identical to the
    # host path, trajectories match tightly
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
    monkeypatch.setenv("DCA_TPU_DERIVE_INPUT", "0")
    h_dev = run()
    np.testing.assert_allclose(h_host.history["loss"], h_dev.history["loss"],
                               rtol=1e-4)
    np.testing.assert_allclose(
        h_host.history["val_loss"], h_dev.history["val_loss"], rtol=1e-4
    )
    # default ship-one-payload mode: the input is derived on device
    # (log1p evaluated by XLA instead of numpy, per-row m recovered in
    # f64) — <=1-ulp input rounding drifts the trajectory at the 1e-4
    # level over epochs, statistically invisible
    monkeypatch.delenv("DCA_TPU_DERIVE_INPUT", raising=False)
    h_drv = run()
    np.testing.assert_allclose(h_host.history["loss"], h_drv.history["loss"],
                               rtol=2e-3)
    np.testing.assert_allclose(
        h_host.history["val_loss"], h_drv.history["val_loss"], rtol=2e-3
    )


# ---------------------------------------------------------------------------
# flat COO payload (heavy-tailed row-nnz encoding, round 3)
# ---------------------------------------------------------------------------


def test_flat_payload_densify_matches_scipy():
    from dca_tpu.ops.densify import device_densify_flat, flat_payload_from_csr

    m = _random_csr(37, 55, 0.25, seed=5)
    L = m.nnz + 64
    counts, c, v = flat_payload_from_csr(m, np.arange(37), L)
    assert c.dtype == np.int16  # 55 columns -> int16 on the wire
    assert counts.shape == (38,) and counts[-1] == 64
    out = np.asarray(device_densify_flat(counts, c, v, 37, 55))
    np.testing.assert_allclose(out, m.toarray(), rtol=1e-6)


def test_flat_payload_fused_scale():
    from dca_tpu.ops.densify import device_densify_flat, flat_payload_from_csr

    m = _random_csr(20, 30, 0.3, seed=6)
    mean = np.linspace(0.1, 1.5, 30).astype(np.float32)
    std = np.linspace(0.5, 2.5, 30).astype(np.float32)
    counts, c, v = flat_payload_from_csr(m, np.arange(20), m.nnz + 16)
    got = np.asarray(device_densify_flat(counts, c, v, 20, 30, mean, std))
    np.testing.assert_allclose(got, (m.toarray() - mean) / std,
                               rtol=1e-5, atol=1e-6)


def test_csr_to_flat_native_matches_fallback(monkeypatch):
    m = _random_csr(40, 70, 0.2, seed=7)
    rows = np.arange(40, dtype=np.int64)[::-1]
    L = m.nnz + 32
    n_r, n_c, n_v, n_t = native.csr_to_flat(m.indptr, m.indices, m.data,
                                            rows, L, 40)
    monkeypatch.setattr(native, "_load", lambda: None)
    f_r, f_c, f_v, f_t = native.csr_to_flat(m.indptr, m.indices, m.data,
                                            rows, L, 40)
    assert n_t == f_t
    np.testing.assert_array_equal(n_r, f_r)
    np.testing.assert_array_equal(n_c, f_c)
    np.testing.assert_array_equal(n_v, f_v)


def test_flat_payload_overflow_raises():
    from dca_tpu.ops.densify import flat_payload_from_csr

    m = _random_csr(10, 20, 0.5, seed=8)
    with pytest.raises(ValueError, match="overflow"):
        flat_payload_from_csr(m, np.arange(10), m.nnz - 1)


def test_loader_picks_flat_for_heavy_tail():
    """A matrix with one whale row (K >> mean nnz) must choose the flat
    encoding; a balanced matrix keeps the padded one."""
    from dca_tpu.data.loader import FlatChunk, SparseChunk, StreamingData

    rs = np.random.RandomState(9)
    balanced = sp.csr_matrix((rs.uniform(size=(60, 80)) < 0.2).astype(np.float32))
    whale = balanced.tolil()
    whale[0, :] = 1.0  # one full row -> K = 80 vs mean ~16
    whale = whale.tocsr()
    sf = np.ones(60, np.float32)

    sd_b = StreamingData(balanced, balanced, sf, 30, device_densify=True)
    xb, _, _ = sd_b.materialize(np.arange(30))
    assert isinstance(xb, SparseChunk)

    sd_w = StreamingData(whale, whale, sf, 30, device_densify=True)
    xw, tw, _ = sd_w.materialize(np.arange(30))
    # integral count values upgrade flat -> flat8 in auto mode (round 4)
    from dca_tpu.data.loader import Flat8Chunk as _F8
    from dca_tpu.ops.densify import device_densify_flat, device_densify_flat8

    assert isinstance(xw, (FlatChunk, _F8))
    assert type(tw) is type(xw)
    if isinstance(xw, _F8):
        out = np.asarray(device_densify_flat8(xw))
    else:
        out = np.asarray(device_densify_flat(xw.counts, xw.col, xw.val, 30, 80))
    np.testing.assert_allclose(out, whale[:30].toarray(), rtol=1e-6)


def test_streaming_flat_payload_matches_host(monkeypatch):
    """Forced flat payloads train identically to the host-densify path."""
    from conftest import make_counts
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    X = make_counts(120, 12, seed=42)
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
    monkeypatch.setenv("DCA_TPU_PAYLOAD", "flat")
    h_flat = run()
    np.testing.assert_allclose(h_host.history["loss"], h_flat.history["loss"],
                               rtol=1e-4)


def test_shared_pattern_index_aliasing():
    """normalize only rescales values, so input/target payloads share the
    index stream by IDENTITY (shipped once per chunk by the trainer)."""
    from dca_tpu.data.loader import FlatChunk, SparseChunk, StreamingData

    rs = np.random.RandomState(11)
    raw = sp.csr_matrix((rs.uniform(size=(50, 40)) < 0.3).astype(np.float32) *
                        rs.poisson(3.0, size=(50, 40)).astype(np.float32))
    raw.eliminate_zeros()
    scaled = raw.copy()
    scaled.data = np.log1p(scaled.data * 1.7)  # same pattern, new values
    sf = np.ones(50, np.float32)

    for mode, cls in (("padded", SparseChunk), ("flat", FlatChunk)):
        sd = StreamingData(scaled, raw, sf, 25, device_densify=True,
                           payload_mode=mode)
        assert sd._shared_pattern
        x, t, _ = sd.materialize(np.arange(25))
        assert isinstance(x, cls) and isinstance(t, cls)
        if mode == "flat":
            assert t.counts is x.counts and t.col is x.col
            assert t.val is not x.val
        else:
            assert t.idx is x.idx
            assert t.dat is not x.dat

    # different pattern -> no aliasing
    other = raw.copy().tolil()
    other[0, 0] = other[0, 0] + 1 if other[0, 0] == 0 else 0
    sd2 = StreamingData(scaled, other.tocsr(), sf, 25, device_densify=True,
                        payload_mode="padded")
    assert not sd2._shared_pattern


def test_flat_payload_wide_panel_keeps_int32():
    from dca_tpu.ops.densify import device_densify_flat, flat_payload_from_csr

    rs = np.random.RandomState(12)
    G = 40000  # > int16 range -> col ids stay int32
    m = sp.csr_matrix(
        (np.ones(50, np.float32),
         (np.repeat(np.arange(5), 10),
          rs.choice(G, size=50, replace=False))),
        shape=(5, G),
    )
    m.sum_duplicates()
    m.sort_indices()
    counts, c, v = flat_payload_from_csr(m, np.arange(5), m.nnz + 8)
    assert c.dtype == np.int32
    out = np.asarray(device_densify_flat(counts, c, v, 5, G))
    np.testing.assert_allclose(out, m.toarray(), rtol=1e-6)


def test_forward_payload_path_matches_dense(monkeypatch):
    """predict/forward on CSR input with device-densify on must equal the
    host-densified forward exactly (same z-scale epilogue)."""
    from dca_tpu.models import AE_types

    rs = np.random.RandomState(13)
    X = (rs.uniform(size=(70, 24)) < 0.3).astype(np.float32) * \
        rs.poisson(3.0, size=(70, 24)).astype(np.float32)
    Xs = sp.csr_matrix(X)
    mean = X.mean(0).astype(np.float32)
    std = (X.std(0) + 1.0).astype(np.float32)
    sf = rs.uniform(0.5, 2.0, size=70).astype(np.float32)

    net = AE_types["nb-conddisp"](input_size=24, hidden_size=(8, 4, 8), seed=2)
    net.build()

    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "0")
    ref = net.forward(Xs, sf, scale_mean=mean, scale_std=std, chunk_rows=32)
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
    net._predict_jit = None
    got = net.forward(Xs, sf, scale_mean=mean, scale_std=std, chunk_rows=32)
    for k in ("output", "latent"):
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# ship-one-payload mode: input derived on device from the raw target
# ---------------------------------------------------------------------------


def test_derivable_row_scale_roundtrip():
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.train.loop import _derivable_row_scale

    rs = np.random.RandomState(14)
    X = (rs.uniform(size=(60, 30)) < 0.4).astype(np.float32) * \
        rs.poisson(4.0, size=(60, 30)).astype(np.float32)
    X[:, 0] += 1
    X[0, :] += 1
    ad = normalize(read_dataset(AnnData(sp.csr_matrix(X)),
                                check_counts=False), lazy_scale=True)
    m = _derivable_row_scale(ad.X, ad.raw.X)
    assert m is not None
    # reconstruct every entry, not just the verification sample
    rows = np.repeat(np.arange(ad.X.shape[0]), np.diff(ad.X.indptr))
    recon = np.log1p(ad.raw.X.data * m[rows])
    np.testing.assert_allclose(recon, ad.X.data, rtol=1e-5, atol=1e-6)

    # negative: different pattern -> None
    other = ad.raw.X.copy()
    other.data = other.data * 2.0 + 1.0  # not a per-row scale of X
    assert _derivable_row_scale(ad.X, sp.csr_matrix(np.ones((60, 30)))) is None
    assert _derivable_row_scale(other, ad.raw.X) is None  # wrong functional form


def test_uint16_value_stream_for_counts():
    from dca_tpu.data.loader import FlatChunk, StreamingData

    rs = np.random.RandomState(15)
    raw = sp.csr_matrix(
        (rs.uniform(size=(40, 20)) < 0.4).astype(np.float32)
        * rs.poisson(5.0, size=(40, 20)).astype(np.float32))
    raw.eliminate_zeros()
    floats = raw.copy()
    floats.data = np.log1p(floats.data * 1.3)
    sd = StreamingData(floats, raw, np.ones(40, np.float32), 20,
                       device_densify=True, payload_mode="flat")
    x, t, _ = sd.materialize(np.arange(20))
    assert isinstance(t, FlatChunk)
    assert t.val.dtype == np.uint16      # raw counts: lossless half-width
    assert x.val.dtype == np.float32     # log-transformed input stays f32
    from dca_tpu.ops.densify import device_densify_flat

    out = np.asarray(device_densify_flat(t.counts, t.col, t.val, 20, 20))
    np.testing.assert_array_equal(out, raw[:20].toarray())


def test_streaming_derived_input_matches_host(monkeypatch):
    """Full streaming training with ship-one-payload mode (sparse lazy input
    derived on device from the raw target) must reproduce the host-densify
    trajectory."""
    from conftest import make_counts
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    X = make_counts(120, 12, seed=44)
    X[X < 2] = 0
    X[:, 0] += 1
    X[0, :] += 1

    def run():
        ad = normalize(read_dataset(AnnData(sp.csr_matrix(X))), lazy_scale=True)
        net = AE_types["nb-conddisp"](input_size=12, hidden_size=(8, 4, 8), seed=1)
        net.build()
        return train(ad, net, epochs=3, verbose=False, seed=0,
                     max_device_cells=48)

    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "0")
    h_host = run()
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
    # assert the derive path actually engages for this configuration
    from dca_tpu.train import loop as loop_mod

    ad_probe = normalize(read_dataset(AnnData(sp.csr_matrix(X))), lazy_scale=True)
    assert loop_mod._derivable_row_scale(ad_probe.X, ad_probe.raw.X) is not None
    h_dev = run()
    # <=1-ulp derived-input rounding (see test above) -> 2e-3 tolerance
    np.testing.assert_allclose(h_host.history["loss"], h_dev.history["loss"],
                               rtol=2e-3)
    np.testing.assert_allclose(h_host.history["val_loss"],
                               h_dev.history["val_loss"], rtol=2e-3)


def test_padded_payload_int16_and_uint16_wire(monkeypatch):
    """The padded encoding gets the same lossless wire downcasts as flat:
    int16 ids when n_cols+K fits, uint16 values for integer counts — and
    the scatter result is unchanged."""
    from dca_tpu.data.loader import SparseChunk, StreamingData

    rs = np.random.RandomState(16)
    raw = sp.csr_matrix(
        (rs.uniform(size=(30, 40)) < 0.3).astype(np.float32)
        * rs.poisson(4.0, size=(30, 40)).astype(np.float32))
    raw.eliminate_zeros()
    sd = StreamingData(raw, raw, np.ones(30, np.float32), 15,
                       device_densify=True, payload_mode="padded")
    x, t, _ = sd.materialize(np.arange(15))
    assert isinstance(t, SparseChunk)
    assert t.idx.dtype == np.int16
    assert t.dat.dtype == np.uint16
    out = np.asarray(device_densify(t.idx, t.dat, 40))
    np.testing.assert_array_equal(out, raw[:15].toarray())


# ---------------------------------------------------------------------------
# FLAT8 payload (round 4): uint8 gap/value streams + exception side-streams
# ---------------------------------------------------------------------------


def _flat8_roundtrip(m, rows=None, scale=None):
    from dca_tpu.data.loader import Flat8Chunk
    from dca_tpu.ops.densify import (
        device_densify_flat8, flat8_payload_from_csr, flat_slots_for,
    )

    rows = np.arange(m.shape[0]) if rows is None else rows
    L = flat_slots_for(m, rows)
    payload = flat8_payload_from_csr(m, rows, L, 1024, 1024)
    c = Flat8Chunk(*payload, len(rows), m.shape[1])
    if scale is not None:
        return np.asarray(device_densify_flat8(c, *scale)), c
    return np.asarray(device_densify_flat8(c)), c


@pytest.mark.parametrize("shape,density", [((32, 300), 0.1), ((13, 513), 0.05),
                                           ((40, 4000), 0.01)])
def test_flat8_densify_matches_scipy(shape, density):
    m = _random_csr(*shape, density)
    got, _ = _flat8_roundtrip(m)
    np.testing.assert_allclose(got, m.toarray(), rtol=0, atol=0)


def test_flat8_gap_and_value_exceptions_lossless():
    """Gaps > 255 (very wide sparse panel) and values outside uint8
    (large counts, non-integers, negatives) must ride the exception
    streams bit-exactly."""
    rs = np.random.RandomState(3)
    G = 200_000  # gaps far beyond 255
    rows = []
    for r in range(8):
        cols = np.sort(rs.choice(G, 50, replace=False))
        rows.append(cols)
    indptr = np.concatenate([[0], np.cumsum([len(c) for c in rows])])
    indices = np.concatenate(rows)
    data = rs.uniform(-5, 5000, size=indices.size).astype(np.float32)
    data[::3] = np.round(np.abs(data[::3]) % 200)  # mix of uint8-friendly
    m = sp.csr_matrix((data, indices, indptr), shape=(8, G))
    got, c = _flat8_roundtrip(m)
    np.testing.assert_array_equal(got, m.toarray())
    assert (np.asarray(c.gpos) < c.gaps.shape[0]).any()  # real gap excs
    assert (np.asarray(c.vpos) < c.gaps.shape[0]).any()  # real val excs


def test_flat8_empty_rows_and_fused_scale():
    m = _random_csr(24, 150, 0.08, seed=5)
    # force some empty rows
    lil = m.tolil()
    lil[3] = 0
    lil[17] = 0
    m = lil.tocsr()
    mean = np.random.RandomState(0).normal(size=150).astype(np.float32)
    std = np.random.RandomState(1).uniform(0.5, 2, 150).astype(np.float32)
    got, _ = _flat8_roundtrip(m, scale=(mean, std))
    np.testing.assert_allclose(got, (m.toarray() - mean) / std,
                               rtol=1e-6, atol=1e-6)


def test_flat8_overflow_ladders():
    from dca_tpu.ops.densify import Flat8Overflow, flat8_payload_from_csr

    rs = np.random.RandomState(0)
    cols = np.sort(rs.choice(100_000, 64, replace=False))
    m = sp.csr_matrix(
        (np.full(64, 300.5, np.float32), cols, [0, 64]), shape=(1, 100_000))
    with pytest.raises(Flat8Overflow):
        flat8_payload_from_csr(m, [0], 128, 2, 2)  # tiny exception buckets


def test_loader_flat8_is_opt_in():
    """flat8 stays OPT-IN (no on-chip ship win measured, encoder 8x flat's
    host cost — loader._pick_mode): auto picks flat, DCA_TPU_PAYLOAD=flat8
    forces the new format."""
    from dca_tpu.data.loader import Flat8Chunk, FlatChunk, StreamingData

    B, G = 48, 400
    rs = np.random.RandomState(2)
    m = _random_csr(B, G, 0.05, seed=2)
    # heavy tail so auto prefers the flat family over padded
    extra = sp.csr_matrix(
        (np.ones(G // 2, np.float32), np.arange(G // 2), [0, G // 2]),
        shape=(1, G))
    m = sp.vstack([m[:-1], extra]).tocsr()
    sf = np.ones(B, np.float32)
    sd = StreamingData(m, m, sf, 16, device_densify=True)
    assert sd._mode_t == "flat", sd._mode_t

    sd8 = StreamingData(m, m, sf, 16, device_densify=True,
                        payload_mode="flat8")
    assert sd8._mode_t == "flat8"
    x, t, _ = sd8.materialize(np.arange(10))
    assert isinstance(t, Flat8Chunk)


def test_streaming_flat8_trainer_matches_host(monkeypatch):
    """End-to-end streaming fit through the flat8 payload path must match
    the dense host-staging trajectory."""
    import pandas as pd

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train.loop import train

    B, G = 72, 60
    rs = np.random.RandomState(9)
    counts = rs.poisson(1.2, size=(B, G)).astype(np.float32)
    counts[counts < 1] = 0
    counts[:, 0] += 1
    counts[0, :] += 1

    def fit(X, env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        ad = AnnData(
            X,
            pd.DataFrame(index=pd.Index([f"c{i}" for i in range(B)])),
            pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
        )
        ad = normalize(read_dataset(ad, check_counts=False), lazy_scale=True)
        net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8),
                                      seed=3)
        net.build()
        h = train(ad, net, epochs=2, batch_size=16, validation_split=0.25,
                  verbose=False, seed=0, compiled=False, reduce_lr=0,
                  early_stop=0, max_device_cells=32)
        for k in env:
            monkeypatch.delenv(k)
        return h.history["loss"], h.history["val_loss"]

    ref = fit(counts.copy(), {"DCA_TPU_DEVICE_DENSIFY": "0"})
    got = fit(sp.csr_matrix(counts), {"DCA_TPU_DEVICE_DENSIFY": "1",
                                      "DCA_TPU_PAYLOAD": "flat8"})
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4)
    np.testing.assert_allclose(got[1], ref[1], rtol=2e-4)
