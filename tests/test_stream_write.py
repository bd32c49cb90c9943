"""Streaming denoise->write pipeline (models/network.write_streaming +
data/stream_write): byte parity with the in-memory predict()+write() path,
h5ad round-trip, spill cleanup, multi-block/multi-strip correctness."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from dca_tpu.data import normalize, read_dataset
from dca_tpu.data.adata import AnnData
from dca_tpu.models import AE_types

from conftest import make_adata


def _counts(n, g, seed=0):
    rs = np.random.RandomState(seed)
    mu = rs.gamma(2.0, 1.0, (1, g)) * rs.lognormal(0, 0.3, (n, 1)) * 3
    c = rs.negative_binomial(2.0, 2.0 / (2.0 + mu)).astype(np.float32)
    c[rs.uniform(size=c.shape) < 0.3] = 0
    c[0, :] += 1
    c[:, 0] += 1
    return c


def _prepped(n=90, g=25, seed=0, lazy=False, sparse=False):
    c = _counts(n, g, seed)
    X = sp.csr_matrix(c) if sparse else c
    ad = AnnData(
        X,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(g)])),
    )
    return normalize(read_dataset(ad, check_counts=False), lazy_scale=lazy)


def _trained_net(ae_type, adata, seed=0):
    net = AE_types[ae_type](input_size=adata.n_vars,
                            hidden_size=(8, 4, 8), seed=seed)
    net.build()
    return net


def _files_equal(d1, d2, names):
    for f in names:
        p1, p2 = os.path.join(d1, f), os.path.join(d2, f)
        assert os.path.exists(p1), f"{f} missing from reference dir"
        assert os.path.exists(p2), f"{f} missing from streaming dir"
        with open(p1, "rb") as a, open(p2, "rb") as b:
            assert a.read() == b.read(), f"{f} differs"


EXPECT = {
    "zinb-conddisp": ["mean.tsv", "mean_norm.tsv", "latent.tsv",
                      "reduced.tsv", "dispersion.tsv", "dropout.tsv",
                      "pi.tsv"],
    "nb-conddisp": ["mean.tsv", "mean_norm.tsv", "latent.tsv",
                    "reduced.tsv", "dispersion.tsv"],
    "nb": ["mean.tsv", "mean_norm.tsv", "latent.tsv", "reduced.tsv",
           "dispersion.tsv"],
    "zinb": ["mean.tsv", "mean_norm.tsv", "latent.tsv", "reduced.tsv",
             "dispersion.tsv", "dropout.tsv", "pi.tsv"],
}


@pytest.mark.parametrize("ae_type", sorted(EXPECT))
def test_streaming_tsv_byte_parity(ae_type, tmp_path, monkeypatch):
    """write_streaming's TSVs must be byte-identical to the in-memory
    predict(full, return_info=True) + write(full) path — including the
    NB-conddisp post-denoise dispersion quirk — with multi-strip transposed
    writes forced.  (Blocking matches the in-memory path here: different
    block sizes legitimately flip last %.6f digits via XLA matmul tiling;
    multi-block behavior is covered numerically below.)"""
    monkeypatch.setenv("DCA_TPU_WRITE_STRIP_BYTES", "2000")  # ~5 genes/strip
    ad_ref = _prepped(90, 25, seed=3)
    ad_stream = _prepped(90, 25, seed=3)

    net = _trained_net(ae_type, ad_ref)
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")

    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full")

    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True)
    _files_equal(ref_dir, stream_dir, EXPECT[ae_type])
    # side effects: latent stored, adata.X NOT overwritten by the stream
    assert "X_dca" in ad_stream.obsm
    np.testing.assert_allclose(ad_stream.obsm["X_dca"],
                               ad_ref.obsm["X_dca"], rtol=1e-6)
    assert not np.allclose(np.asarray(ad_stream.X), np.asarray(ad_ref.X))


def test_streaming_multiblock_numeric_parity(tmp_path, monkeypatch):
    """Multi-block streaming (chunk_rows << N) reassembles the same matrices
    as the single-block path: identical shape/headers/index, values equal
    to float32 forward tolerance across block boundaries."""
    monkeypatch.setenv("DCA_TPU_WRITE_STRIP_BYTES", "2000")
    ad_a = _prepped(90, 25, seed=3)
    ad_b = _prepped(90, 25, seed=3)
    net = _trained_net("zinb-conddisp", ad_a)
    one_dir, multi_dir = str(tmp_path / "one"), str(tmp_path / "multi")
    net.write_streaming(ad_a, one_dir, mode="full", return_info=True)
    net.write_streaming(ad_b, multi_dir, mode="full", return_info=True,
                        chunk_rows=32)
    for f in EXPECT["zinb-conddisp"]:
        # only mean/mean_norm carry the cell-name header (reference quirk:
        # the dispersion/dropout write calls omit rownames)
        kw = dict(sep="\t", index_col=0,
                  header=0 if f in ("mean.tsv", "mean_norm.tsv") else None)
        a = pd.read_csv(os.path.join(one_dir, f), **kw)
        b = pd.read_csv(os.path.join(multi_dir, f), **kw)
        assert a.shape == b.shape, f
        assert list(a.index) == list(b.index), f
        np.testing.assert_allclose(a.to_numpy(), b.to_numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f)


def test_streaming_tsv_parity_lazy_sparse(tmp_path):
    """Lazy-scaled sparse input (the corpus configuration: CSR + deferred
    z-scale) through the streaming writer matches the in-memory path."""
    ad_ref = _prepped(80, 20, seed=5, lazy=True, sparse=True)
    ad_stream = _prepped(80, 20, seed=5, lazy=True, sparse=True)
    net = _trained_net("zinb-conddisp", ad_ref)

    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full")
    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True)
    _files_equal(ref_dir, stream_dir, EXPECT["zinb-conddisp"])


def test_streaming_shared_heads(tmp_path):
    """*-shared archs route their (N, 1) disp/pi through the small-output
    accumulator and still match the in-memory writer."""
    ad_ref = _prepped(60, 18, seed=7)
    ad_stream = _prepped(60, 18, seed=7)
    net = _trained_net("zinb-shared", ad_ref)
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full")
    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True)
    _files_equal(ref_dir, stream_dir,
                 ["mean.tsv", "mean_norm.tsv", "latent.tsv", "reduced.tsv"])


def test_streaming_elempi_sharedpi(tmp_path):
    """zinb-elempi with sharedpi=True has a (N, 1) pi head: it must route
    through the small-output accumulator (not a zero-append transposed
    writer, which used to TypeError at close) and match the in-memory
    writer byte for byte."""
    ad_ref = _prepped(60, 18, seed=21)
    ad_stream = _prepped(60, 18, seed=21)
    net = AE_types["zinb-elempi"](input_size=18, hidden_size=(8, 4, 8),
                                  seed=0, sharedpi=True)
    net.build()
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full")
    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True)
    _files_equal(ref_dir, stream_dir,
                 ["mean.tsv", "mean_norm.tsv", "latent.tsv", "reduced.tsv",
                  "dispersion.tsv", "dropout.tsv", "pi.tsv"])


def test_streaming_width1_latent(tmp_path):
    """A size-1 bottleneck produces (N, 1) latent blocks; routing is by
    key (arch head widths), so they must still reach latent.tsv/reduced.tsv
    and the h5ad X_dca layer instead of being diverted as a 'shared' head."""
    ad_ref = _prepped(50, 15, seed=23)
    ad_stream = _prepped(50, 15, seed=23)
    net = AE_types["zinb-conddisp"](input_size=15, hidden_size=(8, 1, 8),
                                    seed=0)
    net.build()
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full")
    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True)
    _files_equal(ref_dir, stream_dir, EXPECT["zinb-conddisp"])
    assert os.path.getsize(os.path.join(stream_dir, "latent.tsv")) > 0

    ad_h5 = _prepped(50, 15, seed=23)
    net.write_streaming(ad_h5, str(tmp_path / "h5"), mode="full",
                        return_info=True, output_format="h5ad")
    from dca_tpu.data.adata import read_h5ad

    back = read_h5ad(str(tmp_path / "h5" / "denoised.h5ad"))
    assert back.obsm["X_dca"].shape == (50, 1)
    np.testing.assert_allclose(back.obsm["X_dca"], ad_ref.obsm["X_dca"],
                               rtol=1e-6)


def test_streaming_denoise_subset_post_disp(tmp_path):
    """nb-conddisp with output_size < input_size (--denoisesubset): the
    post-denoise dispersion quirk must feed the ORIGINAL input block (the
    in-memory path's adata.X, untouched on subsets) — not the narrow
    denoised block, which used to crash the re-forward — and match the
    in-memory writer."""
    g, k = 20, 7
    ad_ref = _prepped(60, g, seed=25)
    ad_stream = _prepped(60, g, seed=25)
    net = AE_types["nb-conddisp"](input_size=g, output_size=k,
                                  hidden_size=(8, 4, 8), seed=0)
    net.build()
    sub_cols = ad_ref.var_names.values[:k]
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="full", return_info=True)
    net.write(ad_ref, ref_dir, mode="full", colnames=sub_cols)
    net.write_streaming(ad_stream, stream_dir, mode="full",
                        return_info=True, colnames=sub_cols)
    _files_equal(ref_dir, stream_dir, EXPECT["nb-conddisp"])


def test_streaming_latent_mode(tmp_path):
    ad_ref = _prepped(50, 15, seed=9)
    ad_stream = _prepped(50, 15, seed=9)
    net = _trained_net("zinb-conddisp", ad_ref)
    ref_dir, stream_dir = str(tmp_path / "ref"), str(tmp_path / "stream")
    net.predict(ad_ref, mode="latent")
    net.write(ad_ref, ref_dir, mode="latent")
    net.write_streaming(ad_stream, stream_dir, mode="latent")
    _files_equal(ref_dir, stream_dir, ["latent.tsv", "reduced.tsv"])
    assert not os.path.exists(os.path.join(stream_dir, "mean.tsv"))


def test_streaming_h5ad_roundtrip(tmp_path):
    """output_format='h5ad' writes a denoised.h5ad whose X equals the
    in-memory denoised matrix and whose layers carry the obsm/var
    side-effect contract; readable by data.adata.read_h5ad."""
    from dca_tpu.data.adata import read_h5ad

    ad_ref = _prepped(70, 22, seed=11)
    ad_stream = _prepped(70, 22, seed=11)
    net = _trained_net("zinb-conddisp", ad_ref)
    net.predict(ad_ref, mode="full", return_info=True)

    net.write_streaming(ad_stream, str(tmp_path), mode="full",
                        return_info=True, output_format="h5ad")
    path = os.path.join(str(tmp_path), "denoised.h5ad")
    assert os.path.exists(path)
    back = read_h5ad(path)
    np.testing.assert_allclose(np.asarray(back.X), np.asarray(ad_ref.X),
                               rtol=1e-6)
    np.testing.assert_allclose(back.obsm["X_dca"], ad_ref.obsm["X_dca"],
                               rtol=1e-6)
    np.testing.assert_allclose(back.obsm["X_dca_dropout"],
                               ad_ref.obsm["X_dca_dropout"], rtol=1e-6)
    np.testing.assert_allclose(back.obsm["X_dca_mean_norm"],
                               ad_ref.obsm["X_dca_mean_norm"], rtol=1e-6)
    assert list(back.obs_names) == list(ad_stream.obs_names)
    assert list(back.var_names) == list(ad_stream.var_names)

    with pytest.raises(ValueError, match="h5ad"):
        net.write_streaming(ad_stream, str(tmp_path), mode="latent",
                            output_format="h5ad")


def test_streaming_no_spill_left_behind(tmp_path):
    ad = _prepped(40, 12, seed=13)
    net = _trained_net("nb-conddisp", ad)
    net.write_streaming(ad, str(tmp_path), mode="full", return_info=True,
                        chunk_rows=16)
    leftovers = (glob.glob(os.path.join(str(tmp_path), "*.spill"))
                 + glob.glob(os.path.join(str(tmp_path), "*.tmp")))
    assert leftovers == []


def test_forward_pipelined_matches_serial():
    """The pipelined block iterator returns the same outputs as the serial
    path (DCA_TPU_PREFETCH=0) for dense and CSR inputs."""
    ad = _prepped(75, 16, seed=15)
    net = _trained_net("zinb-conddisp", ad)
    x = np.asarray(ad.X)
    out_p = net.forward(x, chunk_rows=16)
    os.environ["DCA_TPU_PREFETCH"] = "0"
    try:
        out_s = net.forward(x, chunk_rows=16)
    finally:
        del os.environ["DCA_TPU_PREFETCH"]
    for k, v in out_p.items():
        if v is not None:
            np.testing.assert_array_equal(v, np.asarray(out_s[k]), err_msg=k)


def test_cli_streaming_write_matches_in_memory(tmp_path, monkeypatch):
    """End-to-end CLI parity: a run forced through the streaming write path
    (DCA_TPU_HOST_DENSE_BYTES=1) produces byte-identical TSVs to the
    default in-memory path."""
    import subprocess
    import sys

    c = _counts(64, 14, seed=17)
    tsv = str(tmp_path / "counts.tsv")
    pd.DataFrame(c.T.astype(int),
                 index=[f"g{i}" for i in range(14)],
                 columns=[f"c{i}" for i in range(64)]).to_csv(tsv, sep="\t")

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    env.pop("XLA_FLAGS", None)

    def run(outdir, **extra_env):
        e = dict(env, **extra_env)
        subprocess.run(
            [sys.executable, "-m", "dca_tpu", tsv, outdir, "-e", "2",
             "-s", "8,4,8", "--type", "nb-conddisp"],
            env=e, check=True, capture_output=True)

    run(str(tmp_path / "mem"))
    run(str(tmp_path / "stream"), DCA_TPU_HOST_DENSE_BYTES="1")
    _files_equal(str(tmp_path / "mem"), str(tmp_path / "stream"),
                 EXPECT["nb-conddisp"])


def test_cli_outputformat_h5ad(tmp_path):
    """--outputformat h5ad writes denoised.h5ad whose X matches the TSV
    run's mean matrix (same seed/training)."""
    import subprocess
    import sys

    from dca_tpu.data.adata import read_h5ad

    c = _counts(48, 12, seed=19)
    tsv = str(tmp_path / "counts.tsv")
    pd.DataFrame(c.T.astype(int),
                 index=[f"g{i}" for i in range(12)],
                 columns=[f"c{i}" for i in range(48)]).to_csv(tsv, sep="\t")

    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    env.pop("XLA_FLAGS", None)

    def run(outdir, *extra):
        subprocess.run(
            [sys.executable, "-m", "dca_tpu", tsv, outdir, "-e", "2",
             "-s", "8,4,8", "--type", "zinb-conddisp", *extra],
            env=env, check=True, capture_output=True)

    run(str(tmp_path / "tsv"))
    run(str(tmp_path / "h5"), "--outputformat", "h5ad")
    back = read_h5ad(str(tmp_path / "h5" / "denoised.h5ad"))
    mean = pd.read_csv(os.path.join(str(tmp_path / "tsv"), "mean.tsv"),
                       sep="\t", index_col=0).to_numpy().T  # gene x cell -> cell x gene
    np.testing.assert_allclose(np.asarray(back.X), mean, rtol=1e-4,
                               atol=2e-6)
    assert "X_dca" in back.obsm and "X_dca_dropout" in back.obsm
