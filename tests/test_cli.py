"""CLI end-to-end: the ``dca <matrix> <outdir>`` contract (reference
__main__.py + train.py:103-191) — gene×cell TSV in, full TSV output set out."""

import os

import numpy as np
import pandas as pd
import pytest

from dca_tpu.__main__ import main, parse_args

from conftest import make_counts


@pytest.fixture()
def input_tsv(tmp_path):
    # CLI convention: gene x cell (genes are rows), __main__.py:21-27
    counts = make_counts(60, 20, seed=11)  # cells x genes
    df = pd.DataFrame(
        counts.T.astype(int),
        index=[f"gene{i}" for i in range(20)],
        columns=[f"cell{i}" for i in range(60)],
    )
    f = str(tmp_path / "counts.tsv")
    df.to_csv(f, sep="\t")
    return f


def test_defaults_parse():
    args = parse_args(["in.tsv", "out"])
    assert args.type == "nb-conddisp"
    assert args.batchsize == 32
    assert args.epochs == 300
    assert args.hiddensize == "64,32,64"
    assert args.sizefactors and args.batchnorm and args.norminput and args.loginput
    assert args.gradclip == 5.0


def test_cli_end_to_end(input_tsv, tmp_path):
    outdir = str(tmp_path / "out")
    main([input_tsv, outdir, "-e", "2", "-s", "16,8,16", "--type", "zinb-conddisp"])

    for fname in ("mean.tsv", "latent.tsv", "dispersion.tsv", "dropout.tsv",
                  "pi.tsv", "reduced.tsv", "mean_norm.tsv", "model.pickle"):
        assert os.path.exists(os.path.join(outdir, fname)), fname

    # mean.tsv is transposed to gene x cell (network.py:223-225)
    mean = pd.read_csv(os.path.join(outdir, "mean.tsv"), sep="\t", index_col=0)
    assert mean.shape == (20, 60)
    assert mean.index[0].startswith("gene")
    assert np.isfinite(mean.to_numpy()).all()

    # latent.tsv has rownames but NO header (colnames=None in the writer)
    latent = pd.read_csv(os.path.join(outdir, "latent.tsv"), sep="\t", index_col=0,
                         header=None)
    assert latent.shape == (60, 8)

    # mean_norm.tsv is the UNSCALED mean of the model input captured at
    # predict time (reference network.py:150-156): mean_norm * size_factor
    # == mean per cell, even though write() runs after denoise replaced X
    mean_norm = pd.read_csv(os.path.join(outdir, "mean_norm.tsv"), sep="\t",
                            index_col=0)
    ratio = mean.to_numpy() / mean_norm.to_numpy()  # gene x cell: per-column sf
    counts = pd.read_csv(input_tsv, sep="\t", index_col=0).to_numpy()  # gene x cell
    n_counts = counts.sum(axis=0)
    sf = n_counts / np.median(n_counts)
    np.testing.assert_allclose(
        ratio, np.broadcast_to(sf[None, :], ratio.shape), rtol=1e-3
    )
    assert sf.std() > 1e-3  # size factors genuinely vary


def test_cli_nb_type(input_tsv, tmp_path):
    outdir = str(tmp_path / "out_nb")
    main([input_tsv, outdir, "-e", "1", "-s", "8,4,8", "--type", "nb"])
    # dispersion.tsv: gene rownames, no header (transpose swaps names away)
    disp = pd.read_csv(os.path.join(outdir, "dispersion.tsv"), sep="\t", index_col=0,
                       header=None)
    assert disp.shape[0] == 20  # gene-wise constant dispersion, transposed


def test_cli_testsplit(input_tsv, tmp_path, monkeypatch):
    """--testsplit must actually hold out a 10% test fold: training sees
    only the 'train' rows of obs['dca_split'] (reference io.py:74-82)."""
    import dca_tpu.train.loop as loop

    seen = {}
    real_train = loop.train

    def spy(adata, *a, **k):
        seen["n_train_rows"] = adata.n_obs
        return real_train(adata, *a, **k)

    monkeypatch.setattr(loop, "train", spy)
    outdir = str(tmp_path / "out_split")
    main([input_tsv, outdir, "-e", "1", "-s", "8,4,8", "--testsplit"])
    assert os.path.exists(os.path.join(outdir, "mean.tsv"))
    # 60 cells -> 54 train / 6 test (train_test_split test_size=0.1)
    assert seen["n_train_rows"] == 54


def test_cli_denoisesubset(input_tsv, tmp_path):
    genefile = str(tmp_path / "genes.txt")
    with open(genefile, "w") as f:
        f.write("\n".join(f"gene{i}" for i in range(5)))
    outdir = str(tmp_path / "out_subset")
    main([input_tsv, outdir, "-e", "1", "-s", "8,4,8", "--denoisesubset", genefile])
    mean = pd.read_csv(os.path.join(outdir, "mean.tsv"), sep="\t", index_col=0)
    assert mean.shape[0] == 5  # only the subset genes, gene x cell


def test_cli_hyper_path(input_tsv, tmp_path):
    """--hyper runs the TPE search and writes trials/best artifacts
    (reference train.py:120-122 -> hyper.py)."""
    outdir = str(tmp_path / "out_hyper")
    main([input_tsv, outdir, "--hyper", "--hypern", "2", "--hyperepoch", "1"])
    assert os.path.exists(os.path.join(outdir, "hyperopt_results", "best.json"))
    assert os.path.exists(os.path.join(outdir, "hyperopt_results", "trials.pickle"))


def test_cli_threads_reaches_native(input_tsv, tmp_path, monkeypatch):
    """--threads must cap the native OpenMP pool (reference caps TF's thread
    pools via the same flag, train.py:41-48) — regression for the flag
    silently never reaching train()."""
    from dca_tpu import native

    calls = []
    monkeypatch.setattr(native, "set_threads", lambda n: calls.append(n))
    main([input_tsv, str(tmp_path / "out_t"), "-e", "1", "-s", "8,4,8",
          "--threads", "2"])
    assert calls == [2]


def test_cli_denoisesubset_zinb_constant_disp(input_tsv, tmp_path):
    """--denoisesubset with --type zinb: the constant-dispersion writer must
    forward the subset column names (the reference drops them and crashes its
    own subset path, network.py:541)."""
    genefile = str(tmp_path / "genes.txt")
    with open(genefile, "w") as f:
        f.write("\n".join(f"gene{i}" for i in range(0, 10)))
    outdir = str(tmp_path / "out_sub")
    main([input_tsv, outdir, "-e", "1", "-s", "8,4,8", "--type", "zinb",
          "--denoisesubset", genefile])
    mean = pd.read_csv(os.path.join(outdir, "mean.tsv"), sep="\t", index_col=0)
    assert mean.shape == (10, 60)  # gene x cell, subset genes only
    disp = pd.read_csv(os.path.join(outdir, "dispersion.tsv"), sep="\t", index_col=0)
    assert np.isfinite(mean.values).all() and np.isfinite(disp.values).all()
