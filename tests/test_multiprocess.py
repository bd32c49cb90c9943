"""REAL multi-process multihost test: two OS processes, 4 virtual CPU
devices each, joined by jax.distributed into one 8-device mesh.

Exercises the actual cross-process code paths — process_row_range sharding,
make_array_from_process_local_data staging (via the shared
shard_train_data entry point), Gloo-backed collectives, gather_to_host,
and the sharded TSV writers — and pins the distributed one-step loss to the
single-process value."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_loss():
    """Single-process one-step loss over the same global batch/seeds."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.optim import get_optimizer

    N, G = 64, 16
    rs = np.random.RandomState(7)
    X = rs.normal(size=(N, G)).astype(np.float32)
    T = rs.poisson(3.0, size=(N, G)).astype(np.float32)
    SF = rs.uniform(0.5, 2.0, size=(N,)).astype(np.float32)
    net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=3)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)
    loss, _ = net.loss_fn(net.params, net.state, jnp.asarray(X),
                          jnp.asarray(SF), jnp.asarray(T), True,
                          jax.random.PRNGKey(0))
    return float(loss)


@pytest.mark.slow
def test_two_process_mesh_end_to_end(tmp_path):
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(HERE)}
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} DONE" in out, out

    # both ranks computed the same global loss...
    losses = []
    for out in outs:
        for line in out.splitlines():
            if " LOSS " in line:
                losses.append(float(line.split()[-1]))
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    # ...equal to the single-process loss over the same global batch
    # (training-mode forward, no dropout configured, so deterministic)
    ref = _reference_loss()
    assert abs(losses[0] - ref) / abs(ref) < 1e-4, (losses[0], ref)

    # rank 0 concatenated the sharded TSV
    assert "RANK0 CONCAT OK" in outs[0]
    assert os.path.exists(os.path.join(str(tmp_path), "mh.tsv"))
    assert not os.path.exists(os.path.join(str(tmp_path), "mh.tsv.part0"))

    # full public train() ran over the process group with identical
    # trajectories on both ranks, matching the single-process run exactly
    def grab(prefix, out):
        for line in out.splitlines():
            if f" {prefix} " in line:
                return line.split()[-1]
        raise AssertionError(f"{prefix} not found in:\n{out}")

    h0 = [float(v) for v in grab("HIST", outs[0]).split(",")]
    h1 = [float(v) for v in grab("HIST", outs[1]).split(",")]
    np.testing.assert_allclose(h0, h1, rtol=1e-6)
    ref = _reference_train_hist()
    np.testing.assert_allclose(h0, ref, rtol=2e-3)
    d0, d1 = float(grab("DENOISED_SUM", outs[0])), float(grab("DENOISED_SUM", outs[1]))
    assert abs(d0 - d1) / abs(d0) < 1e-6

    # streaming trainer over the process group: rank-identical trajectories
    # matching the single-process streaming run
    s0 = [float(v) for v in grab("SHIST", outs[0]).split(",")]
    s1 = [float(v) for v in grab("SHIST", outs[1]).split(",")]
    np.testing.assert_allclose(s0, s1, rtol=1e-6)
    sref = _reference_streaming_hist()
    np.testing.assert_allclose(s0, sref, rtol=2e-3)

    # phase 4: SPARSE payload staging over the process group (on-device
    # densify; padded payloads row-sharded via host_local_to_global) —
    # rank-identical and matching the single-process sparse-payload run
    for out in outs:
        assert "ALLDONE" in out, out
    p0 = [float(v) for v in grab("PHIST", outs[0]).split(",")]
    p1 = [float(v) for v in grab("PHIST", outs[1]).split(",")]
    np.testing.assert_allclose(p0, p1, rtol=1e-6)
    pref = _reference_sparse_payload_hist()
    np.testing.assert_allclose(p0, pref, rtol=2e-3)

    # phase 5: indivisible row counts (auto-padding)
    _assert_phase5(outs)

    # phase 6: streaming denoise->write over the process group (rank-0
    # writers, collective block gathers incl. the NB-conddisp post-denoise
    # dispersion re-forward) — files numerically match a single-process
    # write_streaming on the same data/seed
    _assert_phase6(outs, str(tmp_path))


def _reference_streaming_hist():
    """Phase-3 oracle: single-process STREAMING run, same data/config."""
    import pandas as pd

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    N, G = 64, 16
    rs2 = np.random.RandomState(11)
    counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
    counts[:, 0] += 1
    counts[0, :] += 1
    ad = AnnData(
        counts,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False))
    net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
    net.build()
    hist = train(ad, net, epochs=2, batch_size=16, validation_split=0.25,
                 verbose=False, seed=0, compiled=False, reduce_lr=0,
                 early_stop=0, max_device_cells=32)
    return hist.history["loss"]


def _reference_sparse_payload_hist():
    """Phase-4 oracle: single-process streaming run on the same SPARSE data
    with on-device densification (payload staging)."""
    import pandas as pd
    import scipy.sparse as sp

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    N, G = 64, 16
    rs2 = np.random.RandomState(11)
    counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
    counts[:, 0] += 1
    counts[0, :] += 1
    counts[counts < 2] = 0.0
    counts[:, 0] += 1
    counts[0, :] += 1
    ad = AnnData(
        sp.csr_matrix(counts),
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False), lazy_scale=True)
    net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
    net.build()
    os.environ["DCA_TPU_DEVICE_DENSIFY"] = "1"
    try:
        hist = train(ad, net, epochs=2, batch_size=16, validation_split=0.25,
                     verbose=False, seed=0, compiled=False, reduce_lr=0,
                     early_stop=0, max_device_cells=32)
    finally:
        del os.environ["DCA_TPU_DEVICE_DENSIFY"]
    return hist.history["loss"]


def _reference_train_hist():
    """Same data/config as the worker's phase 2, single process, no mesh."""
    import pandas as pd

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    N, G = 64, 16
    rs2 = np.random.RandomState(11)
    counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
    counts[:, 0] += 1
    counts[0, :] += 1
    ad = AnnData(
        counts,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False))
    net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
    net.build()
    hist = train(ad, net, epochs=3, batch_size=16, validation_split=0.25,
                 verbose=False, seed=0, compiled=False, reduce_lr=0,
                 early_stop=0)
    return hist.history["loss"]


def _phase5_oracles():
    """Single-process (no-mesh) oracles for the INDIVISIBLE-size phase:
    61 cells / validation_split=0.3 — dense, streaming, sparse-payload."""
    import pandas as pd
    import scipy.sparse as sp

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    N, G = 64, 16
    rs2 = np.random.RandomState(11)
    counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
    counts[:, 0] += 1
    counts[0, :] += 1
    counts5 = counts[:61].copy()
    counts5[:, 0] += 1
    counts5[0, :] += 1

    def adata5(X, **norm):
        return normalize(read_dataset(AnnData(
            X,
            pd.DataFrame(index=pd.Index([f"c{i}" for i in range(61)])),
            pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
        ), check_counts=False), **norm)

    def fit(ad, **kw):
        net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8),
                                      seed=4)
        net.build()
        h = train(ad, net, epochs=2, batch_size=16, validation_split=0.3,
                  verbose=False, seed=0, compiled=False, reduce_lr=0,
                  early_stop=0, **kw)
        return h.history["loss"], h.history["val_loss"]

    dense = fit(adata5(counts5.copy()))
    stream = fit(adata5(counts5.copy()), max_device_cells=32)

    sparse5 = counts5.copy()
    sparse5[sparse5 < 2] = 0.0
    sparse5[:, 0] += 1
    sparse5[0, :] += 1
    os.environ["DCA_TPU_DEVICE_DENSIFY"] = "1"
    try:
        payload = fit(adata5(sp.csr_matrix(sparse5), lazy_scale=True),
                      max_device_cells=32)
    finally:
        del os.environ["DCA_TPU_DEVICE_DENSIFY"]
    return dense, stream, payload


def _assert_phase6(outs, outdir):
    import pandas as pd

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    for rank, out in enumerate(outs):
        assert f"RANK{rank} PHASE6DONE" in out, out
    stream_dir = os.path.join(outdir, "stream6")
    for f in ("mean.tsv", "mean_norm.tsv", "latent.tsv", "reduced.tsv",
              "dispersion.tsv"):
        assert os.path.exists(os.path.join(stream_dir, f)), f

    # single-process oracle: identical data/seed/protocol, streamed write
    N, G = 64, 16
    rs2 = np.random.RandomState(11)
    counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
    counts[:, 0] += 1
    counts[0, :] += 1
    counts5 = counts[:61].copy()
    counts5[:, 0] += 1
    counts5[0, :] += 1
    ad = normalize(read_dataset(AnnData(
        counts5,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(61)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(16)])),
    ), check_counts=False))
    net = AE_types["nb-conddisp"](input_size=16, hidden_size=(8, 4, 8),
                                  seed=4)
    net.build()
    train(ad, net, epochs=1, batch_size=16, validation_split=0.0,
          verbose=False, seed=0, compiled=False, reduce_lr=0, early_stop=0)
    ref_dir = os.path.join(outdir, "stream6_ref")
    net.write_streaming(ad, ref_dir, mode="full", return_info=True)

    for f, header in (("mean.tsv", 0), ("mean_norm.tsv", 0),
                      ("latent.tsv", None), ("dispersion.tsv", None)):
        a = pd.read_csv(os.path.join(ref_dir, f), sep="\t", index_col=0,
                        header=header)
        b = pd.read_csv(os.path.join(stream_dir, f), sep="\t", index_col=0,
                        header=header)
        assert a.shape == b.shape, f
        np.testing.assert_allclose(b.to_numpy(), a.to_numpy(), rtol=2e-3,
                                   atol=1e-4, err_msg=f)


def _assert_phase5(outs):
    """Phase-5 assertions (called from the single end-to-end test — one
    worker pair runs all phases): train/val/part row counts that do NOT
    divide the 8-wide data axis are auto-padded and the trajectories match
    the single-process run (VERDICT r3 item 5)."""
    for rank, out in enumerate(outs):
        assert f"RANK{rank} PHASE5DONE" in out, out

    def grab(prefix, out):
        for line in out.splitlines():
            if f" {prefix} " in line:
                return line.split()[-1]
        raise AssertionError(f"{prefix} not found in:\n{out}")

    def parse(s):
        loss, val = s.split("|")
        return ([float(v) for v in loss.split(",")],
                [float(v) for v in val.split(",")])

    dense_ref, stream_ref, payload_ref = _phase5_oracles()
    # F5 (fused kernels forced, weighted-val padding) compares against the
    # same streaming oracle: the weighted fused kernels are equivalence-
    # tested at ~1e-4 (tests/test_pallas.py), inside the 2e-3 tolerance
    for tag, (ref_loss, ref_val) in [("H5", dense_ref), ("S5", stream_ref),
                                     ("P5", payload_ref), ("F5", stream_ref)]:
        l0, v0 = parse(grab(tag, outs[0]))
        l1, v1 = parse(grab(tag, outs[1]))
        np.testing.assert_allclose(l0, l1, rtol=1e-6, err_msg=tag)
        np.testing.assert_allclose(v0, v1, rtol=1e-6, err_msg=tag)
        np.testing.assert_allclose(l0, ref_loss, rtol=2e-3, err_msg=tag)
        np.testing.assert_allclose(v0, ref_val, rtol=2e-3, err_msg=tag)
