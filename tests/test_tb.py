"""TensorBoard scalar/histogram parity (reference train.py:76-79):
``tensorboard=True`` must produce standard event files whose per-epoch
scalars a TensorBoard run can plot — VERDICT r2 item 3."""

import glob
import os

import numpy as np
import pytest

from dca_tpu.tbevents import EventWriter, read_events


def test_event_writer_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.scalar("loss", 1.5, 0)
    w.scalar("loss", 1.25, 1)
    w.scalar("lr", 1e-3, 1)
    w.histogram("weights/enc0/kernel", np.random.RandomState(0).normal(size=128), 1)
    w.close()
    events = read_events(w.path)
    scalars = {(s, t): v for s, d in events for t, v in d.items()}
    assert scalars[(0, "loss")] == pytest.approx(1.5)
    assert scalars[(1, "loss")] == pytest.approx(1.25)
    assert scalars[(1, "lr")] == pytest.approx(1e-3)
    assert scalars[(1, "weights/enc0/kernel")] == "histogram"


def test_event_file_crc_framing(tmp_path):
    """TFRecord framing must carry valid masked CRC32C checksums — a stock
    TensorBoard reader verifies them and silently drops bad records."""
    from dca_tpu.tbevents import _masked_crc
    import struct

    w = EventWriter(str(tmp_path))
    w.scalar("x", 2.0, 7)
    w.close()
    data = open(w.path, "rb").read()
    pos = 0
    n_records = 0
    while pos < len(data):
        header = data[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(header)
        payload = data[pos + 12 : pos + 12 + length]
        (pcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert pcrc == _masked_crc(payload)
        pos += 12 + length + 4
        n_records += 1
    assert n_records >= 2  # file_version + the scalar


def _tiny_adata(n=48, g=30, seed=0):
    import pandas as pd
    from dca_tpu.data.adata import AnnData
    from dca_tpu.data import read_dataset, normalize

    rs = np.random.RandomState(seed)
    counts = rs.negative_binomial(2, 0.3, size=(n, g)).astype(np.float32)
    counts[:, counts.sum(0) == 0] += 1
    ad = AnnData(
        counts,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(g)])),
    )
    return normalize(read_dataset(ad, check_counts=False))


@pytest.mark.parametrize("compiled", [False, True])
def test_train_writes_tb_scalars(tmp_path, compiled):
    """Both the Python-epoch loop and the one-XLA-program path must write
    loss/val_loss/lr scalars for every epoch run."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.loop import train

    ad = _tiny_adata()
    net = AE_types["nb-conddisp"](input_size=30, hidden_size=(8, 4, 8), seed=1)
    net.build()
    hist = train(
        ad, net, epochs=3, early_stop=0, reduce_lr=0, tensorboard=True,
        output_dir=str(tmp_path), verbose=False, compiled=compiled,
    )
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert files, "no event files written"
    events = read_events(files[0])
    by_step = {}
    for step, d in events:
        by_step.setdefault(step, {}).update(d)
    n_epochs = len(hist.history["loss"])
    assert n_epochs == 3
    for e in range(n_epochs):
        assert by_step[e]["loss"] == pytest.approx(hist.history["loss"][e],
                                                   rel=1e-5)
        assert by_step[e]["val_loss"] == pytest.approx(
            hist.history["val_loss"][e], rel=1e-5)
        assert by_step[e]["lr"] == pytest.approx(hist.history["lr"][e], rel=1e-5)
    # weight histograms: per-epoch (python loop) or final-epoch (compiled)
    hist_steps = [s for s, d in events if any(v == "histogram" for v in d.values())]
    assert (n_epochs - 1) in hist_steps


def test_debug_mode_writes_loss_term_histograms(tmp_path):
    """--debug --tensorboard adds per-epoch t1/t2 histograms (the
    reference's loss.py:96-97 debug summaries)."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.loop import train

    ad = _tiny_adata()
    net = AE_types["nb-conddisp"](input_size=30, hidden_size=(8, 4, 8),
                                  debug=True, seed=1)
    net.build()
    train(ad, net, epochs=2, early_stop=0, reduce_lr=0, tensorboard=True,
          output_dir=str(tmp_path), verbose=False, compiled=False)
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    events = read_events(files[0])
    t1_steps = {s for s, d in events if d.get("debug/t1") == "histogram"}
    t2_steps = {s for s, d in events if d.get("debug/t2") == "histogram"}
    assert {0, 1} <= t1_steps and {0, 1} <= t2_steps


def test_histogram_buckets_cover_negative_values():
    """Bucket edges must grow from max(|v|) (TF's writer semantics): an
    all-negative tensor gets a real negative bucket ladder, not one
    catch-all bucket (ADVICE r3)."""
    from dca_tpu.tbevents import _histogram_proto

    v = -np.abs(np.random.RandomState(0).normal(size=256)) - 0.5
    proto_neg = _histogram_proto(v)
    proto_pos = _histogram_proto(-v)
    # mirrored data must produce comparably sized encodings (same ladder
    # depth); the old max(v)-based ladder collapsed the negative side to a
    # single bucket, an order of magnitude fewer bytes
    assert len(proto_neg) > 0.5 * len(proto_pos), (
        len(proto_neg), len(proto_pos))


@pytest.mark.parametrize("compiled", [False, True])
def test_train_writes_grad_histograms(tmp_path, compiled):
    """write_grads=True parity (reference train.py:76-79): a --tensorboard
    fit logs gradient histograms — per epoch in the Python loop, final
    epoch in the one-XLA-program path (VERDICT r3 item 6)."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.loop import train

    ad = _tiny_adata()
    net = AE_types["zinb-conddisp"](input_size=30, hidden_size=(8, 4, 8), seed=1)
    net.build()
    train(ad, net, epochs=2, early_stop=0, reduce_lr=0, tensorboard=True,
          output_dir=str(tmp_path), verbose=False, compiled=compiled)
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    events = read_events(files[0])
    grad_steps = {s for s, d in events
                  if any(k.startswith("grads/") and v == "histogram"
                         for k, v in d.items())}
    if compiled:
        assert 1 in grad_steps  # final epoch
    else:
        assert {0, 1} <= grad_steps  # every epoch


def test_streaming_train_writes_grad_histograms(tmp_path):
    """The streaming loop logs per-epoch gradient histograms too."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.loop import train

    ad = _tiny_adata(n=64, g=20)
    net = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8), seed=1)
    net.build()
    train(ad, net, epochs=2, early_stop=0, reduce_lr=0, tensorboard=True,
          output_dir=str(tmp_path), verbose=False, max_device_cells=32,
          batch_size=16)
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    events = read_events(files[0])
    grad_steps = {s for s, d in events
                  if any(k.startswith("grads/") and v == "histogram"
                         for k, v in d.items())}
    assert {0, 1} <= grad_steps
