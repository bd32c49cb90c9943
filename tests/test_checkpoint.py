"""Checkpoint/resume tests (SURVEY.md §5.4 — capability the reference lacks)."""

import os

import numpy as np
import pytest

from dca_tpu.data import read_dataset, normalize
from dca_tpu.models import AE_types
from dca_tpu.train import train
from dca_tpu.train.checkpoint import TrainCheckpoint

from conftest import make_adata


@pytest.fixture(scope="module")
def prepped():
    return normalize(read_dataset(make_adata(100, 20, seed=20)))


def _net(seed=3):
    n = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8), seed=seed)
    n.build()
    return n


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    ckpt = TrainCheckpoint(str(tmp_path))
    tree = {
        "params": {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 3))}},
        "state": {},
        "opt_state": {"m": jnp.zeros(4)},
    }
    ckpt.save(5, tree["params"], tree["state"], tree["opt_state"], lr=0.01,
              callback_state={"es_wait": 2}, seed=7)
    assert ckpt.latest_step() == 5
    # restore into a template with DIFFERENT values: a restore() that merely
    # echoes the template back must fail here
    template = {
        "params": {"a": jnp.zeros(4), "b": {"c": jnp.zeros((2, 3))}},
        "state": {},
        "opt_state": {"m": jnp.full(4, -1.0)},
    }
    restored, meta = ckpt.restore(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["a"]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]["c"]),
                                  np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(restored["opt_state"]["m"]),
                                  np.zeros(4))
    assert meta["lr"] == 0.01
    assert meta["callback_state"]["es_wait"] == 2


def test_checkpoint_gc(tmp_path):
    import jax.numpy as jnp

    ckpt = TrainCheckpoint(str(tmp_path))
    tree = {"params": {"a": jnp.zeros(2)}, "state": {}, "opt_state": {}}
    for s in range(5):
        ckpt.save(s, tree["params"], tree["state"], tree["opt_state"], lr=0.1)
    assert ckpt._steps() == [3, 4]  # keeps last 2


def test_train_resume_continues(tmp_path, prepped):
    """train 6 epochs with checkpoints == train 3, crash, resume 3 more."""
    out_a = str(tmp_path / "a")
    net_a = _net()
    h_a = train(prepped, net_a, epochs=6, verbose=False, seed=9,
                output_dir=out_a, checkpoint_every=1, reduce_lr=0, early_stop=0)

    out_b = str(tmp_path / "b")
    net_b = _net()
    train(prepped, net_b, epochs=3, verbose=False, seed=9,
          output_dir=out_b, checkpoint_every=1, reduce_lr=0, early_stop=0)
    net_b2 = _net()  # fresh build; weights come from the checkpoint
    h_b = train(prepped, net_b2, epochs=6, verbose=False, seed=9,
                output_dir=out_b, checkpoint_every=1, resume=True,
                reduce_lr=0, early_stop=0)

    # resumed run covers epochs 4-6 and its losses match the uninterrupted run
    assert len(h_b.history["loss"]) == 3
    np.testing.assert_allclose(
        h_b.history["loss"], h_a.history["loss"][3:], rtol=1e-4
    )


def test_checkpoint_dir_created(tmp_path, prepped):
    out = str(tmp_path / "ck")
    net = _net()
    train(prepped, net, epochs=2, verbose=False, seed=0,
          output_dir=out, checkpoint_every=2, reduce_lr=0, early_stop=0)
    assert os.path.isdir(os.path.join(out, "checkpoints"))
    assert TrainCheckpoint(os.path.join(out, "checkpoints")).latest_step() is not None


def test_restore_falls_back_on_torn_checkpoint(tmp_path):
    """A crash between the json sidecar and the npz (or a deleted sidecar)
    must not break resume: restore() falls back to the previous intact
    step."""
    import os

    import jax.numpy as jnp

    from dca_tpu.train.checkpoint import TrainCheckpoint

    tree = {"params": {"w": jnp.arange(3.0)}, "state": {}, "opt_state": {}}
    ck = TrainCheckpoint(str(tmp_path))
    ck.save(0, tree["params"], tree["state"], tree["opt_state"], lr=1e-3)
    ck.save(1, {"w": jnp.arange(3.0) + 10}, {}, {}, lr=1e-4)
    # tear step 1: sidecar gone
    os.remove(str(tmp_path / "ckpt_1.json"))
    got, meta = ck.restore(tree)
    assert meta["step"] == 0 and meta["lr"] == 1e-3
    assert float(got["params"]["w"][2]) == 2.0
