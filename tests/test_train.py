"""Training loop tests: loss decreases, callback behaviors, history contract
(reference train.py:35-100 semantics)."""

import numpy as np
import pytest

from dca_tpu.data import read_dataset, normalize
from dca_tpu.models import AE_types
from dca_tpu.train import train

from conftest import make_adata


@pytest.fixture(scope="module")
def prepped():
    ad = make_adata(150, 30, seed=7)
    return normalize(read_dataset(ad))


def _net(ae_type="nb-conddisp", **kw):
    n = AE_types[ae_type](input_size=30, hidden_size=(16, 8, 16), **kw)
    n.build()
    return n


def test_loss_decreases(prepped):
    net = _net()
    hist = train(prepped, net, epochs=20, verbose=False, seed=0)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0]
    assert "val_loss" in hist.history
    assert len(hist.history["loss"]) <= 20


def test_zinb_trains(prepped):
    net = _net("zinb-conddisp", ridge=0.1)
    hist = train(prepped, net, epochs=10, verbose=False, seed=0)
    assert hist.history["loss"][-1] < hist.history["loss"][0]
    assert np.isfinite(hist.history["loss"]).all()


def test_early_stopping():
    ad = make_adata(100, 20, seed=8)
    prepped = normalize(read_dataset(ad))
    net = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8))
    net.build()
    # lr=0 -> no improvement ever -> stops after early_stop epochs (+1 baseline)
    hist = train(
        prepped, net, epochs=50, early_stop=3, reduce_lr=0, learning_rate=0.0,
        verbose=False, seed=0,
    )
    assert len(hist.history["loss"]) == 4  # 1 baseline + 3 patience


def test_reduce_lr_on_plateau():
    ad = make_adata(100, 20, seed=9)
    prepped = normalize(read_dataset(ad))
    net = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8))
    net.build()
    hist = train(
        prepped, net, epochs=10, early_stop=0, reduce_lr=2, learning_rate=1e-9,
        verbose=False, seed=0,
    )
    lrs = hist.history["lr"]
    assert lrs[-1] < lrs[0]  # plateau triggered a reduction


def test_save_weights(tmp_path, prepped):
    net = _net()
    train(
        prepped, net, epochs=2, verbose=False, save_weights=True,
        output_dir=str(tmp_path), seed=0,
    )
    assert (tmp_path / "weights.hdf5").exists()


def test_batch_remainder_handling(prepped):
    """150 cells, val split 0.1 -> 135 train = 4*32 + 7 remainder."""
    net = _net()
    hist = train(prepped, net, epochs=2, batch_size=32, verbose=False, seed=0)
    assert np.isfinite(hist.history["loss"]).all()


def test_use_raw_as_output_false(prepped):
    """use_raw_as_output=False targets the NORMALIZED X, not raw counts —
    the loss trajectory must actually differ from the default."""
    net = _net("poisson")
    hist = train(prepped, net, epochs=2, use_raw_as_output=False, verbose=False,
                 seed=0)
    assert np.isfinite(hist.history["loss"]).all()
    net2 = _net("poisson")
    hist2 = train(prepped, net2, epochs=2, use_raw_as_output=True,
                  verbose=False, seed=0)
    assert not np.allclose(hist.history["loss"], hist2.history["loss"])


def test_output_subset(prepped):
    genes = list(prepped.var_names[:5])
    net = AE_types["nb-conddisp"](input_size=30, output_size=5, hidden_size=(8, 4, 8))
    net.build()
    hist = train(prepped, net, epochs=2, output_subset=genes, verbose=False, seed=0)
    assert np.isfinite(hist.history["loss"]).all()


def test_deterministic_with_seed(prepped):
    net1 = _net(seed=5)
    h1 = train(prepped, net1, epochs=3, verbose=False, seed=11)
    net2 = _net(seed=5)
    h2 = train(prepped, net2, epochs=3, verbose=False, seed=11)
    np.testing.assert_allclose(h1.history["loss"], h2.history["loss"], rtol=1e-5)


def test_optimizer_variants(prepped):
    for name in ("sgd", "adam", "rmsprop"):
        net = _net()
        hist = train(
            prepped, net, epochs=2, optimizer=name, verbose=False, seed=0
        )
        assert np.isfinite(hist.history["loss"]).all(), name


def test_debug_sanitizer_detects_nonfinite(prepped):
    """--debug: checkify asserts on y_pred/t1/t2 (reference loss.py:90-97
    verify_tensor_all_finite) abort training with the tensor's name."""
    import jax.numpy as jnp
    from jax.experimental import checkify

    net = _net("zinb-conddisp", debug=True)
    # poison the mean head: exp(NaN) -> NaN y_pred on the first step
    bias = net.params["heads"]["mean"]["bias"]
    net.params["heads"]["mean"]["bias"] = bias.at[0].set(jnp.nan)
    with pytest.raises(checkify.JaxRuntimeError, match="y_pred"):
        train(prepped, net, epochs=1, verbose=False, seed=0)


def test_debug_sanitizer_clean_run_passes(prepped):
    """debug=True on healthy data trains normally (checks all pass)."""
    net = _net("nb-conddisp", debug=True)
    hist = train(prepped, net, epochs=2, verbose=False, seed=0)
    assert np.isfinite(hist.history["loss"]).all()


def test_no_debug_no_raise_on_nonfinite(prepped):
    """Without --debug a poisoned model must not abort (reference parity:
    asserts exist only in debug mode)."""
    import jax.numpy as jnp

    net = _net("zinb-conddisp", debug=False)
    bias = net.params["heads"]["mean"]["bias"]
    net.params["heads"]["mean"]["bias"] = bias.at[0].set(jnp.nan)
    hist = train(prepped, net, epochs=1, verbose=False, seed=0)
    assert len(hist.history["loss"]) == 1
