"""Model zoo structure/behavior tests: all 11 AE_types (network.py:763-768),
output-head shapes, activation clips, BN semantics, encoder contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dca_tpu.models import AE_types, core

B, G = 16, 24
ALL_TYPES = sorted(AE_types.keys())


def _build(ae_type, **kw):
    net = AE_types[ae_type](input_size=G, **kw)
    net.build()
    return net


def _fwd(net, training=False, rng=None):
    x = np.random.RandomState(0).normal(size=(B, G)).astype(np.float32)
    sf = np.random.RandomState(1).uniform(0.5, 2.0, size=(B,)).astype(np.float32)
    out, new_state = net.apply(net.params, net.state, x, sf, training=training, rng=rng)
    return out, new_state, x, sf


@pytest.mark.parametrize("ae_type", ALL_TYPES)
def test_output_shapes(ae_type):
    net = _build(ae_type)
    out, _, _, sf = _fwd(net)
    assert out["output"].shape == (B, G)
    assert out["mean"].shape == (B, G)
    assert out["latent"].shape == (B, 32)  # center of (64, 32, 64)
    # ColwiseMult contract: output = mean * sf per cell (layers.py:85)
    np.testing.assert_allclose(
        np.asarray(out["output"]), np.asarray(out["mean"]) * sf[:, None], rtol=1e-6
    )

    disp_kind, has_pi, fork = core._STAGE_HEADS[ae_type]
    if disp_kind == "constant":
        assert out["disp"].shape == (1, G)
    elif disp_kind == "shared":
        assert out["disp"].shape == (B, 1)
    elif disp_kind == "conddisp":
        assert out["disp"].shape == (B, G)
    else:
        assert out["disp"] is None

    if has_pi:
        if ae_type == "zinb-shared":
            assert out["pi"].shape == (B, 1)
        else:
            assert out["pi"].shape == (B, G)
        assert np.all(np.asarray(out["pi"]) >= 0) and np.all(np.asarray(out["pi"]) <= 1)
    else:
        assert out["pi"] is None


@pytest.mark.parametrize("ae_type", ["zinb-conddisp", "nb-conddisp"])
def test_head_clips(ae_type):
    """MeanAct in [1e-5,1e6], DispAct in [1e-4,1e4] (network.py:38-39)."""
    net = _build(ae_type)
    out, _, _, _ = _fwd(net)
    m = np.asarray(out["mean"])
    d = np.asarray(out["disp"])
    assert m.min() >= 1e-5 and m.max() <= 1e6
    assert d.min() >= 1e-4 and d.max() <= 1e4


def test_constant_disp_theta_exp():
    """theta zeros-init -> theta_exp = clip(exp(0)) = 1 (layers.py:17-21)."""
    net = _build("nb")
    assert np.allclose(net.dispersion(), 1.0)


def test_fork_has_branches():
    net = _build("zinb-fork")
    assert set(net.definition.branches) == {"mean", "disp", "pi"}
    net2 = _build("nb-fork")
    assert set(net2.definition.branches) == {"mean", "disp"}
    # shared trunk holds only encoder+center for fork archs
    assert [l.name for l in net.definition.shared] == ["enc0", "center"]
    # reference names decoder layers 'dec%s' % (i - center_idx) => dec1
    assert [l.name for l in net.definition.branches["mean"]] == ["dec1_last_mean"]


def test_elempi_shapes():
    net = _build("zinb-elempi")
    assert net.definition.heads["pi"].kind == "elementwise"
    assert net.params["heads"]["pi"]["kernel"].shape == (G,)
    out, _, _, _ = _fwd(net)
    assert out["pi"].shape == (B, G)

    net_shared = _build("zinb-elempi", sharedpi=True)
    assert net_shared.params["heads"]["pi"]["kernel"].shape == (1,)
    out, _, _, _ = _fwd(net_shared)
    assert out["pi"].shape == (B, G)  # broadcasting, as the reference layer


def test_elempi_couples_mean_and_pi():
    """pi = sigmoid(k*z+b), mean = MeanAct(z) with z = -mean_no_act
    (network.py:435-447)."""
    net = _build("zinb-elempi")
    out, _, x, _ = _fwd(net)
    p = net.params["heads"]["mean"]
    # recompute decoder output via a second forward and check relationship
    z = None
    mean = np.asarray(out["mean"])
    pi = np.asarray(out["pi"])
    k = np.asarray(net.params["heads"]["pi"]["kernel"])
    b = np.asarray(net.params["heads"]["pi"]["bias"])
    # invert MeanAct where unclipped: z = log(mean)
    z = np.log(mean)
    interior = (mean > 1.01e-5) & (mean < 0.99e6)
    assert interior.any(), "all means clipped — the coupling check is vacuous"
    expected_pi = 1.0 / (1.0 + np.exp(-(z * k + b)))
    np.testing.assert_allclose(pi[interior], expected_pi[interior], rtol=1e-4)


def test_batchnorm_semantics():
    net = _build("nb-conddisp")
    out_eval, state_eval, x, sf = _fwd(net, training=False)
    # eval mode must not change state
    assert jnp.allclose(
        state_eval["trunk"]["center"]["moving_mean"],
        net.state["trunk"]["center"]["moving_mean"],
    )
    out_tr, state_tr, _, _ = _fwd(net, training=True, rng=jax.random.PRNGKey(0))
    mm = np.asarray(state_tr["trunk"]["center"]["moving_mean"])
    assert not np.allclose(mm, 0.0)  # moving stats updated with momentum .99
    assert np.abs(mm).max() < np.abs(
        np.asarray(out_tr["latent"])
    ).max()  # only 1% of batch mean absorbed


def test_no_batchnorm():
    net = _build("zinb-conddisp", batchnorm=False)
    assert "bn_beta" not in net.params["trunk"]["center"]
    out, _, _, _ = _fwd(net)
    assert out["output"].shape == (B, G)


def test_dropout_only_in_training():
    net = _build("zinb-conddisp", hidden_dropout=0.5, input_dropout=0.3)
    out1, _, _, _ = _fwd(net, training=False)
    out2, _, _, _ = _fwd(net, training=False)
    np.testing.assert_allclose(np.asarray(out1["output"]), np.asarray(out2["output"]))
    outa, _, _, _ = _fwd(net, training=True, rng=jax.random.PRNGKey(1))
    outb, _, _, _ = _fwd(net, training=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(outa["output"]), np.asarray(outb["output"]))


def test_per_layer_dropout_list():
    net = _build("nb-conddisp", hidden_dropout=[0.1, 0.0, 0.2])
    d = [l.dropout for l in net.definition.shared]
    assert d == [0.1, 0.0, 0.2]


def test_encoder_latent_is_center_preact():
    """get_encoder() returns the center Dense output BEFORE BN/activation
    (network.py:184-185) — so latent can be negative even under relu."""
    net = _build("zinb-conddisp")
    out, _, _, _ = _fwd(net)
    lat = np.asarray(out["latent"])
    assert (lat < 0).any()


def test_regularization_loss():
    net = _build("zinb-conddisp", l1_coef=0.01, l2_coef=0.01)
    reg = float(core.regularization_loss(net.definition, net.params))
    assert reg > 0
    net0 = _build("zinb-conddisp")
    assert float(core.regularization_loss(net0.definition, net0.params)) == 0.0


def test_enc_reg_override():
    net = _build("nb-conddisp", l2_coef=0.1, l2_enc_coef=0.5)
    by_name = {l.name: l for l in net.definition.shared}
    assert by_name["enc0"].l2 == 0.5
    assert by_name["center"].l2 == 0.5
    assert by_name["dec1"].l2 == 0.1


@pytest.mark.parametrize("ae_type", ALL_TYPES)
def test_loss_fn_finite_and_differentiable(ae_type):
    net = _build(ae_type)
    x = np.random.RandomState(2).normal(size=(B, G)).astype(np.float32)
    sf = np.ones((B,), np.float32)
    target = np.random.RandomState(3).poisson(2.0, size=(B, G)).astype(np.float32)

    def f(params):
        loss, _ = net.loss_fn(params, net.state, x, sf, target, True, jax.random.PRNGKey(0))
        return loss

    loss = float(f(net.params))
    assert np.isfinite(loss)
    grads = jax.grad(f)(net.params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    assert any(np.any(np.asarray(g) != 0) for g in flat)


def test_glm_mode_no_hidden_layers():
    """hidden_size=() degenerates to a GLM: input -> heads directly (the
    biochemists parity setup, data/test-biochemists-nb.py)."""
    net = AE_types["nb"](input_size=5, output_size=1, hidden_size=(), batchnorm=False)
    net.build()
    x = np.random.RandomState(4).normal(size=(8, 5)).astype(np.float32)
    out, _ = net.apply(net.params, net.state, x, np.ones(8, np.float32))
    assert out["mean"].shape == (8, 1)
    assert out["disp"].shape == (1, 1)


def test_save_load_roundtrip(tmp_path):
    net = _build("zinb-conddisp")
    out1, _, x, sf = _fwd(net)
    f = str(tmp_path / "w.hdf5")
    net.save_weights(f)
    net2 = _build("zinb-conddisp")
    net2.params = jax.tree_util.tree_map(lambda p: p * 0 + 1.0, net2.params)
    net2.load_weights(f)
    out2, _, _, _ = _fwd(net2)
    np.testing.assert_allclose(
        np.asarray(out1["output"]), np.asarray(out2["output"]), rtol=1e-6
    )


def test_get_decoder_matches_full_forward():
    """decode(encoder activations) == full forward outputs."""
    net = _build("zinb-conddisp")
    out, _, x, sf = _fwd(net)
    # reproduce the center ACTIVATION (post-BN/act) by running the shared
    # stack manually up to center
    import jax.numpy as jnp
    from dca_tpu.models.core import _apply_stack

    center_idx = next(
        i for i, l in enumerate(net.definition.shared) if l.name == "center"
    )
    enc_layers = net.definition.shared[: center_idx + 1]
    latent_act, _, _ = _apply_stack(
        enc_layers, net.params["trunk"], net.state["trunk"], jnp.asarray(x),
        activation="relu", training=False, rng=None,
    )
    decode = net.get_decoder()
    dec_out = decode(np.asarray(latent_act), sf)
    np.testing.assert_allclose(dec_out, np.asarray(out["output"]), rtol=1e-5)


def test_load_model_roundtrip(tmp_path):
    from dca_tpu.models.network import load_model

    net = AE_types["zinb-conddisp"](input_size=G, file_path=str(tmp_path))
    net.build()
    net.save()
    out1, _, x, sf = _fwd(net)
    net2 = load_model(str(tmp_path / "model.pickle"))
    out2, _ = net2.apply(net2.params, net2.state,
                         np.random.RandomState(0).normal(size=(B, G)).astype(np.float32),
                         np.random.RandomState(1).uniform(0.5, 2.0, size=(B,)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(out1["output"]), np.asarray(out2["output"]), rtol=1e-6)


def test_fetch_dtype_opt_in(monkeypatch):
    """DCA_TPU_FETCH_DTYPE=bf16 downcasts forward outputs on device before
    the fetch and returns float32 numpy close to the full-precision path;
    bogus values raise."""
    import numpy as np

    from dca_tpu.models import AE_types

    net = AE_types["nb-conddisp"](input_size=20, hidden_size=(8, 4, 8), seed=0)
    net.build()
    rs = np.random.RandomState(0)
    x = rs.normal(size=(12, 20)).astype(np.float32)

    monkeypatch.delenv("DCA_TPU_FETCH_DTYPE", raising=False)
    full = net.forward(x)["output"]
    monkeypatch.setenv("DCA_TPU_FETCH_DTYPE", "bf16")
    low = net.forward(x)["output"]
    assert low.dtype == np.float32
    np.testing.assert_allclose(low, full, rtol=2e-2, atol=1e-2)

    monkeypatch.setenv("DCA_TPU_FETCH_DTYPE", "f64")
    import pytest

    with pytest.raises(ValueError, match="DCA_TPU_FETCH_DTYPE"):
        net.forward(x)


def test_fetch_dtype_never_corrupts_saved_weights(monkeypatch, tmp_path):
    """DCA_TPU_FETCH_DTYPE is a predict-output knob ONLY: with it set,
    save()/save_weights() must still persist bit-exact float32 parameters
    (ADVICE r4 — the downcast used to leak into the persistence paths)."""
    import h5py
    import numpy as np

    from dca_tpu.models import AE_types
    from dca_tpu.models.network import load_model

    net = AE_types["zinb-conddisp"](
        input_size=16, hidden_size=(8, 4, 8), seed=0,
        file_path=str(tmp_path))
    net.build()
    ref_kernel = np.asarray(net.params["trunk"]["enc0"]["kernel"])

    monkeypatch.setenv("DCA_TPU_FETCH_DTYPE", "bf16")
    net.save()
    net.save_weights(str(tmp_path / "weights.hdf5"))

    loaded = load_model(str(tmp_path / "model.pickle"))
    np.testing.assert_array_equal(
        np.asarray(loaded.params["trunk"]["enc0"]["kernel"]), ref_kernel)
    with h5py.File(str(tmp_path / "weights.hdf5"), "r") as f:
        disk = np.asarray(f["params/trunk/enc0/kernel"])
    assert disk.dtype == np.float32
    np.testing.assert_array_equal(disk, ref_kernel)
