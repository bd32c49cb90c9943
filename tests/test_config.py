"""Runtime knob resolution (dca_tpu/config.py)."""

from dca_tpu import config


def test_fused_dense_auto_off_everywhere(monkeypatch):
    monkeypatch.delenv("DCA_TPU_FUSED_DENSE", raising=False)
    # round-4 width sweep retired the >=8192 auto crossover: auto is plain
    # XLA at every width (the kernel regressed 0.85-0.89x at 16-28k genes)
    assert not config.use_fused_dense()
    assert not config.use_fused_dense(200)
    assert not config.use_fused_dense(10240)
    assert not config.use_fused_dense(28672)
    monkeypatch.setenv("DCA_TPU_FUSED_DENSE", "1")
    assert config.use_fused_dense()
    assert config.use_fused_dense(8)
    monkeypatch.setenv("DCA_TPU_FUSED_DENSE", "0")
    assert not config.use_fused_dense(10240)


def test_device_densify_resolution(monkeypatch):
    monkeypatch.delenv("DCA_TPU_DEVICE_DENSIFY", raising=False)
    assert not config.use_device_densify()  # CPU backend -> auto off
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "1")
    assert config.use_device_densify()
    monkeypatch.setenv("DCA_TPU_DEVICE_DENSIFY", "0")
    assert not config.use_device_densify()


def test_fused_loss_resolution(monkeypatch):
    monkeypatch.setenv("DCA_TPU_FUSED_LOSS", "1")
    assert config.use_fused_loss()
    monkeypatch.setenv("DCA_TPU_FUSED_LOSS", "0")
    assert not config.use_fused_loss()
    monkeypatch.delenv("DCA_TPU_FUSED_LOSS", raising=False)
    assert not config.use_fused_loss()  # CPU backend -> auto off


def test_matmul_dtype_resolution(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.delenv("DCA_TPU_MATMUL", raising=False)
    assert config.matmul_dtype() is None  # CPU backend -> auto is f32
    monkeypatch.setenv("DCA_TPU_MATMUL", "bf16")
    assert config.matmul_dtype() == jnp.bfloat16
    monkeypatch.setenv("DCA_TPU_MATMUL", "f32")
    assert config.matmul_dtype() is None


def test_matmul_dtype_rejects_typos(monkeypatch):
    """A 'fp32'/'f16' typo must not silently change precision (ADVICE r2)."""
    import pytest

    for bogus in ("fp32", "f16", "float32", "yes"):
        monkeypatch.setenv("DCA_TPU_MATMUL", bogus)
        with pytest.raises(ValueError, match="DCA_TPU_MATMUL"):
            config.matmul_dtype()


def test_bf16_matmul_mode_close_to_f32(monkeypatch):
    """bf16 rounds only the matmul operands (f32 accumulation), so the
    forward pass must track the f32 path to bf16 input precision."""
    import numpy as np

    from dca_tpu.models import AE_types, core

    net = AE_types["zinb-conddisp"](input_size=64, hidden_size=(16, 8, 16), seed=0)
    net.build()
    rs = np.random.RandomState(0)
    x = rs.normal(size=(32, 64)).astype(np.float32)
    sf = np.exp(rs.normal(0, 0.2, size=(32,))).astype(np.float32)

    monkeypatch.setenv("DCA_TPU_MATMUL", "f32")
    ref, _ = core.apply(net.definition, net.params, net.state, x, sf, training=False)
    monkeypatch.setenv("DCA_TPU_MATMUL", "bf16")
    got, _ = core.apply(net.definition, net.params, net.state, x, sf, training=False)

    for key in ("output", "mean", "disp", "pi", "latent"):
        a, b = np.asarray(ref[key]), np.asarray(got[key])
        assert np.allclose(a, b, rtol=5e-2, atol=5e-2), key
        # ...but bf16 must actually have been engaged (not a silent no-op)
    assert not np.array_equal(np.asarray(ref["latent"]), np.asarray(got["latent"]))
