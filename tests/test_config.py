"""Runtime knob resolution (dca_tpu/config.py)."""

from dca_tpu import config


def test_fused_dense_auto_gates_on_width(monkeypatch):
    monkeypatch.delenv("DCA_TPU_FUSED_DENSE", raising=False)
    # CPU backend in tests: auto is always off
    assert not config.use_fused_dense()
    assert not config.use_fused_dense(200)
    assert not config.use_fused_dense(10240)
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
