"""Reference-scale tests: the Paul15 shape (2730 cells x 3451 genes) that the
reference's integration test exercises (/root/reference/dca/test.py:6-59) and
whose 59 cells/s CPU wall time is the BASELINE.md large-shape number.

Everything else in the suite runs on <=300 genes; these tests prove the
G-wide head matmuls, the preprocessing, and the fused NLL kernel's grid
logic at the width they were designed for.  Marked slow."""

import numpy as np
import pytest

from conftest import make_adata

PAUL15_CELLS, PAUL15_GENES = 2730, 3451


@pytest.mark.slow
def test_paul15_shape_end_to_end():
    """nb-conddisp (the reference default) at the Paul15 shape: train a
    couple of epochs, denoise, and check the full side-effect contract."""
    from dca_tpu import dca

    ad = make_adata(PAUL15_CELLS, PAUL15_GENES, seed=7)
    ret = dca(ad, mode="denoise", ae_type="nb-conddisp", epochs=2,
              return_info=True, copy=True, verbose=False)
    assert ret.X.shape == (PAUL15_CELLS, PAUL15_GENES)
    assert np.isfinite(ret.X).all()
    assert (ret.X >= 0).all()
    assert ret.obsm["X_dca_dispersion"].shape == (PAUL15_CELLS, PAUL15_GENES)
    losses = ret.uns["dca_loss_history"]["loss"]
    assert len(losses) == 2 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_fused_nll_kernel_at_paul15_width():
    """The Pallas ZINB NLL kernel (fwd + analytic bwd) must tile correctly at
    G=3451 — a non-multiple of the 128-lane grid (interpret mode on CPU;
    timing on real hardware lives in scripts/tpu_ab.py)."""
    import jax
    import jax.numpy as jnp

    from dca_tpu import losses
    from dca_tpu.ops import fused_loss

    B, G = 8, PAUL15_GENES
    rs = np.random.RandomState(3)
    y = jnp.asarray(rs.negative_binomial(2, 0.4, size=(B, G)).astype(np.float32))
    mu = jnp.asarray(rs.uniform(0.1, 8.0, size=(B, G)).astype(np.float32))
    th = jnp.asarray(rs.uniform(0.1, 5.0, size=(B, G)).astype(np.float32))
    pi = jnp.asarray(rs.uniform(0.05, 0.7, size=(B, G)).astype(np.float32))

    ref = float(losses.zinb_nll(y, mu, th, pi, ridge_lambda=0.05))
    got = float(fused_loss.zinb_nll_fused(y, mu, th, pi, 0.05, interpret=True))
    assert abs(ref - got) / abs(ref) < 1e-4

    g_ref = jax.grad(lambda m: losses.zinb_nll(y, m, th, pi, ridge_lambda=0.05))(mu)
    g_fus = jax.grad(lambda m: fused_loss.zinb_nll_fused(y, m, th, pi, 0.05,
                                                         interpret=True))(mu)
    err = float(jnp.max(jnp.abs(g_ref - g_fus)) / (jnp.max(jnp.abs(g_ref)) + 1e-12))
    assert err < 1e-3, err
