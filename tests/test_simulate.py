"""Simulation module (dca_tpu/data/simulate.py) — ground-truth contract of
the reference's scripts/simulate.R generator."""

import numpy as np

from dca_tpu.data.simulate import simulate_counts, simulation_grid, to_anndata


def test_shapes_and_ground_truth():
    sim = simulate_counts(n_cells=300, n_genes=60, n_groups=3, seed=1)
    assert sim.counts.shape == (300, 60)
    assert sim.true_counts.shape == (300, 60)
    assert sim.dropout_mask.shape == (300, 60)
    assert set(sim.groups) == {0, 1, 2}
    assert sim.de_factors.shape == (3, 60)
    # dropped entries are zero in counts but kept in true_counts
    dropped = sim.dropout_mask & (sim.true_counts > 0)
    # ensure_nonzero may resurrect a few entries; the vast majority stay 0
    assert (sim.counts[dropped] == 0).mean() > 0.99
    assert np.all(sim.counts == np.round(sim.counts))  # integer counts


def test_seed_determinism():
    a = simulate_counts(n_cells=100, n_genes=40, seed=7)
    b = simulate_counts(n_cells=100, n_genes=40, seed=7)
    np.testing.assert_array_equal(a.counts, b.counts)
    c = simulate_counts(n_cells=100, n_genes=40, seed=8)
    assert not np.array_equal(a.counts, c.counts)


def test_dropout_mid_monotonic():
    """Higher dropout.mid -> more zeros (splatter logistic dropout)."""
    zeros = [
        (simulate_counts(500, 100, dropout_mid=m, seed=3).counts == 0).mean()
        for m in (0.0, 3.0, 5.0)
    ]
    assert zeros[0] < zeros[1] < zeros[2], zeros


def test_dropout_mid_zero_means_no_dropout():
    """The reference grid passes dropout.present=(dropout != 0)
    (scripts/simulate.R:56-57): the drop0 condition has NO dropout layer."""
    sim = simulate_counts(500, 100, dropout_mid=0.0, seed=3)
    assert not sim.dropout_mask.any()
    np.testing.assert_array_equal(sim.counts, sim.true_counts)


def test_ensure_nonzero_keeps_mask_consistent():
    """Resurrected entries must not stay flagged as dropped."""
    sim = simulate_counts(400, 80, dropout_mid=5.0, seed=11)
    # wherever the mask says dropped, the observed count is exactly zero
    assert (sim.counts[sim.dropout_mask] == 0).all()


def test_grid_matches_reference_sweep():
    grid = dict(simulation_grid(n_cells=20, n_genes=10))
    # 4 dropout mids x 4 group counts x swap in {F, T} (simulate.R:39-52)
    assert len(grid) == 32
    assert "sim-drop3-group2" in grid
    assert grid["sim-drop3-group2"].counts.shape == (20, 10)
    # swap exchanges the cell/gene counts (the genes >> cells regime)
    assert grid["sim-drop3-group2-swap"].counts.shape == (10, 20)


def test_to_anndata():
    sim = simulate_counts(n_cells=50, n_genes=20, n_groups=2, seed=0)
    ad = to_anndata(sim)
    assert ad.X.shape == (50, 20)
    assert "group" in ad.obs.columns
    assert set(ad.obs["group"]) == {"Group1", "Group2"}
