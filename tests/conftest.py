"""Test configuration: force JAX onto CPU with 8 virtual devices so mesh /
sharding tests run without a TPU pod (standard JAX testing pattern, see
SURVEY.md §4). Must run before jax is imported anywhere."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def make_counts(n_cells=200, n_genes=50, seed=0, zero_inflate=0.3):
    """Synthetic NB counts with dropout, similar in spirit to the splatter
    sims the reference evaluates on (scripts/simulate.R:39-87)."""
    rs = np.random.RandomState(seed)
    base = rs.gamma(2.0, 1.0, size=(1, n_genes))
    depth = rs.lognormal(0.0, 0.3, size=(n_cells, 1))
    mu = base * depth * 5.0
    theta = 2.0
    p = theta / (theta + mu)
    counts = rs.negative_binomial(theta, p).astype(np.float32)
    if zero_inflate > 0:
        mask = rs.uniform(size=counts.shape) < zero_inflate
        counts = np.where(mask, 0.0, counts).astype(np.float32)
    # ensure no all-zero gene or cell
    counts[0, :] += 1
    counts[:, 0] += 1
    return counts


@pytest.fixture
def counts():
    return make_counts()


def make_adata(n_cells=200, n_genes=50, seed=0):
    from dca_tpu.data.adata import AnnData
    import pandas as pd

    X = make_counts(n_cells, n_genes, seed)
    obs = pd.DataFrame(index=pd.Index([f"cell{i}" for i in range(n_cells)]))
    var = pd.DataFrame(index=pd.Index([f"gene{i}" for i in range(n_genes)]))
    return AnnData(X, obs, var)


@pytest.fixture
def adata():
    return make_adata()
