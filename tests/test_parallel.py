"""Distributed tests on the 8-virtual-CPU-device mesh (conftest forces
--xla_force_host_platform_device_count=8): sharded step correctness vs
single-device, dp/tp layouts, and the driver dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dca_tpu.models import AE_types
from dca_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_sharding,
    shard_train_data,
)
from dca_tpu.train.optim import get_optimizer


def _net(G=64, hidden=(16, 8, 16), ae_type="zinb-conddisp"):
    net = AE_types[ae_type](input_size=G, hidden_size=hidden)
    net.build()
    return net


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(jax.devices(), model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh_dp = make_mesh(jax.devices())
    assert mesh_dp.shape == {"data": 8, "model": 1}


def test_param_sharding_layout():
    net = _net(G=64)
    mesh = make_mesh(jax.devices(), model=2)
    shardings = param_sharding(net.params, net.definition, mesh)
    # input kernel row-sharded over genes
    assert shardings["trunk"]["enc0"]["kernel"].spec == P("model", None)
    # hidden kernels replicated
    assert shardings["trunk"]["center"]["kernel"].spec == P()
    # head kernels column-sharded over genes, biases sharded
    assert shardings["heads"]["mean"]["kernel"].spec == P(None, "model")
    assert shardings["heads"]["mean"]["bias"].spec == P("model")
    assert shardings["heads"]["pi"]["kernel"].spec == P(None, "model")


def test_param_sharding_indivisible_replicates():
    net = _net(G=31)  # 31 % 2 != 0
    mesh = make_mesh(jax.devices(), model=2)
    shardings = param_sharding(net.params, net.definition, mesh)
    assert shardings["trunk"]["enc0"]["kernel"].spec == P()
    assert shardings["heads"]["mean"]["kernel"].spec == P()


@pytest.mark.parametrize("model_axis", [1, 2, 4])
def test_sharded_step_matches_single_device(model_axis):
    """One dp/tp-sharded training step == the unsharded step (GSPMD is
    semantics-preserving; this pins it for our layouts)."""
    G, B = 64, 16
    net = _net(G=G)
    opt = get_optimizer("RMSprop", clipvalue=5.0)

    rs = np.random.RandomState(0)
    x = rs.normal(size=(B, G)).astype(np.float32)
    t = rs.poisson(2.0, size=(B, G)).astype(np.float32)
    sf = rs.uniform(0.5, 2.0, size=(B,)).astype(np.float32)
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(0)

    # single-device reference
    def plain_step(params, state, opt_state):
        (loss, new_state), grads = jax.value_and_grad(net.loss_fn, has_aux=True)(
            params, state, x, sf, t, True, rng
        )
        params, opt_state = opt.update(grads, opt_state, params, lr)
        return params, new_state, opt_state, loss

    p0, s0, o0, l0 = jax.jit(plain_step)(net.params, net.state, opt.init(net.params))

    mesh = make_mesh(jax.devices(), model=model_axis)
    step_fn, place_state = make_sharded_train_step(net, opt, mesh, donate=False)
    params, state, opt_state = place_state(net.params, net.state, opt.init(net.params))
    xd, td, sfd = shard_train_data(mesh, x, t, sf)
    p1, s1, o1, l1 = step_fn(params, state, opt_state, xd, td, sfd, lr, rng)

    assert abs(float(l0) - float(l1)) < 1e-4
    # RMSprop's 1/sqrt((1-rho)g^2) amplifies reassociated-reduction float
    # noise; updates are O(lr)=1e-3, so 1e-4 absolute = <10% of one step.
    for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_graft_entry_single():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


def test_graft_entry_dryrun():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    __graft_entry__.dryrun_multichip(4)


def test_write_sharded_concat(tmp_path):
    """Per-host shard writers + rank-0 concatenation (multihost.py)."""
    import numpy as np
    from dca_tpu.parallel import multihost

    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "latent.tsv")
    part = multihost.write_sharded(
        rows, path, rownames=[f"c{i}" for i in range(3)],
        colnames=[f"d{i}" for i in range(4)],
    )
    assert part.endswith(".part0")
    multihost.concat_shards(path, n_parts=1)
    import pandas as pd
    df = pd.read_csv(path, sep="\t", index_col=0)
    np.testing.assert_allclose(df.values, rows, atol=1e-6)
    assert list(df.index) == ["c0", "c1", "c2"]


def test_concat_shards_headerless_keeps_all_rows(tmp_path):
    """write_sharded with colnames=None emits no header line; concat must not
    eat the first data row of later parts (round-1 advisor finding)."""
    import pandas as pd
    from dca_tpu.parallel import multihost

    path = str(tmp_path / "mat.tsv")
    a = np.arange(8, dtype=np.float32).reshape(2, 4)
    b = np.arange(8, 16, dtype=np.float32).reshape(2, 4)
    multihost.write_sharded(a, path)  # -> .part0 (single-process rank 0)
    # simulate a second host's shard
    from dca_tpu.data.io import write_text_matrix
    write_text_matrix(b, path + ".part1")
    multihost.concat_shards(path, n_parts=2, has_header=False)
    df = pd.read_csv(path, sep="\t", header=None)
    assert df.shape == (4, 4)
    np.testing.assert_allclose(df.values, np.vstack([a, b]), atol=1e-6)
