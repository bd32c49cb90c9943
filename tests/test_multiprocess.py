"""REAL multi-process multihost test: two OS processes, 4 virtual CPU
devices each, joined by jax.distributed into one 8-device mesh.

Exercises the actual cross-process code paths — process_row_range sharding,
make_array_from_process_local_data staging (via the shared
shard_train_data entry point), Gloo-backed collectives, gather_to_host,
and the sharded TSV writers — and pins the distributed one-step loss to the
single-process value."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multiproc_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_loss():
    """Single-process one-step loss over the same global batch/seeds."""
    from dca_tpu.models import AE_types
    from dca_tpu.train.optim import get_optimizer

    N, G = 64, 16
    rs = np.random.RandomState(7)
    X = rs.normal(size=(N, G)).astype(np.float32)
    T = rs.poisson(3.0, size=(N, G)).astype(np.float32)
    SF = rs.uniform(0.5, 2.0, size=(N,)).astype(np.float32)
    net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=3)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)
    loss, _ = net.loss_fn(net.params, net.state, jnp.asarray(X),
                          jnp.asarray(SF), jnp.asarray(T), True,
                          jax.random.PRNGKey(0))
    return float(loss)


@pytest.mark.slow
def test_two_process_mesh_end_to_end(tmp_path):
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": os.path.dirname(HERE)}
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process worker timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} DONE" in out, out

    # both ranks computed the same global loss...
    losses = []
    for out in outs:
        for line in out.splitlines():
            if " LOSS " in line:
                losses.append(float(line.split()[-1]))
    assert len(losses) == 2
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    # ...equal to the single-process loss over the same global batch
    # (training-mode forward, no dropout configured, so deterministic)
    ref = _reference_loss()
    assert abs(losses[0] - ref) / abs(ref) < 1e-4, (losses[0], ref)

    # rank 0 concatenated the sharded TSV
    assert "RANK0 CONCAT OK" in outs[0]
    assert os.path.exists(os.path.join(str(tmp_path), "mh.tsv"))
    assert not os.path.exists(os.path.join(str(tmp_path), "mh.tsv.part0"))
