"""Worker for the real 2-process multihost test (test_multiprocess.py).

Each rank: joins the process group, loads ONLY its process_row_range row
shard, stages it through the shared entry point (shard_train_data routes
via make_array_from_process_local_data when process_count > 1), runs one
sharded train step over the global 8-device mesh, gathers results, and
exercises the sharded TSV writers.  Run as:

    python multiproc_worker.py <rank> <port> <outdir>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax  # noqa: E402

rank, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=rank,
    cluster_detection_method="deactivate",
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dca_tpu.models import AE_types  # noqa: E402
from dca_tpu.parallel import make_mesh, make_sharded_train_step, shard_train_data  # noqa: E402
from dca_tpu.parallel import multihost  # noqa: E402
from dca_tpu.train.optim import get_optimizer  # noqa: E402

assert jax.process_count() == 2 and jax.device_count() == 8

N, G = 64, 16
rs = np.random.RandomState(7)  # identical on both ranks
X = rs.normal(size=(N, G)).astype(np.float32)
T = rs.poisson(3.0, size=(N, G)).astype(np.float32)
SF = rs.uniform(0.5, 2.0, size=(N,)).astype(np.float32)

net = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=3)
net.build()
opt = get_optimizer("RMSprop", clipvalue=5.0)

mesh = make_mesh(jax.devices())  # 8 global devices, pure data parallel
lo, hi = multihost.process_row_range(N)
assert (lo, hi) == ((0, 32) if rank == 0 else (32, 64))

# the SAME staging entry point used single-process — multi-host routing is
# inside shard_train_data
xs, ts, sfs = shard_train_data(mesh, X[lo:hi], T[lo:hi], SF[lo:hi])
assert xs.shape == (N, G), xs.shape  # global logical shape

step, place_state = make_sharded_train_step(net, opt, mesh)
params, state, opt_state = place_state(net.params, net.state, opt.init(net.params))
params, state, opt_state, loss = step(
    params, state, opt_state, xs, ts, sfs, jnp.float32(1e-3), jax.random.PRNGKey(0)
)
print(f"RANK{rank} LOSS {float(loss):.6f}", flush=True)

# gather a sharded array back to every host (ICI all-gather analogue)
full_x = multihost.gather_to_host(xs)
assert full_x.shape == (N, G)
np.testing.assert_allclose(full_x, X, rtol=1e-6)

# sharded TSV write: each rank writes its rows, rank 0 concatenates
part = multihost.write_sharded(
    X[lo:hi], os.path.join(outdir, "mh.tsv"),
    rownames=[f"c{i}" for i in range(lo, hi)],
)
assert part.endswith(f".part{rank}")
# rank 1's part must exist before rank 0 concatenates: barrier first
import jax.experimental.multihost_utils as mhu  # noqa: E402

mhu.sync_global_devices("parts-written")
if multihost.is_primary():
    path = multihost.concat_shards(os.path.join(outdir, "mh.tsv"),
                                   n_parts=2, has_header=False)
    n_lines = sum(1 for _ in open(path))
    assert n_lines == N, n_lines
    print("RANK0 CONCAT OK", flush=True)
mhu.sync_global_devices("parts-done")

# ---- phase 2: the full PUBLIC train()/predict path over the process group.
# Contract: every process passes the same global adata + seeds; train()
# stages only this process's row blocks internally (train/loop.py).
import pandas as pd  # noqa: E402

from dca_tpu.data import normalize, read_dataset  # noqa: E402
from dca_tpu.data.adata import AnnData  # noqa: E402
from dca_tpu.train import train  # noqa: E402

rs2 = np.random.RandomState(11)
counts = rs2.poisson(2.5, size=(N, G)).astype(np.float32)
counts[:, 0] += 1
counts[0, :] += 1
ad = AnnData(
    counts,
    pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
    pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
)
ad = normalize(read_dataset(ad, check_counts=False))
net2 = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net2.build()
hist = train(ad, net2, epochs=3, batch_size=16, validation_split=0.25,
             verbose=False, seed=0, devices=jax.devices(), compiled=False,
             reduce_lr=0, early_stop=0)
print("RANK%d HIST %s" % (rank, ",".join(f"{v:.6f}" for v in hist.history["loss"])),
      flush=True)
net2.predict(ad, mode="denoise")
den = np.asarray(ad.X)
assert den.shape == (N, G) and np.isfinite(den).all()
print(f"RANK{rank} DENOISED_SUM {float(den.sum()):.4f}", flush=True)

# ---- phase 3: the STREAMING trainer over the process group (each process
# materializes only its row block of every staged part, train/loop.py)
ad3 = AnnData(
    counts.copy(),
    pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
    pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
)
ad3 = normalize(read_dataset(ad3, check_counts=False))
net3 = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net3.build()
hist3 = train(ad3, net3, epochs=2, batch_size=16, validation_split=0.25,
              verbose=False, seed=0, devices=jax.devices(), compiled=False,
              reduce_lr=0, early_stop=0, max_device_cells=32)
print("RANK%d SHIST %s" % (rank, ",".join(f"{v:.6f}" for v in hist3.history["loss"])),
      flush=True)

mhu.sync_global_devices("done")
print(f"RANK{rank} DONE", flush=True)

# ---- phase 4: streaming with SPARSE payload staging over the process
# group: CSR input, on-device densify, padded payloads row-sharded via
# host_local_to_global (train/loop.py _mesh_densify / _put_rows)
import scipy.sparse as sp  # noqa: E402

os.environ["DCA_TPU_DEVICE_DENSIFY"] = "1"
sparse_counts = counts.copy()
sparse_counts[sparse_counts < 2] = 0.0
sparse_counts[:, 0] += 1
sparse_counts[0, :] += 1
ad4 = AnnData(
    sp.csr_matrix(sparse_counts),
    pd.DataFrame(index=pd.Index([f"c{i}" for i in range(N)])),
    pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
)
ad4 = normalize(read_dataset(ad4, check_counts=False), lazy_scale=True)
net4 = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net4.build()
hist4 = train(ad4, net4, epochs=2, batch_size=16, validation_split=0.25,
              verbose=False, seed=0, devices=jax.devices(), compiled=False,
              reduce_lr=0, early_stop=0, max_device_cells=32)
print("RANK%d PHIST %s" % (rank, ",".join(f"{v:.6f}" for v in hist4.history["loss"])),
      flush=True)
del os.environ["DCA_TPU_DEVICE_DENSIFY"]

mhu.sync_global_devices("phase4-done")
print(f"RANK{rank} ALLDONE", flush=True)

# ---- phase 5: INDIVISIBLE row counts (auto-padding, VERDICT r3 item 5).
# 61 cells, validation_split=0.3 -> 42 train / 19 val rows; neither divides
# the 8-wide data axis, and the streaming parts (rem 10, val 19) don't
# either — the trainer must zero-weight-pad instead of asserting, with
# trajectories matching the single-process run.
counts5 = counts[:61].copy()
counts5[:, 0] += 1
counts5[0, :] += 1


def _adata5(X):
    return normalize(read_dataset(AnnData(
        X,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(61)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
    ), check_counts=False))


net5 = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net5.build()
hist5 = train(_adata5(counts5.copy()), net5, epochs=2, batch_size=16,
              validation_split=0.3, verbose=False, seed=0,
              devices=jax.devices(), compiled=False, reduce_lr=0, early_stop=0)
print("RANK%d H5 %s|%s" % (
    rank,
    ",".join(f"{v:.6f}" for v in hist5.history["loss"]),
    ",".join(f"{v:.6f}" for v in hist5.history["val_loss"])), flush=True)

net5s = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net5s.build()
hist5s = train(_adata5(counts5.copy()), net5s, epochs=2, batch_size=16,
               validation_split=0.3, verbose=False, seed=0,
               devices=jax.devices(), compiled=False, reduce_lr=0,
               early_stop=0, max_device_cells=32)
print("RANK%d S5 %s|%s" % (
    rank,
    ",".join(f"{v:.6f}" for v in hist5s.history["loss"]),
    ",".join(f"{v:.6f}" for v in hist5s.history["val_loss"])), flush=True)

os.environ["DCA_TPU_DEVICE_DENSIFY"] = "1"
sparse5 = counts5.copy()
sparse5[sparse5 < 2] = 0.0
sparse5[:, 0] += 1
sparse5[0, :] += 1
ad5p = normalize(read_dataset(AnnData(
    sp.csr_matrix(sparse5),
    pd.DataFrame(index=pd.Index([f"c{i}" for i in range(61)])),
    pd.DataFrame(index=pd.Index([f"g{i}" for i in range(G)])),
), check_counts=False), lazy_scale=True)
net5p = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net5p.build()
hist5p = train(ad5p, net5p, epochs=2, batch_size=16, validation_split=0.3,
               verbose=False, seed=0, devices=jax.devices(), compiled=False,
               reduce_lr=0, early_stop=0, max_device_cells=32)
print("RANK%d P5 %s|%s" % (
    rank,
    ",".join(f"{v:.6f}" for v in hist5p.history["loss"]),
    ",".join(f"{v:.6f}" for v in hist5p.history["val_loss"])), flush=True)
del os.environ["DCA_TPU_DEVICE_DENSIFY"]

# fused-kernel variant of the same indivisible-size streaming run: the
# auto-padded val chunks carry sample weights, which now ride the WEIGHTED
# fused kernels (interpret mode on CPU) instead of dropping to pure JAX —
# trajectory must still match the single-process oracle (VERDICT r4 item 4)
os.environ["DCA_TPU_FUSED_LOSS"] = "1"
net5f = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net5f.build()
hist5f = train(_adata5(counts5.copy()), net5f, epochs=2, batch_size=16,
               validation_split=0.3, verbose=False, seed=0,
               devices=jax.devices(), compiled=False, reduce_lr=0,
               early_stop=0, max_device_cells=32)
print("RANK%d F5 %s|%s" % (
    rank,
    ",".join(f"{v:.6f}" for v in hist5f.history["loss"]),
    ",".join(f"{v:.6f}" for v in hist5f.history["val_loss"])), flush=True)
del os.environ["DCA_TPU_FUSED_LOSS"]

mhu.sync_global_devices("phase5-done")
print(f"RANK{rank} PHASE5DONE", flush=True)

# ---- phase 6: streaming denoise->write on the mesh (round 5).  Every
# process iterates the forward blocks (the output gather is collective,
# incl. the NB-conddisp post-denoise dispersion re-forward); only rank 0
# touches the files.  The test compares the written TSVs numerically
# against a single-process write_streaming oracle.
ad6 = _adata5(counts5.copy())
net6 = AE_types["nb-conddisp"](input_size=G, hidden_size=(8, 4, 8), seed=4)
net6.build()
train(ad6, net6, epochs=1, batch_size=16, validation_split=0.0,
      verbose=False, seed=0, devices=jax.devices(), compiled=False,
      reduce_lr=0, early_stop=0)
net6.write_streaming(ad6, os.path.join(outdir, "stream6"), mode="full",
                     return_info=True)
mhu.sync_global_devices("phase6-done")
print(f"RANK{rank} PHASE6DONE", flush=True)
