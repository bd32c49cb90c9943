"""Real-chip A/B measurements that decide kernel fates + reference-scale bench.

Run on the TPU (one JAX process, default env, PYTHONPATH incl. /root/.axon_site):

  1. fused_dense_block vs plain XLA for the wide-gene inference head
     (B=2048, G=10240): decides DCA_TPU_FUSED_DENSE's fate (VERDICT #8).
  2. host-densify + dense transfer vs padded-payload transfer + on-device
     scatter at 90% sparsity: the device-transfer benchmark for
     DCA_TPU_DEVICE_DENSIFY (VERDICT #7).
  3. fused NLL kernel at the Paul15 gene width (3451).
  4. Paul15-shape end-to-end fit+predict (2730 x 3451, nb-conddisp,
     batch 32, 300 epochs w/ early stop): the 59 cells/s baseline shape
     (reference reproducibility/code/Figure9.ipynb cell 9).

Writes results as JSON lines to scripts/tpu_ab_results.json and stdout.

Timing notes (CLAUDE.md): first execution of each program compiles remotely
(minutes); every measurement warms once and times steady-state reruns, with
np.asarray() forcing sync (block_until_ready is unreliable on this platform).
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

RESULTS = []


def record(name, **kw):
    row = {"name": name, **kw}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    for a in leaves:
        np.asarray(a)


def timeit(fn, *args, n=30):
    t0 = time.perf_counter()
    sync(fn(*args))
    warm = time.perf_counter() - t0
    print(f"  warm (compile) pass: {warm:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fn(*args)
    out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def ab_fused_dense():
    from dca_tpu.ops.fused_dense import fused_dense_block

    B, K, G = 2048, 64, 10240
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray((rs.normal(size=(K, G)) * 0.1).astype(np.float32))
    b = jnp.asarray((rs.normal(size=(G,)) * 0.1).astype(np.float32))
    sf = jnp.asarray(rs.uniform(0.5, 2.0, size=(B,)).astype(np.float32))

    xla = jax.jit(lambda x: jnp.clip(jnp.exp(x @ w + b), 1e-5, 1e6) * sf[:, None])
    fused = jax.jit(lambda x: fused_dense_block(x, w, b, activation="mean",
                                                size_factors=sf))
    np.testing.assert_allclose(np.asarray(xla(x)), np.asarray(fused(x)),
                               rtol=1e-4, atol=1e-4)
    ms_x = timeit(xla, x)
    ms_f = timeit(fused, x)
    record("fused_dense_head_B2048_G10240", xla_ms=round(ms_x, 3),
           fused_ms=round(ms_f, 3), fused_speedup=round(ms_x / ms_f, 3))


def ab_densify():
    import scipy.sparse as sp

    from dca_tpu import native
    from dca_tpu.ops.densify import device_densify, payload_from_csr

    B, G, density = 4096, 3451, 0.10
    rs = np.random.RandomState(1)
    m = sp.random(B, G, density=density, format="csr", random_state=rs,
                  data_rvs=lambda n: rs.poisson(3.0, n) + 1.0)
    m.sort_indices()
    rows = np.arange(B, dtype=np.int64)
    K = int(np.diff(m.indptr).max())

    consume = jax.jit(lambda a: jnp.sum(a))  # force full materialization

    def host_path():
        dense = native.densify_rows(m.indptr, m.indices, m.data, rows, G)
        return consume(jnp.asarray(dense))

    def device_path():
        idx, dat = payload_from_csr(m, rows, K)
        return consume(device_densify(idx, dat, G))

    ref = float(np.asarray(host_path()))
    got = float(np.asarray(device_path()))
    assert abs(ref - got) / abs(ref) < 1e-5, (ref, got)
    ms_h = timeit(host_path, n=20)
    ms_d = timeit(device_path, n=20)
    record("densify_B4096_G3451_d0.10", host_ms=round(ms_h, 3),
           device_ms=round(ms_d, 3), K=K,
           payload_mb=round(8 * B * K / 1e6, 1), dense_mb=round(4 * B * G / 1e6, 1),
           device_speedup=round(ms_h / ms_d, 3))


def ab_fused_nll_paul15_width():
    from dca_tpu import losses
    from dca_tpu.ops.fused_loss import zinb_nll_fused

    B, G = 2730, 3451
    rs = np.random.RandomState(2)
    y = jnp.asarray(rs.negative_binomial(2, 0.4, size=(B, G)).astype(np.float32))
    mu = jnp.asarray(rs.uniform(0.1, 8.0, size=(B, G)).astype(np.float32))
    th = jnp.asarray(rs.uniform(0.1, 5.0, size=(B, G)).astype(np.float32))
    pi = jnp.asarray(rs.uniform(0.05, 0.7, size=(B, G)).astype(np.float32))

    xla_g = jax.jit(jax.grad(
        lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05),
        argnums=(0, 1, 2)))
    fused_g = jax.jit(jax.grad(
        lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False),
        argnums=(0, 1, 2)))
    a = xla_g(mu, th, pi)
    b = fused_g(mu, th, pi)
    for ga, gb in zip(a, b):
        err = float(jnp.max(jnp.abs(ga - gb)) / (jnp.max(jnp.abs(ga)) + 1e-12))
        assert err < 1e-3, err
    ms_x = timeit(xla_g, mu, th, pi)
    ms_f = timeit(fused_g, mu, th, pi)
    record("zinb_nll_grad_B2730_G3451", xla_ms=round(ms_x, 3),
           fused_ms=round(ms_f, 3), fused_speedup=round(ms_x / ms_f, 3))


def bench_paul15_shape():
    import pandas as pd

    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types, core
    from dca_tpu.train.compiled import build_fit_fn
    from dca_tpu.train.optim import get_optimizer

    n_cells, n_genes = 2730, 3451
    rs = np.random.RandomState(42)
    # synthetic counts at the Paul15 scale/sparsity (~90% zeros)
    base = rs.gamma(0.5, 1.0, size=(1, n_genes))
    depth = rs.lognormal(0.0, 0.5, size=(n_cells, 1))
    mu = base * depth * 1.2
    counts = rs.negative_binomial(0.7, 0.7 / (0.7 + mu)).astype(np.float32)
    counts[:, counts.sum(0) == 0] += 1.0
    counts[counts.sum(1) == 0, 0] += 1.0
    print(f"paul15-shape sparsity: {(counts == 0).mean():.3f}", file=sys.stderr)

    t0 = time.perf_counter()
    ad = AnnData(
        counts,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(n_genes)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False))
    t_pre = time.perf_counter() - t0

    net = AE_types["nb-conddisp"](input_size=n_genes, seed=0)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)
    X = np.asarray(ad.X, np.float32)
    T = np.asarray(ad.raw.X, np.float32)
    SF = np.asarray(ad.obs["size_factors"], np.float32)
    split = int(n_cells * 0.9)
    fit = jax.jit(build_fit_fn(
        net, opt, n_train=split, batch_size=32, epochs=300, has_val=True,
        reduce_lr=10, early_stop=15, track_best=False,
    ))
    args = (net.params, net.state, opt.init(net.params),
            jnp.asarray(X[:split]), jnp.asarray(T[:split]), jnp.asarray(SF[:split]),
            jnp.asarray(X[split:]), jnp.asarray(T[split:]), jnp.asarray(SF[split:]),
            jnp.float32(1e-3), jax.random.PRNGKey(0))

    definition = net.definition

    @jax.jit
    def predict(params, state, x, sf):
        out, _ = core.apply(definition, params, state, x, sf, training=False)
        return out["output"], out["latent"]

    dX, dSF = jnp.asarray(X), jnp.asarray(SF)

    t0 = time.perf_counter()
    out = fit(*args)
    sync(out)
    d, l = predict(out[0], out[1], dX, dSF)
    sync((d, l))
    print(f"  paul15 warm (compile) pass: {time.perf_counter() - t0:.1f}s "
          f"({int(out[7])} epochs)", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    out = fit(*args)
    d, l = predict(out[0], out[1], dX, dSF)
    sync((d, l))
    t_run = time.perf_counter() - t0
    epochs_run = int(out[7])
    wall = t_pre + t_run
    cps = n_cells / wall
    record("paul15_shape_2730x3451_nbconddisp", wall_s=round(wall, 3),
           pre_s=round(t_pre, 3), fit_predict_s=round(t_run, 3),
           epochs=epochs_run, cells_per_sec=round(cps, 1),
           vs_baseline_59=round(cps / 59.0, 1))


def bench_streaming(n_cells=100_000, n_genes=3451, k=345):
    """Production-scale streaming epoch throughput: n_cells sparse cells
    (10% density) streamed through the chunked trainer, host-densify vs
    on-device densify.  The paper's scalability claim is 1.3M cells; this
    measures the per-epoch cells/s that scale takes (input never dense on
    host; one pass host->HBM per epoch)."""
    import pandas as pd
    import scipy.sparse as sp

    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    rs = np.random.RandomState(0)
    # strided column pattern with per-row offset (covers every gene across
    # rows): transfer- and compute-equivalent to random sparsity for a
    # throughput measurement, buildable without a 1.3M-row Python loop
    step = n_genes // k
    idx = (np.arange(k, dtype=np.int32)[None, :] * step
           + (np.arange(n_cells, dtype=np.int32)[:, None] % step))
    data = (rs.poisson(3.0, size=n_cells * k) + 1.0).astype(np.float32)
    indptr = np.arange(n_cells + 1, dtype=np.int64) * k
    X = sp.csr_matrix((data, idx.ravel(), indptr), shape=(n_cells, n_genes))
    ad = AnnData(
        X,
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(n_genes)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False), lazy_scale=True,
                   filter_min_counts=False)

    def epoch_time(mode):
        os.environ["DCA_TPU_DEVICE_DENSIFY"] = mode

        def run(epochs):
            net = AE_types["nb-conddisp"](input_size=n_genes, seed=0)
            net.build()
            t0 = time.perf_counter()
            train(ad, net, epochs=epochs, verbose=False, seed=0,
                  max_device_cells=16384, reduce_lr=0, early_stop=0,
                  validation_split=0.0)
            return time.perf_counter() - t0

        warm = run(1)  # absorbs compiles (persistent cache + jit)
        t1 = run(1)
        t3 = run(3)
        print(f"  mode={mode}: warm={warm:.2f}s run1={t1:.2f}s run3={t3:.2f}s",
              file=sys.stderr, flush=True)
        return max((t3 - t1) / 2.0, 1e-9), warm

    sec_host, warm_h = epoch_time("0")
    sec_dev, warm_d = epoch_time("1")
    os.environ.pop("DCA_TPU_DEVICE_DENSIFY", None)
    record("streaming_epoch_100kx3451_d0.10",
           host_epoch_s=round(sec_host, 3), device_epoch_s=round(sec_dev, 3),
           host_cells_per_sec=round(n_cells / sec_host),
           device_cells_per_sec=round(n_cells / sec_dev),
           device_speedup=round(sec_host / sec_dev, 3))


def main():
    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    steps = {
        "fused_dense": ab_fused_dense,
        "densify": ab_densify,
        "nll": ab_fused_nll_paul15_width,
        "paul15": bench_paul15_shape,
        "stream": bench_streaming,
    }
    only = sys.argv[1:] or list(steps)
    for name in only:
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        try:
            steps[name]()
        except Exception as e:
            record(name + "_FAILED", error=repr(e))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tpu_ab_results.json")
    with open(out, "a") as f:
        for row in RESULTS:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
