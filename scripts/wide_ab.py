"""Full-transcriptome-width A/B measurements (VERDICT r3 item 1).

Round 3 left every knob measured only at <=3.5k-gene panels plus one
G=10240 point; real 10x panels are 20-33k genes — exactly where the fused
MXU heads / bf16 / device-densify machinery is supposed to pay.  This
script measures, on the real chip, at G in WIDTHS (default 4k..28k):

  1. fused_dense_block vs plain XLA inference head (decides the
     config.use_fused_dense auto-gate curve);
  2. f32 vs bf16-operand training step (zinb-conddisp, batch 32 and 1024);
  3. host-densify dense transfer vs payload + on-device scatter at 8%
     density (DCA_TPU_DEVICE_DENSIFY at width);
  4. fused vs XLA ZINB NLL gradient at width.

Writes JSON lines to scripts/wide_ab_results.json and stdout.  Every
measurement warms once (remote compile at first execution) and reports the
MEDIAN of 5 steady passes (tunnel per-call variance ~2x, CLAUDE.md).

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/wide_ab.py
Env: WIDTHS (comma list, default "4096,8192,16384,28672"), SECTIONS
(comma subset of "head,bf16,densify,nll").
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
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "wide_ab_results.json")


def record(name, **kw):
    row = {"name": name, **kw}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        np.asarray(a)


def timeit(fn, *args, n=5, inner=10):
    """Median of n passes of `inner` calls each; warm first."""
    sync(fn(*args))
    passes = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        sync(out)
        passes.append((time.perf_counter() - t0) / inner * 1e3)
    return float(np.median(passes))


def ab_head(G, rs):
    from dca_tpu.ops.fused_dense import fused_dense_block

    B, K = 2048, 64
    x = jnp.asarray(rs.normal(size=(B, K)).astype(np.float32))
    w = jnp.asarray((rs.normal(size=(K, G)) * 0.1).astype(np.float32))
    b = jnp.asarray((rs.normal(size=(G,)) * 0.1).astype(np.float32))
    sf = jnp.asarray(rs.uniform(0.5, 2.0, size=(B,)).astype(np.float32))
    # reduce to a scalar ON DEVICE: fetching the (B, G) result would time
    # the tunnel transfer, not the kernel (first wide_ab revision did, and
    # 235 MB fetches swamped every arm)
    ref = jax.jit(lambda t: jnp.sum(
        jnp.clip(jnp.exp(t @ w + b), 1e-5, 1e6) * sf[:, None]))
    fus = jax.jit(lambda t: jnp.sum(fused_dense_block(
        t, w, b, activation="mean", size_factors=sf)))
    ms_x, ms_f = timeit(ref, x), timeit(fus, x)
    record(f"head_B2048_G{G}", xla_ms=round(ms_x, 3), fused_ms=round(ms_f, 3),
           speedup=round(ms_x / ms_f, 3))


def ab_bf16(G, rs):
    from dca_tpu.models import AE_types
    from dca_tpu.train.optim import get_optimizer

    for batch in (32, 1024):
        arms = {}
        for mode in ("f32", "bf16"):
            os.environ["DCA_TPU_MATMUL"] = mode  # read at trace time
            net = AE_types["zinb-conddisp"](input_size=G, seed=0)
            net.build()
            opt = get_optimizer("RMSprop", clipvalue=5.0)
            loss_fn = net.loss_fn
            opt_state = opt.init(net.params)

            def step(params, state, opt_state, xb, tb, sfb):
                (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, state, xb, sfb, tb, True, jax.random.PRNGKey(0))
                params, opt_state = opt.update(g, opt_state, params,
                                               jnp.float32(1e-3))
                # scalar checksum forces the whole update (no DCE) while
                # only 8 bytes cross the tunnel at sync
                chk = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(params))
                return l, chk

            stepj = jax.jit(step)
            xb = jnp.asarray(rs.normal(size=(batch, G)).astype(np.float32))
            tb = jnp.asarray(rs.poisson(2.0, size=(batch, G)).astype(np.float32))
            sfb = jnp.ones((batch,), jnp.float32)
            arms[mode] = timeit(stepj, net.params, net.state, opt_state,
                                xb, tb, sfb, inner=5)
        del os.environ["DCA_TPU_MATMUL"]
        record(f"train_step_B{batch}_G{G}",
               f32_ms=round(arms["f32"], 3), bf16_ms=round(arms["bf16"], 3),
               speedup=round(arms["f32"] / arms["bf16"], 3))


def ab_densify(G, rs):
    import scipy.sparse as sp

    from dca_tpu.ops.densify import (
        device_densify, flat_payload_from_csr, flat_slots_for,
        payload_from_csr,
    )

    B = 4096
    m = sp.random(B, G, density=0.08, format="csr", random_state=rs,
                  data_rvs=lambda n: rs.poisson(3.0, n) + 1.0)
    m.sort_indices()
    dense_host = m.toarray().astype(np.float32)
    rows = np.arange(B)
    idx, dat = payload_from_csr(m, rows, int_vals=True)

    reduce_j = jax.jit(jnp.sum)

    def host_path():
        return reduce_j(jnp.asarray(dense_host))  # transfer IS the work

    def device_path():
        return reduce_j(device_densify(idx, dat, G))

    ms_h = timeit(host_path, inner=3)
    ms_d = timeit(device_path, inner=3)
    record(f"densify_B{B}_G{G}_d0.08", host_ms=round(ms_h, 3),
           payload_ms=round(ms_d, 3), speedup=round(ms_h / ms_d, 3),
           payload_mb=round((idx.nbytes + dat.nbytes) / 1e6, 1),
           dense_mb=round(dense_host.nbytes / 1e6, 1))


def ab_nll(G, rs):
    from dca_tpu import losses
    from dca_tpu.ops.fused_loss import zinb_nll_fused

    B = 1024
    y = jnp.asarray(rs.negative_binomial(2, 0.4, size=(B, G)).astype(np.float32))
    mu = jnp.asarray(rs.uniform(0.1, 8.0, size=(B, G)).astype(np.float32))
    th = jnp.asarray(rs.uniform(0.1, 5.0, size=(B, G)).astype(np.float32))
    pi = jnp.asarray(rs.uniform(0.05, 0.7, size=(B, G)).astype(np.float32))
    def _sumgrads(gfn):
        def f(m, t, p):
            g = gfn(m, t, p)
            return sum(jnp.sum(x) for x in g)
        return jax.jit(f)

    ref = _sumgrads(jax.grad(
        lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05),
        argnums=(0, 1, 2)))
    fus = _sumgrads(jax.grad(
        lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False),
        argnums=(0, 1, 2)))
    ms_x = timeit(ref, mu, th, pi, inner=5)
    ms_f = timeit(fus, mu, th, pi, inner=5)
    record(f"zinb_grad_B{B}_G{G}", xla_ms=round(ms_x, 3),
           fused_ms=round(ms_f, 3), speedup=round(ms_x / ms_f, 3))


def main():
    widths = [int(w) for w in os.environ.get(
        "WIDTHS", "4096,8192,16384,28672").split(",")]
    sections = os.environ.get("SECTIONS", "head,bf16,densify,nll").split(",")
    print("devices:", jax.devices(), flush=True)
    fns = {"head": ab_head, "bf16": ab_bf16, "densify": ab_densify,
           "nll": ab_nll}
    for G in widths:
        for sec in sections:
            rs = np.random.RandomState(0)
            t0 = time.time()
            try:
                fns[sec](G, rs)
            except Exception as e:
                record(f"{sec}_G{G}_FAILED", error=repr(e))
            print(f"[{sec} G={G}] {time.time() - t0:.0f}s", file=sys.stderr,
                  flush=True)


if __name__ == "__main__":
    main()
