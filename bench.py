"""Benchmark: steady-state training throughput on the reference's two
headline workloads:

  1. tutorial workload (2000 cells x 200 genes, nb-conddisp 64-32-64,
     batch 32, 300 max epochs with early stop — tutorial.ipynb cell 11,
     24 s end-to-end on CPU => ~83 cells/s baseline)  -> the JSON line
  2. Paul15 shape (2730 cells x 3451 genes, nb-conddisp —
     reproducibility/code/Figure9.ipynb cell 9, 46.2 s => ~59 cells/s
     baseline)  -> reported on stderr (and recorded in docs/benchmarks.md)

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

We measure the same work as the reference — preprocessing + the full fit
(all epochs, callbacks, early stop) + denoising predict — at steady state:
the fit/predict programs are executed once to absorb this platform's
remote-compile-at-first-execution artifact (cold timings go to stderr),
then the MEDIAN of DCA_TPU_BENCH_PASSES (default 5) complete
training-from-scratch passes is reported — the tunnel's per-call latency
varies ~2x run-to-run, so a single pass cannot distinguish a real
regression from a bad sample (VERDICT.md round 2).  Per-pass times go to
stderr.  On device the entire 300-epoch fit is a single XLA program
(dca_tpu/train/compiled.py).  Set DCA_TPU_BENCH_SKIP_BIG=1 to skip (2).
"""

import contextlib
import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def make_splatter_like(n_cells=2000, n_genes=200, seed=42):
    """Synthetic ZINB counts mimicking the tutorial's splatter sim
    (2 groups, dropout) — scripts/simulate.R:39-87.

    Deliberately NOT swapped for dca_tpu.data.simulate: this exact generator
    defines the benchmark workload measured since round 1, and changing the
    data would break vs_baseline comparability across rounds."""
    rs = np.random.RandomState(seed)
    n_half = n_cells // 2
    base = rs.gamma(2.0, 1.0, size=(1, n_genes))
    de = np.ones((2, n_genes))
    de_genes = rs.choice(n_genes, n_genes // 5, replace=False)
    de[0, de_genes[: len(de_genes) // 2]] = 4.0
    de[1, de_genes[len(de_genes) // 2 :]] = 4.0
    groups = np.repeat([0, 1], [n_half, n_cells - n_half])
    depth = rs.lognormal(0.0, 0.35, size=(n_cells, 1))
    mu = base * de[groups] * depth * 3.0
    theta = 2.0
    counts = rs.negative_binomial(theta, theta / (theta + mu)).astype(np.float32)
    drop = rs.uniform(size=counts.shape) < np.exp(-0.3 * mu)
    counts = np.where(drop, 0.0, counts).astype(np.float32)
    counts[:, counts.sum(0) == 0] += 1.0
    counts[counts.sum(1) == 0, 0] += 1.0
    return counts, groups


def make_paul15_like(n_cells=2730, n_genes=3451, seed=42):
    """Synthetic counts at the Paul15 scale/sparsity (~75% zeros) — the
    reference's Figure9.ipynb workload shape."""
    rs = np.random.RandomState(seed)
    base = rs.gamma(0.5, 1.0, size=(1, n_genes))
    depth = rs.lognormal(0.0, 0.5, size=(n_cells, 1))
    mu = base * depth * 1.2
    counts = rs.negative_binomial(0.7, 0.7 / (0.7 + mu)).astype(np.float32)
    counts[:, counts.sum(0) == 0] += 1.0
    counts[counts.sum(1) == 0, 0] += 1.0
    return counts


def _matmul_params(params):
    """Total MAC-parameter count of the model's 2D kernels (the matmul
    FLOPs; biases/BN are O(width) noise)."""
    import jax

    return sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
        if hasattr(l, "shape") and len(l.shape) == 2
    )


def _report_mfu(label, kparams, n_train, epochs_run, n_cells, batch, t_run):
    """Achieved model FLOP/s + MFU on stderr (VERDICT r3 item 2).

    Model FLOPs via the standard 6ND rule (fwd 2ND + bwd 4ND) for the fit
    plus 2ND for the denoise forward; steps/epoch from the batch size.
    Peak from DCA_TPU_PEAK_FLOPS (default 1.97e14 — v5e f32; bf16 doubles
    it).  The DCA reference workloads are tiny-MLP/latency-bound, so the
    honest MFU here is far below 1% — the number exists to quantify
    exactly that (the chip is NOT the bottleneck at reference shapes)."""
    peak = float(os.environ.get("DCA_TPU_PEAK_FLOPS", 1.97e14))
    flops = 6.0 * kparams * n_train * epochs_run + 2.0 * kparams * n_cells
    achieved = flops / max(t_run, 1e-9)
    print(
        f"bench[{label}]: model FLOPs {flops:.3e} over {t_run:.3f}s -> "
        f"{achieved / 1e9:.2f} GFLOP/s achieved, MFU {achieved / peak:.2e} "
        f"(peak assumed {peak:.2e} f32 FLOP/s; batch {batch})",
        file=sys.stderr,
    )
    return achieved


def run_config(counts, label):
    """Preprocess + full fit + denoise predict at steady state; returns
    end-to-end cells/sec from the MEDIAN of k measured passes."""
    import pandas as pd

    from dca_tpu.data.adata import AnnData
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.models import AE_types, core
    from dca_tpu.train.optim import get_optimizer
    from dca_tpu.train.compiled import build_fit_fn

    n_cells, n_genes = counts.shape

    def preprocess():
        ad = AnnData(
            counts.copy(),
            pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)])),
            pd.DataFrame(index=pd.Index([f"g{i}" for i in range(n_genes)])),
        )
        return normalize(read_dataset(ad, check_counts=False))

    preprocess()  # absorb lazy module imports
    t_pre0 = time.perf_counter()
    ad = preprocess()
    t_pre = time.perf_counter() - t_pre0

    # exactly the dca()/train() configuration (api.py defaults)
    net = AE_types["nb-conddisp"](input_size=n_genes, seed=0)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)

    X = np.asarray(ad.X, np.float32)
    T = np.asarray(ad.raw.X, np.float32)
    SF = np.asarray(ad.obs["size_factors"], np.float32)
    split = int(n_cells * 0.9)
    dXt, dTt, dSt = jnp.asarray(X[:split]), jnp.asarray(T[:split]), jnp.asarray(SF[:split])
    dXv, dTv, dSv = jnp.asarray(X[split:]), jnp.asarray(T[split:]), jnp.asarray(SF[split:])
    opt_state = opt.init(net.params)
    args = (net.params, net.state, opt_state, dXt, dTt, dSt, dXv, dTv, dSv,
            jnp.float32(1e-3), jax.random.PRNGKey(0))

    definition = net.definition

    # fit + denoise as ONE jitted program: the tunnel's per-call round-trip
    # latency drifts between ~40 ms and ~400 ms across hours (measured
    # 2026-08-21), so every dispatch a pass makes inflates the degraded-phase
    # number; one call + one bulk fetch is also simply the faster design.
    dX, dSF = jnp.asarray(X), jnp.asarray(SF)
    fit_fn = build_fit_fn(
        net, opt, n_train=split, batch_size=32, epochs=300, has_val=True,
        reduce_lr=10, early_stop=15, track_best=False,
    )

    @jax.jit
    def fit_and_predict(*a):
        out = fit_fn(*a)
        pred, _ = core.apply(definition, out[0], out[1], dX, dSF, training=False)
        return pred["output"], pred["latent"], out[7]

    # ---- warm pass: absorb this platform's first-execution remote compile
    t0 = time.perf_counter()
    denoised, latent, epochs = fit_and_predict(*args)
    jax.device_get((denoised, latent))
    epochs_run = int(epochs)
    print(f"bench[{label}]: warm pass {time.perf_counter() - t0:.1f}s "
          f"({epochs_run} epochs)", file=sys.stderr)

    # ---- measured passes: full training from scratch + denoise, median-of-k
    # (single-pass measurement cannot separate a real regression from the
    # tunnel's ~2x per-call variance — VERDICT.md round 2 item 1)
    k = int(os.environ.get("DCA_TPU_BENCH_PASSES", "5"))
    times = []
    for i in range(k):
        t0 = time.perf_counter()
        denoised, latent, epochs = fit_and_predict(*args)
        jax.device_get((denoised, latent))
        times.append(time.perf_counter() - t0)
    epochs_run = int(epochs)
    t_run = float(np.median(times))

    wall = t_pre + t_run
    print(
        f"bench[{label}]: steady-state end-to-end {wall:.3f}s "
        f"(pre {t_pre:.3f}s, fit+predict median-of-{k} {t_run:.3f}s, "
        f"passes {[round(t, 3) for t in times]}, {epochs_run} epochs)",
        file=sys.stderr,
    )
    _report_mfu(label, _matmul_params(net.params), split, epochs_run,
                n_cells, 32, t_run)
    return n_cells / wall


def main():
    # stdout carries EXACTLY one JSON line (driver contract); the pipeline's
    # informational prints (read_dataset etc.) go to stderr instead
    with contextlib.redirect_stdout(sys.stderr):
        result, cps_big = _run_all()
    if cps_big is not None:
        print(
            f"bench[2730x3451]: {cps_big:.1f} cells/s end-to-end "
            f"(vs 59 cells/s reference baseline: {cps_big / 59.0:.1f}x)",
            file=sys.stderr,
        )
    print(json.dumps(result))


def _run_all():
    # 1. tutorial workload -> the JSON contract line
    cells_per_sec = run_config(make_splatter_like(2000, 200)[0], "2000x200")
    baseline = 2000.0 / 24.0  # tutorial.ipynb cell 11: 24 s end-to-end on CPU
    result = {
        "metric": "end_to_end_train_denoise_cells_per_sec_2000x200_steady",
        "value": round(cells_per_sec, 1),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_sec / baseline, 1),
    }

    # 2. Paul15 shape (3.4k genes) -> stderr (baseline 59 cells/s on CPU)
    cps_big = None
    if not os.environ.get("DCA_TPU_BENCH_SKIP_BIG"):
        try:
            cps_big = run_config(make_paul15_like(), "2730x3451")
        except Exception as e:  # the JSON contract line must still be emitted
            print(f"bench[2730x3451]: FAILED {e!r}", file=sys.stderr)
    return result, cps_big


if __name__ == "__main__":
    main()
