"""Attribute the resident-staging epoch cost: gather vs scatter.

The 1.3M x 3451 resident run measured ~90 s steady epochs against the
wire path's 29 s (docs/benchmarks.md round 5).  This probe times the
resident part program (cached from the scale run — same shapes/dtypes)
and a gather-only variant on the SAME resident corpus, so the
difference isolates the scatter+derive stage:

  full part   = row gather -> padded (B, K) payload -> scatter -> derive
  gather only = row gather -> reductions of idx/dat (no scatter)

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/resident_probe.py
Needs the cached 1.3M CSR from scripts/scale_1p3m.py.
"""

import functools
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def log(msg):
    print(f"resident_probe: {msg}", file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("K", "n_cols"))
def _gather_only(starts, lens, col, val, rows, K, n_cols):
    s = starts[rows]
    ln = lens[rows]
    k = jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], K), 1)
    mask = k < ln[:, None]
    offs = jnp.where(mask, s[:, None] + k, 0)
    idx = jnp.where(mask, col[offs].astype(jnp.int32), n_cols)
    dat = jnp.where(mask, val[offs].astype(jnp.float32), 0.0)
    # f32 sums: forces the gathers to happen without materializing
    # anything host-side bigger than two scalars
    return idx.astype(jnp.float32).sum(), dat.sum()


def main():
    from dca_tpu.ops.resident import ResidentCSR

    cache = "/root/repo/.scale_cache"
    tag = os.path.join(cache, "csr_1300000x3451_s7")
    if not os.path.exists(tag + ".indptr.npy"):
        log("no cached 1.3M CSR — run scripts/scale_1p3m.py first")
        return
    X = sp.csr_matrix(
        (np.load(tag + ".data.npy"), np.load(tag + ".indices.npy"),
         np.load(tag + ".indptr.npy")),
        shape=(1_300_000, 3451),
    )
    n, G = X.shape
    t0 = time.time()
    R = ResidentCSR(X, np.ones(n, np.float32), np.ones(n, np.float32),
                    np.zeros(G, np.float32), np.ones(G, np.float32))
    log(f"resident init+upload: {time.time() - t0:.1f}s  K={R.K}")

    B = 131072
    rs = np.random.RandomState(0)

    def reps(name, fn, k=5):
        times = []
        for i in range(k + 1):  # first is warm/compile
            rows = rs.permutation(n)[:B].astype(np.int32)
            t0 = time.time()
            out = fn(rows)
            for o in out:
                np.asarray(o)  # sync: retires the whole program
            dt = time.time() - t0
            times.append(dt)
            log(f"{name} rep{i}: {dt:.2f}s" + ("  [warm]" if i == 0 else ""))
        med = float(np.median(times[1:]))
        log(f"{name}: median {med:.2f}s/part  (x10 parts = {10 * med:.1f}s/epoch)")
        return med

    full = reps("full_part(slice-gather)", lambda rows: (R.part(rows)[2],))
    gath = reps("elementwise_gather_only", lambda rows: _gather_only(
        R.starts_d, R.lens_d, R.col_d, R.val_d, jnp.asarray(rows), R.K, G))
    log(f"RESULT full_slice={full:.2f}s elementwise_gather={gath:.2f}s "
        f"per {B}-row part "
        f"(K={R.K}, padded slots/part={B * R.K / 1e6:.0f}M, "
        f"nnz/part~={X.nnz / (n / B) / 1e6:.0f}M); first-probe baseline: "
        f"elementwise full_part 8.96s = gather 7.45s + scatter/derive 1.52s")


if __name__ == "__main__":
    main()
