"""Where does 'ship' time go — transfer or scatter? And can the scatter be
faster while staying EXACT on this platform?

The round-4 breakdown showed ship(flat, 202 MB) == ship(flat8, 101 MB):
byte count is not the bottleneck.  This probe stages one 131k-row part's
flat payload, then times ON-DEVICE-RESIDENT variants separately:

  transfer   — payload host->HBM only
  scatter_add     — the current .at[rows, cols].add(vals, mode='drop')
  scatter_set     — .at[].set (updates are unique by construction)
  add_sorted      — add + indices_are_sorted=True ONLY (the platform bug
                    was measured with BOTH hints; sorted-alone is tested
                    for exactness here against the hintless result over
                    several parts before it could ever be trusted)
  add_both_hints  — both hints (expected to DROP updates per the known
                    platform bug; exactness check documents it)

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/scatter_probe.py
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
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"probe: {msg}", file=sys.stderr, flush=True)


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "variant"))
def scatter(counts, col_ids, vals, n_rows, n_cols, variant):
    L = col_ids.shape[0]
    row_ids = jnp.repeat(jnp.arange(n_rows + 1, dtype=jnp.int32), counts,
                         total_repeat_length=L)
    col_ids = col_ids.astype(jnp.int32)
    vals = vals.astype(jnp.float32)
    z = jnp.zeros((n_rows, n_cols), jnp.float32)
    at = z.at[row_ids, col_ids]
    if variant == "add":
        out = at.add(vals, mode="drop")
    elif variant == "set":
        out = at.set(vals, mode="drop")
    elif variant == "add_sorted":
        out = z.at[row_ids, col_ids].add(vals, mode="drop",
                                         indices_are_sorted=True)
    elif variant == "set_sorted":
        out = z.at[row_ids, col_ids].set(vals, mode="drop",
                                         indices_are_sorted=True)
    elif variant == "add_both":
        out = z.at[row_ids, col_ids].add(vals, mode="drop",
                                         indices_are_sorted=True,
                                         unique_indices=True)
    else:
        raise ValueError(variant)
    # scalar checksums: value sum + position-weighted sum (catches drops
    # AND misplacement) — only 16 bytes cross the tunnel
    w = (jnp.arange(n_rows, dtype=jnp.float32)[:, None] % 97.0 + 1.0) * (
        jnp.arange(n_cols, dtype=jnp.float32)[None, :] % 89.0 + 1.0)
    return jnp.sum(out), jnp.sum(out * w)


def main():
    from scale_1p3m import make_counts_csr
    from dca_tpu.ops.densify import flat_payload_from_csr, flat_slots_for

    X = make_counts_csr()
    G = X.shape[1]
    rs = np.random.RandomState(1)
    results = []
    for part in range(3):
        rows = rs.choice(X.shape[0], 131072, replace=False)
        L = flat_slots_for(X, rows)
        counts, c, v = flat_payload_from_csr(X, rows, L, int_vals=True)
        B = len(rows)

        # transfer only
        t0 = time.perf_counter()
        cd = jnp.asarray(counts)
        cold = jnp.asarray(c)
        vd = jnp.asarray(v)
        np.asarray(jnp.sum(vd.astype(jnp.float32)))
        t_xfer = time.perf_counter() - t0

        row = {"part": part, "L": int(L),
               "mb": round((counts.nbytes + c.nbytes + v.nbytes) / 1e6, 1),
               "transfer_s": round(t_xfer, 2)}
        checks = {}
        for variant in ("add", "set", "add_sorted", "set_sorted", "add_both"):
            t0 = time.perf_counter()
            s1, s2 = scatter(cd, cold, vd, B, G, variant)
            s1, s2 = float(s1), float(s2)
            dt = time.perf_counter() - t0
            checks[variant] = (s1, s2)
            row[variant + "_s"] = round(dt, 2)
            row[variant + "_exact"] = bool(
                checks[variant] == checks["add"])
        results.append(row)
        log(json.dumps(row))
    # steady medians (part 0 carries compiles)
    steady = results[1:]
    med = {k: round(float(np.median([r[k] for r in steady])), 2)
           for k in steady[0] if k.endswith("_s")}
    exact = {k: all(r[k] for r in results) for k in steady[0]
             if k.endswith("_exact")}
    print(json.dumps({"name": "scatter_probe_131072x3451", **med, **exact}),
          flush=True)


if __name__ == "__main__":
    main()
