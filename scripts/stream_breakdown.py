"""Streaming-pipeline breakdown at the 1.3M-cell scale (VERDICT r3 item 3).

Times the three stages of one staged part SEPARATELY on the real chip:

  host  — C++ payload build (StreamingData.materialize: flat/padded
          payload from CSR, ship-one-payload mode like the trainer),
  ship  — payload transfer + on-device scatter/derive (sync'd),
  train — the compiled scan over the part's minibatches (sync'd),

for a few 131072-cell parts of the cached 1.3M corpus, plus the measured
epoch totals with prefetch on/off — together these show how much of
host+ship the double-buffer hides behind train, and which stage is the
epoch floor.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python scripts/stream_breakdown.py
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"breakdown: {msg}", file=sys.stderr, flush=True)


def main():
    import pandas as pd

    from scale_1p3m import make_counts_csr
    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train.optim import get_optimizer

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    X = make_counts_csr()
    n_cells = X.shape[0]
    ad = AnnData(
        X,
        pd.DataFrame(index=pd.RangeIndex(n_cells).astype(str)),
        pd.DataFrame(index=pd.RangeIndex(X.shape[1]).astype(str)),
    )
    ad = read_dataset(ad, check_counts=False)
    ad = normalize(ad, lazy_scale=True)

    # rebuild exactly the trainer's staging stack (train/loop.py
    # _train_streaming, single-process, device densify, derive-input)
    import scipy.sparse as sp
    from dca_tpu.data.loader import StreamingData
    from dca_tpu.ops.densify import device_densify_flat
    from dca_tpu.train.loop import _derivable_row_scale

    sm = np.asarray(ad.uns["dca_scale_mean"], np.float32)
    ss = np.asarray(ad.uns["dca_scale_std"], np.float32)
    sf = np.asarray(ad.obs["size_factors"], np.float32)
    Xc = ad.X
    T = ad.raw.X
    m = _derivable_row_scale(Xc, T)
    log(f"derive-input mode: {'ON' if m is not None else 'off'}")
    chunk = 131072 // 32 * 32
    sds = {}
    for pm in ("flat", "flat8"):
        sd = StreamingData(Xc, T, sf, chunk, sm, ss, device_densify=True,
                           payload_mode=pm, derive_input=m is not None)
        sd.derive_m = m
        sds[pm] = sd
    sd = sds["flat"]

    net = AE_types["nb-conddisp"](input_size=ad.n_vars, seed=0)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)
    loss_fn = net.loss_fn
    bs = 32

    def chunk_fn(params, state, opt_state, Xd, Td, SFd, lr, rng):
        nb = Xd.shape[0] // bs

        def body(carry, i):
            params, state, opt_state = carry
            lo = i * bs
            xb = jax.lax.dynamic_slice_in_dim(Xd, lo, bs, 0)
            tb = jax.lax.dynamic_slice_in_dim(Td, lo, bs, 0)
            sfb = jax.lax.dynamic_slice_in_dim(SFd, lo, bs, 0)
            (l, s2), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, state, xb, sfb, tb, True, jax.random.fold_in(rng, i))
            params, opt_state = opt.update(g, opt_state, params, lr)
            return (params, s2, opt_state), l

        (params, state, opt_state), ls = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(nb, dtype=jnp.int32))
        return params, state, opt_state, jnp.sum(ls)

    chunk_j = jax.jit(chunk_fn)
    _derive = jax.jit(
        lambda t, mm, mu, sd_: (jnp.log1p(t * mm[:, None]) - mu) / sd_)

    params, state = net.params, net.state
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(0)
    perm = np.random.RandomState(0).permutation(n_cells)

    from dca_tpu.ops.densify import device_densify_flat8

    def payload_bytes(tc):
        arrs = ([tc.counts, tc.col, tc.val] if hasattr(tc, "col") else
                [tc.counts, tc.firstcol, tc.gaps, tc.vals, tc.gpos, tc.gval,
                 tc.vpos, tc.vval])
        return sum(a.nbytes for a in arrs)

    rows = {"flat": [], "flat8": []}
    parts = list(sd.index_chunks(perm))[:5]
    for k, idx in enumerate(parts):
        idx = idx[: len(idx) // bs * bs]
        # interleave the two encodings on every part: the tunnel drifts by
        # the minute, back-to-back ships are the only fair comparison
        for pm in ("flat", "flat8"):
            t0 = time.perf_counter()
            tc, _, sfc = sds[pm].materialize(idx)
            t_host = time.perf_counter() - t0

            t0 = time.perf_counter()
            if pm == "flat":
                td = device_densify_flat(tc.counts, tc.col, tc.val,
                                         tc.n_rows, tc.n_cols)
            else:
                td = device_densify_flat8(tc)
            xd = _derive(td, jnp.asarray(m[idx], jnp.float32),
                         jnp.asarray(sm), jnp.asarray(ss))
            sfd = jnp.asarray(sfc)
            np.asarray(jnp.sum(xd))  # force transfer + scatter (sync)
            t_ship = time.perf_counter() - t0

            t0 = time.perf_counter()
            params, state, opt_state, s = chunk_j(
                params, state, opt_state, xd, td, sfd, jnp.float32(1e-3), rng)
            float(s)
            t_train = time.perf_counter() - t0
            row = dict(part=k, fmt=pm, rows=len(idx),
                       mb=round(payload_bytes(tc) / 1e6, 1),
                       host_s=round(t_host, 2), ship_s=round(t_ship, 2),
                       train_s=round(t_train, 2))
            rows[pm].append(row)
            log(json.dumps(row))

    n_parts = int(np.ceil(n_cells / chunk))
    for pm in ("flat", "flat8"):
        steady = rows[pm][1:]  # part 0 carries the remote compiles
        tot = {k: round(float(np.median([r[k] for r in steady])), 2)
               for k in ("host_s", "ship_s", "train_s")}
        print(json.dumps(dict(name=f"stream_breakdown_131072rows_{pm}",
                              mb=steady[-1]["mb"], **tot,
                              est_epoch_serial_s=round(
                                  sum(tot.values()) * n_parts, 1),
                              n_parts=n_parts)), flush=True)


if __name__ == "__main__":
    main()
