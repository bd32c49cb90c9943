"""Full-transcriptome end-to-end measurement: 50k cells x 28k genes
(VERDICT r3 item 1 "Done" criterion: a measured >= 20k-gene workload row).

Synthetic 10x-like CSR counts (~8% density), ``normalize(lazy_scale=True)``,
flagship zinb-conddisp, the streaming trainer with on-device densify.
Measures:

  * steady streaming epoch at batch 32 (reference default) with the
    round-4 double-buffered staging ON vs OFF (DCA_TPU_PREFETCH A/B);
  * steady streaming epoch at batch 1024 (large-batch corpus mode,
    lr = 1e-3*sqrt(1024/32));
  * the denoise forward over the full matrix (chunked, output fetched).

JSON lines to scripts/wide_e2e_results.json + stdout.  First epoch of each
program set is the remote-compile warm-up; steady numbers are medians of
the later epochs.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/wide_e2e.py
Env: N_CELLS (default 50_000), N_GENES (default 28672), EPOCHS/arm
(default 3), ARMS (default "b32,b32_noprefetch,b1024,predict").
"""

import json
import os
import resource
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N_CELLS = int(os.environ.get("N_CELLS", 50_000))
N_GENES = int(os.environ.get("N_GENES", 28672))
EPOCHS = int(os.environ.get("EPOCHS", 3))
CACHE = "/root/repo/.scale_cache"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "wide_e2e_results.json")


def log(msg):
    print(f"wide_e2e: {msg}", file=sys.stderr, flush=True)


def record(name, **kw):
    row = {"name": name, **kw}
    print(json.dumps(row), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


def make_counts_csr(n_cells=N_CELLS, n_genes=N_GENES, seed=11, block=8192):
    """Blockwise sparse sampling -> CSR at ~8% density (cached); same
    10x-like structure as scripts/scale_1p3m.py."""
    tag = os.path.join(CACHE, f"csr_{n_cells}x{n_genes}_s{seed}")
    if os.path.exists(tag + ".indptr.npy"):
        log("loading cached CSR")
        return sp.csr_matrix(
            (np.load(tag + ".data.npy"), np.load(tag + ".indices.npy"),
             np.load(tag + ".indptr.npy")), shape=(n_cells, n_genes))
    os.makedirs(CACHE, exist_ok=True)
    rs = np.random.RandomState(seed)
    p_gene = np.clip(rs.gamma(1.2, 0.068, size=n_genes), 1e-4, 0.9).astype(
        np.float32)
    indptr_parts = [np.zeros(1, np.int64)]
    indices, data = [], []
    nnz_total = 0
    t0 = time.time()
    for lo in range(0, n_cells, block):
        b = min(block, n_cells - lo)
        depth = np.clip(rs.lognormal(0.0, 0.4, size=(b, 1)).astype(np.float32),
                        0.2, 4.0)
        mask = rs.random_sample((b, n_genes)).astype(np.float32) < (p_gene * depth)
        mask[:, 0] = True
        rows, cols = np.nonzero(mask)
        vals = rs.geometric(0.45, size=rows.size).astype(np.float32)
        counts_per_row = np.bincount(rows, minlength=b).astype(np.int64)
        indptr_parts.append(np.cumsum(counts_per_row) + nnz_total)
        indices.append(cols.astype(np.int32))
        data.append(vals)
        nnz_total += rows.size
        log(f"gen {lo + b}/{n_cells} rows density "
            f"{nnz_total / ((lo + b) * n_genes):.3f}")
    X = sp.csr_matrix(
        (np.concatenate(data), np.concatenate(indices),
         np.concatenate(indptr_parts)), shape=(n_cells, n_genes))
    log(f"generated nnz={X.nnz} density={X.nnz / np.prod(X.shape):.3f} "
        f"in {time.time() - t0:.0f}s")
    np.save(tag + ".data.npy", X.data)
    np.save(tag + ".indices.npy", X.indices)
    np.save(tag + ".indptr.npy", X.indptr)
    return X


def main():
    import pandas as pd

    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    arms = os.environ.get(
        "ARMS", "b32,b32_noprefetch,b1024,predict").split(",")
    X = make_counts_csr()
    n_cells = X.shape[0]

    t0 = time.time()
    ad = AnnData(
        X,
        pd.DataFrame(index=pd.RangeIndex(n_cells).astype(str)),
        pd.DataFrame(index=pd.RangeIndex(N_GENES).astype(str)),
    )
    ad = read_dataset(ad, check_counts=False)
    ad = normalize(ad, lazy_scale=True)
    t_pre = time.time() - t0
    log(f"preprocess (sparse, lazy scale): {t_pre:.1f}s")
    assert sp.issparse(ad.X)

    net = AE_types["zinb-conddisp"](input_size=ad.n_vars, seed=0)
    net.build()

    def epochs_arm(name, batch, lr, prefetch):
        os.environ["DCA_TPU_PREFETCH"] = "1" if prefetch else "0"
        times = []
        for e in range(EPOCHS):
            t0 = time.time()
            train(ad, net, epochs=1, early_stop=0, reduce_lr=0,
                  validation_split=0.0, verbose=False, seed=e,
                  max_device_cells=16384, batch_size=batch, learning_rate=lr)
            dt = time.time() - t0
            times.append(dt)
            log(f"{name} epoch {e}: {dt:.1f}s ({n_cells / dt:.0f} cells/s)"
                + ("  [warm]" if e == 0 else ""))
        steady = float(np.median(times[1:])) if len(times) > 1 else times[0]
        record(name, n_cells=n_cells, n_genes=N_GENES, batch=batch,
               epoch_s=round(steady, 2),
               cells_per_s=round(n_cells / steady, 1),
               warm_s=round(times[0], 1))

    for arm in arms:
        if arm == "b32":
            epochs_arm("wide_epoch_b32_prefetch", 32, None, True)
        elif arm == "b32_noprefetch":
            epochs_arm("wide_epoch_b32_noprefetch", 32, None, False)
        elif arm == "b1024":
            epochs_arm("wide_epoch_b1024_prefetch", 1024,
                       1e-3 * (1024 / 32.0) ** 0.5, True)
        elif arm == "predict":
            sm = np.asarray(ad.uns["dca_scale_mean"], np.float32)
            ss = np.asarray(ad.uns["dca_scale_std"], np.float32)
            sf = np.asarray(ad.obs["size_factors"], np.float32)
            t0 = time.time()
            out = net.forward(ad.X, sf, scale_mean=sm, scale_std=ss,
                              chunk_rows=8192, keys=("output",))
            dt = time.time() - t0
            assert np.all(np.isfinite(out["output"][:100]))
            record("wide_denoise_predict", n_cells=n_cells, n_genes=N_GENES,
                   predict_s=round(dt, 2),
                   cells_per_s=round(n_cells / dt, 1))
        elif arm in ("write_tsv", "write_h5ad"):
            # full denoise->write leg (VERDICT r4 item 1): block-pipelined
            # predict streamed straight into the incremental writers
            fmt = arm.split("_")[1]
            outdir = os.path.join(CACHE, f"out_wide_{fmt}")
            t0 = time.time()
            net.write_streaming(ad, outdir, mode="denoise",
                                output_format=fmt)
            dt = time.time() - t0
            import glob as _glob

            sizes = {os.path.basename(p): os.path.getsize(p)
                     for p in _glob.glob(os.path.join(outdir, "*"))}
            record(f"wide_denoise_write_{fmt}", n_cells=n_cells,
                   n_genes=N_GENES, write_s=round(dt, 2),
                   cells_per_s=round(n_cells / dt, 1),
                   gb_written=round(sum(sizes.values()) / 1e9, 2))
            log(f"write[{fmt}] files={sizes}")
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    record("wide_e2e_summary", preprocess_s=round(t_pre, 1),
           peak_host_rss_gb=round(rss, 1))


if __name__ == "__main__":
    main()
