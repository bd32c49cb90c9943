"""Large-batch convergence parity A/B (VERDICT r3 item 2).

The reference trains at batch 32 (/root/reference/dca/train.py:96) — a
CPU-era choice; on a TPU the step is latency-bound and a much larger batch
amortizes dispatch + feeds the MXU.  Before large batch can be the
recommended corpus-scale mode, it must CONVERGE like batch 32: this script
fits the Paul15-shape workload at batch 32 (lr 1e-3) and at BATCH
(lr 1e-3*sqrt(BATCH/32), RMSprop sqrt-scaling) with the full reference
callback stack (early stop 15 / reduce_lr 10, validation_split 0.1) and
reports, per arm: epochs run, best val loss, and final val loss.

Parity criterion used in docs/benchmarks.md: best val loss within 1%
and early-stop behavior of the same character (both stop, neither
diverges).

Run (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/batch_convergence_ab.py
Env: BATCH (default 1024), CELLS (default 2730), GENES (default 3451).
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(msg):
    print(f"batch_ab: {msg}", file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import pandas as pd

    from bench import make_paul15_like
    from dca_tpu.data import normalize, read_dataset
    from dca_tpu.data.adata import AnnData
    from dca_tpu.models import AE_types
    from dca_tpu.train import train

    n_cells = int(os.environ.get("CELLS", 2730))
    n_genes = int(os.environ.get("GENES", 3451))
    big = int(os.environ.get("BATCH", 1024))
    counts = make_paul15_like(n_cells, n_genes)

    def fit(batch, lr):
        ad = AnnData(
            counts.copy(),
            pd.DataFrame(index=pd.RangeIndex(n_cells).astype(str)),
            pd.DataFrame(index=pd.RangeIndex(n_genes).astype(str)),
        )
        ad = normalize(read_dataset(ad, check_counts=False))
        net = AE_types["nb-conddisp"](input_size=n_genes, seed=0)
        net.build()
        t0 = time.time()
        hist = train(ad, net, epochs=300, batch_size=batch, learning_rate=lr,
                     verbose=False, seed=0)
        dt = time.time() - t0
        v = hist.history.get("val_loss", hist.history["loss"])
        return dict(batch=batch, lr=lr if lr else 1e-3, epochs=len(v),
                    best_val=round(float(np.min(v)), 5),
                    final_val=round(float(v[-1]), 5), wall_s=round(dt, 1))

    a = fit(32, None)
    log(f"batch 32:  {a}")
    b = fit(big, 1e-3 * (big / 32.0) ** 0.5)
    log(f"batch {big}: {b}")
    rel = abs(b["best_val"] - a["best_val"]) / abs(a["best_val"])
    log(f"RESULT {dict(small=a, large=b, best_val_rel_diff=round(rel, 4))}")


if __name__ == "__main__":
    main()
