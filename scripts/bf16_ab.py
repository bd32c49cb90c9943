"""A/B the DCA_TPU_MATMUL bf16 mode on the real chip at the Paul15 shape.

Times the steady-state full fit (300-epoch bound, early stop, batch 32 —
the bench's exact configuration) with f32 vs bf16 matmul operands, and
compares the resulting loss trajectories so the speed number comes with a
numerics check.  Run with the default (TPU) environment:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_ab.py
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
from bench import make_paul15_like  # noqa: E402


def run(mode: str):
    os.environ["DCA_TPU_MATMUL"] = mode
    import pandas as pd

    from dca_tpu.data.adata import AnnData
    from dca_tpu.data import read_dataset, normalize
    from dca_tpu.models import AE_types
    from dca_tpu.train.optim import get_optimizer
    from dca_tpu.train.compiled import build_fit_fn

    counts = make_paul15_like()
    n_cells, n_genes = counts.shape
    ad = AnnData(
        counts.copy(),
        pd.DataFrame(index=pd.Index([f"c{i}" for i in range(n_cells)])),
        pd.DataFrame(index=pd.Index([f"g{i}" for i in range(n_genes)])),
    )
    ad = normalize(read_dataset(ad, check_counts=False))

    net = AE_types["nb-conddisp"](input_size=n_genes, seed=0)
    net.build()
    opt = get_optimizer("RMSprop", clipvalue=5.0)
    X = np.asarray(ad.X, np.float32)
    T = np.asarray(ad.raw.X, np.float32)
    SF = np.asarray(ad.obs["size_factors"], np.float32)
    split = int(n_cells * 0.9)
    fit = jax.jit(
        build_fit_fn(
            net, opt, n_train=split, batch_size=32, epochs=300, has_val=True,
            reduce_lr=10, early_stop=15, track_best=False,
        )
    )
    args = (
        net.params, net.state, opt.init(net.params),
        jnp.asarray(X[:split]), jnp.asarray(T[:split]), jnp.asarray(SF[:split]),
        jnp.asarray(X[split:]), jnp.asarray(T[split:]), jnp.asarray(SF[split:]),
        jnp.float32(1e-3), jax.random.PRNGKey(0),
    )

    t0 = time.perf_counter()
    out = fit(*args)
    np.asarray(out[5])  # force sync on a result array
    print(f"[{mode}] warm pass {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = fit(*args)
    val_hist = np.asarray(out[5])
    loss_hist = np.asarray(out[4])
    t = time.perf_counter() - t0
    epochs = int(out[7])
    return {
        "mode": mode,
        "fit_s": round(t, 3),
        "epochs": epochs,
        "s_per_epoch": round(t / max(epochs, 1), 4),
        "final_train_loss": float(loss_hist[epochs - 1]),
        "final_val_loss": float(val_hist[epochs - 1]),
    }


def main():
    rows = [run("f32"), run("bf16")]
    for r in rows:
        print(json.dumps(r))
    sp = rows[0]["s_per_epoch"] / rows[1]["s_per_epoch"]
    print(
        f"bf16 speedup: {sp:.2f}x per epoch; "
        f"val loss f32={rows[0]['final_val_loss']:.4f} "
        f"bf16={rows[1]['final_val_loss']:.4f}"
    )


if __name__ == "__main__":
    main()
