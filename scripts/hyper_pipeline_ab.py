"""Single-chip hyper-trial pipelining A/B (VERDICT r4 item 6).

Runs the SAME seeded TPE search twice on the real chip — sequential
(n_parallel=1) vs 2-thread pipelined (n_parallel=2, the new single-chip
default) — and reports wall time and trials/hour.  The pipelined search
must select the identical best config (the batched suggest/observe
protocol is deterministic); the win comes from overlapping trial k+1's
host prep + tracing + remote-compile round trip behind trial k's device
execution.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
           python scripts/hyper_pipeline_ab.py
Env: TRIALS (default 10), HYPEREPOCH (default 20), CELLS/GENES (400/60).
"""

import json
import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(m):
    print(f"hyper_ab: {m}", file=sys.stderr, flush=True)


def main():
    import pandas as pd

    from dca_tpu.data.adata import AnnData
    from dca_tpu.hyper import hyper_search, tpu_space

    trials = int(os.environ.get("TRIALS", 10))
    hyperepoch = int(os.environ.get("HYPEREPOCH", 20))
    n, g = int(os.environ.get("CELLS", 400)), int(os.environ.get("GENES", 60))

    rs = np.random.RandomState(0)
    mu = rs.gamma(2.0, 1.0, (1, g)) * rs.lognormal(0, 0.3, (n, 1)) * 3
    counts = rs.negative_binomial(2.0, 2.0 / (2.0 + mu)).astype(np.float32)
    counts[rs.uniform(size=counts.shape) < 0.3] = 0
    counts[0, :] += 1
    counts[:, 0] += 1
    ad = AnnData(
        counts,
        pd.DataFrame(index=pd.RangeIndex(n).astype(str)),
        pd.DataFrame(index=pd.RangeIndex(g).astype(str)),
    )

    space = tpu_space(hyperepoch)
    results = {}
    for name, n_par in (("sequential", 1), ("pipelined2", 2)):
        out = f"/tmp/hyper_ab_{name}"
        t0 = time.time()
        best_cfg, best_loss, trs = hyper_search(
            ad.copy(), n_trials=trials, hyperepoch=hyperepoch,
            output_dir=out, seed=0, space=space, verbose=False,
            n_parallel=n_par,
        )
        dt = time.time() - t0
        results[name] = dict(wall_s=round(dt, 1),
                             trials_per_hour=round(3600 * len(trs) / dt, 1),
                             best_loss=round(float(best_loss), 5),
                             best_cfg=str(best_cfg))
        log(f"{name}: {dt:.1f}s for {len(trs)} evals "
            f"({3600 * len(trs) / dt:.0f} trials/h) best={best_loss:.5f}")
    same = results["sequential"]["best_cfg"] == results["pipelined2"]["best_cfg"]
    speedup = results["sequential"]["wall_s"] / results["pipelined2"]["wall_s"]
    print(json.dumps(dict(results=results, same_best_config=same,
                          speedup=round(speedup, 2))), flush=True)


if __name__ == "__main__":
    main()
