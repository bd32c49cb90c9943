"""A/B DCA_TPU_MATMUL on the wide-panel inference path: the full-matrix
denoising forward (B cells x G genes, nb-conddisp heads) where the MXU
rate and the 64xG weight-stream bandwidth dominate.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bf16_predict_ab.py
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


def run(mode, B, G, reps=20):
    os.environ["DCA_TPU_MATMUL"] = mode
    os.environ.setdefault("DCA_TPU_FUSED_DENSE", "0")  # isolate the XLA path
    from dca_tpu.models import AE_types, core

    net = AE_types["nb-conddisp"](input_size=G, seed=0)
    net.build()
    definition = net.definition

    @jax.jit
    def predict(params, state, x, sf):
        out, _ = core.apply(definition, params, state, x, sf, training=False)
        return out["output"]

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.normal(size=(B, G)).astype(np.float32))
    sf = jnp.asarray(np.exp(rs.normal(0, 0.2, size=(B,))).astype(np.float32))

    np.asarray(predict(net.params, net.state, x, sf))  # warm (remote compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = predict(net.params, net.state, x, sf)
    np.asarray(y)
    dt = (time.perf_counter() - t0) / reps
    return {"mode": mode, "B": B, "G": G, "ms": round(dt * 1e3, 3),
            "cells_per_s": round(B / dt)}


def main():
    import ast

    shapes = ast.literal_eval(os.environ.get(
        "BF16_AB_SHAPES", "[(2730, 3451), (4096, 16384)]"))
    for B, G in shapes:
        rows = [run(m, B, G) for m in ("f32", "bf16")]
        for r in rows:
            print(json.dumps(r))
        print(f"B={B} G={G}: bf16 {rows[0]['ms'] / rows[1]['ms']:.2f}x",
              file=sys.stderr)


if __name__ == "__main__":
    main()
