"""Real-chip check: fused Pallas dense block COMPILED with bf16 operands.

ADVICE r2 item 2: the bf16+fused-dense combination auto-engages on TPU for
wide panels but had only ever run in interpret mode on CPU; Mosaic's bf16
tile needs 16-row sublane multiples (fused_dense rounds BM up accordingly
since round 3).  This script compiles the kernel on the actual TPU for the
shapes that matter — including the small-batch B=8 case the advisor
flagged — and checks outputs against the XLA path within bf16 input
precision.

Run:  PYTHONPATH=/root/repo:/root/.axon_site \
      DCA_TPU_MATMUL=bf16 python scripts/fused_dense_bf16_smoke.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

os.environ.setdefault("DCA_TPU_MATMUL", "bf16")

from dca_tpu.ops.fused_dense import fused_dense_block

print("devices:", jax.devices(), "DCA_TPU_MATMUL:", os.environ["DCA_TPU_MATMUL"],
      flush=True)

rs = np.random.RandomState(0)
ok = True
for B, K, N in [(8, 64, 10240), (33, 64, 10240), (2048, 64, 10240)]:
    x = rs.normal(size=(B, K)).astype(np.float32)
    w = (rs.normal(size=(K, N)) * 0.1).astype(np.float32)
    b = (rs.normal(size=(N,)) * 0.1).astype(np.float32)
    sf = rs.uniform(0.5, 2.0, size=(B,)).astype(np.float32)

    print(f"compiling fused B={B} N={N} ...", flush=True)
    t0 = time.perf_counter()
    got = np.asarray(fused_dense_block(x, w, b, activation="mean",
                                       size_factors=sf, interpret=False))
    print(f"  compiled+ran in {time.perf_counter() - t0:.1f}s", flush=True)

    # XLA reference with the same bf16 operand rounding
    xd = jnp.asarray(x).astype(jnp.bfloat16)
    wd = jnp.asarray(w).astype(jnp.bfloat16)
    z = jnp.dot(xd, wd, preferred_element_type=jnp.float32) + b
    ref = np.asarray(jnp.clip(jnp.exp(z), 1e-5, 1e6) * sf[:, None])

    err = np.max(np.abs(got - ref) / (np.abs(ref) + 1e-3))
    finite = np.isfinite(got).all()
    print(f"  B={B}: max relerr vs bf16-XLA {err:.2e}, finite={finite}",
          flush=True)
    ok &= bool(finite) and err < 5e-2

    # steady-state timing (second run onward)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fused_dense_block(x, w, b, activation="mean",
                                size_factors=sf, interpret=False)
    np.asarray(out)
    print(f"  10 calls: {(time.perf_counter() - t0) * 100:.1f} ms/call",
          flush=True)

print("RESULT", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
