"""TPU smoke: fused Pallas ZINB kernel vs XLA reference, correctness + timing."""
import time, sys
import numpy as np
import jax
import jax.numpy as jnp

from dca_tpu import losses
from dca_tpu.ops.fused_loss import zinb_nll_fused

print("devices:", jax.devices(), flush=True)

B, G = 1024, 4096
rs = np.random.RandomState(0)
y = jnp.asarray(rs.negative_binomial(2, 0.4, size=(B, G)).astype(np.float32))
mu = jnp.asarray(rs.uniform(0.1, 8.0, size=(B, G)).astype(np.float32))
th = jnp.asarray(rs.uniform(0.1, 5.0, size=(B, G)).astype(np.float32))
pi = jnp.asarray(rs.uniform(0.05, 0.7, size=(B, G)).astype(np.float32))

ref_fn = jax.jit(lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05))
fused_fn = jax.jit(lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False))
ref_grad = jax.jit(jax.grad(lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05), argnums=(0, 1, 2)))
fused_grad = jax.jit(jax.grad(lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False), argnums=(0, 1, 2)))

print("compiling ref fwd...", flush=True)
r = float(ref_fn(mu, th, pi)); print("compiling fused fwd...", flush=True)
f = float(fused_fn(mu, th, pi))
print(f"forward: ref={r:.6f} fused={f:.6f} relerr={abs(r-f)/abs(r):.2e}")

print("compiling ref grad...", flush=True)
rg = ref_grad(mu, th, pi); print("compiling fused grad...", flush=True)
fg = fused_grad(mu, th, pi)
for name, a, b in zip(("dmu", "dth", "dpi"), rg, fg):
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    print(f"grad {name}: relerr={err:.2e}")

def timeit(fn, *args, n=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

print(f"fwd ms: ref={timeit(ref_fn, mu, th, pi):.3f} fused={timeit(fused_fn, mu, th, pi):.3f}")
print(f"grad ms: ref={timeit(ref_grad, mu, th, pi):.3f} fused={timeit(fused_grad, mu, th, pi):.3f}")
