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

# ---------------------------------------------------------------------------
# fused dense block + on-chip densify
# ---------------------------------------------------------------------------

from dca_tpu.ops.fused_dense import fused_dense_block
from dca_tpu.ops.densify import densify_csr

K, N = 64, G
xw = jnp.asarray(rs.normal(size=(B, K)).astype(np.float32))
w = jnp.asarray((rs.normal(size=(K, N)) * 0.1).astype(np.float32))
b = jnp.asarray((rs.normal(size=(N,)) * 0.1).astype(np.float32))
sf = jnp.asarray(rs.uniform(0.5, 2.0, size=(B,)).astype(np.float32))

head_ref = jax.jit(lambda x: jnp.clip(jnp.exp(x @ w + b), 1e-5, 1e6) * sf[:, None])
head_fused = jax.jit(lambda x: fused_dense_block(x, w, b, activation="mean",
                                                 size_factors=sf))
print("compiling fused dense head...", flush=True)
a = head_ref(xw); c = head_fused(xw)
err = float(jnp.max(jnp.abs(a - c)) / (float(jnp.max(jnp.abs(a))) + 1e-12))
print(f"fused dense head: relerr={err:.2e}")
print(f"head ms: ref={timeit(head_ref, xw):.3f} fused={timeit(head_fused, xw):.3f}")

import scipy.sparse as sp
m = sp.random(256, G, density=0.1, format="csr",
              random_state=np.random.RandomState(1),
              data_rvs=lambda n: np.random.RandomState(2).poisson(3.0, n) + 1.0)
m.sort_indices()
print("compiling densify...", flush=True)
d = np.asarray(densify_csr(m.indptr, m.indices, m.data, G))
derr = float(np.abs(d - m.toarray()).max())
print(f"densify on-chip: maxerr={derr:.1e}")

# ---------------------------------------------------------------------------
# broadcast theta/pi operands ((1,G) constant disp / (B,1) shared) — the
# round-4 in-tile broadcast paths must compile + agree on real Mosaic
# ---------------------------------------------------------------------------

from dca_tpu.ops.fused_loss import nb_nll_fused

for th_s, pi_s in [((1, G), (B, G)), ((B, 1), (B, 1)), ((1, G), (1, G))]:
    thb = jnp.asarray(rs.uniform(0.1, 5.0, size=th_s).astype(np.float32))
    pib = jnp.asarray(rs.uniform(0.05, 0.7, size=pi_s).astype(np.float32))
    rfn = jax.jit(lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05))
    ffn = jax.jit(lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False))
    print(f"compiling broadcast zinb th{th_s} pi{pi_s}...", flush=True)
    r = float(rfn(mu, thb, pib)); f = float(ffn(mu, thb, pib))
    print(f"bcast zinb th{th_s} pi{pi_s}: relerr={abs(r-f)/abs(r):.2e}")
    rg = jax.jit(jax.grad(lambda m, t, p: losses.zinb_nll(y, m, t, p, ridge_lambda=0.05), argnums=(0,1,2)))(mu, thb, pib)
    fg = jax.jit(jax.grad(lambda m, t, p: zinb_nll_fused(y, m, t, p, 0.05, False), argnums=(0,1,2)))(mu, thb, pib)
    for name, a_, b_ in zip(("dmu","dth","dpi"), rg, fg):
        err = float(jnp.max(jnp.abs(a_-b_))/(float(jnp.max(jnp.abs(a_)))+1e-12))
        print(f"  bcast grad {name}: relerr={err:.2e}  shape={tuple(b_.shape)}")

thb = jnp.asarray(rs.uniform(0.1, 5.0, size=(1, G)).astype(np.float32))
rn = float(jax.jit(lambda m, t: losses.nb_nll(y, m, t))(mu, thb))
fn_ = float(jax.jit(lambda m, t: nb_nll_fused(y, m, t, 1.0, False))(mu, thb))
print(f"bcast nb th(1,G): relerr={abs(rn-fn_)/abs(rn):.2e}")

# ---------------------------------------------------------------------------
# weighted kernels (round 5: sample_weights keeps auto-padded multi-process
# parts on the fused path) — must compile + agree on real Mosaic
# ---------------------------------------------------------------------------

from dca_tpu.ops.fused_loss import zinb_nll_fused_w, nb_nll_fused_w

wv = rs.uniform(0.2, 2.0, size=(B,)).astype(np.float32)
wv[:7] = 0.0  # pad-row semantics: zero-weight rows exactly ignored
w1 = jnp.asarray(wv)      # losses.* takes (B,)
wj = w1[:, None]          # fused kernels take the (B, 1) weight column
print("compiling weighted zinb...", flush=True)
rw = float(jax.jit(lambda m, t, p: losses.zinb_nll(
    y, m, t, p, ridge_lambda=0.05, sample_weights=w1))(mu, th, pi))
fw = float(jax.jit(lambda m, t, p: zinb_nll_fused_w(
    y, m, t, p, wj, 0.05, False))(mu, th, pi))
print(f"weighted zinb: relerr={abs(rw-fw)/abs(rw):.2e}")
rgw = jax.jit(jax.grad(lambda m, t, p: losses.zinb_nll(
    y, m, t, p, ridge_lambda=0.05, sample_weights=w1), argnums=(0, 1, 2)))(mu, th, pi)
fgw = jax.jit(jax.grad(lambda m, t, p: zinb_nll_fused_w(
    y, m, t, p, wj, 0.05, False), argnums=(0, 1, 2)))(mu, th, pi)
for name, a_, b_ in zip(("dmu", "dth", "dpi"), rgw, fgw):
    err = float(jnp.max(jnp.abs(a_ - b_)) / (float(jnp.max(jnp.abs(a_))) + 1e-12))
    print(f"  weighted grad {name}: relerr={err:.2e}")
rwn = float(jax.jit(lambda m, t: losses.nb_nll(
    y, m, t, sample_weights=w1))(mu, thb))
fwn = float(jax.jit(lambda m, t: nb_nll_fused_w(
    y, m, t, wj, False))(mu, thb))
print(f"weighted nb th(1,G): relerr={abs(rwn-fwn)/abs(rwn):.2e}")
print("TPU smoke complete", flush=True)
