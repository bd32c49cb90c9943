"""Runtime configuration knobs.

DCA_TPU_FUSED_LOSS: '1' force the fused Pallas NLL kernels, '0' force the
pure-JAX/XLA path, 'auto' (default) = fused on TPU backends only.

DCA_TPU_FUSED_DENSE: '1' force inference Dense->BN->activation blocks and
output-head epilogues through the fused Pallas kernel (ops/fused_dense.py);
'0' force plain XLA; 'auto' (default) = plain XLA at every width — the
round-4 width sweep (G up to 28672, scripts/wide_ab.py) measured parity
at <= 8k columns and a consistent ~0.87x regression at 16-28k, retiring
round 3's single-point >= 8192 crossover.  Equivalence-tested against the
XLA path either way.

DCA_TPU_MATMUL: 'bf16' rounds the trunk/head matmul INPUTS to bfloat16
while accumulating in float32 (the MXU's native mode — everything
downstream of each matmul stays f32: bias add, BN, activations, losses);
'f32' keeps full-precision matmuls everywhere.  'auto' (default) = f32
EVERYWHERE: at DCA's shapes (<=3.5k-gene panels, 64-32-64 trunk) the
epoch is dispatch/latency-bound, and the round-3 median-of-5 A/B on the
driver workloads measured f32 at 122.5x baseline where the round-2
bf16-default record was 63.5x (docs/benchmarks.md) — the rounding buys
nothing at these shapes while changing output numerics vs the
reference.  The round-4 width sweep (scripts/wide_ab.py: zinb-conddisp
train step, G up to 28672, batch 32 and 1024, median-of-5 twice)
measured bf16 within +-5% of f32 at EVERY width/batch — the step is
elementwise/NLL-bound, not matmul-bound, so the default stays f32 even
for full-transcriptome panels; convergence at the reference workloads
was validated in round 2 (same early-stop epoch, val loss equal to 4
decimals).

DCA_TPU_DEVICE_DENSIFY: '1'/'0' force whether the streaming pipeline ships
sparse chunks as padded CSR payloads (O(nnz) bytes) densified on-device by
an XLA scatter with the z-scale epilogue fused (ops/densify.py), vs
densifying on the host (C++ tier) and transferring dense.  'auto'
(default) = on-device for TPU backends — measured 5.9x faster streaming
epochs at 10% density on v5e (docs/benchmarks.md); the win shrinks as the
max nnz per row approaches the gene count.

DCA_TPU_PAYLOAD: 'padded'/'flat'/'flat8' force the on-device-densify
payload encoding; 'auto' (default) picks padded vs flat per matrix from
its row-nnz tail (data/loader.py _pick_mode).  FLAT8 (uint8 column-gap
deltas + uint8 values with exception side-streams, ~2 B/nonzero,
lossless) is strictly OPT-IN via DCA_TPU_PAYLOAD=flat8: the round-4
on-chip A/B measured the halved wire bytes as a wash — the device delta
decode eats the transfer saving at this link's speed — so auto never
picks it (docs/benchmarks.md round 4).

DCA_TPU_FETCH_DTYPE: 'bf16'/'f16' downcast forward/predict outputs ON
DEVICE before they cross the link, cast back to f32 on the host —
halves the output fetch that dominates wide-panel predicts on slow links
(models/network.py _fetch_dtype).  Default 'f32' (exact); LOSSY opt-in.

DCA_TPU_DERIVE_INPUT: '0' disables ship-one-payload mode (train/loop.py):
by default, when the normalized streaming input is an elementwise per-row
function of the raw target (the standard normalize pipeline), only the
target payload crosses the link and the input is derived on device —
halves the transfer of transfer-bound 1M-cell epochs at the cost of
<=1-ulp input rounding vs the host-computed values (XLA vs numpy log1p);
'0' ships both payloads bit-exactly.
"""

from __future__ import annotations

import os


def use_fused_loss() -> bool:
    mode = os.environ.get("DCA_TPU_FUSED_LOSS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    import jax

    return jax.default_backend() == "tpu"


def use_fused_dense(n_out=None) -> bool:
    """'1' forces the fused Pallas inference blocks, '0' forces XLA; 'auto'
    (default) is plain XLA at EVERY width.  Round-3 auto engaged fused at
    >= 8192 columns off a single G=10240 sample (1.17x); the round-4
    measured curve (scripts/wide_ab.py, median-of-5 twice, B=2048,
    G in {4096, 8192, 16384, 28672}) shows parity within tunnel noise at
    <= 8k and a consistent 0.85-0.89x REGRESSION at 16k/28k — XLA's own
    fusion wins at full-transcriptome width on this chip, so auto no
    longer engages the kernel (docs/benchmarks.md "Kernel A/B
    decisions")."""
    mode = os.environ.get("DCA_TPU_FUSED_DENSE", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    return False


def matmul_dtype():
    """Compute dtype for matmul INPUTS (accumulation is always f32 via
    preferred_element_type).  Returns jnp.bfloat16 or None (= keep f32).

    'auto' (default) = f32: DCA's workloads are latency-bound, bf16
    operand rounding measured no win there (see module docstring) and
    would change output numerics vs the reference.  'bf16'/'1' opts in
    (MXU-native, halves the weight stream's HBM bytes — worth an A/B on
    panels in the many-thousands of genes).

    Unrecognized values raise ValueError (a 'fp32' typo must not silently
    change the precision a user asked for).  Like the other knobs, the
    value is captured at TRACE time: toggling the env var after a function
    has been jitted has no effect in-process."""
    mode = os.environ.get("DCA_TPU_MATMUL", "auto")
    if mode in ("auto", "f32", "0"):
        return None
    import jax.numpy as jnp

    if mode in ("bf16", "1"):
        return jnp.bfloat16
    raise ValueError(
        f"DCA_TPU_MATMUL={mode!r}: expected 'auto', 'bf16'/'1', or 'f32'/'0'"
    )


def use_device_densify() -> bool:
    mode = os.environ.get("DCA_TPU_DEVICE_DENSIFY", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    import jax

    return jax.default_backend() == "tpu"
