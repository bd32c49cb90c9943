"""Runtime configuration knobs.

DCA_TPU_FUSED_LOSS: '1' force the fused Pallas NLL kernels, '0' force the
pure-JAX/XLA path, 'auto' (default) = fused on TPU backends only.
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
