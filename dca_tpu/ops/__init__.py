from .activations import MeanAct, DispAct, get_activation, ACTIVATIONS
from .initializers import get_initializer

__all__ = [
    "MeanAct",
    "DispAct",
    "get_activation",
    "ACTIVATIONS",
    "get_initializer",
    # kernels (imported lazily by their users; listed for discovery):
    # ops.fused_loss.zinb_nll_fused / nb_nll_fused   (Pallas)
    # ops.fused_dense.fused_dense_block              (Pallas)
    # ops.densify.device_densify / payload_from_csr  (XLA scatter)
]
