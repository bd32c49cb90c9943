"""dca_tpu — TPU-native deep count autoencoder for scRNA-seq denoising.

A brand-new JAX/XLA/Pallas implementation with the capabilities of
theislab/dca (reference mounted at /root/reference): all 11 autoencoder
variants, ZINB/NB/Poisson/MSE count likelihoods, the scanpy-style ``dca()``
API, the reference CLI flag surface, and data/model-parallel training over
TPU meshes.
"""

__version__ = "0.3.0"

from .api import dca
from .models import AE_types

__all__ = ["dca", "AE_types", "__version__"]
