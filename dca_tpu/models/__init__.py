from .network import (
    AE_types,
    Autoencoder,
    PoissonAutoencoder,
    NBConstantDispAutoencoder,
    NBAutoencoder,
    NBSharedAutoencoder,
    NBForkAutoencoder,
    ZINBAutoencoder,
    ZINBAutoencoderElemPi,
    ZINBSharedAutoencoder,
    ZINBForkAutoencoder,
    ZINBConstantDispAutoencoder,
)
from . import core

__all__ = [
    "AE_types",
    "core",
    "Autoencoder",
    "PoissonAutoencoder",
    "NBConstantDispAutoencoder",
    "NBAutoencoder",
    "NBSharedAutoencoder",
    "NBForkAutoencoder",
    "ZINBAutoencoder",
    "ZINBAutoencoderElemPi",
    "ZINBSharedAutoencoder",
    "ZINBForkAutoencoder",
    "ZINBConstantDispAutoencoder",
]
