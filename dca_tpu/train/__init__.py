from .loop import train, train_with_args, History
from .optim import get_optimizer, Optimizer

__all__ = ["train", "train_with_args", "History", "get_optimizer", "Optimizer"]
