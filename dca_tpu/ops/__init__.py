from .activations import MeanAct, DispAct, get_activation, ACTIVATIONS
from .initializers import get_initializer

__all__ = ["MeanAct", "DispAct", "get_activation", "ACTIVATIONS", "get_initializer"]
