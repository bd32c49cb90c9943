from .mesh import make_mesh, resolve_mesh, param_sharding, batch_sharding, replicated
from .step import make_sharded_train_step, shard_train_data, place_train_state

__all__ = [
    "make_mesh",
    "resolve_mesh",
    "param_sharding",
    "batch_sharding",
    "replicated",
    "make_sharded_train_step",
    "shard_train_data",
    "place_train_state",
]
