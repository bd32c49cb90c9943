from .mesh import make_mesh, param_sharding, batch_sharding, replicated
from .step import make_sharded_train_step, shard_train_data

__all__ = [
    "make_mesh",
    "param_sharding",
    "batch_sharding",
    "replicated",
    "make_sharded_train_step",
    "shard_train_data",
]
