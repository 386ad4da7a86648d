from .mesh import make_mesh, batch_sharding, param_shardings, shard_train_state
from .steps import make_sharded_pretrain_step, make_sharded_downstream_step

__all__ = [
    "make_mesh", "batch_sharding", "param_shardings", "shard_train_state",
    "make_sharded_pretrain_step", "make_sharded_downstream_step",
]
