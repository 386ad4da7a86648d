from .mesh import make_mesh, batch_sharding, param_shardings
from .steps import (state_shardings,
                    make_sharded_pretrain_step, make_sharded_downstream_step,
                    make_sharded_pretrain_eval_step,
                    make_sharded_downstream_eval_step)
from .hostdata import (shard_for_process, global_batch_from_local,
                       host_batch_iterator)

__all__ = [
    "make_mesh", "batch_sharding", "param_shardings", "state_shardings",
    "make_sharded_pretrain_step", "make_sharded_downstream_step",
    "make_sharded_pretrain_eval_step", "make_sharded_downstream_eval_step",
    "shard_for_process", "global_batch_from_local", "host_batch_iterator",
]
