from .mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_eval_fn,
    make_sharded_train_step,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "make_sharded_eval_fn",
    "make_sharded_train_step",
    "replicate",
    "replicated",
    "shard_batch",
]
