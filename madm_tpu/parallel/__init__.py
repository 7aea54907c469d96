from .mesh import (
    batch_sharding,
    make_mesh,
    make_sharded_eval_fn,
    make_sharded_train_step,
    place_state,
    replicate,
    replicated,
    shard_batch,
    shard_opt_state,
    zero1_sharding,
)

__all__ = [
    "batch_sharding",
    "place_state",
    "shard_opt_state",
    "zero1_sharding",
    "make_mesh",
    "make_sharded_eval_fn",
    "make_sharded_train_step",
    "replicate",
    "replicated",
    "shard_batch",
]
