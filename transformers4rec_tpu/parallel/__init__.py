from .mesh import (
    batch_sharding,
    default_sharding_rules,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_stacked_batches,
)
from .sharded_embedding import (
    shard_table,
    sharded_ce_and_rank,
    sharded_embedding_lookup,
    sharded_softmax_ce,
)

__all__ = [
    "batch_sharding",
    "default_sharding_rules",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
    "shard_stacked_batches",
    "shard_table",
    "sharded_ce_and_rank",
    "sharded_embedding_lookup",
    "sharded_softmax_ce",
]
