from .mesh import (
    batch_sharding,
    default_sharding_rules,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "default_sharding_rules",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_batch",
]
