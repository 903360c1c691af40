"""Explicitly-sharded embedding lookup over the 'model' mesh axis.

The north-star capability with NO reference analog (SURVEY.md §2.10: the
reference keeps every table on one device — features/embedding.py:75-88).
Two code paths exist for model-parallel tables:

1. **Sharding-driven (default)**: tables carry a ``P('model', None)``
   NamedSharding (parallel/mesh.py) and XLA inserts collectives for the
   gather. Simple, and optimal for most sizes.
2. **Explicit shard_map (this module)**: each shard looks up only the ids in
   its row range and a ``psum`` over 'model' combines the partial rows —
   guaranteeing the full table is NEVER all-gathered (which XLA may choose
   when the id count is large relative to the table). Use for 100M+-row
   tables. Backward is handled by shard_map autodiff: gradients scatter-add
   into the local shard only, and the psum transposes to a no-op for ids.

Communication: one psum of (ids_shape × dim) activations over ICI — the
all-to-all-style exchange the north star calls for, expressed as the XLA
collective that rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Lookup rows of a row-sharded ``table`` for (possibly data-sharded)
    ``ids``. Returns embeddings laid out like ``ids`` (+ trailing dim),
    replicated over ``axis``.

    table: (V, E) sharded P(axis, None). ids: (...,) int, sharded
    P(data_axis, ...) or replicated. V must divide the axis size.
    """
    V, E = table.shape
    n_shards = mesh.shape[axis]
    if V % n_shards:
        raise ValueError(f"vocab {V} must divide the '{axis}' axis ({n_shards})")
    rows_per_shard = V // n_shards

    ids_spec = P(data_axis, *([None] * (ids.ndim - 1))) if data_axis else P()

    def local_lookup(table_shard, ids_local):
        # table_shard: (V/n, E); ids_local: per-data-shard ids, replicated
        # over 'model'
        shard_idx = jax.lax.axis_index(axis)
        lo = shard_idx * rows_per_shard
        rel = ids_local - lo
        in_range = (rel >= 0) & (rel < rows_per_shard)
        safe = jnp.clip(rel, 0, rows_per_shard - 1)
        emb = table_shard[safe] * in_range[..., None].astype(table_shard.dtype)
        # combine partial rows across shards (each id hits exactly one shard)
        return jax.lax.psum(emb, axis)

    fn = shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(axis, None), ids_spec),
        out_specs=ids_spec,
        check_rep=False,
    )
    return fn(table, ids)


def shard_table(table: jnp.ndarray, mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Place a table with rows sharded over ``axis``."""
    return jax.device_put(
        table, NamedSharding(mesh, P(axis, *([None] * (table.ndim - 1))))
    )
