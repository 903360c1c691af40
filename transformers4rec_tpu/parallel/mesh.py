"""Device mesh + sharding rules: the distribution layer.

The reference's only parallelism is DP/DDP inherited from the HF Trainer over
NCCL (SURVEY.md §2.10; /root/reference/docs/source/multi_gpu_train.md:27-50,
trainer.py:131-137). TPU-native replacement:

- ONE global ``jax.sharding.Mesh`` with axes ``('data', 'model')``.
- Batches are sharded over ``data`` (replacing DDP's per-process parquet
  partitions — data_utils.py:349-360 — with per-host row striping + device
  sharding).
- Parameters are replicated by default; LARGE embedding tables are
  row-sharded over ``model`` (an extension beyond the reference, which keeps
  every table on one device — features/embedding.py:75-88). XLA inserts the
  all-gather/reduce-scatter collectives over ICI from the shardings alone —
  no hand-written NCCL calls to port.
- Gradient all-reduce is implicit: the jitted train step's output shardings
  make XLA psum grads over ``data``.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over all (or the given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place a host batch dict onto the mesh, batch-axis over 'data'.

    Multi-host: each process passes its LOCAL shard; the global array is
    assembled across processes (the jax.make_array_from_process_local_data
    path). Single-host: a plain sharded device_put.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return jax.device_put(batch, sharding)


def shard_stacked_batches(batches, mesh: Mesh) -> Dict[str, jax.Array]:
    """Stack K host batch dicts into (K, B, ...) arrays sharded P(None, 'data')
    — the input layout for steps_per_execution>1 (lax.scan over the leading
    step axis; each scanned batch stays data-parallel over the mesh)."""
    stacked = {
        k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]
    }
    sharding = NamedSharding(mesh, P(None, "data"))
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sharding, v)
            for k, v in stacked.items()
        }
    return jax.device_put(stacked, sharding)


# (regex over param path, PartitionSpec factory given array ndim)
ShardingRule = Tuple[str, Callable[[int], P]]


def default_sharding_rules(min_rows_to_shard: int = 16384) -> List[ShardingRule]:
    """Row-shard big embedding tables over 'model'; replicate the rest.

    The row threshold keeps small tables (category vocab ~100s) replicated —
    sharding them would cost more in collectives than it saves in HBM.
    NOTE: the threshold is enforced by ``param_shardings`` — pass it THERE
    (``param_shardings(..., min_rows_to_shard=N)``); this signature keeps the
    parameter only for call-compat and raises if a non-default value is
    passed here, where it could not take effect.
    """
    if min_rows_to_shard != 16384:
        raise ValueError(
            "default_sharding_rules cannot apply min_rows_to_shard — pass it "
            "to param_shardings(..., min_rows_to_shard=...) instead"
        )
    return [
        (r".*_table$", lambda ndim: P("model", *([None] * (ndim - 1)))),
    ]


def param_shardings(
    params,
    mesh: Mesh,
    rules: Optional[List[ShardingRule]] = None,
    min_rows_to_shard: int = 16384,
):
    """Map every param leaf to a NamedSharding by path-regex rules.

    A table is sharded when (a) a rule matches, (b) its leading dim is
    ≥ min_rows_to_shard, and (c) it divides the 'model' axis size —
    jax.device_put rejects uneven shardings. Embedding tables are padded to
    ``EmbeddingFeatures.vocab_padding_multiple`` rows at creation
    (features/embedding.py) precisely so real vocabs (num_items + 1, almost
    never divisible) satisfy (c).
    """
    if rules is None:
        rules = default_sharding_rules()
    model_size = mesh.shape["model"]

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat

    shardings = []
    for path, leaf in leaves:
        key = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
        spec = P()
        for pattern, spec_fn in rules:
            if re.search(pattern, key):
                candidate = spec_fn(leaf.ndim)
                rows = leaf.shape[0] if leaf.ndim else 0
                if (
                    model_size > 1
                    and rows >= min_rows_to_shard
                    and rows % model_size == 0
                ):
                    spec = candidate
                break
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)
