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


def process_data_stripe(mesh: Mesh) -> Tuple[int, int]:
    """(rank, size) batch striping for THIS process, derived from the mesh.

    With the default pod layout ('data' spans processes, 'model' within a
    host) each process loads its 1/process_count slice. But when the 'model'
    axis spans processes — a table row-sharded ACROSS hosts — a process's
    devices cover SEVERAL 'data' rows and its loader must supply every batch
    row those devices need (jax.make_array_from_process_local_data assembles
    from addressable shards, so the local slice must cover them). In the
    extreme (model axis == all processes) every process loads the FULL
    global batch. Single-process always returns (0, 1).

    Requires each process's 'data' rows to be one contiguous aligned block
    (true for any reshape-order mesh over process-contiguous device lists);
    raises otherwise since a strided slice can't be loaded as one stripe.
    """
    import jax

    if jax.process_count() <= 1:
        return 0, 1
    devs = np.asarray(mesh.devices)
    # resolve the 'data' axis BY NAME (a user-supplied mesh may order axes
    # ('model', 'data')) and move it to the front; remaining axes flatten
    names = list(mesh.axis_names)
    if "data" in names:
        devs = np.moveaxis(devs, names.index("data"), 0)
    devs = devs.reshape(devs.shape[0], -1)
    pid = jax.process_index()
    rows = sorted({
        i for i in range(devs.shape[0])
        if any(d.process_index == pid for d in devs[i].flat)
    })
    n = len(rows)
    if not rows:
        raise ValueError(f"process {pid} owns no devices in mesh {mesh}")
    if rows != list(range(rows[0], rows[0] + n)) or rows[0] % n or devs.shape[0] % n:
        raise ValueError(
            f"process {pid}'s 'data' rows {rows} are not one aligned "
            "contiguous block — reorder the mesh devices so each process's "
            "data slice is contiguous"
        )
    return rows[0] // n, devs.shape[0] // n


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

# row threshold below which tables stay replicated (param_shardings default;
# the Trainer's vocab-parallel auto-engagement keys off the same constant so
# the CE path and the table sharding can never disagree)
MIN_ROWS_TO_SHARD = 16384


def default_sharding_rules(min_rows_to_shard: int = MIN_ROWS_TO_SHARD) -> List[ShardingRule]:
    """Row-shard big embedding tables over 'model'; replicate the rest.

    The row threshold keeps small tables (category vocab ~100s) replicated —
    sharding them would cost more in collectives than it saves in HBM.
    NOTE: the threshold is enforced by ``param_shardings`` — pass it THERE
    (``param_shardings(..., min_rows_to_shard=N)``); this signature keeps the
    parameter only for call-compat and raises if a non-default value is
    passed here, where it could not take effect.
    """
    if min_rows_to_shard != MIN_ROWS_TO_SHARD:
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
    min_rows_to_shard: int = MIN_ROWS_TO_SHARD,
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
