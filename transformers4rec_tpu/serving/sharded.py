"""Model-parallel serving: score an exported artifact over a local mesh.

The single-device StableHLO artifact (serving/export.py) closes the params —
including the (V, E) item table — into the program, which is the right call
at REES46 scale but impossible at the 100M-row north star (a 25 GB constant
in one device's HBM). The reference has no answer at that scale either: its
deployable unit is a Triton ensemble whose PyTorch backend is single-GPU
(03-serving notebook :656-680).

``ShardedInferenceRunner`` is the TPU-native answer: load the artifact's
bundled params (``export_model(..., bundle_params=True)``) onto a local
``('data', 'model')`` mesh, row-shard the item table over 'model'
(``parallel/mesh.py`` rules — same threshold as training), thread the mesh
into every ``NextItemPredictionTask.vocab_parallel_mesh`` so top-k scoring
runs ``sharded_topk`` (per-shard local top-k + O(N·k) candidate merge — the
(V, E) table is never gathered), and jit the same ``model.apply`` inference
path the AOT export traces. Same ``predict()`` API (raw ragged sessions,
Categorify encode/decode) — the HTTP daemon takes it via ``--model-builder``
+ ``--model-axis``.

Unlike the AOT artifact this path needs the MODEL (Python) — the same
contract as the reference's Triton PyTorch backend, which ships model code
alongside weights. Top-k equality with the single-device artifact is pinned
in tests/test_serving.py at model_axis=2.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.base import Model
from ..parallel.mesh import make_mesh, param_shardings
from .export import InferenceRunner


class ShardedInferenceRunner(InferenceRunner):
    """In-process model-parallel predictor over an exported artifact.

    Parameters
    ----------
    path: artifact dir written by ``export_model(..., bundle_params=True)``.
    model: the Model the artifact was exported from (architecture only —
        params come from the artifact; ``Model.save`` semantics).
    model_axis: size of the mesh 'model' axis (default: every local device).
    mesh: a prebuilt ('data', 'model') mesh overrides ``model_axis``.
    """

    def __init__(
        self,
        path: str,
        model: Model,
        model_axis: Optional[int] = None,
        mesh=None,
    ):
        import os

        from flax import serialization

        from ..model.base import map_next_item_tasks

        self._load_artifact_meta(path)
        if not self.metadata.get("bundled_params"):
            raise ValueError(
                "artifact has no bundled params — re-export with "
                "export_model(..., bundle_params=True) to serve model-parallel"
            )
        if mesh is None:
            n = model_axis or len(jax.devices())
            # data=1: serving batches stay whole (any size, down to a single
            # session) — sharded_topk shards its batch over 'data', and a
            # >1 data axis would reject batches not divisible by it
            mesh = make_mesh(data=1, model=n, devices=jax.devices()[:n])
        self.mesh = mesh

        # rebuild the param structure (Model.save contract: architecture is
        # the caller's; the artifact carries weights) from the artifact's
        # feature spec, then restore the bundled bytes into it
        feats = self.metadata["features"]
        dtypes = self.metadata["dtypes"]
        bsz = self.metadata.get("example_batch_size", 2)
        dummy = {
            k: jnp.ones((bsz, *shape), dtype=dtypes[k])
            for k, shape in feats.items()
        }
        # init with the TRAINER's rng/arg set so the param structure matches
        # trained params exactly (training-only submodules included)
        rngs = {
            name: jax.random.PRNGKey(i)
            for i, name in enumerate(
                ("params", "masking", "dropout", "sampling", "augment"))
        }
        template = jax.eval_shape(
            lambda: model.init(rngs, dummy, targets=dummy, training=True)
        )
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            params = serialization.from_bytes(
                jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template),
                f.read(),
            )
        params = jax.device_put(params, param_shardings(params, mesh))
        self.params = params

        # thread the mesh into the prediction tasks ONLY when the TIED ITEM
        # table actually row-shards (same rule as the Trainer's
        # auto-engagement): sharded_topk over a replicated table would be
        # wrong — and a large NON-item feature table being sharded must not
        # engage it either (the item table may be replicated/small)
        def _sharded(leaf):
            sh = getattr(leaf, "sharding", None)
            spec = getattr(sh, "spec", None)
            return bool(spec) and any(s is not None for s in spec)

        item_col = self.input_schema.item_id_column_name
        item_table_sharded = False
        if item_col is not None:
            from ..trainer.sparse_embedding_step import find_table_path, tree_get

            try:
                item_table_sharded = _sharded(
                    tree_get(params, find_table_path(params, item_col))
                )
            except ValueError:
                item_table_sharded = False  # no tied table (e.g. untied head)
        if item_table_sharded:
            model = map_next_item_tasks(
                model, lambda t, _head: t.clone(vocab_parallel_mesh=mesh)
            )
        self.model = model
        top_k = self.metadata.get("top_k")

        def infer(batch):
            return model.apply(params, batch, top_k=top_k)

        self._jit_infer = jax.jit(infer)

    def _call(self, arrs):
        # jit recompiles per distinct batch shape — the daemon's power-of-two
        # bucketing (serving/server.py) bounds the shape count exactly as it
        # does for non-polymorphic AOT artifacts
        return self._jit_infer(arrs)


def load_sharded_runner(
    path: str, model: Model, model_axis: Optional[int] = None
) -> ShardedInferenceRunner:
    return ShardedInferenceRunner(path, model, model_axis=model_axis)
