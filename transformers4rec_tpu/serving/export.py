"""Serving export: AOT-compiled inference artifacts.

Parity: the reference's serving recipe (SURVEY.md §1.11) is
``torch.jit.trace(model, example)`` → merlin.systems ``Ensemble(TransformWorkflow
>> PredictPyTorch)`` → Triton (examples/getting-started-session-based/
03-serving-...ipynb:418, 656-680), with IO schemas from ``Model.input_schema``/
``Model.output_schema`` (model/base.py:747-833).

TPU-native redesign: ``jax.export`` serializes the jitted inference function to
a portable StableHLO artifact — the torch.jit.trace analog that any XLA runtime
(TPU serving container, CPU) can AOT-load without Python model code. The
directory artifact bundles:

- ``model.stablehlo``  — serialized exported function (params closed over)
- ``input_schema.json`` / ``output_schema.json`` — feature wiring for the
  serving frontend
- ``metadata.json``    — top_k, sequence length, batch-size axis info
- ``categories/``      — optional Categorify mappings (``categories=`` arg):
  the reference ensemble's TransformWorkflow stage embedded in the artifact —
  raw ids in, raw top-k ids out

``load`` returns a callable server-side predictor. ``InferenceRunner`` gives an
in-process Triton-like predict(dict-of-ndarray)→(scores, ids) interface.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.base import Model
from ..schema import Schema


def _strip_vocab_parallel(model: Model) -> Model:
    """Clone ``model`` with every NextItemPredictionTask's
    ``vocab_parallel_mesh`` cleared (no-op when none is set)."""
    from ..model.base import map_next_item_tasks

    return map_next_item_tasks(
        model,
        lambda t, _head: (
            t.clone(vocab_parallel_mesh=None)
            if t.vocab_parallel_mesh is not None else t
        ),
    )


def export_model(
    model: Model,
    params,
    example_batch: Dict[str, jnp.ndarray],
    path: str,
    top_k: Optional[int] = None,
    batch_polymorphic: bool = True,
    weights_dtype: Optional[str] = None,
    categories=None,
    bundle_params: bool = False,
) -> str:
    """Trace + AOT-serialize the inference path and write the artifact dir.

    ``batch_polymorphic`` exports with a symbolic batch dimension so the same
    artifact serves any batch size (shape-polymorphic StableHLO).

    ``weights_dtype`` (e.g. ``"bfloat16"``) casts all floating-point params
    before export: the serving-time vocab scoring GEMM is memory-bound on the
    (V, E) item table, so bf16 weights halve the per-request table read (and
    the artifact size). Scores still accumulate in f32
    (``preferred_element_type`` in the scoring ops).

    ``categories`` bundles ``Categorify`` mappings into the artifact — a
    ``{col: raw_values}`` dict from ``utils.data_utils.categorify`` or a path
    to a ``categories/`` dir of ``unique.<col>.parquet`` files (the ETL writes
    one). The runner/server then accept RAW categorical values and decode
    predicted top-k indices back to raw item ids — the reference ensemble's
    TransformWorkflow stage (notebook 03:656-680), embedded in the artifact.

    ``bundle_params`` additionally writes ``params.msgpack`` (post
    ``weights_dtype`` cast) so the artifact can ALSO be served model-parallel:
    ``ShardedInferenceRunner`` (serving/sharded.py) loads these params onto a
    local ('model',) mesh with the item table row-sharded — the 100M-row
    serving path, where a single-device StableHLO program cannot hold the
    table. The StableHLO artifact is still written and stays authoritative
    for single-device serving.
    """
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    # serving artifacts are single-logical-device StableHLO programs: strip
    # any training-time vocab_parallel_mesh (the Trainer auto-engages it for
    # row-sharded tables) so the inference trace scores against the full
    # table instead of baking a shard_map over the TRAINING mesh topology
    # into the export. Sharded SERVING is the runner's concern, not the
    # artifact's.
    model = _strip_vocab_parallel(model)
    example = {k: jnp.asarray(v) for k, v in example_batch.items()}

    if weights_dtype is not None:
        wd = jnp.dtype(weights_dtype)
        params = jax.tree.map(
            lambda p: p.astype(wd) if jnp.issubdtype(p.dtype, jnp.floating) else p,
            params,
        )

    def infer(batch):
        return model.apply(params, batch, top_k=top_k)

    fn = jax.jit(infer)
    if batch_polymorphic:
        scope = jexport.SymbolicScope()
        shapes = {}
        for k, v in example.items():
            dims = ",".join(["b"] + [str(d) for d in v.shape[1:]])
            shapes[k] = jax.ShapeDtypeStruct(
                jexport.symbolic_shape(dims, scope=scope), v.dtype
            )
        exported = jexport.export(fn)(shapes)
    else:
        exported = jexport.export(fn)(example)

    with open(os.path.join(path, "model.stablehlo"), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, "input_schema.json"), "w") as f:
        f.write(model.input_schema.to_json())
    with open(os.path.join(path, "output_schema.json"), "w") as f:
        f.write(model.clone(top_k=top_k or model.top_k).output_schema.to_json())
    if bundle_params:
        from flax import serialization

        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
    category_cols = []
    if categories is not None:
        from ..utils.data_utils import load_categories, save_categories

        if isinstance(categories, (str, os.PathLike)):
            categories = load_categories(str(categories))
        save_categories(categories, os.path.join(path, "categories"))
        category_cols = sorted(categories)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(
            {
                "top_k": top_k or model.top_k,
                "features": {k: list(np.asarray(v).shape[1:]) for k, v in example.items()},
                "dtypes": {k: str(np.asarray(v).dtype) for k, v in example.items()},
                "batch_polymorphic": batch_polymorphic,
                "weights_dtype": weights_dtype,
                "example_batch_size": int(next(iter(example.values())).shape[0]),
                "bundled_params": bundle_params,
                "categories": category_cols,
                "item_id_column": model.input_schema.item_id_column_name
                if category_cols else None,
            },
            f,
        )
    return path


class InferenceRunner:
    """In-process predictor over an exported artifact (Triton-ensemble analog)."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, "model.stablehlo"), "rb") as f:
            self._exported = jexport.deserialize(f.read())
        self._load_artifact_meta(path)

    def _load_artifact_meta(self, path: str) -> None:
        """Schemas, metadata, and Categorify mappings — shared by the AOT
        (StableHLO) runner and the model-parallel ShardedInferenceRunner."""
        with open(os.path.join(path, "metadata.json")) as f:
            self.metadata = json.load(f)
        self.input_schema = Schema.from_json(os.path.join(path, "input_schema.json"))
        self.output_schema = Schema.from_json(os.path.join(path, "output_schema.json"))
        self.categories: Dict[str, np.ndarray] = {}
        self._codes: Dict[str, object] = {}
        if self.metadata.get("categories"):
            from ..utils.data_utils import build_category_codes, load_categories

            self.categories = load_categories(os.path.join(path, "categories"))
            # raw→id hash indexes built ONCE (O(V) each) — the per-request
            # encode is then a vectorized lookup
            self._codes = {
                k: build_category_codes(v) for k, v in self.categories.items()
            }

    def _call(self, arrs):
        """Run the underlying program (subclasses override)."""
        return self._exported.call(arrs)

    def predict(
        self,
        batch: Dict[str, np.ndarray],
        decode_ids: bool = True,
        encode_inputs: bool = True,
    ):
        """Run inference. With bundled ``categories`` mappings, categorical
        inputs are accepted as RAW values (any dtype; 0/"" = padding) and —
        when ``decode_ids`` — the returned top-k item ids are decoded back to
        raw values (ids the mapping can't invert, i.e. the pad/null/OOV
        codes, decode to -1 / ""). ``encode_inputs=False`` is for callers
        that already ran :meth:`encode` (the HTTP handler does, so the
        batcher coalesces plain int arrays) — encoding is NOT idempotent."""
        feats = self.metadata["features"]
        dtypes = self.metadata["dtypes"]
        arrs = {
            k: jnp.asarray(self._densify(
                k, self.encode(k, v) if encode_inputs else v, feats[k], dtypes[k]
            ))
            for k, v in batch.items()
            if k in feats
        }
        out = self._call(arrs)
        if isinstance(out, (tuple, list)) and len(out) == 2:
            scores, ids = out
            ids = np.asarray(ids)
            if decode_ids:
                ids = self.decode_item_ids(ids)
            return np.asarray(scores), ids
        return np.asarray(out)

    # ---------------------------------------------------------- categorify
    def encode(self, name: str, v):
        """Raw values → contiguous ids when a Categorify mapping is bundled
        (reference TransformWorkflow stage); pass-through otherwise.
        Raw 0/"" always encodes to padding (the framework-wide pad id),
        nulls to 1, unseen values to OOV 2 — ragged list-of-lists and dense
        arrays follow the same rule."""
        if name not in self.categories:
            return v
        from ..utils.data_utils import encode_with_categories

        codes = self._codes[name]
        if isinstance(v, (list, tuple)) and len(v) and isinstance(
            v[0], (list, tuple, np.ndarray)
        ):
            # keep list-of-sessions RAGGED (even when all lengths match):
            # a uniform-length batch collapsed to a dense (N, L) array here
            # would bypass _densify's pad-to-max_len and fail at inference
            # for any L != the artifact length — including the most common
            # request shape, a single session
            return [encode_with_categories(r, codes) for r in v]
        return encode_with_categories(v, codes)

    def decode_item_ids(self, ids: np.ndarray) -> np.ndarray:
        """Predicted contiguous item indices → raw item ids via the bundled
        mapping (inverse of the Categorify the ETL applied)."""
        item_col = self.metadata.get("item_id_column")
        if not item_col or item_col not in self.categories:
            return ids
        from ..utils.data_utils import CATEGORIFY_START_INDEX as START

        raw_values = self.categories[item_col]
        idx = np.clip(ids - START, 0, len(raw_values) - 1)
        raw = raw_values[idx]
        fill = -1 if np.issubdtype(raw.dtype, np.number) else ""
        return np.where(ids >= START, raw, np.asarray(fill, raw.dtype))

    def _densify(self, name: str, v, feat_shape, dtype) -> np.ndarray:
        """Accept RAGGED sequence inputs (list of variable-length sessions) in
        addition to pre-padded dense arrays — the padding/truncation the
        reference's serving ensemble performs in its TransformWorkflow stage
        (notebook 03:656-680): keep the first ``max_len`` items, right-pad 0.
        """
        if feat_shape and isinstance(v, (list, tuple)) and len(v) and isinstance(
            v[0], (list, tuple, np.ndarray)
        ):
            lens = {len(r) for r in v}
            if len(lens) > 1 or lens != {feat_shape[0]}:
                from ..data.padding import pad_ragged

                max_len = feat_shape[0]
                values = np.concatenate(
                    [np.asarray(r, dtype=dtype) for r in v]
                )
                offsets = np.zeros(len(v) + 1, np.int64)
                np.cumsum([len(r) for r in v], out=offsets[1:])
                return pad_ragged(values, offsets, max_len)
        arr = np.asarray(v, dtype=dtype)
        if feat_shape and arr.ndim == 2 and arr.shape[1] != feat_shape[0]:
            # dense batch at the wrong session length: same keep-first /
            # right-pad-0 rule as the ragged path
            L = feat_shape[0]
            arr = arr[:, :L] if arr.shape[1] >= L else np.pad(
                arr, ((0, 0), (0, L - arr.shape[1]))
            )
        return arr


def load_runner(path: str) -> InferenceRunner:
    return InferenceRunner(path)
