"""Embedding feature input blocks: table configs, lookups, soft embeddings,
pretrained embeddings.

Parity targets (/root/reference/transformers4rec/torch/features/embedding.py):
- ``TableConfig``/``FeatureConfig`` (:416-514)
- ``EmbeddingFeatures`` (:51-257) incl. mean "EmbeddingBag" combiner for 2-D
  non-sequential inputs (:96-101, :260-273)
- ``SoftEmbeddingFeatures``/``SoftEmbedding`` (:280-413, :517-556)
- ``PretrainedEmbeddingFeatures`` (:599-737)

TPU-first notes: lookups are plain gathers that XLA fuses; padding id 0 is
masked explicitly (instead of torch's padding_idx zero-row convention) so the
pad row needs no special gradient handling. Tables are created with a
``'model'``-shardable leading axis — the parallel layer shards large vocab
tables over the mesh (see transformers4rec_tpu/parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..schema import Schema, Tags, get_embedding_size_from_cardinality
from ..tabular.base import TabularBlock, TabularData


@dataclasses.dataclass(frozen=True)
class TableConfig:
    vocabulary_size: int
    dim: int
    initializer: Optional[Callable] = None  # flax initializer (key, shape, dtype)
    combiner: str = "mean"
    name: str = ""


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    table: TableConfig
    max_sequence_length: int = 0
    name: str = ""


def _default_initializer(std: float = 0.05) -> Callable:
    return nn.initializers.normal(stddev=std)


def _infer_dims(
    schema: Schema,
    embedding_dims: Optional[Dict[str, int]],
    embedding_dim_default: int,
    infer_embedding_sizes: bool,
    infer_embedding_sizes_multiplier: float,
) -> Dict[str, int]:
    """Per-feature dims: explicit dict > cardinality heuristic > default
    (reference embedding.py:173-183)."""
    cardinalities = schema.categorical_cardinalities()
    dims: Dict[str, int] = {}
    for name, card in cardinalities.items():
        if embedding_dims and name in embedding_dims:
            dims[name] = embedding_dims[name]
        elif infer_embedding_sizes:
            dims[name] = get_embedding_size_from_cardinality(
                card, infer_embedding_sizes_multiplier
            )
        else:
            dims[name] = embedding_dim_default
    return dims


def build_feature_configs(
    schema: Schema,
    embedding_dims: Optional[Dict[str, int]] = None,
    embedding_dim_default: int = 64,
    infer_embedding_sizes: bool = False,
    infer_embedding_sizes_multiplier: float = 2.0,
    embeddings_initializers: Optional[Dict[str, Callable]] = None,
    combiner: str = "mean",
    max_sequence_length: int = 0,
) -> Dict[str, FeatureConfig]:
    dims = _infer_dims(
        schema,
        embedding_dims,
        embedding_dim_default,
        infer_embedding_sizes,
        infer_embedding_sizes_multiplier,
    )
    cardinalities = schema.categorical_cardinalities()
    configs: Dict[str, FeatureConfig] = {}
    for name, card in cardinalities.items():
        init = (embeddings_initializers or {}).get(name) or _default_initializer()
        configs[name] = FeatureConfig(
            table=TableConfig(
                vocabulary_size=card, dim=dims[name], initializer=init,
                combiner=combiner, name=name,
            ),
            max_sequence_length=max_sequence_length,
            name=name,
        )
    return configs


class EmbeddingFeatures(TabularBlock):
    """Categorical lookups producing one (B, dim) array per feature.

    2-D (B, S) inputs are mean-combined over non-pad positions (the reference's
    EmbeddingBag path, embedding.py:96-101). For 3-D sequence outputs use
    ``SequenceEmbeddingFeatures``.
    """

    feature_configs: Dict[str, FeatureConfig] = dataclasses.field(default_factory=dict)
    item_id: Optional[str] = None
    mask_padding: bool = True
    # the id that marks padding (reference uses the torch nn.Embedding
    # padding_idx=0 convention; configurable to match MaskSequence's)
    padding_idx: int = 0
    table_dtype: Any = jnp.float32
    # round table rows up so they divide any 'model' mesh axis ≤ this value
    vocab_padding_multiple: int = 8

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        embedding_dims: Optional[Dict[str, int]] = None,
        embedding_dim_default: int = 64,
        infer_embedding_sizes: bool = False,
        infer_embedding_sizes_multiplier: float = 2.0,
        embeddings_initializers: Optional[Dict[str, Callable]] = None,
        combiner: str = "mean",
        tags=(Tags.CATEGORICAL,),
        max_sequence_length: int = 0,
        **kwargs,
    ):
        selected = schema.select_by_tag(list(tags))
        configs = build_feature_configs(
            selected,
            embedding_dims=embedding_dims,
            embedding_dim_default=embedding_dim_default,
            infer_embedding_sizes=infer_embedding_sizes,
            infer_embedding_sizes_multiplier=infer_embedding_sizes_multiplier,
            embeddings_initializers=embeddings_initializers,
            combiner=combiner,
            max_sequence_length=max_sequence_length,
        )
        try:
            item_id = selected.item_id_column_name
        except ValueError:
            item_id = None
        return cls(feature_configs=configs, item_id=item_id, schema=selected, **kwargs)

    def setup(self):
        # Tables are created in setup (not compact) so weight tying can reach
        # them through ``item_embedding_table()`` from the prediction head's
        # scope — the flax multi-method shared-param pattern.
        # Rows are rounded up to ``vocab_padding_multiple`` so real vocab
        # sizes (num_items + 1, almost never divisible) can row-shard over a
        # 'model' mesh axis (jax.device_put rejects uneven shardings —
        # parallel/mesh.py). Padded rows are never looked up (ids < true
        # vocab) and the prediction head masks them out of softmax/top-k via
        # its true-vocab bound (NextItemPredictionTask.target_dim).
        tables = {}
        m = max(int(self.vocab_padding_multiple), 1)
        for name, fc in self.feature_configs.items():
            cfg = fc.table
            init = cfg.initializer or _default_initializer()
            rows = ((cfg.vocabulary_size + m - 1) // m) * m
            tables[name] = self.param(
                f"{cfg.name or name}_table", init,
                (rows, cfg.dim), self.table_dtype,
            )
        self._tables = tables

    def table_param(self, name: str) -> jnp.ndarray:
        table = self._tables[name]
        init = self.feature_configs[name].table.initializer
        if getattr(init, "trainable", True) is False:
            # frozen pretrained table (PretrainedEmbeddingsInitializer
            # trainable=False): no gradient reaches the param, so the
            # optimizer never moves it
            table = jax.lax.stop_gradient(table)
        return table

    def item_embedding_table(self) -> jnp.ndarray:
        """The item-id table — called by NextItemPredictionTask for weight tying."""
        if self.item_id is None:
            raise ValueError("No item_id feature in this embedding module")
        return self.table_param(self.item_id)

    def lookup(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.table_param(name)
        emb = table[ids]
        if self.mask_padding:
            emb = emb * (ids != self.padding_idx)[..., None].astype(emb.dtype)
        return emb

    def compute_feature(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        emb = self.lookup(name, ids)
        if ids.ndim == 2:  # (B, S) → combine to (B, dim)
            cfg = self.feature_configs[name].table
            if cfg.combiner == "sum":
                return emb.sum(axis=1)
            if self.mask_padding:
                valid = (ids != self.padding_idx).sum(
                    axis=-1, keepdims=True
                ).astype(emb.dtype)
                return emb.sum(axis=1) / jnp.maximum(valid, 1.0)
            # unmasked mean: every position contributes, divisor = S (a
            # valid-count divisor with unmasked embeddings would be neither
            # a mean over all positions nor over valid ones)
            return emb.mean(axis=1)
        return emb

    def compute(self, inputs: TabularData, training: bool = False) -> TabularData:
        out: TabularData = {}
        for name in self.feature_configs:
            if name in inputs:
                out[name] = self.compute_feature(name, inputs[name].astype(jnp.int32))
        return out

    def feature_sizes(self) -> Dict[str, int]:
        return {name: cfg.table.dim for name, cfg in self.feature_configs.items()}


class SequenceEmbeddingFeatures(EmbeddingFeatures):
    """3-D sequence lookups: (B, S) ids → (B, S, dim); pad positions zeroed
    (reference features/sequence.py:43-90, padding_idx from the base
    EmbeddingFeatures field)."""

    def compute_feature(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        return self.lookup(name, ids)


class SoftEmbedding(nn.Module):
    """Soft one-hot encoding for a continuous scalar: project to
    ``num_embeddings`` logits, softmax, weighted average of embedding rows
    (reference embedding.py:517-556)."""

    num_embeddings: int
    embedding_dim: int
    emb_initializer: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding_table",
            self.emb_initializer or _default_initializer(),
            (self.num_embeddings, self.embedding_dim),
        )
        # input is a RAW scalar column ((B,) or (B, S)) — always unsqueeze,
        # exactly like the reference (embedding.py:272 input.unsqueeze(-1));
        # a trailing-dim==1 heuristic misreads S=1 sequences and B=1 batches
        x = x[..., None]
        logits = nn.Dense(self.num_embeddings, name="projection")(x.astype(jnp.float32))
        weights = jax.nn.softmax(logits, axis=-1)
        return weights @ table


class SoftEmbeddingFeatures(TabularBlock):
    """Per-feature SoftEmbedding for continuous columns
    (reference embedding.py:280-413)."""

    soft_embedding_cardinalities: Dict[str, int] = dataclasses.field(default_factory=dict)
    soft_embedding_dims: Dict[str, int] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        soft_embedding_cardinality_default: int = 10,
        soft_embedding_cardinalities: Optional[Dict[str, int]] = None,
        soft_embedding_dim_default: int = 8,
        soft_embedding_dims: Optional[Dict[str, int]] = None,
        tags=(Tags.CONTINUOUS,),
        **kwargs,
    ):
        selected = schema.select_by_tag(list(tags))
        cards = {
            name: (soft_embedding_cardinalities or {}).get(name, soft_embedding_cardinality_default)
            for name in selected.column_names
        }
        dims = {
            name: (soft_embedding_dims or {}).get(name, soft_embedding_dim_default)
            for name in selected.column_names
        }
        return cls(
            soft_embedding_cardinalities=cards,
            soft_embedding_dims=dims,
            schema=selected,
            **kwargs,
        )

    @nn.compact
    def __call__(self, inputs: TabularData, training: bool = False, **kwargs):
        out: TabularData = {}
        for name, card in self.soft_embedding_cardinalities.items():
            if name in inputs:
                out[name] = SoftEmbedding(
                    num_embeddings=card,
                    embedding_dim=self.soft_embedding_dims[name],
                    name=f"soft_{name}",
                )(inputs[name])
        agg = kwargs.get("aggregation") or self.aggregation
        if agg is not None:
            from ..tabular.base import parse_aggregation

            return parse_aggregation(agg, self.schema)(out)
        return out

    def feature_sizes(self) -> Dict[str, int]:
        return dict(self.soft_embedding_dims)


class PretrainedEmbeddingFeatures(TabularBlock):
    """Pretrained embeddings, two modes (reference embedding.py:599-737):

    - ``pretrained_embeddings``: fixed (optionally trainable) matrices looked
      up IN-MODEL by the column's integer ids.
    - ``precomputed_features``: columns whose batch values are ALREADY
      embedding vectors (the reference's ``Tags.EMBEDDING`` route — the
      dataloader's EmbeddingOperator attaches (B, S, D) floats); consumed
      as-is with optional projection/combiner. ``precomputed_dims`` declares
      D per column for analytic output sizing.
    """

    pretrained_embeddings: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    precomputed_features: Tuple[str, ...] = ()
    precomputed_dims: Dict[str, int] = dataclasses.field(default_factory=dict)
    trainable: bool = False
    projection_dim: Optional[int] = None
    sequence_combiner: Optional[str] = None  # None | 'mean' | 'sum'

    def _finish(self, name: str, emb: jnp.ndarray,
                pos_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
        """``pos_valid``: (B, S) bool of real (non-padded) positions — from
        nonzero ids (lookup mode) or nonzero vectors (precomputed mode);
        padded positions are zeroed out and excluded from the mean."""
        if pos_valid is not None and emb.ndim == 3:
            emb = emb * pos_valid[..., None].astype(emb.dtype)
        if self.projection_dim:
            emb = nn.Dense(self.projection_dim, name=f"{name}_proj")(emb)
            if pos_valid is not None and emb.ndim == 3:
                # re-zero padded positions (the projection bias fills them)
                emb = emb * pos_valid[..., None].astype(emb.dtype)
        if self.sequence_combiner and emb.ndim == 3:
            if pos_valid is not None:
                valid = pos_valid.sum(axis=-1, keepdims=True).astype(emb.dtype)
            else:
                valid = jnp.full((emb.shape[0], 1), emb.shape[1], emb.dtype)
            emb = emb.sum(axis=1)
            if self.sequence_combiner == "mean":
                emb = emb / jnp.maximum(valid, 1.0)
        return emb

    @nn.compact
    def __call__(self, inputs: TabularData, training: bool = False, **kwargs):
        out: TabularData = {}
        for name, matrix in self.pretrained_embeddings.items():
            if name not in inputs:
                continue
            table = self.param(
                f"{name}_pretrained",
                lambda key, shape, m=matrix: jnp.asarray(m, jnp.float32),
                matrix.shape,
            )
            if not self.trainable:
                table = jax.lax.stop_gradient(table)
            ids = inputs[name].astype(jnp.int32)
            emb = table[ids] * (ids != 0)[..., None].astype(jnp.float32)
            out[name] = self._finish(
                name, emb, (ids != 0) if ids.ndim == 2 else None
            )
        for name in self.precomputed_features:
            if name not in inputs:
                continue
            emb = inputs[name].astype(jnp.float32)
            # padded positions carry zero vectors in the precomputed layout
            pos_valid = (
                (jnp.abs(emb).sum(axis=-1) > 0) if emb.ndim == 3 else None
            )
            out[name] = self._finish(name, emb, pos_valid)
        agg = kwargs.get("aggregation") or self.aggregation
        if agg is not None:
            from ..tabular.base import parse_aggregation

            return parse_aggregation(agg, self.schema)(out)
        return out

    def feature_sizes(self) -> Dict[str, int]:
        sizes = {
            name: (self.projection_dim or m.shape[-1])
            for name, m in self.pretrained_embeddings.items()
        }
        for name in self.precomputed_features:
            dim = self.projection_dim or self.precomputed_dims.get(name, 0)
            if not dim:
                raise ValueError(
                    f"precomputed embedding column {name!r} needs its vector "
                    "dim declared for analytic output sizing: pass "
                    "pretrained_output_dims={name: D} (or a projection_dim) "
                    "to from_schema"
                )
            sizes[name] = dim
        return sizes


class PretrainedEmbeddingsInitializer:
    """Flax initializer loading pre-trained embedding weights (reference
    embedding.py:559-596).

    Callable as ``(key, shape, dtype)`` so it slots into ``TableConfig.
    initializer`` / ``embeddings_initializers={...}``. The expected dims are
    ``(embedding_cardinality, embedding_dim)``; row 0 is the padding item.
    ``trainable=False`` is honored by ``EmbeddingFeatures`` /
    ``PretrainedEmbeddingFeatures`` via ``stop_gradient`` on the table (a
    frozen torch Parameter has no functional analog; alternatively mask the
    rows out of the optimizer with ``optax.masked``).
    """

    def __init__(self, weight_matrix, trainable: bool = False):
        self.weight_matrix = np.asarray(weight_matrix)
        if self.weight_matrix.ndim != 2:
            raise ValueError(
                f"weight_matrix must be 2D (cardinality, dim), got "
                f"{self.weight_matrix.shape}"
            )
        self.trainable = trainable

    def __call__(self, key, shape, dtype=jnp.float32):
        rows, dim = self.weight_matrix.shape
        # tables are rounded up to vocab_padding_multiple rows for
        # shardability (EmbeddingFeatures.setup) — extra rows are zero-filled
        # (they are never looked up and the head masks them out of softmax)
        if len(shape) != 2 or shape[1] != dim or shape[0] < rows:
            raise ValueError(
                f"pretrained weights {self.weight_matrix.shape} do not match "
                f"table shape {tuple(shape)}"
            )
        w = jnp.asarray(self.weight_matrix, dtype)
        if shape[0] > rows:
            w = jnp.pad(w, ((0, shape[0] - rows), (0, 0)))
        return w
