"""Non-sequential tabular input module.

Parity: /root/reference/transformers4rec/torch/features/tabular.py:52-239 —
``TabularFeatures`` routes continuous / categorical / pretrained columns by tag
into sub-blocks, with an optional continuous-projection MLP; subclasses override
the module classes (sequence.py:112 swaps in the sequence embedding module).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..schema import Schema, Tags
from ..tabular.base import TabularBlock, TabularData, parse_aggregation
from .continuous import ContinuousFeatures
from .embedding import EmbeddingFeatures, PretrainedEmbeddingFeatures, SoftEmbeddingFeatures


# kwargs TabularFeatures.from_schema forwards to the embedding module —
# everything EmbeddingFeatures.from_schema/clone accepts
_EMBEDDING_KWARGS = (
    "embedding_dims",
    "embedding_dim_default",
    "infer_embedding_sizes",
    "infer_embedding_sizes_multiplier",
    "embeddings_initializers",
    "combiner",
    "mask_padding",
    "padding_idx",
    "table_dtype",
    "vocab_padding_multiple",
)

_PRETRAINED_KWARGS = (
    "pretrained_embeddings",
    "pretrained_output_dims",
    "pretrained_trainable",
    "pretrained_projection_dim",
    "pretrained_sequence_combiner",
)


def _check_known_kwargs(kwargs):
    """Fail fast on unknown from_schema kwargs — a silently-dropped option
    (or a typo like embedding_dim=) otherwise trains with defaults and the
    user never learns their setting did nothing."""
    unknown = [
        k for k in kwargs
        if k not in _EMBEDDING_KWARGS
        and k not in _PRETRAINED_KWARGS
        and k not in ("pre", "post")
        and not k.startswith("soft_embedding")
    ]
    if unknown:
        raise TypeError(
            f"from_schema got unknown keyword argument(s) {unknown}; "
            f"accepted extras: {sorted(_EMBEDDING_KWARGS + _PRETRAINED_KWARGS)}"
            " + pre/post + soft_embedding_*"
        )


class TabularFeatures(TabularBlock):
    """Tag-routed input block over continuous + categorical (+ soft/pretrained)."""

    continuous_module: Optional[TabularBlock] = None
    categorical_module: Optional[TabularBlock] = None
    pretrained_module: Optional[TabularBlock] = None
    continuous_projection: Optional[Sequence[int]] = None

    EMBEDDING_MODULE_CLASS = EmbeddingFeatures
    SOFT_EMBEDDING_MODULE_CLASS = SoftEmbeddingFeatures
    CONTINUOUS_MODULE_CLASS = ContinuousFeatures
    PRETRAINED_MODULE_CLASS = PretrainedEmbeddingFeatures

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        continuous_tags=(Tags.CONTINUOUS,),
        categorical_tags=(Tags.CATEGORICAL,),
        aggregation: Optional[str] = None,
        continuous_projection: Optional[Union[int, Sequence[int]]] = None,
        continuous_soft_embeddings: bool = False,
        **kwargs,
    ) -> "TabularFeatures":
        _check_known_kwargs(kwargs)
        maybe_continuous = None
        maybe_categorical = None

        if continuous_tags:
            cont_schema = schema.select_by_tag(list(continuous_tags))
            if len(cont_schema) > 0:
                if continuous_soft_embeddings:
                    maybe_continuous = cls.SOFT_EMBEDDING_MODULE_CLASS.from_schema(
                        cont_schema,
                        **{k: v for k, v in kwargs.items() if k.startswith("soft_embedding")},
                    )
                else:
                    maybe_continuous = cls.CONTINUOUS_MODULE_CLASS(
                        features=tuple(cont_schema.column_names), schema=cont_schema
                    )
        if categorical_tags:
            cat_schema = schema.select_by_tag(list(categorical_tags))
            if len(cat_schema) > 0:
                emb_kwargs = {
                    k: v
                    for k, v in kwargs.items()
                    if k in _EMBEDDING_KWARGS
                }
                maybe_categorical = cls.EMBEDDING_MODULE_CLASS.from_schema(
                    cat_schema, **emb_kwargs
                )

        if isinstance(continuous_projection, int):
            continuous_projection = [continuous_projection]

        # pretrained embeddings (reference tabular.py:125-190): either
        # explicit {col: matrix} tables looked up in-model, or columns tagged
        # Tags.EMBEDDING whose batch values are precomputed vectors
        maybe_pretrained = None
        pretrained_tables = kwargs.get("pretrained_embeddings") or {}
        pre_schema = schema.select_by_tag([Tags.EMBEDDING])
        precomputed = tuple(
            n for n in pre_schema.column_names if n not in pretrained_tables
        )
        if pretrained_tables or precomputed:
            dims = kwargs.get("pretrained_output_dims") or {}
            if isinstance(dims, int):
                dims = {n: dims for n in precomputed}
            maybe_pretrained = cls.PRETRAINED_MODULE_CLASS(
                pretrained_embeddings=dict(pretrained_tables),
                precomputed_features=precomputed,
                precomputed_dims=dims,
                trainable=kwargs.get("pretrained_trainable", False),
                projection_dim=kwargs.get("pretrained_projection_dim"),
                sequence_combiner=kwargs.get("pretrained_sequence_combiner"),
            )

        extra = {
            k: v
            for k, v in kwargs.items()
            if k in ("pre", "post")
        }
        return cls(
            continuous_module=maybe_continuous,
            categorical_module=maybe_categorical,
            pretrained_module=maybe_pretrained,
            continuous_projection=tuple(continuous_projection) if continuous_projection else None,
            aggregation=aggregation,
            schema=schema,
            **extra,
        )

    @property
    def item_id(self) -> Optional[str]:
        if self.categorical_module is not None:
            return getattr(self.categorical_module, "item_id", None)
        return None

    @property
    def padding_idx(self) -> int:
        """The id marking padding (the embedding layer's convention; 0 by
        default — sequence.py and Head build pad masks from it)."""
        if self.categorical_module is not None:
            return int(getattr(self.categorical_module, "padding_idx", 0))
        return 0

    def item_embedding_table(self) -> jnp.ndarray:
        if self.categorical_module is None:
            raise ValueError("No categorical module")
        return self.categorical_module.item_embedding_table()

    def _project_continuous(self, cont_out: TabularData, training: bool) -> TabularData:
        """Concat continuous features and project through an MLP
        (reference tabular.py continuous_projection / sequence.py:271-284)."""
        agg = parse_aggregation("concat")
        x = agg(cont_out)
        for i, dim in enumerate(self.continuous_projection):
            x = nn.Dense(dim, name=f"continuous_projection_{i}")(x)
            x = nn.relu(x)
        return {"continuous_projection": x}

    def compute(self, inputs: TabularData, training: bool = False) -> TabularData:
        out: TabularData = {}
        if self.continuous_module is not None:
            cont = self.continuous_module(inputs, training=training)
            if self.continuous_projection:
                cont = self._project_continuous(cont, training)
            out.update(cont)
        if self.categorical_module is not None:
            out.update(self.categorical_module(inputs, training=training))
        if self.pretrained_module is not None:
            out.update(self.pretrained_module(inputs, training=training))
        return out

    def feature_sizes(self) -> Dict[str, int]:
        sizes: Dict[str, int] = {}
        if self.continuous_module is not None:
            if self.continuous_projection:
                sizes["continuous_projection"] = self.continuous_projection[-1]
            else:
                sizes.update(self.continuous_module.feature_sizes())
        if self.categorical_module is not None:
            sizes.update(self.categorical_module.feature_sizes())
        if self.pretrained_module is not None:
            sizes.update(self.pretrained_module.feature_sizes())
        return sizes
