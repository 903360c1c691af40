"""Sequence input module: THE schema→input-block factory.

Parity: /root/reference/transformers4rec/torch/features/sequence.py —
``TabularSequenceFeatures`` (:97-296): tag routing, aggregation (forced to
"concat" when masking/projection set, :208-210), projection MLP to ``d_output``
(:213-219), masking hook (:221-227, applied in forward :252-269);
``SequenceEmbeddingFeatures`` handled in features/embedding.py.

TPU-first: ``__call__`` returns ``(hidden, MaskingInfo | None)`` — masking state
is a value, not module state (SURVEY.md §7.1). The padding mask comes from the
item-id column (reference config/schema.py:21-72 get_padding_mask_from_item_id).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..masking import MaskingInfo, MaskSequence, masking_registry
from ..schema import Schema, Tags
from ..tabular.base import TabularData, parse_aggregation, parse_transformation
from .embedding import SequenceEmbeddingFeatures
from .tabular import TabularFeatures


class TabularSequenceFeatures(TabularFeatures):
    """Schema-driven sequential input module: embeddings + continuous →
    aggregation → projection to ``d_output`` → masking."""

    EMBEDDING_MODULE_CLASS = SequenceEmbeddingFeatures

    projection_dims: Optional[Sequence[int]] = None  # MLP to d_output
    masking: Optional[MaskSequence] = None
    d_output: Optional[int] = None

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        continuous_tags=(Tags.CONTINUOUS,),
        categorical_tags=(Tags.CATEGORICAL,),
        aggregation: Optional[str] = None,
        # accepted for reference API parity (sequence.py:149, used there for
        # build-time output-size tracing); inert here — static shapes come
        # from the loader's max_sequence_length, and output_size() is
        # analytic
        max_sequence_length: Optional[int] = None,
        continuous_projection: Optional[Union[int, Sequence[int]]] = None,
        continuous_soft_embeddings: bool = False,
        projection: Optional[Sequence[int]] = None,
        d_output: Optional[int] = None,
        masking: Optional[Union[str, MaskSequence]] = None,
        masking_kwargs: Optional[dict] = None,
        **kwargs,
    ) -> "TabularSequenceFeatures":
        # keep the embedding layer's padding convention in sync with the
        # masking scheme's (both default 0)
        if (masking_kwargs or {}).get("padding_idx") is not None:
            kwargs.setdefault("padding_idx", masking_kwargs["padding_idx"])
        base = super().from_schema(
            schema,
            continuous_tags=continuous_tags,
            categorical_tags=categorical_tags,
            aggregation=aggregation,
            continuous_projection=continuous_projection,
            continuous_soft_embeddings=continuous_soft_embeddings,
            **kwargs,
        )
        agg = base.aggregation
        if (
            masking is not None or d_output is not None
            or projection is not None
        ) and not agg:
            # masking/projection require a single tensor: force concat
            # (reference sequence.py:208-210 — projection included there too;
            # without this a projection-only module would silently skip its
            # Dense layers and output_size() would lie)
            agg = "concat"

        projection_dims: Optional[Tuple[int, ...]] = None
        if projection is not None:
            projection_dims = tuple(projection) if not isinstance(projection, int) else (projection,)
            if d_output is not None and (not projection_dims or projection_dims[-1] != d_output):
                projection_dims = tuple(projection_dims) + (d_output,)
        elif d_output is not None:
            projection_dims = (d_output,)

        hidden = (projection_dims[-1] if projection_dims else None) or d_output
        mask_module: Optional[MaskSequence] = None
        if masking is not None:
            if isinstance(masking, str):
                if hidden is None:
                    # hidden = aggregated size when no projection
                    hidden = base.clone(aggregation=agg).output_size()
                mask_module = masking_registry.parse(masking)(
                    hidden_size=hidden, **(masking_kwargs or {})
                )
            else:
                mask_module = masking

        return base.clone(
            aggregation=agg,
            projection_dims=projection_dims,
            masking=mask_module,
            d_output=d_output or hidden,
        )

    def output_size(self) -> int:
        if self.projection_dims:
            return self.projection_dims[-1]
        return super().output_size()

    @property
    def masking_enabled(self) -> bool:
        return self.masking is not None

    @nn.compact
    def __call__(
        self,
        inputs: TabularData,
        training: bool = False,
        testing: bool = False,
        **kwargs,
    ):
        item_ids = None
        if self.item_id is not None and self.item_id in inputs:
            item_ids = inputs[self.item_id].astype(jnp.int32)
        pad = self.padding_idx
        pad_mask = (item_ids != pad) if item_ids is not None else None

        pre = parse_transformation(self.pre)
        if pre is not None:
            inputs = pre(inputs, training=training, pad_mask=pad_mask)

        outputs = self.compute(inputs, training=training)

        post = parse_transformation(self.post)
        if post is not None:
            outputs = post(outputs, training=training, pad_mask=pad_mask)

        agg = parse_aggregation(self.aggregation, self.schema)
        if agg is None:
            return outputs, None
        hidden = agg(outputs)

        if self.projection_dims:
            for i, dim in enumerate(self.projection_dims):
                hidden = nn.Dense(dim, name=f"projection_{i}")(hidden)
                if i + 1 < len(self.projection_dims):
                    hidden = nn.relu(hidden)

        info: Optional[MaskingInfo] = None
        if self.masking is not None:
            if item_ids is None:
                raise ValueError("Masking requires an item_id column in the schema/inputs")
            # session packing: an optional (B, S) `segment_ids` batch key (not a
            # schema feature) threads through masking → MaskingInfo → encoder
            hidden, info = self.masking(
                hidden, item_ids, training=training, testing=testing,
                segment_ids=inputs.get("segment_ids"),
            )
            # thread item ids + (tied) item table to the prediction head as values
            table = None
            if self.item_id is not None:
                table = self.item_embedding_table()
            info = info.replace(
                item_ids=item_ids, item_table=table,
                # reserved key (never a schema feature): pre-drawn sampled-
                # softmax negatives from the sparse-embedding train step
                neg_ids=inputs.get("__neg_ids__"),
            )
        return hidden, info
