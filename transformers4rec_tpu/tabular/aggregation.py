"""Feature aggregations: dict-of-arrays → array.

Parity: /root/reference/transformers4rec/torch/tabular/aggregation.py
(ConcatFeatures :28-52 with sorted-key order :43, StackFeatures :56-97,
ElementwiseSum :140-157, ElementwiseSumItemMulti :161-193).
All stateless; concat order is sorted-by-name for determinism.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..schema import Schema
from .base import TabularAggregation, TabularData, tabular_aggregation_registry


@tabular_aggregation_registry.register("concat")
class ConcatFeatures(TabularAggregation):
    """Concatenate along the last axis, sorted-key order."""

    def __init__(self, axis: int = -1, schema=None):
        self.axis = axis

    def __call__(self, inputs: TabularData) -> jnp.ndarray:
        inputs = self._expand_non_sequential(inputs)
        return jnp.concatenate([inputs[k] for k in sorted(inputs)], axis=self.axis)

    def output_size(self, input_sizes: Dict[str, int]) -> int:
        return sum(input_sizes.values())


@tabular_aggregation_registry.register("stack")
class StackFeatures(TabularAggregation):
    """Stack along a new axis (features must share dims), sorted-key order."""

    def __init__(self, axis: int = -1, schema=None):
        self.axis = axis

    def __call__(self, inputs: TabularData) -> jnp.ndarray:
        inputs = self._expand_non_sequential(inputs)
        return jnp.stack([inputs[k] for k in sorted(inputs)], axis=self.axis)

    def output_size(self, input_sizes: Dict[str, int]) -> int:
        sizes = set(input_sizes.values())
        if len(sizes) != 1:
            raise ValueError(f"stack requires equal dims, got {input_sizes}")
        # the default axis=-1 stacks features into a NEW last axis, so the
        # output's trailing dim is the FEATURE COUNT (reference
        # forward_output_size semantics), not the shared per-feature dim
        if self.axis in (-1, None):
            return len(input_sizes)
        return next(iter(sizes))


def _check_equal_dims(inputs: TabularData):
    shapes = {k: v.shape[-1] for k, v in inputs.items()}
    if len(set(shapes.values())) > 1:
        raise ValueError(
            f"Elementwise aggregation requires equal last dims, got {shapes}. "
            "Hint: pass matching embedding dims or a continuous projection."
        )


@tabular_aggregation_registry.register("element-wise-sum", "elementwise-sum", "sum")
class ElementwiseSum(TabularAggregation):
    def __init__(self, schema=None):
        pass

    def __call__(self, inputs: TabularData) -> jnp.ndarray:
        inputs = self._expand_non_sequential(inputs)
        _check_equal_dims(inputs)
        return sum(inputs.values())

    def output_size(self, input_sizes: Dict[str, int]) -> int:
        sizes = set(input_sizes.values())
        if len(sizes) != 1:
            raise ValueError(f"element-wise-sum requires equal dims, got {input_sizes}")
        return next(iter(sizes))


@tabular_aggregation_registry.register("element-wise-sum-item-multi", "elementwise-sum-item-multi")
class ElementwiseSumItemMulti(TabularAggregation):
    """item_embedding * sum(all other feature embeddings). Requires schema for the
    item-id column name (reference aggregation.py:161-193)."""

    def __init__(self, schema: Optional[Schema] = None):
        if schema is None:
            raise ValueError("element-wise-sum-item-multi requires a schema")
        self.item_col = schema.item_id_column_name

    def __call__(self, inputs: TabularData) -> jnp.ndarray:
        inputs = self._expand_non_sequential(inputs)
        _check_equal_dims(inputs)
        item = inputs[self.item_col]
        others = [v for k, v in inputs.items() if k != self.item_col]
        if not others:
            raise ValueError("element-wise-sum-item-multi needs at least one non-item feature")
        return item * sum(others)

    def output_size(self, input_sizes: Dict[str, int]) -> int:
        sizes = set(input_sizes.values())
        if len(sizes) != 1:
            raise ValueError(f"element-wise-sum-item-multi requires equal dims, got {input_sizes}")
        return next(iter(sizes))
