"""Continuous feature input block.

Parity: /root/reference/transformers4rec/torch/features/continuous.py:34-68 —
filter the selected columns and unsqueeze a feature dim.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from ..schema import Schema, Tags
from ..tabular.base import TabularBlock, TabularData


class ContinuousFeatures(TabularBlock):
    """Filter continuous columns; output each as (..., 1) float arrays."""

    features: Sequence[str] = ()

    @classmethod
    def from_schema(cls, schema: Schema, tags=(Tags.CONTINUOUS,), **kwargs) -> "ContinuousFeatures":
        selected = schema.select_by_tag(list(tags))
        return cls(features=tuple(selected.column_names), schema=selected, **kwargs)

    def compute(self, inputs: TabularData, training: bool = False) -> TabularData:
        out: TabularData = {}
        for name in self.features:
            if name not in inputs:
                continue
            val = inputs[name].astype(jnp.float32)
            out[name] = val[..., None]
        return out

    def feature_sizes(self) -> Dict[str, int]:
        return {name: 1 for name in self.features}
