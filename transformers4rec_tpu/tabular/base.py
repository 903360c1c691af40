"""Tabular core: the dict-of-arrays ("TabularData") compute model.

Parity targets in the reference (/root/reference/transformers4rec/torch/tabular/base.py):
- ``TabularModule`` pre → forward → post → aggregation pipeline (base.py:155-426)
- ``TabularAggregation`` dict→tensor including non-sequential broadcasting (base.py:47-116)
- ``FilterFeatures`` (base.py:429-477), ``TabularBlock`` (base.py:481-547),
  ``MergeTabular`` (base.py:554-622), ``AsTabular`` (base.py:625-642)

TPU-first redesign: blocks are flax.linen modules (pure init/apply, params as
pytrees); aggregations are stateless callables; no module-level mutable state.
``output_size`` is computed analytically from the schema (static shapes for XLA)
instead of the reference's run-time shape propagation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from ..schema import Schema
from ..utils.registry import Registry

TabularData = Dict[str, jnp.ndarray]

tabular_aggregation_registry: Registry = Registry("tabular_aggregation")
tabular_transformation_registry: Registry = Registry("tabular_transformation")


class TabularAggregation:
    """Stateless dict→tensor reduction. Subclasses registered by name."""

    def __call__(self, inputs: TabularData) -> jnp.ndarray:
        raise NotImplementedError

    def output_size(self, input_sizes: Dict[str, int]) -> int:
        """Final feature dim given per-feature dims."""
        raise NotImplementedError

    @staticmethod
    def _expand_non_sequential(inputs: TabularData) -> TabularData:
        """Broadcast (B, D) features to (B, S, D) when mixed with sequential ones
        (reference base.py:53-63)."""
        ndims = {v.ndim for v in inputs.values()}
        if ndims == {2, 3}:
            seq_len = next(v.shape[1] for v in inputs.values() if v.ndim == 3)
            return {
                k: (jnp.broadcast_to(v[:, None, :], (v.shape[0], seq_len, v.shape[1]))
                    if v.ndim == 2 else v)
                for k, v in inputs.items()
            }
        return inputs


def parse_aggregation(agg, schema: Optional[Schema] = None) -> Optional[TabularAggregation]:
    if agg is None or isinstance(agg, TabularAggregation):
        return agg
    cls = tabular_aggregation_registry.parse(agg)
    try:
        return cls(schema=schema)
    except TypeError:
        return cls()


class TabularTransformation(nn.Module):
    """dict→dict transformation (may hold params / use RNG). Linen module."""

    def __call__(
        self, inputs: TabularData, training: bool = False,
        pad_mask: Optional[jnp.ndarray] = None,
    ) -> TabularData:
        raise NotImplementedError


def parse_transformation(t, **kwargs):
    """str | instance | sequence → single transformation instance (or chain)."""
    if t is None:
        return None
    if isinstance(t, (list, tuple)):
        parsed = [parse_transformation(x, **kwargs) for x in t]
        return SequentialTransformation(transformations=tuple(parsed))
    if isinstance(t, str):
        cls = tabular_transformation_registry.parse(t)
        return cls(**kwargs)
    return t


class SequentialTransformation(TabularTransformation):
    transformations: Sequence[TabularTransformation] = ()

    @nn.compact
    def __call__(self, inputs, training=False, pad_mask=None):
        for t in self.transformations:
            inputs = t(inputs, training=training, pad_mask=pad_mask)
        return inputs


class FilterFeatures:
    """Keep (or exclude) a set of keys from a TabularData dict (reference
    base.py:429-477).

    ``pop`` is accepted for API parity but is a no-op: the reference mutates
    the caller's dict in place (base.py:460-462); here inputs are never
    mutated — downstream blocks receive exactly the dict they are passed.
    """

    def __init__(self, to_include: Sequence[str], pop: bool = False, exclude: bool = False):
        self.to_include = list(to_include)
        self.pop = pop
        self.exclude = exclude

    def __call__(self, inputs: TabularData) -> TabularData:
        if self.exclude:
            return {k: v for k, v in inputs.items() if k not in self.to_include}
        return {k: v for k, v in inputs.items() if k in self.to_include}


class TabularBlock(nn.Module):
    """Base for blocks taking and producing TabularData, with the
    pre → compute → post → aggregation pipeline (reference base.py:358-399).

    Subclasses implement ``compute(inputs, training) -> TabularData`` and
    ``feature_sizes() -> Dict[str, int]`` (per-feature output dims).
    """

    pre: Any = None
    post: Any = None
    aggregation: Any = None
    schema: Optional[Schema] = None

    def compute(self, inputs: TabularData, training: bool = False) -> TabularData:
        return inputs

    def feature_sizes(self) -> Dict[str, int]:
        raise NotImplementedError

    def output_size(self) -> int:
        """Aggregated feature dim (analytic; no tracing needed)."""
        sizes = self.feature_sizes()
        agg = parse_aggregation(self.aggregation, self.schema)
        if agg is None:
            return sum(sizes.values())
        return agg.output_size(sizes)

    @nn.compact
    def __call__(
        self,
        inputs: TabularData,
        training: bool = False,
        pad_mask: Optional[jnp.ndarray] = None,
        merge_with: Optional[Union["TabularBlock", List["TabularBlock"]]] = None,
        aggregation=None,
    ):
        pre = parse_transformation(self.pre)
        if pre is not None:
            inputs = pre(inputs, training=training, pad_mask=pad_mask)

        # pad-mask-aware compute(): subclasses that declare a pad_mask
        # parameter (MergeTabular threads it to children) receive it
        import inspect

        if "pad_mask" in inspect.signature(self.compute).parameters:
            outputs = self.compute(inputs, training=training, pad_mask=pad_mask)
        else:
            outputs = self.compute(inputs, training=training)

        if merge_with is not None:
            # copy before merging: the default compute() returns `inputs` by
            # identity, and update() would mutate the CALLER's dict
            outputs = dict(outputs)
            for block in merge_with if isinstance(merge_with, list) else [merge_with]:
                merged = block(inputs, training=training, pad_mask=pad_mask)
                if not isinstance(merged, dict):
                    raise ValueError(
                        f"merge_with block {block!r} returned an aggregated "
                        f"array — merged blocks must return TabularData "
                        f"(unset their aggregation)"
                    )
                outputs.update(merged)

        post = parse_transformation(self.post)
        if post is not None:
            outputs = post(outputs, training=training, pad_mask=pad_mask)

        agg = parse_aggregation(aggregation or self.aggregation, self.schema)
        if agg is not None:
            return agg(outputs)
        return outputs


class MergeTabular(TabularBlock):
    """Run several tabular blocks on the same inputs and merge their output dicts
    (reference base.py:554-622; the ``module + other`` operator)."""

    to_merge: Sequence[TabularBlock] = ()

    def compute(self, inputs: TabularData, training: bool = False,
                pad_mask=None) -> TabularData:
        # children get the pad_mask too — their pre/post transformations
        # (e.g. StochasticSwapNoise) need it
        out: TabularData = {}
        for block in self.to_merge:
            out.update(block(inputs, training=training, pad_mask=pad_mask))
        return out

    def feature_sizes(self) -> Dict[str, int]:
        sizes: Dict[str, int] = {}
        for block in self.to_merge:
            sizes.update(block.feature_sizes())
        return sizes


class AsTabular(nn.Module):
    """Wrap a plain array back into TabularData under ``output_name``
    (reference base.py:625-642)."""

    output_name: str = "output"

    def __call__(self, inputs: jnp.ndarray, **kwargs) -> TabularData:
        return {self.output_name: inputs}


# Reference-name compatibility (tabular/base.py:155-426): the reference splits
# TabularModule (no shape plumbing) from TabularBlock; one class covers both
# here since shapes are analytic from the schema.
TabularModule = TabularBlock


def SequentialTabularTransformations(*transformation) -> SequentialTransformation:
    """Chain transformations in order (reference tabular/base.py:124-142).

    Factory keeping the reference's ``*args`` calling convention (linen modules
    are frozen dataclasses, so the chain itself takes ``transformations=``).
    Accepts names, instances, or a single list of either.
    """
    if len(transformation) == 1 and isinstance(transformation[0], (list, tuple)):
        transformation = tuple(transformation[0])
    parsed = tuple(parse_transformation(t) for t in transformation)
    return SequentialTransformation(transformations=parsed)
