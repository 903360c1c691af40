from .aggregation import (
    ConcatFeatures,
    ElementwiseSum,
    ElementwiseSumItemMulti,
    StackFeatures,
)
from .base import (
    AsTabular,
    FilterFeatures,
    MergeTabular,
    SequentialTransformation,
    TabularAggregation,
    TabularBlock,
    TabularData,
    TabularTransformation,
    parse_aggregation,
    parse_transformation,
    tabular_aggregation_registry,
    tabular_transformation_registry,
)
from .transformations import StochasticSwapNoise, TabularDropout, TabularLayerNorm

__all__ = [
    "AsTabular",
    "ConcatFeatures",
    "ElementwiseSum",
    "ElementwiseSumItemMulti",
    "FilterFeatures",
    "MergeTabular",
    "SequentialTransformation",
    "StackFeatures",
    "StochasticSwapNoise",
    "TabularAggregation",
    "TabularBlock",
    "TabularData",
    "TabularDropout",
    "TabularLayerNorm",
    "TabularTransformation",
    "parse_aggregation",
    "parse_transformation",
    "tabular_aggregation_registry",
    "tabular_transformation_registry",
]
