from .base import (
    MASKING_COMPAT,
    Block,
    BlockBase,
    build_blocks,
    MLPBlock,
    RNNBlock,
    SequentialBlock,
    TransformerBlock,
    check_masking_compat,
    right_shift_block,
)
from .transformer import (
    MultiHeadAttention,
    RelativePositionBias,
    TransformerEncoder,
    TransformerLayer,
    make_attention_bias,
)

__all__ = [
    "Block",
    "BlockBase",
    "build_blocks",
    "MLPBlock",
    "RNNBlock",
    "MASKING_COMPAT",
    "MultiHeadAttention",
    "RelativePositionBias",
    "SequentialBlock",
    "TransformerBlock",
    "TransformerEncoder",
    "TransformerLayer",
    "check_masking_compat",
    "make_attention_bias",
    "right_shift_block",
]
