from .attention import flash_attention, reference_attention, use_flash
from .vocab import fused_label_rank, fused_softmax_ce, fused_topk

__all__ = [
    "flash_attention",
    "fused_label_rank",
    "fused_softmax_ce",
    "fused_topk",
    "reference_attention",
    "use_flash",
]
