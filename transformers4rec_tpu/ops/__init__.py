from .vocab import fused_label_rank, fused_softmax_ce, fused_topk

__all__ = ["fused_label_rank", "fused_softmax_ce", "fused_topk"]
