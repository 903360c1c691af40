from .attention import flash_attention, reference_attention, use_flash
from .fused_adafactor import fused_adafactor
from .sparse_update import (
    label_embedding_params,
    lazy_adam,
    sharded_rows_adam_update,
    sparse_rows_adam_init,
    sparse_rows_adam_update,
)
from .vocab import fused_ce_and_rank, fused_label_rank, fused_softmax_ce, fused_topk

__all__ = [
    "flash_attention",
    "fused_adafactor",
    "fused_ce_and_rank",
    "fused_label_rank",
    "fused_softmax_ce",
    "fused_topk",
    "label_embedding_params",
    "lazy_adam",
    "reference_attention",
    "sharded_rows_adam_update",
    "sparse_rows_adam_init",
    "sparse_rows_adam_update",
    "use_flash",
]
