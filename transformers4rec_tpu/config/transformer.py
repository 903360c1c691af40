"""Transformer architecture configs with a unified ``build()`` API.

Parity: /root/reference/transformers4rec/config/transformer.py — ``T4RecConfig``
(:52-139) with per-arch registered configs: reformer (:142), gpt2 (:210),
longformer (:263), electra (:315), albert (:369), xlnet (:423), bert (:485),
roberta (:537), transfo-xl (:589). The reference maps unified ``build(d_model,
n_head, n_layer, total_seq_length, ...)`` args onto HF config fields and sets
``vocab_size=1`` because embeddings are external (transformer.py:205...637).

TPU-first redesign: every config resolves to kwargs of the ONE unified
``TransformerEncoder`` (blocks/transformer.py) instead of nine HF model ports —
the per-arch differences become capability flags (causal, pos_encoding,
share_layers, local_window, two_stream). Encoder archs keep the reference's
``total_seq_length += 2`` headroom for the MLM inference [MASK] extension
(transformer.py:180-181 etc.).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from ..utils.registry import Registry

transformer_registry: Registry = Registry("transformer")


@dataclasses.dataclass
class T4RecConfig:
    """Architecture-agnostic transformer config. ``to_encoder()`` instantiates
    the unified flax body; ``to_model(input_module, *tasks)`` builds a full
    model (reference transformer.py:71-131 one-liner factory)."""

    d_model: int = 64
    n_head: int = 4
    n_layer: int = 2
    total_seq_length: int = 20
    d_ff: int = 0
    hidden_act: str = "gelu"
    dropout: float = 0.1
    attn_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.01
    # capability flags
    causal: bool = False
    pos_encoding: str = "learned_absolute"
    share_layers: bool = False
    local_window: Optional[int] = None
    two_stream: bool = False
    # BERT-family fidelity: post-LN layers (residual→LayerNorm, no final
    # ln_f) + embedding LayerNorm after the position add — admits EXACT HF
    # weight transfer (tests/test_hf_golden.py). Pre-LN stays the default for
    # the decoder/XLNet archs (GPT-2 is pre-LN in HF too).
    norm_first: bool = True
    embed_layer_norm: bool = False
    remat: bool = False  # gradient checkpointing (jax.checkpoint per layer)
    # XLNet/TransfoXL segment-recurrence cache (reference
    # config/transformer.py:454-460, 638): encoder caches mem_len past
    # positions per layer; thread via __call__(mems=..., return_mems=True)
    mem_len: int = 0
    # masking scheme this arch was built for (informational; compat-checked in
    # TransformerBlock like the reference block/transformer.py:109-134)
    masking: Optional[str] = None
    dtype: Any = None  # jnp dtype or None → float32

    arch: str = "generic"

    @classmethod
    def build(cls, d_model, n_head, n_layer, total_seq_length, **kwargs):
        return cls(
            d_model=d_model, n_head=n_head, n_layer=n_layer,
            total_seq_length=total_seq_length, **kwargs,
        )

    def encoder_kwargs(self) -> Dict[str, Any]:
        import jax.numpy as jnp

        return dict(
            d_model=self.d_model,
            n_head=self.n_head,
            n_layer=self.n_layer,
            d_ff=self.d_ff,
            dropout=self.dropout,
            attn_dropout=self.attn_dropout,
            layer_norm_eps=self.layer_norm_eps,
            activation=self.hidden_act,
            causal=self.causal,
            pos_encoding=self.pos_encoding,
            max_position=max(self.total_seq_length, 8),
            share_layers=self.share_layers,
            local_window=self.local_window,
            two_stream=self.two_stream,
            norm_first=self.norm_first,
            embed_layer_norm=self.embed_layer_norm,
            remat=self.remat,
            mem_len=self.mem_len,
            dtype=self.dtype or jnp.float32,
        )

    def to_encoder(self):
        from ..blocks.transformer import TransformerEncoder

        return TransformerEncoder(**self.encoder_kwargs())

    def to_model(self, input_module, *tasks, **kwargs):
        """One-liner model factory (reference transformer.py:71-131)."""
        from ..model.base import Head, Model
        from ..model.prediction_task import NextItemPredictionTask

        if not tasks:
            tasks = (NextItemPredictionTask(weight_tying=True),)
        head = Head.from_body(
            input_module=input_module, transformer=self, tasks=list(tasks), **kwargs
        )
        return Model(heads=(head,))


def _register(name: str, **defaults):
    @transformer_registry.register(name)
    @dataclasses.dataclass
    class _Config(T4RecConfig):
        arch: str = name

        @classmethod
        def build(cls, d_model, n_head, n_layer, total_seq_length, **kwargs):
            merged = {**defaults, **kwargs}
            pad = merged.pop("_seq_headroom", 0)
            # reference arg-name parity (config/transformer.py:304
            # Longformer ``attention_window``; Reformer local chunks
            # ``local_attn_chunk_length`` :185-204): both bound how far a
            # query attends → the unified encoder's ``local_window`` bias.
            # A window covering the whole (headroom-padded) sequence is
            # dense attention — local_window=None keeps the fast path.
            for alias in ("attention_window", "local_attn_chunk_length"):
                if alias in merged:
                    win = merged.pop(alias)
                    merged["local_window"] = (
                        None if win is None or win >= total_seq_length + pad
                        else int(win)
                    )
            # accepted-for-parity no-ops (Reformer axial positions don't
            # apply: the unified encoder uses learned/relative positions;
            # LSH is a documented non-goal at session lengths — PARITY.md)
            merged.pop("axial_pos_shape_first_dim", None)
            return cls(
                d_model=d_model, n_head=n_head, n_layer=n_layer,
                total_seq_length=total_seq_length + pad, **merged,
            )

    _Config.__name__ = f"{name.capitalize()}ConfigImpl"
    return _Config


# Encoder (bidirectional) archs get +2 seq headroom for the MLM inference
# [MASK] extension (reference transformer.py:180-181, 297-298, ...).
XLNetConfig = _register(
    "xlnet", causal=False, pos_encoding="relative_bias", two_stream=True,
    masking="plm", _seq_headroom=2,
)
# BERT family: post-LN + embedding LayerNorm + exact (erf) gelu — matches the
# HF models the reference wraps layer-for-layer, so real HF weights transfer
# EXACTLY (tests/test_hf_golden.py::test_bert_exact_weight_transfer)
_BERT_FAMILY = dict(
    causal=False, norm_first=False, embed_layer_norm=True,
    hidden_act="gelu_exact", _seq_headroom=2,
)
BertConfig = _register("bert", masking="mlm", **_BERT_FAMILY)
RobertaConfig = _register("roberta", masking="mlm", **_BERT_FAMILY)
ElectraConfig = _register("electra", masking="rtd", **_BERT_FAMILY)
AlbertConfig = _register(
    "albert", share_layers=True, masking="mlm", **_BERT_FAMILY
)
LongformerConfig = _register(
    "longformer", local_window=8, masking="mlm", **_BERT_FAMILY
)
ReformerConfig = _register(
    "reformer", causal=False, local_window=8, masking="mlm", _seq_headroom=2
)
GPT2Config = _register("gpt2", causal=True, masking="clm")
TransfoXLConfig = _register(
    "transfoxl", causal=True, pos_encoding="relative_bias", masking="clm"
)
