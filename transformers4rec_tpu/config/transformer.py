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
    # Reformer capabilities (reference config/transformer.py:142-207):
    # per-layer attention pattern ('dense'|'local'|'lsh'), axial factorized
    # positions, LSH knobs — all None/default for the other eight archs
    attn_layers: Optional[tuple] = None
    axial_pos_shape: Optional[tuple] = None
    axial_pos_embds_dim: Optional[tuple] = None
    lsh_num_buckets: int = 8
    lsh_num_hashes: int = 2
    lsh_chunk_size: int = 8
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
            attn_layers=(
                tuple(self.attn_layers) if self.attn_layers is not None else None
            ),
            axial_pos_shape=(
                tuple(self.axial_pos_shape)
                if self.axial_pos_shape is not None else None
            ),
            axial_pos_embds_dim=(
                tuple(self.axial_pos_embds_dim)
                if self.axial_pos_embds_dim is not None else None
            ),
            lsh_num_buckets=self.lsh_num_buckets,
            lsh_num_hashes=self.lsh_num_hashes,
            lsh_chunk_size=self.lsh_chunk_size,
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
            # only Reformer (dedicated class below) interprets axial shapes;
            # accepted-and-ignored here for arg parity
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
@transformer_registry.register("reformer")
@dataclasses.dataclass
class ReformerConfig(T4RecConfig):
    """Reformer: alternating local/LSH attention layers + axial factorized
    positions (reference config/transformer.py:142-207 → HF Reformer). The
    reference builds ``attn_layers=["local","lsh"]*(n_layer//2)`` when
    n_layer>2 else ``["local"]`` and always uses axial positions with
    ``axial_pos_shape=[first_dim, total/first_dim]`` and half/half embedding
    dims; mirrored here onto the unified encoder's per-layer pattern +
    ``pos_encoding='axial'`` (blocks/transformer.py, ops/lsh_attention.py).
    ``local_attn_chunk_length``/``attention_window`` set the local window;
    the LSH chunk follows the local window only at short sequences — at
    max_position >= 128 it auto-scales to HF's chunk 64 (with
    ``lsh_num_buckets`` ~ 2·S/chunk) unless passed explicitly."""

    arch: str = "reformer"

    @classmethod
    def build(cls, d_model, n_head, n_layer, total_seq_length,
              axial_pos_shape_first_dim=4, **kwargs):
        pad = 2  # MLM inference [MASK] headroom like the other encoder archs
        merged = {"causal": False, "masking": "mlm", "local_window": 8}
        merged.update(kwargs)
        for alias in ("attention_window", "local_attn_chunk_length"):
            if alias in merged:
                win = merged.pop(alias)
                merged["local_window"] = (
                    None if win is None or win >= total_seq_length + pad
                    else int(win)
                )
        max_pos = max(total_seq_length + pad, 8)
        # LSH knobs scale with sequence length (HF Reformer: chunk 64 and
        # auto num_buckets ~ S/chunk; a fixed tiny bucket count would let
        # average bucket size grow with S and collapse the chunk coverage).
        # Short sequences inherit the local window as the chunk so the two
        # attention flavors see comparable neighborhoods.
        if merged.get("lsh_chunk_size") is None:
            if max_pos >= 128:
                merged["lsh_chunk_size"] = 64
            elif merged["local_window"] is not None:
                merged["lsh_chunk_size"] = int(merged["local_window"])
            else:
                merged.pop("lsh_chunk_size", None)  # dataclass default
        chunk = merged.get("lsh_chunk_size", cls.lsh_chunk_size)
        if merged.get("lsh_num_buckets") is None:
            # 2·ceil(S/chunk) is even by construction (the LSH hash needs an
            # even bucket count); average bucket ≈ chunk/2 keys, covered by
            # a query's own + previous chunk
            merged["lsh_num_buckets"] = min(
                max(4, 2 * (-(-max_pos // max(chunk, 1)))), 512
            )
        merged.setdefault("pos_encoding", "axial")
        if merged["pos_encoding"] == "axial":
            d1 = int(axial_pos_shape_first_dim)
            merged.setdefault("axial_pos_shape", (d1, -(-max_pos // d1)))
            merged.setdefault(
                "axial_pos_embds_dim", (d_model // 2, d_model - d_model // 2)
            )
        if "attn_layers" not in merged:
            # reference pattern, cycled to n_layer entries for odd depths
            merged["attn_layers"] = (
                tuple(("local", "lsh")[i % 2] for i in range(n_layer))
                if n_layer > 2 else ("local",) * n_layer
            )
        return cls(
            d_model=d_model, n_head=n_head, n_layer=n_layer,
            total_seq_length=total_seq_length + pad, **merged,
        )
GPT2Config = _register("gpt2", causal=True, masking="clm")
TransfoXLConfig = _register(
    "transfoxl", causal=True, pos_encoding="relative_bias", masking="clm"
)
