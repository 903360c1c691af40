"""Experimental blocks.

Parity: /root/reference/transformers4rec/torch/experimental.py:22-113 —
``PostContextFusion``: Latent-Cross style post-fusion of context features with
the sequential representation (Beutel et al.; the reference cites SIGIR'21 /
RecSys'22 challenge wins).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PostContextFusion(nn.Module):
    """Fuse a context representation into the sequential module's output just
    before prediction.

    ``sequential_module``: block returning ``(hidden (B,S,D), MaskingInfo)``
    (e.g. a SequentialBlock of input+transformer).
    ``post_context_module``: block over the same inputs returning (B, C) or
    (B, S, C) context.
    ``fusion_aggregation``: 'elementwise-mul' (seq * (1 + proj(ctx))),
    'elementwise-sum', or 'concat' — reference experimental.py:81-100.
    """

    sequential_module: Any = None
    post_context_module: Any = None
    fusion_aggregation: str = "elementwise-mul"

    def output_size(self) -> int:
        seq_dim = self.sequential_module.output_size()
        if self.fusion_aggregation == "concat":
            return seq_dim + self.post_context_module.output_size()
        return seq_dim

    @nn.compact
    def __call__(self, inputs, training: bool = False, testing: bool = False, **kwargs):
        seq_out = self.sequential_module(
            inputs, training=training, testing=testing, **kwargs
        )
        info = None
        if isinstance(seq_out, tuple):
            seq_rep, info = seq_out
        else:
            seq_rep = seq_out
        ctx = self.post_context_module(inputs, training=training)
        if isinstance(ctx, tuple):  # (hidden, info) from a sequence input block
            ctx = ctx[0]
        if isinstance(ctx, dict):
            raise ValueError(
                "post_context_module must aggregate to a single array "
                "(set aggregation='concat' on the block)"
            )
        if ctx.ndim == 2:
            ctx = jnp.broadcast_to(
                ctx[:, None, :], (ctx.shape[0], seq_rep.shape[1], ctx.shape[-1])
            )
        if self.fusion_aggregation.startswith("elementwise"):
            ctx = nn.Dense(seq_rep.shape[-1], name="context_projection")(ctx)
        if self.fusion_aggregation == "concat":
            out = jnp.concatenate([seq_rep, ctx], axis=-1)
        elif self.fusion_aggregation == "elementwise-mul":
            out = seq_rep * (1.0 + ctx)
        elif self.fusion_aggregation == "elementwise-sum":
            out = seq_rep + ctx
        else:
            raise ValueError(
                f"The aggregation {self.fusion_aggregation} is not supported; "
                "use one of ['concat', 'elementwise-mul', 'elementwise-sum']"
            )
        return (out, info) if info is not None else out
