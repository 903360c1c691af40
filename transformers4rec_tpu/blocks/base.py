"""Block composition layer: SequentialBlock, MLPBlock, TransformerBlock.

Parity targets:
- /root/reference/transformers4rec/torch/block/base.py — ``BlockBase``/``Block``
  (:32-128), ``SequentialBlock`` with build-on-append shape propagation
  (:131-353) and the ``>>`` composition operator (:394-434).
- block/mlp.py — ``MLPBlock`` → stacked Linear+act(+BN+dropout) (:23-150).
- block/transformer.py — ``TransformerBlock`` (:76-206): accepts config or
  prebuilt model, masking-compat validation (:109-134), merges
  ``masking.transformer_arguments`` into the forward (:179-199).

TPU-first: blocks are linen modules; shape propagation is ANALYTIC via
``output_size()`` (static shapes known from the schema — no tracing), matching
SURVEY.md §7.1. The sequential pipeline threads ``(hidden, MaskingInfo)``
explicitly instead of module state.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from ..config.transformer import T4RecConfig, transformer_registry
from ..masking import MaskingInfo

# masking-compat matrix (reference torch/utils/torch_utils.py:441-473)
_DEFAULT_MASKING = ("clm", "mlm", "rtd", "plm")
MASKING_COMPAT = {
    "bert": ("mlm", "rtd"),
    "roberta": ("mlm", "rtd"),
    "electra": ("mlm", "rtd"),
    "albert": ("mlm", "rtd"),
    "gpt2": ("clm",),
    "transfoxl": ("clm",),
    "longformer": ("clm", "mlm", "rtd"),
    "reformer": ("clm", "mlm", "rtd"),
    "xlnet": _DEFAULT_MASKING,
}

_MASKING_ALIASES = {"causal": "clm", "masked": "mlm", "permutation": "plm", "replacement": "rtd"}


def check_masking_compat(arch: str, masking_name: Optional[str]) -> None:
    if masking_name is None:
        return
    key = _MASKING_ALIASES.get(masking_name.lower(), masking_name.lower())
    allowed = MASKING_COMPAT.get(arch.lower(), _DEFAULT_MASKING)
    if key not in allowed:
        raise ValueError(
            f"{arch} is not supported with masking scheme {masking_name!r}; "
            f"allowed: {allowed} (reference torch_utils.py:441-473)"
        )


class Block(nn.Module):
    """Wrap any callable module with a declared output size
    (reference block/base.py:87-128)."""

    module: Any = None
    output_dim: int = 0

    def output_size(self) -> int:
        return self.output_dim

    @nn.compact
    def __call__(self, inputs, training: bool = False, **kwargs):
        # forward the train/eval switch when the wrapped callable takes it
        # (a dropout-bearing module called without it would misbehave)
        try:
            import inspect

            params = inspect.signature(self.module.__call__).parameters
            if "training" in params or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in params.values()
            ):
                return self.module(inputs, training=training)
        except (TypeError, ValueError):
            pass
        return self.module(inputs)


class MLPBlock(nn.Module):
    """Stacked Dense(+activation, +LayerNorm, +Dropout) over the last axis
    (reference block/mlp.py:23-150; LayerNorm replaces BatchNorm — batch stats
    are host-sync-hostile on TPU; LN is the idiomatic sequence-model choice)."""

    dimensions: Sequence[int] = ()
    activation: str = "relu"
    use_norm: bool = False
    dropout: float = 0.0

    def output_size(self) -> int:
        return self.dimensions[-1]

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False, **kwargs):
        act = getattr(nn, self.activation)
        x = inputs
        for i, dim in enumerate(self.dimensions):
            x = nn.Dense(dim, name=f"dense_{i}")(x)
            x = act(x)
            if self.use_norm:
                x = nn.LayerNorm(name=f"norm_{i}")(x)
            if self.dropout:
                x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class RNNBlock(nn.Module):
    """Recurrent body block — GRU4Rec-style session models (the reference
    supports arbitrary ``torch.nn.GRU``/``LSTM`` bodies wrapped in
    ``tr.Block`` — tests/unit/torch/model/test_head.py
    ``test_item_prediction_with_rnn``). TPU-first: ``flax.linen.RNN`` over a
    GRU/LSTM cell — an ``lax.scan`` under jit, static shapes, no Python
    recurrence. Stacked ``num_layers`` deep; (B, S, D) → (B, S, units).

    Left-to-right recurrence is causal by construction, so the natural
    masking scheme is CLM (MLM would leak nothing rightward anyway — the RNN
    simply cannot see the future)."""

    units: int = 64
    cell_type: str = "gru"  # gru | lstm
    num_layers: int = 1
    dropout: float = 0.0

    def output_size(self) -> int:
        return self.units

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False, **kwargs):
        cell_cls = {"gru": nn.GRUCell, "lstm": nn.OptimizedLSTMCell}.get(
            self.cell_type
        )
        if cell_cls is None:
            raise ValueError(f"unknown cell_type {self.cell_type!r}")
        x = inputs
        for i in range(self.num_layers):
            rnn = nn.RNN(
                cell_cls(features=self.units), name=f"{self.cell_type}_{i}"
            )
            x = rnn(x)
            if self.dropout and i < self.num_layers - 1:
                x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


class TransformerBlock(nn.Module):
    """Adapter from the tabular-sequence pipeline into the unified encoder
    (reference block/transformer.py:76-206). Accepts a ``T4RecConfig``, a
    registered arch name, or a prebuilt ``TransformerEncoder``; injects the
    masking scheme's transformer arguments (perm_mask) from ``MaskingInfo``."""

    transformer: Any = None  # T4RecConfig | str | TransformerEncoder
    masking: Optional[str] = None  # for compat validation

    def _resolve(self):
        t = self.transformer
        if isinstance(t, str):
            t = transformer_registry.parse(t).build(64, 4, 2, 20)
        if isinstance(t, T4RecConfig):
            check_masking_compat(t.arch, self.masking or t.masking)
            return t.to_encoder(), t
        return t, None

    def output_size(self) -> int:
        t = self.transformer
        if isinstance(t, str):
            # same default build _resolve applies — a bare 0 here would make
            # SequentialBlock.output_size fall through to an EARLIER block
            t = transformer_registry.parse(t).build(64, 4, 2, 20)
        if isinstance(t, T4RecConfig):
            return t.d_model
        return getattr(t, "d_model", 0)

    @nn.compact
    def __call__(
        self,
        inputs: Union[jnp.ndarray, Tuple[jnp.ndarray, Optional[MaskingInfo]]],
        pad_mask: Optional[jnp.ndarray] = None,
        training: bool = False,
        testing: bool = False,
        **kwargs,
    ):
        info: Optional[MaskingInfo] = None
        if isinstance(inputs, tuple):
            inputs, info = inputs
        encoder, _ = self._resolve()
        perm_mask = info.perm_mask if info is not None else None
        segment_ids = info.segment_ids if info is not None else None
        if info is not None and info.pad_mask is not None:
            # the scheme's pad mask tracks the MLM inference [MASK] extension
            pad_mask = info.pad_mask
        hidden = encoder(
            inputs, pad_mask=pad_mask, perm_mask=perm_mask,
            segment_ids=segment_ids, training=training,
        )
        return hidden


class SequentialBlock(nn.Module):
    """Chain blocks, threading ``(hidden, MaskingInfo)`` through
    (reference block/base.py:131-353). The input module (TabularSequenceFeatures)
    returns a tuple; downstream blocks receive the array plus side-channel info."""

    blocks: Sequence[Any] = ()

    def output_size(self) -> int:
        for block in reversed(self.blocks):
            size = getattr(block, "output_size", None)
            if size is not None:
                out = size() if callable(size) else size
                if out:
                    return out
        raise ValueError("No block in this SequentialBlock declares an output size")

    @nn.compact
    def __call__(self, inputs, training: bool = False, testing: bool = False, **kwargs):
        x = inputs
        info: Optional[MaskingInfo] = None
        pad_mask = kwargs.pop("pad_mask", None)
        for block in self.blocks:
            if isinstance(block, TransformerBlock):
                x = block((x, info), pad_mask=pad_mask, training=training, testing=testing)
            else:
                if (
                    isinstance(block, RNNBlock)
                    and info is not None
                    and info.segment_ids is not None
                ):
                    # packing guard: the recurrence would carry hidden state
                    # ACROSS packed sessions in a row (transformers get a
                    # block-diagonal attention bias; an RNN has no analog
                    # here). Same contract as PLM×packing: fail loudly.
                    raise ValueError(
                        "RNNBlock does not support packed sessions "
                        "(segment_ids present): left-to-right recurrence "
                        "would leak state across session boundaries. Train "
                        "RNN bodies with pack_sessions=False."
                    )
                x = block(x, training=training, testing=testing, **kwargs) \
                    if _accepts_testing(block) else block(x, training=training)
            if isinstance(x, tuple):
                x, maybe_info = x
                if maybe_info is not None:
                    info = maybe_info
        return x, info

    # nowrap: flax wraps plain methods in a module-call context, which makes
    # the SequentialBlock constructed here believe it has a parent scope and
    # trips child adoption (`_name_taken` on an unbound scope). Composition
    # is pure dataclass construction — it must run OUTSIDE flax's machinery.
    @nn.nowrap
    def __rshift__(self, other):
        return SequentialBlock(blocks=tuple(self.blocks) + (other,))


def _accepts_testing(block) -> bool:
    import inspect

    try:
        sig = inspect.signature(type(block).__call__)
    except (TypeError, ValueError):
        return False
    return "testing" in sig.parameters


def right_shift_block(right, left):
    """``left >> right`` composition (reference block/base.py:394-434)."""
    left_blocks = left.blocks if isinstance(left, SequentialBlock) else (left,)
    right_blocks = right.blocks if isinstance(right, SequentialBlock) else (right,)
    return SequentialBlock(blocks=tuple(left_blocks) + tuple(right_blocks))


# Reference-name compatibility (block/base.py:32-84, :356-368): the reference
# splits an abstract BlockBase from Block; here Block is the base.
BlockBase = Block


def build_blocks(*modules) -> SequentialBlock:
    """Build a SequentialBlock from a list of modules (reference
    block/base.py:356-368)."""
    if len(modules) == 1 and isinstance(modules[0], (list, tuple)):
        modules = tuple(modules[0])
    return SequentialBlock(blocks=tuple(modules))
