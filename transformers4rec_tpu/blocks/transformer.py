"""Unified TPU-first transformer body.

The reference borrows nine HuggingFace architectures via config adapters
(/root/reference/transformers4rec/config/transformer.py:142-641) and feeds them
``inputs_embeds`` (vocab_size=1 — transformer.py:258,479). Re-designed here as
ONE flax encoder whose capabilities are config-selected instead of nine ports:

- bidirectional vs causal attention           (BERT/RoBERTa/ELECTRA vs GPT-2)
- learned-absolute vs relative position bias  (BERT vs XLNet/TransfoXL)
- two-stream attention driven by ``perm_mask`` (XLNet PLM,
  reference masking.py:749-750 → HF XLNet two-stream)
- cross-layer parameter sharing               (ALBERT)
- local windowed attention                    (Longformer ``attention_window``,
  Reformer local attention — config/transformer.py:185-204, 304)

TPU-first notes:
- All masking variants are folded into ONE additive attention-bias tensor
  computed once per forward and broadcast across layers — XLA fuses the adds
  into the attention softmax; no per-layer mask recomputation.
- Matmuls run through ``jnp.einsum`` with ``preferred_element_type=float32``
  so the MXU accumulates in f32 even under bf16 params/activations.
- Relative position uses a T5-style per-head learned bias (a (heads, S, S)
  add) rather than TransfoXL's extra R-matrix GEMMs: same relative-position
  capability, strictly fewer FLOPs, better MXU utilisation.
- Static shapes throughout; dropout via linen ``deterministic``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = -1e9


def make_attention_bias(
    pad_mask: Optional[jnp.ndarray],
    seq_len: int,
    causal: bool = False,
    perm_mask: Optional[jnp.ndarray] = None,
    local_window: Optional[int] = None,
    dtype: Any = jnp.float32,
    query_stream: bool = False,
    mem_len: int = 0,
    mem_pad: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Compose every masking variant into one additive (B|1, 1, S, M+S) bias.

    pad_mask:   (B, S) bool — True at valid (non-pad) positions.
    perm_mask:  (B, S, S) float/bool — 1 where query i must NOT attend key j
                (reference masking.py:660-683 convention).
    local_window: each query attends keys within ±window (Longformer/Reformer).
    query_stream: for two-stream attention, additionally block the diagonal
                (the query stream must not see its own content).
    mem_len/mem_pad: segment-recurrence memory (TransfoXL/XLNet ``mem_len`` —
                reference config/transformer.py:454-460, 638): M cached keys
                prepended at positions -M..-1, valid where ``mem_pad`` True.
    """
    total_k = mem_len + seq_len
    bias = jnp.zeros((1, 1, seq_len, total_k), dtype)
    q_pos = jnp.arange(seq_len)
    k_pos = jnp.arange(-mem_len, seq_len)
    if causal:
        causal_block = k_pos[None, :] > q_pos[:, None]  # key after query
        bias = bias + jnp.where(causal_block, NEG_INF, 0.0).astype(dtype)[None, None]
    keys_ok = None
    if pad_mask is not None:
        keys_ok = pad_mask
        if mem_len:
            mp = (
                mem_pad if mem_pad is not None
                else jnp.ones((pad_mask.shape[0], mem_len), bool)
            )
            keys_ok = jnp.concatenate([mp, pad_mask], axis=1)
    elif mem_len and mem_pad is not None:
        keys_ok = jnp.concatenate(
            [mem_pad, jnp.ones((mem_pad.shape[0], seq_len), bool)], axis=1
        )
    if keys_ok is not None:
        bias = bias + jnp.where(keys_ok[:, None, None, :], 0.0, NEG_INF).astype(dtype)
    extra = make_extra_bias(
        seq_len, perm_mask, local_window, query_stream, dtype, mem_len=mem_len
    )
    if extra is not None:
        bias = bias + extra
    return bias


def make_extra_bias(
    seq_len: int,
    perm_mask: Optional[jnp.ndarray] = None,
    local_window: Optional[int] = None,
    query_stream: bool = False,
    dtype: Any = jnp.float32,
    mem_len: int = 0,
) -> Optional[jnp.ndarray]:
    """The non-causal, non-padding additive components (perm mask + local
    window). Kept separate so the flash kernel can take causal/pad inline and
    only read a materialized bias when these exist."""
    extra = None
    q_pos = jnp.arange(seq_len)
    k_pos = jnp.arange(-mem_len, seq_len)
    if local_window is not None:
        far = jnp.abs(k_pos[None, :] - q_pos[:, None]) > local_window
        extra = jnp.where(far, NEG_INF, 0.0).astype(dtype)[None, None]
    if perm_mask is not None:
        # perm restrictions apply within the current segment only; memory keys
        # are attendable by both streams (XLNet semantics)
        block = perm_mask.astype(bool)
        eye = jnp.eye(seq_len, dtype=bool)[None]
        if not query_stream:
            # content stream: every position may see its own content
            block = block & ~eye
        else:
            block = block | eye
        if mem_len:
            block = jnp.concatenate(
                [jnp.zeros((*block.shape[:2], mem_len), bool), block], axis=2
            )
        perm_bias = jnp.where(block, NEG_INF, 0.0).astype(dtype)[:, None]
        extra = perm_bias if extra is None else extra + perm_bias
    return extra


class RelativePositionBias(nn.Module):
    """T5-style bucketed per-head relative position bias.

    Replaces XLNet/TransfoXL relative attention R-matrices
    (reference config/transformer.py:454-460) with a learned (heads, S, S)
    additive bias — equal capability, no extra GEMMs on the MXU.
    """

    num_heads: int
    num_buckets: int = 32
    max_distance: int = 128
    bidirectional: bool = True

    @staticmethod
    def _bucket(relative_position, bidirectional, num_buckets, max_distance):
        ret = 0
        n = -relative_position
        if bidirectional:
            num_buckets //= 2
            ret += (n < 0).astype(jnp.int32) * num_buckets
            n = jnp.abs(n)
        else:
            n = jnp.maximum(n, 0)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
            / jnp.log(max_distance / max_exact)
            * (num_buckets - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, num_buckets - 1)
        return ret + jnp.where(is_small, n, val_large)

    @nn.compact
    def __call__(self, seq_len: int, mem_len: int = 0) -> jnp.ndarray:
        table = self.param(
            "rel_bias", nn.initializers.normal(0.02), (self.num_buckets, self.num_heads)
        )
        q_pos = jnp.arange(seq_len)
        k_pos = jnp.arange(-mem_len, seq_len)  # memory keys sit in the past
        rel = k_pos[None, :] - q_pos[:, None]  # key - query
        buckets = self._bucket(rel, self.bidirectional, self.num_buckets, self.max_distance)
        bias = table[buckets]  # (S, M+S, H)
        return jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, S, M+S)


class MultiHeadAttention(nn.Module):
    """Standard MHA with additive bias; f32 MXU accumulation."""

    d_model: int
    n_head: int
    dropout: float = 0.0
    causal: bool = False  # static: lets the flash kernel build causal inline
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_in: jnp.ndarray,
        kv_in: jnp.ndarray,
        bias: jnp.ndarray,
        deterministic: bool = True,
        shared_kv: Optional[tuple] = None,
        flash_ctx: Optional[tuple] = None,  # (extra_bias, pad_mask)
    ):
        B, S, D = kv_in.shape
        H, Dh = self.n_head, self.d_model // self.n_head
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, Dh), axis=-1, name=name, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        q = dense("q")(query_in)
        if shared_kv is not None:
            k, v = shared_kv
        else:
            k, v = dense("k")(kv_in), dense("v")(kv_in)

        from ..ops.attention import flash_attention, use_flash

        if flash_ctx is not None and use_flash(S, self.dropout, not deterministic):
            # fused Pallas kernel for long sequences (ops/attention.py):
            # causal/pad handled inline, only perm/local/rel biases read as
            # tensors. bias_grad=True when the bias carries LEARNED relative
            # positions — the backward then takes the XLA-remat path that
            # emits the bias cotangent (the fused backward would silently
            # zero it and freeze the rel-bias table).
            extra_bias, pad_mask, bias_grad = flash_ctx
            ctx = flash_attention(
                q, k, v, bias=extra_bias, pad_mask=pad_mask,
                causal=self.causal, bias_grad=bias_grad,
            ).astype(self.dtype)
        else:
            scale = Dh ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * scale + bias.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            # fully-blocked query rows (all keys masked) must output 0, not the
            # uniform-softmax average — matters for padded rows and degenerate
            # perm masks.
            row_ok = (bias > NEG_INF / 2).any(axis=-1, keepdims=True)
            probs = probs * row_ok.astype(probs.dtype)
            probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.astype(self.dtype)
        out = nn.DenseGeneral(
            self.d_model, axis=(-2, -1), name="out", dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(ctx)
        return out, (k, v)


class LSHSelfAttention(nn.Module):
    """Reformer LSH attention layer head (ops/lsh_attention.py does the work).

    Shared query/key projection (the Reformer formulation — hashing is only
    meaningful when queries and keys live in the same space); value and
    output projections as usual. Attention dropout is applied to the context
    (the probabilities live in bucket-sorted chunk space)."""

    d_model: int
    n_head: int
    dropout: float = 0.0
    causal: bool = False
    num_buckets: int = 8
    num_hashes: int = 2
    chunk_size: int = 8
    seed: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool = True):
        from ..ops.lsh_attention import lsh_attention

        H, Dh = self.n_head, self.d_model // self.n_head
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            (H, Dh), axis=-1, name=name, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )
        qk = dense("qk")(x)
        v = dense("v")(x)
        ctx = lsh_attention(
            qk, v, pad_mask=pad_mask, causal=self.causal,
            num_buckets=self.num_buckets, num_hashes=self.num_hashes,
            chunk_size=self.chunk_size, seed=self.seed,
        ).astype(self.dtype)
        ctx = nn.Dropout(self.dropout)(ctx, deterministic=deterministic)
        return nn.DenseGeneral(
            self.d_model, axis=(-2, -1), name="out", dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
        )(ctx)


class TransformerLayer(nn.Module):
    """Transformer layer; optional second (query) stream sharing K/V.

    ``norm_first=True`` (GPT-2/XLNet-style pre-LN, the TPU-friendly default)
    or ``norm_first=False`` (BERT/ELECTRA/ALBERT post-LN: residual then
    LayerNorm — exact HF weight transfer, tests/test_hf_golden.py).

    ``attn_type="lsh"`` swaps the dense attention for Reformer LSH attention
    (shared-QK, bucket-sorted chunks); the additive ``bias`` channel is then
    unused — the encoder guards that no perm/segment/memory restrictions are
    in play."""

    d_model: int
    n_head: int
    d_ff: int
    dropout: float = 0.0
    attn_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    activation: str = "gelu"
    causal: bool = False
    norm_first: bool = True
    attn_type: str = "dense"  # | "lsh"
    lsh_num_buckets: int = 8
    lsh_num_hashes: int = 2
    lsh_chunk_size: int = 8
    lsh_seed: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        bias: jnp.ndarray,
        deterministic: bool = True,
        query_hidden: Optional[jnp.ndarray] = None,
        query_bias: Optional[jnp.ndarray] = None,
        flash_ctx: Optional[tuple] = None,
        query_flash_ctx: Optional[tuple] = None,
        mem: Optional[jnp.ndarray] = None,
        pad_mask: Optional[jnp.ndarray] = None,
    ):
        if self.attn_type == "lsh":
            attn = LSHSelfAttention(
                self.d_model, self.n_head, self.attn_dropout,
                causal=self.causal, num_buckets=self.lsh_num_buckets,
                num_hashes=self.lsh_num_hashes,
                chunk_size=self.lsh_chunk_size, seed=self.lsh_seed,
                dtype=self.dtype, name="attn",
            )
        else:
            attn = MultiHeadAttention(
                self.d_model, self.n_head, self.attn_dropout,
                causal=self.causal, dtype=self.dtype, name="attn",
            )
        ln1 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln1")
        ln2 = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln2")
        ffn_in = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn_in")
        ffn_out = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_out")
        # 'gelu' = tanh approximation (GPT-2's gelu_new); 'gelu_exact' = the
        # erf form HF BERT/ELECTRA use (needed for exact weight transfer)
        if self.activation == "gelu_exact":
            act = lambda x: nn.gelu(x, approximate=False)  # noqa: E731
        else:
            act = getattr(nn, self.activation)
        drop = nn.Dropout(self.dropout)

        def ffn(x):
            h = act(ffn_in(x))
            h = drop(h, deterministic=deterministic)
            return ffn_out(h)

        x = ln1(hidden) if self.norm_first else hidden
        if self.attn_type == "lsh":
            if mem is not None or query_hidden is not None:
                raise NotImplementedError(
                    "LSH layers do not support mem_len or two-stream"
                )
            ctx, kv = attn(x, pad_mask, deterministic=deterministic), None
        else:
            if mem is not None:
                # segment recurrence: cached (stop-gradient) states prepend to
                # the K/V source; LN is positionwise so ln1(concat) rows ==
                # ln1 rows
                m = mem.astype(self.dtype)
                kv_x = jnp.concatenate(
                    [ln1(m) if self.norm_first else m, x], axis=1
                )
                flash_ctx = None  # memory path uses XLA attention (S is small)
            else:
                kv_x = x
            ctx, kv = attn(
                x, kv_x, bias, deterministic=deterministic, flash_ctx=flash_ctx
            )
        if self.norm_first:
            hidden = hidden + drop(ctx, deterministic=deterministic)
            hidden = hidden + drop(ffn(ln2(hidden)), deterministic=deterministic)
        else:
            hidden = ln1(hidden + drop(ctx, deterministic=deterministic))
            hidden = ln2(hidden + drop(ffn(hidden), deterministic=deterministic))

        new_query = None
        if query_hidden is not None:
            # two-stream: query stream attends the content stream's K/V with its
            # own (self-blocking) bias; parameters are shared with the content
            # stream (same `attn`/ffn modules — XLNet semantics).
            qx = ln1(query_hidden) if self.norm_first else query_hidden
            q_ctx, _ = attn(
                qx, x, query_bias, deterministic=deterministic,
                shared_kv=kv, flash_ctx=query_flash_ctx,
            )
            if self.norm_first:
                new_query = query_hidden + drop(q_ctx, deterministic=deterministic)
                new_query = new_query + drop(
                    ffn(ln2(new_query)), deterministic=deterministic
                )
            else:
                new_query = ln1(
                    query_hidden + drop(q_ctx, deterministic=deterministic)
                )
                new_query = ln2(
                    new_query + drop(ffn(new_query), deterministic=deterministic)
                )
        return hidden, new_query


class TransformerEncoder(nn.Module):
    """The unified body. ``__call__(inputs_embeds, pad_mask, perm_mask, ...) →
    (B, S, d_model)`` hidden states (query-stream states when two-stream runs).
    """

    d_model: int
    n_head: int
    n_layer: int
    d_ff: int = 0  # default 4*d_model
    dropout: float = 0.1
    attn_dropout: float = 0.0
    layer_norm_eps: float = 1e-12
    activation: str = "gelu"
    causal: bool = False
    pos_encoding: str = "learned_absolute"  # | 'relative_bias' | 'axial' | 'none'
    max_position: int = 512
    # Reformer axial positions (pos_encoding='axial'): position p embeds as
    # concat(table0[p // shape[1]], table1[p % shape[1]]) — factorized tables
    # of O(d1·e1 + d2·e2) params instead of O(max_position·d_model)
    axial_pos_shape: Optional[tuple] = None
    axial_pos_embds_dim: Optional[tuple] = None
    share_layers: bool = False  # ALBERT cross-layer sharing
    local_window: Optional[int] = None  # Longformer/Reformer local attention
    # per-layer attention pattern ('dense'|'local'|'lsh'), e.g. Reformer's
    # alternating ('local','lsh',...). None → every layer uses local_window.
    attn_layers: Optional[tuple] = None
    lsh_num_buckets: int = 8
    lsh_num_hashes: int = 2
    lsh_chunk_size: int = 8
    two_stream: bool = False  # XLNet PLM (activates when perm_mask given)
    remat: bool = False  # rematerialize layer activations (jax.checkpoint)
    mem_len: int = 0  # TransfoXL/XLNet segment recurrence cache length
    # norm_first=False → BERT-family post-LN (residual→LayerNorm, no final
    # ln_f); norm_first=True → GPT-2-style pre-LN with final ln_f
    norm_first: bool = True
    # BERT-family embedding LayerNorm after the position add (HF fidelity)
    embed_layer_norm: bool = False
    dtype: Any = jnp.float32

    def init_mems(self, batch_size: int):
        """Zero segment-recurrence state: (L, B, M, D) cached layer inputs +
        (B, M) validity (all False → memory keys fully masked, so the first
        segment behaves exactly like a mem-free forward). Thread the returned
        dict through successive ``__call__(..., mems=..., return_mems=True)``
        segments (e.g. under ``lax.scan``)."""
        return {
            "states": jnp.zeros(
                (self.n_layer, batch_size, self.mem_len, self.d_model), self.dtype
            ),
            "pad": jnp.zeros((batch_size, self.mem_len), bool),
        }

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        perm_mask: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        training: bool = False,
        mems: Optional[dict] = None,
        return_mems: bool = False,
    ):
        B, S, _ = inputs_embeds.shape
        deterministic = not training
        d_ff = self.d_ff or 4 * self.d_model
        M = int(mems["states"].shape[2]) if mems is not None else 0
        mem_pad = mems["pad"] if mems is not None else None

        # per-layer attention pattern (Reformer: alternating local/lsh)
        layer_types = self.attn_layers
        if layer_types is not None:
            if len(layer_types) != self.n_layer:
                raise ValueError(
                    f"attn_layers has {len(layer_types)} entries for "
                    f"n_layer={self.n_layer}"
                )
            bad = set(layer_types) - {"dense", "local", "lsh"}
            if bad:
                raise ValueError(f"unknown attn_layers entries: {sorted(bad)}")
            if self.share_layers and len(set(layer_types)) > 1:
                raise ValueError(
                    "share_layers requires a uniform attn_layers pattern"
                )
            if "lsh" in layer_types:
                # LSH chunking cannot honor arbitrary pairwise restrictions
                # or per-pair additive biases (ops/lsh_attention.py scope)
                if perm_mask is not None or self.two_stream:
                    raise NotImplementedError(
                        "LSH attention layers do not support perm_mask / "
                        "two-stream (PLM) — Reformer runs MLM"
                    )
                if segment_ids is not None:
                    raise NotImplementedError(
                        "session packing (segment_ids) is not supported with "
                        "LSH attention layers: the block-diagonal restriction "
                        "does not survive bucket-sorted chunking"
                    )
                if mems is not None or self.mem_len:
                    raise NotImplementedError(
                        "mem_len segment recurrence is not supported with "
                        "LSH attention layers"
                    )
                if self.pos_encoding == "relative_bias":
                    raise NotImplementedError(
                        "relative_bias positions are not supported with LSH "
                        "layers (per-pair biases do not survive chunking); "
                        "Reformer uses axial absolute positions"
                    )

        # session packing: block-diagonal attention restriction. Rides the
        # perm_mask channel for bias assembly (same "query i must NOT attend
        # key j" semantics) WITHOUT activating XLNet two-stream, which keys on
        # the scheme's own perm_mask below. Relative-position bias stays exact
        # (within-segment distances are offset-invariant); learned-absolute
        # positions are approximate for packed sessions (masking.py note).
        scheme_perm = perm_mask
        if segment_ids is not None:
            if mems is not None:
                raise NotImplementedError(
                    "segment_ids (session packing) cannot be combined with "
                    "mem_len segment recurrence"
                )
            seg_block = (
                segment_ids[:, :, None] != segment_ids[:, None, :]
            ).astype(jnp.float32)
            perm_mask = seg_block if perm_mask is None else jnp.maximum(
                perm_mask, seg_block
            )

        hidden = inputs_embeds.astype(self.dtype)
        abs_pos_term = None  # absolute position term (query stream reuses it)
        if self.pos_encoding in ("learned_absolute", "axial"):
            # loud guard: gathers CLAMP out-of-range indices, so without this
            # an overlong batch would silently reuse the last position row
            # for its whole tail (the pre-gather slice failed loudly)
            if S > self.max_position:
                raise ValueError(
                    f"sequence length {S} exceeds max_position="
                    f"{self.max_position}"
                )
            if self.pos_encoding == "axial":
                # Reformer factorized positions: p → concat(t0[p // d2],
                # t1[p % d2]) — row-major over the (d1, d2) grid, matching HF
                # AxialPositionEmbeddings' reshape (tests/test_lsh.py golden)
                if self.axial_pos_shape is None or self.axial_pos_embds_dim is None:
                    raise ValueError(
                        "pos_encoding='axial' requires axial_pos_shape and "
                        "axial_pos_embds_dim"
                    )
                d1, d2 = self.axial_pos_shape
                e1, e2 = self.axial_pos_embds_dim
                if d1 * d2 < self.max_position:
                    raise ValueError(
                        f"axial_pos_shape {self.axial_pos_shape} covers "
                        f"{d1 * d2} positions < max_position={self.max_position}"
                    )
                if e1 + e2 != self.d_model:
                    raise ValueError(
                        f"axial_pos_embds_dim {self.axial_pos_embds_dim} must "
                        f"sum to d_model={self.d_model}"
                    )
                t0 = self.param(
                    "axial_pos_0", nn.initializers.normal(0.02), (d1, e1)
                )
                t1 = self.param(
                    "axial_pos_1", nn.initializers.normal(0.02), (d2, e2)
                )
                lookup = lambda p: jnp.concatenate(  # noqa: E731
                    [t0[p // d2], t1[p % d2]], axis=-1
                )
            else:
                pos_table = self.param(
                    "position_embedding", nn.initializers.normal(0.02),
                    (self.max_position, self.d_model),
                )
                lookup = lambda p: pos_table[p]  # noqa: E731
            if segment_ids is not None:
                # per-segment position restart: a packed session sees the
                # same absolute positions it would unpacked (0..len-1),
                # making packing EXACT for learned-absolute archs too.
                pos = jnp.broadcast_to(jnp.arange(S)[None, :], segment_ids.shape)
                is_start = jnp.concatenate(
                    [jnp.ones((segment_ids.shape[0], 1), bool),
                     segment_ids[:, 1:] != segment_ids[:, :-1]], axis=1,
                )
                seg_start = jax.lax.associative_scan(
                    jnp.maximum, jnp.where(is_start, pos, 0), axis=1
                )
                abs_pos_term = lookup(pos - seg_start).astype(self.dtype)
            else:
                abs_pos_term = lookup(jnp.arange(S)[None]).astype(self.dtype)
            hidden = hidden + abs_pos_term

        rel_bias = None
        if self.pos_encoding == "relative_bias":
            rel_bias = RelativePositionBias(
                num_heads=self.n_head, bidirectional=not self.causal, name="rel_pos"
            )(S, mem_len=M)

        # two-stream keys on the SCHEME's perm_mask (PLM factorization order),
        # not on the merged segment restriction
        use_two_stream = self.two_stream and scheme_perm is not None
        if use_two_stream and layer_types is not None:
            raise NotImplementedError(
                "two-stream (PLM) does not compose with per-layer "
                "attn_layers patterns"
            )

        def bias_for(window):
            # composed additive bias + the un-composed components for the
            # flash kernel (ops/attention.py): only the perm/local/rel parts
            # are materialized; causal and padding are handled inline by the
            # kernel. The memory path always takes the XLA attention (layer
            # disables flash when mem is present).
            b = make_attention_bias(
                pad_mask, S, causal=self.causal, perm_mask=perm_mask,
                local_window=window, query_stream=False,
                mem_len=M, mem_pad=mem_pad,
            )
            ex = make_extra_bias(S, perm_mask, window,
                                 query_stream=False, mem_len=M)
            if rel_bias is not None:
                b = b + rel_bias
                ex = rel_bias if ex is None else ex + rel_bias
            fc = (ex, pad_mask, rel_bias is not None) if M == 0 else None
            return b, fc

        # per-layer attention plan: ('lsh', None) layers need no bias at all
        # (long-S Reformer must not materialize an (S, S) tensor); windowed /
        # dense layers share cached (bias, flash_ctx) per distinct window
        if layer_types is None:
            plan = [("win", self.local_window)] * self.n_layer
        else:
            plan = [
                ("lsh", None) if t == "lsh"
                else ("win", self.local_window if t == "local" else None)
                for t in layer_types
            ]
        bias_cache = {}
        for kind, w in plan:
            if kind == "win" and w not in bias_cache:
                bias_cache[w] = bias_for(w)

        query_hidden = None
        query_bias = None
        query_flash_ctx = None
        if use_two_stream:
            g0 = self.param(
                "query_stream_init", nn.initializers.normal(0.02), (self.d_model,)
            )
            query_hidden = jnp.broadcast_to(
                g0.astype(self.dtype), (B, S, self.d_model)
            )
            if abs_pos_term is not None:
                # same (per-segment-restarted, when packed) positions as the
                # content stream
                query_hidden = query_hidden + abs_pos_term
            query_bias = make_attention_bias(
                pad_mask, S, causal=self.causal, perm_mask=perm_mask,
                local_window=self.local_window, query_stream=True,
                mem_len=M, mem_pad=mem_pad,
            )
            if rel_bias is not None:
                query_bias = query_bias + rel_bias
            q_extra = make_extra_bias(S, perm_mask, self.local_window,
                                      query_stream=True, mem_len=M)
            if rel_bias is not None:
                q_extra = rel_bias if q_extra is None else q_extra + rel_bias
            query_flash_ctx = (
                (q_extra, pad_mask, rel_bias is not None) if M == 0 else None
            )

        if self.embed_layer_norm:
            ln_emb = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln_emb"
            )
            hidden = ln_emb(hidden)
            if query_hidden is not None:
                query_hidden = ln_emb(query_hidden)
        hidden = nn.Dropout(self.dropout)(hidden, deterministic=deterministic)
        if query_hidden is not None:
            query_hidden = nn.Dropout(self.dropout)(
                query_hidden, deterministic=deterministic
            )

        layer_cls = (
            nn.remat(TransformerLayer, static_argnums=(3,)) if self.remat
            else TransformerLayer
        )
        make_layer = lambda i, attn_type="dense", seed=0: layer_cls(  # noqa: E731
            d_model=self.d_model, n_head=self.n_head, d_ff=d_ff,
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            layer_norm_eps=self.layer_norm_eps, activation=self.activation,
            causal=self.causal, norm_first=self.norm_first,
            attn_type=attn_type, lsh_num_buckets=self.lsh_num_buckets,
            lsh_num_hashes=self.lsh_num_hashes,
            lsh_chunk_size=self.lsh_chunk_size, lsh_seed=seed,
            dtype=self.dtype, name=f"layer_{i}",
        )
        shared = (
            make_layer("shared", "lsh" if plan[0][0] == "lsh" else "dense")
            if self.share_layers else None
        )
        collect = return_mems and self.mem_len > 0
        new_states = []
        cur_ok = (
            pad_mask if pad_mask is not None else jnp.ones((B, S), bool)
        )
        for i in range(self.n_layer):
            kind, win = plan[i]
            if kind == "lsh":
                bias_i, flash_i = None, None
            else:
                bias_i, flash_i = bias_cache[win]
            layer = (
                shared if shared is not None
                else make_layer(i, "lsh" if kind == "lsh" else "dense", seed=i)
            )
            mem_i = mems["states"][i] if mems is not None else None
            if collect:
                ext = (
                    jnp.concatenate([mem_i, hidden], axis=1)
                    if mem_i is not None else hidden
                )
                if ext.shape[1] >= self.mem_len:
                    nm = ext[:, -self.mem_len:]
                else:  # left-pad; validity lives in the pad mask
                    nm = jnp.concatenate(
                        [jnp.zeros((B, self.mem_len - ext.shape[1],
                                    self.d_model), ext.dtype), ext], axis=1
                    )
                new_states.append(jax.lax.stop_gradient(nm))
            # positional call: under nn.remat, `deterministic` must stay a
            # static argument (static_argnums=(3,), counting self as 0)
            hidden, query_hidden = layer(
                hidden, bias_i, deterministic, query_hidden, query_bias,
                flash_i, query_flash_ctx, mem_i, pad_mask,
            )

        out = query_hidden if query_hidden is not None else hidden
        if self.norm_first:
            # pre-LN archs end with a final LayerNorm; post-LN archs already
            # normalized inside every layer (HF BERT has no final LN)
            out = nn.LayerNorm(
                epsilon=self.layer_norm_eps, dtype=self.dtype, name="ln_f"
            )(out)
        out = out.astype(jnp.float32)
        if collect:
            ext_ok = (
                jnp.concatenate([mem_pad, cur_ok], axis=1)
                if mem_pad is not None else cur_ok
            )
            if ext_ok.shape[1] >= self.mem_len:
                new_pad = ext_ok[:, -self.mem_len:]
            else:
                new_pad = jnp.concatenate(
                    [jnp.zeros((B, self.mem_len - ext_ok.shape[1]), bool), ext_ok],
                    axis=1,
                )
            return out, {"states": jnp.stack(new_states), "pad": new_pad}
        return out
