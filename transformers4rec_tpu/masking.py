"""Masking / label-generation schemes: CLM, MLM, PLM, RTD.

Parity target: /root/reference/transformers4rec/torch/masking.py (870 LoC) —
the reference's four training schemes with the same invariants:
- CLM (:245-337): shift-by-one labels; optional train/eval on last item only.
- MLM (:340-498): Bernoulli masking with ≥1-masked and ≥1-unmasked per session;
  inference extends the sequence by one [MASK] position.
- PLM (:501-750): span-based mask sampling, random factorization order →
  ``perm_mask``; eval = last-item + causal perm mask.
- RTD (:753-870): Gumbel sampling from generator logits → corrupted inputs +
  discriminator labels.

TPU-first redesign (SURVEY.md §7.1/§7.4):
- Masking is **pure label generation**: ``(rng, item_ids, embeds, flags) →
  (masked_embeds, MaskingInfo)`` — no module state. The reference stores
  ``mask_schema``/``masked_targets`` on the module (masking.py:128-152); here
  everything is threaded explicitly through a `flax.struct` pytree.
- PLM's per-row Python ``while`` span sampler (masking.py:599-627) is replaced
  by a fixed-trip ``lax.scan`` over span segments (static shapes, no host loop);
  the random factorization order uses the argsort-of-uniform trick.
- All shapes are static per (training, testing) mode, so each mode jits once.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from .utils.registry import Registry

masking_registry: Registry = Registry("masking")


@struct.dataclass
class MaskingInfo:
    """Everything downstream consumers need, threaded as values (no module state).

    targets: (B, S) int — label item ids (padding_idx where no target).
    mask:    (B, S) bool — True at positions that carry a target (loss positions).
    input_schema: (B, S) bool — the schema used for input masking (may differ
        from ``mask`` in CLM's last-item modes).
    perm_mask: (B, S, S) float, optional — PLM: 1 where query i must NOT attend key j.
    target_mapping: identity in every reference path, so represented implicitly.
    pad_mask: (B, S') bool — True at positions holding a real (non-pad) input in
        the POST-masking sequence; S' = S+1 under MLM's inference [MASK]
        extension. Consumed by the transformer as the key-padding mask.
    """

    targets: jnp.ndarray
    mask: jnp.ndarray
    input_schema: jnp.ndarray
    perm_mask: Optional[jnp.ndarray] = None
    pad_mask: Optional[jnp.ndarray] = None
    # Filled by TabularSequenceFeatures after masking — threads the raw item-id
    # sequence and the (tied) item embedding table to the prediction head as
    # VALUES (the reference instead stashes module state: embedding.py:242-245).
    item_ids: Optional[jnp.ndarray] = None
    item_table: Optional[jnp.ndarray] = None
    # Session packing (training-time): (B, S) int segment ids — 0 at padding,
    # 1..n per packed session within a row. Consumed by the encoder as a
    # block-diagonal attention restriction (cross-segment attention blocked)
    # and by CLM label generation (no labels across segment boundaries).
    # Exact for every arch family: relative bias depends on within-segment
    # distance only, and learned-absolute positions restart per segment in
    # the encoder. No reference analog.
    segment_ids: Optional[jnp.ndarray] = None
    # Optional pre-drawn sampled-softmax negative ids (n,) threaded from a
    # reserved "__neg_ids__" batch key — the sparse-embedding train step
    # (trainer/sparse_embedding_step.py) draws negatives OUTSIDE the model so
    # the touched table rows are known before autodiff; the task uses these
    # instead of drawing from its "sampling" rng when present.
    neg_ids: Optional[jnp.ndarray] = None
    # static (non-pytree) declaration by the label generator that targets are
    # per-segment-last-item ONLY — at most one per segment, each segment with
    # >=2 items — so targets/row <= S//2. The prediction task's packed-eval
    # loss-row budget (B*(S//2) gathered CE rows) is exact ONLY under this
    # guarantee, so it engages only when the label gen declares it.
    targets_per_segment_bounded: bool = struct.field(
        pytree_node=False, default=False
    )


def _predict_all(item_ids: jnp.ndarray, padding_idx: int):
    """Shift-by-one next-item labels (reference MaskSequence.predict_all :182-213)."""
    labels = jnp.concatenate(
        [item_ids[:, 1:], jnp.zeros((item_ids.shape[0], 1), item_ids.dtype)], axis=1
    )
    if padding_idx != 0:
        labels = labels.at[:, -1].set(padding_idx)
    mask = labels != padding_idx
    return labels, mask


def _label_at_last(item_ids: jnp.ndarray, non_pad: jnp.ndarray, padding_idx: int):
    """Labels only at the last non-padded position."""
    last = jnp.maximum(non_pad.sum(axis=1) - 1, 0)
    onehot = jax.nn.one_hot(last, item_ids.shape[1], dtype=bool)
    labels = jnp.where(onehot, item_ids, jnp.full_like(item_ids, padding_idx))
    return labels, labels != padding_idx


def _sample_index_from_mask(rng, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniformly sample one True index per row of a boolean (B, S) mask
    (the reference's ``torch.multinomial(mask.float(), 1)``)."""
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1)


def _ensure_min_masking(rng, labels, mask_labels, item_ids, non_pad, padding_idx):
    """Guarantee ≥1 masked and ≥1 unmasked item per session (reference MLM :426-459)."""
    r1, r2 = jax.random.split(rng)
    # ≥1 masked: force one random non-pad position into the labels
    force_idx = _sample_index_from_mask(r1, non_pad)
    force = jax.nn.one_hot(force_idx, item_ids.shape[1], dtype=bool)
    needs_force = ~mask_labels.any(axis=1, keepdims=True)
    labels = jnp.where(needs_force & force, item_ids, labels)
    mask_labels = labels != padding_idx
    # ≥1 unmasked: if every non-pad position is a label, unmask one random label
    all_masked = (mask_labels.sum(axis=1) == non_pad.sum(axis=1))[:, None]
    unmask_idx = _sample_index_from_mask(r2, mask_labels | ~mask_labels.any(axis=1, keepdims=True))
    unmask = jax.nn.one_hot(unmask_idx, item_ids.shape[1], dtype=bool)
    labels = jnp.where(all_masked & unmask, jnp.full_like(labels, padding_idx), labels)
    mask_labels = labels != padding_idx
    return labels, mask_labels


def _ensure_min_masking_segments(rng, mask_labels, non_pad, segment_ids):
    """Per-SEGMENT ≥1 masked and ≥1 unmasked for packed rows (the reference's
    per-session MLM guarantee — masking.py:426-459 — applied to every packed
    session). Segment-wise reductions run over a flattened (row, segment) key
    with ``jax.ops.segment_*`` (static ``num_segments`` = B·(S+1))."""
    B, S = segment_ids.shape
    n_seg = B * (S + 1)
    key = (jnp.arange(B)[:, None] * (S + 1) + segment_ids).reshape(-1)
    flat_mask = mask_labels.reshape(-1)
    flat_valid = (non_pad & (segment_ids > 0)).reshape(-1)

    seg_len = jax.ops.segment_sum(flat_valid.astype(jnp.int32), key, n_seg)
    seg_masked = jax.ops.segment_sum(flat_mask.astype(jnp.int32), key, n_seg)

    # random per-segment representative via a random PERMUTATION of integer
    # ranks — tie-free by construction (f32 uniform scores can collide within
    # a segment, which would pick TWO representatives and let the unmask step
    # clear both labels of a fully-masked 2-item segment)
    ranks = jax.random.permutation(rng, B * S).astype(jnp.int32)
    ranks = jnp.where(flat_valid, ranks, -1)
    seg_best = jax.ops.segment_max(ranks, key, n_seg)
    is_rep = flat_valid & (ranks == seg_best[key])

    # ≥1 masked: force the representative where the segment has no label
    needs_mask = (seg_len > 0) & (seg_masked == 0)
    flat_mask = flat_mask | (is_rep & needs_mask[key])
    # ≥1 unmasked: clear the representative where every position is a label
    # (skip length-1 segments — packing drops them, but stay safe)
    fully = (seg_len > 1) & (seg_masked == seg_len)
    flat_mask = flat_mask & ~(is_rep & fully[key])
    return flat_mask.reshape(B, S)


class MaskSequence(nn.Module):
    """Base: holds the trainable [MASK] embedding; subclasses implement
    ``compute_masked_targets`` and ``apply_mask_to_inputs``.

    ``__call__(embeds, item_ids, training, testing)`` → (masked_embeds, MaskingInfo).
    RNG comes from linen rng stream ``'masking'``.
    """

    hidden_size: int = 0
    padding_idx: int = 0
    eval_on_last_item_seq_only: bool = True

    def mask_embedding(self) -> jnp.ndarray:
        return self.param(
            "masked_item_embedding",
            nn.initializers.normal(stddev=0.001),
            (self.hidden_size,),
        )

    def compute_masked_targets(self, rng, item_ids, training=False, testing=False,
                               segment_ids=None) -> MaskingInfo:
        raise NotImplementedError

    def apply_mask_to_inputs(self, inputs, info: MaskingInfo, training=False, testing=False):
        """Default: replace masked positions with the trainable embedding."""
        if not training and not testing:
            return inputs
        mask_emb = self.mask_embedding().astype(inputs.dtype)
        return jnp.where(info.input_schema[..., None], mask_emb, inputs)

    def _check_segments(self, segment_ids, training, testing):
        """Session packing supports training and evaluation (per-segment
        last-item targets); INFERENCE serves unpacked — the MLM [MASK]
        extension and per-session top-k are one-session-per-row gathers."""
        if segment_ids is None:
            return
        if not training and not testing:
            raise NotImplementedError(
                "segment_ids (session packing) is supported for training and "
                "evaluation — serve inference on unpacked batches"
            )

    @nn.compact
    def __call__(self, inputs, item_ids, training: bool = False, testing: bool = False,
                 segment_ids=None):
        if item_ids.ndim != 2:
            raise ValueError("`item_ids` must have 2 dimensions (batch, seq)")
        self._check_segments(segment_ids, training, testing)
        needs_rng = training
        rng = self.make_rng("masking") if needs_rng else jax.random.PRNGKey(0)
        info = self.compute_masked_targets(rng, item_ids, training=training,
                                           testing=testing, segment_ids=segment_ids)
        if segment_ids is not None:
            info = info.replace(segment_ids=segment_ids.astype(jnp.int32))
        masked = self.apply_mask_to_inputs(inputs, info, training=training, testing=testing)
        return masked, info

    def transformer_arguments(self, info: MaskingInfo, training, testing) -> Dict[str, Any]:
        """Extra kwargs injected into the transformer body (reference :231-242)."""
        return {}


@masking_registry.register("clm", "causal")
class CausalLanguageModeling(MaskSequence):
    """Next-item (causal) labels (reference :245-337)."""

    train_on_last_item_seq_only: bool = False

    def compute_masked_targets(self, rng, item_ids, training=False, testing=False,
                               segment_ids=None) -> MaskingInfo:
        non_pad = item_ids != self.padding_idx
        if not training and not testing:
            # inference: identity targets, mask = non-pad
            return MaskingInfo(targets=item_ids, mask=non_pad, input_schema=non_pad,
                               pad_mask=non_pad)
        labels, mask = _predict_all(item_ids, self.padding_idx)
        if segment_ids is not None:
            if self.train_on_last_item_seq_only:
                raise NotImplementedError(
                    "train_on_last_item_seq_only is not supported with "
                    "session packing (segment_ids)"
                )
            # no next-item label across a packed-session boundary: position i's
            # label is item[i+1], valid only when both live in the same segment
            same_next = jnp.concatenate(
                [segment_ids[:, 1:] == segment_ids[:, :-1],
                 jnp.zeros((item_ids.shape[0], 1), bool)], axis=1,
            )
            mask = mask & same_next
            if testing and self.eval_on_last_item_seq_only:
                # per-SEGMENT last target: keep position i only when it is the
                # final valid label of its segment (no valid label at i+1 in
                # the same segment) — the packed analog of eval-last-item
                next_also = jnp.concatenate(
                    [mask[:, 1:] & same_next[:, :-1],
                     jnp.zeros((item_ids.shape[0], 1), bool)], axis=1,
                )
                mask = mask & ~next_also
                labels = jnp.where(mask, labels, jnp.full_like(labels, self.padding_idx))
                return MaskingInfo(targets=labels, mask=mask,
                                   input_schema=non_pad, pad_mask=non_pad,
                                   targets_per_segment_bounded=True)
            labels = jnp.where(mask, labels, jnp.full_like(labels, self.padding_idx))
            return MaskingInfo(targets=labels, mask=mask, input_schema=mask,
                               pad_mask=non_pad)
        if (self.eval_on_last_item_seq_only and not training) or (
            self.train_on_last_item_seq_only and training
        ):
            # keep only the label at the last target position; input schema
            # reverts to the full non-pad mask (reference :286-298)
            last = jnp.maximum(mask.sum(axis=1) - 1, 0)
            keep = jax.nn.one_hot(last, labels.shape[1], dtype=bool)
            labels = jnp.where(keep, labels, jnp.full_like(labels, self.padding_idx))
            return MaskingInfo(targets=labels, mask=labels != self.padding_idx,
                               input_schema=non_pad, pad_mask=non_pad)
        return MaskingInfo(targets=labels, mask=mask, input_schema=mask, pad_mask=non_pad)

    def apply_mask_to_inputs(self, inputs, info: MaskingInfo, training=False, testing=False):
        mask_emb = self.mask_embedding().astype(inputs.dtype)
        if not training and not testing:
            # replace PADDED positions with the trainable embedding (reference :305-315)
            return jnp.where(info.input_schema[..., None], inputs, mask_emb)
        # drop the last position's embedding (it has no next-item target), then
        # replace non-target positions with the trainable embedding (reference :318-337)
        trimmed = jnp.concatenate(
            [inputs[:, :-1], jnp.zeros_like(inputs[:, -1:])], axis=1
        )
        return jnp.where(info.input_schema[..., None], trimmed, mask_emb)


@masking_registry.register("mlm", "masked")
class MaskedLanguageModeling(MaskSequence):
    """BERT-style random masking (reference :340-498)."""

    mlm_probability: float = 0.15

    def compute_masked_targets(self, rng, item_ids, training=False, testing=False,
                               segment_ids=None) -> MaskingInfo:
        # session packing: MLM's Bernoulli masking is per-position, so packed
        # training needs no label change — the encoder's block-diagonal
        # attention restricts each prediction to its own session's context,
        # and the >=1-masked / >=1-unmasked guarantee is enforced PER SEGMENT
        # (_ensure_min_masking_segments below — the reference's per-session
        # guarantee applied to every packed session).
        non_pad = item_ids != self.padding_idx
        B, S = item_ids.shape
        if not training and not testing:
            # inference: extend by one [MASK] position at index len (reference :406-418)
            last_len = non_pad.sum(axis=1)  # first padded position
            labels = jnp.full((B, S + 1), self.padding_idx, item_ids.dtype)
            rows = jnp.arange(B)
            last_items = item_ids[rows, jnp.maximum(last_len - 1, 0)]
            labels = labels.at[rows, last_len].set(last_items)
            mask = labels != self.padding_idx
            ext_pad = jnp.arange(S + 1)[None, :] < (last_len + 1)[:, None]
            return MaskingInfo(targets=labels, mask=mask, input_schema=mask,
                               pad_mask=ext_pad)
        if training:
            r1, r2 = jax.random.split(rng)
            bern = jax.random.bernoulli(r1, self.mlm_probability, item_ids.shape)
            mask_labels = bern & non_pad
            if segment_ids is not None:
                # per-SEGMENT >=1-masked / >=1-unmasked (the reference's
                # per-session guarantee, masking.py:426-459, applied to every
                # packed session instead of per row)
                mask_labels = _ensure_min_masking_segments(
                    r2, mask_labels, non_pad, segment_ids
                )
                labels = jnp.where(mask_labels, item_ids,
                                   jnp.full_like(item_ids, self.padding_idx))
                return MaskingInfo(targets=labels, mask=mask_labels,
                                   input_schema=mask_labels, pad_mask=non_pad)
            labels = jnp.where(mask_labels, item_ids, jnp.full_like(item_ids, self.padding_idx))
            labels, mask_labels = _ensure_min_masking(
                r2, labels, mask_labels, item_ids, non_pad, self.padding_idx
            )
            return MaskingInfo(targets=labels, mask=mask_labels,
                               input_schema=mask_labels, pad_mask=non_pad)
        # testing
        if segment_ids is not None and self.eval_on_last_item_seq_only:
            # per-SEGMENT last item masked (packed analog of eval-last-item):
            # last valid position of each segment carries the label and is
            # replaced by the [MASK] embedding
            same_next = jnp.concatenate(
                [segment_ids[:, 1:] == segment_ids[:, :-1],
                 jnp.zeros((B, 1), bool)], axis=1,
            )
            next_valid = jnp.concatenate(
                [non_pad[:, 1:], jnp.zeros((B, 1), bool)], axis=1,
            )
            # require >=1 preceding in-segment position: a length-1 segment
            # has no context to predict its item from (pack_sessions never
            # emits one), and excluding it bounds targets/row at S//2 — the
            # invariant the packed-eval loss-row budget relies on
            # (model/prediction_task.py)
            same_prev = jnp.concatenate(
                [jnp.zeros((B, 1), bool),
                 segment_ids[:, 1:] == segment_ids[:, :-1]], axis=1,
            )
            mask = non_pad & ~(next_valid & same_next) & same_prev
            labels = jnp.where(mask, item_ids, jnp.full_like(item_ids, self.padding_idx))
            return MaskingInfo(targets=labels, mask=mask, input_schema=mask,
                               pad_mask=non_pad,
                               targets_per_segment_bounded=True)
        if self.eval_on_last_item_seq_only:
            labels, mask = _label_at_last(item_ids, non_pad, self.padding_idx)
        else:
            labels, mask = _predict_all(item_ids, self.padding_idx)
            if segment_ids is not None:
                # no shift-label across packed-session boundaries
                same_next = jnp.concatenate(
                    [segment_ids[:, 1:] == segment_ids[:, :-1],
                     jnp.zeros((B, 1), bool)], axis=1,
                )
                mask = mask & same_next
                labels = jnp.where(mask, labels,
                                   jnp.full_like(labels, self.padding_idx))
        return MaskingInfo(targets=labels, mask=mask, input_schema=mask, pad_mask=non_pad)

    def apply_mask_to_inputs(self, inputs, info: MaskingInfo, training=False, testing=False):
        mask_emb = self.mask_embedding().astype(inputs.dtype)
        if not training and not testing:
            # extend inputs with one extra position (duplicate of the last), then
            # substitute the [MASK] embedding at the target position (reference :480-497)
            inputs = jnp.concatenate([inputs, inputs[:, -1:, :]], axis=1)
        return jnp.where(info.input_schema[..., None], mask_emb, inputs)


@masking_registry.register("plm", "permutation")
class PermutationLanguageModeling(MaskSequence):
    """XLNet-style permutation LM (reference :501-750).

    ``perm_mask[b, i, j] = 1`` → position i cannot attend position j. The
    reference's ``target_mapping`` is the identity in every code path, so the
    query stream predicts per-position and no gather is needed.
    """

    plm_probability: float = 1 / 6
    max_span_length: int = 5
    permute_all: bool = False

    def _sample_spans(self, rng, non_pad, segment_ids=None):
        """Vectorized analog of the reference's per-row span ``while`` loop
        (:599-627): fixed-trip scan over span segments.

        ``segment_ids`` (session packing): each sampled span is CLIPPED at
        the boundary of the packed session its start position lands in, so
        no span ever covers items of two different sessions — the per-session
        semantics of the reference's span walk, applied to every packed
        segment (the walk itself runs over the packed row, so the masked
        fraction stays ~plm_probability globally)."""
        B, S = non_pad.shape
        max_len = non_pad.sum(axis=1)  # (B,)
        min_context = max(int(1 / self.plm_probability), 1)
        num_segments = -(-S // min_context) + 1  # static upper bound on loop trips

        def body(carry, seg_rng):
            cur_len, mask = carry
            r_span, r_start = jax.random.split(seg_rng)
            span = jax.random.randint(r_span, (B,), 1, self.max_span_length + 1)
            context = (span / self.plm_probability).astype(jnp.int32)
            start_off = jax.random.randint(r_start, (B,), 0, jnp.maximum(context - span + 1, 1))
            start = cur_len + start_off
            pos = jnp.arange(S)[None, :]
            in_span = (pos >= start[:, None]) & (pos < (start + span)[:, None])
            if segment_ids is not None:
                seg_at_start = jnp.take_along_axis(
                    segment_ids, jnp.clip(start, 0, S - 1)[:, None], axis=1
                )
                in_span = in_span & (segment_ids == seg_at_start)
            valid = (start < max_len)[:, None] & (cur_len < max_len)[:, None]
            mask = mask | (in_span & valid)
            return (cur_len + context, mask), None

        seg_rngs = jax.random.split(rng, num_segments)
        (_, mask), _ = jax.lax.scan(
            body, (jnp.zeros(B, jnp.int32), jnp.zeros((B, S), bool)), seg_rngs
        )
        return mask & non_pad

    def compute_masked_targets(self, rng, item_ids, training=False, testing=False,
                               segment_ids=None) -> MaskingInfo:
        # Session packing composes with PLM: spans are sampled per packed
        # SEGMENT (clipped at session boundaries — _sample_spans), the
        # ≥1-masked/≥1-unmasked guarantee applies per segment, and the
        # factorization-order perm_mask needs no segment awareness of its own
        # — the encoder merges the block-diagonal segment restriction into
        # the attention bias (blocks/transformer.py:400-412), so only
        # WITHIN-segment perm_index comparisons ever matter, and a global
        # random permutation restricted to a segment is a uniform random
        # factorization order for that segment.
        non_pad = item_ids != self.padding_idx
        B, S = item_ids.shape
        if training:
            r_span, r_min, r_perm = jax.random.split(rng, 3)
            if self.permute_all:
                mask_labels = non_pad
            else:
                mask_labels = self._sample_spans(r_span, non_pad,
                                                 segment_ids=segment_ids)
            if segment_ids is not None:
                mask_labels = _ensure_min_masking_segments(
                    r_min, mask_labels, non_pad, segment_ids
                )
                labels = jnp.where(mask_labels, item_ids,
                                   jnp.full_like(item_ids, self.padding_idx))
            else:
                labels = jnp.where(mask_labels, item_ids,
                                   jnp.full_like(item_ids, self.padding_idx))
                labels, mask_labels = _ensure_min_masking(
                    r_min, labels, mask_labels, item_ids, non_pad,
                    self.padding_idx
                )
            # random factorization order: argsort of uniforms = random permutation
            perm_index = jnp.argsort(jax.random.uniform(r_perm, (B, S)), axis=-1)
            # non-masked positions get index -1: visible to all, see no masked ones
            perm_index = jnp.where(mask_labels, perm_index, -1)
            # i cannot attend j iff perm_index[i] <= perm_index[j] and j is masked
            perm_mask = (
                (perm_index[:, :, None] <= perm_index[:, None, :]) & mask_labels[:, None, :]
            ).astype(jnp.float32)
            return MaskingInfo(targets=labels, mask=mask_labels,
                               input_schema=mask_labels, perm_mask=perm_mask,
                               pad_mask=non_pad)
        # eval / inference
        causal = jnp.triu(jnp.ones((S, S), jnp.float32), k=1)[None]
        if segment_ids is not None and self.eval_on_last_item_seq_only:
            # per-SEGMENT last-item targets (packed eval): label each
            # segment's final valid position with ≥1 in-segment predecessor
            # (mirrors the MLM packed-eval bound — targets/row ≤ S//2), and
            # hide every target position from all queries (the reference's
            # hide-last rule :684-704, per segment; cross-segment attention
            # is blocked by the encoder's segment merge)
            same_next = jnp.concatenate(
                [segment_ids[:, 1:] == segment_ids[:, :-1],
                 jnp.zeros((B, 1), bool)], axis=1,
            )
            next_valid = jnp.concatenate(
                [non_pad[:, 1:], jnp.zeros((B, 1), bool)], axis=1,
            )
            same_prev = jnp.concatenate(
                [jnp.zeros((B, 1), bool),
                 segment_ids[:, 1:] == segment_ids[:, :-1]], axis=1,
            )
            mask = non_pad & ~(next_valid & same_next) & same_prev
            labels = jnp.where(mask, item_ids,
                               jnp.full_like(item_ids, self.padding_idx))
            perm_mask = jnp.clip(causal + mask[:, None, :].astype(jnp.float32),
                                 0, 1)
            return MaskingInfo(targets=labels, mask=mask, input_schema=mask,
                               perm_mask=perm_mask, pad_mask=non_pad,
                               targets_per_segment_bounded=True)
        if self.eval_on_last_item_seq_only:
            labels, mask = _label_at_last(item_ids, non_pad, self.padding_idx)
            # nobody sees the last non-padded position (reference :684-704)
            hide_last = mask[:, None, :].astype(jnp.float32)
            perm_mask = jnp.clip(causal + hide_last, 0, 1)
        else:
            labels, mask = _predict_all(item_ids, self.padding_idx)
            if segment_ids is not None:
                # no shift-label across packed-session boundaries
                same_next = jnp.concatenate(
                    [segment_ids[:, 1:] == segment_ids[:, :-1],
                     jnp.zeros((B, 1), bool)], axis=1,
                )
                mask = mask & same_next
                labels = jnp.where(mask, labels,
                                   jnp.full_like(labels, self.padding_idx))
            perm_mask = jnp.broadcast_to(causal, (B, S, S))
        return MaskingInfo(targets=labels, mask=mask, input_schema=mask,
                           perm_mask=perm_mask, pad_mask=non_pad)

    def apply_mask_to_inputs(self, inputs, info: MaskingInfo, training=False, testing=False):
        # PLM hides targets via the two-stream attention's perm_mask, NOT by
        # replacing input embeddings (reference base apply_mask :154-180 is
        # overridden only for CLM/MLM; PLM uses the default which replaces
        # masked positions with the trainable embedding at train/test).
        if not training and not testing:
            return inputs
        mask_emb = self.mask_embedding().astype(inputs.dtype)
        return jnp.where(info.input_schema[..., None], mask_emb, inputs)

    def transformer_arguments(self, info: MaskingInfo, training, testing) -> Dict[str, Any]:
        return {"perm_mask": info.perm_mask}


@masking_registry.register("rtd", "replacement")
class ReplacementLanguageModeling(MaskedLanguageModeling):
    """ELECTRA replacement-token detection (reference :753-870): MLM masking for
    the generator + helpers to build corrupted inputs / discriminator labels."""

    sample_from_batch: bool = False

    def sample_from_softmax(self, rng, logits: jnp.ndarray) -> jnp.ndarray:
        """Gumbel-noise argmax sampling (reference :850-870)."""
        uniform = jax.random.uniform(rng, logits.shape, dtype=logits.dtype)
        gumbel = -jnp.log(-jnp.log(uniform + 1e-9) + 1e-9)
        return jnp.argmax(logits + gumbel, axis=-1)

    def get_fake_tokens(self, rng, item_ids, targets, logits=None):
        """Build corrupted inputs + discriminator labels (reference :787-848).

        jit-friendly full-shape redesign: the generator's ``logits`` are given at
        every position ``(B, S, V)``; sampling happens everywhere but replaces
        only masked positions, which matches the reference's masked_select/scatter.
        With ``sample_from_batch=True`` (or ``logits=None``) replacements are
        drawn uniformly from the batch's own non-pad item ids instead of the
        generator distribution (reference sample_from_batch flag,
        masking.py:807-820).

        Returns (corrupted_inputs (B,S), discriminator_labels (B,S) bool, samples).
        """
        mask = targets != self.padding_idx
        if self.sample_from_batch or logits is None:
            samples = self.sample_from_batch_ids(rng, item_ids)
        else:
            samples = self.sample_from_softmax(rng, logits)  # (B, S)
        corrupted = jnp.where(mask, samples.astype(item_ids.dtype), item_ids)
        # positions where the sampled item equals the true one stay "real"
        disc_labels = (corrupted != item_ids) & mask
        return corrupted, disc_labels, samples

    def sample_from_batch_ids(self, rng, item_ids: jnp.ndarray) -> jnp.ndarray:
        """Uniformly sample replacement ids from the batch's non-pad items
        (implicitly popularity-weighted, like in-batch negatives).

        O(B·S log B·S): uniform draws over the cumulative non-pad count +
        searchsorted — jax.random.categorical with batched (B·S,)-wide logits
        would materialize a (B·S, B·S) Gumbel matrix (2.4 GB at B=128,
        S=192)."""
        B, S = item_ids.shape
        flat = item_ids.reshape(-1)
        non_pad = flat != self.padding_idx
        cum = jnp.cumsum(non_pad.astype(jnp.int32))
        total = jnp.maximum(cum[-1], 1)
        # k-th non-pad position (1-based k) = first index with cum == k
        draws = jax.random.randint(rng, (B * S,), 1, total + 1)
        idx = jnp.searchsorted(cum, draws, side="left")
        idx = jnp.clip(idx, 0, B * S - 1)
        return flat[idx].reshape(B, S)
