"""Prediction tasks: next-item (tied weights, sampled softmax), binary, regression.

Parity: /root/reference/transformers4rec/torch/model/prediction_task.py —
``NextItemPredictionTask`` (:306-512) with weight tying + auto-projection
(:369-417), masked-position loss (:437-451), inference last-position scoring
(:452-470); ``_NextItemPredictionTask`` tied/untied output + ``sampled()``
sampled softmax with logQ correction and accidental-hit masking (:589-699);
``LogUniformSampler`` (:702-861); ``BinaryClassificationTask`` (:66-173);
``RegressionTask`` (:206-303).

TPU-first redesign (SURVEY.md §7.4 points 3, 5):
- Loss on masked positions is a weighted mean over STATIC shapes —
  ``sum(mask * ce) / sum(mask)`` — instead of the reference's dynamic
  ``remove_pad_3d`` gather (prediction_task.py:472-479).
- ``LogUniformSampler`` samples a FIXED number of negatives with replacement
  via inverse-CDF (static shapes; no ``.unique()`` variable-size output) and
  corrects with the expected-unique-count distribution
  ``-expm1(n*log1p(-p))`` — the same correction the reference applies
  (prediction_task.py:789-796).
- Inference gathers ONE hidden position per session (MLM uses index
  ``non_pad.sum()`` because of the appended [MASK] — reference :453-461) and
  runs a single (B, V) GEMM + ``lax.top_k``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..masking import MaskingInfo
from .losses import binary_cross_entropy_with_logits, cross_entropy_with_logits, mse_loss
from .ranking_metric import (
    DEFAULT_METRICS,
    RankingMetric,
    compute_batch_metrics,
    metrics_from_ranks,
)


class LogUniformSampler:
    """Log-uniform (Zipf) negative sampler, static-shape.

    ``P(class) = (log(class+2) - log(class+1)) / log(max_id+1)`` over ids
    ``[min_id, max_id)`` — assumes ids sorted decreasingly by frequency
    (reference prediction_task.py:766-787). Sampling uses the closed-form
    inverse CDF ``floor(exp(u * log(range+1))) - 1`` so a fixed ``n_sample``
    negatives are drawn with replacement per batch; the logQ correction uses
    the probability each id appears at least once in ``n_sample`` tries.
    """

    def __init__(self, max_n_samples: int, max_id: int, min_id: int = 0,
                 unique_sampling: bool = True):
        if max_id <= 0:
            raise ValueError("max_id must be a positive integer.")
        if max_n_samples <= 0:
            raise ValueError("max_n_samples must be a positive integer.")
        self.max_n_samples = max_n_samples
        self.max_id = max_id
        self.min_id = min_id
        self.unique_sampling = unique_sampling
        self.range = max_id - min_id

    def probs(self, ids: jnp.ndarray) -> jnp.ndarray:
        """Log-uniform pmf at the given (possibly offset) ids.

        ``log(r+2) - log(r+1)`` is rewritten as ``log1p(1/(r+1))``: the direct
        difference cancels catastrophically in f32 for large ids (two ~13.0
        values differing by ~3e-6) and can round NEGATIVE on TPU, which turns
        the downstream ``log(expected_probs)`` into NaN.
        """
        rel = jnp.clip(ids - self.min_id, 0, self.range - 1).astype(jnp.float32)
        p = jnp.log1p(1.0 / (rel + 1.0)) / jnp.log(self.range + 1.0)
        return jnp.where(ids >= self.min_id, p, 0.0)

    def expected_probs(self, ids: jnp.ndarray) -> jnp.ndarray:
        """P(id sampled ≥ once in n tries) = -expm1(n*log1p(-p))
        (reference :789-796)."""
        p = self.probs(ids)
        if not self.unique_sampling:
            return p
        return -jnp.expm1(self.max_n_samples * jnp.log1p(-p))

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        """Draw ``max_n_samples`` ids via inverse CDF (with replacement)."""
        u = jax.random.uniform(rng, (self.max_n_samples,), dtype=jnp.float32)
        ids = jnp.exp(u * jnp.log(self.range + 1.0)).astype(jnp.int32) - 1
        return jnp.clip(ids, 0, self.range - 1) + self.min_id


@dataclasses.dataclass
class TaskOutput:
    """What a task returns at train/test time (reference returns the dict
    {"loss","labels","predictions"} — model/base.py:170-183)."""

    loss: jnp.ndarray
    labels: Optional[jnp.ndarray] = None
    predictions: Optional[jnp.ndarray] = None
    weights: Optional[jnp.ndarray] = None  # per-row validity for metrics
    metrics: Optional[Dict[str, Any]] = None
    # scalar Σw — the denominator of the task's weighted-mean loss. Eval
    # loops accumulate (loss·loss_weight, loss_weight) so the dataset-level
    # loss is the exact weighted mean over every valid target, not a mean of
    # per-batch means (zero-filled tail batches would otherwise get a full
    # batch's weight). None → the loop falls back to per-batch weight 1.
    loss_weight: Optional[jnp.ndarray] = None


class PredictionTask(nn.Module):
    """Base task: optional task block (MLP), sequence summary for 2-D tasks
    (reference model/base.py:52-232 + HF SequenceSummary)."""

    target_name: Optional[str] = None
    task_name: str = "task"
    summary_type: str = "last"  # last | first | mean | cls_index

    def summarize(self, hidden: jnp.ndarray, pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        """3-D (B, S, D) → 2-D (B, D) (HF SequenceSummary analog; reference
        model/base.py:76 exposes last/first/mean/cls_index)."""
        if hidden.ndim == 2:
            return hidden
        if self.summary_type == "first":
            return hidden[:, 0]
        if self.summary_type == "cls_index":
            # HF SequenceSummary cls_index semantics with no explicit index:
            # the FINAL sequence position (independent of padding — distinct
            # from 'last', which picks the last non-padded position)
            return hidden[:, -1]
        if self.summary_type == "mean":
            if pad_mask is not None:
                w = pad_mask[..., : hidden.shape[1]].astype(hidden.dtype)
                return (hidden * w[..., None]).sum(1) / jnp.maximum(
                    w.sum(1, keepdims=True), 1.0
                )
            return hidden.mean(axis=1)
        # 'last': last non-padded position
        if pad_mask is not None:
            last = jnp.maximum(pad_mask[..., : hidden.shape[1]].sum(axis=1) - 1, 0)
        else:
            last = jnp.full((hidden.shape[0],), hidden.shape[1] - 1)
        return jnp.take_along_axis(hidden, last[:, None, None].astype(jnp.int32), axis=1)[:, 0]


class BinaryClassificationTask(PredictionTask):
    """BCE + streaming accuracy/precision/recall
    (reference prediction_task.py:66-173)."""

    task_name: str = "binary_classification"
    task_block_dims: Sequence[int] = ()

    @nn.compact
    def __call__(self, hidden, targets=None, pad_mask=None, training=False,
                 testing=False, **kwargs):
        x = self.summarize(hidden, pad_mask).astype(jnp.float32)
        for i, d in enumerate(self.task_block_dims):
            x = nn.relu(nn.Dense(d, name=f"task_block_{i}")(x))
        logits = nn.Dense(1, name="output")(x)[..., 0]
        if targets is None:
            return TaskOutput(loss=jnp.zeros(()), predictions=jax.nn.sigmoid(logits))
        targets = targets.astype(jnp.float32)
        # row validity: zero-filled tail rows (drop_last=False static batches)
        # have an all-padding session — they carry no loss or metric weight
        valid = (
            pad_mask.any(axis=1).astype(jnp.float32)
            if pad_mask is not None and pad_mask.ndim == 2
            else jnp.ones(targets.shape[0], jnp.float32)
        )
        loss = binary_cross_entropy_with_logits(logits, targets, weights=valid)
        preds = jax.nn.sigmoid(logits)
        hard = (preds > 0.5).astype(jnp.float32)
        tp = (hard * targets * valid).sum()
        # exact streaming sufficient statistics — states merge by elementwise
        # addition and finalize as s/c, so unequal (tail) batches contribute
        # with their true weight (parity with torchmetrics' exact streaming,
        # reference prediction_task.py:122-136; NOT mean-of-batch-means)
        # bare metric names: the metric collector (Head/Model/Trainer)
        # prefixes the task name exactly once — same contract as the
        # ranking metrics ("ndcg_at_10" → "next-item/ndcg_at_10")
        metrics = {
            "accuracy": (((hard == targets) * valid).sum(), valid.sum()),
            "precision": (tp, (hard * valid).sum()),
            "recall": (tp, (targets * valid).sum()),
        }
        return TaskOutput(loss=loss, labels=targets, predictions=preds,
                          metrics=metrics, loss_weight=valid.sum())


class RegressionTask(PredictionTask):
    """MSE regression (reference prediction_task.py:206-303)."""

    task_name: str = "regression"
    task_block_dims: Sequence[int] = ()

    @nn.compact
    def __call__(self, hidden, targets=None, pad_mask=None, training=False,
                 testing=False, **kwargs):
        x = self.summarize(hidden, pad_mask).astype(jnp.float32)
        for i, d in enumerate(self.task_block_dims):
            x = nn.relu(nn.Dense(d, name=f"task_block_{i}")(x))
        preds = nn.Dense(1, name="output")(x)[..., 0]
        if targets is None:
            return TaskOutput(loss=jnp.zeros(()), predictions=preds)
        valid = (
            pad_mask.any(axis=1).astype(jnp.float32)
            if pad_mask is not None and pad_mask.ndim == 2
            else jnp.ones(targets.shape[0], jnp.float32)
        )
        loss = mse_loss(preds, targets, weights=valid)
        # exact streaming (sum of squared errors, count) — see binary task
        sq = (jnp.square(preds - targets.astype(jnp.float32)) * valid).sum()
        metrics = {"mse": (sq, valid.sum())}
        return TaskOutput(loss=loss, labels=targets, predictions=preds,
                          metrics=metrics, loss_weight=valid.sum())


class NextItemPredictionTask(PredictionTask):
    """Next-item prediction with optional weight tying and sampled softmax.

    Call modes (mirroring reference prediction_task.py:419-470):
    - training/testing: masked-position CE loss; predictions+labels returned
      flattened (B*S,) with ``weights`` marking real target positions.
    - inference: per-session next-item scores (B, V), or (scores, ids) top-k.
    """

    task_name: str = "next-item"
    weight_tying: bool = False
    softmax_temperature: float = 1.0
    padding_idx: int = 0
    target_dim: Optional[int] = None
    sampled_softmax: bool = False
    max_n_samples: int = 100
    min_id: int = 1
    label_smoothing: float = 0.0
    task_block_dims: Sequence[int] = ()
    metrics: Tuple[RankingMetric, ...] = DEFAULT_METRICS
    # static hint: at testing time each session has exactly one target (the
    # default eval_on_last_item_seq_only mode) → logits computed on ONE
    # gathered position per session instead of all S positions.
    eval_single_target: bool = True
    # fused large-vocab ops (ops/vocab.py): CE loss + ranking metrics without
    # materializing (N, V) logits — Pallas kernels on TPU, lax.scan elsewhere.
    # label_smoothing rides the same streamed kernels (an extra
    # sum-of-logits accumulator; bwd residual P − y_smooth).
    use_fused_ops: bool = True
    # loss-position budget: at train time gather the masked (target-carrying)
    # positions into M static rows before the vocab CE — under MLM p=0.3 only
    # ~30% of VALID positions carry loss, so budgeting halves+ the dominant
    # N×V work with negligible target drop. Explicit fraction of B*S, or None.
    loss_budget: Optional[float] = None
    # adaptive budget (set by Head.from_body from the masking's mlm/rtd
    # probability): M = N·p + 6·sqrt(N·p·(1−p)) + 8, a ≥6σ binomial bound on
    # the target count — targets beyond M (probability < 1e-9) drop; measured
    # 1792 → ~915 rows at the REES46 bench config vs the fixed 2p+0.1 rule.
    budget_target_prob: Optional[float] = None
    # vocab-parallel full softmax (100M-row output tables): set to the
    # ('data','model') Mesh whose 'model' axis row-shards the tied table, and
    # train CE + fused eval + inference top-k run the shard_map ops of
    # parallel/sharded_embedding.py — per-shard streamed kernels + O(N)
    # collectives, never an O(V) gather (an auto-partitioned pallas_call
    # would all-gather W). label_smoothing is fused into the sharded kernels
    # like the unsharded ones. The Trainer auto-threads its mesh here when
    # the tied table row-shards (trainer.py _maybe_auto_vocab_parallel).
    vocab_parallel_mesh: Optional[Any] = None

    def _budget_rows(self, N: int) -> Optional[int]:
        if self.loss_budget is not None:
            if self.loss_budget >= 1.0:
                return None
            return self._round_budget(max(int(N * self.loss_budget), 1), N)
        p = self.budget_target_prob
        if p is None or p <= 0 or p >= 0.5:
            return None
        import math

        m = int(N * p + 6.0 * math.sqrt(N * p * (1.0 - p))) + 8
        return self._round_budget(m, N) if m < N else None

    def _round_budget(self, m: int, N: int) -> int:
        # shard_map (vocab_parallel_mesh) needs the row count divisible by
        # the 'data' axis
        mesh = self.vocab_parallel_mesh
        if mesh is not None and "data" in mesh.shape:
            d = mesh.shape["data"]
            m = min(-(-m // d) * d, N)
        return m

    def _vocab_ce(self, x2d, W, labels, weights, vsz):
        """Streamed full-softmax CE — vocab-parallel when a mesh is set."""
        if self.vocab_parallel_mesh is not None:
            from ..parallel.sharded_embedding import sharded_softmax_ce

            return sharded_softmax_ce(
                x2d, W, labels.astype(jnp.int32), weights,
                self.vocab_parallel_mesh, vocab_size=vsz,
                label_smoothing=self.label_smoothing,
            )
        from ..ops.vocab import fused_softmax_ce

        return fused_softmax_ce(
            x2d, W, labels.astype(jnp.int32), weights, vocab_size=vsz,
            label_smoothing=self.label_smoothing,
        )

    def _vocab_ce_rank(self, x2d, W, labels, weights, vsz):
        """Streamed eval CE + label ranks — vocab-parallel when a mesh is set."""
        if self.vocab_parallel_mesh is not None:
            from ..parallel.sharded_embedding import sharded_ce_and_rank

            return sharded_ce_and_rank(
                x2d, W, labels.astype(jnp.int32), weights,
                self.vocab_parallel_mesh, vocab_size=vsz,
                label_smoothing=self.label_smoothing,
            )
        from ..ops.vocab import fused_ce_and_rank

        return fused_ce_and_rank(
            x2d, W, labels.astype(jnp.int32), weights, vocab_size=vsz,
            label_smoothing=self.label_smoothing,
        )

    def _output_weights(self, info: MaskingInfo, d_in: int):
        if self.weight_tying:
            if info.item_table is None:
                raise ValueError(
                    "weight_tying=True requires the input module to thread the "
                    "item embedding table through MaskingInfo.item_table"
                )
            return info.item_table
        if self.target_dim is None:
            raise ValueError("target_dim is required when weight_tying=False")
        return self.param(
            "output_layer",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.target_dim, d_in),
        )

    def _project(self, x: jnp.ndarray, item_dim: int) -> jnp.ndarray:
        """Auto-project hidden to the item-embedding dim for tying
        (reference :388-395) and apply the optional task block."""
        for i, d in enumerate(self.task_block_dims):
            x = nn.relu(nn.Dense(d, name=f"task_block_{i}")(x))
        if x.shape[-1] != item_dim:
            x = nn.Dense(item_dim, name="tying_projection", use_bias=False)(x)
        return x

    def make_sampler(self, vocab_rows: int) -> LogUniformSampler:
        """The task's negative sampler — exposed so the sparse-embedding
        train step can draw the SAME distribution outside the model."""
        return LogUniformSampler(
            self.max_n_samples, self.target_dim or vocab_rows, self.min_id
        )

    def _sampled_scores(self, x2d, labels, pos_w, neg_w, neg_ids, sampler):
        """Score gathered positive/negative rows (reference sampled()
        :673-696). ``softmax_temperature`` is applied to the RAW scores here
        — dividing the returned logits would scale the logQ correction by
        1/temp and bias the estimator toward popular items at any temp != 1."""
        temp = self.softmax_temperature or 1.0
        pos_scores = (x2d * pos_w).sum(-1, keepdims=True) / temp
        neg_scores = jnp.einsum("ne,se->ns", x2d, neg_w,
                                preferred_element_type=jnp.float32) / temp
        # logQ correction
        eps = 1e-16
        pos_scores = pos_scores - jnp.log(sampler.expected_probs(labels) + eps)[:, None]
        neg_scores = neg_scores - jnp.log(sampler.expected_probs(neg_ids) + eps)[None, :]
        # accidental hits: sampled negative == true label
        hits = labels[:, None] == neg_ids[None, :]
        neg_scores = jnp.where(hits, -1e4, neg_scores)
        logits = jnp.concatenate([pos_scores, neg_scores], axis=1)
        return logits, jnp.zeros(logits.shape[0], jnp.int32)

    def _sampled_logits(self, rng, x2d, labels, weights_table, neg_ids=None):
        """Sampled-softmax logits + zero labels. ``neg_ids`` overrides the
        rng draw with pre-drawn negatives (MaskingInfo.neg_ids — the
        sparse-embedding step must know the touched rows before autodiff)."""
        sampler = self.make_sampler(weights_table.shape[0])
        if neg_ids is None:
            neg_ids = sampler.sample(rng)  # (n,)
        pos_w = weights_table[labels]  # (N, E)
        neg_w = weights_table[neg_ids]  # (n, E)
        return self._sampled_scores(x2d, labels, pos_w, neg_w, neg_ids, sampler)

    @nn.compact
    def __call__(
        self,
        hidden: jnp.ndarray,
        info: Optional[MaskingInfo] = None,
        training: bool = False,
        testing: bool = False,
        top_k: Optional[int] = None,
        compute_metrics: bool = True,
        **kwargs,
    ):
        if info is None:
            raise ValueError(
                "NextItemPredictionTask requires a masking-enabled input module "
                "(reference prediction_task.py:398-402)"
            )
        x = hidden.astype(jnp.float32)
        W = self._output_weights(info, x.shape[-1])
        x = self._project(x, W.shape[-1])
        temp = self.softmax_temperature or 1.0
        # true vocab when the table carries shard-padding rows
        # (features/embedding.py vocab_padding_multiple)
        vsz = self.target_dim if (
            self.target_dim and self.target_dim != W.shape[0]
        ) else None

        fused = self.use_fused_ops
        if training or testing:
            targets = info.targets  # (B, S)
            mask = info.mask.astype(jnp.float32)  # (B, S)
            if self.sampled_softmax and training:
                rng = self.make_rng("sampling")
                N = targets.shape[0] * targets.shape[1]
                x2d = x.reshape(N, -1)
                labels = targets.reshape(N).astype(jnp.int32)
                # temperature applied inside _sampled_logits (raw scores
                # only — the logQ correction must not be tempered)
                logits, zero_labels = self._sampled_logits(
                    rng, x2d, labels, W, neg_ids=info.neg_ids
                )
                loss = cross_entropy_with_logits(
                    logits, zero_labels, weights=mask.reshape(N),
                    label_smoothing=self.label_smoothing,
                )
                w = mask.reshape(N)
                return TaskOutput(loss=loss, labels=labels,
                                  predictions=None, weights=w,
                                  loss_weight=w.sum())
            if testing and self.eval_single_target and info.segment_ids is None:
                # one target per session: gather that position (static shapes).
                # Packed rows (segment_ids) carry MULTIPLE per-segment targets
                # and take the full-position fused eval path below.
                idx = jnp.argmax(info.mask, axis=1)  # (B,)
                row_valid = info.mask.any(axis=1).astype(jnp.float32)
                xg = jnp.take_along_axis(x, idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
                labels = jnp.take_along_axis(targets, idx[:, None].astype(jnp.int32), axis=1)[:, 0]
                if fused:
                    xs = xg / temp
                    metrics = None
                    if compute_metrics:
                        # ONE streamed vocab pass for loss + ranks (eval was
                        # 3 (N,V) GEMM passes before: CE fwd + rank's label
                        # logit + rank count)
                        loss, rank = self._vocab_ce_rank(
                            xs, W, labels, row_valid, vsz
                        )
                        metrics = metrics_from_ranks(rank, self.metrics, weights=row_valid)
                    else:
                        loss = self._vocab_ce(xs, W, labels, row_valid, vsz)
                    return TaskOutput(loss=loss, labels=labels, predictions=None,
                                      weights=row_valid, metrics=metrics,
                                      loss_weight=row_valid.sum())
                logits = jnp.einsum("be,ve->bv", xg, W,
                                    preferred_element_type=jnp.float32) / temp
                if vsz is not None:
                    logits = logits[:, :vsz]
                loss = cross_entropy_with_logits(
                    logits, labels, weights=row_valid,
                    label_smoothing=self.label_smoothing,
                )
                metrics = None
                if compute_metrics:
                    metrics = compute_batch_metrics(
                        logits, labels, self.metrics, weights=row_valid
                    )
                return TaskOutput(loss=loss, labels=labels, predictions=logits,
                                  weights=row_valid, metrics=metrics,
                                  loss_weight=row_valid.sum())
            # full-position path over (B*S) rows
            N = targets.shape[0] * targets.shape[1]
            flat_labels = targets.reshape(N)
            flat_mask = mask.reshape(N)
            if fused:
                x2d = x.reshape(N, -1) / temp
                M = None
                if training:
                    M = self._budget_rows(N)
                elif info.targets_per_segment_bounded:
                    # packed eval rides this full-position path but the label
                    # gen DECLARED at most one target per segment with every
                    # target-bearing segment >=2 items (masking.py
                    # targets_per_segment_bounded), so targets/row <= S//2:
                    # gathering B*(S//2) rows provably covers EVERY target —
                    # the same fused eval kernels at half the CE rows, exact
                    # metrics (tight-bound test in tests/test_packing.py)
                    B_, S_ = targets.shape
                    M = min(N, max(B_ * (S_ // 2), 1))
                if M is not None:
                    # stable argsort puts target positions first; in training
                    # overflow beyond M (≥6σ margin) drops a few targets; the
                    # packed-eval M is an exact upper bound (no drops)
                    order = jnp.argsort(flat_mask <= 0.0, stable=True)[:M]
                    x2d = jnp.take(x2d, order, axis=0)
                    flat_labels = jnp.take(flat_labels, order)
                    flat_mask = jnp.take(flat_mask, order)
                    if training:
                        lb = flat_labels.astype(jnp.int32)
                        loss = self._vocab_ce(x2d, W, lb, flat_mask, vsz)
                        return TaskOutput(loss=loss, labels=lb,
                                          predictions=None, weights=flat_mask,
                                          loss_weight=flat_mask.sum())
                metrics = None
                if compute_metrics and testing:
                    # full-position eval: single streamed pass for loss+ranks
                    loss, rank = self._vocab_ce_rank(
                        x2d, W, flat_labels, flat_mask, vsz
                    )
                    metrics = metrics_from_ranks(rank, self.metrics, weights=flat_mask)
                else:
                    loss = self._vocab_ce(x2d, W, flat_labels, flat_mask, vsz)
                return TaskOutput(loss=loss, labels=flat_labels, predictions=None,
                                  weights=flat_mask, metrics=metrics,
                                  loss_weight=flat_mask.sum())
            logits = jnp.einsum("bse,ve->bsv", x, W,
                                preferred_element_type=jnp.float32) / temp
            if vsz is not None:
                logits = logits[..., :vsz]
            loss = cross_entropy_with_logits(
                logits, targets, weights=mask, label_smoothing=self.label_smoothing
            )
            flat_logits = logits.reshape(N, -1)
            metrics = None
            if compute_metrics and testing:
                metrics = compute_batch_metrics(
                    flat_logits, flat_labels, self.metrics, weights=flat_mask
                )
            return TaskOutput(loss=loss, labels=flat_labels,
                              predictions=flat_logits if testing else None,
                              weights=flat_mask, metrics=metrics,
                              loss_weight=flat_mask.sum())

        # ---------------- inference: score the next item per session ----------
        item_ids = info.item_ids
        non_pad = (item_ids != self.padding_idx).sum(axis=1)
        # MLM appended a [MASK] at index len → predict there; others: last item
        # (reference :452-461). The scheme signals extension via pad_mask width.
        extended = info.pad_mask is not None and info.pad_mask.shape[1] > item_ids.shape[1]
        last_idx = jnp.clip(non_pad if extended else non_pad - 1, 0, x.shape[1] - 1)
        xg = jnp.take_along_axis(x, last_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        if top_k is not None and self.vocab_parallel_mesh is not None:
            # row-sharded table: local per-shard top-k + O(N·k) candidate
            # merge — fused_topk here would all-gather the (V, E) table.
            # Compute dtype mirrors the unsharded route's choice at the same
            # size: f32 below the streaming threshold (exact match with the
            # dense-einsum scoring the same model gives data-parallel), bf16
            # above (the training numerics; halves the stream).
            from ..parallel.sharded_embedding import sharded_topk

            small = (isinstance(xg.shape[0], int)
                     and xg.shape[0] * W.shape[0] <= 1_000_000_000)
            return sharded_topk(
                xg / temp, W, top_k, self.vocab_parallel_mesh, vocab_size=vsz,
                compute_dtype=jnp.float32 if small else None,
            )
        # (isinstance check keeps shape-polymorphic serving export tractable —
        # symbolic batch dims can't be compared against the threshold)
        if (top_k is not None and fused and isinstance(xg.shape[0], int)
                and xg.shape[0] * W.shape[0] > 1_000_000_000):
            # huge N×V: streamed top-k merge (peak memory O(N·chunk))
            from ..ops.vocab import fused_topk

            return fused_topk(xg / temp, W, top_k, vocab_size=vsz)
        scores = jnp.einsum("be,ve->bv", xg, W,
                            preferred_element_type=jnp.float32) / temp
        if vsz is not None:
            scores = scores[:, :vsz]
        if top_k is None:
            return scores
        return jax.lax.top_k(scores, top_k)
