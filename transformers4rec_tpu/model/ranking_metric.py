"""Streaming ranking metrics: NDCG / Recall / Precision / MAP / DCG / MRR @k.

Parity: /root/reference/transformers4rec/torch/ranking_metric.py — torchmetrics
classes with ``dist_reduce_fx="cat"`` streaming state (:30-70) and per-metric
``_metric`` bodies (:73-319), plus the one-hot + ``extract_topk`` helpers
(torch/utils/torch_utils.py:226-238).

TPU-first redesign (SURVEY.md §7.4 point 5):
- The reference one-hots labels to a |V|-sized tensor per example
  (torch_utils.py:237-238) — that materializes (N, 390k+) and cannot scale.
  Here metrics are computed from the RANK of each label inside the top-max(k)
  predictions: one ``lax.top_k`` + one equality scan over K ≤ 20-ish columns.
- Streaming state is a pytree of (sum, count) scalars — accumulated with pure
  updates and reduced across devices with ``psum`` (the reference's
  ``dist_reduce_fx`` analog, see ``reduce_metric_state``).
- Everything is weight-aware: padded / non-target rows carry weight 0, so the
  flattened (B*S) static-shape eval path needs no dynamic filtering.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import Registry

ranking_metrics_registry: Registry = Registry("ranking_metrics")

MetricState = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]  # name -> (sum, count)


@dataclasses.dataclass(frozen=True)
class RankingMetric:
    """A rank→score rule evaluated at several cutoffs.

    ``from_rank(rank, k)`` returns the per-example metric value given the
    0-based rank of the true item in the prediction ordering (rank ≥ K means
    "not in top-K").
    """

    name: str = "metric"
    top_ks: Sequence[int] = (10, 20)

    def from_rank(self, rank: jnp.ndarray, k: int) -> jnp.ndarray:
        raise NotImplementedError

    def key(self, k: int) -> str:
        return f"{self.name}_at_{k}"


@ranking_metrics_registry.register("precision")
@dataclasses.dataclass(frozen=True)
class PrecisionAt(RankingMetric):
    """reference ranking_metric.py:73-103 (single relevant item ⇒ hit/k)."""

    name: str = "precision"

    def from_rank(self, rank, k):
        return (rank < k).astype(jnp.float32) / k


@ranking_metrics_registry.register("recall")
@dataclasses.dataclass(frozen=True)
class RecallAt(RankingMetric):
    """reference ranking_metric.py:106-147."""

    name: str = "recall"

    def from_rank(self, rank, k):
        return (rank < k).astype(jnp.float32)


@ranking_metrics_registry.register("avg_precision", "map")
@dataclasses.dataclass(frozen=True)
class AvgPrecisionAt(RankingMetric):
    """reference ranking_metric.py:150-190; single-label AP@k = 1/(rank+1)."""

    name: str = "avg_precision"

    def from_rank(self, rank, k):
        return jnp.where(rank < k, 1.0 / (rank + 1.0), 0.0).astype(jnp.float32)


@ranking_metrics_registry.register("dcg")
@dataclasses.dataclass(frozen=True)
class DCGAt(RankingMetric):
    """reference ranking_metric.py:193-238 (log2 discount)."""

    name: str = "dcg"

    def from_rank(self, rank, k):
        return jnp.where(
            rank < k, 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0), 0.0
        ).astype(jnp.float32)


@ranking_metrics_registry.register("ndcg")
@dataclasses.dataclass(frozen=True)
class NDCGAt(RankingMetric):
    """reference ranking_metric.py:241-281; ideal DCG for one relevant item = 1."""

    name: str = "ndcg"

    def from_rank(self, rank, k):
        return jnp.where(
            rank < k, 1.0 / jnp.log2(rank.astype(jnp.float32) + 2.0), 0.0
        ).astype(jnp.float32)


@ranking_metrics_registry.register("mrr", "mean_reciprocal_rank")
@dataclasses.dataclass(frozen=True)
class MeanReciprocalRankAt(RankingMetric):
    """reference ranking_metric.py:284-319."""

    name: str = "mrr"

    def from_rank(self, rank, k):
        return jnp.where(rank < k, 1.0 / (rank + 1.0), 0.0).astype(jnp.float32)


DEFAULT_METRICS: Tuple[RankingMetric, ...] = (
    NDCGAt(top_ks=(10, 20)),
    AvgPrecisionAt(top_ks=(10, 20)),
    RecallAt(top_ks=(10, 20)),
)


def label_ranks(
    scores: jnp.ndarray, labels: jnp.ndarray, max_k: int
) -> jnp.ndarray:
    """0-based rank of each label in the top-``max_k`` of ``scores``.

    scores: (N, V) float; labels: (N,) int ids. Returns (N,) int32 rank, with
    ``max_k`` meaning "not in the top max_k". One fused top-k over the vocab —
    never materializes a |V| one-hot.
    """
    _, top_ids = jax.lax.top_k(scores, max_k)  # (N, K)
    hit = top_ids == labels[:, None].astype(top_ids.dtype)
    in_topk = hit.any(axis=-1)
    rank = jnp.argmax(hit, axis=-1)
    return jnp.where(in_topk, rank, max_k).astype(jnp.int32)


def ranks_from_topk(topk_ids: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Rank from precomputed top-k ids (serving / predict_top_k path)."""
    K = topk_ids.shape[-1]
    hit = topk_ids == labels[:, None].astype(topk_ids.dtype)
    in_topk = hit.any(axis=-1)
    rank = jnp.argmax(hit, axis=-1)
    return jnp.where(in_topk, rank, K).astype(jnp.int32)


def compute_batch_metrics(
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    metrics: Sequence[RankingMetric] = DEFAULT_METRICS,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-batch (weighted-sum, weight-count) for every metric × cutoff."""
    max_k = max(k for m in metrics for k in m.top_ks)
    rank = label_ranks(scores, labels, max_k)
    return metrics_from_ranks(rank, metrics, weights)


def metrics_from_ranks(
    rank: jnp.ndarray,
    metrics: Sequence[RankingMetric] = DEFAULT_METRICS,
    weights: Optional[jnp.ndarray] = None,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    if weights is None:
        weights = jnp.ones_like(rank, dtype=jnp.float32)
    weights = weights.astype(jnp.float32)
    count = weights.sum()
    out = {}
    for m in metrics:
        for k in m.top_ks:
            val = (m.from_rank(rank, k) * weights).sum()
            out[m.key(k)] = (val, count)
    return out


# ------------------------------------------------------------------ streaming
def init_metric_state(
    metrics: Sequence[RankingMetric] = DEFAULT_METRICS,
) -> MetricState:
    state: MetricState = {}
    for m in metrics:
        for k in m.top_ks:
            state[m.key(k)] = (jnp.zeros(()), jnp.zeros(()))
    return state


def update_metric_state(state: MetricState, batch: MetricState) -> MetricState:
    return {
        name: (state[name][0] + s, state[name][1] + c)
        for name, (s, c) in batch.items()
    }


def reduce_metric_state(state: MetricState, axis_name: str) -> MetricState:
    """Cross-device reduction — psum replaces the reference's torchmetrics
    ``dist_reduce_fx='cat'`` gather (ranking_metric.py:50)."""
    return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis_name), state)


def finalize_metrics(state: MetricState) -> Dict[str, jnp.ndarray]:
    return {
        name: jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)
        for name, (s, c) in state.items()
    }


def parse_metrics(metrics) -> Tuple[RankingMetric, ...]:
    """Accept strings ('ndcg@10'), classes, or instances."""
    out = []
    for m in metrics:
        if isinstance(m, RankingMetric):
            out.append(m)
        elif isinstance(m, str):
            if "@" in m:
                name, k = m.split("@")
                out.append(ranking_metrics_registry.parse(name)(top_ks=(int(k),)))
            else:
                out.append(ranking_metrics_registry.parse(m)())
        else:
            out.append(m() if isinstance(m, type) else m)
    return tuple(out)
