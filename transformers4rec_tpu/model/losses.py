"""Losses: masked/label-smoothed cross-entropy, BCE, MSE.

Parity: /root/reference/transformers4rec/torch/losses.py:4-20
(``LabelSmoothCrossEntropyLoss``) plus the CE/BCE/MSE the reference pulls from
torch.nn inside the prediction tasks.

TPU-first: the reference gathers the variable number of masked positions with
``remove_pad_3d`` (prediction_task.py:472-479) — dynamic shapes. Here every
loss is a weighted mean over STATIC-shape inputs:
``sum(w * ce) / sum(w)`` with w = 0 at non-target positions, which is
numerically identical and jit/pjit friendly (SURVEY.md §7.1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_with_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Weighted-mean CE over integer labels. logits: (..., V); labels: (...,)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    if label_smoothing > 0.0:
        # (1-eps)*nll + eps*mean(-log_probs) — torch CrossEntropyLoss semantics
        smooth = -log_probs.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if weights is None:
        return nll.mean()
    w = weights.astype(jnp.float32)
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    per = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if weights is None:
        return per.mean()
    w = weights.astype(jnp.float32)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


def mse_loss(
    preds: jnp.ndarray, targets: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    per = (preds.astype(jnp.float32) - targets.astype(jnp.float32)) ** 2
    if weights is None:
        return per.mean()
    w = weights.astype(jnp.float32)
    return (per * w).sum() / jnp.maximum(w.sum(), 1.0)


class LabelSmoothCrossEntropyLoss:
    """Callable parity shim for the reference class (losses.py:4-20)."""

    def __init__(self, smoothing: float = 0.0):
        self.smoothing = smoothing

    def __call__(self, logits, labels, weights=None):
        return cross_entropy_with_logits(
            logits, labels, weights=weights, label_smoothing=self.smoothing
        )
