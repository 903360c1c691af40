"""LR schedulers with num_cycles support.

Parity: /root/reference/transformers4rec/torch/trainer.py:243-313 —
``create_scheduler`` dispatching HF ``get_scheduler`` types plus the
cosine-with-cycles variants (``get_cosine_schedule_with_warmup(num_cycles=...)``),
and ``reset_lr_scheduler`` (:234-241) for incremental retraining.

Implemented as optax schedules (pure step→lr functions — resetting a schedule
is just re-creating the optimizer state, see Trainer.reset_lr_scheduler).
"""

from __future__ import annotations

from typing import Callable

import optax


def get_scheduler(
    name: str,
    learning_rate: float,
    num_warmup_steps: int,
    num_training_steps: int,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> Callable[[int], float]:
    name = name.lower()
    warmup = max(int(num_warmup_steps), 0)
    total = max(int(num_training_steps), warmup + 1)

    if name in ("constant",):
        return optax.constant_schedule(learning_rate)
    if name in ("constant_with_warmup",):
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup),
                optax.constant_schedule(learning_rate),
            ],
            [warmup],
        ) if warmup else optax.constant_schedule(learning_rate)

    def with_warmup(decay_fn):
        if not warmup:
            return decay_fn
        return optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup), decay_fn], [warmup]
        )

    decay_steps = max(total - warmup, 1)
    if name == "linear":
        return with_warmup(optax.linear_schedule(learning_rate, 0.0, decay_steps))
    if name == "polynomial":
        return with_warmup(
            optax.polynomial_schedule(learning_rate, 0.0, power, decay_steps)
        )
    if name == "cosine":
        return with_warmup(_cosine_schedule(learning_rate, decay_steps, num_cycles))
    if name == "cosine_with_restarts":
        return with_warmup(
            _cosine_restarts_schedule(learning_rate, decay_steps, int(max(num_cycles, 1)))
        )
    raise ValueError(f"Unknown scheduler {name!r}")


def _cosine_schedule(lr: float, decay_steps: int, num_cycles: float):
    """HF get_cosine_schedule_with_warmup semantics:
    0.5 * (1 + cos(pi * 2 * num_cycles * progress)), floored at 0."""
    import jax.numpy as jnp

    def schedule(step):
        progress = jnp.clip(step / decay_steps, 0.0, 1.0)
        val = 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress))
        return lr * jnp.maximum(val, 0.0)

    return schedule


def _cosine_restarts_schedule(lr: float, decay_steps: int, num_cycles: int):
    """HF get_cosine_with_hard_restarts_schedule_with_warmup semantics."""
    import jax.numpy as jnp

    def schedule(step):
        progress = jnp.clip(step / decay_steps, 0.0, 1.0)
        val = 0.5 * (1.0 + jnp.cos(jnp.pi * ((num_cycles * progress) % 1.0)))
        return jnp.where(progress >= 1.0, 0.0, lr * jnp.maximum(val, 0.0))

    return schedule


def num_cosine_cycles(num_epochs: float, cycles_per_epoch: float) -> float:
    """reference trainer.py:288-296: num_cycles =
    num_epochs * learning_rate_num_cosine_cycles_by_epoch."""
    return num_epochs * cycles_per_epoch
