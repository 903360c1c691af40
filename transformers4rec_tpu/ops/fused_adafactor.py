"""Traffic-conscious Adafactor: exact optax.adafactor math, fewer HBM passes.

The embedding table's optimizer traffic is a top-3 cost of the train step at
recsys vocab scale (REES46: the (390k, 192) table is 300MB in f32; a full-step
A/B on TPU v5e measured optax.adafactor at +1.9 ms/step over plain SGD on that
table — benchmarks/step_ablation.py). The waste is structural: optax's
``scale_by_factored_rms`` materializes the factored ``update`` tensor because
two consumers read it (the ``clip_by_block_rms`` reduction and the final
scale), and ``grad²`` feeds two separate mean-reductions. XLA will not
recompute a (V, E) producer to avoid the materialization, so the chain costs
~2.4GB of HBM traffic per step where ~1.5GB suffices.

This module reformulates the same math so nothing (V, E)-shaped is ever
written except the final update:

  pass 1  read grad        → row/col mean of grad² (two reductions, one
                             traversal — XLA multi-output fusion)
  pass 2  read grad        → rms of the WOULD-BE update, computed as
                             ``sqrt(mean(grad² · cf²ᵢ · rf²ⱼ))`` — a weighted
                             reduction over grad², so the update tensor is
                             never formed
  pass 3  read grad+param  → update recomputed elementwise and fused by XLA
                             into ``optax.apply_updates``'s add

Semantics match ``optax.adafactor(learning_rate, multiply_by_parameter_scale=
False)`` exactly given the same factoring decision (same decay schedule,
epsilon placement, clipping, sign) — pinned by tests/test_fused_adafactor.py
to ~1e-6 over multi-step runs, so quality conclusions measured for
optax.adafactor carry over unchanged.

**Factoring is OFF by default** (``min_dim_size_to_factor`` = never), unlike
optax's 128 threshold: a 2000-step sessionized convergence A/B at the REES46
config (V=390k, E=64) measured the factored rank-1 second moment at
recall@20 0.0234 / eval-loss 10.27 vs 0.0383 / 9.55 unfactored — embedding
rows have heterogeneous per-element gradient scale that the rank-1
approximation loses. Pass an explicit threshold to opt into factoring where
full-V×E optimizer state is unaffordable (100M-row tables). The unfactored
path is still reformulated for traffic: ``lax.rsqrt`` instead of the literal
``power(v, -0.5)`` optax's HLO keeps (two transcendentals/element over
(V, E)), and the clip-rms recomputed from ``g²·inv_v`` so the update tensor
is never materialized.

Reference context: the reference library leaves optimizer choice to torch/HF
(dense Adam over the full table every step — SURVEY.md §2.9); factored/lazy
table optimizers are part of this framework's TPU-native scaling work.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


@dataclasses.dataclass
class _LeafResult:
    """Opaque per-leaf container (NOT a registered pytree → jax.tree treats it
    as a leaf; same trick as optax._src.factorized._UpdateResult). A plain
    tuple would collide with optax's MaskedNode — an EMPTY NamedTuple that
    multi_transform substitutes for masked-out leaves."""

    update: Any
    v_row: Any
    v_col: Any
    v: Any


class FusedAdafactorState(NamedTuple):
    count: jnp.ndarray
    v_row: Any  # factored: second-moment row means (reduced over the largest axis)
    v_col: Any  # factored: second-moment col means (reduced over the 2nd-largest)
    v: Any      # unfactored fallback (small/1-D params)


def _factored_dims(shape, min_dim_size_to_factor: int):
    """Two largest axes to reduce over, or None (optax _factored_dims)."""
    if len(shape) < 2:
        return None
    sorted_dims = np.argsort(shape)
    if shape[sorted_dims[-2]] < min_dim_size_to_factor:
        return None
    return int(sorted_dims[-2]), int(sorted_dims[-1])


def _lr_at(learning_rate: ScalarOrSchedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return learning_rate(count)
    return jnp.asarray(learning_rate)


def fused_adafactor(
    learning_rate: ScalarOrSchedule,
    min_dim_size_to_factor: int = 1 << 30,
    decay_rate: float = 0.8,
    decay_offset: int = 0,
    clipping_threshold: Optional[float] = 1.0,
    eps: float = 1e-30,
) -> optax.GradientTransformation:
    """Drop-in replacement for ``optax.adafactor(learning_rate,
    multiply_by_parameter_scale=False)`` with ~40% less HBM traffic on large
    2-D params. Compose via ``optax.multi_transform`` for embedding tables
    (see ``label_embedding_params``)."""

    def init(params):
        def _dropped_axis_sharding(p, drop_axis):
            """The param's NamedSharding with ``drop_axis`` removed — factored
            moments must ride the table's row sharding (a (V,) moment left on
            one device defeats the point of sharding a 100M-row table)."""
            sh = getattr(p, "sharding", None)
            if sh is None or not hasattr(sh, "spec") or not hasattr(sh, "mesh"):
                return None
            from jax.sharding import NamedSharding, PartitionSpec

            spec = list(sh.spec) + [None] * (p.ndim - len(sh.spec))
            del spec[drop_axis]
            return NamedSharding(sh.mesh, PartitionSpec(*spec))

        def _init_leaf(p):
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            if dims is not None:
                d1, d0 = dims
                vr = jnp.zeros(tuple(np.delete(p.shape, d0)), p.dtype)
                vc = jnp.zeros(tuple(np.delete(p.shape, d1)), p.dtype)
                vr_sh = _dropped_axis_sharding(p, d0)
                vc_sh = _dropped_axis_sharding(p, d1)
                if vr_sh is not None:
                    vr = jax.device_put(vr, vr_sh)
                if vc_sh is not None:
                    vc = jax.device_put(vc, vc_sh)
                return _LeafResult(None, vr, vc, jnp.zeros((1,), p.dtype))
            return _LeafResult(None, jnp.zeros((1,), p.dtype),
                               jnp.zeros((1,), p.dtype), jnp.zeros_like(p))

        leaves = jax.tree.map(_init_leaf, params)
        is_res = lambda t: isinstance(t, _LeafResult)  # noqa: E731
        return FusedAdafactorState(
            count=jnp.zeros((), jnp.int32),
            v_row=jax.tree.map(lambda t: t.v_row, leaves, is_leaf=is_res),
            v_col=jax.tree.map(lambda t: t.v_col, leaves, is_leaf=is_res),
            v=jax.tree.map(lambda t: t.v, leaves, is_leaf=is_res),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adafactor requires params")
        step = state.count
        decay = 1.0 - (step - decay_offset + 1).astype(jnp.float32) ** (
            -decay_rate
        )
        lr = _lr_at(learning_rate, step)

        def _update_leaf(g, v_row, v_col, v, p):
            dtype = p.dtype
            g = g.astype(jnp.float32)
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            if dims is not None:
                d1, d0 = dims
                # pass 1: both reductions of grad² in one traversal.
                # mean(g²+eps) == mean(g²)+eps, so eps is added after the
                # reduction (optax adds it to grad_sqr before — identical).
                g2 = g * g
                new_v_row = (decay * v_row
                             + (1.0 - decay) * (jnp.mean(g2, axis=d0) + eps))
                new_v_col = (decay * v_col
                             + (1.0 - decay) * (jnp.mean(g2, axis=d1) + eps))
                new_v_row = new_v_row.astype(dtype)
                new_v_col = new_v_col.astype(dtype)
                reduced_d1 = d1 - 1 if d1 > d0 else d1
                row_col_mean = jnp.mean(new_v_row, axis=reduced_d1,
                                        keepdims=True)
                rf = (new_v_row / row_col_mean) ** -0.5  # broadcast at d0
                cf = new_v_col ** -0.5                    # broadcast at d1
                rf_b = jnp.expand_dims(rf, axis=d0)
                cf_b = jnp.expand_dims(cf, axis=d1)
                if clipping_threshold is not None:
                    # pass 2: rms(update) without forming update:
                    # mean((g·rf·cf)²) = mean(g² · rf² · cf²)
                    upd_sq_mean = jnp.mean(g2 * (rf_b * rf_b) * (cf_b * cf_b))
                    rms = jnp.sqrt(upd_sq_mean)
                    scale = 1.0 / jnp.maximum(
                        1.0, rms / clipping_threshold
                    )
                else:
                    scale = 1.0
                # pass 3: recompute update elementwise; XLA fuses the scale +
                # rank-1 factors into apply_updates' add — no (V,E) temp.
                upd = g * ((-lr * scale) * rf_b) * cf_b
                return _LeafResult(upd.astype(dtype), new_v_row, new_v_col, v)
            # unfactored branch (1-D params, and any 2-D below the factoring
            # threshold — including the default for embedding tables: the
            # factored rank-1 second moment measurably hurts table quality,
            # see the module docstring). Same optax math, cheaper schedule:
            # rsqrt instead of a literal power op (the optimized HLO of
            # optax's version keeps `power(v, -0.5)` — two transcendentals
            # per element over (V, E)), and the clip rms recomputes
            # g²·inv_v instead of materializing the update tensor.
            g2 = g * g + eps
            new_v = (decay * v + (1.0 - decay) * g2).astype(dtype)
            inv = jax.lax.rsqrt(new_v.astype(jnp.float32))
            if clipping_threshold is not None:
                rms = jnp.sqrt(jnp.mean((g * inv) ** 2))
                scale = 1.0 / jnp.maximum(1.0, rms / clipping_threshold)
            else:
                scale = 1.0
            upd = g * ((-lr * scale) * inv)
            return _LeafResult(upd.astype(dtype), v_row, v_col, new_v)

        out = jax.tree.map(_update_leaf, grads, state.v_row, state.v_col,
                           state.v, params)
        is_res = lambda t: isinstance(t, _LeafResult)  # noqa: E731
        updates = jax.tree.map(lambda t: t.update, out, is_leaf=is_res)
        new_state = FusedAdafactorState(
            count=optax.safe_increment(step),
            v_row=jax.tree.map(lambda t: t.v_row, out, is_leaf=is_res),
            v_col=jax.tree.map(lambda t: t.v_col, out, is_leaf=is_res),
            v=jax.tree.map(lambda t: t.v, out, is_leaf=is_res),
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)
