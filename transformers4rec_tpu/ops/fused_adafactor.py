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

from .vocab import _on_tpu  # single platform probe for all ops

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


# ------------------------------------------------------------------ pallas
# Opt-in fused kernels for the unfactored 2-D (table) branch: the kernels
# fold the clip partial-sums into the new_v pass, so the table streams twice:
#   pass A  read g, v      → write new_v, per-block Σ(g·rsqrt(new_v))²
#   pass B  read g, new_v  → write update
# Numerics identical to the jnp branch modulo partial-sum order (pinned by
# tests/test_fused_adafactor.py pallas-vs-jnp parity).
#
# NEGATIVE RESULT (measured, don't re-litigate): full-bench A/B on TPU v5e
# at the REES46 config (V=390k, E=64, K=32 packing) — pallas arm 10.33
# ms/step (12,396 ex/s) vs XLA arm 8.99/9.01 ms (14,232/14,199 ex/s). The
# XLA chain wins because (a) the CE-bwd dW scatter-add fuses INTO the grad
# buffer the optimizer then reads (a pallas_call is a fusion barrier on both
# sides), and (b) XLA overlaps the elementwise passes with unrelated step
# work, which the serialized two-kernel pipeline cannot. Kept as an opt-in
# (`use_pallas=True`) measurement harness only; default stays False.

_PALLAS_BLOCK_ROWS = 512


def _upd_a_kernel(n_rows, br, s_ref, g_ref, v_ref, nv_ref, ps_ref):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    decay = s_ref[0]
    eps = s_ref[1]
    g = g_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    nv = decay * v + (1.0 - decay) * (g * g + eps)
    nv_ref[...] = nv.astype(nv_ref.dtype)
    inv = jax.lax.rsqrt(nv)
    # mask the ragged tail block (reads there are padding garbage)
    row = i * br + jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    val = jnp.where(row < n_rows, (g * inv) ** 2, 0.0)
    # ps is one full (G, 1) block resident across the grid (TPU tiling
    # rejects (1, 1) blocks); each step writes its own row as a (1, 1) slice
    # (scalar stores to VMEM are rejected by Mosaic)
    ps_ref[pl.ds(i, 1), :] = val.sum().reshape(1, 1)


def _upd_b_kernel(s_ref, g_ref, nv_ref, upd_ref):
    coef = s_ref[2]
    g = g_ref[...].astype(jnp.float32)
    inv = jax.lax.rsqrt(nv_ref[...].astype(jnp.float32))
    upd_ref[...] = (g * (coef * inv)).astype(upd_ref.dtype)


def _pallas_unfactored_update(g, v, p, decay, lr, clipping_threshold, eps):
    """Two-pass streamed update for a 2-D table leaf. Returns (upd, new_v)."""
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, E = p.shape
    br = _PALLAS_BLOCK_ROWS
    grid = (-(-V // br),)
    interpret = not _on_tpu()
    scalars = jnp.stack([
        decay.astype(jnp.float32) if hasattr(decay, "astype")
        else jnp.float32(decay),
        jnp.float32(eps),
        jnp.float32(0.0),  # coef placeholder (pass A ignores it)
    ])
    nv, ps = pl.pallas_call(
        functools.partial(_upd_a_kernel, V, br),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
                pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
                pl.BlockSpec((grid[0], 1), lambda i, *_: (0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((V, E), p.dtype),
            jax.ShapeDtypeStruct((grid[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, g, v)
    if clipping_threshold is not None:
        rms = jnp.sqrt(ps.sum() / (V * E))
        scale = 1.0 / jnp.maximum(1.0, rms / clipping_threshold)
    else:
        scale = 1.0
    coef = (-lr * scale).astype(jnp.float32)
    scalars_b = jnp.stack([scalars[0], scalars[1], coef])
    upd = pl.pallas_call(
        _upd_b_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
                pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((br, E), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((V, E), p.dtype),
        interpret=interpret,
    )(scalars_b, g, nv)
    return upd, nv


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
    use_pallas: bool = False,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Drop-in replacement for ``optax.adafactor(learning_rate,
    multiply_by_parameter_scale=False)`` with ~40% less HBM traffic on large
    2-D params. Compose via ``optax.multi_transform`` for embedding tables
    (see ``label_embedding_params``).

    ``moment_dtype`` (e.g. ``jnp.bfloat16``) stores the second-moment state
    in a narrower dtype — compute stays f32 (decay/rsqrt/clip upcast), only
    the HBM-resident state narrows, halving the optimizer's read+write
    stream on a (V, E) table. None = the param's dtype (exact optax parity,
    the default). Mutually exclusive with ``use_pallas`` (the pallas pass B
    reads the unrounded f32 new_v — a different update rule than rsqrt of
    the stored narrow value); the conflict raises rather than silently
    picking one arm of an A/B."""
    if use_pallas and moment_dtype is not None:
        raise ValueError(
            "fused_adafactor: use_pallas=True and moment_dtype are mutually "
            "exclusive (pass moment_dtype=None for the pallas measurement "
            "arm)"
        )

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
            mdt = moment_dtype or p.dtype
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            if dims is not None:
                d1, d0 = dims
                vr = jnp.zeros(tuple(np.delete(p.shape, d0)), mdt)
                vc = jnp.zeros(tuple(np.delete(p.shape, d1)), mdt)
                vr_sh = _dropped_axis_sharding(p, d0)
                vc_sh = _dropped_axis_sharding(p, d1)
                if vr_sh is not None:
                    vr = jax.device_put(vr, vr_sh)
                if vc_sh is not None:
                    vc = jax.device_put(vc, vc_sh)
                return _LeafResult(None, vr, vc, jnp.zeros((1,), mdt))
            # zeros_like (not zeros): the unfactored moment must inherit the
            # param's NamedSharding — a (V, E) moment created unsharded lands
            # on ONE device, which is exactly the failure the factored-path
            # _dropped_axis_sharding fix prevents
            return _LeafResult(None, jnp.zeros((1,), mdt),
                               jnp.zeros((1,), mdt),
                               jnp.zeros_like(p, dtype=mdt))

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
            sdtype = moment_dtype or p.dtype  # moment STORAGE dtype
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
                new_v_row = new_v_row.astype(sdtype)
                new_v_col = new_v_col.astype(sdtype)
                reduced_d1 = d1 - 1 if d1 > d0 else d1
                vr32 = new_v_row.astype(jnp.float32)
                vc32 = new_v_col.astype(jnp.float32)
                row_col_mean = jnp.mean(vr32, axis=reduced_d1, keepdims=True)
                rf = (vr32 / row_col_mean) ** -0.5  # broadcast at d0
                cf = vc32 ** -0.5                    # broadcast at d1
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
            if (use_pallas and p.ndim == 2
                    and p.shape[0] >= 4 * _PALLAS_BLOCK_ROWS):
                upd, new_v = _pallas_unfactored_update(
                    g, v.astype(jnp.float32), p, decay, lr,
                    clipping_threshold, eps,
                )
                return _LeafResult(upd.astype(dtype), v_row, v_col,
                                   new_v.astype(sdtype))
            g2 = g * g + eps
            new_v = (decay * v.astype(jnp.float32)
                     + (1.0 - decay) * g2).astype(sdtype)
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
