"""Sparse / lazy row-wise optimizers for embedding tables.

The reference delegates embedding updates to torch's dense Adam — every step
rewrites the full (V, E) table and both moment tensors even when a batch
touches a few thousand rows (SURVEY.md §2.9: torch ATen embedding + optimizer
kernels). At recsys vocab scale (REES46: 390k rows; the large-vocab stress
config: 100M rows) dense moments traffic dominates the step, and at 100M rows
it is simply unusable.

Two TPU-native mechanisms, by table size:

1. ``lazy_adam`` — an optax ``GradientTransformation`` with **lazy-Adam
   semantics**: moment decay and parameter updates apply only to rows whose
   gradient is nonzero this step (TF ``LazyAdamOptimizer`` semantics; the
   standard for embedding tables — rare items keep their momentum instead of
   being decayed toward zero between occurrences). Mask-based, so it keeps
   optax composability (``optax.multi_transform`` routes table params here,
   dense params to AdamW); XLA fuses the masked update into one pass.

2. ``sparse_rows_adam`` — a true gather/scatter update for the touched rows
   only: ``O(N·E)`` traffic per step instead of ``O(V·E)`` (N = ids per
   batch). Used where the training step *knows* the touched ids (input
   lookups + sampled-softmax negatives + labels), with the table's rows
   gathered OUTSIDE autodiff so no dense (V, E) gradient is ever
   materialized. ``sharded_rows_adam_update`` applies the same update to a
   row-sharded table under ``shard_map`` — each shard scatters only the ids
   in its range; no cross-shard traffic beyond the forward psum.

Duplicate ids within a batch are merged with a static-shape sort +
``segment_sum`` (no ``jnp.unique`` — dynamic shapes don't jit).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


def _lr_at(learning_rate: ScalarOrSchedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return learning_rate(count)
    return jnp.asarray(learning_rate)


# --------------------------------------------------------------------- lazy adam
class LazyAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def lazy_adam(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam that only advances moments/params for rows touched this step.

    A row is "touched" when any element of its gradient is nonzero (for 1-D
    params, per-element). Bias correction uses the global step count, matching
    TF LazyAdam. Drop-in optax transform — compose with
    ``optax.multi_transform`` to apply it to ``*_table`` params only
    (see ``label_embedding_params``).
    """

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return LazyAdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                             nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        # schedule evaluated at the PRE-increment count — the optax
        # convention every dense arm uses (scale_by_schedule), so scheduled
        # A/Bs across table optimizers ride the same LR trajectory; bias
        # correction stays at count+1 (standard Adam t=1 first step)
        lr = _lr_at(learning_rate, state.count)

        def touched_mask(g):
            if g.ndim >= 2:
                return jnp.any(g != 0, axis=tuple(range(1, g.ndim)),
                               keepdims=True)
            return g != 0

        mu = jax.tree_util.tree_map(
            lambda g, mu: jnp.where(touched_mask(g), b1 * mu + (1.0 - b1) * g, mu),
            grads, state.mu,
        )
        nu = jax.tree_util.tree_map(
            lambda g, nu: jnp.where(
                touched_mask(g), b2 * nu + (1.0 - b2) * g * g, nu
            ),
            grads, state.nu,
        )
        updates = jax.tree_util.tree_map(
            lambda g, mu2, nu2: jnp.where(
                touched_mask(g),
                -lr * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps),
                jnp.zeros_like(g),
            ),
            grads, mu, nu,
        )
        return updates, LazyAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def label_embedding_params(params, pattern: str = "_table") -> Any:
    """Pytree of labels ('table' | 'dense') for ``optax.multi_transform``:
    any param whose path contains ``pattern`` is an embedding table."""

    def label(path, _):
        return "table" if pattern in jax.tree_util.keystr(path) else "dense"

    return jax.tree_util.tree_map_with_path(label, params)


# --------------------------------------------------- true sparse (gather/scatter)
class SparseRowsAdamState(NamedTuple):
    count: jnp.ndarray
    mu: jnp.ndarray  # (V, E) — allocated once, only touched rows traffic/step
    nu: jnp.ndarray


def sparse_rows_adam_init(
    table: jnp.ndarray, moment_dtype=None
) -> SparseRowsAdamState:
    """``moment_dtype`` (e.g. ``jnp.bfloat16``) stores mu/nu in a narrower
    dtype — compute stays f32 (rows upcast at gather, round at scatter).
    Halves the HBM-resident state of a huge table: the sparse step's per-step
    traffic is O(N·E) either way, but the 2×(V, E) f32 moments were the
    RESIDENCY ceiling (VERDICT r4: 8M rows OOMed v5e with f32 state)."""
    dt = moment_dtype or jnp.float32
    return SparseRowsAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jnp.zeros_like(table, dtype=dt),
        nu=jnp.zeros_like(table, dtype=dt),
    )


def dedupe_row_grads(ids: jnp.ndarray, row_grads: jnp.ndarray, vocab_size: int):
    """Merge duplicate ids: returns (uids, summed_grads) of the same static
    length N, where padding slots carry ``uid == vocab_size`` (scattered with
    mode='drop'). Pure sort + segment_sum — jit-safe static shapes."""
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = row_grads[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]]
    )
    seg = jnp.cumsum(first) - 1  # (N,) in [0, n_unique)
    summed = jax.ops.segment_sum(sg, seg, num_segments=n)
    counts = jax.ops.segment_sum(jnp.ones_like(sid), seg, num_segments=n)
    uids = jax.ops.segment_max(sid, seg, num_segments=n)
    uids = jnp.where(counts > 0, uids, vocab_size)  # out-of-range → dropped
    return uids, summed


def sparse_rows_adam_update(
    table: jnp.ndarray,
    state: SparseRowsAdamState,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    deduped: bool = False,
):
    """Lazy-Adam update on the rows named by ``ids`` only.

    ids: (N,) int; row_grads: (N, E) — the gradient w.r.t. ``table[ids]``
    (gather the rows OUTSIDE autodiff and differentiate w.r.t. the gathered
    activations so the dense (V, E) gradient never exists). Per-step traffic
    is O(N·E) gathers/scatters, vs O(V·E) for any dense optimizer.
    """
    count = state.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    # schedule at the PRE-increment count (optax convention — see lazy_adam)
    lr = _lr_at(learning_rate, state.count)
    V = table.shape[0]

    if not deduped:
        ids, row_grads = dedupe_row_grads(ids.reshape(-1),
                                          row_grads.reshape(-1, row_grads.shape[-1]),
                                          V)
    # compute in f32 regardless of the moments' STORAGE dtype (bf16 moments
    # upcast at gather, round once at scatter — the fused_adafactor pattern)
    g = row_grads.astype(jnp.float32)
    mu_prev = state.mu.at[ids].get(mode="fill", fill_value=0.0).astype(
        jnp.float32)
    nu_prev = state.nu.at[ids].get(mode="fill", fill_value=0.0).astype(
        jnp.float32)
    mu_rows = b1 * mu_prev + (1 - b1) * g
    nu_rows = b2 * nu_prev + (1 - b2) * g * g
    step = lr * (mu_rows / bc1) / (jnp.sqrt(nu_rows / bc2) + eps)

    table = table.at[ids].add(-step.astype(table.dtype), mode="drop")
    mu = state.mu.at[ids].set(mu_rows.astype(state.mu.dtype), mode="drop")
    nu = state.nu.at[ids].set(nu_rows.astype(state.nu.dtype), mode="drop")
    return table, SparseRowsAdamState(count=count, mu=mu, nu=nu)


# ------------------------------------------- sparse unfactored adafactor rows
class SparseRowsAdafactorState(NamedTuple):
    count: jnp.ndarray
    v: jnp.ndarray  # (V, E) unfactored second moment (moment_dtype storage)


def sparse_rows_adafactor_init(
    table: jnp.ndarray, moment_dtype=None
) -> SparseRowsAdafactorState:
    return SparseRowsAdafactorState(
        count=jnp.zeros((), jnp.int32),
        v=jnp.zeros_like(table, dtype=moment_dtype or jnp.float32),
    )


def sparse_rows_adafactor_update(
    table: jnp.ndarray,
    state: SparseRowsAdafactorState,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    learning_rate: ScalarOrSchedule,
    decay_rate: float = 0.8,
    decay_offset: int = 0,
    clipping_threshold: float = 1.0,
    eps: float = 1e-30,
    deduped: bool = False,
):
    """UNfactored-adafactor update on the touched rows only — the repo's
    quality-default table rule (``fused_adafactor``: +28% recall@20 over
    adam-family at the 390k config, docs/performance.md) in O(N·E).

    Per-touch math is EXACTLY ``fused_adafactor``'s unfactored branch (same
    decay schedule ``1 − (t+1)^−0.8`` at the global count, eps placement,
    rsqrt, sign), and the update-RMS clip divides by the FULL ``V·E`` — in
    the dense op untouched rows contribute 0 to the RMS numerator (g = 0),
    so the clip scale matches the dense one given equal moments. The one
    semantic difference is **lazy** second moments: untouched rows keep v
    instead of decaying toward eps between touches (the lazy_adam argument —
    rare items keep their scale; a dense decay pass would be O(V·E)/step,
    exactly the traffic this path exists to avoid).
    """
    count = state.count
    V = table.shape[0]
    E = table.shape[1]
    if not deduped:
        ids, row_grads = dedupe_row_grads(
            ids.reshape(-1), row_grads.reshape(-1, row_grads.shape[-1]), V
        )
    decay = 1.0 - (count - decay_offset + 1).astype(jnp.float32) ** (
        -decay_rate
    )
    lr = _lr_at(learning_rate, count)
    g = row_grads.astype(jnp.float32)
    v_prev = state.v.at[ids].get(mode="fill", fill_value=0.0).astype(
        jnp.float32)
    new_v = decay * v_prev + (1.0 - decay) * (g * g + eps)
    inv = jax.lax.rsqrt(new_v)
    if clipping_threshold is not None:
        # dedupe padding slots carry g == 0 (segment_sum of an empty
        # segment), so they add 0 to the numerator — no masking needed
        rms = jnp.sqrt(jnp.sum((g * inv) ** 2) / (V * E))
        scale = 1.0 / jnp.maximum(1.0, rms / clipping_threshold)
    else:
        scale = 1.0
    upd = g * ((-lr * scale) * inv)
    table = table.at[ids].add(upd.astype(table.dtype), mode="drop")
    v = state.v.at[ids].set(new_v.astype(state.v.dtype), mode="drop")
    return table, SparseRowsAdafactorState(
        count=optax.safe_increment(count), v=v
    )


def sharded_rows_adam_update(
    table: jnp.ndarray,
    state: SparseRowsAdamState,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    learning_rate: ScalarOrSchedule,
    mesh,
    axis: str = "model",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """``sparse_rows_adam_update`` for a table row-sharded over ``axis``.

    ids/row_grads are replicated (dedupe runs replicated — cheap: O(N log N)).
    Under ``shard_map`` each shard rebases ids into its row range and scatters
    locally; ids outside the range drop. No collective is needed for the
    update itself (each id lives on exactly one shard).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    V, E = table.shape
    n_shards = mesh.shape[axis]
    rows_per_shard = V // n_shards
    ids, row_grads = dedupe_row_grads(
        ids.reshape(-1), row_grads.reshape(-1, row_grads.shape[-1]), V
    )

    def local(table_s, mu_s, nu_s, count, uids, g):
        shard = jax.lax.axis_index(axis)
        lo = shard * rows_per_shard
        rel = uids - lo
        rel = jnp.where((rel >= 0) & (rel < rows_per_shard), rel, rows_per_shard)
        t2, st = sparse_rows_adam_update(
            table_s,
            SparseRowsAdamState(count=count, mu=mu_s, nu=nu_s),
            rel,
            g,
            learning_rate,
            b1=b1,
            b2=b2,
            eps=eps,
            deduped=True,
        )
        return t2, st.mu, st.nu, st.count

    spec_t = P(axis, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, P(), P(), P()),
        out_specs=(spec_t, spec_t, spec_t, P()),
        check_rep=False,
    )
    t2, mu, nu, count = fn(table, state.mu, state.nu, state.count, ids, row_grads)
    return t2, SparseRowsAdamState(count=count, mu=mu, nu=nu)
