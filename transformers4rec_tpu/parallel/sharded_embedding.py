"""Explicitly-sharded embedding lookup over the 'model' mesh axis.

The north-star capability with NO reference analog (SURVEY.md §2.10: the
reference keeps every table on one device — features/embedding.py:75-88).
Two code paths exist for model-parallel tables:

1. **Sharding-driven (default)**: tables carry a ``P('model', None)``
   NamedSharding (parallel/mesh.py) and XLA inserts collectives for the
   gather. Simple, and optimal for most sizes.
2. **Explicit shard_map (this module)**: each shard looks up only the ids in
   its row range and a ``psum`` over 'model' combines the partial rows —
   guaranteeing the full table is NEVER all-gathered (which XLA may choose
   when the id count is large relative to the table). Use for 100M+-row
   tables. Backward is handled by shard_map autodiff: gradients scatter-add
   into the local shard only, and the psum transposes to a no-op for ids.

Communication: one psum of (ids_shape × dim) activations over ICI — the
all-to-all-style exchange the north star calls for, expressed as the XLA
collective that rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_embedding_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    data_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Lookup rows of a row-sharded ``table`` for (possibly data-sharded)
    ``ids``. Returns embeddings laid out like ``ids`` (+ trailing dim),
    replicated over ``axis``.

    table: (V, E) sharded P(axis, None). ids: (...,) int, sharded
    P(data_axis, ...) or replicated. V must divide the axis size.
    """
    V, E = table.shape
    n_shards = mesh.shape[axis]
    if V % n_shards:
        raise ValueError(f"vocab {V} must divide the '{axis}' axis ({n_shards})")
    rows_per_shard = V // n_shards

    ids_spec = P(data_axis, *([None] * (ids.ndim - 1))) if data_axis else P()

    def local_lookup(table_shard, ids_local):
        # table_shard: (V/n, E); ids_local: per-data-shard ids, replicated
        # over 'model'
        shard_idx = jax.lax.axis_index(axis)
        lo = shard_idx * rows_per_shard
        rel = ids_local - lo
        in_range = (rel >= 0) & (rel < rows_per_shard)
        safe = jnp.clip(rel, 0, rows_per_shard - 1)
        emb = table_shard[safe] * in_range[..., None].astype(table_shard.dtype)
        # combine partial rows across shards (each id hits exactly one shard)
        return jax.lax.psum(emb, axis)

    fn = shard_map(
        local_lookup,
        mesh=mesh,
        in_specs=(P(axis, None), ids_spec),
        out_specs=ids_spec,
        check_rep=False,
    )
    return fn(table, ids)


def shard_table(table: jnp.ndarray, mesh: Mesh, axis: str = "model") -> jnp.ndarray:
    """Place a table with rows sharded over ``axis``."""
    return jax.device_put(
        table, NamedSharding(mesh, P(axis, *([None] * (table.ndim - 1))))
    )


# =========================================================================
# vocab-parallel full softmax: CE (train, differentiable) + CE-and-rank
# (eval) with the output table row-sharded over 'model'
# =========================================================================
#
# At 100M-row vocab the tied-softmax (N, V) pass cannot run against a
# replicated table, and letting XLA auto-partition the streamed Pallas CE
# kernels would all-gather W (a pallas_call is opaque to the partitioner).
# These ops run the SAME streamed kernels per shard on the local rows and
# combine with O(N) collectives:
#   lse_global  = online-logsumexp merge over 'model' (pmax + psum)
#   label_logit = psum (only the owning shard's col==label term is nonzero)
#   rank        = psum of local counts of strictly-greater logits
#   backward    : dW is exactly the local rows' gradient (P uses lse_global);
#                 dx partials psum over 'model'. Label terms land on the
#                 owning shard only (out-of-range local labels match no col).
# Communication: O(N) scalars per pass over ICI — never O(V).
#
# label_smoothing rides the same streamed kernels: each shard accumulates the
# sum of its valid logits (zsum), one extra O(N) psum merges it, and the
# per-row loss is lse − (1−ε)·ll − (ε/V)·zsum with V the GLOBAL true vocab.
# The backward residual P − (1−ε)·onehot − ε/V is local per shard (each
# shard's valid columns get the −ε/V pull; the onehot lands on the owning
# shard) — the ε/V constant is passed in statically because the per-shard
# vocab bound is traced (ops/vocab.py eps_over_v).


def _local_bounds(W_l, vocab_size, model_axis):
    V_l = W_l.shape[0]
    v0 = (jax.lax.axis_index(model_axis) * V_l).astype(jnp.int32)
    total = jnp.int32(vocab_size) if vocab_size is not None else jnp.int32(
        V_l * jax.lax.axis_size(model_axis)
    )
    vsz = jnp.clip(total - v0, 0, V_l)
    return v0, vsz


def _merge_lse(lse_l, ll_l, model_axis):
    m = jax.lax.pmax(lse_l, model_axis)
    lse_g = m + jnp.log(jax.lax.psum(jnp.exp(lse_l - m), model_axis))
    ll_g = jax.lax.psum(ll_l, model_axis)
    return lse_g, ll_g


def _merged_nll(lse_l, ll_l, zs_l, eps, v_total, model_axis):
    """Per-row smoothed NLL from per-shard accumulators: merge the online
    logsumexp + label logit over 'model', psum the smoothing zsum, and apply
    lse − (1−ε)·ll − (ε/V)·zsum. ONE definition shared by the train CE and
    the eval CE+rank so the two can never drift."""
    lse_g, ll_g = _merge_lse(lse_l, ll_l, model_axis)
    if eps:
        zs_g = jax.lax.psum(zs_l, model_axis)
        return lse_g - (1.0 - eps) * ll_g - (eps / v_total) * zs_g, lse_g, ll_g
    return lse_g - ll_g, lse_g, ll_g


def sharded_softmax_ce(
    x: jnp.ndarray,
    W: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    vocab_size: Optional[int] = None,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    label_smoothing: float = 0.0,
):
    """Differentiable weighted-mean CE of ``x @ W.T`` with W row-sharded
    P(model_axis, None) and x/labels/weights sharded P(data_axis, ...).
    Exact same value and gradients as ``ops.vocab.fused_softmax_ce`` on the
    gathered table (pinned in tests/test_parallel.py), including
    ``label_smoothing`` (torch CrossEntropyLoss semantics — the tuned
    reference command lines use ε 0.2–0.9). Like the unsharded op,
    ``weights`` is a NON-differentiable validity mask (no cotangent)."""
    weights = jax.lax.stop_gradient(weights)
    from ..ops.vocab import _ce_bwd_scan, _ce_fwd_scan, _on_tpu

    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    eps = float(label_smoothing)
    smooth = eps > 0
    # GLOBAL true vocab (static): the traced per-shard bound can't feed the
    # static ε/V kernel constant
    V_total = vocab_size if vocab_size is not None else W.shape[0]
    eps_over_v = eps / V_total if smooth else 0.0

    def fwd_local(x_l, W_l, lbl_l, w_l):
        from ..ops.vocab import _ce_fwd_pallas

        v0, vsz = _local_bounds(W_l, vocab_size, model_axis)
        lbl_loc = lbl_l.astype(jnp.int32) - v0
        # out-of-shard labels must match NO column (a raw offset can
        # collide with a masked padding column and pick up its -1e30)
        lbl_loc = jnp.where((lbl_loc >= 0) & (lbl_loc < vsz), lbl_loc, -1)
        if on_tpu:
            lse_l, ll_l, zs_l = _ce_fwd_pallas(
                x_l, W_l, lbl_loc, block_n, block_v, vocab_size=vsz,
                smooth=smooth,
            )
        else:
            lse_l, ll_l, zs_l = _ce_fwd_scan(
                x_l, W_l, lbl_loc, block_v, vocab_size=vsz, smooth=smooth
            )
        nll, lse_g, _ = _merged_nll(lse_l, ll_l, zs_l, eps, V_total,
                                    model_axis)
        w = w_l.astype(jnp.float32)
        num = jax.lax.psum((nll * w).sum(), data_axis)
        den = jax.lax.psum(w.sum(), data_axis)
        wsum = jnp.maximum(den, 1.0)
        return num / wsum, lse_g, jnp.reshape(wsum, (1,))

    def bwd_local(x_l, W_l, lbl_l, w_l, lse_l, coef_scale):
        from ..ops.vocab import _ce_bwd_pallas_fused

        v0, vsz = _local_bounds(W_l, vocab_size, model_axis)
        lbl_loc = lbl_l.astype(jnp.int32) - v0
        # out-of-shard labels must match NO column (a raw offset can
        # collide with a masked padding column and pick up its -1e30)
        lbl_loc = jnp.where((lbl_loc >= 0) & (lbl_loc < vsz), lbl_loc, -1)
        coef = coef_scale[0] * w_l.astype(jnp.float32)
        if on_tpu:
            dx_p, dW_l = _ce_bwd_pallas_fused(
                x_l, W_l, lbl_loc, lse_l, coef, block_n, block_v,
                vocab_size=vsz, eps=eps, eps_over_v=eps_over_v,
            )
        else:
            dx_p, dW_l = _ce_bwd_scan(
                x_l, W_l, lbl_loc, lse_l, coef, block_v, vocab_size=vsz,
                eps=eps, eps_over_v=eps_over_v,
            )
        # dx: every vocab shard contributes to every row → psum over 'model';
        # dW: every DATA shard contributes to the local rows → psum over 'data'
        return (jax.lax.psum(dx_p, model_axis),
                jax.lax.psum(dW_l, data_axis))

    data_spec = P(data_axis)
    x_spec = P(data_axis, None)
    w_spec = P(model_axis, None)

    @jax.custom_vjp
    def ce(x, W, labels, weights):
        loss, _, _ = _fwd(x, W, labels, weights)
        return loss

    def _fwd(x, W, labels, weights):
        return shard_map(
            fwd_local, mesh=mesh,
            in_specs=(x_spec, w_spec, data_spec, data_spec),
            out_specs=(P(), data_spec, P()),
            check_rep=False,
        )(x, W, labels, weights)

    def ce_fwd(x, W, labels, weights):
        loss, lse, wsum = _fwd(x, W, labels, weights)
        return loss, (x, W, labels, weights, lse, wsum)

    def ce_bwd(res, g):
        x, W, labels, weights, lse, wsum = res
        coef_scale = jnp.reshape(g / wsum[0], (1,))
        dx, dW = shard_map(
            bwd_local, mesh=mesh,
            in_specs=(x_spec, w_spec, data_spec, data_spec, data_spec, P()),
            out_specs=(x_spec, w_spec),
            check_rep=False,
        )(x, W, labels, weights, lse, coef_scale)
        return dx.astype(x.dtype), dW.astype(W.dtype), None, None

    ce.defvjp(ce_fwd, ce_bwd)
    return ce(x, W, labels, weights)


def sharded_ce_and_rank(
    x: jnp.ndarray,
    W: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    vocab_size: Optional[int] = None,
    block_n: int = 256,
    block_v: int = 4096,
    use_pallas: Optional[bool] = None,
    label_smoothing: float = 0.0,
):
    """Eval-fused vocab-parallel ``(loss, ranks)`` — the sharded analog of
    ``ops.vocab.fused_ce_and_rank`` (not differentiable). Ranks are 0-based
    counts of strictly-greater logits over the GLOBAL vocab; the label's own
    column compares bit-equal on its owning shard (the ll term comes from the
    same streamed tiles) and is never counted. ``label_smoothing`` smooths
    the reported eval loss exactly like the unsharded op (ranks unaffected)."""
    from ..ops.vocab import _ce_fwd_pallas, _ce_fwd_scan, _on_tpu, rank_counts

    on_tpu = _on_tpu() if use_pallas is None else use_pallas
    eps = float(label_smoothing)
    smooth = eps > 0
    V_total = vocab_size if vocab_size is not None else W.shape[0]

    def local(x_l, W_l, lbl_l, w_l):
        v0, vsz = _local_bounds(W_l, vocab_size, model_axis)
        lbl_loc = lbl_l.astype(jnp.int32) - v0
        # out-of-shard labels must match NO column (a raw offset can
        # collide with a masked padding column and pick up its -1e30)
        lbl_loc = jnp.where((lbl_loc >= 0) & (lbl_loc < vsz), lbl_loc, -1)
        if on_tpu:
            lse_l, ll_l, zs_l = _ce_fwd_pallas(
                x_l, W_l, lbl_loc, block_n, block_v, vocab_size=vsz,
                smooth=smooth,
            )
        else:
            lse_l, ll_l, zs_l = _ce_fwd_scan(
                x_l, W_l, lbl_loc, block_v, vocab_size=vsz, smooth=smooth
            )
        nll, _, ll_g = _merged_nll(lse_l, ll_l, zs_l, eps, V_total,
                                   model_axis)
        cnt_l = rank_counts(
            x_l, W_l, ll_g, lbl_loc, block_n, block_v,
            use_pallas=use_pallas, vocab_size=vsz,
        )
        rank_g = jax.lax.psum(cnt_l, model_axis)
        w = w_l.astype(jnp.float32)
        num = jax.lax.psum((nll * w).sum(), data_axis)
        den = jax.lax.psum(w.sum(), data_axis)
        return num / jnp.maximum(den, 1.0), rank_g

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None), P(data_axis),
                  P(data_axis)),
        out_specs=(P(), P(data_axis)),
        check_rep=False,
    )(x, W, labels, weights)


def sharded_topk(
    x: jnp.ndarray,
    W: jnp.ndarray,
    k: int,
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    vocab_size: Optional[int] = None,
    chunk: int = 32768,
    compute_dtype=None,
) -> tuple:
    """Vocab-parallel top-k of ``x @ W.T``: each shard streams a LOCAL top-k
    over its own rows (``ops.vocab.fused_topk`` on the (V/s, E) shard), then
    one all-gather of the k·shards candidate (score, id) pairs over
    ``model_axis`` and a final ``lax.top_k`` merge. Communication is
    O(N·k·shards) scalars — never the O(V·E) table gather that
    ``fused_topk`` on a row-sharded table would trigger through XLA's
    partitioner (the reference's full-vocab ``torch.topk``,
    prediction_task.py:466-470, is single-device-only by construction).

    Exact-equal to ``fused_topk`` on the gathered table: scores are bf16-GEMM
    f32 accumulations either way, and the candidate union always contains the
    true global top-k (each shard contributes its best k ≥ its share of the
    global winners). Returns ``(scores, ids)`` of shape (N, k), sharded over
    ``data_axis``."""
    import jax.numpy as _jnp

    from ..ops.vocab import fused_topk

    dtype = _jnp.bfloat16 if compute_dtype is None else compute_dtype

    def local(x_l, W_l):
        v0, vsz = _local_bounds(W_l, vocab_size, model_axis)
        s, i = fused_topk(x_l, W_l, k, chunk=chunk, vocab_size=vsz,
                          compute_dtype=dtype)
        i = i + v0  # local → global ids
        s_all = jax.lax.all_gather(s, model_axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, model_axis, axis=1, tiled=True)
        s2, pos = jax.lax.top_k(s_all, k)
        return s2, jnp.take_along_axis(i_all, pos, axis=1)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, None), P(model_axis, None)),
        out_specs=(P(data_axis, None), P(data_axis, None)),
        check_rep=False,
    )(x, W)
