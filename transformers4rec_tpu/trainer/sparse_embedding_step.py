"""O(N·E) sparse-embedding train step: no dense (V, E) table gradient, ever.

``embedding_optimizer="sparse_adam"`` replaces the item table's dense
grad→optimizer pipeline — which a 4M-row × E=64 probe measured at ~30 of 36
ms/step (dense (V, E) grad materialization ~19 ms + optimizer state traffic
~11 ms; `benchmarks/large_table_probe.py`) — with the gather/scatter update
of ``ops/sparse_update.py``:

1. The step knows every table row a sampled-softmax batch touches BEFORE
   autodiff: the input ids (``batch[item_col]``) plus the sampled negatives
   (drawn trainer-side and threaded to the task via the reserved
   ``"__neg_ids__"`` batch key → ``MaskingInfo.neg_ids``). Labels are always
   batch ids at known positions (MLM: same position; CLM: next position),
   so positive rows need no extra gather.
2. ``rows = table[all_ids]`` is gathered OUTSIDE ``value_and_grad``; the
   loss closes over a ``stop_gradient`` table and a flax method interceptor
   (``nn.intercept_methods``) redirects the model's only two table reads —
   ``SequenceEmbeddingFeatures.lookup(item_col, ids)`` and
   ``NextItemPredictionTask._sampled_logits`` — to slices of ``rows``. The
   model code itself is untouched; loss and gradients are EXACTLY the dense
   path's (pinned by tests/test_sparse_step.py: scatter(g_rows) == dense dW).
3. ``sparse_rows_adam_update`` applies lazy-Adam to the touched rows only:
   per-step table traffic is O(N·E) gathers/scatters instead of O(V·E).

Scope (validated up front): exactly one ``NextItemPredictionTask`` with
``sampled_softmax=True`` + ``weight_tying``, masking ∈ {mlm, clm, plm}
(packed or not — packed CLM labels stop at segment boundaries with zero
weight, so the position map stays valid; PLM labels sit AT the position
like MLM and the two-stream perm_mask never changes the touched-row set;
RTD is refused — its corrupted-input lookup reads generator-sampled rows
that cannot be pre-gathered), input PRE transforms limited to
StochasticSwapNoise (applied trainer-side before the row gather; POST
transforms on the embedded floats compose fine), no frozen pretrained item
table. Other (small) ``*_table`` features keep the standard
``fused_adafactor`` routing; dense params ride adamw. Works on sharded
meshes AND across processes: the whole step runs under jit on global
arrays, the row gather/scatter is partitioned by XLA against the
row-sharded table, and mu/nu inherit the table's (cross-host) sharding
(pinned by the multihost CI worker's sparse arm).

The reference has no analog (torch dense Adam over every row each step —
SURVEY.md §2.9); at the 100M-row north star a dense step is unusable, and
this path is what makes single-chip/multi-chip training of huge-vocab
sampled-softmax models feasible at speed.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.sparse_update import (
    dedupe_row_grads,
    sparse_rows_adafactor_update,
    sparse_rows_adam_update,
)

# embedding_optimizer values that route the item table through this step
SPARSE_OPTIMIZERS = ("sparse_adam", "sparse_adafactor")


class SparseAccumState(NamedTuple):
    """Gradient-accumulation carry for the sparse step (K micro-steps per
    optimizer step). The table side accumulates (ids, row-grads) — NOT a
    dense (V, E) buffer, which would reintroduce exactly the O(V·E) traffic
    and residency this path removes. At the boundary the K buffered
    micro-batches concat → ONE dedupe → one joint clip → one scatter, with
    the dense side's mean-grad update applied in the same branch — i.e.
    ``optax.MultiSteps(chain(clip, tx))`` semantics (mean over K, clip the
    mean, single inner update), pinned vs a manual reference in
    tests/test_sparse_step.py."""

    mini_step: jnp.ndarray  # int32 in [0, K)
    dense_acc: Any          # pytree like the dense grads — SUM over micro-steps
    ids_buf: jnp.ndarray    # (K, N) int32 — per-micro-step touched ids
    g_buf: jnp.ndarray      # (K, N, E) f32 — per-micro-step row grads


def sparse_accum_init(dense_tree, n_ids: int, emb_dim: int,
                      k: int) -> SparseAccumState:
    return SparseAccumState(
        mini_step=jnp.zeros((), jnp.int32),
        dense_acc=jax.tree_util.tree_map(jnp.zeros_like, dense_tree),
        ids_buf=jnp.zeros((k, n_ids), jnp.int32),
        g_buf=jnp.zeros((k, n_ids, emb_dim), jnp.float32),
    )


def find_table_path(params, item_col: str) -> Tuple:
    """Key-path of the tied item table leaf (``{item_col}_table``)."""
    needle = f"{item_col}_table"
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if getattr(leaf, "ndim", 0) == 2 and jax.tree_util.keystr(path).endswith(
            f"'{needle}']"
        ):
            return path
    raise ValueError(f"no 2-D param leaf named {needle} found")


def tree_set(tree, path, value):
    """Return ``tree`` with the leaf at key-``path`` replaced by ``value``
    (``None`` removes it from the pytree — an empty subtree)."""
    if not path:
        return value
    key = path[0].key
    rebuilt = {k: tree[k] for k in tree}
    rebuilt[key] = tree_set(tree[key], path[1:], value)
    if tree.__class__ is dict:
        return rebuilt
    return tree.__class__(rebuilt)  # FrozenDict and friends


def tree_get(tree, path):
    for p in path:
        tree = tree[p.key]
    return tree


def validate_sparse_config(model, args) -> Tuple[Any, str, str]:
    """Check the model shape ``sparse_adam`` supports; returns
    (task, item_col, masking_name)."""
    from ..masking import masking_registry
    from ..model.prediction_task import NextItemPredictionTask

    heads = list(getattr(model, "heads", ()) or ())
    tasks = [
        t for h in heads for t in h.tasks
        if isinstance(t, NextItemPredictionTask)
    ]
    if len(heads) != 1 or len(tasks) != 1:
        raise NotImplementedError(
            "sparse_adam requires exactly one head with one "
            "NextItemPredictionTask"
        )
    task = tasks[0]
    if not (task.sampled_softmax and task.weight_tying):
        raise NotImplementedError(
            "sparse_adam requires sampled_softmax=True and weight_tying=True "
            "(a full-softmax loss touches every table row — use the fused/"
            "vocab-parallel CE with 'adafactor' instead)"
        )
    im = heads[0].input_module
    item_col = getattr(im, "item_id", None)
    if item_col is None:
        raise ValueError("sparse_adam: input module has no item_id column")
    if getattr(im, "pre", None) is not None:
        # id-rewriting PRE transformations change which rows a batch touches.
        # StochasticSwapNoise (the one the reference's tuned configs use)
        # composes: the step applies it TRAINER-SIDE before the row gather
        # (it owns the augment rng) and intercepts the model's internal
        # application so the augmentation runs exactly once. Anything else
        # (param-bearing or float-space transforms as PRE) is refused.
        from ..tabular.base import parse_transformation
        from ..tabular.transformations import StochasticSwapNoise

        if not isinstance(parse_transformation(im.pre), StochasticSwapNoise):
            raise NotImplementedError(
                "sparse embedding optimizers compose with "
                "StochasticSwapNoise as the only input PRE transformation "
                f"(got {im.pre!r}): the touched-row set must be derivable "
                "trainer-side before the model runs"
            )
    cat = getattr(im, "categorical_module", None)
    fc = getattr(cat, "feature_configs", {}) or {}
    init = getattr(getattr(fc.get(item_col), "table", None), "initializer",
                   None)
    if getattr(init, "trainable", True) is False:
        # dense paths freeze the table via table_param's stop_gradient; the
        # sparse scatter-update would silently thaw it
        raise NotImplementedError(
            "sparse_adam cannot update a frozen (trainable=False) "
            "pretrained item table — use a dense embedding_optimizer"
        )
    masking = getattr(im, "masking", None)
    masking_name = None
    for key in ("clm", "mlm", "plm", "rtd"):
        if masking is not None and masking_registry.get(key) is type(masking):
            masking_name = key
            break
    if masking_name not in ("mlm", "clm", "plm"):
        # PLM composes: its labels sit AT the masked position (identity map,
        # like MLM) and the two-stream perm_mask never changes which table
        # rows a batch touches. RTD cannot: the discriminator's lookup reads
        # GENERATOR-SAMPLED corrupted ids that only exist after the model
        # runs, so the touched-row set is unknowable before the gather.
        raise NotImplementedError(
            f"sparse embedding optimizers support mlm/clm/plm masking (got "
            f"{masking_name!r}): RTD's corrupted-input lookup reads rows "
            "sampled inside the model, so they cannot be pre-gathered"
        )
    return task, item_col, masking_name


def _pos_map(masking_name: str, B: int, S: int) -> np.ndarray:
    """Flat row index (into the gathered input rows) of each label position.

    MLM and PLM labels are the item id AT the position; CLM labels are the
    NEXT position's id (the last column has no target — weight 0 — so its
    clipped map entry is never read with nonzero weight)."""
    if masking_name in ("mlm", "plm"):
        return np.arange(B * S, dtype=np.int32)
    cols = np.minimum(np.arange(S) + 1, S - 1)
    return (np.arange(B)[:, None] * S + cols[None, :]).reshape(-1).astype(
        np.int32
    )


def make_interceptor(rows: jnp.ndarray, item_col: str, n_in: int,
                     pos_map: jnp.ndarray, neg_ids: jnp.ndarray,
                     neg_base: int = None, aug_inputs=None):
    """Flax method interceptor redirecting the two item-table reads to the
    pre-gathered ``rows``.

    Row layout: ``[lookup rows (n_in) | label rows (only when the lookup ids
    differ from the label ids, i.e. under SSN) | negatives]``. ``pos_map``
    must already be offset into the label region; ``neg_base`` is where the
    negatives start (default ``n_in`` — the no-augmentation layout).

    ``aug_inputs`` (a TabularData dict) additionally intercepts the input
    module's StochasticSwapNoise PRE transform and substitutes this
    TRAINER-computed augmentation — the step draws the swap noise itself so
    the touched-row set (the augmented ids) is known before the model runs;
    the model's internal draw is suppressed, so the augmentation happens
    exactly once. Only the PRE application is matched (inputs still carry
    INT ids there; a post-embedding SSN sees floats and passes through)."""
    if neg_base is None:
        neg_base = n_in
    from ..tabular.transformations import StochasticSwapNoise

    def interceptor(next_fun, args, kwargs, context):
        name = context.method_name
        # isinstance (not a name match): validate_sparse_config admits
        # subclasses, and an un-intercepted subclass would draw its OWN
        # augmentation while the lookup still returns the trainer-draw rows
        if (aug_inputs is not None and name == "__call__"
                and isinstance(context.module, StochasticSwapNoise)
                and args and isinstance(args[0], dict)
                and item_col in args[0]
                and jnp.issubdtype(args[0][item_col].dtype, jnp.integer)):
            return {k: aug_inputs.get(k, v) for k, v in args[0].items()}
        if name == "lookup" and args and args[0] == item_col:
            m = context.module
            ids = args[1]
            emb = rows[:n_in].reshape(*ids.shape, -1)
            if m.mask_padding:
                emb = emb * (ids != m.padding_idx)[..., None].astype(emb.dtype)
            return emb
        if name == "_sampled_logits":
            m = context.module
            rng, x2d, labels, W = args
            del rng  # negatives are pre-drawn
            pos_w = rows[pos_map]
            neg_w = rows[neg_base:]
            sampler = m.make_sampler(W.shape[0])
            # NB kwargs.get's default only covers a MISSING key — an
            # explicit neg_ids=None must still fall back to the pre-drawn set
            kw_neg = kwargs.get("neg_ids")
            return m._sampled_scores(x2d, labels, pos_w, neg_w,
                                     neg_ids if kw_neg is None else kw_neg,
                                     sampler)
        return next_fun(*args, **kwargs)

    return interceptor


def make_sparse_one_step(model, args, table_path, item_col: str,
                         masking_name: str, sampler, dense_tx,
                         schedule, rule: str = "adam"):
    """Build the sparse-embedding single train step — same contract as
    Trainer._make_one_train_step's inner fn: ``(TrainState, batch) →
    (TrainState, loss)`` (lax.scan-packable).

    ``rule`` selects the touched-rows update: ``"adam"`` (lazy Adam —
    ``embedding_optimizer="sparse_adam"``) or ``"adafactor"`` (lazy
    UNfactored adafactor, the repo's quality-default table rule —
    ``"sparse_adafactor"``)."""
    from .trainer import TrainState

    clip = args.max_grad_norm if args.max_grad_norm and args.max_grad_norm > 0 \
        else None
    K = int(getattr(args, "gradient_accumulation_steps", 1) or 1)
    im = model.heads[0].input_module
    pre_tf = None
    if getattr(im, "pre", None) is not None:
        from ..tabular.base import parse_transformation

        pre_tf = parse_transformation(im.pre)  # SSN (validated)
    pad_idx = getattr(im, "padding_idx", 0)

    def _apply(dense_tree, table, dense_opt, sparse_st, gd, uids, g_sum):
        """Joint clip + dense update + sparse scatter (one optimizer step).
        ``uids``/``g_sum`` must already be deduped — the clip global norm
        must match the dense path's, where duplicate rows' contributions are
        SUMMED in dW before the norm (||partials||² != ||sums||²)."""
        if clip is not None:
            gn = optax.global_norm((gd, g_sum))
            scale = jnp.minimum(1.0, clip / jnp.maximum(gn, 1e-12))
            gd = jax.tree_util.tree_map(lambda g: g * scale, gd)
            g_sum = g_sum * scale
        updates, dense_opt = dense_tx.update(gd, dense_opt, dense_tree)
        new_dense = optax.apply_updates(dense_tree, updates)
        if rule == "adafactor":
            new_table, sparse_st = sparse_rows_adafactor_update(
                table, sparse_st, uids, g_sum, schedule, deduped=True,
            )
        else:
            new_table, sparse_st = sparse_rows_adam_update(
                table, sparse_st, uids, g_sum, schedule,
                b1=args.adam_beta1, b2=args.adam_beta2,
                eps=args.adam_epsilon, deduped=True,
            )
        return new_dense, new_table, dense_opt, sparse_st

    def one_step(state: TrainState, batch):
        rng, new_rng = jax.random.split(state.rng)
        r = {
            "masking": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
            "sampling": jax.random.fold_in(rng, 2),
            "augment": jax.random.fold_in(rng, 3),
        }
        neg = sampler.sample(jax.random.fold_in(rng, 4))

        item_ids = batch[item_col]
        B, S = item_ids.shape
        ids_in = item_ids.reshape(-1).astype(jnp.int32)
        n_in = B * S
        pmap = jnp.asarray(_pos_map(masking_name, B, S))
        aug = None
        if pre_tf is not None:
            # trainer-side StochasticSwapNoise: the lookup reads AUGMENTED
            # ids while labels stay the ORIGINAL ids (the input module
            # captures item_ids BEFORE its pre transform — features/
            # sequence.py), so the gather carries both row sets
            aug = pre_tf.apply(
                {}, batch, training=True, pad_mask=(item_ids != pad_idx),
                rngs={"augment": r["augment"]},
            )
            aug_ids = aug[item_col].reshape(-1).astype(jnp.int32)
            all_ids = jnp.concatenate([aug_ids, ids_in,
                                       neg.astype(jnp.int32)])
            pmap = pmap + n_in  # labels live in the second region
            neg_base = 2 * n_in
        else:
            all_ids = jnp.concatenate([ids_in, neg.astype(jnp.int32)])
            neg_base = n_in

        table = tree_get(state.params, table_path)
        rows = jnp.take(table, all_ids, axis=0)
        dense_tree = tree_set(state.params, table_path, None)
        batch2 = {**batch, "__neg_ids__": neg}

        def loss_fn(dense_tree, rows):
            params_full = tree_set(
                dense_tree, table_path, jax.lax.stop_gradient(table)
            )
            with nn.intercept_methods(
                make_interceptor(rows, item_col, n_in, pmap, neg,
                                 neg_base=neg_base, aug_inputs=aug)
            ):
                loss, _ = model.apply(
                    params_full, batch2, targets=batch2, training=True,
                    compute_metrics=False, rngs=r,
                )
            return loss

        loss, (gd, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_tree, rows
        )
        V = table.shape[0]
        if K == 1:
            uids, g_sum = dedupe_row_grads(all_ids, g_rows, V)
            new_dense, new_table, dense_opt, sparse_state = _apply(
                dense_tree, table, state.opt_state[0], state.opt_state[1],
                gd, uids, g_sum,
            )
            params = tree_set(new_dense, table_path, new_table)
            return (
                TrainState(params=params,
                           opt_state=(dense_opt, sparse_state),
                           step=state.step + 1, rng=new_rng),
                loss,
            )

        # ---- gradient accumulation (K micro-steps per optimizer step):
        # buffer this micro-step's (ids, row grads), sum the dense grads;
        # at the boundary: concat → one dedupe → one joint clip → one
        # scatter + dense mean-grad update (optax.MultiSteps semantics)
        acc: SparseAccumState = state.opt_state[2]
        i = acc.mini_step
        ids_buf = jax.lax.dynamic_update_index_in_dim(
            acc.ids_buf, all_ids, i, 0)
        g_buf = jax.lax.dynamic_update_index_in_dim(
            acc.g_buf, g_rows.astype(acc.g_buf.dtype), i, 0)
        dense_acc = jax.tree_util.tree_map(
            lambda a, g: a + g.astype(a.dtype), acc.dense_acc, gd)
        boundary = (i + 1) >= K

        def at_boundary(op):
            dense_tree, table, dense_opt, sparse_st, dense_acc, ids_b, g_b = op
            mean_gd = jax.tree_util.tree_map(lambda a: a / K, dense_acc)
            uids, g_sum = dedupe_row_grads(
                ids_b.reshape(-1), g_b.reshape(-1, g_b.shape[-1]) / K, V)
            new_dense, new_table, dense_opt, sparse_st = _apply(
                dense_tree, table, dense_opt, sparse_st, mean_gd, uids, g_sum,
            )
            zero_acc = jax.tree_util.tree_map(jnp.zeros_like, dense_acc)
            return (new_dense, new_table, dense_opt, sparse_st, zero_acc,
                    jnp.zeros((), jnp.int32))

        def mid_accum(op):
            dense_tree, table, dense_opt, sparse_st, dense_acc, ids_b, g_b = op
            return (dense_tree, table, dense_opt, sparse_st, dense_acc, i + 1)

        new_dense, new_table, dense_opt, sparse_state, dense_acc, mini = (
            jax.lax.cond(
                boundary, at_boundary, mid_accum,
                (dense_tree, table, state.opt_state[0], state.opt_state[1],
                 dense_acc, ids_buf, g_buf),
            )
        )
        params = tree_set(new_dense, table_path, new_table)
        new_acc = SparseAccumState(mini_step=mini, dense_acc=dense_acc,
                                   ids_buf=ids_buf, g_buf=g_buf)
        return (
            TrainState(params=params,
                       opt_state=(dense_opt, sparse_state, new_acc),
                       step=state.step + 1, rng=new_rng),
            loss,
        )

    return one_step
