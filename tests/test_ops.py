"""Fused vocab-op tests (scan fallback on CPU; the same code path the Pallas
kernels mirror — kernel-vs-fallback equivalence is exercised on TPU by bench
and verified manually against f32-accumulation references)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformers4rec_tpu.ops import fused_label_rank, fused_softmax_ce, fused_topk

N, V, E = 64, 1000, 32


@pytest.fixture(scope="module")
def data():
    x = jax.random.normal(jax.random.PRNGKey(0), (N, E), jnp.float32)
    W = jax.random.normal(jax.random.PRNGKey(1), (V, E), jnp.float32) * 0.05
    labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, V)
    weights = (jax.random.uniform(jax.random.PRNGKey(3), (N,)) > 0.4).astype(jnp.float32)
    return x, W, labels, weights


def _ref_logits(x, W):
    return jnp.einsum(
        "ne,ve->nv", x.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def test_fused_ce_matches_reference(data):
    x, W, labels, weights = data
    logits = _ref_logits(x, W)
    lp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
    ref = (nll * weights).sum() / weights.sum()
    got = fused_softmax_ce(x, W, labels, weights, 64, 256)
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-4)


def test_fused_ce_gradients_match(data):
    x, W, labels, weights = data

    def ref_fn(x_, W_):
        lp = jax.nn.log_softmax(_ref_logits(x_, W_))
        nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
        return (nll * weights).sum() / weights.sum()

    gx_ref, gW_ref = jax.grad(ref_fn, argnums=(0, 1))(x, W)
    gx, gW = jax.grad(
        lambda a, b: fused_softmax_ce(a, b, labels, weights, 64, 256),
        argnums=(0, 1),
    )(x, W)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gW), np.asarray(gW_ref), rtol=2e-2, atol=1e-5)


def test_fused_ce_zero_weight_rows_ignored(data):
    x, W, labels, _ = data
    w1 = jnp.ones((N,)).at[10:].set(0.0)
    got = fused_softmax_ce(x, W, labels, w1, 64, 256)
    ref = fused_softmax_ce(x[:10], W, labels[:10], jnp.ones((10,)), 64, 256)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_fused_label_rank_exact(data):
    x, W, labels, _ = data
    logits = _ref_logits(x, W)
    ll = jnp.take_along_axis(logits, labels[:, None], 1)
    ref = (logits > ll).sum(axis=1)
    got = fused_label_rank(x, W, labels, 64, 256)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_topk_matches_direct(data):
    x, W, labels, _ = data
    logits = _ref_logits(x, W)
    rs, ri = jax.lax.top_k(logits, 10)
    ts, ti = fused_topk(x, W, 10, chunk=256)
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))


def test_fused_ce_nondivisible_vocab():
    """V not a multiple of the block: padded tail must not leak into loss."""
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
    W = jax.random.normal(jax.random.PRNGKey(1), (777, 16)) * 0.1
    labels = jnp.asarray([0, 1, 775, 776, 3, 4, 5, 6])
    w = jnp.ones((8,))
    lp = jax.nn.log_softmax(_ref_logits(x, W))
    ref = -jnp.take_along_axis(lp, labels[:, None], 1).mean()
    got = fused_softmax_ce(x, W, labels, w, 8, 256)
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-4)


def test_loss_budget_training_path():
    """MLM loss-budget gather must keep the loss close to the full-position
    loss when the budget covers all targets."""
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=300, num_categories=20, max_session_length=10
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=8, max_session_length=10, seed=0).items()
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    ar = {k: v for k, v in rngs.items() if k != "params"}

    def build(budget):
        im = tr.TabularSequenceFeatures.from_schema(
            schema, d_output=16, masking="mlm", aggregation="concat"
        )
        cfg = tr.transformer_registry.parse("bert").build(16, 2, 1, 10, dropout=0.0)
        return cfg.to_model(
            im, tr.NextItemPredictionTask(weight_tying=True, loss_budget=budget)
        )

    m_full = build(1.0)
    m_budget = build(0.9)  # ≥ any possible target count
    params = m_full.init(rngs, batch, training=True)
    l_full, _ = m_full.apply(params, batch, training=True, rngs=ar)
    l_budget, _ = m_budget.apply(params, batch, training=True, rngs=ar)
    np.testing.assert_allclose(float(l_full), float(l_budget), rtol=1e-5)


def test_head_sets_mlm_loss_budget():
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import synthetic_ecommerce_data_schema

    schema = synthetic_ecommerce_data_schema(num_items=100, num_categories=10)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},
    )
    head = tr.Head.from_body(input_module=im, transformer="bert")
    task = head.tasks[0]
    # adaptive 6-sigma budget: target prob propagated, resolved per-N at
    # trace time (prediction_task._budget_rows)
    np.testing.assert_allclose(task.budget_target_prob, 0.3, rtol=1e-6)
    assert task.loss_budget is None
    assert task._budget_rows(2560) < int(2560 * 0.7)
    # CLM: no budget
    im2 = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="clm", aggregation="concat"
    )
    head2 = tr.Head.from_body(input_module=im2, transformer="gpt2")
    assert head2.tasks[0].loss_budget is None
    assert head2.tasks[0].budget_target_prob is None


def test_fused_ce_and_rank_matches_separate_ops(data):
    """Single-pass eval op == fused_softmax_ce + fused_label_rank."""
    from transformers4rec_tpu.ops import (
        fused_ce_and_rank,
        fused_label_rank,
        fused_softmax_ce,
    )

    x, W, labels, weights = data
    loss, rank = fused_ce_and_rank(x, W, labels, weights)
    ref_loss = fused_softmax_ce(x, W, labels, weights)
    ref_rank = fused_label_rank(x, W, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=5e-3)
    np.testing.assert_array_equal(np.asarray(rank), np.asarray(ref_rank))


def test_fused_ce_and_rank_vs_dense_reference(data):
    """Ranks/loss vs an explicit dense softmax + sort."""
    from transformers4rec_tpu.ops import fused_ce_and_rank

    x, W, labels, weights = data
    loss, rank = fused_ce_and_rank(x, W, labels, weights)
    logits = _ref_logits(x, W)
    dense_rank = (logits > jnp.take_along_axis(
        logits, labels[:, None], axis=1)).sum(axis=1)
    # exclude self-column semantics match: label column never counted
    np.testing.assert_array_equal(np.asarray(rank), np.asarray(dense_rank))
    lp = jax.nn.log_softmax(logits)
    dense_loss = -(jnp.take_along_axis(lp, labels[:, None], 1)[:, 0] * weights
                   ).sum() / weights.sum()
    np.testing.assert_allclose(float(loss), float(dense_loss), rtol=5e-3)


def test_vocab_size_bound_masks_padded_table_rows(data):
    """Shard-padded tables (features/embedding.py vocab_padding_multiple):
    ops with vocab_size=V over a padded (V+pad, E) table must equal the ops
    over the unpadded table — loss, grads, ranks, and top-k ids."""
    from transformers4rec_tpu.ops import fused_ce_and_rank

    x, W, labels, weights = data
    Wpad = jnp.concatenate(
        [W, 10.0 * jnp.ones((7, W.shape[1]))], axis=0  # large junk rows
    )

    ref = fused_softmax_ce(x, W, labels, weights, 64, 256)
    got = fused_softmax_ce(x, Wpad, labels, weights, 64, 256, None, V)
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-6)

    g_ref = jax.grad(lambda w_: fused_softmax_ce(x, w_, labels, weights, 64, 256))(W)
    g_pad = jax.grad(
        lambda w_: fused_softmax_ce(x, w_, labels, weights, 64, 256, None, V)
    )(Wpad)
    np.testing.assert_allclose(np.asarray(g_pad[:V]), np.asarray(g_ref), atol=1e-7)
    assert float(jnp.abs(g_pad[V:]).max()) == 0.0  # padded rows: zero grad

    r_ref = fused_label_rank(x, W, labels, 64, 256)
    r_pad = fused_label_rank(x, Wpad, labels, 64, 256, vocab_size=V)
    np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(r_pad))

    _, cr_pad = fused_ce_and_rank(x, Wpad, labels, weights, 64, 256, vocab_size=V)
    np.testing.assert_array_equal(np.asarray(r_ref), np.asarray(cr_pad))

    ts, ti = fused_topk(x, W, 5, chunk=256)
    ps, pi = fused_topk(x, Wpad, 5, chunk=256, vocab_size=V)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(pi))
    assert int(np.asarray(pi).max()) < V


def test_model_topk_never_returns_padded_ids():
    """End-to-end: padded item table (vocab_padding_multiple=8) must never
    surface a padded id in top-k predictions, and target_dim reflects the
    true vocab."""
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    num_items = 333  # true vocab 334; padded table 336
    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=10, max_session_length=8
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=8, max_session_length=8, seed=0).items()
    }
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(16, 2, 1, 8)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    assert model.heads[0].tasks[0].target_dim == num_items + 1
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, batch, training=True)
    table = [
        l for p, l in jax.tree_util.tree_leaves_with_path(params)
        if "item_id_table" in jax.tree_util.keystr(p)
    ][0]
    assert table.shape[0] == 336 and table.shape[0] % 8 == 0

    scores = model.apply(params, batch)
    assert scores.shape == (8, num_items + 1)  # true vocab, not padded
    s, ids = model.apply(params, batch, top_k=20)
    assert int(np.asarray(ids).max()) < num_items + 1


def test_fused_ce_label_smoothing_matches_reference(data):
    """Label-smoothed fused CE == dense torch-semantics reference
    ((1−ε)·nll + ε·mean(−log_probs)), value AND both gradients — smoothing
    rides the streamed kernels (extra sum-of-logits accumulator; bwd residual
    P − y_smooth), it must NOT silently fall back to (N, V) logits."""
    x, W, labels, weights = data
    eps = 0.1

    def ref_fn(x_, W_):
        lp = jax.nn.log_softmax(_ref_logits(x_, W_))
        nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
        smooth = -lp.mean(axis=-1)
        per = (1.0 - eps) * nll + eps * smooth
        return (per * weights).sum() / weights.sum()

    ref = ref_fn(x, W)
    got = fused_softmax_ce(x, W, labels, weights, 64, 256,
                           label_smoothing=eps)
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-4)

    gx_ref, gW_ref = jax.grad(ref_fn, argnums=(0, 1))(x, W)
    gx, gW = jax.grad(
        lambda a, b: fused_softmax_ce(a, b, labels, weights, 64, 256,
                                      label_smoothing=eps),
        argnums=(0, 1),
    )(x, W)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=2e-2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gW), np.asarray(gW_ref), rtol=2e-2, atol=1e-5)


def test_fused_ce_and_rank_label_smoothing(data):
    """Eval-fused CE+rank with ε>0: loss matches the smoothed reference,
    ranks are unaffected by smoothing."""
    from transformers4rec_tpu.ops import fused_ce_and_rank

    x, W, labels, weights = data
    eps = 0.2
    loss, rank = fused_ce_and_rank(x, W, labels, weights, label_smoothing=eps)
    loss0, rank0 = fused_ce_and_rank(x, W, labels, weights)
    np.testing.assert_array_equal(np.asarray(rank), np.asarray(rank0))

    lp = jax.nn.log_softmax(_ref_logits(x, W))
    nll = -jnp.take_along_axis(lp, labels[:, None], 1)[:, 0]
    per = (1.0 - eps) * nll + eps * (-lp.mean(axis=-1))
    ref = (per * weights).sum() / weights.sum()
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-4)
    assert abs(float(loss) - float(loss0)) > 1e-4  # smoothing changed the loss


def test_fused_ce_label_smoothing_respects_vocab_size_bound(data):
    """Padded table rows (vocab_size < W.shape[0]) are excluded from the
    smoothing mass: loss and dW match the unpadded computation, and padded
    rows get exactly zero gradient."""
    x, W, labels, weights = data
    eps = 0.15
    Wpad = jnp.concatenate([W, jnp.ones((24, E), W.dtype) * 7.0], axis=0)
    ref = fused_softmax_ce(x, W, labels, weights, 64, 256,
                           label_smoothing=eps)
    got = fused_softmax_ce(x, Wpad, labels, weights, 64, 256, None, V,
                           label_smoothing=eps)
    np.testing.assert_allclose(float(ref), float(got), rtol=1e-5)
    g_pad = jax.grad(
        lambda w_: fused_softmax_ce(x, w_, labels, weights, 64, 256, None, V,
                                    label_smoothing=eps)
    )(Wpad)
    np.testing.assert_array_equal(np.asarray(g_pad[V:]), 0.0)
    g_ref = jax.grad(
        lambda w_: fused_softmax_ce(x, w_, labels, weights, 64, 256,
                                    label_smoothing=eps)
    )(W)
    np.testing.assert_allclose(np.asarray(g_pad[:V]), np.asarray(g_ref),
                               rtol=2e-2, atol=1e-5)
