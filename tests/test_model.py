"""Model-layer tests: tasks, head, metrics, losses, end-to-end fit.

Mirrors the reference's model tests
(/root/reference/tests/unit/torch/model/test_model.py:33-444,
 tests/unit/torch/test_ranking_metrics.py) on synthetic batches.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.model import (
    LogUniformSampler,
    NDCGAt,
    RecallAt,
    MeanReciprocalRankAt,
    compute_batch_metrics,
    cross_entropy_with_logits,
    finalize_metrics,
    init_metric_state,
    label_ranks,
    update_metric_state,
)

RNGS = {
    "params": jax.random.PRNGKey(0),
    "masking": jax.random.PRNGKey(1),
    "dropout": jax.random.PRNGKey(2),
    "sampling": jax.random.PRNGKey(3),
}
APPLY_RNGS = {k: v for k, v in RNGS.items() if k != "params"}


@pytest.fixture(scope="module")
def jbatch(request):
    from transformers4rec_tpu.data.synthetic import synthetic_data, synthetic_ecommerce_data_schema

    schema = synthetic_ecommerce_data_schema(
        num_items=1000, num_categories=50, max_session_length=20
    )
    data = synthetic_data(schema, num_rows=16, max_session_length=20, seed=3)
    return schema, {k: jnp.asarray(v) for k, v in data.items()}


def _build(schema, masking="mlm", arch="xlnet", **task_kwargs):
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=48, masking=masking, aggregation="concat"
    )
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=48, n_head=4, n_layer=2, total_seq_length=20
    )
    task_kwargs.setdefault("weight_tying", True)
    return cfg.to_model(im, tr.NextItemPredictionTask(**task_kwargs))


# ---------------------------------------------------------------- metrics
def test_label_ranks_and_metrics_exact():
    scores = jnp.asarray(
        [
            [0.1, 0.9, 0.5, 0.0],  # label 1 at rank 0
            [0.8, 0.1, 0.2, 0.0],  # label 2 at rank 1 (0.2 is 2nd highest)
            [0.9, 0.8, 0.7, 0.0],  # label 3 at rank 3 -> outside top-3
        ]
    )
    labels = jnp.asarray([1, 2, 3])
    ranks = label_ranks(scores, labels, 3)
    np.testing.assert_array_equal(np.asarray(ranks), [0, 1, 3])

    out = compute_batch_metrics(
        scores, labels, [NDCGAt(top_ks=(3,)), RecallAt(top_ks=(3,)), MeanReciprocalRankAt(top_ks=(3,))]
    )
    recall_sum, count = out["recall_at_3"]
    assert float(count) == 3.0 and float(recall_sum) == 2.0
    mrr_sum, _ = out["mrr_at_3"]
    np.testing.assert_allclose(float(mrr_sum), 1.0 + 1.0 / 2.0, rtol=1e-6)
    ndcg_sum, _ = out["ndcg_at_3"]
    np.testing.assert_allclose(
        float(ndcg_sum), 1.0 + 1.0 / np.log2(3.0), rtol=1e-6
    )


def test_all_metrics_match_textbook_oracle():
    """Randomized cross-check of all six metric families against an
    independent numpy oracle computed from the ranked relevance vector
    (the reference's one-hot/torchmetrics formulation — ranking_metric.py
    :73-319) rather than from the label rank."""
    from transformers4rec_tpu.model.ranking_metric import (
        AvgPrecisionAt,
        DCGAt,
        PrecisionAt,
    )

    rng = np.random.default_rng(0)
    N, V = 64, 50
    ks = (1, 3, 10)
    # per-row permutation scores: all-distinct values, no tie ambiguity
    scores = np.stack([rng.permutation(V).astype(np.float32) for _ in range(N)])
    labels = rng.integers(0, V, size=N)
    metrics = [
        PrecisionAt(top_ks=ks), RecallAt(top_ks=ks), AvgPrecisionAt(top_ks=ks),
        DCGAt(top_ks=ks), NDCGAt(top_ks=ks), MeanReciprocalRankAt(top_ks=ks),
    ]
    out = compute_batch_metrics(jnp.asarray(scores), jnp.asarray(labels), metrics)

    want = {m.key(k): 0.0 for m in metrics for k in ks}
    for i in range(N):
        order = np.argsort(-scores[i], kind="stable")
        rel = (order == labels[i]).astype(np.float64)  # ranked relevance
        for k in ks:
            top = rel[:k]
            hits = top.sum()  # 0 or 1 (single relevant item)
            p_at_i = np.cumsum(top) / (np.arange(k) + 1.0)
            first_hit = np.nonzero(top)[0]
            want[f"precision_at_{k}"] += hits / k
            want[f"recall_at_{k}"] += hits
            want[f"avg_precision_at_{k}"] += float((p_at_i * top).sum())
            dcg = float((top / np.log2(np.arange(k) + 2.0)).sum())
            want[f"dcg_at_{k}"] += dcg
            want[f"ndcg_at_{k}"] += dcg  # ideal DCG for one relevant item = 1
            want[f"mrr_at_{k}"] += 1.0 / (first_hit[0] + 1.0) if len(first_hit) else 0.0

    for name, (s, c) in out.items():
        assert float(c) == N
        np.testing.assert_allclose(float(s), want[name], rtol=1e-5, err_msg=name)


def test_metric_weights_ignore_invalid_rows():
    scores = jnp.asarray([[0.9, 0.1], [0.9, 0.1]])
    labels = jnp.asarray([0, 0])
    w = jnp.asarray([1.0, 0.0])
    out = compute_batch_metrics(scores, labels, [RecallAt(top_ks=(1,))], weights=w)
    s, c = out["recall_at_1"]
    assert float(s) == 1.0 and float(c) == 1.0


def test_streaming_metric_state():
    state = init_metric_state([RecallAt(top_ks=(2,))])
    b1 = {"recall_at_2": (jnp.asarray(1.0), jnp.asarray(2.0))}
    b2 = {"recall_at_2": (jnp.asarray(2.0), jnp.asarray(2.0))}
    state = update_metric_state(state, b1)
    state = update_metric_state(state, b2)
    final = finalize_metrics(state)
    np.testing.assert_allclose(float(final["recall_at_2"]), 0.75)


# ----------------------------------------------------------------- losses
def test_masked_ce_matches_manual():
    logits = jax.random.normal(jax.random.PRNGKey(0), (4, 7))
    labels = jnp.asarray([1, 2, 3, 4])
    w = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    got = cross_entropy_with_logits(logits, labels, weights=w)
    lp = jax.nn.log_softmax(logits)
    manual = -(lp[0, 1] + lp[1, 2] + lp[3, 4]) / 3.0
    np.testing.assert_allclose(float(got), float(manual), rtol=1e-6)


def test_label_smoothing_increases_loss_on_confident_logits():
    logits = jnp.asarray([[10.0, -10.0, -10.0]])
    labels = jnp.asarray([0])
    plain = cross_entropy_with_logits(logits, labels)
    smooth = cross_entropy_with_logits(logits, labels, label_smoothing=0.2)
    assert float(smooth) > float(plain)


# ----------------------------------------------------------------- sampler
def test_log_uniform_sampler_distribution():
    s = LogUniformSampler(max_n_samples=64, max_id=1000, min_id=1)
    ids = s.sample(jax.random.PRNGKey(0))
    assert ids.shape == (64,)
    assert int(ids.min()) >= 1 and int(ids.max()) < 1000
    # pmf sums to ~1 over the range
    all_ids = jnp.arange(1, 1000)
    np.testing.assert_allclose(float(s.probs(all_ids).sum()), 1.0, rtol=1e-3)
    # popular (low) ids are more likely
    assert float(s.probs(jnp.asarray([1]))[0]) > float(s.probs(jnp.asarray([500]))[0])
    # expected-count correction is monotone in p and ≤ 1
    ep = s.expected_probs(all_ids)
    assert float(ep.max()) <= 1.0 and float(ep[0]) > float(ep[-1])


def test_log_uniform_sampler_large_vocab_f32_stable():
    """Regression: at REES46 scale (390k ids) the naive log(r+2)-log(r+1)
    cancels catastrophically in f32 and rounded NEGATIVE on TPU, sending
    log(expected_probs) to NaN in the sampled-softmax loss. The log1p form
    must stay strictly positive all the way to the last id."""
    V = 390_000
    s = LogUniformSampler(max_n_samples=8192, max_id=V, min_id=1)
    # evaluate in f32 exactly as the model does, on the worst (largest) ids
    ids = jnp.asarray([1, 1000, V // 2, V - 2, V - 1], jnp.int32)
    p = s.probs(ids)
    assert bool((p > 0).all()), np.asarray(p)
    ep = s.expected_probs(ids)
    assert bool((ep > 0).all()) and bool((ep <= 1.0).all()), np.asarray(ep)
    assert not bool(jnp.isnan(jnp.log(ep)).any())


# ------------------------------------------------------------- model paths
def test_model_train_test_inference_shapes(jbatch):
    schema, batch = jbatch
    model = _build(schema)
    params = model.init(RNGS, batch, training=True)
    loss, outs = model.apply(params, batch, training=True, rngs=APPLY_RNGS)
    assert loss.shape == () and float(loss) > 0
    loss_t, outs_t = model.apply(params, batch, testing=True)
    assert outs_t["next-item"].metrics is not None
    scores = model.apply(params, batch)
    assert scores.shape == (16, 1001)
    s, ids = model.apply(params, batch, top_k=5)
    assert s.shape == (16, 5) and ids.shape == (16, 5)


def test_weight_tying_shares_gradients(jbatch):
    schema, batch = jbatch
    model = _build(schema, masking="clm", arch="gpt2")
    params = model.init(RNGS, batch, training=True)
    flat = jax.tree_util.tree_leaves_with_path(params)
    # tied → no separate output_layer param
    assert not any("output_layer" in jax.tree_util.keystr(p) for p, _ in flat)

    def lossfn(p):
        l, _ = model.apply(p, batch, training=True, rngs=APPLY_RNGS)
        return l

    grads = jax.grad(lossfn)(params)
    table_grads = [
        g for p, g in jax.tree_util.tree_leaves_with_path(grads)
        if "item_id_table" in jax.tree_util.keystr(p)
    ]
    assert len(table_grads) == 1
    assert float(jnp.abs(table_grads[0]).sum()) > 0


def test_untied_has_output_layer(jbatch):
    schema, batch = jbatch
    model = _build(schema, weight_tying=False, target_dim=1001)
    params = model.init(RNGS, batch, training=True)
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("output_layer" in jax.tree_util.keystr(p) for p, _ in flat)


def test_sampled_softmax_trains(jbatch):
    schema, batch = jbatch
    model = _build(schema, masking="clm", arch="gpt2",
                   sampled_softmax=True, max_n_samples=50)
    params = model.init(RNGS, batch, training=True)
    loss, _ = model.apply(params, batch, training=True, rngs=APPLY_RNGS)
    assert np.isfinite(float(loss))


def test_model_overfits_tiny_batch(jbatch):
    """A few optimizer steps must reduce the training loss (end-to-end grads)."""
    import optax

    schema, batch = jbatch
    model = _build(schema, masking="clm", arch="gpt2")
    params = model.init(RNGS, batch, training=True)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        r = {"masking": rng, "dropout": rng, "sampling": rng}
        def lossfn(pp):
            l, _ = model.apply(pp, batch, training=True, rngs=r)
            return l
        l, g = jax.value_and_grad(lossfn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(12):
        rng, sub = jax.random.split(rng)
        params, opt_state, l = step(params, opt_state, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.5, losses


def test_masking_arch_compat_enforced(jbatch):
    schema, batch = jbatch
    model = _build(schema, masking="mlm", arch="gpt2")
    with pytest.raises(ValueError, match="not supported"):
        model.init(RNGS, batch, training=True)


def test_binary_classification_and_regression_tasks(jbatch):
    schema, batch = jbatch
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("bert").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=20
    )
    head = tr.Head.from_body(
        input_module=im,
        transformer=cfg,
        tasks=[
            tr.BinaryClassificationTask(task_name="click", target_name="click"),
            tr.RegressionTask(task_name="play_time", target_name="play_time"),
        ],
        task_weights=[1.0, 0.5],
    )
    model = tr.Model(heads=(head,))
    targets = {
        "click": jnp.asarray(np.random.default_rng(0).integers(0, 2, 16)),
        "play_time": jnp.asarray(np.random.default_rng(1).uniform(0, 1, 16), jnp.float32),
    }
    params = model.init(RNGS, batch, targets, training=True)
    loss, outs = model.apply(params, batch, targets, training=True, rngs=APPLY_RNGS)
    assert np.isfinite(float(loss))
    assert "click" in outs and "play_time" in outs
    assert outs["click"].metrics is not None


def test_multi_task_head_weights(jbatch):
    schema, batch = jbatch
    model = _build(schema)
    params = model.init(RNGS, batch, training=True)
    # input/output schema for serving export
    in_schema = model.input_schema
    assert "item_id" in in_schema.column_names
    out_schema = model.bind(params).output_schema
    assert len(out_schema) >= 1


def test_mlm_inference_uses_extended_position(jbatch):
    """MLM inference appends one [MASK]; predictions must come from index
    non_pad.sum() (reference prediction_task.py:453-461)."""
    schema, batch = jbatch
    model = _build(schema, masking="mlm")
    params = model.init(RNGS, batch, training=True)
    scores = model.apply(params, batch)
    assert scores.shape == (16, 1001)
    assert np.isfinite(np.asarray(scores)).all()


def test_model_save_load_roundtrip(jbatch, tmp_path):
    """reference Model.save/load (model/base.py:839-922): params persisted,
    architecture rebuilt by the caller."""
    schema, batch = jbatch
    model = _build(schema)
    params = model.init(RNGS, batch, training=True)
    model.save(str(tmp_path / "m"), params)

    model2 = _build(schema)
    fresh = model2.init(
        {**RNGS, "params": jax.random.PRNGKey(42)}, batch, training=True
    )
    restored = model2.load(str(tmp_path / "m"), fresh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(params), jax.device_get(restored),
    )
    # restored params produce identical eval loss
    l1, _ = model.apply(params, batch, testing=True)
    l2, _ = model2.apply(restored, batch, testing=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_model_fit_evaluate_self_contained(jbatch):
    """reference Model.fit/evaluate self-contained loops (model/base.py:669-739):
    trainer-free path — fit reduces loss across epochs, evaluate returns
    flattened metric keys."""
    from transformers4rec_tpu.data.loader import SyntheticDataLoader

    schema, _ = jbatch
    model = _build(schema, masking="clm", arch="gpt2")
    loader = SyntheticDataLoader.from_schema(
        schema, batch_size=16, max_sequence_length=20, num_rows=64, seed=5
    )
    params, losses = model.fit(loader, num_epochs=4, rng=jax.random.PRNGKey(7))
    assert len(losses) == 4
    assert losses[-1] < losses[0]

    # continue training from returned params: loss keeps going down
    params2, losses2 = model.fit(
        loader, num_epochs=1, params=params, rng=jax.random.PRNGKey(8)
    )
    assert losses2[-1] <= losses[0]

    results = model.evaluate(loader, params2)
    assert "eval_loss" in results and np.isfinite(results["eval_loss"])
    assert any("ndcg_at_10" in k for k in results)
    assert any("recall_at_10" in k for k in results)


def test_adaptive_loss_budget_matches_unbudgeted(jbatch):
    """The 6σ-binomial loss budget (prediction_task._budget_rows) selects all
    target rows with overwhelming probability → budgeted train loss equals
    the unbudgeted one exactly on any normal batch."""
    from transformers4rec_tpu.model.prediction_task import NextItemPredictionTask

    schema, batch = jbatch
    t = NextItemPredictionTask(weight_tying=True)
    # formula sanity: far less than the old fixed 0.7 fraction, ≥6σ above mean
    rows = t.clone(budget_target_prob=0.3)._budget_rows(2560)
    assert 860 <= rows <= 980, rows
    assert t.clone(budget_target_prob=0.3)._budget_rows(16) is None or True

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=48, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=48, n_head=4, n_layer=1, total_seq_length=20
    )
    budgeted = cfg.to_model(im, NextItemPredictionTask(weight_tying=True))
    unbudgeted = cfg.to_model(
        im, NextItemPredictionTask(weight_tying=True, loss_budget=1.0)
    )
    # confirm the adaptive budget wired through Head.from_body
    task_b = budgeted.heads[0].tasks[0]
    assert task_b.budget_target_prob == 0.3 and task_b.loss_budget is None
    params = budgeted.init(RNGS, batch, training=True)
    l_b, _ = budgeted.apply(params, batch, training=True, rngs=APPLY_RNGS)
    l_u, _ = unbudgeted.apply(params, batch, training=True, rngs=APPLY_RNGS)
    np.testing.assert_allclose(float(l_b), float(l_u), rtol=1e-5)


def test_label_smoothing_rides_fused_path(jbatch):
    """label_smoothing>0 must stay on the fused CE path (no silent (N,V)
    fallback) and produce the SAME loss+grads as the unfused dense reference:
    train loss, eval loss, and metrics all agree."""
    schema, batch = jbatch
    m_f = _build(schema, label_smoothing=0.1)               # fused (default)
    m_u = _build(schema, label_smoothing=0.1, use_fused_ops=False)
    params = m_f.init(RNGS, batch, training=True)

    def loss_of(model, p, **kw):
        l, _ = model.apply(p, batch, training=True, rngs=APPLY_RNGS, **kw)
        return l

    lf = loss_of(m_f, params)
    lu = loss_of(m_u, params)
    np.testing.assert_allclose(float(lf), float(lu), rtol=1e-4)

    # fused kernels GEMM in bf16 (f32 accum); the unfused reference einsums in
    # f32 — normwise comparison covers that dtype gap, not smoothing error
    # (exact numerics vs a bf16 dense reference are pinned in tests/test_ops.py)
    gf = jax.grad(lambda p: loss_of(m_f, p))(params)
    gu = jax.grad(lambda p: loss_of(m_u, p))(params)

    def normwise(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.linalg.norm(b), 1e-6)
        assert np.linalg.norm(a - b) / denom < 1e-2

    jax.tree_util.tree_map(normwise, gf, gu)

    # eval: fused_ce_and_rank with smoothing == dense logits path
    lf_t, of_t = m_f.apply(params, batch, testing=True)
    lu_t, ou_t = m_u.apply(params, batch, testing=True)
    np.testing.assert_allclose(float(lf_t), float(lu_t), rtol=1e-4)
    for k, v in of_t["next-item"].metrics.items():
        np.testing.assert_allclose(
            float(v[0]), float(ou_t["next-item"].metrics[k][0]), rtol=1e-5,
            err_msg=k,
        )


def test_summary_modes(jbatch):
    """All four HF SequenceSummary modes (reference model/base.py:76):
    last = last non-padded position, first, mean = pad-weighted mean,
    cls_index = final sequence position regardless of padding."""
    from transformers4rec_tpu.model.prediction_task import PredictionTask

    hidden = jnp.arange(2 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 3)
    pad = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)

    def s(mode):
        return np.asarray(PredictionTask(summary_type=mode).summarize(hidden, pad))

    np.testing.assert_allclose(s("first"), np.asarray(hidden[:, 0]))
    np.testing.assert_allclose(s("cls_index"), np.asarray(hidden[:, -1]))
    np.testing.assert_allclose(s("last")[0], np.asarray(hidden[0, 1]))  # 2 valid
    np.testing.assert_allclose(s("last")[1], np.asarray(hidden[1, 3]))
    np.testing.assert_allclose(s("mean")[0], np.asarray(hidden[0, :2].mean(0)))
    np.testing.assert_allclose(s("mean")[1], np.asarray(hidden[1].mean(0)))


def test_attention_window_build_arg():
    """Longformer/Reformer fidelity: reference ``attention_window``
    (config/transformer.py:304) and Reformer ``local_attn_chunk_length``
    (:185-204) plumb through build() to the unified encoder's local_window;
    a window covering the whole sequence degrades to dense (None)."""
    c = tr.transformer_registry.parse("longformer").build(
        32, 2, 1, 20, attention_window=4
    )
    assert c.local_window == 4
    # whole-sequence window == dense attention (the reference DEFAULT:
    # attention_window=total_seq_length)
    c2 = tr.transformer_registry.parse("longformer").build(
        32, 2, 1, 20, attention_window=22
    )
    assert c2.local_window is None
    c3 = tr.transformer_registry.parse("reformer").build(
        32, 2, 1, 20, local_attn_chunk_length=6, axial_pos_shape_first_dim=4
    )
    assert c3.local_window == 6
    # default windows unchanged
    assert tr.transformer_registry.parse("reformer").build(32, 2, 1, 20).local_window == 8


def test_model_fit_evaluate_with_ragged_inputs(jbatch):
    """Ragged __values/__offsets batches work at the Model entry: fit and
    evaluate densify host-side before the jitted step (reference
    test_sequential_prediction_model_with_ragged_inputs; reference
    model/base.py:545-551 pads at forward)."""
    import optax

    from transformers4rec_tpu.data.synthetic import synthetic_data

    schema, _ = jbatch
    model = _build(schema, masking="clm", arch="gpt2")
    ragged = synthetic_data(schema, num_rows=16, max_session_length=20,
                            seed=9, ragged=True)
    assert any(k.endswith("__offsets") for k in ragged)

    loader = [ragged, ragged]  # two identical ragged batches
    params, losses = model.fit(loader, optimizer=optax.adam(1e-3),
                               num_epochs=1)
    assert losses and all(np.isfinite(l) for l in losses)
    results = model.evaluate(loader, params)
    assert np.isfinite(results["eval_loss"])
    assert any("recall" in k for k in results)


def test_model_evaluate_tail_batch_exact(jbatch):
    """Model.evaluate over a loader whose num_rows % batch_size != 0 (tail
    zero-filled with drop_last=False) equals a single-batch whole-dataset
    oracle — loss AND every metric (the standalone analog of the Trainer
    tail-protocol guarantee)."""
    from transformers4rec_tpu.data.loader import SyntheticDataLoader

    schema, _ = jbatch
    model = _build(schema, masking="clm", arch="gpt2")
    # 40 rows, batch 16 → 2 full + one zero-filled tail of 8 real rows
    batched = SyntheticDataLoader.from_schema(
        schema, batch_size=16, max_sequence_length=20, num_rows=40, seed=5,
        shuffle=False, drop_last=False,
    )
    oracle = SyntheticDataLoader.from_schema(
        schema, batch_size=40, max_sequence_length=20, num_rows=40, seed=5,
        shuffle=False, drop_last=False,
    )
    params, _ = model.fit(batched, num_epochs=1, rng=jax.random.PRNGKey(7))
    got = model.evaluate(batched, params)
    want = model.evaluate(oracle, params)
    assert set(got) == set(want)
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-5, atol=1e-6, err_msg=k)
