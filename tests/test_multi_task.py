"""Multi-task end-to-end: next-item + binary classification + regression on
the music-streaming fixture (reference test_model.py multi-head/multi-task
coverage + the BASELINE 'multi-task stretch' config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data import music_streaming_testing_data as ms

RNGS = {
    "params": jax.random.PRNGKey(0),
    "masking": jax.random.PRNGKey(1),
    "dropout": jax.random.PRNGKey(2),
    "sampling": jax.random.PRNGKey(3),
}
APPLY = {k: v for k, v in RNGS.items() if k != "params"}


@pytest.fixture(scope="module")
def batch():
    from transformers4rec_tpu.data.synthetic import synthetic_data

    data = synthetic_data(ms.schema, num_rows=16, max_session_length=20, seed=5)
    return {k: jnp.asarray(v) for k, v in data.items()}


def test_three_task_model(batch):
    feature_schema = ms.schema.remove_by_tag(tr.Tags.TARGET)
    im = tr.TabularSequenceFeatures.from_schema(
        feature_schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("bert").build(32, 2, 1, 20)
    head = tr.Head.from_body(
        input_module=im,
        transformer=cfg,
        tasks=[
            tr.NextItemPredictionTask(weight_tying=True),
            tr.BinaryClassificationTask(task_name="click", target_name="click"),
            tr.RegressionTask(task_name="play_percentage",
                              target_name="play_percentage"),
        ],
        task_weights=[1.0, 0.5, 0.5],
    )
    model = tr.Model(heads=(head,))
    params = model.init(RNGS, batch, targets=batch, training=True)
    loss, outs = model.apply(params, batch, targets=batch, training=True, rngs=APPLY)
    assert np.isfinite(float(loss))
    assert set(outs) == {"next-item", "click", "play_percentage"}

    loss_t, outs_t = model.apply(params, batch, targets=batch, testing=True)
    assert outs_t["next-item"].metrics is not None
    assert outs_t["click"].metrics is not None

    # trains end-to-end
    import optax

    opt = optax.adam(5e-3)
    st = opt.init(params)

    @jax.jit
    def step(p, s, rng):
        r = {"masking": rng, "dropout": rng, "sampling": rng}

        def lf(pp):
            l, _ = model.apply(pp, batch, targets=batch, training=True, rngs=r)
            return l

        l, g = jax.value_and_grad(lf)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(10):
        rng, sub = jax.random.split(rng)
        params, st, l = step(params, st, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_head_from_schema_builds_target_tasks():
    head = tr.Head.from_schema(
        ms.schema,
        body=tr.SequentialBlock(blocks=(
            tr.TabularSequenceFeatures.from_schema(
                ms.schema.remove_by_tag(tr.Tags.TARGET),
                d_output=16, aggregation="concat",
            ),
        )),
    )
    names = {t.task_name for t in head.tasks}
    assert "click" in names and "play_percentage" in names


def test_predict_top_k_precedence(tmp_path, ecommerce_schema):
    """trainer predict_top_k wins over model.top_k (reference
    trainer.py:546-592 interplay)."""
    im = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=16, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(16, 2, 1, 20)
    head = tr.Head.from_body(input_module=im, transformer=cfg,
                             tasks=[tr.NextItemPredictionTask(weight_tying=True)])
    model = tr.Model(heads=(head,), top_k=30)
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path), data_loader_engine="synthetic",
        per_device_train_batch_size=8, num_train_epochs=1,
        max_sequence_length=20, predict_top_k=12,
    )
    trainer = tr.Trainer(model=model, args=args, schema=ecommerce_schema)
    trainer.train()
    scores, ids = trainer.predict()            # args.predict_top_k = 12
    assert ids.shape[1] == 12
    scores2, ids2 = trainer.predict(top_k=5)   # explicit wins over both
    assert ids2.shape[1] == 5


def test_two_heads_model(ecommerce_schema):
    """Multi-head composition with head weights (reference test_head.py /
    Model multi-head loss reduction model/base.py:544-598)."""
    from transformers4rec_tpu.data.synthetic import synthetic_data

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(ecommerce_schema, num_rows=8,
                                   max_session_length=20, seed=2).items()
    }
    im1 = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=24, masking="clm", aggregation="concat")
    im2 = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=24, masking="mlm", aggregation="concat")
    h1 = tr.Head.from_body(
        input_module=im1, transformer=tr.GPT2Config.build(24, 2, 1, 20),
        tasks=[tr.NextItemPredictionTask(weight_tying=True)])
    h2 = tr.Head.from_body(
        input_module=im2, transformer=tr.BertConfig.build(24, 2, 1, 20),
        tasks=[tr.NextItemPredictionTask(weight_tying=True, task_name="next-item-2")])
    model = tr.Model(heads=(h1, h2), head_weights=(0.7, 0.3))
    params = model.init(RNGS, batch, training=True)
    loss, outs = model.apply(params, batch, training=True, rngs=APPLY)
    assert np.isfinite(float(loss))
    assert set(outs) == {"next-item", "next-item-2"}
    # inference over multiple heads returns a list
    preds = model.apply(params, batch)
    assert isinstance(preds, list) and len(preds) == 2


def test_binary_regression_streaming_metrics_exact_on_unequal_batches():
    """Binary/Regression metric states are exact (sum,count) sufficient
    statistics: merging streamed per-batch states over deliberately UNEQUAL
    batch sizes must equal the whole-dataset computation exactly (parity with
    torchmetrics exact streaming, reference prediction_task.py:122-136 —
    mean-of-batch-means would bias the tail batch)."""
    from transformers4rec_tpu.data.synthetic import synthetic_data
    from transformers4rec_tpu.model.ranking_metric import (
        finalize_metrics,
        update_metric_state,
    )

    feature_schema = ms.schema.remove_by_tag(tr.Tags.TARGET)
    im = tr.TabularSequenceFeatures.from_schema(
        feature_schema, d_output=16, aggregation="concat"
    )
    head = tr.Head.from_body(
        input_module=im,
        transformer=tr.BertConfig.build(16, 2, 1, 20),
        tasks=[
            tr.BinaryClassificationTask(task_name="click", target_name="click"),
            tr.RegressionTask(task_name="play_percentage",
                              target_name="play_percentage"),
        ],
    )
    model = tr.Model(heads=(head,))

    data = synthetic_data(ms.schema, num_rows=23, max_session_length=20, seed=7)
    full = {k: jnp.asarray(v) for k, v in data.items()}
    params = model.init(RNGS, full, targets=full, training=True)

    # stream in unequal chunks: 16 + 7 (tail)
    state = {}
    all_preds = {}
    for lo, hi in [(0, 16), (16, 23)]:
        chunk = {k: v[lo:hi] for k, v in full.items()}
        _, outs = model.apply(params, chunk, targets=chunk, testing=True)
        batch_state = {}
        for name, out in outs.items():
            batch_state.update({f"{name}/{k}": v for k, v in out.metrics.items()})
            all_preds.setdefault(name, []).append(np.asarray(out.predictions))
        state = update_metric_state(state, batch_state) if state else batch_state
    streamed = {k: float(v) for k, v in finalize_metrics(state).items()}

    # whole-dataset oracle from the model's own predictions
    click = np.asarray(full["click"], dtype=np.float64)
    preds = np.concatenate(all_preds["click"]).astype(np.float64)
    hard = (preds > 0.5).astype(np.float64)
    tp = float((hard * click).sum())
    oracle_acc = float((hard == click).mean())
    oracle_prec = tp / max(hard.sum(), 1.0)
    oracle_rec = tp / max(click.sum(), 1.0)
    np.testing.assert_allclose(streamed["click/accuracy"], oracle_acc, rtol=1e-6)
    np.testing.assert_allclose(streamed["click/precision"], oracle_prec, rtol=1e-6)
    np.testing.assert_allclose(streamed["click/recall"], oracle_rec, rtol=1e-6)

    play = np.asarray(full["play_percentage"], dtype=np.float64)
    rpred = np.concatenate(all_preds["play_percentage"]).astype(np.float64)
    oracle_mse = float(np.mean((rpred - play) ** 2))
    np.testing.assert_allclose(
        streamed["play_percentage/mse"], oracle_mse, rtol=1e-5
    )


def test_model_evaluate_honors_task_weights(batch):
    """Standalone Model.evaluate recombines per-task dataset means with the
    CONFIGURED task_weights — the same weighting as the training objective
    (equal-weighting silently changed eval_loss for weighted models)."""
    from transformers4rec_tpu.model.base import combine_task_losses

    feature_schema = ms.schema.remove_by_tag(tr.Tags.TARGET)
    im = tr.TabularSequenceFeatures.from_schema(
        feature_schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("bert").build(32, 2, 1, 20)

    def build(weights):
        head = tr.Head.from_body(
            input_module=im,
            transformer=cfg,
            tasks=[
                tr.NextItemPredictionTask(weight_tying=True),
                tr.BinaryClassificationTask(task_name="click",
                                            target_name="click"),
            ],
            task_weights=weights,
        )
        return tr.Model(heads=(head,))

    model_eq = build([1.0, 1.0])
    model_w = build([3.0, 1.0])
    # identical parameters (same structure) → identical per-task losses
    params = model_eq.init(RNGS, batch, targets=batch, training=True)

    class _OneBatch:
        def __iter__(self):
            return iter([{k: np.asarray(v) for k, v in batch.items()}])

    r_eq = model_eq.evaluate(_OneBatch(), params)
    r_w = model_w.evaluate(_OneBatch(), params)

    # recover the per-task means from the two weighted combinations and pin
    # against a direct apply() of each weighting
    _, outs = model_eq.apply(params, batch, targets=batch, testing=True)
    means = {}
    for name, out in outs.items():
        means[name] = float(out.loss)
    for model, got in ((model_eq, r_eq), (model_w, r_w)):
        want = combine_task_losses(model, means)
        np.testing.assert_allclose(got["eval_loss"], want, rtol=1e-5)
    # the weighted model's eval loss must actually differ from equal weights
    assert abs(r_w["eval_loss"] - r_eq["eval_loss"]) > 1e-6
