"""Sparse-embedding train step (embedding_optimizer="sparse_adam"):
the O(N·E) gather/scatter path must be EXACTLY the dense path — same loss,
and its row gradients scatter-add to the dense (V, E) table gradient."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data.synthetic import (
    synthetic_data,
    synthetic_ecommerce_data_schema,
)


def _build(masking, num_items=2000, sampled=True):
    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking=masking, aggregation="concat"
    )
    arch = "gpt2" if masking == "clm" else "xlnet"
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(
        im,
        tr.NextItemPredictionTask(
            weight_tying=True, sampled_softmax=sampled, max_n_samples=64
        ),
    )
    return schema, model


@pytest.mark.parametrize("masking", ["mlm", "clm", "plm"])
def test_sparse_grads_match_dense(masking):
    """Same injected negatives → the sparse step's loss equals the dense
    path's EXACTLY, and scatter-add of its row grads equals the dense dW."""
    import flax.linen as nn

    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        _pos_map,
        find_table_path,
        make_interceptor,
        tree_get,
        tree_set,
    )

    schema, model = _build(masking)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=8, max_session_length=10, seed=0
        ).items()
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    params = model.init(rngs, batch, training=True)

    path = find_table_path(params, "item_id")
    table = tree_get(params, path)
    task = model.heads[0].tasks[0]
    neg = task.make_sampler(table.shape[0]).sample(jax.random.PRNGKey(9))
    batch2 = {**batch, "__neg_ids__": neg}

    # ---- dense reference: value_and_grad over the full params
    def dense_loss(p):
        loss, _ = model.apply(p, batch2, targets=batch2, training=True,
                              compute_metrics=False, rngs=apply_rngs)
        return loss

    loss_d, grads_d = jax.value_and_grad(dense_loss)(params)
    dW = tree_get(grads_d, path)

    # ---- sparse: rows gathered outside autodiff, interceptor redirects
    item_ids = batch["item_id"]
    B, S = item_ids.shape
    ids_in = item_ids.reshape(-1).astype(jnp.int32)
    all_ids = jnp.concatenate([ids_in, neg.astype(jnp.int32)])
    rows = jnp.take(table, all_ids, axis=0)
    dense_tree = tree_set(params, path, None)
    pmap = jnp.asarray(_pos_map(masking, B, S))

    def sparse_loss(dense_tree, rows):
        p_full = tree_set(dense_tree, path, jax.lax.stop_gradient(table))
        with nn.intercept_methods(
            make_interceptor(rows, "item_id", B * S, pmap, neg)
        ):
            loss, _ = model.apply(p_full, batch2, targets=batch2,
                                  training=True, compute_metrics=False,
                                  rngs=apply_rngs)
        return loss

    loss_s, (gd, g_rows) = jax.value_and_grad(sparse_loss, argnums=(0, 1))(
        dense_tree, rows
    )
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-6)

    scattered = jnp.zeros_like(dW).at[all_ids].add(g_rows)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(dW),
                               rtol=1e-5, atol=1e-7)
    # dense-param grads match too (the interceptor changes nothing upstream)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        gd, tree_set(grads_d, path, None),
    )


@pytest.mark.parametrize("masking", ["mlm", "clm", "plm"])
def test_sparse_trainer_end_to_end(masking, tmp_path):
    """Full Trainer with sparse_adam: trains (loss decreases), composes with
    steps_per_execution packing, and checkpoints round-trip the
    (dense, SparseRowsAdamState) optimizer state."""
    schema, model = _build(masking)
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path),
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=8,
        per_device_eval_batch_size=8,
        max_steps=10,
        steps_per_execution=2,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="sparse_adam",
        save_steps=10,
        seed=5,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist

    # the sparse state must round-trip through the checkpoint machinery
    ck = trainer._latest_checkpoint()
    assert ck is not None
    want = jax.device_get(trainer._train_state.opt_state[1].mu)
    trainer.load(ck)
    got = jax.device_get(trainer._train_state.opt_state[1].mu)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    # eval/predict take the standard dense-forward paths unchanged
    ev = trainer.evaluate()
    assert np.isfinite(ev["eval_loss"])


def test_sparse_accumulation_matches_mean_clip_single_update(tmp_path):
    """K=2 gradient accumulation through the sparse step == mean of the two
    micro-batches' grads → ONE joint clip → ONE dense+sparse update (i.e.
    ``optax.MultiSteps(chain(clip, tx))`` semantics; scatter(row grads) ==
    dense dW is already pinned by test_sparse_grads_match_dense, so the
    row-buffer mean/clip here is the dense MultiSteps run expressed in
    O(N·E))."""
    import optax
    from types import SimpleNamespace

    import flax.linen as nn

    from transformers4rec_tpu.ops.sparse_update import (
        dedupe_row_grads,
        sparse_rows_adam_init,
        sparse_rows_adam_update,
    )
    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        _pos_map,
        find_table_path,
        make_interceptor,
        make_sparse_one_step,
        sparse_accum_init,
        tree_get,
        tree_set,
    )
    from transformers4rec_tpu.trainer.trainer import TrainState

    LR, CLIP, K = 1e-2, 0.05, 2
    schema, model = _build("mlm")
    data = synthetic_data(schema, num_rows=16, max_session_length=10, seed=3)
    b1 = {k: jnp.asarray(v[:8]) for k, v in data.items()}
    b2 = {k: jnp.asarray(v[8:]) for k, v in data.items()}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, b1, training=True)
    path = find_table_path(params, "item_id")
    table = tree_get(params, path)
    V, E = table.shape
    task = model.heads[0].tasks[0]
    sampler = task.make_sampler(V)
    n_neg = sampler.sample(jax.random.PRNGKey(0)).shape[0]
    dense_tree = tree_set(params, path, None)
    dense_tx = optax.adamw(LR)
    args = SimpleNamespace(max_grad_norm=CLIP, gradient_accumulation_steps=K,
                           adam_beta1=0.9, adam_beta2=0.999,
                           adam_epsilon=1e-8)

    one_step = make_sparse_one_step(model, args, path, "item_id", "mlm",
                                    sampler, dense_tx, LR, rule="adam")
    B, S = b1["item_id"].shape
    state = TrainState(
        params=params,
        opt_state=(dense_tx.init(dense_tree), sparse_rows_adam_init(table),
                   sparse_accum_init(dense_tree, B * S + n_neg, E, K)),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(42),
    )
    state1, _ = one_step(state, b1)
    # micro-step 1: no parameter moved, mini_step advanced
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, state1.params,
    )
    assert int(state1.opt_state[2].mini_step) == 1
    state2, _ = one_step(state1, b2)
    assert int(state2.opt_state[2].mini_step) == 0
    assert int(state2.opt_state[1].count) == 1

    # ---- manual reference: same rng derivation as the step
    rng_a, rng_next = jax.random.split(jax.random.PRNGKey(42))
    rng_b, _ = jax.random.split(rng_next)
    pmap = jnp.asarray(_pos_map("mlm", B, S))

    def micro_grads(batch, rng):
        r = {
            "masking": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
            "sampling": jax.random.fold_in(rng, 2),
            "augment": jax.random.fold_in(rng, 3),
        }
        neg = sampler.sample(jax.random.fold_in(rng, 4))
        ids_in = batch["item_id"].reshape(-1).astype(jnp.int32)
        all_ids = jnp.concatenate([ids_in, neg.astype(jnp.int32)])
        rows = jnp.take(table, all_ids, axis=0)
        batch2 = {**batch, "__neg_ids__": neg}

        def loss_fn(dtree, rows):
            p_full = tree_set(dtree, path, jax.lax.stop_gradient(table))
            with nn.intercept_methods(
                make_interceptor(rows, "item_id", B * S, pmap, neg)
            ):
                loss, _ = model.apply(p_full, batch2, targets=batch2,
                                      training=True, compute_metrics=False,
                                      rngs=r)
            return loss

        _, (gd, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            dense_tree, rows)
        return gd, all_ids, g_rows

    gd1, ids1, gr1 = micro_grads(b1, rng_a)
    gd2, ids2, gr2 = micro_grads(b2, rng_b)
    mean_gd = jax.tree_util.tree_map(lambda a, b: (a + b) / K, gd1, gd2)
    uids, g_sum = dedupe_row_grads(
        jnp.concatenate([ids1, ids2]),
        jnp.concatenate([gr1, gr2]) / K, V)
    gn = optax.global_norm((mean_gd, g_sum))
    scale = jnp.minimum(1.0, CLIP / jnp.maximum(gn, 1e-12))
    mean_gd = jax.tree_util.tree_map(lambda g: g * scale, mean_gd)
    g_sum = g_sum * scale
    updates, _ = dense_tx.update(mean_gd, dense_tx.init(dense_tree),
                                 dense_tree)
    ref_dense = optax.apply_updates(dense_tree, updates)
    ref_table, _ = sparse_rows_adam_update(
        table, sparse_rows_adam_init(table), uids, g_sum, LR, deduped=True)
    ref_params = tree_set(ref_dense, path, ref_table)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        state2.params, ref_params,
    )


@pytest.mark.parametrize("opt", ["sparse_adafactor", "sparse_adam"])
def test_sparse_trainer_accumulation_e2e(opt, tmp_path):
    """Trainer e2e: sparse optimizers × gradient_accumulation_steps × K-pack
    scan — trains, and the (dense, sparse, accum) state checkpoints."""
    schema, model = _build("mlm")
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path),
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=8,
        max_steps=12,
        steps_per_execution=3,
        gradient_accumulation_steps=2,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer=opt,
        save_steps=12,
        seed=11,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist
    # 12 micro-steps / K=2 -> 6 optimizer steps on the sparse state
    assert int(trainer._train_state.opt_state[1].count) == 6

    ck = trainer._latest_checkpoint()
    assert ck is not None
    sp = trainer._train_state.opt_state[1]
    want = jax.device_get(sp.mu if hasattr(sp, "mu") else sp.v)
    trainer.load(ck)
    sp2 = trainer._train_state.opt_state[1]
    got = jax.device_get(sp2.mu if hasattr(sp2, "mu") else sp2.v)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_sparse_adafactor_trainer_end_to_end(tmp_path):
    """sparse_adafactor (the quality-default table rule in O(N·E)) trains
    through the full Trainer with K-packing."""
    schema, model = _build("clm")
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path),
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=8,
        max_steps=10,
        steps_per_execution=2,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="sparse_adafactor",
        seed=5,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist
    ev = trainer.evaluate()
    assert np.isfinite(ev["eval_loss"])


@pytest.mark.parametrize("trial", range(3))
def test_sparse_grads_match_dense_fuzz(trial):
    """Randomized shapes/schemes: the sparse loss and scatter(row grads)
    equal the dense path across vocab sizes, sequence lengths, batch sizes,
    negative counts, and maskings — the flagship path must not depend on the
    fixed shapes of the targeted tests."""
    import flax.linen as nn

    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        _pos_map,
        find_table_path,
        make_interceptor,
        tree_get,
        tree_set,
    )

    rng = np.random.default_rng(100 + trial)
    masking = rng.choice(["mlm", "clm", "plm"])
    num_items = int(rng.integers(300, 5000))
    seq = int(rng.integers(4, 16))
    rows = int(rng.integers(3, 12))
    n_neg = int(rng.integers(8, 128))

    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=int(rng.integers(5, 40)),
        max_session_length=seq,
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking=masking, aggregation="concat"
    )
    arch = "gpt2" if masking == "clm" else "xlnet"
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=16, n_head=2, n_layer=1, total_seq_length=seq
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=n_neg))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=rows, max_session_length=seq, seed=trial
        ).items()
    }
    rngs = {
        "params": jax.random.PRNGKey(trial),
        "masking": jax.random.PRNGKey(trial + 1),
        "dropout": jax.random.PRNGKey(trial + 2),
        "sampling": jax.random.PRNGKey(trial + 3),
    }
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    params = model.init(rngs, batch, training=True)
    path = find_table_path(params, "item_id")
    table = tree_get(params, path)
    task = model.heads[0].tasks[0]
    neg = task.make_sampler(table.shape[0]).sample(
        jax.random.PRNGKey(trial + 9))
    batch2 = {**batch, "__neg_ids__": neg}

    def dense_loss(p):
        loss, _ = model.apply(p, batch2, targets=batch2, training=True,
                              compute_metrics=False, rngs=apply_rngs)
        return loss

    loss_d, grads_d = jax.value_and_grad(dense_loss)(params)
    dW = tree_get(grads_d, path)

    B, S = batch["item_id"].shape
    ids_in = batch["item_id"].reshape(-1).astype(jnp.int32)
    all_ids = jnp.concatenate([ids_in, neg.astype(jnp.int32)])
    rows_g = jnp.take(table, all_ids, axis=0)
    dense_tree = tree_set(params, path, None)
    pmap = jnp.asarray(_pos_map(str(masking), B, S))

    def sparse_loss(dense_tree, rows_g):
        p_full = tree_set(dense_tree, path, jax.lax.stop_gradient(table))
        with nn.intercept_methods(
            make_interceptor(rows_g, "item_id", B * S, pmap, neg)
        ):
            loss, _ = model.apply(p_full, batch2, targets=batch2,
                                  training=True, compute_metrics=False,
                                  rngs=apply_rngs)
        return loss

    loss_s, (gd, g_rows) = jax.value_and_grad(sparse_loss, argnums=(0, 1))(
        dense_tree, rows_g
    )
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-6)
    scattered = jnp.zeros_like(dW).at[all_ids].add(g_rows)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(dW),
                               rtol=1e-4, atol=1e-6)


def test_sparse_validation_errors(tmp_path):
    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        validate_sparse_config,
    )

    # full softmax → refuse (dense (V, E) gradient is unavoidable)
    schema, model = _build("mlm", sampled=False)
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path), data_loader_engine="synthetic",
        embedding_optimizer="sparse_adam",
    )
    with pytest.raises(NotImplementedError, match="sampled_softmax"):
        validate_sparse_config(model, args)

    # unsupported masking scheme → refuse
    schema, model = _build("rtd")
    with pytest.raises(NotImplementedError, match="mlm/clm"):
        validate_sparse_config(model, args)


def test_sparse_composes_with_packing(tmp_path):
    """sparse_adam x pack_sessions: packed CLM rows (segment-stopped labels
    carry zero weight, so the position map stays valid) train end-to-end."""
    schema, model = _build("clm")
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path),
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=8,
        max_steps=8,
        steps_per_execution=2,
        pack_sessions=True,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="sparse_adam",
        seed=2,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist


def test_sparse_validation_rejects_non_ssn_pre_and_frozen_table(tmp_path):
    """Non-SSN input PRE transformations (param-bearing / float-space) and
    frozen pretrained item tables must be refused — both would silently
    diverge from the dense path. SSN itself now COMPOSES (trainer-side
    application; test_sparse_ssn_grads_match_dense)."""
    import numpy as _np

    from transformers4rec_tpu.features.embedding import (
        PretrainedEmbeddingsInitializer,
    )
    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        validate_sparse_config,
    )

    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path), data_loader_engine="synthetic",
        embedding_optimizer="sparse_adam",
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=500, num_categories=10, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        pre="layer-norm",
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=16))
    with pytest.raises(NotImplementedError, match="StochasticSwapNoise"):
        validate_sparse_config(model, args)

    # SSN as PRE validates cleanly now
    im_ok = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        pre="stochastic-swap-noise",
    )
    model_ok = cfg.to_model(im_ok, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=16))
    validate_sparse_config(model_ok, args)

    weights = _np.random.default_rng(0).normal(size=(501, 16)).astype("float32")
    im2 = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        embeddings_initializers={
            schema.item_id_column_name: PretrainedEmbeddingsInitializer(
                weights, trainable=False
            )
        },
    )
    model2 = cfg.to_model(im2, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=16))
    with pytest.raises(NotImplementedError, match="frozen"):
        validate_sparse_config(model2, args)


@pytest.mark.parametrize("masking", ["mlm", "clm"])
def test_sparse_ssn_grads_match_dense(masking):
    """StochasticSwapNoise composes with the sparse step: with the SAME
    trainer-computed augmentation injected into both paths, the sparse loss
    equals the dense path's exactly and scatter-add of its row grads (over
    the [augmented lookup | original label | negative] row layout) equals
    the dense dW."""
    import flax.linen as nn

    from transformers4rec_tpu.tabular.base import parse_transformation
    from transformers4rec_tpu.trainer.sparse_embedding_step import (
        _pos_map,
        find_table_path,
        make_interceptor,
        tree_get,
        tree_set,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=2000, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking=masking, aggregation="concat",
        pre="stochastic-swap-noise",
    )
    arch = "gpt2" if masking == "clm" else "xlnet"
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=64))
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=8, max_session_length=10, seed=0
        ).items()
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
        "augment": jax.random.PRNGKey(4),
    }
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    params = model.init(rngs, batch, training=True)

    path = find_table_path(params, "item_id")
    table = tree_get(params, path)
    task = model.heads[0].tasks[0]
    neg = task.make_sampler(table.shape[0]).sample(jax.random.PRNGKey(9))
    batch2 = {**batch, "__neg_ids__": neg}

    # trainer-side augmentation (the step's own draw)
    pre_tf = parse_transformation(im.pre)
    item_ids = batch["item_id"]
    aug = pre_tf.apply(
        {}, batch, training=True, pad_mask=(item_ids != 0),
        rngs={"augment": jax.random.PRNGKey(77)},
    )
    assert int((aug["item_id"] != item_ids).sum()) > 0, "SSN swapped nothing"

    def ssn_only(next_fun, args, kwargs, context):
        if (context.method_name == "__call__"
                and type(context.module).__name__ == "StochasticSwapNoise"
                and args and isinstance(args[0], dict)
                and "item_id" in args[0]
                and jnp.issubdtype(args[0]["item_id"].dtype, jnp.integer)):
            return {k: aug.get(k, v) for k, v in args[0].items()}
        return next_fun(*args, **kwargs)

    # ---- dense reference: full params, same injected augmentation
    def dense_loss(p):
        with nn.intercept_methods(ssn_only):
            loss, _ = model.apply(p, batch2, targets=batch2, training=True,
                                  compute_metrics=False, rngs=apply_rngs)
        return loss

    loss_d, grads_d = jax.value_and_grad(dense_loss)(params)
    dW = tree_get(grads_d, path)

    # ---- sparse: [aug lookup rows | original label rows | negatives]
    B, S = item_ids.shape
    n_in = B * S
    ids_in = item_ids.reshape(-1).astype(jnp.int32)
    aug_ids = aug["item_id"].reshape(-1).astype(jnp.int32)
    all_ids = jnp.concatenate([aug_ids, ids_in, neg.astype(jnp.int32)])
    rows = jnp.take(table, all_ids, axis=0)
    dense_tree = tree_set(params, path, None)
    pmap = jnp.asarray(_pos_map(masking, B, S)) + n_in

    def sparse_loss(dense_tree, rows):
        p_full = tree_set(dense_tree, path, jax.lax.stop_gradient(table))
        with nn.intercept_methods(
            make_interceptor(rows, "item_id", n_in, pmap, neg,
                             neg_base=2 * n_in, aug_inputs=aug)
        ):
            loss, _ = model.apply(p_full, batch2, targets=batch2,
                                  training=True, compute_metrics=False,
                                  rngs=apply_rngs)
        return loss

    loss_s, (gd, g_rows) = jax.value_and_grad(sparse_loss, argnums=(0, 1))(
        dense_tree, rows
    )
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-6)
    scattered = jnp.zeros_like(dW).at[all_ids].add(g_rows)
    np.testing.assert_allclose(np.asarray(scattered), np.asarray(dW),
                               rtol=1e-5, atol=1e-7)


def test_sparse_trainer_with_ssn_end_to_end(tmp_path):
    """Tuned-config-style run (ssn>0 + sampled softmax) through the sparse
    step: trains end-to-end with K-packing."""
    schema = synthetic_ecommerce_data_schema(
        num_items=2000, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        pre="stochastic-swap-noise",
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=64))
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path),
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=8,
        max_steps=10,
        steps_per_execution=2,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="sparse_adam",
        seed=3,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist


def test_sparse_hint_on_large_dense_table(tmp_path, monkeypatch):
    """A sparse_adam-ELIGIBLE model whose tied table crosses
    SPARSE_HINT_MIN_ROWS warns once when trained with a dense embedding
    optimizer — and stays silent for ineligible (full-softmax) models."""
    import warnings as _warnings

    from transformers4rec_tpu.trainer import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod, "SPARSE_HINT_MIN_ROWS", 1000)

    def make_args(**kw):
        return tr.T4RecTrainingArguments(
            output_dir=str(tmp_path), data_loader_engine="synthetic",
            max_sequence_length=10, per_device_train_batch_size=8,
            max_steps=2, logging_steps=1, embedding_optimizer="adafactor",
            seed=0, **kw,
        )

    schema, model = _build("mlm")  # 2000 rows > patched threshold, eligible
    with pytest.warns(UserWarning, match="sparse_adam"):
        tr.Trainer(model=model, args=make_args(), schema=schema).train()

    # full softmax does not qualify -> no hint (record instead of erroring:
    # an unrelated dependency deprecation must not fail this arm)
    schema, model = _build("mlm", sampled=False)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        tr.Trainer(model=model, args=make_args(), schema=schema).train()
    assert not [w for w in caught if "sparse_adam" in str(w.message)]

    # grad accumulation composes with the sparse step now -> still hints
    schema, model = _build("mlm")
    with pytest.warns(UserWarning, match="sparse"):
        tr.Trainer(
            model=model,
            args=make_args(gradient_accumulation_steps=2),
            schema=schema,
        ).train()
