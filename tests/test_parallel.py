"""Parallel layer tests on the 8-virtual-device CPU mesh: mesh construction,
sharding rules, batch placement, and dp+mp training-step numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import transformers4rec_tpu as tr
from transformers4rec_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_sharding_rules_select_big_tables():
    mesh = make_mesh(model=2)
    params = {
        "params": {
            "item_id_table": jnp.zeros((32768, 16)),
            "category_table": jnp.zeros((100, 8)),  # too small to shard
            "dense": {"kernel": jnp.zeros((16, 16))},
        }
    }
    sh = param_shardings(params, mesh, min_rows_to_shard=16384)
    assert sh["params"]["item_id_table"].spec == P("model", None)
    assert sh["params"]["category_table"].spec == P()
    assert sh["params"]["dense"]["kernel"].spec == P()


def test_param_sharding_respects_divisibility():
    mesh = make_mesh(model=2)
    params = {"odd_table": jnp.zeros((32769, 4))}  # not divisible by 2
    sh = param_shardings(params, mesh, min_rows_to_shard=1)
    assert sh["odd_table"].spec == P()


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"item_id": jnp.zeros((16, 20), jnp.int32)}
    out = shard_batch(batch, mesh)
    assert out["item_id"].sharding.spec == batch_sharding(mesh).spec
    # each of 8 devices holds 2 rows
    shard_shapes = {s.data.shape for s in out["item_id"].addressable_shards}
    assert shard_shapes == {(2, 20)}


def test_sharded_embedding_training_matches_single_device():
    """A dp×mp train step must produce the same loss/grads as unsharded."""
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=4096, num_categories=32, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    # f32 unfused CE: this test checks sharding semantics, so keep the math
    # bitwise-comparable across shardings (bf16 fused ops reorder accumulation)
    model = cfg.to_model(
        im, tr.NextItemPredictionTask(weight_tying=True, use_fused_ops=False)
    )

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=16, max_session_length=10, seed=0).items()
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
    params = model.init(rngs, batch, training=True)

    def loss_fn(p, b):
        loss, _ = model.apply(p, b, training=True, rngs=apply_rngs)
        return loss

    # single device reference
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)

    # dp=4 × mp=2 with every table sharded
    mesh = make_mesh(model=2)
    p_sharded = jax.device_put(params, param_shardings(params, mesh, min_rows_to_shard=1))
    b_sharded = shard_batch(batch, mesh)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_sharded, b_sharded)

    np.testing.assert_allclose(float(ref_loss), float(loss), rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        jax.device_get(ref_grads),
        jax.device_get(grads),
    )


def test_sharded_embedding_lookup_exact():
    """Explicit shard_map lookup must equal plain indexing, with grads
    scatter-added into the local shard only."""
    from transformers4rec_tpu.parallel import shard_table, sharded_embedding_lookup

    mesh = make_mesh(model=4)
    V, E = 512, 8
    table = jax.random.normal(jax.random.PRNGKey(0), (V, E))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, V)
    ts = shard_table(table, mesh)
    out = sharded_embedding_lookup(ts, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), atol=1e-6)

    g = jax.grad(lambda t: (sharded_embedding_lookup(t, ids, mesh) ** 2).sum())(ts)
    gref = jax.grad(lambda t: (t[ids] ** 2).sum())(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-5)
    assert g.sharding.spec == P("model", None)


def test_sharded_embedding_rejects_nondivisible():
    from transformers4rec_tpu.parallel import shard_table, sharded_embedding_lookup

    mesh = make_mesh(model=4)
    table = jnp.zeros((510, 8))
    with pytest.raises(ValueError, match="divide"):
        sharded_embedding_lookup(table, jnp.zeros((2,), jnp.int32), mesh)


def test_default_threshold_shards_real_vocab_and_matches_replicated():
    """End-to-end at a vocab that ACTUALLY crosses the default
    min_rows_to_shard (16384) with the DEFAULT param_shardings arguments:
    the item table must come out row-sharded P('model', None), small tables
    replicated, and loss + item-table grads must match the fully-replicated
    run (same f32 unfused math; only the sharding differs)."""
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=16384, num_categories=32, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(
        im, tr.NextItemPredictionTask(weight_tying=True, use_fused_ops=False)
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=16, max_session_length=10, seed=4
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

    mesh = make_mesh(model=2)
    sh = param_shardings(params, mesh)  # DEFAULT threshold — no override
    specs = {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    item_keys = [k for k in specs if k.endswith("item_id_table")]
    assert item_keys, sorted(specs)[:5]
    assert specs[item_keys[0]] == P("model", None), specs[item_keys[0]]
    cat_keys = [k for k in specs if k.endswith("category_table")]
    assert specs[cat_keys[0]] == P(), "small table must stay replicated"

    def loss_fn(p, b):
        loss, _ = model.apply(p, b, training=True, rngs=apply_rngs)
        return loss

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch)
    p_sharded = jax.device_put(params, sh)
    b_sharded = shard_batch(batch, mesh)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p_sharded, b_sharded)
    np.testing.assert_allclose(float(ref_loss), float(loss), rtol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        jax.device_get(ref_grads),
        jax.device_get(grads),
    )


def test_sharded_embedding_lookup_exact_at_threshold_vocab():
    """shard_map lookup at a vocab ≥ the default min_rows_to_shard: equality
    with plain indexing plus local-shard-only gradient scatter."""
    from transformers4rec_tpu.parallel import shard_table, sharded_embedding_lookup

    mesh = make_mesh(model=4)
    V, E = 16384, 16
    table = jax.random.normal(jax.random.PRNGKey(0), (V, E))
    ids = jax.random.randint(jax.random.PRNGKey(1), (32, 10), 0, V)
    ts = shard_table(table, mesh)
    out = sharded_embedding_lookup(ts, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[ids]), atol=1e-6)

    g = jax.grad(lambda t: (sharded_embedding_lookup(t, ids, mesh) ** 2).sum())(ts)
    gref = jax.grad(lambda t: (t[ids] ** 2).sum())(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-5)
    assert g.sharding.spec == P("model", None)


def test_dryrun_multichip_covers_eval_and_sampled(capsys):
    """The driver-facing dryrun runs train + packed + evaluate (metric
    states) + sampled-softmax sharded-table steps at model_axis=2."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "eval_loss=" in out and "sampled_loss=" in out and "OK" in out


class TestVocabParallelCE:
    """sharded_softmax_ce / sharded_ce_and_rank: value, gradients, and ranks
    must equal the unsharded fused ops on the gathered table (vocab-parallel
    full softmax — the 100M-row output layer path)."""

    def _setup(self, V=1024, E=16, N=32, vocab_size=1000, seed=0):
        from transformers4rec_tpu.parallel import make_mesh
        from transformers4rec_tpu.parallel.sharded_embedding import shard_table

        mesh = make_mesh(model=2)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(N, E)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32) * 0.1)
        labels = jnp.asarray(rng.integers(0, vocab_size, size=(N,)), jnp.int32)
        weights = jnp.asarray((rng.random(N) > 0.2).astype(np.float32))
        Ws = shard_table(W, mesh)
        xs = jax.device_put(
            x, jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None))
        )
        return mesh, x, W, xs, Ws, labels, weights

    def test_loss_and_grads_match_unsharded(self):
        from transformers4rec_tpu.ops.vocab import fused_softmax_ce
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_softmax_ce,
        )

        mesh, x, W, xs, Ws, labels, weights = self._setup()

        def ref_loss(x, W):
            return fused_softmax_ce(x, W, labels, weights, vocab_size=1000)

        def sh_loss(x, W):
            return sharded_softmax_ce(x, W, labels, weights, mesh,
                                      vocab_size=1000)

        want, (wdx, wdW) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, W)
        got, (gdx, gdW) = jax.jit(
            jax.value_and_grad(sh_loss, argnums=(0, 1))
        )(xs, Ws)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gdx), np.asarray(wdx),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gdW), np.asarray(wdW),
                                   rtol=2e-4, atol=1e-6)

    def test_ce_and_rank_matches_unsharded(self):
        from transformers4rec_tpu.ops.vocab import fused_ce_and_rank
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_ce_and_rank,
        )

        mesh, x, W, xs, Ws, labels, weights = self._setup(seed=3)
        want_loss, want_rank = fused_ce_and_rank(
            x, W, labels, weights, vocab_size=1000
        )
        got_loss, got_rank = jax.jit(
            lambda x, W: sharded_ce_and_rank(x, W, labels, weights, mesh,
                                             vocab_size=1000)
        )(xs, Ws)
        np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_rank),
                                      np.asarray(want_rank))

    def test_label_on_every_shard_and_padding_rows(self):
        """Labels distributed across both shards; vocab_size bound excludes
        the table's 24 padding rows from softmax, ranks, and gradients."""
        from transformers4rec_tpu.ops.vocab import fused_softmax_ce
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_softmax_ce,
        )

        mesh, x, W, xs, Ws, _, weights = self._setup(seed=7)
        # half the labels on shard 0's rows, half on shard 1's
        labels = jnp.asarray([5] * 16 + [700] * 16, jnp.int32)

        want, wgrads = jax.value_and_grad(
            lambda W: fused_softmax_ce(x, W, labels, weights, vocab_size=1000)
        )(W)
        got, ggrads = jax.jit(jax.value_and_grad(
            lambda W: sharded_softmax_ce(x, W, labels, weights, mesh,
                                         vocab_size=1000)
        ))(Ws)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ggrads), np.asarray(wgrads),
                                   rtol=2e-4, atol=1e-6)
        # padding rows (>= vocab_size) get exactly zero gradient
        assert np.all(np.asarray(ggrads)[1000:] == 0.0)

    @pytest.mark.parametrize("eps", [0.2, 0.6])
    def test_label_smoothing_matches_unsharded(self, eps):
        """Fused ε: sharded per-shard zsum + psum must give the exact
        unsharded smoothed loss AND gradients (the tuned reference command
        lines run ε 0.2–0.9 — the vocab-parallel path must carry them)."""
        from transformers4rec_tpu.ops.vocab import fused_softmax_ce
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_softmax_ce,
        )

        mesh, x, W, xs, Ws, labels, weights = self._setup(seed=13)

        def ref_loss(x, W):
            return fused_softmax_ce(x, W, labels, weights, vocab_size=1000,
                                    label_smoothing=eps)

        def sh_loss(x, W):
            return sharded_softmax_ce(x, W, labels, weights, mesh,
                                      vocab_size=1000, label_smoothing=eps)

        want, (wdx, wdW) = jax.value_and_grad(ref_loss, argnums=(0, 1))(x, W)
        got, (gdx, gdW) = jax.jit(
            jax.value_and_grad(sh_loss, argnums=(0, 1))
        )(xs, Ws)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gdx), np.asarray(wdx),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gdW), np.asarray(wdW),
                                   rtol=2e-4, atol=1e-6)
        # padding rows still get exactly zero gradient under smoothing (the
        # ε/V pull applies to VALID columns only)
        np.testing.assert_array_equal(np.asarray(gdW)[1000:], 0.0)

    @pytest.mark.parametrize("eps", [0.2, 0.6])
    def test_ce_and_rank_smoothing_matches_unsharded(self, eps):
        from transformers4rec_tpu.ops.vocab import fused_ce_and_rank
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_ce_and_rank,
        )

        mesh, x, W, xs, Ws, labels, weights = self._setup(seed=17)
        want_loss, want_rank = fused_ce_and_rank(
            x, W, labels, weights, vocab_size=1000, label_smoothing=eps
        )
        got_loss, got_rank = jax.jit(
            lambda x, W: sharded_ce_and_rank(x, W, labels, weights, mesh,
                                             vocab_size=1000,
                                             label_smoothing=eps)
        )(xs, Ws)
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_rank),
                                      np.asarray(want_rank))

    @pytest.mark.parametrize("model_axis", [2, 4])
    def test_sharded_topk_matches_unsharded(self, model_axis):
        """Local per-shard top-k + candidate merge == fused_topk on the
        gathered table (scores AND ids), incl. the padded-row vocab bound."""
        from transformers4rec_tpu.ops.vocab import fused_topk
        from transformers4rec_tpu.parallel import make_mesh
        from transformers4rec_tpu.parallel.sharded_embedding import (
            shard_table,
            sharded_topk,
        )

        mesh = make_mesh(model=model_axis)
        rng = np.random.default_rng(23)
        N, E, V, vsz, k = 16, 16, 1024, 1000, 20
        x = jnp.asarray(rng.normal(size=(N, E)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(V, E)).astype(np.float32))
        want_s, want_i = fused_topk(x, W, k, vocab_size=vsz)
        Ws = shard_table(W, mesh)
        xs = jax.device_put(
            x, jax.NamedSharding(mesh, P("data", None))
        )
        got_s, got_i = jax.jit(
            lambda x, W: sharded_topk(x, W, k, mesh, vocab_size=vsz)
        )(xs, Ws)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        assert np.all(np.asarray(got_i) < vsz)


def test_vocab_parallel_task_end_to_end_matches_replicated():
    """NextItemPredictionTask(vocab_parallel_mesh=mesh): full Trainer
    train+evaluate at mesh_model_axis=2 with the row-sharded table routed
    through the shard_map CE — losses and metrics match the auto-partitioned
    (replicated-math) path step for step."""
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.parallel import make_mesh

    schema = synthetic_ecommerce_data_schema(
        num_items=32768, num_categories=20, max_session_length=10
    )
    mesh = make_mesh(model=2)

    def run(vocab_parallel):
        im = tr.TabularSequenceFeatures.from_schema(
            schema, d_output=32, masking="mlm", aggregation="concat",
            embedding_dims={schema.item_id_column_name: 16},
        )
        cfg = tr.transformer_registry.parse("xlnet").build(
            d_model=32, n_head=2, n_layer=1, total_seq_length=10
        )
        task = tr.NextItemPredictionTask(
            weight_tying=True,
            vocab_parallel_mesh=mesh if vocab_parallel else None,
        )
        model = cfg.to_model(im, task)
        args = tr.T4RecTrainingArguments(
            output_dir=f"/tmp/t4r_vp_{vocab_parallel}",
            data_loader_engine="synthetic",
            max_sequence_length=10,
            per_device_train_batch_size=4,
            per_device_eval_batch_size=4,
            max_steps=3,
            logging_steps=1,
            mesh_model_axis=2,
            seed=11,
            # the baseline arm must NOT auto-engage (32768 rows crosses the
            # auto threshold) — it pins the XLA-partitioned replicated math
            auto_vocab_parallel=False,
        )
        trainer = tr.Trainer(model=model, args=args, schema=schema, mesh=mesh)
        trainer.train()
        losses = [h["loss"] for h in trainer.state.log_history if "loss" in h]
        ev = trainer.evaluate()
        return losses, ev

    base_losses, base_ev = run(False)
    vp_losses, vp_ev = run(True)
    np.testing.assert_allclose(vp_losses, base_losses, rtol=2e-4)
    for k, v in base_ev.items():
        if k.startswith("eval_/") or k == "eval_loss":
            np.testing.assert_allclose(vp_ev[k], v, rtol=2e-4, atol=1e-6,
                                       err_msg=k)


def _vp_model_and_schema(num_items=32768, label_smoothing=0.0,
                         weight_tying=True, sampled=False):
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        embedding_dims={schema.item_id_column_name: 16},
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    task = tr.NextItemPredictionTask(
        weight_tying=weight_tying, label_smoothing=label_smoothing,
        sampled_softmax=sampled, target_dim=None if weight_tying else num_items,
    )
    return schema, cfg.to_model(im, task)


class TestAutoVocabParallel:
    """Trainer auto-engagement: with mesh_model_axis>1 and a tied table that
    row-shards, the task must come out carrying vocab_parallel_mesh — the
    default path would silently all-gather the (V, E) table every step."""

    def _args(self, tmpdir_name, **kw):
        import transformers4rec_tpu as tr

        kw.setdefault("mesh_model_axis", 2)
        return tr.T4RecTrainingArguments(
            output_dir=f"/tmp/{tmpdir_name}",
            data_loader_engine="synthetic",
            max_sequence_length=10,
            per_device_train_batch_size=4,
            per_device_eval_batch_size=4,
            max_steps=2,
            seed=3,
            **kw,
        )

    def _task(self, trainer):
        return trainer.model.heads[0].tasks[0]

    def test_engages_above_threshold(self):
        import transformers4rec_tpu as tr

        schema, model = _vp_model_and_schema(num_items=32768,
                                             label_smoothing=0.2)
        trainer = tr.Trainer(
            model=model, args=self._args("t4r_avp_on"), schema=schema
        )
        assert self._task(trainer).vocab_parallel_mesh is trainer.mesh
        # and the rewritten model trains + evals end-to-end (ε=0.2 exercises
        # the smoothed sharded kernels through the production Trainer)
        trainer.train()
        ev = trainer.evaluate()
        assert np.isfinite(ev["eval_loss"])

    def test_no_engage_small_vocab(self):
        import transformers4rec_tpu as tr

        schema, model = _vp_model_and_schema(num_items=1024)
        trainer = tr.Trainer(
            model=model, args=self._args("t4r_avp_small"), schema=schema
        )
        assert self._task(trainer).vocab_parallel_mesh is None

    def test_no_engage_when_disabled_or_data_parallel(self):
        import transformers4rec_tpu as tr

        schema, model = _vp_model_and_schema(num_items=32768)
        t = tr.Trainer(
            model=model,
            args=self._args("t4r_avp_off", auto_vocab_parallel=False),
            schema=schema,
        )
        assert self._task(t).vocab_parallel_mesh is None
        t2 = tr.Trainer(
            model=model, args=self._args("t4r_avp_dp", mesh_model_axis=1),
            schema=schema,
        )
        assert self._task(t2).vocab_parallel_mesh is None

    def test_engages_sampled_softmax_for_eval(self):
        """Sampled-softmax tasks engage TOO: their training branch ignores
        the mesh (O(N) row gathers), but evaluate()/predict() are always
        full-vocab and would all-gather the row-sharded table without it."""
        import transformers4rec_tpu as tr

        schema, model = _vp_model_and_schema(num_items=32768, sampled=True)
        trainer = tr.Trainer(
            model=model, args=self._args("t4r_avp_sampled"), schema=schema
        )
        assert self._task(trainer).vocab_parallel_mesh is trainer.mesh
        trainer.train()
        ev = trainer.evaluate()
        assert np.isfinite(ev["eval_loss"])

    def test_predict_topk_routes_sharded_and_matches_replicated(self, monkeypatch):
        """Trainer.predict() under the auto-engaged mesh must ROUTE through
        sharded_topk (pinned via wrapper) and — below the streaming
        threshold, where the sharded route computes f32 like the
        data-parallel einsum — return the SAME ids and scores. Exact
        bf16-route equality vs fused_topk is pinned separately
        (TestVocabParallelCE::test_sharded_topk_*)."""
        import transformers4rec_tpu as tr
        from transformers4rec_tpu.parallel import sharded_embedding as se

        calls = []
        orig = se.sharded_topk
        monkeypatch.setattr(
            se, "sharded_topk",
            lambda *a, **kw: calls.append(1) or orig(*a, **kw),
        )

        def run(model_axis):
            schema, model = _vp_model_and_schema(num_items=32768)
            args = self._args(
                f"t4r_avp_pred{model_axis}", mesh_model_axis=model_axis,
                predict_top_k=5,
            )
            trainer = tr.Trainer(model=model, args=args, schema=schema)
            return trainer.predict()

        s1, i1 = run(1)
        assert not calls, "data-parallel predict must not use sharded_topk"
        s2, i2 = run(2)
        assert calls, "model-parallel predict must route through sharded_topk"
        # identical seeded init params + f32 sharded route at this size:
        # ids and scores must match the data-parallel run exactly
        np.testing.assert_allclose(s2, s1, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(i2, i1)
        # cardinality = num_items + 1 (0 is padding): valid ids 0..32768
        assert (i2 >= 0).all() and (i2 <= 32768).all()


def test_optimizer_moments_sharded_at_init():
    """The (V, E) optimizer moments must be row-sharded IMMEDIATELY at
    _ensure_state — not only after the first compiled step's output
    shardings fix them up. A bare jit(tx.init) (no out_shardings) lands the
    full moment on ONE device: at the 100M-row north star that is an OOM
    before the first step ever runs. Also pins the eager fused_adafactor
    init inheriting the param's sharding (zeros_like, not zeros)."""
    import jax
    import transformers4rec_tpu as tr

    schema, model = _vp_model_and_schema(num_items=32768)
    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_moment_init",
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=4,
        max_steps=2,
        embedding_optimizer="adafactor",
        mesh_model_axis=2,
        seed=3,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    loader = trainer.get_train_dataloader()
    trainer._ensure_state(next(iter(loader)), 2)  # NO train step
    specs = {
        jax.tree_util.keystr(p): leaf.sharding.spec
        for p, leaf in jax.tree_util.tree_leaves_with_path(
            trainer._train_state.opt_state
        )
        if "item_id_table" in jax.tree_util.keystr(p)
        and getattr(leaf, "ndim", 0) >= 2
    }
    assert specs, "no table moments found"
    for k, s in specs.items():
        assert s and s[0] == "model", (k, s)

    # eager fused_adafactor init on a sharded table inherits its sharding
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor
    from transformers4rec_tpu.parallel.sharded_embedding import shard_table

    mesh = make_mesh(model=2)
    table = shard_table(jnp.zeros((32768, 16)), mesh)
    state = fused_adafactor(1e-3).init(table)
    v = [x for x in jax.tree_util.tree_leaves(state.v) if x.ndim == 2][0]
    assert v.sharding.spec == P("model", None), v.sharding


def test_vocab_parallel_composes_with_session_packing():
    """vocab_parallel_mesh x pack_sessions: packed train batches (segment_ids
    block-diagonal attention) through the shard_map CE — finite decreasing
    loss and packed-eval metrics at mesh_model_axis=2."""
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.parallel import make_mesh

    schema = synthetic_ecommerce_data_schema(
        num_items=32768, num_categories=20, max_session_length=10
    )
    mesh = make_mesh(model=2)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat",
        embedding_dims={schema.item_id_column_name: 16},
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(
        im, tr.NextItemPredictionTask(weight_tying=True,
                                      vocab_parallel_mesh=mesh)
    )
    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_vp_pack",
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=4,
        per_device_eval_batch_size=4,
        max_steps=6,
        logging_steps=1,
        pack_sessions=True,
        pack_eval_sessions=True,
        mesh_model_axis=2,
        learning_rate=1e-2,
        seed=4,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema, mesh=mesh)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0]
    e = trainer.evaluate()
    assert np.isfinite(e["eval_loss"])
    assert any(k.startswith("eval_/") for k in e)
