"""Sparse/lazy embedding-optimizer tests (ops/sparse_update.py).

The reference has no analog (dense torch Adam everywhere); these pin the
lazy-Adam semantics (untouched rows frozen) and the equivalence of the
gather/scatter sparse path — incl. its shard_map variant — to the dense
lazy update.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from transformers4rec_tpu.ops.sparse_update import (
    dedupe_row_grads,
    label_embedding_params,
    lazy_adam,
    sharded_rows_adam_update,
    sparse_rows_adam_init,
    sparse_rows_adam_update,
)

V, E = 64, 8
LR = 0.1


@pytest.fixture(scope="module")
def table():
    return jax.random.normal(jax.random.PRNGKey(0), (V, E)) * 0.1


def _dense_grad_from_rows(ids, row_grads):
    g = jnp.zeros((V, E))
    return g.at[ids].add(row_grads)


def test_lazy_adam_freezes_untouched_rows(table):
    tx = lazy_adam(LR)
    state = tx.init(table)
    ids = jnp.asarray([3, 7, 7, 20])
    rg = jax.random.normal(jax.random.PRNGKey(1), (4, E))
    g = _dense_grad_from_rows(ids, rg)

    upd, state = tx.update(g, state)
    p1 = optax.apply_updates(table, upd)
    touched = np.asarray(jnp.unique(ids))
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_array_equal(np.asarray(p1)[untouched],
                                  np.asarray(table)[untouched])
    assert np.abs(np.asarray(p1)[touched] - np.asarray(table)[touched]).max() > 0

    # second step touching OTHER rows must not decay the first rows' moments
    mu_before = np.asarray(state.mu)[touched]
    g2 = _dense_grad_from_rows(jnp.asarray([1]), rg[:1])
    _, state = tx.update(g2, state)
    np.testing.assert_array_equal(np.asarray(state.mu)[touched], mu_before)


def test_lazy_adam_matches_adam_when_all_rows_touched(table):
    """With every row touched each step, lazy == standard adam."""
    g = jax.random.normal(jax.random.PRNGKey(2), (V, E))
    g = jnp.where(g == 0, 1e-3, g)
    lazy, ref = lazy_adam(LR), optax.adam(LR)
    sl, sr = lazy.init(table), ref.init(table)
    pl = pr = table
    for _ in range(3):
        ul, sl = lazy.update(g, sl)
        ur, sr = ref.update(g, sr, pr)
        pl = optax.apply_updates(pl, ul)
        pr = optax.apply_updates(pr, ur)
    np.testing.assert_allclose(np.asarray(pl), np.asarray(pr), atol=1e-6)


def test_dedupe_row_grads_merges_duplicates():
    ids = jnp.asarray([5, 3, 5, 9, 3, 5])
    rg = jnp.arange(6 * E, dtype=jnp.float32).reshape(6, E)
    uids, summed = dedupe_row_grads(ids, rg, V)
    got = {int(u): np.asarray(s) for u, s in zip(uids, summed) if int(u) < V}
    assert set(got) == {3, 5, 9}
    np.testing.assert_allclose(got[5], np.asarray(rg[0] + rg[2] + rg[5]))
    np.testing.assert_allclose(got[3], np.asarray(rg[1] + rg[4]))
    # padding slots carry the out-of-range sentinel
    assert int((uids == V).sum()) == 3


def test_sparse_rows_matches_dense_lazy_adam(table):
    """Gather/scatter path == mask-based lazy adam, duplicates included."""
    tx = lazy_adam(LR)
    dstate = tx.init(table)
    sstate = sparse_rows_adam_init(table)
    pd = ps = table
    rng = jax.random.PRNGKey(3)
    for i in range(4):
        rng, k1, k2 = jax.random.split(rng, 3)
        ids = jax.random.randint(k1, (10,), 0, V)
        rg = jax.random.normal(k2, (10, E))
        upd, dstate = tx.update(_dense_grad_from_rows(ids, rg), dstate)
        pd = optax.apply_updates(pd, upd)
        ps, sstate = sparse_rows_adam_update(ps, sstate, ids, rg, LR)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sstate.mu), np.asarray(dstate.mu),
                               atol=1e-6)


def test_sharded_rows_matches_unsharded(table):
    from transformers4rec_tpu.parallel import make_mesh
    from transformers4rec_tpu.parallel.sharded_embedding import shard_table

    mesh = make_mesh(model=2)
    st = shard_table(table, mesh)
    sh_state = sparse_rows_adam_init(st)
    un_state = sparse_rows_adam_init(table)
    ids = jnp.asarray([0, 5, 33, 33, 63, 5])
    rg = jax.random.normal(jax.random.PRNGKey(4), (6, E))

    p_un, un_state = sparse_rows_adam_update(table, un_state, ids, rg, LR)
    p_sh, sh_state = sharded_rows_adam_update(st, sh_state, ids, rg, LR, mesh)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_un), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sh_state.nu), np.asarray(un_state.nu),
                               atol=1e-6)


def test_label_embedding_params():
    params = {"params": {"item_id_table": jnp.zeros((4, 2)),
                         "dense": {"kernel": jnp.zeros((2, 2))}}}
    labels = label_embedding_params(params)
    assert labels["params"]["item_id_table"] == "table"
    assert labels["params"]["dense"]["kernel"] == "dense"


def test_trainer_lazy_adam_trains():
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=500, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_lazy_adam",
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=16,
        max_steps=12,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="lazy_adam",
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    metrics = trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert hist[-1] < hist[0]
    assert np.isfinite(metrics["train_loss"])


def test_trainer_adafactor_embedding_trains():
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=500, num_categories=20, max_session_length=10
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_adafactor",
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=16,
        max_steps=12,
        learning_rate=1e-2,
        logging_steps=1,
        embedding_optimizer="adafactor",
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert hist[-1] < hist[0]
