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
    sparse_rows_adafactor_init,
    sparse_rows_adafactor_update,
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


def test_sparse_rows_adafactor_matches_dense_when_all_touched(table):
    """With every row touched each step, the O(N·E) adafactor rows update ==
    dense fused_adafactor (unfactored) — same decay schedule, eps placement,
    rsqrt, and update-RMS clip."""
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

    tx = fused_adafactor(LR)
    dstate = tx.init({"t": table})
    sstate = sparse_rows_adafactor_init(table)
    pd = {"t": table}
    ps = table
    rng = jax.random.PRNGKey(5)
    for _ in range(3):
        rng, k = jax.random.split(rng)
        ids = jnp.arange(V)
        rg = jax.random.normal(k, (V, E)) * 3.0  # big enough to engage clip
        upd, dstate = tx.update({"t": rg}, dstate, pd)
        pd = optax.apply_updates(pd, upd)
        ps, sstate = sparse_rows_adafactor_update(ps, sstate, ids, rg, LR)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pd["t"]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sstate.v), np.asarray(dstate.v["t"]),
                               rtol=1e-5)


def test_sparse_rows_adafactor_partial_touch(table):
    """Partial touch: touched rows match the dense op's first step EXACTLY
    (the clip RMS divides by the full V·E on both sides); untouched rows and
    their moments stay frozen (lazy semantics)."""
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

    ids = jnp.asarray([2, 9, 9, 41])
    rg = jax.random.normal(jax.random.PRNGKey(6), (4, E)) * 5.0
    g_dense = _dense_grad_from_rows(ids, rg)

    tx = fused_adafactor(LR)
    dstate = tx.init({"t": table})
    upd, _ = tx.update({"t": g_dense}, dstate, {"t": table})
    pd = optax.apply_updates({"t": table}, upd)["t"]

    sstate = sparse_rows_adafactor_init(table)
    ps, sstate = sparse_rows_adafactor_update(table, sstate, ids, rg, LR)

    touched = np.asarray([2, 9, 41])
    untouched = np.setdiff1d(np.arange(V), touched)
    np.testing.assert_allclose(np.asarray(ps)[touched],
                               np.asarray(pd)[touched], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ps)[untouched],
                                  np.asarray(table)[untouched])
    np.testing.assert_array_equal(np.asarray(sstate.v)[untouched], 0.0)

    # second step touching OTHER rows must not decay the first rows' v
    v_before = np.asarray(sstate.v)[touched]
    _, sstate = sparse_rows_adafactor_update(
        ps, sstate, jnp.asarray([1]), rg[:1], LR)
    np.testing.assert_array_equal(np.asarray(sstate.v)[touched], v_before)


@pytest.mark.parametrize("rule", ["adam", "adafactor"])
def test_sparse_moment_dtype_bf16(table, rule):
    """bf16-STORED moments (f32 compute): state dtype narrows, the table
    stays f32, and a few steps track the f32-state arm closely."""
    ids = jnp.asarray([0, 5, 5, 17, 33])
    rngk = jax.random.PRNGKey(7)
    if rule == "adam":
        init, upd_fn = sparse_rows_adam_init, sparse_rows_adam_update
    else:
        init, upd_fn = (sparse_rows_adafactor_init,
                        sparse_rows_adafactor_update)
    s16 = init(table, moment_dtype=jnp.bfloat16)
    s32 = init(table)
    for leaf in jax.tree_util.tree_leaves(s16):
        assert leaf.dtype in (jnp.bfloat16, jnp.int32)
    p16 = p32 = table
    for i in range(3):
        rngk, k = jax.random.split(rngk)
        rg = jax.random.normal(k, (5, E))
        p16, s16 = upd_fn(p16, s16, ids, rg, LR)
        p32, s32 = upd_fn(p32, s32, ids, rg, LR)
    assert p16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                               atol=5e-3)


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
