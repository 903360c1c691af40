"""100M-row-table north star pinned at stress scale on the virtual mesh
(VERDICT r2 item 8): a row-sharded table in the tens of millions of rows
trains through the shard_map lookup + O(N·E) sparse update with per-device
memory strictly below the full table, and the factored-adafactor opt-in keeps
optimizer state O(V + E) instead of O(V·E).

Full scale (100M × 192 f32 = 76 GB) needs multi-host HBM; the identical code
path is exercised here at 32M × 16 (2 GB) on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformers4rec_tpu.parallel import batch_sharding, make_mesh
from transformers4rec_tpu.parallel.sharded_embedding import (
    shard_table,
    sharded_embedding_lookup,
)

V = 33_554_432  # 32M rows — ~2 GB f32 at E=16; the sharded path must never
E = 16          # materialize the full table on one device
MODEL_AXIS = 2


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(model=MODEL_AXIS)


def test_32m_row_sharded_table_trains_sparse_adam(mesh):
    """3 sparse-adam steps over a 32M-row sharded table: finite decreasing
    loss, (V/2, E) per-device shards, per-device bytes < full-table bytes."""
    from transformers4rec_tpu.model.prediction_task import LogUniformSampler
    from transformers4rec_tpu.ops.sparse_update import (
        sharded_rows_adam_update,
        sparse_rows_adam_init,
    )

    table = shard_table(
        jax.random.normal(jax.random.PRNGKey(0), (V, E)) * 0.05, mesh
    )
    full_bytes = V * E * 4
    # per-device memory: every addressable shard holds exactly 1/model_axis
    # of the rows — the property that makes 100M-row tables fit at all
    assert table.sharding.spec[0] == "model"
    for shard in table.addressable_shards:
        assert shard.data.shape == (V // MODEL_AXIS, E)
        assert shard.data.nbytes == full_bytes // MODEL_AXIS < full_bytes

    B, S, N_NEG = 32, 10, 512
    ids = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (B, S), 1, V),
        batch_sharding(mesh),
    )
    labels = jax.device_put(ids[:, -1], batch_sharding(mesh))
    sampler = LogUniformSampler(N_NEG, V, min_id=1)
    n_in, n_lab = B * S, B

    def scores_loss(rows, neg):
        hidden = rows[:n_in].reshape(B, S, E).mean(axis=1)
        pos_w, neg_w = rows[n_in:n_in + n_lab], rows[n_in + n_lab:]
        eps = 1e-16
        pos = (hidden * pos_w).sum(-1, keepdims=True)
        pos = pos - jnp.log(sampler.expected_probs(labels) + eps)[:, None]
        negs = hidden @ neg_w.T
        negs = negs - jnp.log(sampler.expected_probs(neg) + eps)[None, :]
        negs = jnp.where(labels[:, None] == neg[None, :], -1e4, negs)
        logits = jnp.concatenate([pos, negs], axis=1)
        return -jax.nn.log_softmax(logits)[:, 0].mean()

    opt = sparse_rows_adam_init(table)
    # moments mirror the table's sharding — a replicated moment would cost a
    # full table per device
    assert opt.mu.sharding.spec[0] == "model"
    assert opt.nu.sharding.spec[0] == "model"

    @jax.jit
    def step(table, opt, rng):
        neg = sampler.sample(rng)
        all_ids = jnp.concatenate([ids.reshape(-1), labels, neg])
        rows = sharded_embedding_lookup(table, all_ids, mesh, data_axis=None)
        loss, g_rows = jax.value_and_grad(scores_loss)(rows, neg)
        table, opt = sharded_rows_adam_update(
            table, opt, all_ids, g_rows, 0.05, mesh
        )
        return table, opt, loss

    rng = jax.random.PRNGKey(7)
    eval_rng = jax.random.PRNGKey(99)

    def eval_loss(table):
        neg = sampler.sample(eval_rng)
        all_ids = jnp.concatenate([ids.reshape(-1), labels, neg])
        rows = sharded_embedding_lookup(table, all_ids, mesh, data_axis=None)
        return float(scores_loss(rows, neg))

    initial = eval_loss(table)
    losses = []
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        table, opt, loss = step(table, opt, sub)
        losses.append(float(loss))
    final = eval_loss(table)
    assert all(np.isfinite(losses)), losses
    assert final < initial, (initial, final)
    # updates kept the sharding (no silent all-gather into a replicated table)
    assert table.sharding.spec[0] == "model"
    for shard in table.addressable_shards:
        assert shard.data.nbytes == full_bytes // MODEL_AXIS


def test_factored_adafactor_state_is_sub_table(mesh):
    """The 100M-row opt-in: factored adafactor second moments are O(V + E)
    vectors (NOT an O(V·E) table), and the row vector rides the table's
    'model' sharding."""
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

    table = shard_table(
        jax.random.normal(jax.random.PRNGKey(0), (1 << 20, 64)) * 0.05, mesh
    )
    tx = fused_adafactor(1e-3, min_dim_size_to_factor=32)  # force factoring
    state = tx.init(table)

    leaves = {
        jax.tree_util.keystr(p): leaf
        for p, leaf in jax.tree_util.tree_leaves_with_path(state)
        if hasattr(leaf, "shape")
    }
    big = [k for k, v in leaves.items() if v.size >= table.size]
    assert not big, f"factored state still carries O(V*E) buffers: {big}"
    v_rows = [v for v in leaves.values() if v.shape[:1] == (table.shape[0],)]
    assert v_rows, f"no (V,)-shaped factored moment found: {list(leaves)}"
    for v in v_rows:
        assert v.sharding.spec and v.sharding.spec[0] == "model", (
            v.shape, v.sharding.spec
        )
