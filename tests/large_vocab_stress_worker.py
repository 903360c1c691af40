"""Worker for test_large_vocab_stress.py::test_32m_row_sharded_table_...

The 32M-row × E=16 stress body runs in ITS OWN process: its ~2GB-buffer XLA
CPU programs are the largest thing the suite compiles, and a host-level
SIGABRT inside the XLA compiler/runtime (observed once during a transient
host incident — CLAUDE.md round-4 notes) would otherwise kill the whole
pytest session and lose every other test's result. The launcher asserts the
worker's checks passed; an abort degrades to a skip, a Python-level failure
still fails the suite.

Prints ``STRESS OK`` as the last line on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from transformers4rec_tpu.parallel import batch_sharding, make_mesh  # noqa: E402
from transformers4rec_tpu.parallel.sharded_embedding import (  # noqa: E402
    shard_table,
    sharded_embedding_lookup,
)

V = 33_554_432  # 32M rows — ~2 GB f32 at E=16; the sharded path must never
E = 16          # materialize the full table on one device
MODEL_AXIS = 2


def main():
    from transformers4rec_tpu.model.prediction_task import LogUniformSampler
    from transformers4rec_tpu.ops.sparse_update import (
        sharded_rows_adam_update,
        sparse_rows_adam_init,
    )

    mesh = make_mesh(model=MODEL_AXIS)
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
    print("STRESS OK", flush=True)


if __name__ == "__main__":
    main()
