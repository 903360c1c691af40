"""Large-vocab stress config: sharded embedding table + sampled softmax.

BASELINE.md config #4: a huge item table (100M rows at full scale) row-sharded
over the 'model' mesh axis with explicit shard_map lookup (+psum exchange),
trained with sampled softmax. At full scale (100M x 192 x f32 = 76GB) the
table MUST shard across ≥2 hosts; this driver exercises the identical sharded
code path at a size the available devices hold (scale with --vocab).

Run on the 8-virtual-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/large_vocab_stress.py --cpu --vocab 1000000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--seq-len", type=int, default=20)
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n-samples", type=int, default=8192)
    ap.add_argument(
        "--optimizer", choices=["adagrad", "sparse_adam"], default="sparse_adam",
        help="adagrad = dense update over the whole table each step; "
        "sparse_adam = gather rows outside autodiff + O(N*E) scatter update "
        "(ops/sparse_update.py) — the only viable mode at 100M rows",
    )
    ap.add_argument(
        "--objective", choices=["sampled", "full"], default="sampled",
        help="sampled = log-uniform sampled softmax; full = vocab-parallel "
        "FULL softmax via the shard_map CE (sharded_softmax_ce) — requires "
        "--optimizer adagrad (dense table gradient)",
    )
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # the demo shards the table over 'model'; give the CPU backend enough
        # virtual devices for a (data, model) mesh
        try:
            jax.config.update("jax_num_cpu_devices", max(2 * args.model_axis, 4))
        except RuntimeError:
            pass  # backend already initialized (e.g. under pytest)

    import jax
    import jax.numpy as jnp
    import optax

    from transformers4rec_tpu.model.prediction_task import LogUniformSampler
    from transformers4rec_tpu.parallel import batch_sharding, make_mesh
    from transformers4rec_tpu.parallel.sharded_embedding import (
        shard_table,
        sharded_embedding_lookup,
    )

    V = (args.vocab // args.model_axis) * args.model_axis
    mesh = make_mesh(model=args.model_axis)
    print(f"mesh: {dict(mesh.shape)}; table {V}x{args.dim} "
          f"({V * args.dim * 4 / 1e9:.2f} GB f32), "
          f"{V * args.dim * 4 / args.model_axis / 1e9:.2f} GB per model shard")

    table = shard_table(
        jax.random.normal(jax.random.PRNGKey(0), (V, args.dim)) * 0.05, mesh
    )
    B, S = args.batch_size, args.seq_len
    ids = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(1), (B, S), 1, V),
        batch_sharding(mesh),
    )
    # learnable toy objective: predict the session's last item from the pooled
    # session embedding (a real signal, unlike uniform-random labels)
    labels = jax.device_put(ids[:, -1], batch_sharding(mesh))
    sampler = LogUniformSampler(args.n_samples, V, min_id=1)

    def scores_loss(emb, pos_w, neg_w, neg):
        hidden = emb.mean(axis=1)  # stand-in tower: mean-pool session
        pos = (hidden * pos_w).sum(-1, keepdims=True)
        negs = hidden @ neg_w.T
        eps = 1e-16
        pos = pos - jnp.log(sampler.expected_probs(labels) + eps)[:, None]
        negs = negs - jnp.log(sampler.expected_probs(neg) + eps)[None, :]
        negs = jnp.where(labels[:, None] == neg[None, :], -1e4, negs)
        logits = jnp.concatenate([pos, negs], axis=1)
        return -jax.nn.log_softmax(logits)[:, 0].mean()

    if args.objective == "full":
        # vocab-parallel FULL softmax: the shard_map CE streams each shard's
        # rows locally and merges with O(N) collectives (sharded_softmax_ce)
        # — the output-layer path for 100M-row tables where even sampled
        # negatives' logQ table would be awkward to host
        from transformers4rec_tpu.parallel.sharded_embedding import (
            sharded_softmax_ce,
        )

        ones = jnp.ones((B,), jnp.float32)

        def loss_fn(table, rng):
            emb = sharded_embedding_lookup(table, ids, mesh)
            hidden = emb.mean(axis=1)  # (B, E)
            return sharded_softmax_ce(hidden, table, labels, ones, mesh)

    else:
        def loss_fn(table, rng):
            emb = sharded_embedding_lookup(table, ids, mesh)  # (B, S, E) via psum
            neg = sampler.sample(rng)
            pos_w = sharded_embedding_lookup(table, labels, mesh)
            neg_w = sharded_embedding_lookup(table, neg, mesh)
            return scores_loss(emb, pos_w, neg_w, neg)

    if args.objective == "full" and args.optimizer != "adagrad":
        raise SystemExit("--objective full produces a dense (V, E) gradient; "
                         "use --optimizer adagrad")
    if args.optimizer == "adagrad":
        tx = optax.adagrad(0.5)
        opt = tx.init(table)

        @jax.jit
        def step(table, opt, rng):
            loss, g = jax.value_and_grad(loss_fn)(table, rng)
            updates, opt = tx.update(g, opt, table)
            return optax.apply_updates(table, updates), opt, loss

    else:  # sparse_adam: rows gathered OUTSIDE autodiff; no dense (V,E) grad
        from transformers4rec_tpu.ops.sparse_update import (
            sharded_rows_adam_update,
            sparse_rows_adam_init,
        )

        opt = sparse_rows_adam_init(table)
        n_in, n_lab = B * S, B

        def rows_loss(rows, neg):
            emb = rows[:n_in].reshape(B, S, args.dim)
            pos_w = rows[n_in:n_in + n_lab]
            neg_w = rows[n_in + n_lab:]
            return scores_loss(emb, pos_w, neg_w, neg)

        @jax.jit
        def step(table, opt, rng):
            neg = sampler.sample(rng)
            all_ids = jnp.concatenate([ids.reshape(-1), labels, neg])
            rows = sharded_embedding_lookup(table, all_ids, mesh,
                                            data_axis=None)
            loss, g_rows = jax.value_and_grad(rows_loss)(rows, neg)
            table, opt = sharded_rows_adam_update(
                table, opt, all_ids, g_rows, 0.05, mesh
            )
            return table, opt, loss

    rng = jax.random.PRNGKey(7)
    eval_rng = jax.random.PRNGKey(99)  # fixed negatives: comparable eval loss
    eval_loss = jax.jit(loss_fn)
    initial = float(eval_loss(table, eval_rng))
    losses = []
    t0 = time.time()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        table, opt, loss = step(table, opt, sub)
        losses.append(float(loss))
    dt = time.time() - t0
    final = float(eval_loss(table, eval_rng))
    print(f"train losses: {[round(l, 4) for l in losses[:5]]}...")
    print(f"fixed-rng eval loss: {initial:.4f} -> {final:.4f}")
    print(f"{args.steps} steps in {dt:.1f}s; table sharding: {table.sharding.spec}")
    assert final < initial, "eval loss must decrease"
    print("OK")


if __name__ == "__main__":
    main()
