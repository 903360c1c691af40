"""A/B: full-softmax CE (bench default) vs sampled softmax on the bench config.

The reference exposes sampled softmax as a first-class flag
(/root/reference/transformers4rec/torch/model/prediction_task.py:589-699,
LogUniformSampler + logQ correction); here it replaces the N×V CE GEMM with a
N×(1+n_samples) one. This measures (a) train ms/step and (b) full-vocab eval
loss + recall@10 on held-out synthetic data after STEPS steps, per arm.

Run one arm per process (tunnel compiles contend badly):
    python benchmarks/sampled_softmax_ab.py --arm full
    python benchmarks/sampled_softmax_ab.py --arm sampled --n-samples 8192
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=["full", "sampled"], required=True)
    ap.add_argument("--n-samples", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--num-items", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.ops.sparse_update import label_embedding_params
    from transformers4rec_tpu.parallel import make_mesh, param_shardings, shard_batch

    NUM_ITEMS = args.num_items or (390_000 if not args.cpu else 1000)
    D_MODEL, N_LAYER, N_HEAD = 192, 3, 16
    SEQ, BATCH = 20, 128
    WARMUP = 3

    mesh = make_mesh(model=1)
    schema = synthetic_ecommerce_data_schema(
        num_items=NUM_ITEMS, num_categories=150, max_session_length=SEQ
    )
    input_module = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=D_MODEL, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},
    )
    cfg = tr.XLNetConfig.build(
        d_model=D_MODEL, n_head=N_HEAD, n_layer=N_LAYER, total_seq_length=SEQ,
        dropout=0.1,
    )
    model = cfg.to_model(
        input_module,
        tr.NextItemPredictionTask(
            weight_tying=True,
            sampled_softmax=(args.arm == "sampled"),
            max_n_samples=args.n_samples,
            label_smoothing=0.0,
        ),
    )

    train_np = synthetic_data(schema, num_rows=BATCH * 4, max_session_length=SEQ, seed=0)
    eval_np = synthetic_data(schema, num_rows=BATCH * 4, max_session_length=SEQ, seed=99)
    train_batches = [
        shard_batch({k: jnp.asarray(v[i * BATCH:(i + 1) * BATCH]) for k, v in train_np.items()}, mesh)
        for i in range(4)
    ]
    eval_batch = shard_batch({k: jnp.asarray(v) for k, v in eval_np.items()}, mesh)

    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    tiny = {k: v[:8] for k, v in train_np.items()}
    params = model.init(rngs, {k: jnp.asarray(v) for k, v in tiny.items()}, training=True)
    params = jax.device_put(params, param_shardings(params, mesh))
    tx = optax.multi_transform(
        {
            "dense": optax.adamw(6.7e-4),
            "table": optax.adafactor(
                learning_rate=6.7e-4, multiply_by_parameter_scale=False
            ),
        },
        label_embedding_params,
    )
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        r = {
            "masking": jax.random.fold_in(rng, 0),
            "dropout": jax.random.fold_in(rng, 1),
            "sampling": jax.random.fold_in(rng, 2),
        }

        def loss_fn(p):
            loss, _ = model.apply(p, batch, training=True, rngs=r)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        loss, outs = model.apply(
            params, batch, targets=batch, testing=True, compute_metrics=True
        )
        m = {k: v for k, v in outs["next-item"].metrics.items()}
        return loss, m

    rng = jax.random.PRNGKey(7)
    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(
            params, opt_state, train_batches[i % 4], sub
        )
    float(loss)

    losses = []
    t0 = time.perf_counter()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(
            params, opt_state, train_batches[i % 4], sub
        )
        if i % 10 == 0:
            losses.append(loss)
    float(loss)
    dt = time.perf_counter() - t0

    eval_loss, metrics = eval_step(params, eval_batch)
    # metric states are (sum, count)
    flat = {}
    for k, v in metrics.items():
        s, c = v
        flat[k] = round(float(s) / max(float(c), 1.0), 5)

    print(json.dumps({
        "arm": args.arm,
        "n_samples": args.n_samples if args.arm == "sampled" else None,
        "ms_per_step": round(dt / args.steps * 1000, 3),
        "examples_per_sec": round(args.steps * BATCH / dt, 1),
        "train_loss_trajectory": [round(float(l), 3) for l in losses],
        "eval_full_vocab_loss": round(float(eval_loss), 4),
        **flat,
    }))


if __name__ == "__main__":
    main()
