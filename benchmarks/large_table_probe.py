"""Where do 44 ms/step go at a 4M-row table? (config-4 follow-up probe)

run_all's config 4 (4M rows x E=64, sampled softmax n=8192, adafactor,
K=8 packing) measured ~2.9k examples/s/chip = ~44 ms/step — ~6x a naive
HBM-traffic estimate (param+moment+grad ~3GB, a handful of passes at
819 GB/s ≈ 7 ms). Candidate explanations, each isolated as a full-step arm
(the only methodology that holds up on the tunneled backend — CLAUDE.md):

  adafactor    the run_all arm (baseline)
  adafactor_f32  moment_dtype=None (is the bf16 round-trip hurting here?)
  sgd          plain sgd on the table -> removes ALL optimizer state
               traffic; leaves the dense (V, E) grad materialization
  no_table_grad  stop_gradient on the embedding lookup -> removes the dense
               (V, E) grad buffer AND the optimizer (isolates the rest of
               the step: encoder + sampled CE + dense params)
  k1           adafactor at K=1 (does the K=8 scan double-buffer the
               donated (V, E) state?)

Usage: python benchmarks/large_table_probe.py [--rows 4000000] [--reps 2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--arms", default="adafactor,adafactor_f32,sgd,"
                                      "no_table_grad,k1")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))

    import optax

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor
    from transformers4rec_tpu.ops.sparse_update import label_embedding_params
    from transformers4rec_tpu.parallel import make_mesh, shard_stacked_batches

    SEQ, BATCH = 20, 128
    mesh = make_mesh(model=1)
    schema = synthetic_ecommerce_data_schema(
        num_items=args.rows, num_categories=150, max_session_length=SEQ
    )

    def run(arm: str) -> list:
        k = 1 if arm == "k1" else 8
        im = tr.TabularSequenceFeatures.from_schema(
            schema, d_output=192, masking="mlm", aggregation="concat",
            masking_kwargs={"mlm_probability": 0.3},
            embedding_dims={schema.item_id_column_name: 64},
        )
        cfg = tr.transformer_registry.parse("xlnet").build(
            d_model=192, n_head=16, n_layer=3, total_seq_length=SEQ
        )
        model = cfg.to_model(
            im, tr.NextItemPredictionTask(
                weight_tying=True, sampled_softmax=True, max_n_samples=8192
            ),
        )
        data = synthetic_data(schema, num_rows=BATCH * k,
                              max_session_length=SEQ, seed=0)
        rngs = {
            "params": jax.random.PRNGKey(0),
            "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
            "sampling": jax.random.PRNGKey(3),
        }
        tiny = {kk: jnp.asarray(v[:8]) for kk, v in data.items()}
        params = model.init(rngs, tiny, training=True)

        if arm in ("adafactor", "k1"):
            table_tx = fused_adafactor(6.7e-4, moment_dtype=jnp.bfloat16)
        elif arm == "adafactor_f32":
            table_tx = fused_adafactor(6.7e-4)
        else:
            table_tx = optax.sgd(6.7e-4)
        tx = optax.multi_transform(
            {"dense": optax.adamw(6.7e-4), "table": table_tx},
            label_embedding_params,
        )
        opt_state = jax.jit(tx.init)(params)

        apply_rngs = {kk: v for kk, v in rngs.items() if kk != "params"}
        stop_table = arm == "no_table_grad"

        def one_step(state, batch):
            params, opt_state = state

            def loss_fn(p):
                if stop_table:
                    p = jax.tree_util.tree_map_with_path(
                        lambda path, x: (
                            jax.lax.stop_gradient(x)
                            if "item_id_table" in jax.tree_util.keystr(path)
                            else x
                        ),
                        p,
                    )
                loss, _ = model.apply(p, batch, training=True, rngs=apply_rngs)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_opt), loss

        @jax.jit
        def multi(state, stacked):
            return jax.lax.scan(one_step, state, stacked)

        stacked = shard_stacked_batches(
            [
                {kk: v[i * BATCH:(i + 1) * BATCH] for kk, v in data.items()}
                for i in range(k)
            ],
            mesh,
        )
        state = (params, opt_state)
        state, losses = multi(state, stacked)  # compile + warm
        state, losses = multi(state, stacked)
        float(losses[-1])
        out = []
        for _ in range(args.reps):
            execs = max(16 // k, 2)
            t0 = time.perf_counter()
            for _ in range(execs):
                state, losses = multi(state, stacked)
            float(losses[-1])
            dt = time.perf_counter() - t0
            out.append(round(dt / (execs * k) * 1000, 2))
        return out

    for arm in args.arms.split(","):
        ms = run(arm.strip())
        print(json.dumps({"arm": arm.strip(), "rows": args.rows,
                          "ms_per_step": ms}), flush=True)


if __name__ == "__main__":
    main()
