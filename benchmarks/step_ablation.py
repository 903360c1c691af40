"""Decompose the bench.py train step into its cost components (TPU).

Runs the EXACT bench config (REES46 XLNet-MLM: d_model=192, 3 layers, 16
heads, batch 128, seq 20, V=390k) with targeted ablations, each a full jitted
train step — full-step A/Bs are the only timing methodology that holds up on
the tunneled axon backend (CLAUDE.md: isolated-op microbenches inflate
10-100x; run-to-run variance ±15% → 2 reps per arm).

Arms:
  full        exact bench.py step (fused CE + budget, adamw dense /
              adafactor table)
  no_ce       fused_softmax_ce monkeypatched to a free surrogate -> removes
              the CE fwd+bwd kernels AND dW (table grad = lookup scatter only)
  table_sgd   table optimizer adafactor -> plain sgd (isolates adafactor's
              extra HBM passes over the (V,E) grad/param)
  all_sgd     every param on sgd (isolates total optimizer overhead vs the
              sgd floor: read grad+param, write param)

Prints one JSON line per arm with ms/step for each rep.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import functools
import json
import os
import time

import jax
import jax.numpy as jnp


def build_step(arm: str, n_head: int = 16, n_layer: int = 3,
               k_pack: int = 1, moment_bf16: bool = False):
    import optax

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.ops.sparse_update import label_embedding_params
    from transformers4rec_tpu.parallel import make_mesh, param_shardings, shard_batch

    NUM_ITEMS = 390_000
    D_MODEL, N_LAYER, N_HEAD = 192, n_layer, n_head
    SEQ, BATCH = 20, 128

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
        tr.NextItemPredictionTask(weight_tying=True, sampled_softmax=False),
    )

    if arm == "packed_sessions":
        # first-fit-packed rows (~1.8 sessions/row at this length dist): same
        # static shapes + SAME static CE budget (it already assumes all
        # positions valid), so per-row step cost should be ~unchanged while
        # each row carries ~1.8x the sessions
        from transformers4rec_tpu.data.packing import pack_sessions, packing_stats

        ragged = synthetic_data(schema, num_rows=2 * BATCH,
                                max_session_length=SEQ, seed=0, ragged=True)
        data = pack_sessions(ragged, max_len=SEQ, item_id_col="item_id",
                             num_rows=BATCH)
        print(json.dumps({"packing": packing_stats(data, "item_id")}), flush=True)
    else:
        data = synthetic_data(schema, num_rows=BATCH, max_session_length=SEQ, seed=0)
    batch_host = {k: jnp.asarray(v) for k, v in data.items()}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    tiny = {k: v[:8] for k, v in batch_host.items()}
    params = model.init(rngs, tiny, training=True)
    params = jax.device_put(params, param_shardings(params, mesh))

    if arm == "all_sgd":
        tx = optax.sgd(6.7e-4)
    elif arm == "table_sgd":
        tx = optax.multi_transform(
            {"dense": optax.adamw(6.7e-4), "table": optax.sgd(6.7e-4)},
            label_embedding_params,
        )
    elif (arm in ("fused_af", "fused_af_factored", "packed_sessions")
          or arm.startswith("packed") or moment_bf16):
        # fused_af = the bench default (unfactored, quality-pinned);
        # fused_af_factored = rank-1 moments (perf reference only — measured
        # quality loss at 2000 steps, see ops/fused_adafactor.py);
        # moment_bf16 (the '+bf16m' modifier) = bf16-STORED second moment,
        # the r4 bench/trainer default
        from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

        kw = {"min_dim_size_to_factor": 64} if arm == "fused_af_factored" else {}
        if moment_bf16:
            kw["moment_dtype"] = jnp.bfloat16
        tx = optax.multi_transform(
            {
                "dense": optax.adamw(6.7e-4),
                "table": fused_adafactor(6.7e-4, **kw),
            },
            label_embedding_params,
        )
    else:
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
    batch = shard_batch(batch_host, mesh)

    import optax as _optax

    def one_step(params, opt_state, batch, rng):
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
        return _optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng):
        return one_step(params, opt_state, batch, rng)

    if arm.startswith("packed") and arm.removeprefix("packed").isdigit():
        k_pack = int(arm.removeprefix("packed"))
    if k_pack > 1:
        # K steps per dispatch via lax.scan — amortizes the ~0.8ms dispatch
        # floor; reports per-inner-step time
        K = k_pack

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, rng):  # noqa: F811
            def body(carry, r):
                p, o = carry
                p, o, loss = one_step(p, o, batch, r)
                return (p, o), loss

            rs = jax.random.split(rng, K)
            (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), rs)
            return params, opt_state, losses[-1]

        train_step._packed = K  # type: ignore[attr-defined]

    return train_step, params, opt_state, batch


def run_arm(arm: str, steps: int = 30, warmup: int = 3, reps: int = 2):
    # heads<N> arms probe head-dim MXU padding (d_head = 192/n_head; tiles
    # pad to 128 lanes, so dh=12 runs the attention GEMMs at ~10% MXU util)
    #
    # Arms compose with '+'-separated modifiers so the decomposition can run
    # at the CURRENT bench operating point (K-packing + bf16 moments):
    #   packed<K>  — lax.scan K steps per dispatch
    #   bf16m      — bf16-stored adafactor second moment (r4 default)
    #   no_ce / table_sgd / all_sgd — the ablation itself
    # e.g. "no_ce+packed32+bf16m" = current bench step minus the CE kernels.
    n_head = 16
    n_layer = 3
    label = arm
    k_pack = 1
    moment_bf16 = False
    parts = arm.split("+")
    bases = []
    for p in parts:
        if p.startswith("packed") and p.removeprefix("packed").isdigit():
            k_pack = int(p.removeprefix("packed"))
        elif p == "bf16m":
            moment_bf16 = True
        elif p.startswith("heads") and p.removeprefix("heads").isdigit():
            n_head = int(p.removeprefix("heads"))
        elif p.startswith("layers") and p.removeprefix("layers").isdigit():
            n_layer = int(p.removeprefix("layers"))
        else:
            bases.append(p)
    KNOWN_BASES = {"full", "no_ce", "table_sgd", "all_sgd", "fused_af",
                   "fused_af_factored", "packed_sessions"}
    if len(bases) > 1 or (bases and bases[0] not in KNOWN_BASES):
        # an unknown part must not silently fall to the optax.adafactor
        # else-branch and report a mislabeled row in the ablation JSONL
        raise SystemExit(f"unknown/ambiguous arm parts {bases!r} in {label!r}"
                         f" (known bases: {sorted(KNOWN_BASES)})")
    arm = bases[0] if bases else "fused_af"
    if arm == "no_ce":
        import transformers4rec_tpu.ops.vocab as vocab

        real = vocab.fused_softmax_ce

        def surrogate(x, W, labels, weights, *a, **kw):
            # same reduction shape, no vocab GEMM, no dW
            w = weights.astype(jnp.float32)
            return (x.sum(-1) * w).sum() / jnp.maximum(w.sum(), 1.0)

        vocab.fused_softmax_ce = surrogate
    try:
        step, params, opt_state, batch = build_step(
            arm, n_head=n_head, n_layer=n_layer, k_pack=k_pack,
            moment_bf16=moment_bf16)
        k = getattr(step, "_packed", 1)
        rng = jax.random.PRNGKey(7)
        times = []
        for rep in range(reps):
            for _ in range(warmup):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state, batch, sub)
            float(loss)
            t0 = time.perf_counter()
            for _ in range(steps):
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state, batch, sub)
            float(loss)
            times.append((time.perf_counter() - t0) / steps / k * 1e3)
        print(json.dumps({"arm": label, "ms_per_step": [round(t, 3) for t in times]}),
              flush=True)
    finally:
        if arm == "no_ce":
            vocab.fused_softmax_ce = real


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import sys

    arms = sys.argv[1:] or ["full", "no_ce", "table_sgd", "all_sgd"]
    for arm in arms:
        run_arm(arm)


if __name__ == "__main__":
    main()
