"""Benchmark: training throughput on the flagship XLNet-MLM config.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Config mirrors the reference's tuned REES46 XLNet-MLM run
(/root/reference/ci/test_integration.sh: d_model=192, n_layer=3, n_head=16,
batch 128, seq 20, item vocab 390k, mlm_p=0.3) — the headline benchmark in
BASELINE.md. Runs on whatever jax.devices() provides (the real TPU chip under
the driver); reports examples/sec/chip of the jitted train step.

``vs_baseline``: ratio against bench_baseline.json if present (written by a
previous run: {"value": N}), else 1.0 — the reference publishes no numbers
(BASELINE.md), so the first recorded run seeds the baseline.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    # persistent compile cache — compiles through the tunnel are slow (60-250s)
    # and repeated driver runs should reuse them where the backend allows
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import optax

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.parallel import (
        make_mesh,
        param_shardings,
        shard_stacked_batches,
    )

    NUM_ITEMS = 390_000
    D_MODEL, N_LAYER, N_HEAD = 192, 3, 16
    SEQ, BATCH_PER_CHIP = 20, 128
    STEPS, WARMUP = 30, 3
    # steps per device dispatch (trainer steps_per_execution): lax.scan of K
    # optimizer steps amortizes per-dispatch overhead — measured 11.9 -> 9.3
    # ms/step at K=8 (benchmarks/step_ablation.py packed8). Numerics are
    # bit-identical to K=1 (tests/test_trainer.py equivalence test).
    # K sweep on TPU v5e (2 runs/arm, same session): K=8 13.80k, K=16 14.09k,
    # K=32 14.23k, K=64 14.29k ex/s/chip — 32 is the knee; 64 adds <0.5%.
    K_PACK = int(os.environ.get("T4R_BENCH_K", "32"))

    n_chips = jax.device_count()
    batch_size = BATCH_PER_CHIP * n_chips
    mesh = make_mesh(model=1)

    schema = synthetic_ecommerce_data_schema(
        num_items=NUM_ITEMS, num_categories=150, max_session_length=SEQ
    )
    input_module = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=D_MODEL, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},  # paper config (test_integration.sh)
    )
    cfg = tr.XLNetConfig.build(
        d_model=D_MODEL, n_head=N_HEAD, n_layer=N_LAYER, total_seq_length=SEQ,
        dropout=0.1,
    )
    model = cfg.to_model(
        input_module,
        tr.NextItemPredictionTask(
            weight_tying=True, sampled_softmax=False, label_smoothing=0.0
        ),
    )

    data = synthetic_data(
        schema, num_rows=batch_size * K_PACK, max_session_length=SEQ, seed=0
    )
    batch_host = {k: jnp.asarray(v) for k, v in data.items()}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    # init on a tiny batch: param shapes are batch-independent and the init
    # forward is a separate (expensive) tunnel compile
    tiny = {k: v[:8] for k, v in batch_host.items()}
    params = model.init(rngs, tiny, training=True)
    if os.environ.get("T4R_BENCH_TABLE_BF16") == "1":
        # A/B knob (VERDICT r4 #5): store the (V, E) item table bf16 — every
        # table READ (lookup gather, CE fwd W-stream, CE bwd W re-read)
        # halves; dot accumulation stays f32 (preferred_element_type in the
        # kernels), but dW and the applied update land in bf16, so this is a
        # PERF probe — a quality A/B gates any default change.
        import jax.tree_util as jtu

        params = jtu.tree_map_with_path(
            lambda p, leaf: leaf.astype(jnp.bfloat16)
            if jtu.keystr(p).endswith("_table']") and leaf.ndim == 2
            else leaf,
            params,
        )
    params = jax.device_put(params, param_shardings(params, mesh))
    # adamw on dense params, adafactor semantics on embedding tables.
    # fused_adafactor = exact optax.adafactor math (unfactored second
    # moments — quality-pinned by a 2000-step convergence A/B; factored
    # rank-1 moments measurably hurt ranking quality at this config), with
    # fewer HBM passes + rsqrt instead of the literal power op optax emits.
    from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor
    from transformers4rec_tpu.ops.sparse_update import label_embedding_params

    tx = optax.multi_transform(
        {
            "dense": optax.adamw(6.7e-4),
            # T4R_BENCH_OPT_PALLAS=1: streamed two-pass pallas table update
            # (A/B knob; numerics pinned equal in test_fused_adafactor)
            # bf16-stored second moment is the DEFAULT (r4): halves the
            # optimizer's HBM-resident state stream — measured 8.99 → 8.32
            # ms/step (+8.1%, 2 runs/arm) and quality-NEUTRAL at the
            # 2000-step sessionized A/B (recall@20 0.0398 vs 0.0378,
            # eval-loss 9.48 vs 9.55, paired seed; compute stays f32).
            # T4R_BENCH_MOMENT_F32=1 restores the f32-state arm; the pallas
            # arm implies f32 moments (the two knobs are mutually exclusive
            # in fused_adafactor — different update rules otherwise).
            "table": fused_adafactor(
                learning_rate=6.7e-4,
                use_pallas=os.environ.get("T4R_BENCH_OPT_PALLAS") == "1",
                moment_dtype=(
                    None
                    if os.environ.get("T4R_BENCH_MOMENT_F32") == "1"
                    or os.environ.get("T4R_BENCH_OPT_PALLAS") == "1"
                    else jnp.bfloat16
                ),
            ),
        },
        label_embedding_params,
    )
    opt_state = tx.init(params)
    # K distinct batches stacked (K, B, ...) — one dispatch runs K steps
    batches = shard_stacked_batches(
        [
            {k: v[i * batch_size:(i + 1) * batch_size] for k, v in data.items()}
            for i in range(K_PACK)
        ],
        mesh,
    )

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
        return optax.apply_updates(params, updates), opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batches, rng):
        def body(carry, xs):
            p, o = carry
            batch, r = xs
            p, o, loss = one_step(p, o, batch, r)
            return (p, o), loss

        rs = jax.random.split(rng, K_PACK)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (batches, rs)
        )
        return params, opt_state, losses[-1]

    rng = jax.random.PRNGKey(7)
    for i in range(WARMUP):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, batches, sub)
    # force full completion with a host transfer: on the tunneled axon backend
    # block_until_ready alone under-reports (async dispatch artifact)
    float(loss)

    t0 = time.perf_counter()
    for i in range(STEPS):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, batches, sub)
    float(loss)
    dt = time.perf_counter() - t0

    examples_per_sec_per_chip = STEPS * K_PACK * batch_size / dt / n_chips

    baseline = None
    if os.path.exists("bench_baseline.json"):
        with open("bench_baseline.json") as f:
            baseline = json.load(f).get("value")
    vs_baseline = examples_per_sec_per_chip / baseline if baseline else 1.0

    # MFU: analytic model FLOPs (fwd+bwd GEMMs, docs/performance.md roofline
    # table / utils/flops.py) over the measured step time and the v5e bf16
    # peak. The step is FLOP-sparse by design (adaptive CE budget) — the CE
    # kernels are exp-throughput/VPU-bound, so MFU is a sanity floor, not the
    # binding constraint; the roofline table is the full accounting.
    from transformers4rec_tpu.utils.flops import (
        mfu as _mfu,
        xlnet_mlm_step_accounting,
    )

    acct = xlnet_mlm_step_accounting(
        batch=batch_size // n_chips, seq=SEQ, d_model=D_MODEL,
        n_layer=N_LAYER, n_head=N_HEAD, vocab=NUM_ITEMS + 8, emb_dim=64,
        mlm_p=0.3,
    )
    step_seconds = dt / (STEPS * K_PACK)
    print(json.dumps({
        "metric": "train_examples_per_sec_per_chip_xlnet_mlm_rees46",
        "value": round(examples_per_sec_per_chip, 2),
        "unit": "examples/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
        "mfu": round(_mfu(acct["total_flops"], step_seconds), 4),
        "model_tflops_per_step": round(acct["total_flops"] / 1e12, 4),
        "ms_per_step": round(step_seconds * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
