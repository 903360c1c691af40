"""Convergence sanity: the REES46-shaped bench config must actually LEARN.

Trains the flagship XLNet-MLM model on synthetic sessions and reports
held-out full-vocab ranking metrics. Two data modes:

- ``--popularity sessionized`` (default): per-session anchor + local walk —
  a SEQUENTIAL signal; ranking metrics must rise orders of magnitude above
  the random floor (20/390k ≈ 5e-5 for recall@20).
- ``--popularity lognormal``: i.i.d. long-tail draws (the reference's
  synthetic semantics — data/synthetic.py); only the global marginal is
  learnable, so the loss floor is the popularity entropy and metrics stay
  at the popularity-oracle level.

    python benchmarks/convergence_check.py [--steps 2000] [--arm full|sampled]
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
    ap.add_argument("--arm", choices=["full", "sampled"], default="full")
    ap.add_argument("--n-samples", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--train-rows", type=int, default=512 * 100)
    ap.add_argument("--eval-rows", type=int, default=4096)
    ap.add_argument("--num-items", type=int, default=390_000)
    ap.add_argument("--popularity", default="sessionized",
                    choices=["lognormal", "sessionized"],
                    help="sessionized adds within-session locality — a real "
                         "sequential signal; lognormal is i.i.d. popularity "
                         "(only the marginal is learnable)")
    ap.add_argument("--embedding-optimizer", default="adafactor",
                    choices=["adafactor", "fused_adafactor",
                             "factored_adafactor", "lazy_adam", "adamw",
                             "sparse_adam", "sparse_adafactor"],
                    help="table optimizer arm: optax.adafactor (unfactored "
                         "at E<128), fused_adafactor (ours, unfactored — the "
                         "bench default), factored_adafactor (rank-1 second "
                         "moment: measured -39%% recall@20 at 2000 steps), "
                         "lazy_adam, adamw, or the O(N·E) sparse-rows step "
                         "(sparse_adam / sparse_adafactor — require "
                         "--arm sampled; quality A/B for the fast path)")
    ap.add_argument("--masking", default="mlm",
                    choices=["clm", "mlm", "plm", "rtd"],
                    help="training scheme; the architecture follows the "
                         "reference pairing (clm→gpt2, mlm→xlnet, plm→xlnet "
                         "two-stream, rtd→electra)")
    ap.add_argument("--arch", default=None,
                    help="override the masking→arch pairing (e.g. reformer "
                         "with --masking mlm for the local/LSH/axial stack)")
    ap.add_argument("--build-json", default=None,
                    help="JSON dict merged into the arch build() kwargs — "
                         "e.g. '{\"attn_layers\": [\"local\",\"local\","
                         "\"local\"]}' as the dense control arm for the LSH "
                         "approximation A/B")
    ap.add_argument("--seq-len", type=int, default=20,
                    help="max session length (default 20 = REES46 config; "
                         "S>=64 engages the sorted LSH path on reformer — "
                         "the approximation-quality probe)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--packed", action="store_true",
                    help="session packing: train on first-fit-packed rows "
                         "(block-diagonal attention, data/packing.py); eval "
                         "stays unpacked. Steps consume PACKED rows, so each "
                         "step sees ~1/fill more sessions than unpacked")
    ap.add_argument("--seed", type=int, default=0,
                    help="offsets the train-data seed and all RNG keys "
                         "(eval data stays fixed at seed 999 for "
                         "cross-seed comparability)")
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine", "linear"],
                    help="decay over --steps with 5%% warmup (the paper "
                         "protocol trains with a scheduler; constant LR "
                         "plateaus long runs)")
    ap.add_argument("--dropout", type=float, default=0.1,
                    help="encoder dropout; the tuned REES46 XLNet-MLM config "
                         "trains with dropout 0.0 (fresh-data runs need no "
                         "regularization)")
    ap.add_argument("--lr", type=float, default=6.7e-4,
                    help="peak learning rate (post-LN archs are known to "
                         "need lower LR / longer warmup)")
    ap.add_argument("--warmup-frac", type=float, default=0.05,
                    help="warmup fraction of --steps (scheduled arms only)")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="clip_by_global_norm threshold; 0 = no clipping")
    ap.add_argument("--pre-ln", action="store_true",
                    help="build the arch pre-LN (norm_first, no embedding "
                         "LayerNorm) — the TPU-tuned escape from the "
                         "HF-faithful post-LN BERT family (electra/RTD)")
    ap.add_argument("--plm-probability", type=float, default=1 / 6,
                    help="PLM: fraction of the sequence in the masked span "
                         "(reference transf_exp_args.py plm_probability)")
    ap.add_argument("--plm-span", type=int, default=5,
                    help="PLM: max span length (reference max_span_length)")
    ap.add_argument("--moment-dtype", default=None, choices=[None, "bf16"],
                    help="store the table optimizer's second moment bf16 "
                         "(fused_adafactor moment_dtype — HBM probe); "
                         "requires --embedding-optimizer fused_adafactor")
    ap.add_argument("--table-dtype", default=None, choices=[None, "bf16"],
                    help="store the (V, E) item table bf16 (f32 compute/"
                         "accumulation in the kernels; updates round to bf16 "
                         "on store) — quality gate for the measured +8%% "
                         "throughput of T4R_BENCH_TABLE_BF16; requires "
                         "--embedding-optimizer fused_adafactor")
    ap.add_argument("--cpu", action="store_true")
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

    D_MODEL, N_LAYER, N_HEAD = 192, 3, 16
    SEQ, BATCH = args.seq_len, args.batch
    EBATCH = 2 * BATCH

    mesh = make_mesh(model=1)
    schema = synthetic_ecommerce_data_schema(
        num_items=args.num_items, num_categories=150, max_session_length=SEQ
    )
    masking_kwargs = {}
    if args.masking in ("mlm", "rtd"):
        masking_kwargs["mlm_probability"] = 0.3
    elif args.masking == "plm":
        masking_kwargs["plm_probability"] = args.plm_probability
        masking_kwargs["max_span_length"] = args.plm_span
    input_module = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=D_MODEL, masking=args.masking, aggregation="concat",
        masking_kwargs=masking_kwargs,
    )
    arch = args.arch or {
        "clm": "gpt2", "mlm": "xlnet", "plm": "xlnet", "rtd": "electra"
    }[args.masking]
    build_kwargs = dict(
        d_model=D_MODEL, n_head=N_HEAD, n_layer=N_LAYER, total_seq_length=SEQ,
        dropout=args.dropout,
    )
    if args.pre_ln:
        build_kwargs.update(norm_first=True, embed_layer_norm=False)
    if args.build_json:
        extra = json.loads(args.build_json)
        extra = {
            k: tuple(v) if isinstance(v, list) else v for k, v in extra.items()
        }
        build_kwargs.update(extra)
    cfg = tr.transformer_registry.parse(arch).build(**build_kwargs)
    model = cfg.to_model(
        input_module,
        tr.NextItemPredictionTask(
            weight_tying=True,
            sampled_softmax=(args.arm == "sampled"),
            max_n_samples=args.n_samples,
            label_smoothing=0.0,
        ),
    )

    train_np = synthetic_data(schema, num_rows=args.train_rows,
                              max_session_length=SEQ, seed=args.seed,
                              item_popularity=args.popularity,
                              ragged=args.packed)
    if args.packed:
        from transformers4rec_tpu.data.packing import pack_sessions, packing_stats

        train_np = pack_sessions(train_np, max_len=SEQ, item_id_col="item_id")
        stats = packing_stats(train_np, "item_id")
        print(json.dumps({"packing": stats}), flush=True)
        n_packed_rows = stats["rows"]
    eval_np = synthetic_data(schema, num_rows=args.eval_rows,
                             max_session_length=SEQ, seed=999,
                             item_popularity=args.popularity)
    n_train_batches = (n_packed_rows if args.packed else args.train_rows) // BATCH
    if args.eval_rows % EBATCH or args.eval_rows < EBATCH:
        raise SystemExit(
            f"--eval-rows ({args.eval_rows}) must be a positive multiple of "
            f"the eval batch 2*--batch ({EBATCH}) — a remainder would "
            f"silently drop tail rows and skew cross-arm comparisons"
        )
    n_eval_batches = args.eval_rows // EBATCH

    rngs = {
        "params": jax.random.PRNGKey(args.seed * 101),
        "masking": jax.random.PRNGKey(args.seed * 101 + 1),
        "dropout": jax.random.PRNGKey(args.seed * 101 + 2),
        "sampling": jax.random.PRNGKey(args.seed * 101 + 3),
    }
    tiny = {k: jnp.asarray(v[:8]) for k, v in train_np.items()}
    params = model.init(rngs, tiny, training=True)
    if args.table_dtype == "bf16":
        if args.embedding_optimizer != "fused_adafactor":
            raise SystemExit("--table-dtype requires --embedding-optimizer "
                             "fused_adafactor (update rounds to the param "
                             "dtype there; other arms would silently upcast)")
        import jax.tree_util as jtu

        params = jtu.tree_map_with_path(
            lambda p, leaf: leaf.astype(jnp.bfloat16)
            if jtu.keystr(p).endswith("_table']") and leaf.ndim == 2
            else leaf,
            params,
        )
    params = jax.device_put(params, param_shardings(params, mesh))
    if args.lr_schedule == "constant":
        lr = args.lr
    else:
        from transformers4rec_tpu.trainer.schedulers import get_scheduler

        lr = get_scheduler(
            args.lr_schedule, args.lr, num_training_steps=args.steps,
            num_warmup_steps=int(args.steps * args.warmup_frac),
        )
    sparse = args.embedding_optimizer in ("sparse_adam", "sparse_adafactor")
    mdt = jnp.bfloat16 if args.moment_dtype == "bf16" else None
    if mdt is not None and args.embedding_optimizer != "fused_adafactor" \
            and not sparse:
        # refuse rather than silently measure an f32-state arm labeled bf16
        raise SystemExit(
            "--moment-dtype requires --embedding-optimizer fused_adafactor "
            f"or a sparse arm (got {args.embedding_optimizer!r})"
        )
    if sparse and args.arm != "sampled":
        raise SystemExit("sparse optimizer arms require --arm sampled "
                         "(a full-softmax loss touches every table row)")
    if sparse and args.masking not in ("mlm", "clm", "plm"):
        # without this guard an rtd arm would run the CLM position map over
        # generator-sampled corrupted lookups — finite but meaningless numbers
        raise SystemExit(
            f"sparse optimizer arms support mlm/clm/plm (got {args.masking!r})"
        )
    if args.embedding_optimizer == "adamw":
        table_tx = optax.adamw(lr)
    elif args.embedding_optimizer == "fused_adafactor":
        from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

        table_tx = fused_adafactor(lr, moment_dtype=mdt)
    elif args.embedding_optimizer == "factored_adafactor":
        from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

        table_tx = fused_adafactor(lr, min_dim_size_to_factor=64)
    elif args.embedding_optimizer == "lazy_adam":
        from transformers4rec_tpu.ops.sparse_update import lazy_adam

        table_tx = lazy_adam(lr)
    elif sparse:
        # OTHER (small) *_table features keep the quality-default routing;
        # the item table rides the O(N·E) sparse step below
        from transformers4rec_tpu.ops.fused_adafactor import fused_adafactor

        table_tx = fused_adafactor(lr)
    else:
        table_tx = optax.adafactor(
            learning_rate=lr, multiply_by_parameter_scale=False
        )
    tx = optax.multi_transform(
        {"dense": optax.adamw(lr), "table": table_tx},
        label_embedding_params,
    )
    if args.grad_clip > 0 and not sparse:
        tx = optax.chain(optax.clip_by_global_norm(args.grad_clip), tx)

    if sparse:
        # the trainer's sparse-embedding step, driven by this script's loop:
        # rows gathered outside autodiff, O(N·E) scatter update, clip (if
        # any) applied INSIDE the step over (dense grads, row grads)
        from types import SimpleNamespace

        from transformers4rec_tpu.ops.sparse_update import (
            sparse_rows_adafactor_init,
            sparse_rows_adam_init,
        )
        from transformers4rec_tpu.trainer.sparse_embedding_step import (
            find_table_path,
            make_sparse_one_step,
            tree_get,
            tree_set,
        )
        from transformers4rec_tpu.trainer.trainer import TrainState

        path = find_table_path(params, "item_id")
        table = tree_get(params, path)
        task = model.heads[0].tasks[0]
        sampler = task.make_sampler(table.shape[0])
        sargs = SimpleNamespace(
            max_grad_norm=args.grad_clip, gradient_accumulation_steps=1,
            adam_beta1=0.9, adam_beta2=0.999, adam_epsilon=1e-8,
        )
        rule = ("adafactor" if args.embedding_optimizer == "sparse_adafactor"
                else "adam")
        init_fn = (sparse_rows_adafactor_init if rule == "adafactor"
                   else sparse_rows_adam_init)
        dense_tree = tree_set(params, path, None)
        opt_state = (tx.init(dense_tree), init_fn(table, moment_dtype=mdt))
        one_step = jax.jit(
            make_sparse_one_step(model, sargs, path, "item_id", args.masking,
                                 sampler, tx, lr, rule=rule),
            donate_argnums=0,
        )
    else:
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
        return loss, outs["next-item"].metrics

    def run_eval(params):
        sums = {}
        loss_sum = jnp.zeros(())
        for i in range(n_eval_batches):
            eb = shard_batch(
                {k: jnp.asarray(v[i * EBATCH:(i + 1) * EBATCH])
                 for k, v in eval_np.items()}, mesh)
            loss, metrics = eval_step(params, eb)
            loss_sum = loss_sum + loss
            for k, (s, c) in metrics.items():
                ps, pc = sums.get(k, (jnp.zeros(()), jnp.zeros(())))
                sums[k] = (ps + s, pc + c)
        out = {k: round(float(s) / max(float(c), 1.0), 5)
               for k, (s, c) in sums.items()}
        out["eval_loss"] = round(float(loss_sum) / n_eval_batches, 4)
        return out

    rng = jax.random.PRNGKey(7 + args.seed * 977)
    t0 = time.perf_counter()
    losses = []
    if sparse:
        state = TrainState(params=params, opt_state=opt_state,
                           step=jnp.zeros((), jnp.int32), rng=rng)
    for i in range(args.steps):
        b = {k: jnp.asarray(v[(i % n_train_batches) * BATCH:
                              (i % n_train_batches + 1) * BATCH])
             for k, v in train_np.items()}
        if sparse:
            state, loss = one_step(state, shard_batch(b, mesh))
        else:
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state,
                                                 shard_batch(b, mesh), sub)
        if i % max(args.steps // 10, 1) == 0:
            losses.append(round(float(loss), 3))
    if sparse:
        params = state.params
    float(loss)
    dt = time.perf_counter() - t0

    rec = {
        "arm": args.arm,
        "packed": args.packed,
        "masking": args.masking,
        "arch": arch,
        "seq_len": SEQ,
        "batch": BATCH,
        "num_items": args.num_items,
        "embedding_optimizer": args.embedding_optimizer,
        "steps": args.steps,
        "train_rows": args.train_rows,
        "popularity": args.popularity,
        "lr": args.lr,
        "lr_schedule": args.lr_schedule,
        "seed": args.seed,
        "wall_s": round(dt, 1),
        "train_loss_trajectory": losses,
        **run_eval(params),
    }
    if args.grad_clip:
        rec["grad_clip"] = args.grad_clip
    if args.moment_dtype:
        rec["moment_dtype"] = args.moment_dtype
    if args.table_dtype:
        rec["table_dtype"] = args.table_dtype
    if args.pre_ln:
        rec["pre_ln"] = True
    if args.build_json:
        rec["build_json"] = args.build_json
    if args.lr_schedule != "constant" and args.warmup_frac != 0.05:
        rec["warmup_frac"] = args.warmup_frac
    if args.masking == "plm":
        rec["plm_probability"] = round(args.plm_probability, 4)
        rec["plm_span"] = args.plm_span
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
