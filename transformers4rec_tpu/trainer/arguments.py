"""Training arguments.

Parity: /root/reference/transformers4rec/config/trainer.py:23-134 —
``T4RecTrainingArguments(TrainingArguments)`` adds ``max_sequence_length``,
``data_loader_engine`` (default "merlin"), ``predict_top_k=100``,
``eval_steps_on_train_set``, ``compute_metrics_each_n_steps``,
``learning_rate_num_cosine_cycles_by_epoch``, ``log_predictions``; the HF base
contributes lr/batch/epochs/scheduler/checkpoint knobs (only the subset the
reference actually exercises is carried over).

TPU-first: ``bf16`` replaces fp16/AMP (SURVEY.md §2.10); ``mesh_model_axis``
sizes the 'model' axis for sharded embedding tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class T4RecTrainingArguments:
    output_dir: str = "./t4rec_output"

    # recsys-specific (reference config/trainer.py:36-126)
    max_sequence_length: Optional[int] = None
    data_loader_engine: str = "parquet"  # 'merlin' accepted as alias
    eval_steps_on_train_set: int = 20
    predict_top_k: int = 100
    log_predictions: bool = False
    compute_metrics_each_n_steps: int = 1
    learning_rate_num_cosine_cycles_by_epoch: float = 1.25
    # evaluate on {t}/test.parquet instead of valid.parquet in the
    # incremental fit_and_evaluate loop (reference config/trainer.py:85-88)
    eval_on_test_set: bool = False
    # bounded shuffle-buffer rows for the streaming parquet engine
    # (reference config/trainer.py:67-73; 0 = the engine's default)
    shuffle_buffer_size: int = 0
    # experiment-group label stamped into metrics.jsonl records (reference
    # config/trainer.py:122-125 uses it to organize W&B runs)
    experiments_group: str = "default"
    # HF TrainingArguments field the reference exercises in tests. Applies to
    # the TRAIN loader only (HF semantics — eval/test loaders never drop tail
    # sessions). Batches are ALWAYS full-size (static TPU shapes): True drops
    # the ragged tail; False keeps a final ZERO-FILLED batch whose fill rows
    # carry no loss/metric weight (each real row counts exactly once).
    dataloader_drop_last: bool = False

    # optimization (HF TrainingArguments subset)
    learning_rate: float = 5e-4
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    # table optimizer: 'adafactor' (default) routes *_table params through
    # fused unfactored adafactor (ops/fused_adafactor.py) — decided by a
    # 2-seed 2000-step sessionized A/B vs adamw-on-tables ('dense'):
    # recall@20 0.0383/0.0337 vs 0.0305/0.0300, eval loss 9.55/9.24 vs
    # 9.77/9.33 — adafactor wins BOTH seeds on both metrics AND saves
    # ~2-3 ms/step of optimizer HBM traffic at the REES46 config.
    # 'dense' = AdamW everywhere; 'lazy_adam' = lazy row-wise Adam
    # (ops/sparse_update.py) — rare-item moments only advance on steps that
    # touch the row.
    embedding_optimizer: str = "adafactor"
    lr_scheduler_type: str = "linear"  # linear|cosine|cosine_with_restarts|constant|constant_with_warmup|polynomial
    warmup_steps: int = 0
    num_train_epochs: float = 1.0
    max_steps: int = -1
    per_device_train_batch_size: int = 64
    per_device_eval_batch_size: int = 32
    gradient_accumulation_steps: int = 1
    # run K optimizer steps per device dispatch (lax.scan over K stacked
    # batches). Amortizes per-dispatch overhead — measured 11.9 -> 9.3
    # ms/step (+28% throughput) at K=8 on the REES46 bench config (TPU v5e);
    # Trainer.train() steady-state at K=8 = 13.3k ex/s/chip vs ~11k at K=1.
    # DEFAULT 8 (round-4 decision): numerics are BIT-IDENTICAL to K=1 (same
    # per-step RNG chain — pinned by test), groups never cross save/eval/
    # profile boundaries, and the <K epoch tail runs single-step, so the only
    # cost is a slightly longer first compile. Set 1 for minimal-latency
    # interactive/debug runs.
    steps_per_execution: int = 8
    # session packing (data/packing.py): the TRAIN loader packs multiple
    # short sessions per row with block-diagonal attention — per-row step
    # cost unchanged, ~1.7-1.8x sessions/row, measured +45% recall@20 at
    # equal steps/wall time. Eval/predict loaders stay unpacked (exact
    # per-session protocol + serving compatibility). Exact for every arch
    # family (relative bias is offset-invariant; learned-absolute positions
    # restart per segment). No reference analog.
    pack_sessions: bool = False
    # opt-in: pack the EVAL loader too. Packed eval targets one position per
    # segment (per-segment last item) and streams the same (sum, count)
    # metric states, so final metrics match unpacked eval EXACTLY
    # (tests/test_packing.py::test_packed_eval_matches_unpacked) at ~1.7-1.8x
    # fewer rows per pass. eval_loss composes per-batch means over fewer,
    # denser batches (may differ in the last digits from unpacked batching).
    # predict()/log_predictions stay unpacked (per-session output rows).
    pack_eval_sessions: bool = False
    seed: int = 42

    # precision / compilation
    bf16: bool = True
    gradient_checkpointing: bool = False

    # logging / eval / checkpointing
    # 'msgpack' = host-gathered flax serialization (single-host friendly);
    # 'orbax' = sharded per-device/per-host writes — required scale path for
    # row-sharded tables (load() auto-detects either format)
    checkpoint_format: str = "msgpack"
    # non-blocking checkpoint writes: save() snapshots state to host, then
    # serializes/writes on a background thread (msgpack) or via orbax's
    # AsyncCheckpointer (orbax) — the train loop overlaps disk IO with the
    # next steps and only blocks if the previous save is still in flight at
    # the next save boundary. trainer_state.json is written last as the
    # completion marker.
    save_async: bool = False
    logging_steps: int = 100
    # run a full evaluate() every N train steps (HF evaluation_strategy=
    # "steps"); results land in log_history/TensorBoard at the triggering
    # global step. Needs eval data (eval_dataset / eval_dataloader / the
    # synthetic engine).
    eval_steps: Optional[int] = None
    save_steps: Optional[int] = None
    save_total_limit: Optional[int] = None
    # HF best-checkpoint tracking (exercised by reference
    # tests/unit/torch/test_trainer.py::test_saves_checkpoints_best_metric):
    # each save at an eval boundary records metric_for_best_model; rotation
    # never deletes the best checkpoint; train() ends by restoring the best
    # checkpoint's PARAMETERS (trainer state/global_step stay).
    load_best_model_at_end: bool = False
    # e.g. "/next-item/recall_at_10" (an "eval_" prefix is added if absent)
    metric_for_best_model: Optional[str] = None
    # None → inferred: False when the metric name contains "loss", else True
    greater_is_better: Optional[bool] = None
    report_to: str = "none"
    disable_tqdm: bool = True
    # observability (SURVEY.md §5): device trace + JSONL metrics stream
    profile_steps: Optional[str] = None  # "start,stop" step range to trace
    profile_dir: Optional[str] = None  # default: {output_dir}/profile
    log_json: bool = False  # append train/eval metrics to metrics.jsonl

    # distribution
    mesh_model_axis: int = 1
    # storage dtype of the table optimizer's second-moment state
    # ("adafactor" arm only): "bf16" (DEFAULT, r4) halves the optimizer's
    # HBM-resident state stream — measured 8.99 → 8.32 ms/step (+8.1%, 2
    # runs/arm) and quality-neutral at the 2000-step sessionized A/B on BOTH
    # seeds (seed 0 recall@20 0.0398 vs 0.0378 favoring bf16; seed 1 0.0315
    # vs 0.0334 favoring f32 — a tie inside run noise, trajectories near
    # identical; compute stays f32 either way). None/"f32" restores exact
    # optax-state parity (e.g. to resume an old f32-moment checkpoint
    # without a mixed-dtype state).
    embedding_moment_dtype: Optional[str] = "bf16"
    # storage dtype of the `*_table` PARAMS themselves: "bf16" halves every
    # table read (lookup gather, CE W-stream fwd+bwd) — measured 8.32 → 7.70
    # ms/step (+8%, 2 runs/arm) on the bench config — but the 2000-step
    # sessionized quality gate measured a REAL loss (recall@20 0.0281 vs
    # 0.0398 f32, seed 0: small adafactor updates vanish under bf16's 8-bit
    # mantissa on store). Default None (f32 tables) is the right call for
    # training; use serving's `weights_dtype="bfloat16"` export for the
    # inference-side footprint win instead (docs/performance.md).
    embedding_table_dtype: Optional[str] = None
    # with mesh_model_axis>1 and a tied item table big enough to row-shard
    # (parallel/mesh.py MIN_ROWS_TO_SHARD), automatically thread the mesh
    # into NextItemPredictionTask.vocab_parallel_mesh so train CE / eval /
    # predict top-k run the shard_map vocab-parallel ops instead of letting
    # XLA all-gather the (V, E) table around the opaque Pallas CE call every
    # step. Numerics match the replicated path (tests/test_parallel.py).
    # False = keep whatever the model was built with.
    auto_vocab_parallel: bool = True

    @property
    def train_batch_size(self) -> int:
        import jax

        return self.per_device_train_batch_size * max(jax.device_count(), 1)

    @property
    def eval_batch_size(self) -> int:
        import jax

        return self.per_device_eval_batch_size * max(jax.device_count(), 1)
