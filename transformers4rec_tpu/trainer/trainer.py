"""Trainer: pjit train/eval/predict loops, schedulers, checkpointing.

Parity: /root/reference/transformers4rec/torch/trainer.py (883 LoC) —
``Trainer(transformers.Trainer)``: dataloaders from the registry + schema
(:139-217), ``compute_loss`` (:315-338), ``evaluation_loop`` with streaming
metric updates each N steps (:402-699, :510-515), top-k truncation
(:532-592), ``reset_lr_scheduler`` (:234-241), ``create_scheduler`` with
num_cycles (:243-313), checkpoint save/restore (:701-745), incremental
logging across repeated ``.train()`` calls (:802-870).

TPU-first redesign:
- ONE jitted train step over the ('data','model') mesh; gradients all-reduce
  implicitly over ICI from the shardings (no DDP wrapper, no NCCL —
  SURVEY.md §2.10).
- Eval metrics are (sum, count) scalars accumulated on device and reduced by
  sharding propagation — replacing ``_nested_gather``/``_pad_across_processes``
  (reference trainer.py:517-530).
- Checkpoints = msgpack of the param/opt pytree + trainer state JSON
  (Model.save parity, reference model/base.py:839-922) with rotation.
- ``bf16`` activation precision instead of AMP/fp16 autocast (:363-365).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import shutil
import threading
import time
from typing import Any, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..data.loader import dataloader_registry
from ..model.base import Model
from ..model.ranking_metric import finalize_metrics, update_metric_state
from ..parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    shard_stacked_batches,
)
from ..schema import Schema
from .arguments import T4RecTrainingArguments
from .checkpoint import register_pending
from .schedulers import get_scheduler, num_cosine_cycles
from .sparse_embedding_step import SPARSE_OPTIMIZERS

# Table size above which a dense embedding optimizer on a sparse_adam-
# eligible model triggers a one-time hint (the measured 3.6x crossover sits
# well below this — the hint stays quiet for every ordinary config).
SPARSE_HINT_MIN_ROWS = 1_000_000


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray


@dataclasses.dataclass
class TrainerState:
    """Host-side bookkeeping (reference IncrementalLoggingCallback
    trainer.py:848-870: global_step stays monotonic across .train() calls)."""

    global_step: int = 0
    past_global_steps: int = 0
    epoch: float = 0.0
    log_history: List[Dict[str, Any]] = dataclasses.field(default_factory=list)
    # dataloader position for mid-epoch resume (SURVEY.md §5): the loader's
    # shuffle is deterministic in (seed, epoch), so (epoch, batches consumed)
    # pins the exact next batch
    loader_epoch: int = 0
    batches_in_epoch: int = 0


class Trainer:
    def __init__(
        self,
        model: Model,
        args: T4RecTrainingArguments,
        schema: Optional[Schema] = None,
        train_dataset: Any = None,
        eval_dataset: Any = None,
        test_dataset: Any = None,
        train_dataloader: Optional[Iterable] = None,
        eval_dataloader: Optional[Iterable] = None,
        mesh=None,
        compute_metrics: bool = True,
    ):
        self.model = model
        self.args = args
        self.schema = schema
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.test_dataset = test_dataset
        self._train_dataloader = train_dataloader
        self._eval_dataloader = eval_dataloader
        self.compute_metrics = compute_metrics

        if args.load_best_model_at_end:
            # fail fast (HF errors up front too): best tracking pairs a save
            # with the eval at the SAME step, so saves must land on eval
            # boundaries; default the metric to eval loss like HF
            if args.metric_for_best_model is None:
                args.metric_for_best_model = "loss"
            if not (args.save_steps and args.eval_steps):
                raise ValueError(
                    "load_best_model_at_end requires save_steps AND "
                    "eval_steps (saves record the same-step eval metric)"
                )
            if args.save_steps % args.eval_steps != 0:
                raise ValueError(
                    f"load_best_model_at_end: save_steps ({args.save_steps}) "
                    f"must be a multiple of eval_steps ({args.eval_steps}) "
                    "so every save lands on an eval boundary"
                )

        self.mesh = mesh or make_mesh(model=args.mesh_model_axis)
        from ..parallel.mesh import process_data_stripe

        self._stripe = process_data_stripe(self.mesh)
        if args.auto_vocab_parallel:
            self._maybe_auto_vocab_parallel()
        self.state = TrainerState()
        self._train_state: Optional[TrainState] = None
        self._tx = None
        self._schedule = None
        self._jit_train_step = None
        self._jit_train_step_multi = None
        self._jit_eval_step = None
        self._jit_eval_step_multi = None
        self._jit_predict_step = None
        self._tb_writer = None  # lazy SummaryWriter (args.report_to)
        # (loader_epoch, batches_in_epoch) staged by load() for the next
        # train() call to fast-forward the loader to; consumed once
        self._resume_position: Optional[tuple] = None

    # --------------------------------------------------- vocab-parallel auto
    def _tied_table_rows(self, head) -> Optional[int]:
        """PADDED row count of the head's tied item table (rows are rounded
        up to vocab_padding_multiple at creation — features/embedding.py), or
        None when the head has no item-id embedding."""
        im = getattr(head, "input_module", None)
        cat = getattr(im, "categorical_module", None)
        item_id = getattr(cat, "item_id", None)
        if item_id is None:
            return None
        cfg = cat.feature_configs[item_id].table
        m = max(int(getattr(cat, "vocab_padding_multiple", 1)), 1)
        return ((cfg.vocabulary_size + m - 1) // m) * m

    def _maybe_auto_vocab_parallel(self) -> None:
        """Production vocab-parallel engagement: when the 'model' axis is >1
        and the tied item table will row-shard (same threshold+divisibility
        conditions as parallel/mesh.py param_shardings), rewrite each
        full-softmax NextItemPredictionTask with ``vocab_parallel_mesh`` so
        CE/eval/top-k run the shard_map ops of parallel/sharded_embedding.py.
        Without this, the table sharding alone makes XLA ALL-GATHER the
        (V, E) table around the opaque Pallas CE call every step — fine at
        32k rows, catastrophic and silent at the 100M-row north star."""
        from ..model.base import map_next_item_tasks
        from ..parallel.mesh import MIN_ROWS_TO_SHARD

        model_size = self.mesh.shape.get("model", 1)
        if model_size <= 1:
            return

        def engage(t, head):
            rows = self._tied_table_rows(head)
            shards = (
                rows is not None
                and rows >= MIN_ROWS_TO_SHARD
                and rows % model_size == 0
            )
            if not (t.weight_tying and shards):
                return t
            if t.vocab_parallel_mesh is not None:
                return t  # manual mesh wins
            # NOTE sampled_softmax tasks engage too: their TRAINING branch
            # never touches the mesh ops (O(N) row gathers only), but
            # evaluate()/predict() are always full-vocab — without the mesh
            # they would all-gather the row-sharded (V, E) table per eval
            # step, the exact failure this mechanism exists to prevent
            if not t.use_fused_ops:
                import warnings

                warnings.warn(
                    "mesh_model_axis>1 row-shards the tied item table "
                    f"({rows} rows) but use_fused_ops=False keeps the "
                    "dense-logits CE path, which all-gathers the (V, E) "
                    "table every step; set use_fused_ops=True to engage "
                    "the vocab-parallel kernels"
                )
                return t
            return t.clone(vocab_parallel_mesh=self.mesh)

        self.model = map_next_item_tasks(self.model, engage)

    # ------------------------------------------------------------ dataloaders
    def _make_loader(self, dataset, batch_size: int, shuffle: bool,
                     is_train: bool = False, **kwargs):
        engine = self.args.data_loader_engine
        cls = dataloader_registry.parse("parquet" if engine == "merlin" else engine)
        # dataloader_drop_last applies to the TRAIN loader only: eval/test
        # loaders ALWAYS keep the tail as a zero-filled full-size batch whose
        # fill rows carry no loss/metric weight, so every session counts
        # exactly once and predict() rows align 1:1 with input sessions.
        # (Deliberately stricter than HF, which forwards the flag to eval
        # loaders too — silently dropping tail sessions from reported
        # metrics is never the right default for session-based rec eval.)
        kwargs.setdefault(
            "drop_last", self.args.dataloader_drop_last if is_train else False
        )
        if engine == "parquet_streaming" and self.args.shuffle_buffer_size > 0:
            kwargs.setdefault("buffer_rows", self.args.shuffle_buffer_size)
        # batch_size is GLOBAL; each process loads the stripe its devices
        # need and shard_batch assembles the global array
        # (jax.make_array_from_process_local_data — parallel/mesh.py). With
        # the default pod layout that is 1/process_count; with the 'model'
        # axis spanning processes (cross-host row-sharded tables) a
        # process's devices cover several 'data' rows and the stripe widens
        # (process_data_stripe) — processes sharing a stripe load identical
        # rows, keeping the collective in lockstep.
        rank, size = self._stripe
        return cls.from_schema(
            self.schema,
            dataset,
            batch_size=batch_size // size,
            max_sequence_length=self.args.max_sequence_length,
            shuffle=shuffle,
            global_rank=rank,
            global_size=size,
            seed=self.args.seed,
            **kwargs,
        )

    def get_train_dataloader(self):
        if self._train_dataloader is not None:
            return self._train_dataloader
        if self.train_dataset is None and self.args.data_loader_engine != "synthetic":
            raise ValueError("Trainer: training requires a train_dataset")
        # pack_sessions applies to TRAIN (eval packs only via the separate
        # pack_eval_sessions opt-in; predict always stays unpacked —
        # exact per-session eval protocol + serving compatibility)
        return self._make_loader(
            self.train_dataset, self.args.train_batch_size, shuffle=True,
            is_train=True, pack=self.args.pack_sessions,
        )

    def get_eval_dataloader(self, eval_dataset=None):
        ds = eval_dataset if eval_dataset is not None else self.eval_dataset
        if self._eval_dataloader is not None and eval_dataset is None:
            cfg = (
                self.args.pack_eval_sessions, self.args.eval_batch_size,
                self.args.max_sequence_length, self.args.data_loader_engine,
                self.args.dataloader_drop_last, repr(self.eval_dataset),
            )
            if getattr(self, "_eval_loader_cfg", cfg) == cfg:
                return self._eval_dataloader
        if ds is None and self.args.data_loader_engine != "synthetic":
            raise ValueError("Trainer: evaluation requires an eval_dataset")
        # pack_eval_sessions (opt-in): per-segment last-item targets give
        # EXACTLY the unpacked metric sums at ~1.7-1.8x fewer rows/pass
        # keyed by dataset identity too: the incremental-window protocol
        # reassigns trainer.eval_dataset between windows (fit_and_evaluate)
        cfg = (
            self.args.pack_eval_sessions, self.args.eval_batch_size,
            self.args.max_sequence_length, self.args.data_loader_engine,
            self.args.dataloader_drop_last, repr(self.eval_dataset),
        )
        loader = self._make_loader(
            ds, self.args.eval_batch_size, shuffle=False,
            pack=self.args.pack_eval_sessions,
        )
        if eval_dataset is None:
            # cache: periodic mid-train evaluation would otherwise re-read
            # and re-materialize the whole eval dataset every eval_steps;
            # keyed by the loader-shaping args so a mid-run flip (e.g.
            # pack_eval_sessions) rebuilds instead of serving a stale loader
            self._eval_dataloader = loader
            self._eval_loader_cfg = cfg
        return loader

    def _has_eval_data(self) -> bool:
        return (
            self._eval_dataloader is not None
            or self.eval_dataset is not None
            or self.args.data_loader_engine == "synthetic"
        )

    def get_test_dataloader(self, test_dataset=None):
        ds = test_dataset if test_dataset is not None else self.test_dataset
        if ds is None and self.args.data_loader_engine != "synthetic":
            raise ValueError("Trainer: prediction requires a test_dataset")
        return self._make_loader(ds, self.args.eval_batch_size, shuffle=False)

    # ------------------------------------------------------------- optimizer
    def num_training_steps(self, train_loader) -> int:
        if self.args.max_steps > 0:
            return self.args.max_steps
        return max(int(len(train_loader) * self.args.num_train_epochs), 1)

    def create_optimizer_and_scheduler(self, num_training_steps: int):
        a = self.args
        if a.embedding_moment_dtype not in (None, "f32", "bf16"):
            # a typo ('bfloat16') must not silently select the f32 arm
            raise ValueError(
                "embedding_moment_dtype must be None, 'f32', or 'bf16' "
                f"(got {a.embedding_moment_dtype!r})"
            )
        if a.embedding_table_dtype not in (None, "f32", "bf16"):
            raise ValueError(
                "embedding_table_dtype must be None, 'f32', or 'bf16' "
                f"(got {a.embedding_table_dtype!r})"
            )
        if (a.embedding_table_dtype == "bf16"
                and a.embedding_optimizer not in (
                    ("adafactor",) + SPARSE_OPTIMIZERS)):
            # these arms cast their table update to the param dtype with f32
            # compute; adamw/lazy_adam would also keep bf16 MOMENTS, a
            # different (unvalidated) numerics regime
            import warnings

            warnings.warn(
                "embedding_table_dtype='bf16' is validated for the "
                "adafactor/sparse table arms; embedding_optimizer="
                f"{a.embedding_optimizer!r} keeps f32 tables"
            )
            a.embedding_table_dtype = None
        if (a.embedding_moment_dtype == "bf16"
                and a.embedding_optimizer not in (
                    "adafactor", "sparse_adam", "sparse_adafactor")):
            # bf16 moment storage is wired into the fused_adafactor arm and
            # the sparse-rows states (mu/nu/v + the sparse small-table
            # routing); an A/B that thinks it set bf16 on lazy_adam/dense
            # must hear otherwise
            import warnings

            warnings.warn(
                "embedding_moment_dtype='bf16' applies to the adafactor "
                f"table arm only; embedding_optimizer="
                f"{a.embedding_optimizer!r} keeps f32 moments"
            )
        num_cycles = 0.5
        if a.lr_scheduler_type.startswith("cosine"):
            num_cycles = num_cosine_cycles(
                a.num_train_epochs, a.learning_rate_num_cosine_cycles_by_epoch
            )
        self._schedule = get_scheduler(
            a.lr_scheduler_type,
            a.learning_rate,
            a.warmup_steps,
            num_training_steps,
            num_cycles=num_cycles,
        )
        chain = []
        # sparse_adam/sparse_adafactor: grad clipping happens INSIDE the
        # custom step (the global norm must include the sparse row grads the
        # optax chain never sees — trainer/sparse_embedding_step.py)
        if a.max_grad_norm and a.max_grad_norm > 0 \
                and a.embedding_optimizer not in SPARSE_OPTIMIZERS:
            chain.append(optax.clip_by_global_norm(a.max_grad_norm))
        dense_tx = optax.adamw(
            self._schedule,
            b1=a.adam_beta1,
            b2=a.adam_beta2,
            eps=a.adam_epsilon,
            weight_decay=a.weight_decay,
        )
        if a.embedding_optimizer in (
                ("lazy_adam", "adafactor") + SPARSE_OPTIMIZERS):
            from ..ops.sparse_update import label_embedding_params, lazy_adam

            if a.embedding_optimizer == "lazy_adam":
                table_tx = lazy_adam(
                    self._schedule,
                    b1=a.adam_beta1,
                    b2=a.adam_beta2,
                    eps=a.adam_epsilon,
                )
            else:
                # fused_adafactor: exact optax.adafactor math with fewer HBM
                # passes (rsqrt instead of a literal power op; clip-rms
                # without materializing the update). Second moments stay
                # UNfactored by default — a 2000-step convergence A/B showed
                # the factored rank-1 approximation costs ranking quality on
                # embedding tables (ops/fused_adafactor.py docstring); pass
                # min_dim_size_to_factor to opt in for 100M-row tables.
                from ..ops.fused_adafactor import fused_adafactor

                table_tx = fused_adafactor(
                    learning_rate=self._schedule,
                    moment_dtype=(
                        jnp.bfloat16
                        if a.embedding_moment_dtype == "bf16" else None
                    ),
                )
            chain.append(
                optax.multi_transform(
                    {"dense": dense_tx, "table": table_tx},
                    label_embedding_params,
                )
            )
        else:
            chain.append(dense_tx)
        tx = optax.chain(*chain)
        if a.gradient_accumulation_steps > 1 \
                and a.embedding_optimizer not in SPARSE_OPTIMIZERS:
            # sparse optimizers accumulate inside the custom step instead
            # (ids + row grads buffered per micro-step, one dedupe/clip/
            # scatter at the boundary — SparseAccumState); wrapping their
            # dense_tx in MultiSteps here would double-accumulate
            tx = optax.MultiSteps(tx, a.gradient_accumulation_steps)
        self._tx = tx
        return tx

    def reset_model(self) -> None:
        """Drop all trained state so the next train() re-initializes
        parameters and optimizer from scratch (the sliding-window
        retrain-from-scratch protocol — examples_utils.fit_and_evaluate with
        no_incremental_training=True). Compiled step caches are cleared too;
        global_step stays monotonic (incremental-logging semantics)."""
        self._train_state = None
        self._jit_train_step = None
        self._jit_train_step_multi = None
        self._jit_eval_step = None
        self._jit_eval_step_multi = None
        self._jit_predict_step = None

    def reset_lr_scheduler(self) -> None:
        """Restart the schedule for a new incremental time window
        (reference trainer.py:234-241): rebuild optimizer state, keep params."""
        if self._train_state is None:
            return
        self.create_optimizer_and_scheduler(self._last_num_steps)
        self._train_state = self._train_state.replace(
            opt_state=self._init_opt_state(self._train_state.params),
            step=jnp.zeros((), jnp.int32),
        )
        self._jit_train_step = None  # opt_state structure may have changed
        self._jit_train_step_multi = None

    # ------------------------------------------------------------------ init
    def _init_params(self, example_batch: Dict[str, np.ndarray]):
        rngs = {
            "params": jax.random.PRNGKey(self.args.seed),
            "masking": jax.random.PRNGKey(self.args.seed + 1),
            "dropout": jax.random.PRNGKey(self.args.seed + 2),
            "sampling": jax.random.PRNGKey(self.args.seed + 3),
            "augment": jax.random.PRNGKey(self.args.seed + 4),
        }
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        params = self.model.init(rngs, batch, targets=batch, training=True)
        if self.args.embedding_table_dtype == "bf16":
            # bf16-STORED tables: every (V, E) read halves (lookup, CE
            # W-stream fwd+bwd — measured 8.32 → 7.70 ms/step on the bench
            # config); kernel dots accumulate f32, optimizer compute is f32,
            # updates round to bf16 on store
            params = jax.tree_util.tree_map_with_path(
                lambda p, leaf: leaf.astype(jnp.bfloat16)
                if (jax.tree_util.keystr(p).endswith("_table']")
                    and leaf.ndim == 2)
                else leaf,
                params,
            )
        shardings = param_shardings(params, self.mesh)
        return jax.device_put(params, shardings)

    def _ensure_state(self, example_batch, num_training_steps: int):
        self._last_num_steps = num_training_steps
        # the sparse step's accumulation buffers are (K, B·S+n_neg)-shaped —
        # stash the batch shapes so _init_opt_state (and a later
        # reset_lr_scheduler) can rebuild the opt-state structure
        self._example_shapes = {
            k: tuple(v.shape) for k, v in example_batch.items()
        }
        if self._tx is None:
            self.create_optimizer_and_scheduler(num_training_steps)
        if self._train_state is None:
            params = self._init_params(example_batch)
            self._train_state = TrainState(
                params=params,
                opt_state=self._init_opt_state(params),
                step=jnp.zeros((), jnp.int32),
                rng=jax.random.PRNGKey(self.args.seed + 17),
            )

    def _sparse_setup(self, params):
        """Validate + resolve the sparse-embedding step's static pieces
        (trainer/sparse_embedding_step.py); cached on first use."""
        if getattr(self, "_sparse_cfg", None) is None:
            from .sparse_embedding_step import (
                find_table_path,
                validate_sparse_config,
            )

            task, item_col, masking_name = validate_sparse_config(
                self.model, self.args
            )
            path = find_table_path(params, item_col)
            from .sparse_embedding_step import tree_get

            sampler = task.make_sampler(tree_get(params, path).shape[0])
            self._sparse_cfg = (path, item_col, masking_name, sampler)
        return self._sparse_cfg

    def _maybe_hint_sparse_adam(self) -> None:
        """Surface one measured fact: at multi-million-row tied tables the
        dense (V, E) gradient + optimizer-state walk dominates the step —
        ``sparse_adam`` measured 3.6x the dense-update arm at 4M rows × E=64
        (docs/performance.md). If this model QUALIFIES for the sparse step
        but a dense embedding optimizer is configured, say so once.

        One-time is tracked with an explicit instance flag (not Python's
        per-location warning registry, which the user's ``-W always``/
        ``error`` filters bypass — and the message interpolates the row
        count, so the registry key changes per model anyway)."""
        a = self.args
        if getattr(self, "_sparse_hint_emitted", False):
            return
        heads = list(getattr(self.model, "heads", ()) or ())
        if len(heads) != 1:
            return
        rows = self._tied_table_rows(heads[0])
        if rows is None or rows < SPARSE_HINT_MIN_ROWS:
            return
        try:
            from .sparse_embedding_step import validate_sparse_config

            validate_sparse_config(self.model, a)
        except (NotImplementedError, ValueError):
            return
        import warnings

        self._sparse_hint_emitted = True
        warnings.warn(
            f"the tied item table has {rows:,} rows and this model "
            "qualifies for embedding_optimizer='sparse_adam' (O(N·E) row "
            "updates — no dense (V, E) gradient or full optimizer-state "
            "walk; 3.6x the dense-update step at 4M rows, quality-pinned "
            "vs dense adafactor in a 2-seed A/B — docs/performance.md): "
            f"consider it over {a.embedding_optimizer!r} at this scale"
        )

    def _init_opt_state(self, params):
        """Optimizer init under jit with EXPLICIT output shardings.

        jit (vs eager) because eager elementwise ops are illegal on arrays
        that are not fully addressable per process — which 'model'-sharded
        tables are NOT once the model axis spans processes. But a bare
        jax.jit(tx.init) would land every (V, E) moment on ONE device
        (sharding propagation does not flow params→zeros in init), an OOM at
        the 100M-row north star — so the output shardings are derived by the
        same path-regex rules as the params': optimizer-state leaf paths end
        with the param name, so `.*_table$` moments row-shard exactly like
        their tables (incl. factored (V,) row moments; scalars replicate).

        sparse_adam/sparse_adafactor: state is ``(dense_opt_state,
        sparse_rows_state[, SparseAccumState])`` — the item table rides the
        O(N·E) row update (trainer/sparse_embedding_step.py); moments are
        jit-initialized with the TABLE's sharding as explicit out_shardings
        (works for cross-process row-sharded tables too). Moment STORAGE
        follows ``embedding_moment_dtype`` (bf16 default — halves the
        sparse state's HBM residency; compute stays f32)."""
        if self.args.embedding_optimizer in SPARSE_OPTIMIZERS:
            import functools

            from jax.sharding import NamedSharding, PartitionSpec
            from ..ops.sparse_update import (
                SparseRowsAdafactorState,
                SparseRowsAdamState,
                sparse_rows_adafactor_init,
                sparse_rows_adam_init,
            )
            from .sparse_embedding_step import tree_get, tree_set

            path, item_col, _, sampler = self._sparse_setup(params)
            dense_tree = tree_set(params, path, None)
            shapes = jax.eval_shape(self._tx.init, dense_tree)
            out_shardings = param_shardings(shapes, self.mesh)
            dense_opt = jax.jit(self._tx.init, out_shardings=out_shardings)(
                dense_tree
            )
            # moments must inherit the TABLE's (possibly cross-process row)
            # sharding; jit + explicit out_shardings because zeros_like
            # under jit does not propagate from its input, and eager ops
            # are illegal on non-fully-addressable tables
            table = tree_get(params, path)
            tsh = getattr(table, "sharding", None)
            if not isinstance(tsh, NamedSharding):
                tsh = NamedSharding(self.mesh, PartitionSpec())
            rep = NamedSharding(self.mesh, PartitionSpec())
            mdt = (jnp.bfloat16
                   if self.args.embedding_moment_dtype == "bf16" else None)
            if self.args.embedding_optimizer == "sparse_adafactor":
                sparse_sh = SparseRowsAdafactorState(count=rep, v=tsh)
                init_fn = functools.partial(
                    sparse_rows_adafactor_init, moment_dtype=mdt)
            else:
                sparse_sh = SparseRowsAdamState(count=rep, mu=tsh, nu=tsh)
                init_fn = functools.partial(
                    sparse_rows_adam_init, moment_dtype=mdt)
            sparse_state = jax.jit(init_fn, out_shardings=sparse_sh)(table)
            k = self.args.gradient_accumulation_steps
            if k and k > 1:
                from .sparse_embedding_step import sparse_accum_init

                b, s = self._example_shapes[item_col]
                n_neg = jax.eval_shape(
                    sampler.sample, jax.random.PRNGKey(0)).shape[0]
                # SSN doubles the input-row region (augmented lookup rows +
                # original label rows — sparse_embedding_step layout)
                im = self.model.heads[0].input_module
                n_in = b * s * (2 if getattr(im, "pre", None) is not None
                                else 1)
                accum_init = functools.partial(
                    sparse_accum_init, n_ids=n_in + n_neg,
                    emb_dim=table.shape[1], k=k,
                )
                acc = jax.jit(
                    accum_init,
                    out_shardings=param_shardings(
                        jax.eval_shape(accum_init, dense_tree), self.mesh,
                    ),
                )(dense_tree)
                return (dense_opt, sparse_state, acc)
            return (dense_opt, sparse_state)
        shapes = jax.eval_shape(self._tx.init, params)
        out_shardings = param_shardings(shapes, self.mesh)
        return jax.jit(self._tx.init, out_shardings=out_shardings)(params)

    # ------------------------------------------------------------------ steps
    def _make_one_train_step(self):
        """The single optimizer step — shared by the K=1 jit and the
        lax.scan K-packing so the two stay bit-identical (the equivalence is
        pinned by test; a divergence here would silently break it)."""
        if self.args.embedding_optimizer in SPARSE_OPTIMIZERS:
            from .sparse_embedding_step import make_sparse_one_step

            path, item_col, masking_name, sampler = self._sparse_setup(
                self._train_state.params
            )
            return make_sparse_one_step(
                self.model, self.args, path, item_col, masking_name, sampler,
                self._tx, self._schedule,
                rule=("adafactor"
                      if self.args.embedding_optimizer == "sparse_adafactor"
                      else "adam"),
            )
        self._maybe_hint_sparse_adam()
        model, tx = self.model, self._tx

        def one_step(state: TrainState, batch):
            rng, new_rng = jax.random.split(state.rng)
            r = {
                "masking": jax.random.fold_in(rng, 0),
                "dropout": jax.random.fold_in(rng, 1),
                "sampling": jax.random.fold_in(rng, 2),
                # train-time augmentations (StochasticSwapNoise)
                "augment": jax.random.fold_in(rng, 3),
            }

            def loss_fn(params):
                loss, _ = model.apply(
                    params, batch, targets=batch, training=True,
                    compute_metrics=False, rngs=r,
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1, rng=new_rng),
                loss,
            )

        return one_step

    def _build_train_step(self):
        return jax.jit(self._make_one_train_step(), donate_argnums=(0,))

    def _build_train_step_multi(self):
        """K optimizer steps per dispatch: lax.scan of the single step over
        (K, B, ...) stacked batches (steps_per_execution>1). Same per-step
        RNG chain as single-step execution → bit-identical trajectories;
        amortizes per-dispatch overhead (measured +28% throughput at K=8 on
        the REES46 bench config). Returns (state, (K,) losses)."""
        one_step = self._make_one_train_step()

        def train_step_multi(state: TrainState, stacked_batches):
            return jax.lax.scan(one_step, state, stacked_batches)

        return jax.jit(train_step_multi, donate_argnums=(0,))

    def _combine_task_losses(self, task_means: Dict[str, float]) -> float:
        from ..model.base import combine_task_losses

        return combine_task_losses(self.model, task_means)

    def _make_eval_one(self, compute_metrics: bool):
        """Single eval batch → (task-loss state, metric states) — shared by
        the unpacked jit and the K-packed scan so they cannot diverge."""
        from ..model.base import task_loss_state

        model = self.model

        def eval_one(params, batch):
            _, outs = model.apply(
                params, batch, targets=batch, testing=True,
                compute_metrics=compute_metrics,
            )
            metrics = {}
            for task_name, out in outs.items():
                if out.metrics:
                    for k, v in out.metrics.items():
                        metrics[f"{task_name}/{k}"] = v
            return task_loss_state(outs), metrics

        return eval_one

    def _build_eval_step(self, compute_metrics: bool):
        return jax.jit(self._make_eval_one(compute_metrics))

    def _build_eval_step_multi(self, compute_metrics: bool):
        """K eval batches per dispatch: scan the eval step and merge the
        (sum, count) metric states on device — the unpacked loop pays ~a
        dozen tiny dispatched accumulation ops per batch on top of the step
        dispatch itself. Returns (summed_loss, merged_metric_state, K)."""
        from ..model.base import merge_loss_state

        eval_one = self._make_eval_one(compute_metrics)

        def eval_multi(params, stacked):
            first = jax.tree.map(lambda x: x[0], stacked)
            l0, m0 = eval_one(params, first)
            rest = jax.tree.map(lambda x: x[1:], stacked)

            def body(carry, batch):
                lstate, mstate = carry
                l, m = eval_one(params, batch)
                merged = {
                    name: (mstate[name][0] + s, mstate[name][1] + c)
                    for name, (s, c) in m.items()
                } if m else mstate
                return (merge_loss_state(lstate, l), merged), None

            (lstate, mstate), _ = jax.lax.scan(body, (l0, m0), rest)
            return lstate, mstate

        return jax.jit(eval_multi)

    # ------------------------------------------------------------------ train
    def train(self, resume_from_checkpoint=None) -> Dict[str, float]:
        """Train for ``num_training_steps``.

        ``resume_from_checkpoint`` (HF-parity crash recovery): ``True`` loads
        the latest complete ``checkpoint-*`` under ``output_dir``, a string
        loads that path. The restored run continues the ORIGINAL schedule
        (optimizer step and RNG stream come from the checkpoint) and, with
        ``max_steps`` set, runs only the remaining ``max_steps -
        global_step`` steps — finishing the interrupted run exactly
        (mid-epoch loader position included).
        """
        a = self.args
        loader = self.get_train_dataloader()
        num_steps = self.num_training_steps(loader)
        first = next(iter(loader))
        self._ensure_state(first, num_steps)
        if resume_from_checkpoint:
            path = (
                resume_from_checkpoint
                if isinstance(resume_from_checkpoint, str)
                else self._latest_checkpoint()
            )
            if not path:
                raise ValueError(
                    "resume_from_checkpoint=True but no complete checkpoint-* "
                    f"directory under {a.output_dir}"
                )
            self.load(path)
            if a.max_steps > 0:
                num_steps = max(a.max_steps - self.state.global_step, 0)
        if self._jit_train_step is None:
            self._jit_train_step = self._build_train_step()
        K = max(int(a.steps_per_execution), 1)
        if K > 1 and self._jit_train_step_multi is None:
            self._jit_train_step_multi = self._build_train_step_multi()

        # incremental logging: resume global_step from past runs
        self.state.past_global_steps = self.state.global_step

        profile_range = None
        if a.profile_steps:
            lo, hi = (int(x) for x in a.profile_steps.split(","))
            profile_range = (lo, hi)

        start = time.time()
        pbar = None
        if not a.disable_tqdm and jax.process_index() == 0:
            try:
                from tqdm.auto import tqdm

                pbar = tqdm(total=num_steps, desc="train", unit="step")
            except ImportError:
                pass
        losses = []
        loss_acc = [jnp.zeros(()), 0]  # (device loss sum, step count)
        step_in_run = 0
        epochs = math.inf if a.max_steps > 0 else a.num_train_epochs
        done = num_steps <= 0  # resume may find the run already complete
        epoch = 0
        n_examples = 0
        # mid-epoch resume: restore the loader's (epoch, batch) position from
        # a load()ed checkpoint (shuffle is deterministic in (seed, epoch)).
        # Only a freshly loaded position fast-forwards — a later train() call
        # (incremental window) starts its loader from the top.
        pos = self._resume_position
        self._resume_position = None
        if pos and (pos[0] > 0 or pos[1] > 0) and hasattr(loader, "set_state"):
            # batches_in_epoch may be 0 at an epoch boundary — the shuffle
            # EPOCH must still be restored or the resumed run replays
            # already-consumed epochs' data order
            loader.set_state(*pos)
        else:
            self.state.batches_in_epoch = 0
        while not done and epoch < epochs:
            # record which (deterministic) shuffle order this epoch will use —
            # the init-time batch peek advances the loader's internal epoch,
            # so read it rather than counting locally
            self.state.loader_epoch = getattr(loader, "_epoch", self.state.loader_epoch)
            pending: List[Dict[str, Any]] = []
            epoch_batches = 0

            def dispatch(group):
                """Run a group of batches: one multi-step dispatch if the
                whole group fits, else single steps. Returns per-step losses
                (device array / list — only floated at logging boundaries)."""
                nonlocal step_in_run, n_examples, done
                if len(group) > 1:
                    sbs = shard_stacked_batches(group, self.mesh)
                    self._train_state, step_losses = self._jit_train_step_multi(
                        self._train_state, sbs
                    )
                else:
                    sb = shard_batch(
                        {k: jnp.asarray(v) for k, v in group[0].items()},
                        self.mesh,
                    )
                    self._train_state, loss = self._jit_train_step(
                        self._train_state, sb
                    )
                    step_losses = [loss]
                # device-side running sum → exact MEAN train loss over the
                # run (HF reports the average, not a last-step sample)
                loss_acc[0] = loss_acc[0] + (
                    step_losses.sum() if hasattr(step_losses, "sum")
                    else step_losses[0]
                )
                loss_acc[1] += len(group)
                for i, b in enumerate(group):
                    step_in_run += 1
                    self.state.global_step = self.state.past_global_steps + step_in_run
                    self.state.batches_in_epoch += 1
                    # batches are per-process stripes; report GLOBAL examples
                    n_examples += (
                        next(iter(b.values())).shape[0] * self._stripe[1]
                    )
                    if (a.logging_steps
                            and step_in_run % a.logging_steps == 0) \
                            or step_in_run == num_steps:
                        l = float(step_losses[i])
                        losses.append(l)
                        self.state.log_history.append(
                            {"loss": l, "step": self.state.global_step}
                        )
                        self._report(
                            {"train/loss": l}, self.state.global_step
                        )
                if pbar is not None:
                    pbar.update(len(group))
                if (
                    a.eval_steps
                    and step_in_run % a.eval_steps == 0
                    and self._has_eval_data()
                ):
                    # periodic mid-train evaluation (HF evaluation_strategy=
                    # "steps"); evaluate() logs/reports at this global step.
                    # Runs BEFORE a same-boundary save so best-checkpoint
                    # tracking sees this step's metric (HF order).
                    self.evaluate()
                if a.save_steps and step_in_run % a.save_steps == 0:
                    self._save_checkpoint()
                if step_in_run >= num_steps:
                    done = True

            for batch in loader:
                epoch_batches += 1
                if profile_range and step_in_run == profile_range[0]:
                    jax.profiler.start_trace(
                        a.profile_dir or os.path.join(a.output_dir, "profile")
                    )
                pending.append(batch)
                # group size: never cross the run end or a save boundary
                # (checkpoints must reflect state exactly AT the boundary);
                # profiling runs unpacked so trace edges align with steps
                k_target = min(K, num_steps - step_in_run)
                if a.save_steps:
                    k_target = min(
                        k_target, a.save_steps - (step_in_run % a.save_steps)
                    )
                if a.eval_steps:
                    # eval must observe state exactly AT the boundary step
                    k_target = min(
                        k_target, a.eval_steps - (step_in_run % a.eval_steps)
                    )
                if profile_range is not None:
                    k_target = 1
                if len(pending) < k_target:
                    continue
                dispatch(pending)
                pending = []
                if profile_range and step_in_run >= profile_range[1]:
                    jax.block_until_ready(self._train_state.step)
                    jax.profiler.stop_trace()
                    profile_range = None
                if done:
                    break
            else:
                # full epoch consumed — flush the <K tail, position resets
                for b in pending:
                    if not done:
                        dispatch([b])
                pending = []
                self.state.batches_in_epoch = 0
            if epoch_batches == 0 and not done:
                raise ValueError(
                    "train dataloader yielded no batches — with max_steps>0 "
                    "this would loop forever; check the train dataset"
                )
            epoch += 1
            self.state.epoch = epoch

        if pbar is not None:
            pbar.close()
        # an async save started near the end must be durable before train()
        # returns (callers read checkpoint dirs right after)
        self.wait_for_checkpoints()
        if a.load_best_model_at_end:
            best = getattr(self, "_best_checkpoint", None)
            if best and os.path.isdir(best):
                # HF semantics: restore the best checkpoint's PARAMETERS;
                # global_step/log_history/optimizer state stay as-is
                self._load_params_only(best)
            elif a.metric_for_best_model:
                import warnings

                warnings.warn(
                    "load_best_model_at_end: no checkpoint recorded "
                    f"{a.metric_for_best_model!r} (set eval_steps at save "
                    "boundaries); keeping final parameters"
                )
        runtime = time.time() - start
        metrics = {
            "train_loss": (
                float(loss_acc[0]) / loss_acc[1] if loss_acc[1]
                else float("nan")
            ),
            "train_runtime": runtime,
            "train_samples_per_second": n_examples / max(runtime, 1e-9),
            "train_steps": step_in_run,
            "global_step": self.state.global_step,
        }
        self.state.log_history.append(metrics)
        self._report(metrics, self.state.global_step)
        self._log_json(metrics)
        return metrics

    def _report(self, record: Dict[str, Any], step: int) -> None:
        """Stream numeric scalars to TensorBoard when ``args.report_to``
        includes "tensorboard" (the reference inherits W&B/TensorBoard
        reporting from the HF Trainer's report_to — SURVEY.md §5). Process 0
        only; events land in {output_dir}/runs."""
        if "tensorboard" not in str(self.args.report_to):
            return
        if jax.process_index() != 0:
            return
        if self._tb_writer is None:
            from torch.utils.tensorboard import SummaryWriter

            self._tb_writer = SummaryWriter(
                log_dir=os.path.join(self.args.output_dir, "runs")
            )
        for k, v in record.items():
            if k in ("step", "global_step"):
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            self._tb_writer.add_scalar(k, v, step)
        self._tb_writer.flush()

    def _log_json(self, record: Dict[str, Any]) -> None:
        """Append a metrics record to metrics.jsonl (the paper driver's
        dllogger analog — reference exp_outputs.py)."""
        if not self.args.log_json:
            return
        os.makedirs(self.args.output_dir, exist_ok=True)
        with open(os.path.join(self.args.output_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps({
                "global_step": self.state.global_step,
                "experiments_group": self.args.experiments_group,
                **record,
            }) + "\n")

    # ------------------------------------------------------------------- eval
    def evaluate(
        self,
        eval_dataset=None,
        metric_key_prefix: str = "eval",
        on_train_set: bool = False,
        max_steps: Optional[int] = None,
    ) -> Dict[str, float]:
        """Streaming eval. ``on_train_set=True`` evaluates on the training
        data capped at ``args.eval_steps_on_train_set`` batches (reference
        T4RecTrainingArguments.eval_steps_on_train_set)."""
        a = self.args
        if on_train_set:
            loader = self.get_train_dataloader()
            max_steps = max_steps or a.eval_steps_on_train_set
            metric_key_prefix = f"{metric_key_prefix}_train"
        else:
            loader = self.get_eval_dataloader(eval_dataset)
        if self._train_state is None:
            first = next(iter(loader))
            self._ensure_state(first, 1)
        if self._jit_eval_step is None:
            self._jit_eval_step = self._build_eval_step(self.compute_metrics)
        # eval packing shares the steps_per_execution knob; metric thinning
        # (compute_metrics_each_n_steps > 1) keeps the unpacked loop
        K = max(int(a.steps_per_execution), 1)
        pack = K > 1 and (not self.compute_metrics
                          or a.compute_metrics_each_n_steps == 1)
        if pack and self._jit_eval_step_multi is None:
            self._jit_eval_step_multi = self._build_eval_step_multi(
                self.compute_metrics
            )

        start = time.time()
        metric_state: Dict[str, Any] = {}
        # accumulate on device — a host transfer per batch costs ~30ms on a
        # tunneled TPU backend; one transfer happens at the end.
        # loss_state: {task: (Σ loss·w, Σ w)} — the dataset-level loss is the
        # exact weighted mean over valid targets (see _task_loss_state)
        loss_state: Dict[str, Any] = {}
        n_batches, n_examples = 0, 0
        pending: List[Dict[str, Any]] = []

        from ..model.base import merge_loss_state

        def merge_loss(lstate):
            nonlocal loss_state
            loss_state = merge_loss_state(loss_state, lstate)

        def flush(group):
            nonlocal metric_state, n_batches, n_examples
            if len(group) > 1:
                stacked = shard_stacked_batches(group, self.mesh)
                lstate, metrics = self._jit_eval_step_multi(
                    self._train_state.params, stacked
                )
            else:
                sb = shard_batch(
                    {k: jnp.asarray(v) for k, v in group[0].items()}, self.mesh
                )
                lstate, metrics = self._jit_eval_step(self._train_state.params, sb)
            merge_loss(lstate)
            n_batches += len(group)
            n_examples += sum(next(iter(b.values())).shape[0] for b in group)
            if self.compute_metrics and metrics:
                metric_state = (
                    update_metric_state(metric_state, metrics)
                    if metric_state
                    else metrics
                )

        for i, batch in enumerate(loader):
            if max_steps is not None and i >= max_steps:
                break
            if pack:
                pending.append(batch)
                if len(pending) == K:
                    flush(pending)
                    pending = []
            elif self.compute_metrics and i % a.compute_metrics_each_n_steps != 0:
                # thinned metric update: loss still accumulates
                sb = shard_batch(
                    {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh
                )
                lstate, _ = self._jit_eval_step(self._train_state.params, sb)
                merge_loss(lstate)
                n_batches += 1
                n_examples += next(iter(batch.values())).shape[0]
            else:
                flush([batch])
        for b in pending:
            flush([b])
        task_means = {
            name: float(s) / max(float(w), 1.0)
            for name, (s, w) in loss_state.items()
        }
        runtime = time.time() - start

        results = {
            f"{metric_key_prefix}_loss": self._combine_task_losses(task_means),
            f"{metric_key_prefix}_runtime": runtime,
            f"{metric_key_prefix}_samples_per_second": n_examples / max(runtime, 1e-9),
        }
        if metric_state:
            final = finalize_metrics(metric_state)
            for name, val in final.items():
                # reference key style: eval_/next-item/ndcg_at_10
                # (trainer.py:683-689, process_metrics :836-845)
                results[f"{metric_key_prefix}_/{name}"] = float(val)
        self.state.log_history.append(results)
        self._report(results, self.state.global_step)
        self._log_json(results)
        if metric_key_prefix == "eval":
            # best-checkpoint tracking reads the metrics of the most recent
            # eval boundary (load_best_model_at_end); the step tag prevents
            # a save at a NON-eval boundary from claiming a stale metric
            self._last_eval_metrics = results
            self._last_eval_step = self.state.global_step
        if self.args.log_predictions and not on_train_set:
            self.log_predictions(eval_dataset, metric_key_prefix=metric_key_prefix)
        return results

    def log_predictions(self, dataset=None, metric_key_prefix: str = "eval") -> str:
        """Dump top-k predicted ids/scores to parquet
        (reference log_predictions_callback, trainer.py:748-800)."""
        import pandas as pd

        scores, ids = self.predict(dataset or self.eval_dataset)
        os.makedirs(self.args.output_dir, exist_ok=True)
        path = os.path.join(
            self.args.output_dir,
            f"pred_logs_{metric_key_prefix}_{self.state.global_step}.parquet",
        )
        pd.DataFrame(
            {
                "pred_item_ids": list(map(list, ids)),
                "pred_item_scores": list(map(list, scores.astype(float))),
            }
        ).to_parquet(path)
        return path

    # ----------------------------------------------------------------- predict
    def predict(self, test_dataset=None, top_k: Optional[int] = None):
        """Top-k next-item predictions over a dataset
        (reference evaluation_loop top-k truncation trainer.py:532-592:
        trainer predict_top_k wins over model.top_k when both set)."""
        a = self.args
        loader = self.get_test_dataloader(test_dataset)
        if self._train_state is None:
            first = next(iter(loader))
            self._ensure_state(first, 1)
        k = top_k or a.predict_top_k or self.model.top_k
        model = self.model

        if not isinstance(self._jit_predict_step, dict):
            self._jit_predict_step = {}
        if k not in self._jit_predict_step:
            def predict_step(params, batch, k=k):
                return model.apply(params, batch, top_k=k)
            self._jit_predict_step[k] = jax.jit(predict_step)
        step_fn = self._jit_predict_step[k]

        all_scores, all_ids = [], []
        for batch in loader:
            sb = shard_batch({k2: jnp.asarray(v) for k2, v in batch.items()}, self.mesh)
            scores, ids = step_fn(self._train_state.params, sb)
            all_scores.append(np.asarray(scores))
            all_ids.append(np.asarray(ids))
        scores, ids = np.concatenate(all_scores), np.concatenate(all_ids)
        # the final batch is zero-filled to full size (static shapes):
        # truncate to the dataset's real session count so predictions align
        # 1:1 with input sessions (reference predictions do)
        num_rows = getattr(loader, "num_rows", None)
        if num_rows is not None and len(scores) > num_rows:
            scores, ids = scores[:num_rows], ids[:num_rows]
        return scores, ids

    # ------------------------------------------------------------- checkpoint
    @property
    def params(self):
        return self._train_state.params if self._train_state else None

    def _latest_checkpoint(self) -> Optional[str]:
        """Newest COMPLETE checkpoint-* dir under output_dir (a dir missing
        trainer_state.json is a partial write — skipped)."""
        root = self.args.output_dir
        if not os.path.isdir(root):
            return None
        cks = [
            d for d in os.listdir(root)
            if d.startswith("checkpoint-")
            and os.path.exists(os.path.join(root, d, "trainer_state.json"))
        ]
        if not cks:
            return None
        return os.path.join(root, max(cks, key=lambda d: int(d.split("-")[1])))

    def _save_checkpoint(self) -> str:
        path = os.path.join(
            self.args.output_dir, f"checkpoint-{self.state.global_step}"
        )
        self.save(path)
        self._track_best_checkpoint(path)
        self._rotate_checkpoints()
        return path

    def _track_best_checkpoint(self, path: str) -> None:
        """Record this checkpoint as best when args.metric_for_best_model
        improved at its eval boundary (HF load_best_model_at_end semantics —
        reference test_trainer.py::test_saves_checkpoints_best_metric)."""
        a = self.args
        if not (a.load_best_model_at_end and a.metric_for_best_model):
            return
        metrics = getattr(self, "_last_eval_metrics", None)
        if not metrics:
            return
        # only pair a checkpoint with an eval from the SAME step boundary —
        # a save between eval boundaries must not claim a stale metric
        if getattr(self, "_last_eval_step", -1) != self.state.global_step:
            return
        key = a.metric_for_best_model
        if key not in metrics and not key.startswith("eval_"):
            key = f"eval_{key}"
        if key not in metrics:
            # HF-style bare names ('recall_at_10') vs this framework's
            # task-prefixed keys ('eval_/next-item/recall_at_10'): resolve a
            # UNIQUE suffix match so the natural name works
            suffix = a.metric_for_best_model.lstrip("/")
            cands = [k for k in metrics if k.endswith(f"/{suffix}")]
            if len(cands) == 1:
                key = cands[0]
            else:
                raise ValueError(
                    f"metric_for_best_model={a.metric_for_best_model!r} does "
                    f"not match any eval metric; available: {sorted(metrics)}"
                )
        value = float(metrics[key])
        greater = a.greater_is_better
        if greater is None:
            greater = "loss" not in a.metric_for_best_model
        best = getattr(self, "_best_metric", None)
        if best is None or (value > best if greater else value < best):
            self._best_metric = value
            self._best_checkpoint = path

    def _rotate_checkpoints(self):
        limit = self.args.save_total_limit
        if not limit:
            return
        root = self.args.output_dir
        keep = os.path.basename(getattr(self, "_best_checkpoint", "") or "")
        cks = sorted(
            (d for d in os.listdir(root) if d.startswith("checkpoint-")),
            key=lambda d: int(d.split("-")[1]),
        )
        # the best checkpoint is never rotated away (HF semantics)
        for d in cks[:-limit]:
            if d != keep:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    def wait_for_checkpoints(self) -> None:
        """Block until every in-flight async checkpoint write (args.save_async)
        in this process is durable on disk. No-op otherwise."""
        from .checkpoint import wait_all_pending

        wait_all_pending()

    def save(self, path: str, blocking: Optional[bool] = None) -> None:
        """Params + optimizer + trainer state (reference
        _save_model_and_checkpoint trainer.py:701-723).

        ``args.checkpoint_format="orbax"`` writes the full train state as a
        sharded Orbax checkpoint instead — each device/host writes only its
        own shards, so row-sharded tables never gather to one host, and
        restore places shards directly (trainer/checkpoint.py).

        ``blocking=False`` (default when ``args.save_async``) returns after
        snapshotting state to host; serialization + disk IO run in the
        background and overlap the next train steps. trainer_state.json is
        written LAST, so its presence marks a complete checkpoint.
        """
        if blocking is None:
            blocking = not self.args.save_async
        # one save in flight at a time: a still-running previous write must
        # finish before its checkpoint dir can be rotated away or superseded
        self.wait_for_checkpoints()
        os.makedirs(path, exist_ok=True)
        # snapshot scalars/lists NOW — the train loop keeps mutating them
        state_doc = {
            "global_step": self.state.global_step,
            "epoch": self.state.epoch,
            "log_history": list(self.state.log_history),
            "step": int(self._train_state.step),
            "loader_epoch": self.state.loader_epoch,
            "batches_in_epoch": self.state.batches_in_epoch,
        }

        def _write_state_doc():
            with open(os.path.join(path, "trainer_state.json"), "w") as f:
                json.dump(state_doc, f)

        if self.args.checkpoint_format == "orbax":
            if blocking:
                from .checkpoint import save_sharded

                save_sharded(os.path.join(path, "state.orbax"), self._train_state)
                _write_state_doc()
            else:
                from .checkpoint import save_sharded_async

                # blocks only until shards are staged to host memory
                wait = save_sharded_async(
                    os.path.join(path, "state.orbax"), self._train_state
                )

                def _finish():
                    wait()
                    _write_state_doc()

                t = threading.Thread(target=_finish, daemon=True)
                t.start()
                register_pending(t.join)
        else:
            # device→host copy happens here (a consistent snapshot — later
            # steps donate/overwrite the device buffers); only the msgpack
            # serialization + file writes move off-thread
            params_host = jax.device_get(self._train_state.params)
            opt_host = jax.device_get(self._train_state.opt_state)
            # the rng stream position too: MLM/PLM masking, dropout, and
            # sampled softmax all draw from TrainState.rng, so a resumed
            # process must continue the stream, not restart it (reference
            # trainer.py:725-745 tells users to reset seeds manually — we
            # restore exactly instead, in BOTH checkpoint formats)
            rng_host = jax.device_get(self._train_state.rng)

            def _write():
                with open(os.path.join(path, "params.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(params_host))
                with open(os.path.join(path, "opt_state.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(opt_host))
                with open(os.path.join(path, "rng.msgpack"), "wb") as f:
                    f.write(serialization.to_bytes(rng_host))
                _write_state_doc()

            if blocking:
                _write()
            else:
                t = threading.Thread(target=_write, daemon=True)
                t.start()
                register_pending(t.join)

    def _load_params_only(self, path: str) -> None:
        """Restore PARAMETERS from a checkpoint dir, leaving trainer state,
        optimizer state, rng, and step counters untouched (the
        load_best_model_at_end restore — HF loads best weights only)."""
        self.wait_for_checkpoints()
        orbax_path = os.path.join(path, "state.orbax")
        if os.path.isdir(orbax_path):
            from .checkpoint import restore_sharded

            restored = restore_sharded(orbax_path, self._train_state, self.mesh)
            params = restored.params
        else:
            with open(os.path.join(path, "params.msgpack"), "rb") as f:
                params = serialization.from_bytes(
                    jax.device_get(self._train_state.params), f.read()
                )
            params = jax.device_put(params, param_shardings(params, self.mesh))
        self._train_state = self._train_state.replace(params=params)

    def load(self, path: str) -> None:
        """Restore params (+ optimizer + step) — reference
        load_model_trainer_states_from_checkpoint (trainer.py:725-745)."""
        self.wait_for_checkpoints()
        if self._train_state is None:
            raise ValueError(
                "Call train()/evaluate() once (or _ensure_state) before load() "
                "so the parameter structure exists"
            )
        orbax_path = os.path.join(path, "state.orbax")
        if os.path.isdir(orbax_path):  # format auto-detected, not args-gated
            from .checkpoint import restore_sharded

            restored = restore_sharded(orbax_path, self._train_state, self.mesh)
            params, opt_state = restored.params, restored.opt_state
            # rng too: MLM/PLM masking draws from the train-state rng, so
            # bit-exact resume needs the saved stream position
            self._train_state = self._train_state.replace(rng=restored.rng)
        else:
            with open(os.path.join(path, "params.msgpack"), "rb") as f:
                params = serialization.from_bytes(
                    jax.device_get(self._train_state.params), f.read()
                )
            params = jax.device_put(params, param_shardings(params, self.mesh))
            opt_state = self._train_state.opt_state
            opt_path = os.path.join(path, "opt_state.msgpack")
            if os.path.exists(opt_path):
                with open(opt_path, "rb") as f:
                    opt_state = serialization.from_bytes(
                        jax.device_get(self._train_state.opt_state), f.read()
                    )
            rng_path = os.path.join(path, "rng.msgpack")
            if os.path.exists(rng_path):  # absent only in pre-round-2 ckpts
                with open(rng_path, "rb") as f:
                    rng = serialization.from_bytes(
                        jax.device_get(self._train_state.rng), f.read()
                    )
                self._train_state = self._train_state.replace(
                    rng=jnp.asarray(rng, self._train_state.rng.dtype)
                )
        with open(os.path.join(path, "trainer_state.json")) as f:
            ts = json.load(f)
        self.state.global_step = ts["global_step"]
        self.state.epoch = ts.get("epoch", 0.0)
        self.state.log_history = ts.get("log_history", [])
        self.state.loader_epoch = ts.get("loader_epoch", 0)
        self.state.batches_in_epoch = ts.get("batches_in_epoch", 0)
        self._resume_position = (
            self.state.loader_epoch, self.state.batches_in_epoch
        )
        self._train_state = self._train_state.replace(
            params=params,
            opt_state=opt_state,
            step=jnp.asarray(ts.get("step", 0), jnp.int32),
        )

    def wipe_memory(self):
        """Drop compiled step caches between incremental windows
        (reference examples_utils.py:101-103 gc + cuda empty_cache analog)."""
        self._jit_train_step = None
        self._jit_train_step_multi = None
        self._jit_eval_step = None
        self._jit_eval_step_multi = None
        self._jit_predict_step = None
        import gc

        gc.collect()
