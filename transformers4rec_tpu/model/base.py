"""Head / Model: multi-task, multi-head composition.

Parity: /root/reference/transformers4rec/torch/model/base.py —
``PredictionTask`` (:52-232), ``Head`` (:235-492) with per-task weights and
``from_schema`` target routing (:306-353), ``Model`` (:495-930) with multi-head
loss reduction (:544-598), ``input_schema``/``output_schema`` for serving
export (:747-833), ``save/load`` (:839-922).

TPU-first: ``Model`` is a pure flax module — ``Model.apply(params, batch,
training=True)`` is the jittable unit the Trainer pjits over the device mesh.
Masking/targets flow through as values (MaskingInfo), not module state.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..blocks.base import SequentialBlock, TransformerBlock
from ..config.transformer import T4RecConfig
from ..schema import ColumnSchema, Schema, Tags, ValueCount
from .prediction_task import (
    BinaryClassificationTask,
    NextItemPredictionTask,
    RegressionTask,
    TaskOutput,
)


def task_loss_state(outs: Dict[str, "TaskOutput"]) -> Dict[str, tuple]:
    """Per-task (weighted-loss-sum, weight-sum) — the exact sufficient
    statistics for a dataset-level weighted-mean loss. Zero-filled tail
    batches (drop_last=False) contribute only their real targets' weight,
    instead of a full batch's weight under mean-of-batch-means. Shared by
    Trainer.evaluate and Model.evaluate."""
    state = {}
    for task_name, out in outs.items():
        w = out.loss_weight
        w = jnp.ones(()) if w is None else jnp.maximum(w, 0.0)
        state[task_name] = (out.loss * w, w)
    return state


def merge_loss_state(state: Dict[str, tuple], new: Dict[str, tuple]):
    """Elementwise-additive merge of two task-loss states."""
    if not state:
        return new
    return {
        name: (state[name][0] + s, state[name][1] + w)
        for name, (s, w) in new.items()
    }


def combine_task_losses(model, task_means: Dict[str, float]) -> float:
    """Recombine per-task dataset-level mean losses with the SAME head/task
    weighting Model.__call__ applies per batch."""
    heads = list(getattr(model, "heads", ()) or ())
    if not heads:
        vals = list(task_means.values())
        return float(sum(vals)) / max(len(vals), 1)
    hw = list(model.head_weights or [1.0] * len(heads))
    total = 0.0
    for w_h, head in zip(hw, heads):
        tasks = list(head.tasks)
        tw = list(head.task_weights or [1.0] * len(tasks))
        h = sum(
            w_t * task_means.get(t.task_name, 0.0)
            for w_t, t in zip(tw, tasks)
        )
        total += w_h * h / max(sum(tw), 1e-9)
    return float(total) / max(sum(hw), 1e-9)


def map_next_item_tasks(model, fn):
    """Clone ``model`` with ``fn(task, head)`` applied to every
    ``NextItemPredictionTask`` (fn returns the task — the same object for a
    no-op, or a ``.clone(...)``). Returns ``model`` untouched when nothing
    changed. The single heads→tasks traversal shared by the Trainer's
    vocab-parallel auto-engagement and the serving export's mesh strip."""
    heads = list(getattr(model, "heads", ()) or ())
    new_heads, changed = [], False
    for head in heads:
        tasks, head_changed = [], False
        for t in head.tasks:
            if isinstance(t, NextItemPredictionTask):
                new_t = fn(t, head)
                if new_t is not t:
                    head_changed = True
                t = new_t
            tasks.append(t)
        if head_changed:
            head = head.clone(tasks=tuple(tasks))
            changed = True
        new_heads.append(head)
    return model.clone(heads=tuple(new_heads)) if changed else model


class Head(nn.Module):
    """One body + one or more prediction tasks (reference model/base.py:235-492)."""

    body: SequentialBlock = None
    tasks: Sequence[Any] = ()
    task_weights: Optional[Sequence[float]] = None

    @classmethod
    def from_body(
        cls,
        input_module,
        transformer: Union[T4RecConfig, str, None] = None,
        tasks: Optional[Sequence[Any]] = None,
        task_weights: Optional[Sequence[float]] = None,
        extra_blocks: Sequence[Any] = (),
    ) -> "Head":
        """Wire input module (+ optional MLP blocks) + transformer into a body,
        configuring each NextItemPredictionTask from the masking scheme."""
        blocks: List[Any] = [input_module, *extra_blocks]
        masking = getattr(input_module, "masking", None)
        masking_name = None
        if masking is not None:
            # registry name of the masking class, for arch compat validation
            for key in ("clm", "mlm", "plm", "rtd"):
                from ..masking import masking_registry

                if masking_registry.get(key) is type(masking):
                    masking_name = key
                    break
        if transformer is not None:
            blocks.append(TransformerBlock(transformer=transformer, masking=masking_name))
        body = SequentialBlock(blocks=tuple(blocks))

        tasks = list(tasks or [NextItemPredictionTask(weight_tying=True)])
        configured = []
        for t in tasks:
            if isinstance(t, NextItemPredictionTask):
                # true item vocab (tables may be padded to a shardable row
                # count — features/embedding.py vocab_padding_multiple)
                target_dim = t.target_dim
                if target_dim is None:
                    schema_ = getattr(input_module, "schema", None)
                    item_col = getattr(input_module, "item_id", None)
                    if schema_ is not None and item_col is not None:
                        target_dim = schema_.categorical_cardinalities().get(item_col)
                t = t.clone(target_dim=target_dim)
            if isinstance(t, NextItemPredictionTask) and masking is not None:
                target_prob = t.budget_target_prob
                if (
                    t.loss_budget is None
                    and target_prob is None
                    and masking_name in ("mlm", "rtd")
                ):
                    # adaptive loss budget: a ≥6σ binomial bound on the
                    # target count, resolved at trace time from B*S
                    # (NextItemPredictionTask._budget_rows)
                    target_prob = float(getattr(masking, "mlm_probability", 0.15))
                t = t.clone(
                    eval_single_target=bool(
                        getattr(masking, "eval_on_last_item_seq_only", True)
                    ),
                    padding_idx=getattr(masking, "padding_idx", 0),
                    budget_target_prob=target_prob,
                )
            configured.append(t)
        return cls(body=body, tasks=tuple(configured), task_weights=task_weights)

    @classmethod
    def from_schema(
        cls,
        schema: Schema,
        body: SequentialBlock,
        task_weights: Optional[Sequence[float]] = None,
    ) -> "Head":
        """Build Binary/Regression tasks from target tags
        (reference model/base.py:306-353)."""
        tasks: List[Any] = []
        for col in schema.select_by_tag([Tags.BINARY_CLASSIFICATION, Tags.TARGET]):
            if col.has_tag(Tags.REGRESSION) or col.is_continuous and not col.has_tag(
                Tags.BINARY_CLASSIFICATION
            ):
                continue
            tasks.append(
                BinaryClassificationTask(target_name=col.name, task_name=col.name)
            )
        for col in schema.select_by_tag([Tags.REGRESSION]):
            tasks.append(RegressionTask(target_name=col.name, task_name=col.name))
        if not tasks:
            raise ValueError("No target columns found in schema")
        return cls(body=body, tasks=tuple(tasks), task_weights=task_weights)

    @property
    def input_module(self):
        return self.body.blocks[0] if self.body is not None else None

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        targets: Optional[Union[jnp.ndarray, Dict[str, jnp.ndarray]]] = None,
        training: bool = False,
        testing: bool = False,
        top_k: Optional[int] = None,
        compute_metrics: bool = True,
    ):
        pad_mask = None
        item_id = getattr(self.input_module, "item_id", None)
        if item_id is not None and item_id in inputs:
            pad = getattr(self.input_module, "padding_idx", 0)
            pad_mask = inputs[item_id] != pad

        hidden, info = self.body(
            inputs, training=training, testing=testing, pad_mask=pad_mask
        )

        weights = list(self.task_weights or [1.0] * len(self.tasks))
        outputs: Dict[str, TaskOutput] = {}
        total_loss = jnp.zeros(())
        inference_out = None
        for w, task in zip(weights, self.tasks):
            if isinstance(task, NextItemPredictionTask):
                out = task(
                    hidden, info, training=training, testing=testing,
                    top_k=top_k, compute_metrics=compute_metrics,
                )
            else:
                t = targets
                if isinstance(targets, dict):
                    t = targets.get(task.target_name or task.task_name)
                elif task.target_name and task.target_name in inputs:
                    t = inputs[task.target_name]
                out = task(
                    hidden, targets=t, pad_mask=pad_mask,
                    training=training, testing=testing,
                )
            if isinstance(out, TaskOutput):
                outputs[task.task_name] = out
                total_loss = total_loss + w * out.loss
            else:
                inference_out = out  # inference path returns raw scores/top-k

        if not (training or testing):
            if inference_out is not None:
                return inference_out
            return {name: o.predictions for name, o in outputs.items()}
        total_loss = total_loss / sum(weights)
        return total_loss, outputs


class Model(nn.Module):
    """Multi-head model (reference model/base.py:495-930). The jittable unit.

    Train/test: ``loss, outputs = model.apply(params, batch, targets,
    training=True, rngs=...)``. Inference: next-item scores or top-k tuple.
    """

    heads: Sequence[Head] = ()
    head_weights: Optional[Sequence[float]] = None
    top_k: Optional[int] = None
    name_prefix: str = "model"

    @nn.compact
    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        targets: Optional[Union[jnp.ndarray, Dict[str, jnp.ndarray]]] = None,
        training: bool = False,
        testing: bool = False,
        top_k: Optional[int] = None,
        compute_metrics: bool = True,
    ):
        top_k = top_k if top_k is not None else self.top_k
        weights = list(self.head_weights or [1.0] * len(self.heads))
        if len(weights) != len(self.heads):
            raise ValueError(
                f"head_weights must match the number of heads "
                f"({len(weights)} weights for {len(self.heads)} heads — "
                f"reference model/base.py:528-534 raises likewise)"
            )
        if not (training or testing):
            if len(self.heads) == 1:
                return self.heads[0](
                    inputs, training=False, testing=False, top_k=top_k
                )
            return [h(inputs, training=False, testing=False, top_k=top_k)
                    for h in self.heads]

        total = jnp.zeros(())
        all_outputs: Dict[str, TaskOutput] = {}
        for w, head in zip(weights, self.heads):
            loss, outs = head(
                inputs, targets=targets, training=training, testing=testing,
                compute_metrics=compute_metrics,
            )
            total = total + w * loss
            all_outputs.update(outs)
        total = total / sum(weights)
        return total, all_outputs

    # -------------------------------------------------- self-contained loops
    @staticmethod
    def _as_dense(batch, max_sequence_length=None):
        """Host-side model-entry densify: ragged ``__values``/``__offsets``
        batches are padded to a static shape before the jitted step
        (reference Model.forward pads ragged inputs at entry —
        model/base.py:545-551; here padding stays OUT of the traced graph).
        fit/evaluate resolve ``max_sequence_length`` ONCE (first batch) so
        every step sees the same shape — one compile, and batches whose
        sessions exceed it truncate (keep-first) instead of growing the
        position tables past the encoder's configured length."""
        if any(k.endswith("__offsets") for k in batch):
            from ..data.padding import pad_inputs

            batch = pad_inputs(batch, max_sequence_length)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    @staticmethod
    def _ragged_max_len(batch) -> Optional[int]:
        """Longest session in a ragged batch (None for dense batches)."""
        import numpy as np

        out = None
        for k, v in batch.items():
            if k.endswith("__offsets"):
                off = np.asarray(v)
                if len(off) > 1:
                    m = int((off[1:] - off[:-1]).max())
                    out = max(out or 0, m)
        return out

    def fit(
        self,
        dataloader,
        optimizer=None,
        num_epochs: int = 1,
        params=None,
        rng=None,
        verbose: bool = False,
        max_steps: Optional[int] = None,
        max_sequence_length: Optional[int] = None,
    ):
        """Self-contained training loop (reference Model.fit,
        model/base.py:669-707) — the no-Trainer path. Pure-functional: returns
        ``(params, losses)`` instead of mutating module state; pass ``params``
        back in to continue training. ``optimizer`` is any optax
        GradientTransformation (default adam 1e-3, matching the reference's
        ``torch.optim.Adam(self.parameters())`` default)."""
        import optax

        optimizer = optimizer or optax.adam(1e-3)
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        first = None
        if params is None:
            first = next(iter(dataloader))
            if max_sequence_length is None:
                max_sequence_length = self._ragged_max_len(first)
            batch = self._as_dense(first, max_sequence_length)
            init_rngs = {
                "params": jax.random.fold_in(rng, 0),
                "masking": jax.random.fold_in(rng, 1),
                "dropout": jax.random.fold_in(rng, 2),
                "sampling": jax.random.fold_in(rng, 3),
                "augment": jax.random.fold_in(rng, 4),
            }
            params = self.init(init_rngs, batch, targets=batch, training=True)
        opt_state = optimizer.init(params)

        model = self

        @jax.jit
        def train_step(params, opt_state, step_rng, batch):
            r = {
                "masking": jax.random.fold_in(step_rng, 0),
                "dropout": jax.random.fold_in(step_rng, 1),
                "sampling": jax.random.fold_in(step_rng, 2),
                "augment": jax.random.fold_in(step_rng, 3),
            }

            def loss_fn(p):
                loss, _ = model.apply(
                    p, batch, targets=batch, training=True,
                    compute_metrics=False, rngs=r,
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses: List[float] = []
        step = 0
        for epoch in range(num_epochs):
            epoch_loss, n = jnp.zeros(()), 0
            for batch in dataloader:
                if max_sequence_length is None:
                    max_sequence_length = self._ragged_max_len(batch)
                batch = self._as_dense(batch, max_sequence_length)
                rng, step_rng = jax.random.split(rng)
                params, opt_state, loss = train_step(
                    params, opt_state, step_rng, batch
                )
                epoch_loss = epoch_loss + loss
                n += 1
                step += 1
                if max_steps is not None and step >= max_steps:
                    break
            losses.append(float(epoch_loss) / max(n, 1))
            if verbose:
                print(f"[epoch {epoch}] loss {losses[-1]:.5f}")
            if max_steps is not None and step >= max_steps:
                break
        return params, losses

    def evaluate(
        self,
        dataloader,
        params,
        mode: str = "eval",
        max_steps: Optional[int] = None,
        max_sequence_length: Optional[int] = None,
    ) -> Dict[str, float]:
        """Self-contained eval loop (reference Model.evaluate,
        model/base.py:709-739): streams batches, accumulates (sum,count)
        metric states on device, returns flattened ``{task/metric_at_k: v}``."""
        from .ranking_metric import finalize_metrics, update_metric_state

        model = self

        @jax.jit
        def eval_step(params, batch):
            loss, outs = model.apply(
                params, batch, targets=batch, testing=True, compute_metrics=True
            )
            metrics = {}
            for task_name, out in outs.items():
                if out.metrics:
                    for k, v in out.metrics.items():
                        metrics[f"{task_name}/{k}"] = v
            return task_loss_state(outs), metrics

        metric_state: Dict[str, Any] = {}
        # per-task (Σ loss·w, Σ w): the dataset-level loss is the exact
        # weighted mean over valid targets (tail batches are zero-filled)
        loss_state: Dict[str, Any] = {}
        for i, batch in enumerate(dataloader):
            if max_steps is not None and i >= max_steps:
                break
            if max_sequence_length is None:
                max_sequence_length = self._ragged_max_len(batch)
            batch = self._as_dense(batch, max_sequence_length)
            lstate, metrics = eval_step(params, batch)
            loss_state = merge_loss_state(loss_state, lstate)
            metric_state = (
                update_metric_state(metric_state, metrics)
                if metric_state
                else metrics
            )
        task_means = {
            name: float(s) / max(float(w), 1.0)
            for name, (s, w) in loss_state.items()
        }
        # recombine with the model's configured head/task weights — same
        # weighting as the training objective
        results = {f"{mode}_loss": combine_task_losses(self, task_means)}
        if metric_state:
            for name, val in finalize_metrics(metric_state).items():
                results[f"{mode}_/{name}"] = float(val)
        return results

    # ----------------------------------------------------------- persistence
    def save(self, path: str, params) -> None:
        """Write params (msgpack) + input schema (reference Model.save,
        model/base.py:839-875 — state dict only; architecture rebuilt by the
        caller, same contract here)."""
        import os

        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "params.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        self.input_schema.to_json_file(os.path.join(path, "input_schema.json"))

    def load(self, path: str, params_template):
        """Restore params into the structure of ``params_template``
        (reference Model.load, model/base.py:877-922)."""
        import os

        from flax import serialization

        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            return serialization.from_bytes(
                jax.device_get(params_template), f.read()
            )

    # ------------------------------------------------------------ serving I/O
    @property
    def input_schema(self) -> Schema:
        """Feature columns consumed at inference
        (reference model/base.py:747-782)."""
        cols: List[ColumnSchema] = []
        seen = set()
        for head in self.heads:
            schema = getattr(head.input_module, "schema", None)
            if schema is None:
                continue
            for col in schema:
                if col.name not in seen:
                    seen.add(col.name)
                    cols.append(col)
        return Schema(cols)

    @property
    def output_schema(self) -> Schema:
        """Scores (+ ids when top_k set) — reference model/base.py:810-831."""
        task = self.heads[0].tasks[0]
        if isinstance(task, NextItemPredictionTask):
            dim = self.top_k
            if dim is None:
                dim = task.target_dim
            if self.top_k is not None:
                return Schema([
                    ColumnSchema(
                        "item_id_scores", type=3,
                        shape=None, value_count=ValueCount(self.top_k, self.top_k),
                    ),
                    ColumnSchema(
                        "item_ids", type=2,
                        value_count=ValueCount(self.top_k, self.top_k),
                    ),
                ])
            return Schema([ColumnSchema("next-item", type=3)])
        return Schema([ColumnSchema(task.task_name, type=3)])
