"""Worker process for test_multihost.py: a REAL multi-process data-parallel
Trainer run (jax.distributed + Gloo CPU collectives, 2 procs x 2 devices).

Exercises the exact multi-host path of production TPU pods: per-process
loader striping (global_rank/global_size), shard_batch's
``make_array_from_process_local_data`` assembly, replicated param init, and
the implicit gradient all-reduce from shardings (SURVEY.md §2.10 —
replacing the reference's DDP/NCCL launched via torch.distributed.run).

Usage: multihost_worker.py <process_id> <num_processes> <coordinator_port>
Prints one line: ``RESULT pid=.. loss=.. checksum=.. ndcg=..``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
)
assert jax.process_count() == n

import numpy as np  # noqa: E402

import transformers4rec_tpu as tr  # noqa: E402
from transformers4rec_tpu.data.synthetic import (  # noqa: E402
    synthetic_ecommerce_data_schema,
)

schema = synthetic_ecommerce_data_schema(
    num_items=300, num_categories=20, max_session_length=10
)
im = tr.TabularSequenceFeatures.from_schema(
    schema, d_output=32, masking="clm", aggregation="concat"
)
cfg = tr.transformer_registry.parse("gpt2").build(
    d_model=32, n_head=2, n_layer=1, total_seq_length=10
)
model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
args = tr.T4RecTrainingArguments(
    output_dir=f"/tmp/t4r_multihost_{pid}",
    data_loader_engine="synthetic",
    max_sequence_length=10,
    per_device_train_batch_size=8,
    per_device_eval_batch_size=8,
    max_steps=8,
    learning_rate=1e-2,
    logging_steps=1,
    # packed execution across REAL processes: shard_stacked_batches must
    # assemble (K, B, ...) global arrays from per-process local stacks
    steps_per_execution=2,
)
trainer = tr.Trainer(model=model, args=args, schema=schema)
metrics = trainer.train()
hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
assert hist[-1] < hist[0], f"loss did not decrease: {hist}"

# params are replicated over the global mesh — must be identical on every host
leaves = jax.tree_util.tree_leaves(jax.device_get(trainer.params))
checksum = float(sum(np.float64(np.abs(l).sum()) for l in leaves))
ev = trainer.evaluate(max_steps=4)
print(
    f"RESULT pid={pid} loss={metrics['train_loss']:.6f} "
    f"checksum={checksum:.6f} "
    f"ndcg={ev.get('eval_/next-item/ndcg_at_10', -1.0):.6f}",
    flush=True,
)
