"""Worker for test_multihost.py::test_two_process_model_parallel_table:
a REAL cross-process MODEL axis — the item table row-sharded ACROSS two
processes (2 procs x 2 devices; mesh columns span procs), driving the full
production Trainer path:

- auto-engaged vocab-parallel CE (shard_map psum over the cross-process
  'model' axis — parallel/sharded_embedding.py),
- fused_adafactor moments row-sharded across processes,
- mesh-aware batch striping (each process's devices cover BOTH 'data' rows,
  so each loads the FULL global batch — parallel/mesh.py
  process_data_stripe),
- orbax multi-host save -> load (each process writes/reads only its shards),
- evaluate() with cross-process streamed metric states.

This is the north-star deployment the reference cannot express (its ceiling
is DDP data parallelism — docs/source/multi_gpu_train.md:27-50; SURVEY.md
§2.10 "row/column-sharded tables across hosts").

Usage: multihost_worker_mp.py <process_id> <num_processes> <coordinator_port>
       [axis_order]
``axis_order="model_first"`` builds the mesh with axes ('model', 'data')
instead — the Trainer stack resolves axes BY NAME (batch_sharding,
process_data_stripe), so results must be identical.
Prints: ``RESULT pid=.. loss=.. eval_loss=.. ndcg=.. local_rows=..
shard_sum=.. restore=ok``
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
axis_order = sys.argv[4] if len(sys.argv) > 4 else "data_first"
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=n, process_id=pid
)
assert jax.process_count() == n

import numpy as np  # noqa: E402

import transformers4rec_tpu as tr  # noqa: E402
from transformers4rec_tpu.data.synthetic import (  # noqa: E402
    synthetic_ecommerce_data_schema,
)
from transformers4rec_tpu.parallel import make_mesh  # noqa: E402
from transformers4rec_tpu.parallel.mesh import process_data_stripe  # noqa: E402

# interleave the global device list so the mesh's 'model' axis spans
# processes: table shard 0 lands on process 0's devices, shard 1 on
# process 1's
d = jax.devices()
assert len(d) == 4, d
order = [d[0], d[2], d[1], d[3]]
if axis_order == "model_first":
    # same device placement, PERMUTED axis declaration ('model', 'data') —
    # everything downstream must resolve axes by NAME, not position
    from jax.sharding import Mesh

    arr = np.asarray(order).reshape(2, 2)  # (data, model)
    mesh = Mesh(arr.T, ("model", "data"))
    model_groups = [set(dev.process_index for dev in row) for row in arr.T]
else:
    mesh = make_mesh(data=2, model=2, devices=order)
    model_groups = [
        {dev.process_index for dev in np.asarray(mesh.devices)[:, j]}
        for j in range(2)
    ]
assert model_groups == [{0}, {1}], (
    f"'model' axis does not span procs: {model_groups}"
)
# each process's devices cover BOTH data rows -> full-batch stripe
assert process_data_stripe(mesh) == (0, 1)

NUM_ITEMS = 32768  # > MIN_ROWS_TO_SHARD -> the table row-shards + auto-VP
schema = synthetic_ecommerce_data_schema(
    num_items=NUM_ITEMS, num_categories=20, max_session_length=10
)
im = tr.TabularSequenceFeatures.from_schema(
    schema, d_output=32, masking="mlm", aggregation="concat",
    embedding_dims={schema.item_id_column_name: 16},
)
cfg = tr.transformer_registry.parse("xlnet").build(
    d_model=32, n_head=2, n_layer=1, total_seq_length=10
)
model = cfg.to_model(
    im, tr.NextItemPredictionTask(weight_tying=True, label_smoothing=0.2)
)
# orbax multi-host checkpoints land in ONE shared dir (every process writes
# its own shards there — the pod-slice shared-filesystem layout); the pytest
# launcher wipes it before starting the workers
args = tr.T4RecTrainingArguments(
    output_dir="/tmp/t4r_mh_mp_shared",
    data_loader_engine="synthetic",
    max_sequence_length=10,
    per_device_train_batch_size=4,   # global batch 16 over 4 devices
    per_device_eval_batch_size=4,
    max_steps=4,
    learning_rate=1e-2,
    logging_steps=1,
    steps_per_execution=2,           # stacked-batch striping too
    embedding_optimizer="adafactor",
    checkpoint_format="orbax",       # multi-host sharded save path
    save_steps=4,
    mesh_model_axis=2,
    seed=7,
)
trainer = tr.Trainer(model=model, args=args, schema=schema, mesh=mesh)
task = trainer.model.heads[0].tasks[0]
assert task.vocab_parallel_mesh is mesh, "auto vocab-parallel did not engage"
metrics = trainer.train()

# --- sharding proof: THIS process holds exactly half the table rows, and so
# do the fused_adafactor second moments (cross-process distribution)
def _local_table_shards(tree):
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if "item_id_table" in jax.tree_util.keystr(path) and getattr(
            leaf, "ndim", 0
        ) == 2:
            out.append(leaf)
    return out

tables = _local_table_shards(trainer._train_state.params)
assert len(tables) == 1
table = tables[0]
padded_rows = table.shape[0]
local_rows = {s.data.shape[0] for s in table.addressable_shards}
assert local_rows == {padded_rows // 2}, (local_rows, padded_rows)
row_starts = {s.index[0].start or 0 for s in table.addressable_shards}
assert row_starts == {pid * (padded_rows // 2)}, (pid, row_starts)
shard_sum = float(
    np.float64(np.abs(np.asarray(table.addressable_shards[0].data)).sum())
)
moments = _local_table_shards(trainer._train_state.opt_state)
assert moments, "no table optimizer moments found"
for mo in moments:
    starts = {s.index[0].start or 0 for s in mo.addressable_shards}
    assert starts == {pid * (mo.shape[0] // 2)}, (pid, starts)

# --- evaluate through the cross-process vocab-parallel rank path
ev = trainer.evaluate(max_steps=2)

# --- orbax multi-host save -> load roundtrip (save_steps=4 wrote ckpt-4)
ck = trainer._latest_checkpoint()
assert ck is not None, "no complete checkpoint"
before = np.asarray(table.addressable_shards[0].data).copy()
trainer.load(ck)
after_tables = _local_table_shards(trainer._train_state.params)
after = np.asarray(after_tables[0].addressable_shards[0].data)
np.testing.assert_allclose(after, before)

# --- sparse-embedding arm: the table row-sharded ACROSS processes trained
# with the O(N·E) sparse step (no dense (V, E) gradient anywhere) — the
# 100M-row north-star training mode
im_sp = tr.TabularSequenceFeatures.from_schema(
    schema, d_output=32, masking="mlm", aggregation="concat",
    embedding_dims={schema.item_id_column_name: 16},
)
model_sp = cfg.to_model(
    im_sp, tr.NextItemPredictionTask(
        weight_tying=True, sampled_softmax=True, max_n_samples=64
    ),
)
args_sp = tr.T4RecTrainingArguments(
    output_dir="/tmp/t4r_mh_mp_sparse",
    data_loader_engine="synthetic",
    max_sequence_length=10,
    per_device_train_batch_size=4,
    max_steps=4,
    learning_rate=1e-2,
    logging_steps=1,
    steps_per_execution=2,
    embedding_optimizer="sparse_adam",
    # r5: accumulation through the sparse step must run cross-process too
    # (ids/row-grad buffers in the sharded opt state; boundary dedupe+scatter
    # against the table whose rows live half per process)
    gradient_accumulation_steps=2,
    mesh_model_axis=2,
    seed=13,
)
t_sp = tr.Trainer(model=model_sp, args=args_sp, schema=schema, mesh=mesh)
m_sp = t_sp.train()
sp_loss = float(m_sp["train_loss"])
assert np.isfinite(sp_loss), sp_loss
mu = t_sp._train_state.opt_state[1].mu
mu_starts = {s.index[0].start or 0 for s in mu.addressable_shards}
assert mu_starts == {pid * (mu.shape[0] // 2)}, (pid, mu_starts)
mu_rows = {s.data.shape[0] for s in mu.addressable_shards}
assert mu_rows == {mu.shape[0] // 2}, mu_rows

print(
    f"RESULT pid={pid} loss={metrics['train_loss']:.6f} "
    f"eval_loss={ev['eval_loss']:.6f} "
    f"ndcg={ev.get('eval_/next-item/ndcg_at_10', -1.0):.6f} "
    f"local_rows={padded_rows // 2} shard_sum={shard_sum:.6f} "
    f"sparse_loss={sp_loss:.6f} restore=ok",
    flush=True,
)
