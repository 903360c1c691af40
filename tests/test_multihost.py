"""Multi-host (multi-process) CI coverage: data-parallel AND a cross-process
MODEL axis.

The reference never tests DDP in CI (SURVEY.md §4: "Multi-GPU / multi-node:
NOT tested"), and its ceiling is data parallelism anyway
(docs/source/multi_gpu_train.md:27-50). This does better — genuine
2-process jax.distributed runs over Gloo CPU collectives: the first drives
the full data-parallel Trainer (striped loaders, global mesh, replicated
params, implicit grad all-reduce); the second row-shards the item table
ACROSS the two processes (mesh 'model' columns span procs) with
vocab-parallel shard_map CE, cross-process fused_adafactor moments, and
multi-host orbax save/load — the SURVEY §2.10 north-star deployment.
"""

import functools
import os
import shutil
import socket
import subprocess
import sys

import pytest


WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
WORKER_MP = os.path.join(os.path.dirname(__file__), "multihost_worker_mp.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_trainer():
    port = _free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        results[fields["pid"]] = fields
    # replicated state must be bit-identical across hosts; so must the
    # (replicated) loss and eval metrics
    assert results["0"]["checksum"] == results["1"]["checksum"]
    assert results["0"]["loss"] == results["1"]["loss"]
    assert results["0"]["ndcg"] == results["1"]["ndcg"]
    assert float(results["0"]["ndcg"]) >= 0.0


@functools.lru_cache(maxsize=1)
def _single_process_mp_reference():
    """The model-parallel worker's run on ONE process (4 virtual devices,
    same 2x2 mesh, same data/seed): the cross-process run must reproduce its
    loss/metrics. per_device_train_batch_size compensates for this process
    owning 8 virtual devices (global batch = 4x4 = 2x8 = 16)."""
    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.parallel import make_mesh

    import jax

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    schema = synthetic_ecommerce_data_schema(
        num_items=32768, num_categories=20, max_session_length=10
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
    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_mh_mp_ref",
        data_loader_engine="synthetic",
        max_sequence_length=10,
        per_device_train_batch_size=2,   # x8 devices = global batch 16
        per_device_eval_batch_size=2,
        max_steps=4,
        learning_rate=1e-2,
        logging_steps=1,
        steps_per_execution=2,
        embedding_optimizer="adafactor",
        mesh_model_axis=2,
        seed=7,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema, mesh=mesh)
    m = trainer.train()
    ev = trainer.evaluate(max_steps=2)
    return float(m["train_loss"]), float(ev["eval_loss"]), float(
        ev.get("eval_/next-item/ndcg_at_10", -1.0)
    )


@pytest.mark.parametrize("axis_order", ["data_first", "model_first"])
def test_two_process_model_parallel_table(axis_order):
    """Item table row-sharded ACROSS processes: vocab-parallel CE psum over
    a cross-process 'model' axis, distributed optimizer moments, multi-host
    orbax save->load, and loss/metrics matching the single-process
    4-device run (same mesh shape, same data). The model_first arm declares
    the mesh axes ('model', 'data') — the stack must resolve axes by NAME
    (process_data_stripe, batch/param shardings), not position."""
    shutil.rmtree("/tmp/t4r_mh_mp_shared", ignore_errors=True)
    port = _free_port()
    env = {
        **os.environ,
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_PLATFORMS": "cpu",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER_MP, str(pid), "2", str(port), axis_order],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        fields = dict(kv.split("=") for kv in line.split()[1:])
        results[fields["pid"]] = fields

    # both processes see the same (replicated) loss/metrics ...
    assert results["0"]["loss"] == results["1"]["loss"]
    assert results["0"]["eval_loss"] == results["1"]["eval_loss"]
    assert results["0"]["ndcg"] == results["1"]["ndcg"]
    assert results["0"]["restore"] == results["1"]["restore"] == "ok"
    # the cross-process sparse_adam arm must agree bit-for-bit across
    # processes too (replicated rng -> same negatives; psum'd loss)
    assert results["0"]["sparse_loss"] == results["1"]["sparse_loss"]
    assert float(results["0"]["sparse_loss"]) > 0
    # ... but hold DIFFERENT table halves (truly distributed rows)
    assert results["0"]["shard_sum"] != results["1"]["shard_sum"]
    assert int(results["0"]["local_rows"]) * 2 >= 32768

    # and the distributed run reproduces the single-process math
    import numpy as np

    ref_loss, ref_eval, ref_ndcg = _single_process_mp_reference()
    np.testing.assert_allclose(float(results["0"]["loss"]), ref_loss,
                               rtol=1e-5)
    np.testing.assert_allclose(float(results["0"]["eval_loss"]), ref_eval,
                               rtol=1e-5)
    np.testing.assert_allclose(float(results["0"]["ndcg"]), ref_ndcg,
                               atol=1e-6)
