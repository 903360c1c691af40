"""Benchmark harness over the five BASELINE.md configs.

Each config trains briefly and reports one JSON line:
``{"config": ..., "examples_per_sec_per_chip": ..., "eval": {...}}``.
``bench.py`` at the repo root remains the driver's single-line headline
benchmark (REES46 throughput); this harness covers the full matrix:

1. getting-started-session-based — synthetic sessions, XLNet-MLM
2. YooChoose ecommerce          — GPT-2 CLM, tied embeddings
3. REES46 paper config          — XLNet-MLM with side features (schema from
                                  the reference's rees46_schema.pbtxt)
4. large-vocab stress           — 4M-row table + sampled softmax on-chip
                                  (sharded 100M-row correctness lives in
                                  tests/test_large_vocab_stress.py +
                                  examples/large_vocab_stress.py)
5. multi-task stretch           — BERT body, next-item + binary + regression

Usage:  python benchmarks/run_all.py [--quick] [--cpu] [--configs 1,2,3,4,5]
        (measurement standard: run the matrix TWICE — tunnel variance is
        ±15%; docs/performance.md records both numbers per config)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time


def _throughput(trainer, steps: int, k_pack: int = 8) -> float:
    """examples/sec/chip of the PACKED production train step
    (steps_per_execution=k_pack — the bench.py execution mode)."""
    import jax

    loader = trainer.get_train_dataloader()
    trainer._ensure_state(next(iter(loader)), steps)
    if trainer._jit_train_step_multi is None:
        trainer._jit_train_step_multi = trainer._build_train_step_multi()
    from transformers4rec_tpu.parallel import shard_stacked_batches

    it = iter(loader)

    def next_batch():
        nonlocal it
        try:
            return next(it)
        except StopIteration:
            it = iter(loader)
            return next(it)

    stacked = shard_stacked_batches([next_batch() for _ in range(k_pack)],
                                    trainer.mesh)
    rows_per_exec = k_pack * next(iter(stacked.values())).shape[1]
    # warmup/compile
    for _ in range(2):
        trainer._train_state, losses = trainer._jit_train_step_multi(
            trainer._train_state, stacked)
    float(losses[-1])
    execs = max(steps // k_pack, 2)
    t0 = time.perf_counter()
    for _ in range(execs):
        trainer._train_state, losses = trainer._jit_train_step_multi(
            trainer._train_state, stacked)
    float(losses[-1])
    dt = time.perf_counter() - t0
    return execs * rows_per_exec / dt / max(jax.device_count(), 1)


def _make_trainer(model, schema, batch_size, seq_len, engine="synthetic", **kw):
    import transformers4rec_tpu as tr

    args = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_benchmarks",
        data_loader_engine=engine,
        per_device_train_batch_size=batch_size,
        per_device_eval_batch_size=batch_size,
        max_sequence_length=seq_len,
        learning_rate=1e-3,
        **kw,
    )
    return tr.Trainer(model=model, args=args, schema=schema)


def config_getting_started(quick: bool):
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import synthetic_ecommerce_data_schema

    schema = synthetic_ecommerce_data_schema(num_items=10000)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=64, masking="mlm", aggregation="concat")
    model = tr.XLNetConfig.build(64, 4, 2, 20).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True))
    trainer = _make_trainer(model, schema, 32 if quick else 128, 20)
    tput = _throughput(trainer, 10 if quick else 50)
    ev = trainer.evaluate()
    return {"config": "getting-started-xlnet-mlm",
            "examples_per_sec_per_chip": round(tput, 1),
            "eval": {k: round(v, 4) for k, v in ev.items() if "at_" in k}}


def config_yoochoose(quick: bool):
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data import tabular_sequence_testing_data as ds

    im = tr.TabularSequenceFeatures.from_schema(
        ds.schema.select_by_name(["item_id", "category"]),
        d_output=128, masking="clm", aggregation="concat")
    model = tr.GPT2Config.build(128, 8, 2, 20).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True))
    trainer = _make_trainer(
        model, ds.schema, 32 if quick else 128, 20,
        engine="parquet")
    trainer.train_dataset = ds.path
    trainer.eval_dataset = ds.path
    tput = _throughput(trainer, 10 if quick else 50)
    ev = trainer.evaluate()
    return {"config": "yoochoose-gpt2-clm",
            "examples_per_sec_per_chip": round(tput, 1),
            "eval": {k: round(v, 4) for k, v in ev.items() if "at_" in k}}


def config_rees46(quick: bool):
    import importlib.util

    dc_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "paper_repro",
        "datasets_configs.py")
    spec = importlib.util.spec_from_file_location("t4r_datasets_configs", dc_path)
    dc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dc)
    import transformers4rec_tpu as tr

    # standalone REES46 schema (pinned against the reference artifact in
    # tests/test_paper_cli.py)
    schema = dc.make_schema("rees46")
    keep = ["sess_pid_seq", "sess_csid_seq", "sess_price_log_norm_seq",
            "sess_et_dayofweek_sin_seq"]
    schema = schema.select_by_name([c for c in keep if c in schema.column_names])
    d = 64 if quick else 192
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=d, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3})
    # quick (CPU) mode: sampled softmax — the 390k full softmax only makes
    # sense with the TPU Pallas kernels
    model = tr.XLNetConfig.build(d, 4 if quick else 16, 2 if quick else 3, 20).to_model(
        im, tr.NextItemPredictionTask(
            weight_tying=True, sampled_softmax=quick, max_n_samples=1000))
    trainer = _make_trainer(model, schema, 32 if quick else 128, 20)
    tput = _throughput(trainer, 10 if quick else 30)
    return {"config": "rees46-xlnet-mlm-side-features",
            "examples_per_sec_per_chip": round(tput, 1)}


def config_multitask(quick: bool):
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data import music_streaming_testing_data as ms

    feats = ms.schema.remove_by_tag(tr.Tags.TARGET)
    im = tr.TabularSequenceFeatures.from_schema(
        feats, d_output=64, masking="rtd", aggregation="concat")
    cfg = tr.ElectraConfig.build(64, 4, 2, 20)
    head = tr.Head.from_body(
        input_module=im, transformer=cfg,
        tasks=[tr.NextItemPredictionTask(weight_tying=True),
               tr.BinaryClassificationTask(task_name="click", target_name="click"),
               tr.RegressionTask(task_name="play_percentage",
                                 target_name="play_percentage")])
    model = tr.Model(heads=(head,))
    trainer = _make_trainer(model, ms.schema, 32 if quick else 128, 20)
    tput = _throughput(trainer, 10 if quick else 30)
    ev = trainer.evaluate()
    return {"config": "multitask-electra-rtd",
            "examples_per_sec_per_chip": round(tput, 1),
            "eval": {k: round(v, 4) for k, v in ev.items() if "at_" in k}}


def config_large_vocab(quick: bool):
    """BASELINE.md config 4 — large-vocab stress ON-CHIP: the biggest table
    shape that comfortably fits one v5e chip's 16GB HBM (4M rows x E=64 =
    1GB each for table + unfactored adafactor moment + grad — 8M measured
    OOM at 19.1G: XLA pads/fragments the (V, E) temps ~2x) with sampled
    softmax (the full 8M softmax is compute-feasible through the streamed
    kernels but not the production configuration at this vocab). The TRUE
    100M-row north star runs sharded across chips — CPU-mesh correctness in
    tests/test_large_vocab_stress.py and the sharded dryrun arms; this row
    records the single-chip throughput datum."""
    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import synthetic_ecommerce_data_schema

    num_items = 100_000 if quick else 4_000_000
    # ceiling probes (docs/performance.md HBM-ceiling rows): override the row
    # count and optionally skip the dense arm — at ≥8M rows the dense (V, E)
    # grad + optimizer state OOM v5e, while the sparse step (no dense grad,
    # bf16 moments = 512B/row) keeps climbing
    num_items = int(os.environ.get("T4R_LARGE_VOCAB_ROWS", num_items))
    sparse_only = os.environ.get("T4R_LARGE_VOCAB_SPARSE_ONLY") == "1"
    schema = synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=150)
    d = 64 if quick else 192
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=d, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},
        embedding_dims={schema.item_id_column_name: 64})
    def arm(optimizer):
        model = tr.XLNetConfig.build(d, 4 if quick else 16, 2 if quick else 3,
                                     20).to_model(
            im, tr.NextItemPredictionTask(
                weight_tying=True, sampled_softmax=True, max_n_samples=8192))
        trainer = _make_trainer(model, schema, 32 if quick else 128, 20,
                                embedding_optimizer=optimizer)
        return _throughput(trainer, 10 if quick else 30)

    # two arms: the dense adafactor update (reads+writes the full (V, E)
    # state every step) vs the O(N·E) sparse row update
    # (trainer/sparse_embedding_step.py — the 100M-row-viable mode)
    out = {"config": "large-vocab-4M-sampled-softmax",
           "num_items": num_items}
    if not sparse_only:
        out["examples_per_sec_per_chip"] = round(arm("adafactor"), 1)
    out["examples_per_sec_per_chip_sparse_adam"] = round(
        arm("sparse_adam"), 1)
    return out


CONFIGS = {
    "1": config_getting_started,
    "2": config_yoochoose,
    "3": config_rees46,
    "4": config_large_vocab,
    "5": config_multitask,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for key in args.configs.split(","):
        # one config failing (e.g. an OOM at a probe size) must not abort
        # the rest of the matrix
        try:
            result = CONFIGS[key.strip()](args.quick)
        except Exception as e:  # noqa: BLE001
            result = {"config": key.strip(), "error": str(e)[:300]}
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
