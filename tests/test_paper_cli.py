"""Smoke test of the paper-reproduction CLI driver (the reference's flagship
workflow — transf_exp_main.py incremental time-window train/eval + simulated
inference, SURVEY.md §1.10/§3.5). Runs in-process on a tiny synthetic config."""

import importlib.util
import json
import os
import sys


def _load_cli():
    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "examples", "paper_repro", "transf_exp_main.py")
    spec = importlib.util.spec_from_file_location("transf_exp_main", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["transf_exp_main"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_paper_cli_synthetic_incremental(tmp_path):
    cli = _load_cli()
    results = cli.main([
        "--use_synthetic",
        "--model_type", "xlnet",
        "--masking", "mlm",
        "--d_model", "32",
        "--n_layer", "1",
        "--n_head", "2",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--output_dir", str(tmp_path),
    ])
    # incremental windows produce per-window metric lists
    assert results and all(isinstance(v, list) and v for v in results.values())
    keys = "\n".join(results)
    assert "recall" in keys and ("ndcg" in keys or "loss" in keys)
    with open(os.path.join(tmp_path, "results.json")) as f:
        on_disk = json.load(f)
    assert set(on_disk) == set(results)


def test_paper_cli_from_raw_interactions(tmp_path):
    """One command from RAW row-per-interaction events to windowed incremental
    train/eval: --raw_interactions_path runs the full ETL chain (dedup →
    first-seen → session aggregation → save_time_based_splits, reference
    utils/data_utils.py:169-306) and then the normal paper protocol. Real
    REES46-style interaction dumps drop in with zero code."""
    import numpy as np

    from transformers4rec_tpu.data.synthetic import (
        generate_item_interactions,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=200, num_categories=20, max_session_length=10
    )
    raw = generate_item_interactions(6000, schema, seed=3)
    raw["timestamp"] = np.arange(len(raw))
    raw_path = tmp_path / "raw.parquet"
    raw.to_parquet(raw_path)

    cli = _load_cli()
    results = cli.main([
        "--use_synthetic",  # supplies the schema; data comes from the raw ETL
        "--raw_interactions_path", str(raw_path),
        "--model_type", "xlnet",
        "--masking", "mlm",
        "--d_model", "32",
        "--n_layer", "1",
        "--n_head", "2",
        "--synthetic_num_items", "200",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert results and all(isinstance(v, list) and v for v in results.values())
    keys = "\n".join(results)
    assert "recall" in keys
    # the ETL produced the windowed layout the CLI consumed
    for t in (1, 2, 3):
        d = tmp_path / "out" / "time_windows" / str(t)
        assert (d / "train.parquet").exists() and (d / "valid.parquet").exists()
    with open(tmp_path / "out" / "results.json") as f:
        on_disk = json.load(f)
    assert set(on_disk) == set(results)


def test_paper_cli_sliding_window_protocol(tmp_path):
    """--no_incremental_training retrains from scratch each window on the
    last --training_time_window_size windows (reference
    transf_exp_args.py:64-83 declares the flags; here they are functional)."""
    cli = _load_cli()
    results = cli.main([
        "--use_synthetic",
        "--no_incremental_training",
        "--training_time_window_size", "1",
        "--model_type", "gpt2",
        "--masking", "clm",
        "--d_model", "32",
        "--n_layer", "1",
        "--n_head", "2",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--output_dir", str(tmp_path),
    ])
    assert results and all(len(v) == 2 for v in results.values())


def test_reference_tuned_command_lines_parse():
    """The EXACT tuned command lines from the reference's integration script
    (ci/test_integration.sh — the paper's five model configs + README) parse
    against our CLI: every flag is accepted with reference names."""


    cli = _load_cli()
    src = open("/root/reference/ci/test_integration.sh").read()
    cmds = [
        line for line in src.splitlines()
        if line.startswith("python3 transf_exp_main.py")
    ]
    assert len(cmds) >= 5
    parser = cli.build_parser()
    for cmd in cmds:
        argv = cmd.split()[2:]
        # substitute environment placeholders
        argv = [
            a.replace("$DATA_PATH", "/tmp/data").replace(
                "$FEATURE_SCHEMA_PATH", "/tmp/schema.pbtxt"
            )
            for a in argv
        ]
        args = parser.parse_args(argv)
        assert args.model_type in {"gpt2", "transfoxl", "albert", "xlnet"}
        assert args.d_model > 0 and args.session_seq_length_max == 20
        # the tuned configs exercise label smoothing heavily (0.0–0.9) —
        # it must ride the fused CE path (tests/test_ops.py pins numerics)
        assert 0.0 <= args.label_smoothing <= 0.9


import pytest


@pytest.mark.parametrize("pick", ["gpt2", "transfoxl", "albert", "xlnet-plm",
                                  "xlnet-mlm"])
def test_reference_tuned_command_runs(tmp_path, pick):
    """EVERY tuned command line from the reference's integration script
    (ci/test_integration.sh — the paper's five model configs) RUNS end-to-end
    through our CLI — schema + windowed data substituted with synthetic
    fixtures, size knobs overridden by appending (argparse last-wins) so CPU
    CI stays fast. Exercises the bare scheme flags, label smoothing 0.0-0.9
    through the fused CE kernels, SSN, and --eval_on_test_set."""
    import numpy as np

    from transformers4rec_tpu.data.synthetic import (
        generate_item_interactions,
        interactions_to_sessions,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=300, num_categories=20, max_session_length=20
    )
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(schema.to_json())
    for t in (1, 2, 3):
        d = tmp_path / "win" / str(t)
        os.makedirs(d)
        for split, n in (("train", 800), ("valid", 300), ("test", 300)):
            df = generate_item_interactions(n, schema, seed=t * 7 + n)
            sessions = interactions_to_sessions(df, schema, max_session_length=20)
            sessions.to_parquet(d / f"{split}.parquet")

    src = open("/root/reference/ci/test_integration.sh").read()
    cmds = [line for line in src.splitlines()
            if line.startswith("python3 transf_exp_main.py")]

    def match(line):
        if pick == "gpt2":
            return "--model_type gpt2" in line
        if pick == "transfoxl":
            return "--model_type transfoxl" in line
        if pick == "albert":
            return "--model_type albert" in line
        if pick == "xlnet-plm":
            return "--model_type xlnet" in line and "--plm " in line
        return ("--model_type xlnet" in line and "--mlm " in line
                and "label_smoothing 0.0" in line)

    cmd = next(line for line in cmds if match(line))
    argv = [
        a.replace("$DATA_PATH", str(tmp_path / "win")).replace(
            "$FEATURE_SCHEMA_PATH", str(schema_path)
        )
        for a in cmd.split()[2:]
    ]
    argv += [  # CPU-CI size overrides (argparse: last occurrence wins)
        "--d_model", "32", "--n_layer", "1", "--n_head", "2",
        "--item_embedding_dim", "16",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--num_train_epochs", "1",
        "--time_window_folder_pad_digits", "0",
        "--output_dir", str(tmp_path / "out"),
        "--cpu",
    ]
    cli = _load_cli()
    results = cli.main(argv)
    assert results and all(isinstance(v, list) and v for v in results.values())
    assert any("recall" in k for k in results)


def test_pre_ln_cli_escape(tmp_path):
    """--pre_ln: the ELECTRA-RTD command reaches the TPU-tuned pre-LN
    variant FROM THE CLI (the HF-faithful post-LN default measures ~-36%
    RTD recall@20 — docs/performance.md documents the recommended
    quality-first RTD command line)."""
    cli = _load_cli()
    argv = [
        "--use_synthetic",
        "--model_type", "electra",
        "--rtd",
        "--pre_ln",
        "--d_model", "32", "--n_layer", "1", "--n_head", "2",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--output_dir", str(tmp_path),
    ]
    # the built config must actually be pre-LN (not just accept the flag)
    parser = cli.build_parser()
    args = parser.parse_args(argv)
    import transformers4rec_tpu as tr

    from transformers4rec_tpu.data.synthetic import (
        synthetic_ecommerce_data_schema,
    )

    post = tr.transformer_registry.parse("electra").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=10
    )
    assert post.norm_first is False and post.embed_layer_norm is True
    schema = synthetic_ecommerce_data_schema(
        num_items=300, num_categories=20, max_session_length=10
    )
    model = cli.get_model(args, schema)
    enc = [b for b in model.heads[0].body.blocks
           if hasattr(b, "transformer")][0].transformer
    assert enc.norm_first is True and enc.embed_layer_norm is False
    # and the command runs end-to-end
    results = cli.main(argv)
    assert results and any("recall" in k for k in results)


def test_paper_cli_padded_window_folders(tmp_path):
    """--time_window_folder_pad_digits 4: the CLI reads '0001'-style window
    folders — the layout real NVTabular preprocessing emits (reference CI
    commands all pass pad_digits 4)."""
    cli = _load_cli()
    results = cli.main([
        "--use_synthetic",
        "--model_type", "gpt2",
        "--masking", "clm",
        "--d_model", "16",
        "--n_layer", "1",
        "--n_head", "2",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--time_window_folder_pad_digits", "4",
        "--output_dir", str(tmp_path),
    ])
    assert results and all(v for v in results.values())
    assert (tmp_path / "synthetic_windows" / "0001" / "train.parquet").exists()


# ---------------------------------------------------------------- dataset configs


def _load_datasets_configs():
    root = os.path.join(os.path.dirname(__file__), "..")
    path = os.path.join(root, "examples", "paper_repro", "datasets_configs.py")
    spec = importlib.util.spec_from_file_location("t4r_datasets_configs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_REF_DATASET_CONFIGS = {
    "rees46": "ecom_rees46/rees46_schema.pbtxt",
    "yoochoose": "ecom_yoochoose/yoochoose_schema.pbtxt",
    "g1": "news_g1/g1_schema.pbtxt",
    "adressa": "news_adressa/adressa_schema.pbtxt",
}


def test_generated_dataset_schemas_match_reference_artifacts():
    """The standalone dataset-config generator reproduces every column of the
    reference pbtxt artifacts (names, cardinalities, dtypes, tag sets,
    value_count). The generator intentionally de-duplicates two reference
    typos: g1 lists weekday_sin twice (its ETL produces sin+cos), adressa
    lists country twice."""
    import pytest

    from transformers4rec_tpu.schema import Schema

    ref_root = "/root/reference/examples/t4rec_paper_experiments/datasets_configs"
    if not os.path.isdir(ref_root):
        pytest.skip("reference checkout not available")
    dc = _load_datasets_configs()
    extra_allowed = {"g1": {"weekday_cos"}}
    for ds, rel in _REF_DATASET_CONFIGS.items():
        ref = Schema.from_proto_text(os.path.join(ref_root, rel))
        gen = dc.make_schema(ds)
        ref_names = set(ref.column_names)
        gen_names = set(gen.column_names)
        assert ref_names <= gen_names, (ds, ref_names - gen_names)
        assert gen_names - ref_names <= extra_allowed.get(ds, set()), ds
        for name in ref_names:
            rc, gc = ref[name], gen[name]
            assert set(rc.tags) == set(gc.tags), (ds, name, rc.tags, gc.tags)
            assert rc.type == gc.type, (ds, name)
            assert rc.cardinality == gc.cardinality, (ds, name)
            assert (rc.value_count.min, rc.value_count.max) == (
                gc.value_count.min, gc.value_count.max), (ds, name)


def test_generated_rees46_schema_drives_model_construction(tmp_path):
    """The generated REES46 config is usable end-to-end: write pbtxt, load it
    back, and build the paper model's input module from it."""
    import transformers4rec_tpu as tr

    dc = _load_datasets_configs()
    dc.main(["--out", str(tmp_path), "--datasets", "rees46"])
    schema = tr.Schema.from_proto_text(str(tmp_path / "rees46" / "schema.pbtxt"))
    assert schema.item_id_column_name == "sess_pid_seq"
    assert schema.categorical_cardinalities()["sess_pid_seq"] == 390_001
    input_module = tr.TabularSequenceFeatures.from_schema(
        schema.select_by_tag("item_id"), d_output=32, masking="mlm",
        aggregation="concat",
    )
    assert input_module is not None
