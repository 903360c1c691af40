"""Tests for preproc utils, examples utils, experimental PostContextFusion,
and the paper-repro driver plumbing."""

import jax
import jax.numpy as jnp
import pandas as pd
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.utils.data_utils import (
    add_item_first_seen_col_to_df,
    remove_consecutive_interactions,
    session_aggregator,
)


@pytest.fixture
def interactions_df():
    return pd.DataFrame(
        {
            "session_id": [1, 1, 1, 1, 2, 2, 3],
            "item_id":    [5, 5, 6, 5, 7, 7, 8],
            "timestamp":  [10, 11, 12, 13, 9, 14, 20],
            "category":   [1, 1, 2, 1, 3, 3, 4],
        }
    )


def test_remove_consecutive_interactions(interactions_df):
    out = remove_consecutive_interactions(interactions_df)
    # session 1: 5,5,6,5 -> 5,6,5 ; session 2: 7,7 -> 7
    assert list(out[out.session_id == 1].item_id) == [5, 6, 5]
    assert list(out[out.session_id == 2].item_id) == [7]
    assert len(out[out.session_id == 3]) == 1


def test_add_item_first_seen(interactions_df):
    out = add_item_first_seen_col_to_df(interactions_df)
    assert "item_ts_first" in out.columns
    assert out[out.item_id == 5].item_ts_first.unique().tolist() == [10]
    assert out[out.item_id == 7].item_ts_first.unique().tolist() == [9]


def test_session_aggregator(interactions_df, ecommerce_schema):
    schema = ecommerce_schema.select_by_name(["item_id", "category"])
    out = session_aggregator(schema, interactions_df, maximum_length=3, minimum_length=2)
    assert set(out.session_id) == {1, 2}  # session 3 too short
    row1 = out[out.session_id == 1].iloc[0]
    assert row1.item_id == [5, 5, 6]  # sorted by ts, trimmed to 3


def test_session_aggregator_keep_last(interactions_df, ecommerce_schema):
    """keep='last' trims to the most RECENT items — the reference ETL
    notebooks' ListSlice(-SESSIONS_MAX_LENGTH) semantics (its utils
    session_aggregator keeps the first; both sides are supported)."""
    import pytest

    schema = ecommerce_schema.select_by_name(["item_id", "category"])
    out = session_aggregator(
        schema, interactions_df, maximum_length=3, minimum_length=2, keep="last"
    )
    row1 = out[out.session_id == 1].iloc[0]
    assert row1.item_id == [5, 6, 5]  # last 3 of ts-sorted [5, 5, 6, 5]
    with pytest.raises(ValueError):
        session_aggregator(schema, interactions_df, keep="middle")


def test_post_context_fusion(ecommerce_schema):
    from transformers4rec_tpu.blocks import SequentialBlock, TransformerBlock
    from transformers4rec_tpu.experimental import PostContextFusion
    from transformers4rec_tpu.data.synthetic import synthetic_data

    schema = ecommerce_schema
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=8, max_session_length=20, seed=0).items()
    }
    seq = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(32, 2, 1, 20)
    body = SequentialBlock(blocks=(seq, TransformerBlock(transformer=cfg, masking="clm")))
    context = tr.TabularSequenceFeatures.from_schema(
        schema.select_by_name(["weekday_sin"]), aggregation="concat"
    )

    for aggregation, want_dim in [
        ("elementwise-mul", 32), ("elementwise-sum", 32), ("concat", 33),
    ]:
        fused = PostContextFusion(
            sequential_module=body, post_context_module=context,
            fusion_aggregation=aggregation,
        )
        rngs = {
            "params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2),
        }
        params = fused.init(rngs, batch, training=True)
        out, info = fused.apply(
            params, batch, training=True,
            rngs={k: v for k, v in rngs.items() if k != "params"},
        )
        assert out.shape == (8, 20, want_dim)
        assert info is not None


def test_fit_and_evaluate_time_windows(tmp_path, ecommerce_schema):
    from transformers4rec_tpu.data.synthetic import (
        generate_item_interactions,
        interactions_to_sessions,
    )
    from transformers4rec_tpu.utils.examples_utils import fit_and_evaluate

    schema = ecommerce_schema.select_by_name(["item_id", "category"])
    for t in (1, 2, 3):
        d = tmp_path / str(t)
        d.mkdir()
        for split, seed in (("train", t * 2), ("valid", t * 2 + 1)):
            df = generate_item_interactions(800, schema, seed=seed)
            interactions_to_sessions(df, schema, max_session_length=20).to_parquet(
                d / f"{split}.parquet"
            )

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=24, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(24, 2, 1, 20)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "out"), data_loader_engine="parquet",
        per_device_train_batch_size=8, per_device_eval_batch_size=8,
        num_train_epochs=1, max_sequence_length=20,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    results = fit_and_evaluate(trainer, 1, 2, str(tmp_path))
    key = "indexed_by_time_eval_/next-item/ndcg@10"
    assert key in results and len(results[key]) == 2


def test_end_to_end_example_runs():
    """examples/end_to_end.py: raw events → ETL → incremental train → export
    → live daemon (the reference's end-to-end notebook flow)."""
    import os
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "..", "examples", "end_to_end.py"
    )
    out = subprocess.run(
        [sys.executable, script, "--cpu", "--days", "2", "--steps-per-day", "5"],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert "END-TO-END OK" in out.stdout


def test_save_time_based_splits(tmp_path):
    """Partition-by-window + seeded train/valid/test routing (reference
    utils/data_utils.py:169-306): every row lands in exactly one split of its
    window, rows are time-sorted, and the split is deterministic."""
    import numpy as np

    from transformers4rec_tpu.utils.data_utils import save_time_based_splits

    rng = np.random.RandomState(0)
    n = 400
    df = pd.DataFrame(
        {
            "session_id": np.arange(n),
            "day_idx": rng.randint(1, 4, size=n),
            "ts/first": rng.permutation(n),
            "item_id": [[1, 2, 3]] * n,
        }
    )
    out = tmp_path / "splits"
    save_time_based_splits(df, str(out))

    total = 0
    for day in (1, 2, 3):
        d = out / str(day)
        tr_ = pd.read_parquet(d / "train.parquet")
        va = pd.read_parquet(d / "valid.parquet")
        te = pd.read_parquet(d / "test.parquet")
        n_day = int((df.day_idx == day).sum())
        assert len(tr_) + len(va) + len(te) == n_day
        # disjoint by session, union == the window
        ids = np.concatenate([tr_.session_id, va.session_id, te.session_id])
        assert len(set(ids)) == n_day
        assert set(ids) == set(df[df.day_idx == day].session_id)
        # time-sorted within each split
        for part in (tr_, va, te):
            assert (np.diff(part["ts/first"].to_numpy()) >= 0).all()
        # roughly 80/10/10
        assert len(tr_) > len(va) and len(tr_) > len(te)
        total += n_day
    assert total == n

    # deterministic + overwrite=True replaces previous output
    save_time_based_splits(df, str(out))
    tr2 = pd.read_parquet(out / "1" / "train.parquet")
    tr1 = pd.read_parquet(out / "1" / "train.parquet")
    pd.testing.assert_frame_equal(tr1, tr2)

    # accepts a parquet path as input
    p = tmp_path / "sessions.parquet"
    df.to_parquet(p)
    save_time_based_splits(str(p), str(tmp_path / "splits2"))
    assert (tmp_path / "splits2" / "2" / "test.parquet").exists()


def test_trainer_args_reference_audit_fields(tmp_path, ecommerce_schema):
    """Named-audit fields from reference config/trainer.py:23-134:
    eval_on_test_set routes fit_and_evaluate at the test split,
    dataloader_drop_last=False wrap-fills the tail batch,
    experiments_group stamps metrics.jsonl records."""
    import json
    import os

    import numpy as np

    from transformers4rec_tpu.utils.examples_utils import fit_and_evaluate

    # windowed folders where test.parquet and valid.parquet DIFFER in size
    from transformers4rec_tpu.data.synthetic import (
        generate_item_interactions,
        interactions_to_sessions,
    )

    for t in (1, 2):
        d = tmp_path / "win" / str(t)
        os.makedirs(d)
        for split, n in (("train", 640), ("valid", 2560), ("test", 320)):
            df = generate_item_interactions(n, ecommerce_schema, seed=t * 10 + n)
            sessions = interactions_to_sessions(df, ecommerce_schema,
                                                max_session_length=20)
            sessions.to_parquet(d / f"{split}.parquet")

    im = tr.TabularSequenceFeatures.from_schema(
        ecommerce_schema, d_output=16, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("gpt2").build(16, 2, 1, 20)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "out"), data_loader_engine="parquet",
        per_device_train_batch_size=8, per_device_eval_batch_size=2,
        num_train_epochs=1, max_sequence_length=20,
        eval_on_test_set=True, experiments_group="audit-group", log_json=True,
    )
    trainer = tr.Trainer(model=model, args=args, schema=ecommerce_schema)
    results = fit_and_evaluate(trainer, 1, 1, str(tmp_path / "win"))
    assert results  # evaluated on window 2's TEST split
    n_test = len(trainer.get_eval_dataloader())
    trainer2_args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "out2"), data_loader_engine="parquet",
        per_device_eval_batch_size=2, max_sequence_length=20,
    )
    # valid is 2x test rows → more eval batches when pointed at valid
    t2 = tr.Trainer(model=model, args=trainer2_args, schema=ecommerce_schema)
    n_valid = len(t2.get_eval_dataloader(str(tmp_path / "win" / "2" / "valid.parquet")))
    assert n_valid > n_test

    with open(tmp_path / "out" / "metrics.jsonl") as f:
        recs = [json.loads(line) for line in f]
    assert recs and all(r["experiments_group"] == "audit-group" for r in recs)

    # dataloader_drop_last=False: tail batch kept (wrap-filled to full size)
    from transformers4rec_tpu.data.loader import ParquetDataLoader

    keep = ParquetDataLoader.from_schema(
        ecommerce_schema, str(tmp_path / "win" / "1" / "valid.parquet"),
        batch_size=7, max_sequence_length=20, drop_last=False,
    )
    drop = ParquetDataLoader.from_schema(
        ecommerce_schema, str(tmp_path / "win" / "1" / "valid.parquet"),
        batch_size=7, max_sequence_length=20, drop_last=True,
    )
    assert len(keep) == len(drop) + (1 if keep.num_rows % 7 else 0)
    sizes = {b["item_id"].shape[0] for b in keep}
    assert sizes == {7}  # full-size (wrap-filled), never ragged
