"""Categorify parity tests.

The reference's preprocessing workflows all start with NVTabular's
``Categorify`` op (getting-started-session-based/01-ETL-with-NVTabular.ipynb:
"Categorify encodes nulls to 1, OOVs to 2; 0 is preserved for padding; other
categories start from 3"), and the served Triton ensemble embeds that
workflow (TransformWorkflow stage, notebook 03:656-680) so clients send RAW
item ids. These tests pin the TPU build's analog: ``utils.data_utils
.categorify`` in the ETL, and category maps bundled into the serving artifact
with raw-value encode on input / raw-id decode of the top-k output.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data.synthetic import (
    generate_item_interactions,
    synthetic_data,
    synthetic_ecommerce_data_schema,
)
from transformers4rec_tpu.utils.data_utils import (
    CATEGORIFY_NULL_INDEX,
    CATEGORIFY_OOV_INDEX,
    CATEGORIFY_START_INDEX,
    categorify,
    categorify_schema,
    encode_with_categories,
    etl_interactions_to_time_splits,
    load_categories,
    save_categories,
)


def test_categorify_frequency_order_and_specials():
    df = pd.DataFrame({
        "item_id": [7, 7, 7, 42, 42, 99, None],
        "cat": ["b", "b", "a", "a", "a", "a", "c"],
    })
    enc, maps = categorify(df, ["item_id", "cat"])
    # frequency order: most frequent raw value gets the smallest id
    assert maps["item_id"].tolist() == [7.0, 42.0, 99.0]
    assert enc["item_id"].tolist()[:6] == [3, 3, 3, 4, 4, 5]
    # nulls encode to the reserved null index
    assert enc["item_id"].tolist()[6] == CATEGORIFY_NULL_INDEX
    # deterministic tie-break on raw value ('a' 4x, 'b' 2x, 'c' 1x)
    assert maps["cat"].tolist() == ["a", "b", "c"]
    assert enc["cat"].dtype == np.int64


def test_categorify_freq_threshold_and_max_size():
    df = pd.DataFrame({"c": [1] * 5 + [2] * 3 + [3] * 2 + [4]})
    _, maps = categorify(df, ["c"], freq_threshold=2)
    assert maps["c"].tolist() == [1, 2, 3]  # count-1 value dropped
    enc, maps = categorify(df, ["c"], max_size=2)
    assert maps["c"].tolist() == [1, 2]
    # overflow values encode to OOV
    assert enc["c"].tolist()[-3:] == [CATEGORIFY_OOV_INDEX] * 3


def test_encode_with_categories_oov_null_and_padding():
    maps = np.array([500, 100, 900])
    enc = encode_with_categories([[100, 777, 900, 0]], maps)
    assert enc.tolist() == [[4, CATEGORIFY_OOV_INDEX, 5, 0]]
    # nulls encode to the NULL index (1) — same convention as training-time
    # categorify, NOT to OOV (train/serve consistency)
    enc = encode_with_categories([[100, None, 900]], maps)
    assert enc.tolist() == [[4, CATEGORIFY_NULL_INDEX, 5]]
    enc = encode_with_categories([float("nan"), 500.0], np.array([500.0]))
    assert enc.tolist() == [CATEGORIFY_NULL_INDEX, CATEGORIFY_START_INDEX]
    # zero_is_padding=False treats raw 0 as an ordinary (unseen) value
    enc = encode_with_categories([0], maps, zero_is_padding=False)
    assert enc.tolist() == [CATEGORIFY_OOV_INDEX]
    # string features: "" is padding
    enc = encode_with_categories([["a", "", "zz"]], np.array(["a", "b"]))
    assert enc.tolist() == [[3, 0, CATEGORIFY_OOV_INDEX]]
    # prebuilt codes give identical results (the serving hot path)
    from transformers4rec_tpu.utils.data_utils import build_category_codes

    codes = build_category_codes(maps)
    np.testing.assert_array_equal(
        encode_with_categories([[100, 777, 0]], codes),
        encode_with_categories([[100, 777, 0]], maps),
    )


def test_categorify_warns_on_raw_zero():
    import warnings

    df = pd.DataFrame({"c": [0, 0, 5]})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        categorify(df, ["c"])
    assert any("PADDING" in str(x.message) for x in w)


def test_categories_parquet_roundtrip(tmp_path):
    maps = {"item_id": np.array([10_000_001, 99, 31337]),
            "cat": np.array(["x", "y"])}
    save_categories(maps, str(tmp_path / "categories"))
    assert sorted(os.listdir(tmp_path / "categories")) == [
        "unique.cat.parquet", "unique.item_id.parquet"
    ]
    loaded = load_categories(str(tmp_path / "categories"))
    np.testing.assert_array_equal(loaded["item_id"], maps["item_id"])
    np.testing.assert_array_equal(loaded["cat"], maps["cat"])


def test_categorify_schema_updates_cardinalities():
    schema = synthetic_ecommerce_data_schema(num_items=1000, num_categories=50)
    maps = {"item_id": np.arange(7), "category": np.arange(4)}
    out = categorify_schema(schema, maps)
    assert out.categorical_cardinalities()["item_id"] == CATEGORIFY_START_INDEX + 7
    assert out.categorical_cardinalities()["category"] == CATEGORIFY_START_INDEX + 4
    # original schema untouched
    assert schema.categorical_cardinalities()["item_id"] == 1000 + 1


def test_etl_categorify_end_to_end(tmp_path):
    """Raw NON-contiguous ids (REES46-style product ids) → encoded windowed
    splits + categories/ + post-encoding schema, all in one ETL call."""
    schema = synthetic_ecommerce_data_schema(
        num_items=60, num_categories=8, max_session_length=10
    )
    raw = generate_item_interactions(4000, schema, seed=5)
    raw["timestamp"] = np.arange(len(raw))
    raw["item_id"] = raw["item_id"] * 37 + 10_000_000  # raw-looking ids
    out = etl_interactions_to_time_splits(
        raw, schema, str(tmp_path / "win"), num_windows=2,
        categorify_columns=True,
    )
    maps = load_categories(os.path.join(out, "categories"))
    assert set(maps) == {"item_id", "category"}
    s2 = tr.Schema.load(os.path.join(out, "schema.pbtxt"))
    card = s2.categorical_cardinalities()
    assert card["item_id"] == CATEGORIFY_START_INDEX + len(maps["item_id"])
    train = pd.read_parquet(os.path.join(out, "1", "train.parquet"))
    vals = np.concatenate(train["item_id"].to_numpy())
    assert vals.min() >= CATEGORIFY_START_INDEX
    assert vals.max() < card["item_id"]
    # the mapping inverts: decode a session back to raw id space
    sess = train["item_id"].iloc[0]
    decoded = maps["item_id"][np.asarray(sess) - CATEGORIFY_START_INDEX]
    assert set((decoded - 10_000_000) % 37) == {0}  # all ids from the raw grid


@pytest.fixture(scope="module")
def categorified_artifact(tmp_path_factory):
    """Model trained on a categorified schema, exported WITH its mappings."""
    tmp = tmp_path_factory.mktemp("categorified")
    base = synthetic_ecommerce_data_schema(
        num_items=80, num_categories=8, max_session_length=10
    )
    raw = generate_item_interactions(4000, base, seed=7)
    raw["timestamp"] = np.arange(len(raw))
    raw["item_id"] = raw["item_id"] + 5_000_000
    out = etl_interactions_to_time_splits(
        raw, base.select_by_name(["item_id"]), str(tmp / "win"),
        num_windows=2, categorify_columns=True,
    )
    schema = tr.Schema.load(os.path.join(out, "schema.pbtxt"))
    maps = load_categories(os.path.join(out, "categories"))

    batch = {k: jnp.asarray(v) for k, v in synthetic_data(
        schema, num_rows=8, max_session_length=10, seed=0
    ).items()}
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.XLNetConfig.build(d_model=32, n_head=2, n_layer=1, total_seq_length=10)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2), "sampling": jax.random.PRNGKey(3)}
    params = model.init(rngs, batch, training=True)
    from transformers4rec_tpu.serving import export_model

    path = export_model(
        model, params, batch, str(tmp / "artifact"), top_k=5,
        categories=os.path.join(out, "categories"),
    )
    return path, maps, schema, model, params, batch


def test_artifact_bundles_categories(categorified_artifact):
    path, maps, *_ = categorified_artifact
    assert os.path.exists(os.path.join(path, "categories", "unique.item_id.parquet"))
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["categories"] == ["item_id"]
    assert meta["item_id_column"] == "item_id"


def test_runner_encodes_raw_and_decodes_topk(categorified_artifact):
    """The runner is the TransformWorkflow stage: RAW ragged sessions in,
    RAW top-k item ids out — numerically identical to hand-encoding."""
    from transformers4rec_tpu.serving import load_runner

    path, maps, schema, model, params, batch = categorified_artifact
    runner = load_runner(path)
    raw_vocab = maps["item_id"]

    # raw ragged sessions drawn from the raw vocabulary (+ one OOV id)
    raw_sessions = [
        list(raw_vocab[[0, 3, 5, 1]]),
        list(raw_vocab[[2, 4]]) + [123],  # 123 was never seen → OOV
        list(raw_vocab[[6, 7, 8, 9, 1, 0]]),
    ]
    scores, ids = runner.predict({"item_id": raw_sessions})
    assert scores.shape == (3, 5) and ids.shape == (3, 5)
    # decoded ids are raw vocabulary values (or -1 for special codes)
    assert set(ids.ravel().tolist()) <= set(raw_vocab.tolist()) | {-1}

    # equivalence with a RAW dense 0-padded batch + hand-decoding
    dense = np.zeros((3, 10), np.int64)
    for i, r in enumerate(raw_sessions):
        dense[i, : len(r)] = np.asarray(r)[:10]
    scores2, ids2 = runner.predict({"item_id": dense}, decode_ids=False)
    np.testing.assert_allclose(scores, scores2, rtol=1e-5, atol=1e-5)
    decoded2 = np.where(
        ids2 >= CATEGORIFY_START_INDEX,
        raw_vocab[np.clip(ids2 - CATEGORIFY_START_INDEX, 0, len(raw_vocab) - 1)],
        -1,
    )
    np.testing.assert_array_equal(ids, decoded2)


def test_server_serves_raw_values(categorified_artifact):
    """HTTP round trip with raw ids in the payload and raw ids in the
    response (the Triton-ensemble contract). The response must EQUAL the
    in-process runner's answer for the same raw request — this pins that the
    handler+batcher encode exactly once (a double encode turns every input
    OOV while still producing a shape-valid response)."""
    import http.client

    from transformers4rec_tpu.serving import load_runner
    from transformers4rec_tpu.serving.server import ServingServer

    path, maps, *_ = categorified_artifact
    raw_vocab = maps["item_id"]
    runner = load_runner(path)
    server = ServingServer(path, port=0, max_delay_ms=1.0).start()
    try:
        # dense raw sessions, 0-padded
        rows = np.zeros((2, 10), np.int64)
        rows[0, :4] = raw_vocab[[0, 1, 2, 3]]
        rows[1, :3] = raw_vocab[[5, 4, 6]]
        conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
        conn.request(
            "POST", "/v2/predict",
            body=json.dumps({"inputs": {"item_id": rows.tolist()}}),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        payload = json.loads(resp.read())
        ids = np.asarray(payload["item_ids"])
        assert ids.shape == (2, 5)
        assert set(ids.ravel().tolist()) <= set(raw_vocab.tolist()) | {-1}
        ref_scores, ref_ids = runner.predict({"item_id": rows})
        np.testing.assert_allclose(
            np.asarray(payload["item_id_scores"]), ref_scores, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(ids, ref_ids)
    finally:
        server.stop()


def test_server_accepts_ragged_raw_sessions(categorified_artifact):
    """RAGGED raw sessions over HTTP: the handler densifies per the artifact
    schema (docs/serving.md's contract) and answers with raw ids, matching
    the in-process runner on the same ragged request."""
    import http.client

    from transformers4rec_tpu.serving import load_runner
    from transformers4rec_tpu.serving.server import ServingServer

    path, maps, *_ = categorified_artifact
    raw_vocab = maps["item_id"]
    ragged = [
        raw_vocab[[0, 1, 2, 3]].tolist(),
        raw_vocab[[5, 4]].tolist() + [424242],  # unseen id → OOV
    ]
    runner = load_runner(path)
    server = ServingServer(path, port=0, max_delay_ms=1.0).start()
    try:
        conn = http.client.HTTPConnection(server.host, server.port, timeout=30)
        conn.request(
            "POST", "/v2/predict",
            body=json.dumps({"inputs": {"item_id": ragged}}),
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        assert resp.status == 200, resp.read()
        payload = json.loads(resp.read())
        ref_scores, ref_ids = runner.predict({"item_id": ragged})
        np.testing.assert_allclose(
            np.asarray(payload["item_id_scores"]), ref_scores, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(payload["item_ids"]), ref_ids)
    finally:
        server.stop()


def test_paper_cli_categorify_flag(tmp_path):
    """--categorify on the raw-ETL path: encoded splits + reloaded schema and
    the run still trains/evals end-to-end."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "transf_exp_main_categorify_test",
        os.path.join(os.path.dirname(__file__), "..", "examples", "paper_repro",
                     "transf_exp_main.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    schema = synthetic_ecommerce_data_schema(
        num_items=100, num_categories=10, max_session_length=10
    )
    raw = generate_item_interactions(3000, schema, seed=11)
    raw["timestamp"] = np.arange(len(raw))
    raw["item_id"] = raw["item_id"] * 101 + 7  # raw non-contiguous ids
    raw_path = tmp_path / "raw.parquet"
    raw.to_parquet(raw_path)

    results = cli.main([
        "--use_synthetic",
        "--raw_interactions_path", str(raw_path),
        "--categorify",
        "--model_type", "xlnet",
        "--masking", "mlm",
        "--d_model", "32",
        "--n_layer", "1",
        "--n_head", "2",
        "--synthetic_num_items", "100",
        "--session_seq_length_max", "10",
        "--per_device_train_batch_size", "8",
        "--per_device_eval_batch_size", "8",
        "--start_time_window_index", "1",
        "--final_time_window_index", "2",
        "--output_dir", str(tmp_path / "out"),
    ])
    assert results and "recall" in "\n".join(results)
    win = tmp_path / "out" / "time_windows"
    assert (win / "categories" / "unique.item_id.parquet").exists()
    assert (win / "schema.pbtxt").exists()
    # splits really are encoded: contiguous ids, not the raw grid
    train = pd.read_parquet(win / "1" / "train.parquet")
    vals = np.concatenate(train["item_id"].to_numpy())
    assert vals.max() < CATEGORIFY_START_INDEX + 100


def test_runner_single_raw_session_pads(categorified_artifact):
    """A SINGLE raw session (and any uniform-length batch) shorter than the
    artifact's max_len must pad to the exported shape — the categories encode
    path previously collapsed uniform-length batches to a dense (N, L) array
    that bypassed _densify's padding and failed at inference."""
    from transformers4rec_tpu.serving import load_runner

    path, maps, schema, model, params, batch = categorified_artifact
    runner = load_runner(path)
    raw_vocab = maps["item_id"]

    one = [list(raw_vocab[[0, 3, 5]])]  # one session, len 3 < max_len
    scores, ids = runner.predict({"item_id": one})
    assert scores.shape[0] == 1 and ids.shape[0] == 1

    # uniform-length multi-session batch (every row len 3)
    uniform = [list(raw_vocab[[0, 3, 5]]), list(raw_vocab[[2, 4, 6]])]
    scores2, ids2 = runner.predict({"item_id": uniform})
    assert scores2.shape[0] == 2
    # row 0 must match the single-session result (same session, same pad)
    np.testing.assert_allclose(scores2[0], scores[0], rtol=1e-5, atol=1e-5)
