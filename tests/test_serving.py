"""Serving export tests — the torchscript-traceability analog
(/root/reference/tests/unit/torch/test_torchscript.py:7-28 and
test_torchscript_with_topk.py): exported artifact must reproduce the live
model's predictions, including the top-k path and varying batch sizes."""

import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.serving import export_model, load_runner


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import jax

    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=500, num_categories=30, max_session_length=10
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=8, max_session_length=10, seed=0).items()
    }
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.XLNetConfig.build(d_model=32, n_head=2, n_layer=1, total_seq_length=10)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, batch, training=True)
    return schema, model, params, batch


def test_export_topk_roundtrip(trained, tmp_path):
    schema, model, params, batch = trained
    live_scores, live_ids = model.apply(params, batch, top_k=5)

    path = export_model(model, params, batch, str(tmp_path / "artifact"), top_k=5)
    runner = load_runner(path)
    scores, ids = runner.predict({k: np.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(live_scores), scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(live_ids), ids)


def test_export_full_scores(trained, tmp_path):
    schema, model, params, batch = trained
    live = model.apply(params, batch)
    path = export_model(model, params, batch, str(tmp_path / "artifact2"), top_k=None)
    runner = load_runner(path)
    got = runner.predict({k: np.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(live), got, rtol=1e-5, atol=1e-5)


def test_export_batch_polymorphic(trained, tmp_path):
    """One artifact, multiple batch sizes (shape-polymorphic export)."""
    from transformers4rec_tpu.data.synthetic import synthetic_data

    schema, model, params, batch = trained
    path = export_model(model, params, batch, str(tmp_path / "artifact3"), top_k=3)
    runner = load_runner(path)
    for rows in (1, 4, 17):
        nb = synthetic_data(schema, num_rows=rows, max_session_length=10, seed=rows)
        scores, ids = runner.predict(nb)
        assert scores.shape == (rows, 3) and ids.shape == (rows, 3)


def test_export_schemas_written(trained, tmp_path):
    schema, model, params, batch = trained
    path = export_model(model, params, batch, str(tmp_path / "artifact4"), top_k=5)
    runner = load_runner(path)
    assert "item_id" in runner.input_schema.column_names
    assert set(runner.output_schema.column_names) == {"item_id_scores", "item_ids"}


# ------------------------------------------------------- serving daemon
def test_serving_server_batches_requests(trained, tmp_path):
    """Triton-analog daemon (serving/server.py): concurrent single-session
    HTTP requests are dynamically batched, results match the live model."""
    import concurrent.futures
    import json as _json
    import urllib.request

    from transformers4rec_tpu.serving import ServingServer

    schema, model, params, batch = trained
    path = export_model(model, params, batch, str(tmp_path / "srv"), top_k=4)
    server = ServingServer(path, port=0, max_batch_size=8, max_delay_ms=30.0).start()
    try:
        base = f"http://{server.host}:{server.port}"
        with urllib.request.urlopen(f"{base}/v2/health") as r:
            health = _json.loads(r.read())
        assert health["status"] == "ok" and health["metadata"]["top_k"] == 4

        live_scores, live_ids = model.apply(params, batch, top_k=4)

        def one(i):
            inputs = {k: np.asarray(v)[i:i + 1].tolist() for k, v in batch.items()}
            req = urllib.request.Request(
                f"{base}/v2/predict",
                data=_json.dumps({"inputs": inputs}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                return i, _json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(one, range(8)))
        for i, out in results:
            np.testing.assert_array_equal(
                np.asarray(out["item_ids"][0]), np.asarray(live_ids)[i]
            )
            np.testing.assert_allclose(
                np.asarray(out["item_id_scores"][0]),
                np.asarray(live_scores)[i], rtol=1e-4, atol=1e-5,
            )

        with urllib.request.urlopen(f"{base}/v2/stats") as r:
            stats = _json.loads(r.read())
        assert stats["requests"] == 8
        assert stats["batches"] < 8, f"no coalescing happened: {stats}"

        # malformed request → 400 with an error body
        req = urllib.request.Request(
            f"{base}/v2/predict", data=b'{"inputs": {}}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.stop()


def test_export_bf16_weights(trained, tmp_path):
    """weights_dtype='bfloat16' must halve the artifact's weight payload while
    keeping the top-k ranking close to the f32 export (scores accumulate in
    f32; bf16 weight rounding may reorder near-tied items only)."""
    import os

    schema, model, params, batch = trained
    p32 = export_model(model, params, batch, str(tmp_path / "a_f32"), top_k=20)
    pbf = export_model(model, params, batch, str(tmp_path / "a_bf16"), top_k=20,
                       weights_dtype="bfloat16")
    s32 = os.path.getsize(os.path.join(p32, "model.stablehlo"))
    sbf = os.path.getsize(os.path.join(pbf, "model.stablehlo"))
    assert sbf < 0.65 * s32, f"bf16 artifact not smaller: {sbf} vs {s32}"

    r32, rbf = load_runner(p32), load_runner(pbf)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}
    _, ids32 = r32.predict(np_batch)
    _, idsbf = rbf.predict(np_batch)
    # top-20 sets must overlap strongly for every session
    for a, b in zip(ids32, idsbf):
        overlap = len(set(a.tolist()) & set(b.tolist())) / len(a)
        assert overlap >= 0.7, f"bf16 top-k drifted too far: {overlap}"
    assert rbf.metadata["weights_dtype"] == "bfloat16"


def test_runner_accepts_ragged_sessions(trained, tmp_path):
    """Serving accepts RAW variable-length sessions (the reference ensemble's
    TransformWorkflow padding stage, notebook 03:656-680): ragged input must
    score identically to the caller pre-padding (keep-first, right-pad 0)."""
    schema, model, params, batch = trained
    path = export_model(model, params, batch, str(tmp_path / "rag"), top_k=5)
    runner = load_runner(path)
    dense = {k: np.asarray(v)[:3] for k, v in batch.items()}
    s_ref, i_ref = runner.predict(dense)

    # strip trailing zeros per row → ragged lists
    ragged = {}
    for k, v in dense.items():
        if v.ndim == 2:
            rows = []
            for r in v:
                n = int(np.nonzero(r)[0].max()) + 1 if r.any() else 0
                rows.append(list(r[:n]))
            ragged[k] = rows
        else:
            ragged[k] = v
    s_rag, i_rag = runner.predict(ragged)
    np.testing.assert_array_equal(i_ref, i_rag)
    np.testing.assert_allclose(s_ref, s_rag, rtol=1e-6)


def test_sharded_serving_matches_single_device(tmp_path):
    """Model-parallel serving (serving/sharded.py): an artifact exported with
    bundle_params=True loads onto a local ('model',) mesh — item table
    row-sharded, top-k via sharded_topk — and reproduces the single-device
    artifact's predictions at model_axis=2. Also drives the daemon with the
    sharded runner (the --model-builder CLI path)."""
    import json as _json
    import urllib.request

    import jax

    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.serving import ServingServer, ShardedInferenceRunner

    # vocab above MIN_ROWS_TO_SHARD (16384) so the table actually shards
    schema = synthetic_ecommerce_data_schema(
        num_items=20000, num_categories=30, max_session_length=10
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=8, max_session_length=10, seed=0
        ).items()
    }
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.XLNetConfig.build(d_model=32, n_head=2, n_layer=1,
                               total_seq_length=10)
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, batch, training=True)

    path = export_model(model, params, batch, str(tmp_path / "sharded_art"),
                        top_k=5, bundle_params=True)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}
    ref_scores, ref_ids = load_runner(path).predict(np_batch)

    sharded = ShardedInferenceRunner(path, model, model_axis=2)
    # the table must actually be row-sharded and the mesh threaded in
    table = [leaf for leaf in jax.tree_util.tree_leaves(sharded.params)
             if getattr(leaf, "ndim", 0) == 2
             and leaf.shape[0] >= 16384]
    assert table and any(s is not None for s in table[0].sharding.spec)
    assert sharded.model.heads[0].tasks[0].vocab_parallel_mesh is not None

    got_scores, got_ids = sharded.predict(np_batch)
    np.testing.assert_array_equal(ref_ids, got_ids)
    np.testing.assert_allclose(ref_scores, got_scores, rtol=1e-5, atol=1e-5)

    # refuse artifacts without bundled params (clear error, not a crash)
    plain = export_model(model, params, batch, str(tmp_path / "plain_art"),
                         top_k=5)
    with pytest.raises(ValueError, match="bundle_params"):
        ShardedInferenceRunner(plain, model, model_axis=2)

    # daemon over the sharded runner
    server = ServingServer(path, port=0, max_batch_size=8,
                           runner=sharded).start()
    try:
        base = f"http://{server.host}:{server.port}"
        inputs = {k: v[:2].tolist() for k, v in np_batch.items()}
        req = urllib.request.Request(
            f"{base}/v2/predict",
            data=_json.dumps({"inputs": inputs}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = _json.loads(r.read())
        np.testing.assert_array_equal(np.asarray(out["item_ids"]),
                                      ref_ids[:2])
    finally:
        server.stop()


def test_export_strips_vocab_parallel_mesh(trained, tmp_path):
    """Exporting an auto-engaged (vocab_parallel_mesh) model must produce a
    plain single-device artifact — the training mesh's shard_map must not be
    baked into the StableHLO. Predictions equal the unsharded model's."""
    from transformers4rec_tpu.parallel import make_mesh

    schema, model, params, batch = trained
    mesh = make_mesh(model=2)
    task = model.heads[0].tasks[0].clone(vocab_parallel_mesh=mesh)
    head = model.heads[0].clone(tasks=(task,))
    vp_model = model.clone(heads=(head,))

    path = export_model(vp_model, params, batch,
                        str(tmp_path / "artifact_vp"), top_k=5)
    runner = load_runner(path)
    scores, ids = runner.predict({k: np.asarray(v) for k, v in batch.items()})
    want_scores, want_ids = model.apply(params, batch, top_k=5)
    np.testing.assert_allclose(np.asarray(want_scores), scores,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(want_ids), ids)


def test_reformer_long_seq_exports_and_serves(tmp_path):
    """The Reformer stack (LSH sorted-chunk path engaged: S>=64, with its
    per-round argsorts/gathers) must survive jax.export → StableHLO → runner
    with exact top-k parity — the sort-based op is serving-safe, not just
    trainable."""
    import jax

    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    S = 80
    schema = synthetic_ecommerce_data_schema(
        num_items=500, num_categories=20, max_session_length=S
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(
            schema, num_rows=4, max_session_length=S, seed=0
        ).items()
    }
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("reformer").build(
        d_model=32, n_head=2, n_layer=4, total_seq_length=S
    )
    assert "lsh" in cfg.attn_layers
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, batch, training=True)
    live_scores, live_ids = model.apply(params, batch, top_k=5)

    path = export_model(model, params, batch,
                        str(tmp_path / "artifact_reformer"), top_k=5)
    runner = load_runner(path)
    scores, ids = runner.predict({k: np.asarray(v) for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(live_scores), scores,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(live_ids), ids)
