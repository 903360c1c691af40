"""Session packing: transform invariants + packed-vs-unpacked equivalence.

The equivalence test is the load-bearing one: with a relative-position-bias
architecture (distance buckets are offset-invariant), no dropout, and causal
attention, every packed session's hidden states — and therefore its per-target
losses — must match the same session trained unpacked, because the
block-diagonal segment restriction removes all cross-session attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import transformers4rec_tpu as tr
from transformers4rec_tpu.data.packing import pack_sessions, packing_stats
from transformers4rec_tpu.data.synthetic import (
    synthetic_data,
    synthetic_ecommerce_data_schema,
)

SEQ = 12


def _schema(num_items=200):
    return synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=10, max_session_length=SEQ
    )


def _ragged(schema, rows=40, seed=0):
    return synthetic_data(schema, num_rows=rows, max_session_length=SEQ,
                          seed=seed, ragged=True)


def test_pack_first_fit_exact_and_scales():
    """The capacity-bucket packer must (a) reproduce EXACT first-fit-
    decreasing row assignments (reference: brute-force linear scan) and
    (b) stay near-linear — the linear scan went quadratic past ~100k
    sessions (a 1M-session pack ran >25 min; the bucketed one takes ~1s)."""
    import time

    def brute_force_ffd(lengths, max_len):
        order = np.argsort(-lengths, kind="stable")
        rows, space = [], []
        for idx in order:
            ln = int(lengths[idx])
            placed = False
            for r in range(len(rows)):
                if space[r] >= ln:
                    rows[r].append(int(idx))
                    space[r] -= ln
                    placed = True
                    break
            if not placed:
                rows.append([int(idx)])
                space.append(max_len - ln)
        return rows

    rng = np.random.RandomState(0)
    for trial in range(10):
        n, ml = rng.randint(2, 500), rng.randint(3, 25)
        lens = rng.randint(2, ml + 1, n)
        sessions = np.arange(lens.sum(), dtype=np.int64) % 97 + 1
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        packed = pack_sessions(
            {"item_id__values": sessions, "item_id__offsets": offsets},
            max_len=ml, item_id_col="item_id",
        )
        expect = brute_force_ffd(lens, ml)
        got_lengths = (packed["item_id"] != 0).sum(axis=1)
        exp_lengths = np.array([sum(int(lens[i]) for i in row) for row in expect])
        np.testing.assert_array_equal(got_lengths, exp_lengths)
        # per-row segment count matches the brute-force assignment too
        np.testing.assert_array_equal(
            packed["segment_ids"].max(axis=1),
            np.array([len(row) for row in expect]),
        )

    n = 200_000
    lens = np.clip(rng.lognormal(2.2, 0.5, n).astype(np.int64), 2, 20)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    vals = (np.arange(lens.sum(), dtype=np.int64) % 97) + 1
    t0 = time.perf_counter()
    packed = pack_sessions(
        {"item_id__values": vals, "item_id__offsets": offsets},
        max_len=20, item_id_col="item_id",
    )
    dt = time.perf_counter() - t0
    assert packed["item_id"].shape[0] < n
    assert dt < 30.0, f"200k-session pack took {dt:.1f}s — packer regressed"


def test_pack_sessions_invariants():
    schema = _schema()
    data = _ragged(schema)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    seg = packed["segment_ids"]
    ids = packed["item_id"]
    # padding <=> segment 0
    np.testing.assert_array_equal(seg > 0, ids != 0)
    # segments are contiguous and increasing left-to-right
    for row in seg:
        nz = row[row > 0]
        changes = np.flatnonzero(np.diff(nz) != 0)
        assert np.all(np.diff(nz)[changes] == 1), row
    # every kept session's item sequence survives intact
    off = data["item_id__offsets"]
    vals = data["item_id__values"]
    originals = {
        tuple(vals[off[i]:off[i + 1]][:SEQ].tolist())
        for i in range(len(off) - 1)
        if off[i + 1] - off[i] >= 2
    }
    recovered = set()
    for r in range(seg.shape[0]):
        for s in np.unique(seg[r][seg[r] > 0]):
            recovered.add(tuple(ids[r][seg[r] == s].tolist()))
    assert recovered == originals
    stats = packing_stats(packed, "item_id")
    assert stats["fill"] > 0.8  # packing must actually densify
    assert stats["rows"] < len(off) - 1


@pytest.mark.parametrize("arch", ["transfoxl", "gpt2"])
def test_packed_clm_loss_matches_unpacked(arch):
    """Per-session CLM losses identical packed vs unpacked (dropout 0,
    full-position labels). transfoxl = relative bias (offset-invariant);
    gpt2 = learned-absolute positions, exact via per-segment restart."""
    schema = _schema()
    data = _ragged(schema, rows=24, seed=3)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")

    # unpacked rows: one session per row, padded (the loader's normal output)
    from transformers4rec_tpu.data.padding import pad_ragged

    unpacked = {}
    names = {k.removesuffix("__values") for k in data if k.endswith("__values")}
    off0 = data["item_id__offsets"]
    keep = [i for i in range(len(off0) - 1) if off0[i + 1] - off0[i] >= 2]
    for name in names:
        dense = pad_ragged(data[f"{name}__values"], data[f"{name}__offsets"], SEQ)
        unpacked[name] = dense[keep]

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat",
        masking_kwargs={"eval_on_last_item_seq_only": False},
    )
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=32, n_head=2, n_layer=2, total_seq_length=SEQ, dropout=0.0,
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    pb = {k: jnp.asarray(v) for k, v in packed.items()}
    ub = {k: jnp.asarray(v) for k, v in unpacked.items()}
    params = model.init(rngs, ub, training=True)

    r = {k: v for k, v in rngs.items() if k != "params"}
    loss_packed, _ = model.apply(params, pb, training=True, rngs=r)
    loss_unpacked, _ = model.apply(params, ub, training=True, rngs=r)
    # CLM is deterministic given inputs (masking rng unused for labels);
    # both runs average the SAME per-target CE values
    np.testing.assert_allclose(float(loss_packed), float(loss_unpacked),
                               rtol=2e-5)

    # gradients agree too (same math, different layout)
    def loss_fn(p, batch):
        loss, _ = model.apply(p, batch, training=True, rngs=r)
        return loss

    gp = jax.grad(loss_fn)(params, pb)
    gu = jax.grad(loss_fn)(params, ub)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5),
        gp, gu,
    )


def test_packed_clm_no_cross_segment_labels():
    schema = _schema()
    data = _ragged(schema, rows=30, seed=7)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="clm", aggregation="concat"
    )
    b = {k: jnp.asarray(v) for k, v in packed.items()}
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    (hidden, info), _ = im.init_with_output(rngs, b, training=True)
    seg = packed["segment_ids"]
    mask = np.asarray(info.mask)
    # a loss position at i implies position i+1 exists in the SAME segment
    for r in range(seg.shape[0]):
        for i in np.flatnonzero(mask[r]):
            assert i + 1 < SEQ and seg[r, i + 1] == seg[r, i] != 0


def test_packed_mlm_trains():
    schema = _schema()
    data = _ragged(schema, rows=30, seed=9)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="mlm", aggregation="concat"
    )
    model = tr.XLNetConfig.build(16, 2, 1, SEQ, dropout=0.0).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True)
    )
    b = {k: jnp.asarray(v) for k, v in packed.items()}
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, b, training=True)
    loss, _ = model.apply(params, b, training=True,
                          rngs={k: v for k, v in rngs.items() if k != "params"})
    assert jnp.isfinite(loss)


def test_packed_plm_trains_and_isolates_segments():
    """PLM × packing (round-5): spans sampled per segment, per-segment
    ≥1-masked/≥1-unmasked guarantees, and cross-segment isolation — in eval
    mode a segment's per-position logits must be bit-identical when the
    OTHER segment's items change (same pad structure → same masking draw)."""
    from transformers4rec_tpu.masking import PermutationLanguageModeling

    schema = _schema(num_items=300)
    B, S = 8, SEQ
    rng = np.random.RandomState(7)
    # two segments per row: lengths 6 and 6 (both ≥2)
    seg = np.zeros((B, S), np.int32)
    seg[:, :6] = 1
    seg[:, 6:12] = 2
    ids = rng.randint(1, 300, (B, S)).astype(np.int64)

    plm = PermutationLanguageModeling(hidden_size=16, plm_probability=0.5,
                                      max_span_length=3)
    sids = jnp.asarray(seg)
    non_pad = jnp.asarray(ids != 0)
    for trial in range(6):
        info = plm.compute_masked_targets(
            jax.random.PRNGKey(trial), jnp.asarray(ids), training=True,
            segment_ids=sids,
        )
        m = np.asarray(info.mask)
        # masked subset of non-pad; ≥1 masked AND ≥1 unmasked per segment
        assert (m <= np.asarray(non_pad)).all()
        for s in (1, 2):
            in_seg = seg == s
            per_row_masked = (m & in_seg).sum(axis=1)
            per_row_len = in_seg.sum(axis=1)
            assert (per_row_masked >= 1).all(), trial
            assert (per_row_masked < per_row_len).all(), trial
        # span clipping only ever REMOVES masked positions vs the unclipped
        # draw (same rng, no segments, before min-masking)
        r_span, _, _ = jax.random.split(jax.random.PRNGKey(trial), 3)
        m_clip = np.asarray(plm._sample_spans(r_span, non_pad, segment_ids=sids))
        m_free = np.asarray(plm._sample_spans(r_span, non_pad))
        assert (m_clip <= m_free).all()

    # cross-segment isolation (eval mode, deterministic labels): per-position
    # logits at segment-1 target rows are unchanged when segment 2's items
    # are replaced
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="plm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("xlnet").build(
        d_model=32, n_head=2, n_layer=2, total_seq_length=S, dropout=0.0,
    )
    # use_fused_ops=False: the einsum eval branch RETURNS per-position
    # logits (the fused streamed branch never materializes them)
    model = cfg.to_model(im, tr.NextItemPredictionTask(
        weight_tying=True, use_fused_ops=False))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    base = {
        "item_id": jnp.asarray(ids), "category": jnp.asarray(ids % 10 + 1),
        "price": jnp.asarray(rng.rand(B, S).astype(np.float32)),
        "segment_ids": sids,
    }
    base = {k: v for k, v in base.items()
            if k in ("item_id", "segment_ids") or k in
            {c for c in schema.column_names}}
    params = model.init(rngs, base, training=True)

    ids2 = ids.copy()
    ids2[:, 6:12] = rng.randint(1, 300, (B, 6))  # rewrite segment 2 only
    other = dict(base, item_id=jnp.asarray(ids2))

    _, o1 = model.apply(params, base, targets=base, testing=True,
                        compute_metrics=False)
    _, o2 = model.apply(params, other, targets=other, testing=True,
                        compute_metrics=False)
    p1 = np.asarray(o1["next-item"].predictions).reshape(B, S, -1)
    p2 = np.asarray(o2["next-item"].predictions).reshape(B, S, -1)
    t1 = np.asarray(o1["next-item"].weights).reshape(B, S) > 0
    # target rows of segment 1 (positions 0..5): logits bit-identical
    seg1_targets = t1 & (seg == 1)
    assert seg1_targets.any()
    np.testing.assert_array_equal(p1[seg1_targets], p2[seg1_targets])


def test_packed_plm_trainer_end_to_end(tmp_path):
    """PLM trains on packed rows through the Trainer (pack_sessions=True)."""
    schema = _schema(num_items=300)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="plm", aggregation="concat",
        masking_kwargs={"plm_probability": 0.5, "max_span_length": 3},
    )
    model = tr.XLNetConfig.build(32, 2, 1, SEQ).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True)
    )
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "plmpack"),
        data_loader_engine="synthetic",
        max_sequence_length=SEQ,
        per_device_train_batch_size=16,
        max_steps=16,
        learning_rate=5e-3,
        logging_steps=4,
        pack_sessions=True,
        pack_eval_sessions=True,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    first = next(iter(trainer.get_train_dataloader()))
    assert int(np.asarray(first["segment_ids"]).max()) > 1
    trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert np.isfinite(hist).all() and hist[-1] < hist[0], hist
    ev = trainer.evaluate()
    assert np.isfinite(ev["eval_loss"])


def test_packed_inference_raises():
    """Inference (serving) stays unpacked: per-session top-k and the MLM
    [MASK] extension are one-session-per-row gathers."""
    schema = _schema()
    data = _ragged(schema, rows=10, seed=2)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="clm", aggregation="concat"
    )
    b = {k: jnp.asarray(v) for k, v in packed.items()}
    rngs = {"params": jax.random.PRNGKey(0), "masking": jax.random.PRNGKey(1)}
    with pytest.raises(NotImplementedError, match="unpacked"):
        im.init_with_output(rngs, b)  # inference mode (not training/testing)


@pytest.mark.parametrize("masking,arch",
                         [("clm", "transfoxl"), ("mlm", "xlnet"),
                          ("plm", "xlnet")])
def test_packed_eval_matches_unpacked(masking, arch):
    """Packed evaluation (per-segment last-item targets) must produce the
    SAME loss and metric sums as evaluating the same sessions unpacked —
    relative-bias archs make per-session hidden states offset-invariant."""
    schema = _schema()
    data = _ragged(schema, rows=24, seed=5)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")

    from transformers4rec_tpu.data.padding import pad_ragged

    names = {k.removesuffix("__values") for k in data if k.endswith("__values")}
    off0 = data["item_id__offsets"]
    keep = [i for i in range(len(off0) - 1) if off0[i + 1] - off0[i] >= 2]
    unpacked = {
        name: pad_ragged(data[f"{name}__values"], data[f"{name}__offsets"], SEQ)[keep]
        for name in names
    }

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking=masking, aggregation="concat"
    )
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=32, n_head=2, n_layer=2, total_seq_length=SEQ, dropout=0.0,
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    pb = {k: jnp.asarray(v) for k, v in packed.items()}
    ub = {k: jnp.asarray(v) for k, v in unpacked.items()}
    params = model.init(rngs, ub, training=True)

    lp, outs_p = model.apply(params, pb, targets=pb, testing=True,
                             compute_metrics=True)
    lu, outs_u = model.apply(params, ub, targets=ub, testing=True,
                             compute_metrics=True)
    # same per-session targets -> same weighted-mean loss and metric SUMS
    np.testing.assert_allclose(float(lp), float(lu), rtol=2e-5)
    mp, mu = outs_p["next-item"].metrics, outs_u["next-item"].metrics
    assert mp.keys() == mu.keys() and len(mp) > 0
    for k in mp:
        np.testing.assert_allclose(float(mp[k][0]), float(mu[k][0]),
                                   rtol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(mp[k][1]), float(mu[k][1]),
                                   rtol=1e-6, err_msg=f"{k} count")


def test_trainer_pack_sessions_flag(tmp_path):
    """args.pack_sessions=True: the train loader yields packed batches with
    segment_ids; training runs and loss decreases; eval stays unpacked."""
    schema = _schema(num_items=300)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="mlm", aggregation="concat"
    )
    model = tr.XLNetConfig.build(32, 2, 1, SEQ).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True)
    )
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "pack"),
        data_loader_engine="synthetic",
        max_sequence_length=SEQ,
        per_device_train_batch_size=16,
        max_steps=20,
        learning_rate=5e-3,
        logging_steps=4,
        pack_sessions=True,
    )
    trainer = tr.Trainer(model=model, args=args, schema=schema)
    loader = trainer.get_train_dataloader()
    first = next(iter(loader))
    global_bs = 16 * jax.device_count()  # conftest runs 8 virtual devices
    assert "segment_ids" in first
    assert first["segment_ids"].shape == (global_bs, SEQ)
    assert int(first["segment_ids"].max()) > 1  # genuinely packed rows
    m = trainer.train()
    hist = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    assert hist[-1] < hist[0], hist
    ev = trainer.evaluate(max_steps=4)  # unpacked eval path
    assert np.isfinite(ev["eval_loss"])
    # eval-on-train-set consumes the PACKED train loader: the packed eval
    # path (per-segment targets + CE-row budget) must stream metrics too
    ev_train = trainer.evaluate(on_train_set=True, max_steps=2)
    assert np.isfinite(ev_train["eval_train_loss"])
    assert any(k.startswith("eval_train_/") for k in ev_train), ev_train


def test_packed_training_with_sampled_softmax():
    """Session packing composes with sampled softmax: the sampled branch
    flattens all positions and weights by the segment-aware mask, so packed
    rows must train without shape or semantics errors."""
    schema = _schema(num_items=500)
    data = _ragged(schema, rows=40, seed=21)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    model = tr.GPT2Config.build(32, 2, 1, SEQ).to_model(
        im,
        tr.NextItemPredictionTask(
            weight_tying=True, sampled_softmax=True, max_n_samples=64
        ),
    )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    pb = {k: jnp.asarray(v) for k, v in packed.items()}
    params = model.init(rngs, pb, training=True)
    r = {k: v for k, v in rngs.items() if k != "params"}

    def loss_fn(p):
        loss, _ = model.apply(p, pb, training=True, rngs=r)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads))
    assert all(bool(x) for x in flat)


def test_parquet_loader_pack(tmp_path):
    import pandas as pd

    schema = _schema(num_items=150)
    data = _ragged(schema, rows=60, seed=11)
    names = [k.removesuffix("__values") for k in data if k.endswith("__values")]
    df = pd.DataFrame(
        {
            name: np.split(data[f"{name}__values"], data[f"{name}__offsets"][1:-1])
            for name in names
        }
    )
    # two files: exercises the ragged offsets merge
    df.iloc[:30].to_parquet(tmp_path / "a.parquet")
    df.iloc[30:].to_parquet(tmp_path / "b.parquet")

    from transformers4rec_tpu.data.loader import ParquetDataLoader

    loader = ParquetDataLoader.from_schema(
        schema, str(tmp_path), batch_size=8, max_sequence_length=SEQ,
        shuffle=False, pack=True,
    )
    batch = next(iter(loader))
    assert "segment_ids" in batch
    seg, ids = batch["segment_ids"], batch["item_id"]
    np.testing.assert_array_equal(seg > 0, ids != 0)
    # all 60 sessions (len>=2) survive across the packed rows
    total_sessions = sum(
        len(np.unique(row[row > 0])) for b in loader for row in b["segment_ids"]
    )
    off = data["item_id__offsets"]
    expected = sum(1 for i in range(len(off) - 1) if off[i + 1] - off[i] >= 2)
    # drop_last may cut a tail row; allow a small deficit only
    assert total_sessions >= expected - 4


def test_packed_mlm_per_segment_guarantees():
    """Every packed session must have >=1 masked and >=1 unmasked position
    (the reference's per-session MLM invariant, applied per segment)."""
    schema = _schema()
    data = _ragged(schema, rows=60, seed=13)
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=16, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.15},  # low p stresses >=1-masked
    )
    b = {k: jnp.asarray(v) for k, v in packed.items()}
    seg = packed["segment_ids"]
    for trial in range(4):
        rngs = {"params": jax.random.PRNGKey(0),
                "masking": jax.random.PRNGKey(100 + trial)}
        (_, info), _ = im.init_with_output(rngs, b, training=True)
        mask = np.asarray(info.mask)
        for r in range(seg.shape[0]):
            for s in np.unique(seg[r][seg[r] > 0]):
                pos = seg[r] == s
                n_masked = int(mask[r][pos].sum())
                assert n_masked >= 1, f"segment with no label (row {r}, seg {s})"
                assert n_masked < int(pos.sum()), \
                    f"fully masked segment (row {r}, seg {s})"


def test_trainer_pack_eval_sessions_flag(tmp_path):
    """args.pack_eval_sessions=True: evaluate() consumes the packed eval
    loader (segment_ids present, ~half the rows) and reproduces the unpacked
    run's loss and every ranking metric. Uniform session lengths make both
    packed and unpacked row counts divide the global batch exactly, so the
    two passes stream the IDENTICAL session set (no drop_last/wrap skew)."""
    import pandas as pd

    schema = _schema(num_items=150)
    rng = np.random.default_rng(3)
    n_sessions, sess_len = 32, SEQ // 2  # FFD packs exactly 2 sessions/row
    df = pd.DataFrame(
        {
            "item_id": [rng.integers(1, 150, sess_len) for _ in range(n_sessions)],
            "category": [rng.integers(1, 10, sess_len) for _ in range(n_sessions)],
            "item_recency": [
                rng.random(sess_len).astype(np.float32) for _ in range(n_sessions)
            ],
            "weekday_sin": [
                rng.random(sess_len).astype(np.float32) for _ in range(n_sessions)
            ],
        }
    )
    df.to_parquet(tmp_path / "eval.parquet")

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking="clm", aggregation="concat"
    )
    cfg = tr.transformer_registry.parse("transfoxl").build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=SEQ, dropout=0.0
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    args = tr.T4RecTrainingArguments(
        output_dir=str(tmp_path / "out"),
        data_loader_engine="parquet",
        max_sequence_length=SEQ,
        per_device_eval_batch_size=1,  # global batch 8 on the CI mesh
    )
    trainer = tr.Trainer(
        model=model, args=args, schema=schema, eval_dataset=str(tmp_path)
    )
    r_unpacked = trainer.evaluate()

    trainer.args.pack_eval_sessions = True
    loader = trainer.get_eval_dataloader()
    first = next(iter(loader))
    assert "segment_ids" in first and int(first["segment_ids"].max()) == 2
    assert len(loader) == 2  # 16 packed rows vs 32 unpacked (4 batches)
    r_packed = trainer.evaluate()

    metric_keys = [k for k in r_unpacked if k.startswith("eval_/")]
    assert metric_keys, r_unpacked
    for k in metric_keys:
        np.testing.assert_allclose(
            r_packed[k], r_unpacked[k], rtol=2e-5, err_msg=k
        )
    # every session weighted equally in both compositions -> same eval_loss
    np.testing.assert_allclose(
        r_packed["eval_loss"], r_unpacked["eval_loss"], rtol=2e-5
    )

    # packed eval composes with steps_per_execution: both packed batches ride
    # ONE stacked dispatch (lax.scan) and must reproduce the same results
    trainer.args.steps_per_execution = 2
    r_packed_k2 = trainer.evaluate()
    for k in metric_keys + ["eval_loss"]:
        np.testing.assert_allclose(
            r_packed_k2[k], r_packed[k], rtol=2e-5, err_msg=k
        )


@pytest.mark.parametrize("masking", ["clm", "mlm"])
def test_packed_eval_budget_worst_case(masking):
    """All-length-2 sessions: every packed row carries exactly S//2 segments,
    so the packed-eval loss-row budget (B*(S//2) gathered CE rows —
    prediction_task.py) is TIGHT. Metrics must still match unpacked eval
    exactly — proof the budget never drops a target."""
    schema = _schema(num_items=120)
    rng = np.random.default_rng(9)
    n_sessions = SEQ // 2 * 6  # six full packed rows
    lens = np.full(n_sessions, 2)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    total = int(offsets[-1])
    data = {
        "item_id__values": rng.integers(1, 120, total),
        "item_id__offsets": offsets,
        "category__values": rng.integers(1, 10, total),
        "category__offsets": offsets,
        "item_recency__values": rng.random(total).astype(np.float32),
        "item_recency__offsets": offsets,
        "weekday_sin__values": rng.random(total).astype(np.float32),
        "weekday_sin__offsets": offsets,
    }
    packed = pack_sessions(data, max_len=SEQ, item_id_col="item_id")
    assert int(packed["segment_ids"].max()) == SEQ // 2  # bound is tight

    from transformers4rec_tpu.data.padding import pad_ragged

    names = {k.removesuffix("__values") for k in data if k.endswith("__values")}
    unpacked = {
        name: pad_ragged(data[f"{name}__values"], data[f"{name}__offsets"], SEQ)
        for name in names
    }

    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=32, masking=masking, aggregation="concat"
    )
    arch = "transfoxl" if masking == "clm" else "xlnet"
    cfg = tr.transformer_registry.parse(arch).build(
        d_model=32, n_head=2, n_layer=1, total_seq_length=SEQ, dropout=0.0,
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))
    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    pb = {k: jnp.asarray(v) for k, v in packed.items()}
    ub = {k: jnp.asarray(v) for k, v in unpacked.items()}
    params = model.init(rngs, ub, training=True)

    lp, outs_p = model.apply(params, pb, targets=pb, testing=True,
                             compute_metrics=True)
    lu, outs_u = model.apply(params, ub, targets=ub, testing=True,
                             compute_metrics=True)
    np.testing.assert_allclose(float(lp), float(lu), rtol=2e-5)
    mp, mu = outs_p["next-item"].metrics, outs_u["next-item"].metrics
    for k in mp:
        np.testing.assert_allclose(float(mp[k][0]), float(mu[k][0]),
                                   rtol=2e-5, err_msg=k)
        # identical target COUNTS: the budget dropped nothing
        np.testing.assert_allclose(float(mp[k][1]), float(mu[k][1]),
                                   rtol=1e-6, err_msg=f"{k} count")
