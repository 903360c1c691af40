"""End-to-end walkthrough: raw events → session ETL → incremental training →
evaluation → serving export → LIVE batching daemon.

Parity with the reference's end-to-end yoochoose notebooks
(examples/end-to-end-session-based/01-ETL-with-NVTabular.ipynb +
02-end-to-end-session-based-with-Yoochoose-PyT.ipynb +
03-serving-session-based-model-torch-backend.ipynb): the NVTabular groupby
workflow becomes ``session_aggregator`` (utils/data_utils.py), the Triton
ensemble becomes the StableHLO artifact + ``ServingServer`` HTTP daemon
(serving/server.py).

  python examples/end_to_end.py --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import urllib.request  # loopback-only: talks to the local ServingServer daemon

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--days", type=int, default=3, help="incremental time windows")
    ap.add_argument("--steps-per-day", type=int, default=30)
    ap.add_argument("--top-k", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import generate_item_interactions
    from transformers4rec_tpu.serving import ServingServer, export_model
    from transformers4rec_tpu.utils.data_utils import (
        CATEGORIFY_START_INDEX,
        add_item_first_seen_col_to_df,
        categorify,
        categorify_schema,
        remove_consecutive_interactions,
        session_aggregator,
    )

    workdir = tempfile.mkdtemp(prefix="t4r_e2e_")
    num_items, seq = 2000, 15

    # ------------------------------------------------------------- 1. raw ETL
    # row-per-interaction events (what a clickstream log looks like)
    schema = tr.data.synthetic.synthetic_ecommerce_data_schema(
        num_items=num_items, num_categories=60, max_session_length=seq
    )
    raw = generate_item_interactions(12_000, schema, seed=11)
    raw["timestamp"] = np.arange(len(raw))
    raw["day"] = (raw["timestamp"] * args.days // len(raw)).astype(int)
    print(f"raw events: {len(raw)} rows, {raw['session_id'].nunique()} sessions")

    # raw catalogs have NON-contiguous ids (think REES46 product ids):
    # Categorify encodes them NVTabular-style (0=pad, 1=null, 2=OOV,
    # frequency order from 3) and the mapping rides into the serving artifact
    raw["item_id"] = raw["item_id"] * 131 + 1_000_000
    raw, category_maps = categorify(raw, ["item_id", "category"])
    schema = categorify_schema(schema, category_maps)
    print(f"categorified: {len(category_maps['item_id'])} unique raw item ids "
          f"→ contiguous [3, {2 + len(category_maps['item_id'])}]")

    raw = remove_consecutive_interactions(raw)
    raw = add_item_first_seen_col_to_df(raw)

    # per-day session aggregation → parquet (NVTabular-workflow analog)
    day_dirs = []
    for day, df_day in raw.groupby("day"):
        sessions = session_aggregator(
            schema, df_day, maximum_length=seq, minimum_length=2
        )
        d = os.path.join(workdir, f"day_{day}")
        os.makedirs(d, exist_ok=True)
        sessions.to_parquet(os.path.join(d, "data.parquet"))
        day_dirs.append(d)
        print(f"  day {day}: {len(sessions)} sessions → {d}")

    # ------------------------------------------- 2. model from the SAME schema
    input_module = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=64, masking="mlm", aggregation="concat"
    )
    cfg = tr.XLNetConfig.build(
        d_model=64, n_head=4, n_layer=2, total_seq_length=seq
    )
    model = cfg.to_model(input_module, tr.NextItemPredictionTask(weight_tying=True))

    targs = tr.T4RecTrainingArguments(
        output_dir=os.path.join(workdir, "out"),
        max_sequence_length=seq,
        per_device_train_batch_size=32,
        per_device_eval_batch_size=32,
        max_steps=args.steps_per_day,
        learning_rate=2e-3,
        logging_steps=10,
    )

    # ---------------------------- 3. incremental train over time windows
    # (reference examples_utils.fit_and_evaluate: train on day d, eval day d+1)
    trainer = tr.Trainer(model=model, args=targs, schema=schema)
    for d in range(len(day_dirs) - 1):
        trainer.train_dataset = day_dirs[d]
        trainer._train_dataloader = None
        m = trainer.train()
        ev = trainer.evaluate(eval_dataset=day_dirs[d + 1])
        print(
            f"window {d}: train_loss={m['train_loss']:.4f} "
            f"eval_loss={ev['eval_loss']:.4f} "
            f"recall@10={ev.get('eval_/next-item/recall_at_10', float('nan')):.4f}"
        )
        trainer.reset_lr_scheduler()

    # --------------------------------------------- 4. export + daemon serving
    artifact = os.path.join(workdir, "artifact")
    example = next(iter(trainer.get_eval_dataloader(day_dirs[-1])))
    export_model(model, trainer.params, example, artifact, top_k=args.top_k,
                 categories=category_maps)
    print(f"exported artifact: {artifact} (with Categorify mappings)")

    server = ServingServer(artifact, port=0, max_batch_size=16, max_delay_ms=5.0).start()
    try:
        base = f"http://{server.host}:{server.port}"
        # clients speak RAW ids: decode one encoded eval row back to raw —
        # the daemon re-encodes inputs and decodes its top-k output
        one = {}
        for k, v in example.items():
            a = np.asarray(v)[:1]
            if k in category_maps:
                m = category_maps[k]
                a = np.where(
                    a >= CATEGORIFY_START_INDEX,
                    m[np.clip(a - CATEGORIFY_START_INDEX, 0, len(m) - 1)],
                    0,
                )
            one[k] = a.tolist()
        print(f"request raw session: {[i for i in one['item_id'][0] if i]}")
        req = urllib.request.Request(
            f"{base}/v2/predict",
            data=json.dumps({"inputs": one}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        print(f"daemon top-{args.top_k} RAW item ids: {out['item_ids'][0]}")
        raw_vocab = set(category_maps["item_id"].tolist())
        assert all(i in raw_vocab or i == -1 for i in out["item_ids"][0])
        # the daemon must agree with the in-process runner on the same raw
        # request (catches any encode/decode asymmetry between the two paths)
        from transformers4rec_tpu.serving import load_runner

        r_scores, r_ids = load_runner(artifact).predict(one)
        assert np.allclose(np.asarray(out["item_id_scores"]), r_scores, atol=1e-5)
        assert np.array_equal(np.asarray(out["item_ids"]), r_ids)
        with urllib.request.urlopen(f"{base}/v2/health") as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        server.stop()
    print("END-TO-END OK")


if __name__ == "__main__":
    main()
