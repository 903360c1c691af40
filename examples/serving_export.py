"""Serving export walkthrough.

Parity with the reference's serving recipe (SURVEY.md §1.11 /
examples/getting-started-session-based/03-serving-...ipynb): train a model →
AOT-export the inference function with a top-k head → reload the artifact in
a fresh "server" and serve batched requests.

  JAX_PLATFORMS=cpu python examples/serving_export.py --cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact-dir", default="/tmp/t4r_serving_artifact")
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")


    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.serving import export_model, load_runner
    from transformers4rec_tpu.utils.examples_utils import visualize_response

    # 1. train briefly
    schema = synthetic_ecommerce_data_schema(num_items=2000)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=48, masking="mlm", aggregation="concat"
    )
    model = tr.XLNetConfig.build(48, 4, 2, 20).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True)
    )
    targs = tr.T4RecTrainingArguments(
        output_dir="/tmp/t4r_serving_train", data_loader_engine="synthetic",
        per_device_train_batch_size=16, max_steps=args.steps,
        max_sequence_length=20,
    )
    trainer = tr.Trainer(model=model, args=targs, schema=schema)
    trainer.train()

    # 2. export (torch.jit.trace → Triton analog: batch-polymorphic StableHLO)
    import jax.numpy as jnp

    example = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=4, max_session_length=20, seed=0).items()
    }
    path = export_model(
        model, trainer.params, example, args.artifact_dir, top_k=args.top_k
    )
    print(f"exported artifact: {sorted(os.listdir(path))}")

    # 3. "server" process: load artifact (no model code needed) and serve
    runner = load_runner(path)
    print("input schema:", runner.input_schema.column_names)
    print("output schema:", runner.output_schema.column_names)
    for batch_size in (1, 7, 32):
        request = synthetic_data(
            schema, num_rows=batch_size, max_session_length=20, seed=batch_size
        )
        scores, ids = runner.predict(request)
        assert ids.shape == (batch_size, args.top_k)
        print(f"served batch of {batch_size}: top-{args.top_k} ids, "
              f"e.g. {ids[0][:5].tolist()}")
    rows = visualize_response(request, (scores, ids), top_k=5)
    print("sample responses:", rows[:2])
    print("OK")


if __name__ == "__main__":
    main()
