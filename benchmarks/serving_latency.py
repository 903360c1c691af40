"""Serving latency/throughput benchmark.

Measures the exported StableHLO artifact (the production serving path) on the
available device: p50/p95/p99 latency and QPS for top-k next-item scoring at
the REES46-scale vocabulary, across batch sizes. ``--http`` measures the full
HTTP daemon instead (serving/server.py: JSON decode → dynamic batcher →
device → JSON encode — the Triton-analog path), with ``--concurrency``
parallel clients.

  python benchmarks/serving_latency.py [--cpu] [--vocab 390000] [--top-k 100]
  python benchmarks/serving_latency.py --http --concurrency 8
  python benchmarks/serving_latency.py --weights-dtype bfloat16
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=390_000)
    ap.add_argument("--d-model", type=int, default=192)
    ap.add_argument("--top-k", type=int, default=100)
    ap.add_argument("--batch-sizes", default="1,32,128")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--weights-dtype", default=None,
                    help="e.g. bfloat16 — cast params at export (halves the "
                         "memory-bound vocab-GEMM table read per request)")
    ap.add_argument("--http", action="store_true",
                    help="measure the HTTP daemon (dynamic batching) instead "
                         "of the in-process runner")
    ap.add_argument("--concurrency", type=int, default=8,
                    help="parallel HTTP clients (http mode)")
    ap.add_argument("--max-delay-ms", type=float, default=2.0,
                    help="dynamic-batcher window (http mode)")
    ap.add_argument("--sharded", type=int, default=0, metavar="MODEL_AXIS",
                    help="measure the MODEL-PARALLEL runner instead "
                         "(ShardedInferenceRunner over a local ('model',) "
                         "mesh, top-k via sharded_topk). On one chip this "
                         "measures the jit-serving path vs the AOT artifact")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )
    from transformers4rec_tpu.serving import export_model, load_runner

    schema = synthetic_ecommerce_data_schema(num_items=args.vocab)
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=args.d_model, masking="mlm", aggregation="concat"
    )
    model = tr.XLNetConfig.build(args.d_model, 16, 3, 20).to_model(
        im, tr.NextItemPredictionTask(weight_tying=True)
    )
    rngs = {k: jax.random.PRNGKey(i)
            for i, k in enumerate(["params", "masking", "dropout", "sampling"])}
    example = {
        k: jnp.asarray(v)
        for k, v in synthetic_data(schema, num_rows=8, max_session_length=20, seed=0).items()
    }
    params = model.init(rngs, example, training=True)
    # T4R_REUSE_ARTIFACT=1 skips the (minutes-long at V=390k) re-export when
    # the artifact dir already exists — e.g. between --http and runner runs.
    # The dir is keyed by every config knob that changes the export, so a
    # stale artifact can never be benchmarked under the wrong label.
    art_dir = (
        f"/tmp/t4r_latency_artifact_{args.weights_dtype or 'float32'}"
        f"_v{args.vocab}_d{args.d_model}_k{args.top_k}"
        f"{'_bp' if args.sharded else ''}"
    )
    if os.environ.get("T4R_REUSE_ARTIFACT") == "1" and os.path.isdir(art_dir):
        path = art_dir
    else:
        path = export_model(model, params, example, art_dir,
                            top_k=args.top_k, weights_dtype=args.weights_dtype,
                            bundle_params=bool(args.sharded))

    def report(tag, bs, lat_ms, qps):
        lat = np.asarray(lat_ms)
        print(json.dumps({
            "benchmark": tag,
            "weights_dtype": args.weights_dtype or "float32",
            "batch_size": bs,
            "top_k": args.top_k,
            "vocab": args.vocab,
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p95_ms": round(float(np.percentile(lat, 95)), 2),
            "p99_ms": round(float(np.percentile(lat, 99)), 2),
            "qps": round(qps, 1),
        }), flush=True)

    if args.http:
        # the full daemon path: JSON → dynamic batcher → device → JSON.
        # Each client sends single-session requests; the batcher coalesces.
        import concurrent.futures
        import urllib.request

        from transformers4rec_tpu.serving import ServingServer

        server = ServingServer(
            path, port=0, max_batch_size=128, max_delay_ms=args.max_delay_ms
        ).start()
        try:
            base = f"http://127.0.0.1:{server.port}"
            req_rows = synthetic_data(schema, num_rows=args.concurrency,
                                      max_session_length=20, seed=1)

            def one(i):
                inputs = {k: np.asarray(v)[i % args.concurrency:
                                           i % args.concurrency + 1].tolist()
                          for k, v in req_rows.items()}
                body = json.dumps({"inputs": inputs}).encode()
                t0 = time.perf_counter()
                r = urllib.request.Request(
                    f"{base}/v2/predict", data=body,
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(r) as resp:
                        json.loads(resp.read())
                except urllib.error.HTTPError as e:
                    raise RuntimeError(
                        f"server {e.code}: {e.read().decode()[:500]}"
                    ) from e
                return (time.perf_counter() - t0) * 1000

            with concurrent.futures.ThreadPoolExecutor(args.concurrency) as ex:
                list(ex.map(one, range(2 * args.concurrency)))  # warm/compile
                n = args.iters * args.concurrency
                t0 = time.perf_counter()
                lat = list(ex.map(one, range(n)))
                wall = time.perf_counter() - t0
            report("serving_latency_http", 1, lat, n / wall)
        finally:
            server.stop()
        return

    if args.sharded:
        from transformers4rec_tpu.serving import ShardedInferenceRunner

        runner = ShardedInferenceRunner(path, model, model_axis=args.sharded)
        tag = f"serving_latency_sharded{args.sharded}"
    else:
        runner = load_runner(path)
        tag = "serving_latency"
    for bs in (int(b) for b in args.batch_sizes.split(",")):
        req = synthetic_data(schema, num_rows=bs, max_session_length=20, seed=bs)
        runner.predict(req)  # compile
        lat = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            scores, ids = runner.predict(req)
            _ = ids[0][0]  # force host materialization
            lat.append((time.perf_counter() - t0) * 1000)
        report(tag, bs, lat, bs * 1000.0 / float(np.mean(lat)))


if __name__ == "__main__":
    main()
