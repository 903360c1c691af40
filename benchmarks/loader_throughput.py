"""Host data-pipeline throughput: parquet → ragged decode → padded batches.

The reference delegates this to merlin-dataloader + cuDF (GPU parquet decode
— SURVEY.md §2.9); the TPU build's equivalent is pyarrow + the multithreaded
C++ pad/gather kernel (native/padding.cc) + a prefetch thread. This benchmark
pins the host-side numbers so input pipelines can be sized against device
step time (the REES46 train step consumes ~110k rows/s/chip at the packed
bench throughput).

Arms:
  native   C++ pad_ragged (the production path when native.available())
  numpy    pure-numpy fallback (also the correctness reference)

  python benchmarks/loader_throughput.py [--rows 200000] [--batch 128]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seq", type=int, default=20)
    args = ap.parse_args()

    import numpy as np

    from transformers4rec_tpu import native
    from transformers4rec_tpu.data.loader import ParquetDataLoader
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    schema = synthetic_ecommerce_data_schema(
        num_items=390_000, num_categories=150, max_session_length=args.seq
    )
    data = synthetic_data(
        schema, num_rows=args.rows, max_session_length=args.seq, seed=0,
        ragged=True,
    )

    # write a real parquet file the way users would hand it to the loader
    import pandas as pd

    with tempfile.TemporaryDirectory() as td:
        names = [k.removesuffix("__values") for k in data if k.endswith("__values")]
        df = pd.DataFrame(
            {
                name: np.split(
                    data[f"{name}__values"], data[f"{name}__offsets"][1:-1]
                )
                for name in names
            }
        )
        pq = f"{td}/sessions.parquet"
        df.to_parquet(pq)

        for arm, use_native in (("native", True), ("numpy", False)):
            if use_native and not native.available():
                print(json.dumps({"arm": arm, "skipped": "native lib missing"}))
                continue
            native._FORCE_DISABLE = not use_native  # toggle the C++ path
            try:
                t0 = time.perf_counter()
                loader = ParquetDataLoader.from_schema(
                    schema, pq, batch_size=args.batch,
                    max_sequence_length=args.seq, shuffle=True, seed=0,
                )
                load_s = time.perf_counter() - t0

                t0 = time.perf_counter()
                n = 0
                for b in loader:
                    n += next(iter(b.values())).shape[0]
                iter_s = time.perf_counter() - t0
                print(json.dumps({
                    "benchmark": "loader_throughput",
                    "arm": arm,
                    "rows": args.rows,
                    "parquet_load_s": round(load_s, 3),
                    "batch_rows_per_s": round(n / iter_s, 1),
                }))
            finally:
                native._FORCE_DISABLE = False


if __name__ == "__main__":
    main()
