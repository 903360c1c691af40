"""Eval throughput: unpacked single-target vs packed per-segment-target.

Times the jitted eval step (loss + streaming ranking-metric states,
``testing=True``) on the REES46 XLNet-MLM headline config at B=128/chip:

- **unpacked**: one session per row, `eval_single_target` gathers ONE target
  position per session -> fused_ce_and_rank over N=B rows.
- **packed**: ~1.7-1.8 sessions per row (`pack_sessions`), per-segment
  last-item targets -> budgeted full-position path gathering B*(S//2) CE rows
  (model/prediction_task.py packed-eval budget; exact metrics by test).

Prints one JSON line per arm: {"arm", "ms_per_step", "sessions_per_sec_per_chip"}.
Run on the TPU (default backend); --cpu for a smoke run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import functools
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import transformers4rec_tpu as tr
    from transformers4rec_tpu.data.packing import pack_sessions
    from transformers4rec_tpu.data.padding import pad_ragged
    from transformers4rec_tpu.data.synthetic import (
        synthetic_data,
        synthetic_ecommerce_data_schema,
    )

    NUM_ITEMS = 390_000
    D_MODEL, N_LAYER, N_HEAD = 192, 3, 16
    SEQ, BATCH = 20, 128 * jax.device_count()
    n_chips = jax.device_count()
    if args.cpu:
        NUM_ITEMS, D_MODEL, N_HEAD = 5_000, 64, 4

    schema = synthetic_ecommerce_data_schema(
        num_items=NUM_ITEMS, num_categories=150, max_session_length=SEQ
    )
    im = tr.TabularSequenceFeatures.from_schema(
        schema, d_output=D_MODEL, masking="mlm", aggregation="concat",
        masking_kwargs={"mlm_probability": 0.3},
    )
    cfg = tr.XLNetConfig.build(
        d_model=D_MODEL, n_head=N_HEAD, n_layer=N_LAYER,
        total_seq_length=SEQ, dropout=0.0,
    )
    model = cfg.to_model(im, tr.NextItemPredictionTask(weight_tying=True))

    ragged = synthetic_data(schema, num_rows=BATCH * 3, max_session_length=SEQ,
                            seed=0, ragged=True)
    packed_all = pack_sessions(ragged, max_len=SEQ, item_id_col="item_id")
    packed = {k: jnp.asarray(v[:BATCH]) for k, v in packed_all.items()}
    names = {k.removesuffix("__values") for k in ragged if k.endswith("__values")}
    unpacked = {
        name: jnp.asarray(
            pad_ragged(ragged[f"{name}__values"], ragged[f"{name}__offsets"],
                       SEQ)[:BATCH]
        )
        for name in names
    }
    sessions_packed = int(
        sum(len(np.unique(r[r > 0])) for r in np.asarray(packed["segment_ids"]))
    )

    rngs = {
        "params": jax.random.PRNGKey(0),
        "masking": jax.random.PRNGKey(1),
        "dropout": jax.random.PRNGKey(2),
        "sampling": jax.random.PRNGKey(3),
    }
    params = model.init(rngs, {k: v[:8] for k, v in unpacked.items()},
                        training=True)

    @functools.partial(jax.jit)
    def eval_step(p, batch):
        loss, outs = model.apply(p, batch, targets=batch, testing=True,
                                 compute_metrics=True)
        return loss, outs["next-item"].metrics

    for arm, batch, n_sessions in (
        ("unpacked", unpacked, BATCH),
        ("packed", packed, sessions_packed),
    ):
        for _ in range(3):
            loss, m = eval_step(params, batch)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            loss, m = eval_step(params, batch)
        float(loss)
        dt = time.perf_counter() - t0
        ms = dt / args.steps * 1e3
        print(json.dumps({
            "arm": arm,
            "ms_per_step": round(ms, 3),
            "sessions_per_batch": n_sessions,
            "sessions_per_sec_per_chip": round(n_sessions / (dt / args.steps)
                                               / n_chips, 1),
        }))


if __name__ == "__main__":
    main()
