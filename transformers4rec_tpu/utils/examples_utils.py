"""Example-driver utilities.

Parity: /root/reference/transformers4rec/torch/utils/examples_utils.py —
``fit_and_evaluate`` (:45-98) incremental time-window train/eval and
``wipe_memory`` (:101-103).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List


def fit_and_evaluate(trainer, start_time_index: int, end_time_index: int,
                     input_dir: str,
                     no_incremental_training: bool = False,
                     training_time_window_size: int = 0,
                     pad_digits: int = 0) -> Dict[str, List[float]]:
    """Time-window incremental training: train on window t, evaluate on t+1.

    Expects ``input_dir/{t}/train.parquet`` and ``input_dir/{t+1}/valid.parquet``
    partitions (same layout the reference's NVTabular preprocessing emits).
    Returns ``{"indexed_by_time_<metric>@k": [scores per window]}``.

    ``pad_digits`` zero-pads window folder names (reference
    ``time_window_folder_pad_digits`` — real NVTabular output uses '0001').

    ``no_incremental_training=True`` switches to the paper's SLIDING-WINDOW
    protocol (reference transf_exp_args.py:64-83 declares these flags; this
    implementation makes them functional): instead of continuing the model
    from the previous window, each step RETRAINS FROM SCRATCH on the last
    ``training_time_window_size`` windows of train data (0 = all windows from
    the start index up to the current one).
    """
    indexed_by_time_metrics: Dict[str, List[float]] = {}
    # eval_on_test_set (reference config/trainer.py:85-88): score each
    # window's test split instead of the validation split
    eval_file = (
        "test.parquet"
        if getattr(trainer.args, "eval_on_test_set", False)
        else "valid.parquet"
    )
    fmt = (lambda t: str(t).zfill(pad_digits)) if pad_digits else str
    for time_index in range(start_time_index, end_time_index + 1):
        if no_incremental_training:
            lo = (
                max(start_time_index, time_index - training_time_window_size + 1)
                if training_time_window_size > 0 else start_time_index
            )
            train_paths = [
                p for t in range(lo, time_index + 1)
                for p in glob.glob(
                    os.path.join(input_dir, fmt(t), "train.parquet")
                )
            ]
            # fresh model per window (params + optimizer + step caches)
            trainer.reset_model()
        else:
            train_paths = glob.glob(
                os.path.join(input_dir, fmt(time_index), "train.parquet")
            )
        eval_paths = glob.glob(
            os.path.join(input_dir, fmt(time_index + 1), eval_file)
        )

        print(f"\n***** Launch training for day {time_index}: *****")
        trainer.train_dataset = train_paths
        trainer.reset_lr_scheduler()
        trainer.train()

        trainer.eval_dataset = eval_paths
        eval_metrics = trainer.evaluate(metric_key_prefix="eval")
        print(f"\n***** Evaluation results for day {time_index + 1}:*****\n")
        for key in sorted(eval_metrics.keys()):
            if "at_" in key:
                print(f" {key.replace('_at_', '@')} = {eval_metrics[key]}")
                bucket = "indexed_by_time_" + key.replace("_at_", "@")
                indexed_by_time_metrics.setdefault(bucket, []).append(eval_metrics[key])

        wipe_memory(trainer)
    return indexed_by_time_metrics


def wipe_memory(trainer=None) -> None:
    """Free between-window state (reference: gc + cuda empty_cache; here the
    compiled step caches are dropped and host garbage collected)."""
    if trainer is not None and hasattr(trainer, "wipe_memory"):
        trainer.wipe_memory()
    else:
        import gc

        gc.collect()


def visualize_response(batch, response, top_k: int, session_col: str = "session_id"):
    """Format a serving response into (session, top-k item ids) rows
    (reference examples_utils.py:22-42)."""
    import numpy as np

    scores, ids = response if isinstance(response, tuple) else (None, response)
    sessions = np.asarray(batch[session_col]) if session_col in batch else np.arange(len(ids))
    return [
        {"session": int(s), "top_k_items": [int(i) for i in row[:top_k]]}
        for s, row in zip(sessions, np.asarray(ids))
    ]
