"""Ragged → dense padding on host (numpy), XLA-friendly fixed shapes.

Parity target: /root/reference/transformers4rec/torch/utils/padding.py:48-164
(``_pad_ragged_tensor`` / ``pad_batch`` / ``pad_inputs``). The reference builds a
sparse COO tensor then densifies; on host we use a vectorized numpy scatter which
is equivalent and cheap, and always emits **static** ``(batch, max_len)`` shapes so
jit never retraces. Truncation keeps the FIRST ``max_len`` items of each session
(same as the reference's sparse construction, padding.py:60-63).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

NDArrayDict = Dict[str, np.ndarray]


def pad_ragged(values: np.ndarray, offsets: np.ndarray, max_len: int) -> np.ndarray:
    """Densify one ragged column to ``(num_rows, max_len)``, zero padded.

    Dispatches to the multithreaded C++ kernel (native/padding.cc) when the
    native lib is available; the numpy path below is the exact fallback.
    """
    from .. import native

    got = native.pad_ragged(np.asarray(values), np.asarray(offsets), max_len)
    if got is not None:
        return got
    offsets = offsets.astype(np.int64)
    num_rows = len(offsets) - 1
    lengths = np.minimum(offsets[1:] - offsets[:-1], max_len)
    out = np.zeros((num_rows, max_len), dtype=values.dtype)
    # row/col target indices for every kept value
    row_idx = np.repeat(np.arange(num_rows), lengths)
    col_idx = np.concatenate([np.arange(l) for l in lengths]) if num_rows else np.zeros(0, int)
    src_idx = np.concatenate(
        [np.arange(offsets[i], offsets[i] + lengths[i]) for i in range(num_rows)]
    ) if num_rows else np.zeros(0, int)
    out[row_idx, col_idx] = values[src_idx]
    return out


def pad_batch(batch: NDArrayDict, padding_lengths: Dict[str, int]) -> NDArrayDict:
    """Pad every ragged (``__values``/``__offsets``) column to its configured length.

    Dense columns pass through; 1-D dense columns listed in ``padding_lengths``
    are right-padded/truncated to the target length.
    """
    out: NDArrayDict = {}
    for key, val in batch.items():
        if key.endswith("__offsets"):
            continue
        if key.endswith("__values"):
            name = key[: -len("__values")]
            max_len = padding_lengths.get(name)
            if max_len is None:
                raise ValueError(f"No padding length configured for ragged column {name!r}")
            out[name] = pad_ragged(val, batch[f"{name}__offsets"], max_len)
        else:
            max_len = padding_lengths.get(key)
            if max_len is not None and val.ndim == 2 and val.shape[1] != max_len:
                fixed = np.zeros((val.shape[0], max_len), dtype=val.dtype)
                keep = min(val.shape[1], max_len)
                fixed[:, :keep] = val[:, :keep]
                out[key] = fixed
            else:
                out[key] = val
    return out


def pad_inputs(inputs: NDArrayDict, max_sequence_length: Optional[int] = None) -> NDArrayDict:
    """Model-entry padding (reference padding.py:125-164).

    Unlike the reference (which pads to ``min(max_sequence_length, batch max)``,
    a dynamic shape), we always pad to the static ``max_sequence_length`` so the
    jitted step function sees one shape.
    """
    if max_sequence_length is None:
        # infer from offsets
        seq_max = 0
        for key, val in inputs.items():
            if key.endswith("__offsets"):
                seq_max = max(seq_max, int(np.max(val[1:] - val[:-1])) if len(val) > 1 else 0)
        max_sequence_length = max(seq_max, 1)
    lengths = {}
    for key in inputs:
        if key.endswith("__values"):
            lengths[key[: -len("__values")]] = max_sequence_length
        elif not key.endswith("__offsets"):
            lengths[key] = max_sequence_length
    return pad_batch(inputs, lengths)


def ragged_lengths(offsets: np.ndarray) -> np.ndarray:
    return (offsets[1:] - offsets[:-1]).astype(np.int64)


def dense_to_ragged(dense: np.ndarray, lengths: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse of ``pad_ragged`` for testing round-trips."""
    num_rows, max_len = dense.shape
    lengths = np.minimum(lengths, max_len)
    offsets = np.zeros(num_rows + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    values = np.concatenate([dense[i, : lengths[i]] for i in range(num_rows)]) if num_rows else dense.reshape(0)
    return values, offsets
