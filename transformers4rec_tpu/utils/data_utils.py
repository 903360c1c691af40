"""Preprocessing utilities over interaction dataframes.

Parity: /root/reference/transformers4rec/utils/data_utils.py —
``remove_consecutive_interactions`` (:34-47),
``add_item_first_seen_col_to_df`` (:50-64), ``session_aggregator`` (:67+, an
NVTabular groupby workflow; here a pure-pandas groupby with identical output
shape: one row per session with list columns, trimmed/filtered by length),
``save_time_based_splits`` (:169-306, cudf/dask_cudf there; pure
pandas/numpy here — the splits are host-side ETL, not device work).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
from typing import Dict, Optional, Sequence, Union

from ..schema import Schema

FIRST_SEEN_ITEM_COL_NAME = "item_ts_first"

# NVTabular Categorify conventions (reference getting-started ETL notebook
# 01-ETL-with-NVTabular.ipynb: "Categorify encodes nulls to 1, OOVs to 2;
# 0 is preserved for padding; other categories start from 3").
CATEGORIFY_PAD_INDEX = 0
CATEGORIFY_NULL_INDEX = 1
CATEGORIFY_OOV_INDEX = 2
CATEGORIFY_START_INDEX = 3


def categorify(
    df,
    columns: Sequence[str],
    start_index: int = CATEGORIFY_START_INDEX,
    freq_threshold: int = 0,
    max_size: Optional[int] = None,
):
    """Encode raw categorical values to contiguous ids — the NVTabular
    ``Categorify`` op of the reference preprocessing workflows
    (getting-started-session-based/01-ETL-with-NVTabular.ipynb: `categ_feats =
    ['item_id', 'category'] >> nvt.ops.Categorify()`).

    Ids are assigned by DESCENDING frequency (most frequent item gets the
    smallest id — ties broken by raw value for determinism), starting at
    ``start_index``; 0 is reserved for padding, 1 for nulls, 2 for
    out-of-vocabulary values (values below ``freq_threshold`` or beyond
    ``max_size`` uniques).

    Returns ``(encoded_df, mappings)`` where ``mappings[col]`` is a numpy
    array of raw values such that raw ``mappings[col][i]`` ↔ encoded
    ``start_index + i`` (the layout of NVTabular's ``unique.<col>.parquet``).
    """
    import pandas as pd

    df = df.copy()
    mappings: Dict[str, "np.ndarray"] = {}
    for col in columns:
        counts = df[col].value_counts(dropna=True)
        # stable frequency order with deterministic tie-break on raw value
        order = counts.reset_index()
        order.columns = ["value", "count"]
        order = order.sort_values(["count", "value"], ascending=[False, True])
        if freq_threshold > 0:
            order = order[order["count"] >= freq_threshold]
        if max_size is not None:
            order = order.iloc[:max_size]
        raw_values = order["value"].to_numpy()
        mappings[col] = raw_values
        if any(v == 0 or v == "" for v in raw_values.tolist()):
            import warnings

            warnings.warn(
                f"column {col!r} contains raw value 0/'' — it gets a real "
                "code at training time but serving treats 0/'' as PADDING "
                "(the framework-wide pad convention), so that one raw id "
                "cannot be addressed at inference. Remap it upstream.",
                stacklevel=2,
            )
        code = {v: start_index + i for i, v in enumerate(raw_values)}
        enc = df[col].map(code)
        enc = enc.where(~df[col].isna(), CATEGORIFY_NULL_INDEX)
        df[col] = enc.fillna(CATEGORIFY_OOV_INDEX).astype("int64")
    return df, mappings


def build_category_codes(raw_values, start_index: int = CATEGORIFY_START_INDEX):
    """Raw-value → id lookup table (a pandas Series hash index) for a
    ``categorify`` mapping. Build ONCE per column and reuse across
    ``encode_with_categories`` calls — constructing the index is O(V) and
    would otherwise dominate the serving hot path at real vocab sizes."""
    import numpy as np
    import pandas as pd

    return pd.Series(
        np.arange(len(raw_values), dtype=np.int64) + start_index,
        index=pd.Index(raw_values),
    )


def encode_with_categories(
    values,
    raw_values,
    start_index: int = CATEGORIFY_START_INDEX,
    zero_is_padding: bool = True,
):
    """Apply a ``categorify`` mapping to new data (the serving-time
    TransformWorkflow stage of the reference Triton ensemble).

    Nulls (None/NaN) encode to the NULL index and unseen values to the OOV
    index — the same convention ``categorify`` applied at training time.
    ``zero_is_padding`` (default) keeps raw 0/"" → 0: this framework reserves
    0 for padding everywhere, so a raw catalog id of literally 0 cannot be
    addressed at serving time (``categorify`` warns if one exists).

    ``raw_values`` may be the mapping array or a prebuilt
    ``build_category_codes`` Series (pass the latter on hot paths).
    """
    import numpy as np
    import pandas as pd

    code = (
        raw_values
        if isinstance(raw_values, pd.Series)
        else build_category_codes(raw_values, start_index)
    )
    arr = np.asarray(values)
    flat = pd.Series(arr.ravel())
    isna = flat.isna().to_numpy()
    enc = flat.map(code).fillna(CATEGORIFY_OOV_INDEX).astype("int64").to_numpy()
    enc = np.where(isna, CATEGORIFY_NULL_INDEX, enc)
    if zero_is_padding and not isna.all():
        flat_np = flat.to_numpy()
        is_pad = np.zeros(len(flat_np), bool)
        for pad in (0, ""):
            try:
                is_pad |= np.asarray(flat_np == pad, bool) & ~isna
            except (TypeError, ValueError):  # incomparable dtypes
                pass
        enc = np.where(is_pad, CATEGORIFY_PAD_INDEX, enc)
    return enc.reshape(arr.shape)


def save_categories(mappings: Dict[str, "np.ndarray"], path: str) -> str:
    """Write ``unique.<col>.parquet`` files (NVTabular ``categories/`` layout:
    row i holds the raw value encoded as ``start_index + i``)."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    for col, raw_values in mappings.items():
        pd.DataFrame({col: raw_values}).to_parquet(
            os.path.join(path, f"unique.{col}.parquet")
        )
    return path


def load_categories(path: str) -> Dict[str, "np.ndarray"]:
    """Load ``unique.<col>.parquet`` mappings written by ``save_categories``
    (or by NVTabular itself — same layout)."""
    import pandas as pd

    mappings = {}
    for f in sorted(os.listdir(path)):
        if f.startswith("unique.") and f.endswith(".parquet"):
            col = f[len("unique."):-len(".parquet")]
            mappings[col] = pd.read_parquet(os.path.join(path, f))[col].to_numpy()
    return mappings


def categorify_schema(
    schema: Schema,
    mappings: Dict[str, "np.ndarray"],
    start_index: int = CATEGORIFY_START_INDEX,
) -> Schema:
    """Return a schema whose mapped columns carry the POST-encoding
    cardinality (``int_domain.max = start_index + num_uniques - 1``), the way
    NVTabular stamps the workflow's output schema."""
    from ..schema.schema import IntDomain

    out = Schema([dataclasses.replace(c) for c in schema])
    for col in out:
        if col.name in mappings:
            hi = start_index + len(mappings[col.name]) - 1
            col.int_domain = IntDomain(
                name=col.name, min=0, max=int(hi), is_categorical=True
            )
    return out


def remove_consecutive_interactions(
    df, session_id_col="session_id", item_id_col="item_id", timestamp_col="timestamp"
):
    """Drop consecutive in-session repetitions of the same item."""
    df = df.sort_values([session_id_col, timestamp_col])
    same_session = df[session_id_col] == df[session_id_col].shift(1)
    same_item = df[item_id_col] == df[item_id_col].shift(1)
    return df[~(same_session & same_item)]


def add_item_first_seen_col_to_df(
    df,
    item_id_column="item_id",
    timestamp_column="timestamp",
    first_seen_column_name=FIRST_SEEN_ITEM_COL_NAME,
):
    """Add each item's global first-seen timestamp as a column."""
    firsts = (
        df.groupby(item_id_column)
        .agg({timestamp_column: "min"})
        .reset_index()
        .rename(columns={timestamp_column: first_seen_column_name})
    )
    return df.merge(firsts, on=[item_id_column], how="left")


def session_aggregator(
    schema: Schema,
    data,
    maximum_length: int = 20,
    minimum_length: int = 2,
    session_id_col: str = "session_id",
    timestamp_col: Optional[str] = "timestamp",
    keep: str = "first",
):
    """Aggregate row-per-interaction data into session-level list columns.

    Pure-pandas analog of the reference's NVTabular groupby workflow: sort by
    time within session, group schema columns into lists, trim to
    ``maximum_length``, drop sessions shorter than ``minimum_length``.

    ``keep`` picks the truncation side: ``"first"`` keeps the earliest
    ``maximum_length`` interactions (the reference's utils
    ``session_aggregator`` — ``ListSlice(0, maximum_length)``), ``"last"``
    keeps the most recent ones (the reference's ETL notebooks —
    ``ListSlice(-SESSIONS_MAX_LENGTH)``).
    """
    import numpy as np
    import pandas as pd

    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    cols = [c.name for c in schema if c.name in data.columns]
    sort_cols = [session_id_col] + ([timestamp_col] if timestamp_col in data.columns else [])
    df = data.sort_values(sort_cols, kind="stable")

    # vectorized groupby: session boundaries on the sorted id column (a
    # per-group pandas loop measured 8s per 1M interactions; this is ~10x)
    sid = df[session_id_col].to_numpy()
    if len(sid) == 0:
        return pd.DataFrame({session_id_col: [], **{c: [] for c in cols}})
    change = np.nonzero(sid[1:] != sid[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(sid)]])
    lens = ends - starts
    m = lens >= minimum_length
    starts, ends, lens = starts[m], ends[m], lens[m]
    trim = np.minimum(lens, maximum_length)
    if keep == "first":
        ends = starts + trim
    else:
        starts = ends - trim
    out = {session_id_col: sid[starts]}
    for c in cols:
        arr = df[c].to_numpy()
        out[c] = [arr[s:e].tolist() for s, e in zip(starts, ends)]
    return pd.DataFrame(out)


def save_time_based_splits(
    data,
    output_dir: str,
    partition_col: str = "day_idx",
    timestamp_col: str = "ts/first",
    test_size: float = 0.1,
    val_size: float = 0.1,
    overwrite: bool = True,
    seed: int = 1,
    pad_digits: int = 0,
):
    """Partition session rows by a time column into ``{t}/train.parquet`` +
    ``valid.parquet`` + ``test.parquet`` folders — the layout the paper-repro
    CLI's incremental train/eval consumes.

    Reference parity: transformers4rec/utils/data_utils.py:169-306
    (`save_time_based_splits`; cudf/cupy/dask_cudf there). Semantics kept:
    one folder per distinct ``partition_col`` value, rows sorted by
    ``timestamp_col`` within the window, then a seeded uniform draw routes
    each row to train (u ≤ 1−val−test), valid (… ≤ 1−test), or test.

    ``data`` is a pandas DataFrame or a parquet file/directory path.
    """
    import numpy as np
    import pandas as pd

    if isinstance(data, (str, os.PathLike)):
        path = str(data)
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            data = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        else:
            data = pd.read_parquet(path)

    if partition_col not in data.columns:
        raise ValueError(f"partition_col {partition_col!r} not in dataframe")
    train_size = 1.0 - val_size - test_size
    if train_size < 0:
        raise ValueError("train_size cannot be negative.")
    if overwrite and os.path.exists(output_dir):
        shutil.rmtree(output_dir)

    for window, df in data.groupby(partition_col, sort=True):
        if timestamp_col in df.columns:
            df = df.sort_values(timestamp_col)
        # integral windows print as '1' not '1.0'; pad_digits gives the
        # '0001'-style names real NVTabular layouts (and
        # --time_window_folder_pad_digits) use
        try:
            name = (
                str(int(window)) if float(window) == int(window) else str(window)
            )
        except (TypeError, ValueError):  # non-numeric partition values
            name = str(window)
        if pad_digits:
            name = name.zfill(pad_digits)
        out_dir = os.path.join(output_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        # seeded per-window like the reference (cupy.random.seed(1) inside
        # the loop) so each window's split is independently reproducible
        u = np.random.RandomState(seed).rand(len(df))
        df[u <= train_size].to_parquet(os.path.join(out_dir, "train.parquet"))
        df[(u > train_size) & (u <= train_size + val_size)].to_parquet(
            os.path.join(out_dir, "valid.parquet")
        )
        df[u > 1.0 - test_size].to_parquet(os.path.join(out_dir, "test.parquet"))


def etl_interactions_to_time_splits(
    raw,
    schema: Schema,
    output_dir: str,
    num_windows: Optional[int] = None,
    day_col: Optional[str] = None,
    session_id_col: str = "session_id",
    item_id_col: Optional[str] = None,
    timestamp_col: str = "timestamp",
    maximum_length: int = 20,
    minimum_length: int = 2,
    test_size: float = 0.1,
    val_size: float = 0.1,
    seed: int = 1,
    pad_digits: int = 0,
    categorify_columns: Optional[Union[bool, Sequence[str]]] = None,
    categorify_freq_threshold: int = 0,
    categorify_max_size: Optional[int] = None,
    keep: str = "first",
) -> str:
    """Raw row-per-interaction events → windowed ``{t}/train.parquet`` +
    ``valid.parquet`` + ``test.parquet`` folders the paper-repro CLI consumes.

    One call covers the reference's whole preprocessing recipe
    (examples/t4rec_paper_experiments + transformers4rec/utils/data_utils.py):
    optional ``Categorify`` encoding (the NVTabular op in every reference ETL
    notebook) → dedup consecutive repeats (:34-47) → item first-seen column
    (:50-64) → NVTabular-style session aggregation (:67+) →
    ``save_time_based_splits`` (:169-306). Sessions are assigned to 1-based
    time windows by their START timestamp (``day_col`` overrides with a
    precomputed per-event day index); real datasets (e.g. REES46
    interactions) drop in with zero code.

    ``categorify_columns=True`` encodes every categorical schema column found
    in the raw frame (raw values of ANY dtype → contiguous ids by frequency);
    the mapping is written to ``{output_dir}/categories/unique.<col>.parquet``
    and a schema with post-encoding cardinalities to
    ``{output_dir}/schema.pbtxt`` — hand both to serving
    (``export_model(categories=...)``) to accept/return raw ids, the way the
    reference ensemble embeds its TransformWorkflow.

    ``raw`` is a pandas DataFrame or parquet path. Returns ``output_dir``.
    """
    import pandas as pd

    if isinstance(raw, (str, os.PathLike)):
        raw = pd.read_parquet(str(raw))
    item_id_col = item_id_col or schema.item_id_column_name

    mappings = None
    if categorify_columns:
        if categorify_columns is True:
            cols = [
                c.name for c in schema
                if c.is_categorical and c.name in raw.columns
            ]
        else:
            cols = list(categorify_columns)
        raw, mappings = categorify(
            raw, cols,
            freq_threshold=categorify_freq_threshold,
            max_size=categorify_max_size,
        )
        schema = categorify_schema(schema, mappings)

    df = remove_consecutive_interactions(
        raw, session_id_col, item_id_col, timestamp_col
    )
    df = add_item_first_seen_col_to_df(df, item_id_col, timestamp_col)

    # per-session scalars BEFORE aggregation: start timestamp + window index
    starts = df.groupby(session_id_col)[timestamp_col].min().rename("ts/first")
    if day_col is not None:
        days = df.groupby(session_id_col)[day_col].min().rename("day_idx")
    else:
        n = num_windows or 2
        lo, hi = float(starts.min()), float(starts.max())
        span = max(hi - lo, 1e-9)
        days = (
            ((starts - lo) / span * n).clip(upper=n - 1).astype(int) + 1
        ).rename("day_idx")

    sessions = session_aggregator(
        schema, df,
        maximum_length=maximum_length, minimum_length=minimum_length,
        session_id_col=session_id_col, timestamp_col=timestamp_col,
        keep=keep,
    )
    sessions = sessions.merge(starts, on=session_id_col).merge(
        days, on=session_id_col
    )
    save_time_based_splits(
        sessions, output_dir,
        partition_col="day_idx", timestamp_col="ts/first",
        test_size=test_size, val_size=val_size, seed=seed,
        pad_digits=pad_digits,
    )
    if mappings is not None:
        save_categories(mappings, os.path.join(output_dir, "categories"))
        schema.to_proto_text_file(os.path.join(output_dir, "schema.pbtxt"))
    return output_dir
