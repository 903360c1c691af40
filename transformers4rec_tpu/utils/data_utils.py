"""Preprocessing utilities over interaction dataframes.

Parity: /root/reference/transformers4rec/utils/data_utils.py —
``remove_consecutive_interactions`` (:34-47),
``add_item_first_seen_col_to_df`` (:50-64), ``session_aggregator`` (:67+, an
NVTabular groupby workflow; here a pure-pandas groupby with identical output
shape: one row per session with list columns, trimmed/filtered by length).
"""

from __future__ import annotations

from typing import Optional

from ..schema import Schema

FIRST_SEEN_ITEM_COL_NAME = "item_ts_first"


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
):
    """Aggregate row-per-interaction data into session-level list columns.

    Pure-pandas analog of the reference's NVTabular groupby workflow: sort by
    time within session, group schema columns into lists, trim to
    ``maximum_length``, drop sessions shorter than ``minimum_length``.
    """
    import pandas as pd

    cols = [c.name for c in schema if c.name in data.columns]
    sort_cols = [session_id_col] + ([timestamp_col] if timestamp_col in data.columns else [])
    df = data.sort_values(sort_cols)
    grouped = df.groupby(session_id_col, sort=True)
    out = {session_id_col: [], **{c: [] for c in cols}}
    for sid, g in grouped:
        if len(g) < minimum_length:
            continue
        out[session_id_col].append(sid)
        for c in cols:
            out[c].append(list(g[c].to_numpy()[:maximum_length]))
    return pd.DataFrame(out)
