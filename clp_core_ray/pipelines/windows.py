"""Per-conversation windowing: sessionization over the ordered turn log.

Ray Data has no event-time windows; the streaming-shaped rebuild is
groupby(conv_id).map_groups over turns sorted by turn_idx (the input_hint's
"stable turn ordering" contract), with the window logic vectorized inside the
group. Hot conversations (the generator plants ~5%-of-all-turns convs) make
single groups large — that is fine for map_groups (one task per group), and
per-batch pre-aggregation keeps the *aggregate* paths skew-immune; a key so
hot it breaks a single task would be salted into (conv_id, salt) subgroups
and merged, as stats_by's partial step already effectively does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SESSION_GAP_SECONDS = 600


def sessionize(ds, gap_seconds: int = SESSION_GAP_SECONDS):
    """Assign session ids within each conversation (gap > gap_seconds splits).

    Returns Dataset[(conv_id, turn_idx, session_id)] where session_id counts
    sessions per conversation starting at 0.
    """

    def per_conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        ts = df["ts"].astype("datetime64[us]").astype(np.int64) // 1_000_000
        gap = ts.diff().fillna(0)
        df["session_id"] = (gap > gap_seconds).cumsum().astype(np.int64)
        return df[["conv_id", "turn_idx", "session_id"]]

    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")


def session_stats(ds, gap_seconds: int = SESSION_GAP_SECONDS):
    """Per-session aggregate: n_turns, span_seconds (windowed aggregate)."""

    def per_conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("turn_idx")
        ts = df["ts"].astype("datetime64[us]").astype(np.int64) // 1_000_000
        gap = ts.diff().fillna(0)
        sid = (gap > gap_seconds).cumsum()
        out = (
            pd.DataFrame({"conv_id": df["conv_id"], "session_id": sid, "ts_s": ts})
            .groupby(["conv_id", "session_id"], sort=True)
            .agg(n_turns=("ts_s", "size"), span_seconds=("ts_s", lambda s: s.max() - s.min()))
            .reset_index()
        )
        out["session_id"] = out["session_id"].astype(np.int64)
        out["span_seconds"] = out["span_seconds"].astype(np.int64)
        return out

    return ds.groupby("conv_id").map_groups(per_conv, batch_format="pandas")
