"""Windowed aggregations over event streams (streaming-shaped workloads).

Ray Data is a batch engine with no watermarks (SURVEY.md §2.12); windows
are computed per key over the full ordered history:
``groupby(key).map_groups(window_fn)`` with pandas inside the group (Ray
guide pattern). Ordering within a group is established by an explicit sort
inside the group function - never assumed from block order (determinism
under re-execution, SURVEY.md §4.2).

- tumbling: GROUP BY floor(ts/size) - SQL-checkable;
- sliding: each row tagged with every window it falls into (flat-map by
  window count, then tumbling machinery);
- session: gap-based segmentation (see also __ray_entry__ q_sessions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def tumbling(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    window_s: int,
    value_col: str | None = None,
) -> ray.data.Dataset:
    """Per (key, window) counts + min/max of value (exact-in-double aggs)."""

    def add_window(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()))
        w = us // (window_s * 1_000_000)
        return b.append_column("window", pa.array(w))

    wds = ds.map_batches(add_window, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min

    aggs = [Count(alias_name="n")]
    if value_col:
        aggs += [Min(value_col, alias_name="vmin"), Max(value_col, alias_name="vmax")]
    return wds.groupby([key, "window"]).aggregate(*aggs)


def sliding(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    window_s: int,
    slide_s: int,
) -> ray.data.Dataset:
    """Sliding windows: each event lands in window_s/slide_s windows
    (flat-map expansion), then per-(key, window_start) count."""
    k = window_s // slide_s

    def expand(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()))
        slide_us = slide_s * 1_000_000
        last_start = (us // slide_us) * slide_us
        parents = np.repeat(np.arange(len(us), dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64), len(us)) * slide_us
        win_start = np.repeat(last_start, k) - offs
        valid = win_start >= 0
        out = b.take(pa.array(parents[valid]))
        return out.append_column("window_start", pa.array(win_start[valid] // 1_000_000))

    wds = ds.map_batches(expand, batch_format="pyarrow")
    from ray.data.aggregate import Count

    return wds.groupby([key, "window_start"]).aggregate(Count(alias_name="n"))


def sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap_s: int,
    order_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Per-key session segments: rows sorted by ts inside the group, a new
    session starts after a gap > gap_s. Emits (key, session_id,
    session_start, session_end, n_events)."""

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        sort_by = [ts_col] + (order_cols or [])
        df = df.sort_values(sort_by, kind="stable")
        ts = df[ts_col].astype("datetime64[us]").astype("int64") // 1_000_000
        new = np.concatenate([[True], np.diff(ts) > gap_s])
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"sid": sid, "ts": ts})
            .groupby("sid")
            .agg(session_start=("ts", "min"), session_end=("ts", "max"), n_events=("ts", "size"))
            .reset_index()
        )
        out.insert(0, key, df[key].iloc[0])
        return out.rename(columns={"sid": "session_id"})

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
