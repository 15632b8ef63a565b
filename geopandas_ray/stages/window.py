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

    from ..util import default_shuffle_partitions

    wds = ds.map_batches(add_window, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min

    aggs = [Count(alias_name="n")]
    if value_col:
        aggs += [Min(value_col, alias_name="vmin"), Max(value_col, alias_name="vmax")]
    # repartition before groupby (CLAUDE.md: Ray's shuffle emits one output
    # partition per INPUT block — a 2-block read collapses to 2 tasks)
    return (
        wds.repartition(default_shuffle_partitions())
        .groupby([key, "window"])
        .aggregate(*aggs)
    )


def sliding(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    window_s: int,
    slide_s: int,
) -> ray.data.Dataset:
    """Sliding windows: each event lands in every slide-aligned window
    containing it (flat-map expansion), then per-(key, window_start) count.
    Works for ragged window/slide ratios: k = ceil(window_s/slide_s)
    candidates per event, kept by exact containment
    (win <= ts < win + window_s) — a floor k dropped valid windows when
    window_s was not a multiple of slide_s and emitted ZERO rows for
    slide_s > window_s; the old ``win >= 0`` clip also silently discarded
    pre-epoch windows."""
    k = -(-window_s // slide_s)  # ceil

    def expand(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()))
        slide_us = slide_s * 1_000_000
        # floor-division start (correct for negative timestamps too)
        last_start = (us // slide_us) * slide_us
        parents = np.repeat(np.arange(len(us), dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64), len(us)) * slide_us
        win_start = np.repeat(last_start, k) - offs
        # win <= ts holds by construction; keep windows whose END is past ts
        valid = win_start > np.repeat(us, k) - window_s * 1_000_000
        out = b.take(pa.array(parents[valid]))
        return out.append_column("window_start", pa.array(win_start[valid] // 1_000_000))

    from ..util import default_shuffle_partitions

    wds = ds.map_batches(expand, batch_format="pyarrow")
    from ray.data.aggregate import Count

    return (
        wds.repartition(default_shuffle_partitions())
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n"))
    )


def sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap_s: int,
    order_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Per-key session segments: rows sorted by ts inside the group, a new
    session starts after a gap > gap_s. Emits (key, session_id,
    session_start, session_end, n_events); start/end are epoch seconds
    (float — microsecond precision). Gap comparison runs at native
    microsecond precision: truncating to whole seconds first mis-segmented
    sub-second data (t=0.0 vs t=1.9 with gap_s=1 merged; 0.9 vs 2.0 split)."""

    from ..util import default_shuffle_partitions

    nparts = default_shuffle_partitions()

    def part_col(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[key].to_numpy()) % nparts
        return df

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL keys in the partition (per-key
        # map_groups pays Python overhead per entity): sort by (key, ts),
        # new segment at key change or gap, per-key session index by
        # cumcount over segments
        sort_by = [key, ts_col] + (order_cols or [])
        df = df.sort_values(sort_by, kind="stable")
        ts_us = df[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        keys = df[key].to_numpy()
        if len(df) == 0:
            return pd.DataFrame(
                {key: [], "session_id": [], "session_start": [], "session_end": [], "n_events": []}
            )
        newseg = np.concatenate(
            [[True], (keys[1:] != keys[:-1]) | (np.diff(ts_us) > gap_s * 1_000_000)]
        )
        gsid = np.cumsum(newseg) - 1
        tmp = pd.DataFrame({key: keys, "__gsid": gsid, "__ts": ts_us / 1_000_000.0})
        seg = (
            tmp.groupby("__gsid", sort=False)
            .agg(
                **{
                    key: (key, "first"),
                    "session_start": ("__ts", "min"),
                    "session_end": ("__ts", "max"),
                    "n_events": ("__ts", "size"),
                }
            )
            .reset_index(drop=True)
        )
        seg["session_id"] = seg.groupby(key, sort=False).cumcount()
        return seg[[key, "session_id", "session_start", "session_end", "n_events"]]

    return (
        ds.map_batches(part_col, batch_format="pandas")
        .repartition(nparts)
        .groupby("__part")
        .map_groups(per_part, batch_format="pandas")
    )
