"""Attribute joins: hash equi-join, as-of join, concat semantics.

- ``hash_join``: the portable partitioned hash join from the Ray guide -
  tag both sides, one groupby on the key, pandas merge per group. For a
  small right side use ``broadcast_join`` (ray.put + per-batch map) - no
  shuffle at all.
- ``asof_join``: merge each left row to the latest right row with
  right_ts <= left_ts within the same key - sort both sides inside the
  key group and ``pd.merge_asof`` (the as-of pattern from the Ray guide).
- CRS/metadata rules for merges follow the reference (tests/test_merge.py:
  26-46: result keeps the left frame's geometry column + CRS).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..util import default_pool, default_shuffle_partitions
import ray.data

_SIDE = "__mside"


def broadcast_join(
    left: ray.data.Dataset,
    right: pa.Table,
    on: str,
    how: str = "inner",
    rsuffix: str = "_right",
) -> ray.data.Dataset:
    """Map-side join against a broadcast right table (dimension lookup)."""
    right_ref = ray.put(right)

    class _Joiner:
        def __init__(self):
            t = ray.get(right_ref)
            self.rdf = t.to_pandas()

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.rdf, on=on, how="left" if how == "left" else "inner",
                            suffixes=("", rsuffix))

    return left.map_batches(_Joiner, batch_format="pandas", concurrency=default_pool())


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    how: str = "inner",
    lsuffix: str = "",
    rsuffix: str = "_right",
) -> ray.data.Dataset:
    """Partitioned hash join: union with side tags -> groupby(on) ->
    per-group pandas merge. Works at any size; one shuffle."""
    lcols = left.schema().names
    rcols = right.schema().names

    def tag(side):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[_SIDE] = side
            return df

        return f

    lt = left.map_batches(tag(0), batch_format="pandas")
    rt = right.map_batches(tag(1), batch_format="pandas")

    # pad to a common schema for union
    def pad(cols_missing, types):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in cols_missing:
                df[c] = None
            return df

        return f

    l_missing = [c for c in rcols if c not in lcols]
    r_missing = [c for c in lcols if c not in rcols]
    lt = lt.map_batches(pad(l_missing, None), batch_format="pandas")
    rt = rt.map_batches(pad(r_missing, None), batch_format="pandas")

    overlap = [c for c in lcols if c in rcols and c != on]

    # partition by HASH of the key, not by the key itself: groupby(on) runs
    # the pandas merge once per distinct key (per-group Python overhead
    # dominates at high key cardinality); one vectorized merge per hash
    # partition does the same join at C speed
    nparts = default_shuffle_partitions()

    def part_col(df: pd.DataFrame) -> pd.DataFrame:
        # infer_objects: a zero-row pandas block in the pipeline upcasts
        # later concatenated blocks' int64 key to OBJECT dtype, and
        # hash_array(object-ints) != hash_array(int64) - sides would land
        # in different partitions and silently drop matches
        df = df.copy()
        df[on] = df[on].infer_objects()
        df["__part"] = pd.util.hash_array(df[on].to_numpy()) % nparts
        return df

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df[_SIDE] == 0][[c for c in lcols]].copy()
        rdf = df[df[_SIDE] == 1][[c for c in rcols]].copy()
        # same object-upcast hazard: merge on object-ints vs int64 matches
        # nothing in pandas 2.x
        ldf[on] = ldf[on].infer_objects()
        rdf[on] = rdf[on].infer_objects()
        return ldf.merge(rdf, on=on, how=how, suffixes=(lsuffix or "", rsuffix))

    # repartition first: Ray groupby emits one partition per input block, so
    # a 2-block input would run the whole join in 2 tasks (CLAUDE.md invariant)
    both = (
        lt.union(rt)
        .map_batches(part_col, batch_format="pandas")
        .repartition(nparts)
    )
    return both.groupby("__part").map_groups(join_part, batch_format="pandas")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
) -> ray.data.Dataset:
    """As-of join per key: each left row gets the nearest right row at or
    before (backward) / after (forward) its timestamp. One groupby(key)
    shuffle; pd.merge_asof inside each key group."""
    lcols = left.schema().names
    rcols = right.schema().names

    def tag(side, ts_col):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[_SIDE] = side
            df["__ts"] = df[ts_col]
            return df

        return f

    lt = left.map_batches(tag(0, left_ts), batch_format="pandas")
    rt = right.map_batches(tag(1, right_ts), batch_format="pandas")

    def pad(missing):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in missing:
                df[c] = None
            return df

        return f

    lt = lt.map_batches(pad([c for c in rcols if c not in lcols]), batch_format="pandas")
    rt = rt.map_batches(pad([c for c in lcols if c not in rcols]), batch_format="pandas")

    # hash-partition by key, ONE vectorized merge_asof(by=key) per
    # partition - not a per-key map_groups (same rationale as hash_join)
    nparts = default_shuffle_partitions()

    def part_col(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[key].to_numpy()) % nparts
        return df

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        # infer_objects: when the two sides use DIFFERENT ts column names,
        # the union pad leaves each ts column object-dtyped (None on the
        # other side's rows) and merge_asof refuses non-numeric keys — the
        # same upcast hazard hash_join guards against
        ldf = df[df[_SIDE] == 0][lcols].sort_values(left_ts, kind="stable").infer_objects()
        rdf = df[df[_SIDE] == 1][rcols].sort_values(right_ts, kind="stable").infer_objects()
        if len(ldf) == 0:
            return ldf
        if len(rdf) == 0:
            out = ldf.copy()
            for c in rcols:
                if c != key:
                    out[c] = None
            return out
        return pd.merge_asof(
            ldf, rdf, left_on=left_ts, right_on=right_ts, by=key, direction=direction
        )

    both = (
        lt.union(rt)
        .map_batches(part_col, batch_format="pandas")
        .repartition(nparts)
    )
    return both.groupby("__part").map_groups(join_part, batch_format="pandas")


def concat_rows(datasets: list[ray.data.Dataset], crs_list=None) -> ray.data.Dataset:
    """axis=0 concat with the reference's CRS conflict rule
    (tests/test_merge.py:64-104): all non-None CRS must match or ValueError."""
    crs_set = {c for c in (crs_list or []) if c is not None}
    if len(crs_set) > 1:
        raise ValueError(f"Cannot determine common CRS for concatenation inputs, got {sorted(crs_set)}")
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def concat_columns(
    datasets: list[ray.data.Dataset], geometry_cols: list[str | None] | None = None
) -> ray.data.Dataset:
    """axis=1 concat (tests/test_merge.py:174-209): row-aligned zip of the
    inputs. Duplicate GEOMETRY column names across inputs fail loudly with
    the reference's message (geopandas#1230 - a frame cannot hold two
    geometry columns under one name); non-geometry collisions follow Ray
    zip's suffix rule. ``geometry_cols``: each input's active geometry
    column name (None for a plain table); defaults to 'geometry' when the
    schema has it."""
    if geometry_cols is None:
        geometry_cols = [
            "geometry" if "geometry" in d.schema().names else None for d in datasets
        ]
    seen: set[str] = set()
    for ds, gcol in zip(datasets, geometry_cols):
        if gcol is None or gcol not in ds.schema().names:
            continue
        if gcol in seen:
            raise ValueError(
                "Concat operation has resulted in multiple columns using "
                f"the geometry column name '{gcol}'."
            )
        seen.add(gcol)
    out = datasets[0]
    for d in datasets[1:]:
        out = out.zip(d)
    return out
