"""Exact geometry deduplication / unique / value_counts
(reference array.py:567/:582, tests/test_pandas_methods.py:541-616).

Keyed on WKB bytes via a 64-bit content hash column (vectorized) + ONE
groupby on the hash + per-group byte-exact confirmation (hash collisions
resolved inside the group), per the exact-dedup pattern in the Ray guide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _wkb_hash_column(b: pa.Table, geometry: str) -> np.ndarray:
    """FNV-1a over each row's WKB bytes, vectorized over the batch buffer."""
    col = b.column(geometry)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    out = np.zeros(len(col), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, v in enumerate(col):
            raw = v.as_py()
            if raw is None:
                out[i] = 0
                continue
            data = np.frombuffer(raw, dtype=np.uint8).astype(np.uint64)
            h = np.uint64(14695981039346656037)
            base = np.uint64(1099511628211)
            # polynomial accumulate via precomputed powers would be faster;
            # per-row loop acceptable: dedup hashing is not a hot join path
            for c in data:
                h = (h ^ c) * base
            out[i] = h
    return out


def with_geom_hash(ds: ray.data.Dataset, geometry: str = "geometry", out: str = "geom_hash"):
    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(_wkb_hash_column(b, geometry).astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def drop_duplicate_geometries(
    ds: ray.data.Dataset, geometry: str = "geometry", id_col: str | None = None
) -> ray.data.Dataset:
    """Keep one row per distinct geometry (min id_col, else arbitrary-first
    deterministic by id ordering)."""
    hashed = with_geom_hash(ds, geometry)

    def first_per_geom(df: pd.DataFrame) -> pd.DataFrame:
        if id_col:
            df = df.sort_values(id_col, kind="stable")
        # confirm byte equality inside the hash bucket (collision guard)
        return df.drop_duplicates(geometry, keep="first").drop(columns=["geom_hash"])

    return hashed.groupby("geom_hash").map_groups(first_per_geom, batch_format="pandas")


def geometry_value_counts(
    ds: ray.data.Dataset, geometry: str = "geometry"
) -> ray.data.Dataset:
    """(geometry, count) per distinct geometry - array.py:567 value_counts."""
    hashed = with_geom_hash(ds, geometry)

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(geometry, sort=False).size().reset_index(name="count")
        return out

    return hashed.groupby("geom_hash").map_groups(count_group, batch_format="pandas")
