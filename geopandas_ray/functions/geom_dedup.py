"""Exact geometry deduplication / unique / value_counts
(reference array.py:567/:582, tests/test_pandas_methods.py:541-616).

Keyed on WKB bytes via a 64-bit content hash column (C-speed crc32 pair
per row) + ONE hash-partitioned shuffle + vectorized per-partition
byte-exact dedup (hash collisions resolved by comparing the WKB itself),
per the exact-dedup pattern in the Ray guide. Never a map_groups per
distinct geometry - per-group Python overhead dominates at cardinality.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..util import default_shuffle_partitions


def _wkb_hash_column(b: pa.Table, geometry: str) -> np.ndarray:
    """64-bit content hash of each row's WKB bytes (two crc32 passes at C
    speed, like dedup.hash_str64; None -> 0)."""
    col = b.column(geometry)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    out = np.zeros(len(col), dtype=np.uint64)
    for i, v in enumerate(col):
        raw = v.as_py()
        if raw is None:
            continue
        out[i] = np.uint64(zlib.crc32(raw)) | (
            np.uint64(zlib.crc32(raw, 0x9E3779B9)) << np.uint64(32)
        )
    return out


def with_geom_hash(ds: ray.data.Dataset, geometry: str = "geometry", out: str = "geom_hash"):
    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(_wkb_hash_column(b, geometry).astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def _partitioned(hashed: ray.data.Dataset, nparts: int) -> ray.data.Dataset:
    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = df["geom_hash"].to_numpy(np.int64) % nparts
        return df

    return hashed.map_batches(part, batch_format="pandas").repartition(nparts)


def drop_duplicate_geometries(
    ds: ray.data.Dataset, geometry: str = "geometry", id_col: str | None = None
) -> ray.data.Dataset:
    """Keep one row per distinct geometry (min id_col, else arbitrary-first
    deterministic by id ordering)."""
    nparts = default_shuffle_partitions()
    hashed = with_geom_hash(ds, geometry)

    def first_part(df: pd.DataFrame) -> pd.DataFrame:
        if id_col:
            df = df.sort_values(id_col, kind="stable")
        # byte-exact key: equal WKB == equal geometry (collision-proof)
        return df.drop_duplicates(geometry, keep="first").drop(
            columns=["geom_hash", "__part"]
        )

    return (
        _partitioned(hashed, nparts)
        .groupby("__part")
        .map_groups(first_part, batch_format="pandas")
    )


def geometry_value_counts(
    ds: ray.data.Dataset, geometry: str = "geometry"
) -> ray.data.Dataset:
    """(geometry, count) per distinct geometry - array.py:567 value_counts."""
    nparts = default_shuffle_partitions()
    hashed = with_geom_hash(ds, geometry)

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(geometry, sort=False).size().reset_index(name="count")

    return (
        _partitioned(hashed, nparts)
        .groupby("__part")
        .map_groups(count_part, batch_format="pandas")
    )
