"""Deterministic splitting / sampling for training-data pipelines.

A 100 TB corpus can't be split by `random_shuffle` + slice (a full
all-to-all exchange AND non-reproducible across runs/retries); the scale
idiom is a HASH SPLIT: a pure per-row function of a stable key assigns
every row to a bucket, so the split is (a) a streaming map_batches filter
with zero shuffle, (b) identical on every re-run and on every retry of a
failed task, and (c) consistent across tables sharing the key.

The bucket function is Knuth's multiplicative hash on int64 keys,
`((key + salt) * 2654435761) mod 2^32`, chosen because it is exactly
reproducible in ANSI SQL (the DuckDB oracles compute the same buckets) —
deterministic-split parity is gate-checked, not assumed.

Reference: this module has no geopandas counterpart; it generalizes the
reference's seeded `sample_points` determinism posture (geoseries.py
sample_points) to row-level corpus operations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(4294967296)


def _bucket_of(keys: np.ndarray, n_buckets: int, salt: int) -> np.ndarray:
    if keys.min(initial=0) < 0:
        # uint64 wraparound would silently diverge from the SQL form of
        # the same hash — refuse rather than split differently
        raise ValueError("hash-split keys must be non-negative integers")
    k = keys.astype(np.uint64) + np.uint64(salt)
    return ((k * _KNUTH) % _MOD32 % np.uint64(n_buckets)).astype(np.int64)


def with_hash_bucket(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    n_buckets: int = 10000,
    salt: int = 0,
    out: str = "bucket",
) -> ray.data.Dataset:
    """Append the deterministic bucket column. Streaming, shuffle-free."""

    def f(b: pa.Table) -> pa.Table:
        keys = pc.cast(b.column(key), pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column(out, pa.array(_bucket_of(keys, n_buckets, salt)))

    return ds.map_batches(f, batch_format="pyarrow")


def train_test_split(
    ds: ray.data.Dataset,
    key: str = "doc_id",
    test_frac: float = 0.1,
    salt: int = 0,
    n_buckets: int = 10000,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(train, test) datasets: rows whose bucket falls below
    ``test_frac * n_buckets`` go to test. The parent is MATERIALIZED
    before the two filters — two lazy consumers of one plan re-execute
    the whole upstream pipeline per consumer (CLAUDE.md consumer-count
    rule); for a huge upstream prefer calling this on a just-read
    dataset (the re-read is then the cheap part)."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    cut = int(round(test_frac * n_buckets))
    parent = with_hash_bucket(ds, key, n_buckets, salt, out="__bucket").materialize()

    def side(want_test: bool):
        def f(b: pa.Table) -> pa.Table:
            m = pc.less(b.column("__bucket"), pa.scalar(cut))
            if not want_test:
                m = pc.invert(m)
            return b.filter(m).drop_columns(["__bucket"])

        return parent.map_batches(f, batch_format="pyarrow")

    return side(False), side(True)


def sample_fraction(
    ds: ray.data.Dataset,
    frac: float,
    key: str = "doc_id",
    salt: int = 0,
    n_buckets: int = 10000,
) -> ray.data.Dataset:
    """Deterministic ~``frac`` sample: keep rows whose bucket < frac*n.
    Unlike ``Dataset.random_sample`` this is reproducible and
    key-consistent (the same doc_id is kept in every table it appears
    in), and it never shuffles."""
    cut = int(round(frac * n_buckets))

    def f(b: pa.Table) -> pa.Table:
        keys = pc.cast(b.column(key), pa.int64()).to_numpy(zero_copy_only=False)
        keep = _bucket_of(keys, n_buckets, salt) < cut
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_stratified(
    ds: ray.data.Dataset,
    strata: str,
    fracs: dict[str, float] | float,
    key: str = "doc_id",
    salt: int = 0,
    n_buckets: int = 10000,
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: ``fracs`` is either one
    fraction for every stratum value or {stratum: frac} (absent strata
    keep NOTHING — an explicit budget, the curation idiom). Still a pure
    per-row filter: no groupby, no shuffle — the stratum only selects
    WHICH cut applies to the row's bucket."""
    if isinstance(fracs, dict):
        cuts = {k: int(round(v * n_buckets)) for k, v in fracs.items()}
        default_cut = 0
    else:
        cuts = {}
        default_cut = int(round(float(fracs) * n_buckets))

    def f(b: pa.Table) -> pa.Table:
        keys = pc.cast(b.column(key), pa.int64()).to_numpy(zero_copy_only=False)
        bucket = _bucket_of(keys, n_buckets, salt)
        svals = b.column(strata).to_pylist()
        cut = np.fromiter(
            (cuts.get(s, default_cut) for s in svals), dtype=np.int64, count=len(svals)
        )
        return b.filter(pa.array(bucket < cut))

    return ds.map_batches(f, batch_format="pyarrow")
