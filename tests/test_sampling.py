"""Deterministic split / sampling (functions/sampling.py): SQL-matched
Knuth buckets, disjoint+exhaustive train/test, key-consistency across
tables, stratified budgets, salt independence."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.functions.sampling import (
    _bucket_of,
    sample_fraction,
    sample_stratified,
    train_test_split,
    with_hash_bucket,
)


def _docs(n=1000):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n)),
        "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)]),
    }))


def test_bucket_matches_duckdb():
    import duckdb

    ids = np.array([0, 1, 5, 123456, 999999999], dtype=np.int64)
    ours = _bucket_of(ids, 10000, 0).tolist()
    sql = duckdb.sql(
        "SELECT (i * 2654435761) % 4294967296 % 10000 FROM "
        "(SELECT unnest([0, 1, 5, 123456, 999999999]) AS i)"
    ).fetchall()
    assert ours == [r[0] for r in sql]
    # salt shifts the key before hashing
    assert _bucket_of(ids, 10000, 7).tolist() == _bucket_of(ids + 7, 10000, 0).tolist()


def test_split_disjoint_exhaustive_deterministic():
    train, test = train_test_split(_docs(), test_frac=0.2, salt=3)
    tr = train.to_pandas()
    te = test.to_pandas()
    assert len(tr) + len(te) == 1000
    assert set(tr.doc_id).isdisjoint(set(te.doc_id))
    assert 0.1 < len(te) / 1000 < 0.3  # ~20%
    # re-running gives the identical assignment (pure function of key)
    tr2, te2 = train_test_split(_docs(), test_frac=0.2, salt=3)
    assert sorted(te2.to_pandas().doc_id) == sorted(te.doc_id)
    # split column never leaks into the output
    assert "__bucket" not in tr.columns


def test_key_consistency_across_tables():
    # the same doc_id lands on the same side in ANY table carrying it
    other = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(0, 1000, 2)),
        "v": pa.array(np.zeros(500)),
    }))
    s1 = sample_fraction(_docs(), 0.3, salt=1).to_pandas()
    s2 = sample_fraction(other, 0.3, salt=1).to_pandas()
    assert set(s2.doc_id) == set(s1.doc_id) & set(range(0, 1000, 2))


def test_stratified_budgets():
    out = sample_stratified(_docs(), strata="lang", fracs={"en": 0.5, "de": 0.25})
    df = out.to_pandas()
    assert set(df.lang) <= {"en", "de"}  # absent strata keep nothing
    n_en = (df.lang == "en").sum()
    n_de = (df.lang == "de").sum()
    assert 0.35 < n_en / 334 < 0.65
    assert 0.1 < n_de / 333 < 0.4
    # scalar frac applies to every stratum
    all_l = sample_stratified(_docs(), strata="lang", fracs=0.5).to_pandas()
    assert set(all_l.lang) == {"en", "de", "fr"}


def test_bucket_column_and_validation():
    b = with_hash_bucket(_docs(100), n_buckets=8, out="b8").to_pandas()
    assert b.b8.between(0, 7).all()
    with pytest.raises(ValueError, match="test_frac"):
        train_test_split(_docs(10), test_frac=1.5)
