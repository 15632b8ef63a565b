"""Distributed k-means (functions/clustering.py): deterministic smallest-id
init, Lloyd equivalence vs a single-node numpy reference, separated-blob
recovery, empty-cluster stability, assignment streaming."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.functions.clustering import (
    _assign,
    _init_centroids,
    kmeans,
    kmeans_assign,
    kmeans_fit,
)


def _blobs(n_per=200, d=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = np.array([[0.0] * d, [10.0] * d, [-10.0] + [0.0] * (d - 1)])
    rows = []
    for ci, c in enumerate(centers):
        rows.append(c[None, :] + rng.normal(0, 0.5, (n_per, d)))
    m = np.vstack(rows)
    ids = np.arange(len(m))
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([r.tolist() for r in m], type=pa.list_(pa.float32())),
        "true": pa.array(np.repeat(np.arange(3), n_per)),
    })
    return t, m.astype(np.float64)


def _ref_kmeans(m, k, iters):
    cents = m[:k].copy()
    for _ in range(iters):
        a = _assign(m, cents)
        new = cents.copy()
        for j in range(k):
            sel = m[a == j]
            if len(sel):
                new[j] = sel.mean(axis=0)
        cents = new
    return cents


def test_init_smallest_ids():
    t, m = _blobs(n_per=50)
    ds = ray.data.from_arrow(t).repartition(5)
    c = _init_centroids(ds, 3, "embedding", "vec_id")
    # float32 storage: compare at float32 precision
    assert np.allclose(c, m[:3], atol=1e-5)


def test_fit_matches_single_node_reference_and_recovers_blobs():
    t, m = _blobs()
    ds = ray.data.from_arrow(t).repartition(6)
    cents = kmeans_fit(ds, k=3, iters=8)
    # the dataset stores float32 — the single-node reference must see the
    # same rounded values
    ref = _ref_kmeans(m.astype(np.float32).astype(np.float64), 3, 8)
    # same algorithm, same init; batch-order float drift only
    assert np.allclose(cents, ref, atol=1e-8)
    out = kmeans_assign(ds, cents).to_pandas()
    # each true blob maps to exactly one cluster
    grp = out.groupby("true")["cluster"].nunique()
    assert (grp == 1).all()
    assert out.cluster.nunique() == 3


def test_kmeans_one_call_and_empty_cluster():
    t, _ = _blobs(n_per=30)
    ds = ray.data.from_arrow(t)
    out = kmeans(ds, k=3, iters=4).to_pandas()
    assert set(out.columns) >= {"vec_id", "cluster"}
    assert out.cluster.between(0, 2).all()
    # k larger than distinct points: empty clusters keep their position,
    # no NaNs ever
    tiny = pa.table({
        "vec_id": pa.array([0, 1]),
        "embedding": pa.array([[0.0, 0.0], [1.0, 1.0]], type=pa.list_(pa.float32())),
    })
    cents = kmeans_fit(ray.data.from_arrow(tiny), k=4, iters=3)
    assert np.isfinite(cents).all()
    with pytest.raises(ValueError, match="iters"):
        kmeans_fit(ray.data.from_arrow(tiny), k=2, iters=0)
