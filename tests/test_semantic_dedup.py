"""semantic_dedup (functions/clustering.py): SemDeDup-style kmeans-bucketed
cosine pruning — single-node equivalence, chain semantics, re-split
invariants."""

import numpy as np
import pytest
import ray.data


def _brute_keep(v, ids, threshold):
    """Single-node reference of the prefix rule (one cluster)."""
    order = np.argsort(ids, kind="stable")
    v = v[order]
    ids = ids[order]
    nn = np.linalg.norm(v, axis=1)
    nn[nn == 0] = 1.0
    vn = v / nn[:, None]
    kept = []
    for i in range(len(ids)):
        sims = vn[i] @ vn[:i].T if i else np.array([])
        if not len(sims) or sims.max() < threshold:
            kept.append(ids[i])
    return sorted(kept)


def _ds(v, ids):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in v]),
            }
        )
    )


def test_k1_matches_brute_reference(rng):
    from geopandas_ray.functions.clustering import semantic_dedup

    v = rng.normal(size=(120, 8))
    # plant near-duplicates: rows 30..39 are tiny perturbations of 0..9
    v[30:40] = v[0:10] + rng.normal(scale=1e-3, size=(10, 8))
    ids = rng.permutation(1000)[:120].astype(np.int64)
    out = semantic_dedup(_ds(v, ids), threshold=0.95, k=1, iters=1)
    got = sorted(out.to_pandas()["vec_id"].tolist())
    assert got == _brute_keep(v, ids, 0.95)
    assert len(got) < 120  # something was actually pruned


def test_chain_semantics():
    # a~b (25 deg), b~c (25 deg), a!~c (50 deg), threshold cos(30 deg):
    # b drops via a; c drops via b EVEN THOUGH b itself was dropped
    # (prefix rule ranges over all earlier rows, the NOT-EXISTS contract)
    from geopandas_ray.functions.clustering import semantic_dedup

    ang = np.deg2rad([0.0, 25.0, 50.0])
    v = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    out = semantic_dedup(_ds(v, [1, 2, 3]), threshold=np.cos(np.deg2rad(30)), k=1, iters=1)
    assert sorted(out.to_pandas()["vec_id"].tolist()) == [1]


def test_exact_duplicates_survive_resplit(rng):
    # identical vectors project identically -> the same hyperplane side at
    # every depth, so exact-dup removal is EXACT even with a tiny cap
    from geopandas_ray.functions.clustering import semantic_dedup

    base = rng.normal(size=(40, 6))
    v = np.vstack([base, base])  # every row duplicated once
    ids = np.arange(80, dtype=np.int64)
    out = semantic_dedup(
        _ds(v, ids), threshold=0.999999, k=1, iters=1, cluster_row_cap=8
    )
    got = out.to_pandas()["vec_id"].tolist()
    # one survivor per duplicate pair: the smaller id (0..39)
    assert sorted(got) == list(range(40))


def test_two_blob_clusters(rng):
    # two well-separated blobs, k=2: each blob prunes independently and
    # the kept set equals the union of per-blob brute references
    from geopandas_ray.functions.clustering import kmeans_assign, kmeans_fit, semantic_dedup

    a = rng.normal(loc=0.0, scale=0.05, size=(60, 4)) + np.array([10, 0, 0, 0])
    b = rng.normal(loc=0.0, scale=0.05, size=(60, 4)) + np.array([0, 10, 0, 0])
    v = np.vstack([a, b])
    ids = np.arange(120, dtype=np.int64)
    ds = _ds(v, ids)
    out = semantic_dedup(ds, threshold=0.9999, k=2, iters=5)
    got = sorted(out.to_pandas()["vec_id"].tolist())

    cents = kmeans_fit(ds.materialize(), k=2, iters=5)
    lab = (
        kmeans_assign(ds, cents, out="c")
        .to_pandas()
        .sort_values("vec_id")["c"]
        .to_numpy()
    )
    expect = []
    for c in (0, 1):
        m = lab == c
        expect += _brute_keep(v[m], ids[m], 0.9999)
    assert got == sorted(expect)
    # blobs are tight: plenty pruned, both blobs keep at least one row
    assert 2 <= len(got) < 120


def test_columns_and_empty():
    import pyarrow as pa

    from geopandas_ray.functions.clustering import semantic_dedup

    tb = pa.table(
        {
            "vec_id": pa.array([7, 3], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]]),
            "label": pa.array(["a", "b"]),
        }
    )
    out = semantic_dedup(ray.data.from_arrow(tb), threshold=0.9, k=1, iters=1)
    df = out.to_pandas().sort_values("vec_id")
    assert df["vec_id"].tolist() == [3, 7]
    assert set(df.columns) == {"vec_id", "embedding", "label"}

    empty = ray.data.from_arrow(tb.slice(0, 0))
    assert semantic_dedup(empty, k=1).count() == 0


def test_keep_cluster_col(rng):
    from geopandas_ray.functions.clustering import semantic_dedup

    v = rng.normal(size=(30, 4))
    out = semantic_dedup(
        _ds(v, np.arange(30)), threshold=0.9999, k=3, iters=2, keep_cluster_col=True
    )
    df = out.to_pandas()
    assert "__sem_cluster" in df.columns
    assert df["__sem_cluster"].between(0, 2).all()
