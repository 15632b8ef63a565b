import numpy as np

from geopandas_ray.geom.index import BBoxTree


def brute_pairs(qb, ib):
    out = []
    for i in range(len(qb)):
        if np.isnan(qb[i]).any():
            continue
        for j in range(len(ib)):
            if np.isnan(ib[j]).any():
                continue
            if (
                qb[i, 0] <= ib[j, 2]
                and qb[i, 2] >= ib[j, 0]
                and qb[i, 1] <= ib[j, 3]
                and qb[i, 3] >= ib[j, 1]
            ):
                out.append((i, j))
    return sorted(out)


def test_query_boxes_matches_brute_force(rng):
    n = 300
    ib = np.empty((n, 4))
    ib[:, 0] = rng.uniform(0, 100, n)
    ib[:, 1] = rng.uniform(0, 100, n)
    ib[:, 2] = ib[:, 0] + rng.uniform(0, 10, n)
    ib[:, 3] = ib[:, 1] + rng.uniform(0, 10, n)
    ib[::50] = np.nan  # missing rows excluded
    m = 200
    qb = np.empty((m, 4))
    qb[:, 0] = rng.uniform(0, 100, m)
    qb[:, 1] = rng.uniform(0, 100, m)
    qb[:, 2] = qb[:, 0] + rng.uniform(0, 15, m)
    qb[:, 3] = qb[:, 1] + rng.uniform(0, 15, m)
    tree = BBoxTree(ib, leaf_size=8)
    qi, ti = tree.query_boxes(qb, chunk=64)
    assert sorted(zip(qi.tolist(), ti.tolist())) == brute_pairs(qb, ib)


def test_query_points(rng):
    n = 100
    ib = np.empty((n, 4))
    ib[:, 0] = rng.uniform(0, 100, n)
    ib[:, 1] = rng.uniform(0, 100, n)
    ib[:, 2] = ib[:, 0] + 5
    ib[:, 3] = ib[:, 1] + 5
    tree = BBoxTree(ib)
    px = rng.uniform(0, 100, 500)
    py = rng.uniform(0, 100, 500)
    qi, ti = tree.query_points(px, py)
    qb = np.column_stack([px, py, px, py])
    assert sorted(zip(qi.tolist(), ti.tolist())) == brute_pairs(qb, ib)


def test_empty_tree():
    tree = BBoxTree(np.empty((0, 4)))
    qi, ti = tree.query_boxes(np.array([[0.0, 0.0, 1.0, 1.0]]))
    assert len(qi) == 0
