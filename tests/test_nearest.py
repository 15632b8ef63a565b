import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.nearest import sjoin_nearest


def test_ties_all_returned():
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array([0]), "geometry": W.points_to_wkb([0.0], [0.0])})
    )
    right = pa.table(
        {"rid": pa.array([0, 1, 2]), "geometry": W.points_to_wkb([-1.0, 1.0, 5.0], [0.0, 0.0, 0.0])}
    )
    j = sjoin_nearest(left, right, distance_col="d", right_index="rid").to_pandas()
    assert sorted(j.rid) == [0, 1]
    assert np.allclose(j.d, 1.0)


def test_brute_force_oracle(rng):
    n, m = 300, 80
    px = rng.uniform(0, 1000, n)
    py = rng.uniform(0, 1000, n)
    qx = rng.uniform(0, 1000, m)
    qy = rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = pa.table({"rid": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    j = sjoin_nearest(left, right, right_index="rid").to_pandas()
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    expected = d2.argmin(axis=1)
    got = j.set_index("pid").rid
    assert len(j) == n  # random floats: no ties
    assert np.array_equal(got.loc[np.arange(n)].to_numpy(), expected)


def test_max_distance_and_how_left(rng):
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array([0, 1]), "geometry": W.points_to_wkb([0.0, 500.0], [0.0, 500.0])})
    )
    right = pa.table({"rid": pa.array([7]), "geometry": W.points_to_wkb([1.0], [0.0])})
    inner = sjoin_nearest(left, right, max_distance=5.0, right_index="rid").to_pandas()
    assert inner.pid.tolist() == [0]
    outer = sjoin_nearest(left, right, max_distance=5.0, how="left", right_index="rid").to_pandas()
    assert len(outer) == 2 and outer[outer.pid == 1].rid.isna().all()


def test_exclusive():
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array([0]), "geometry": W.points_to_wkb([3.0], [3.0])})
    )
    right = pa.table(
        {"rid": pa.array([0, 1]), "geometry": W.points_to_wkb([3.0, 6.0], [3.0, 7.0])}
    )
    j = sjoin_nearest(left, right, exclusive=True, distance_col="d", right_index="rid").to_pandas()
    assert j.rid.tolist() == [1] and np.isclose(j.d[0], 5.0)


def test_nearest_to_polygons():
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array([0, 1]), "geometry": W.points_to_wkb([5.0, 30.0], [5.0, 5.0])})
    )
    right = pa.table(
        {
            "rid": pa.array([0, 1]),
            "geometry": W.boxes_to_wkb([0.0, 20.0], [0.0, 0.0], [10.0, 25.0], [10.0, 10.0]),
        }
    )
    j = sjoin_nearest(left, right, distance_col="d", right_index="rid").to_pandas().sort_values("pid")
    assert j.rid.tolist() == [0, 1]
    assert np.allclose(j.d, [0.0, 5.0])  # inside -> 0; 30 to box edge 25 -> 5


def test_shuffle_nearest_matches_broadcast(rng):
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n, m = 300, 60
    px = rng.uniform(0, 1000, n)
    py = rng.uniform(0, 1000, n)
    qx = rng.uniform(0, 1000, m)
    qy = rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right_t = pa.table({"zone_key": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    right = ray.data.from_arrow(right_t)
    D = 200.0
    got = sjoin_nearest_shuffle(left, right, max_distance=D, res=5, distance_col="d").to_pandas()
    # oracle
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    best = d2.min(axis=1)
    expect = {
        (i, int(d2[i].argmin())) for i in range(n) if best[i] <= D * D
    }
    assert set(zip(got.doc_id, got.zone_key)) == expect
    assert np.allclose(np.sort(got.d.to_numpy()), np.sort(np.sqrt(best[best <= D * D])))


def test_shuffle_nearest_ties():
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], type=pa.int64()), "geometry": W.points_to_wkb([512.0], [512.0])})
    )
    right = ray.data.from_arrow(
        pa.table(
            {"zone_key": pa.array([1, 2], type=pa.int64()), "geometry": W.points_to_wkb([502.0, 522.0], [512.0, 512.0])}
        )
    )
    got = sjoin_nearest_shuffle(left, right, max_distance=50.0, res=4).to_pandas()
    assert sorted(got.zone_key) == [1, 2]


def test_rect_left_edge_beats_centroid():
    # rectangle whose EDGE is nearest zone A but whose CENTROID is nearest
    # zone B - the r1 centroid approximation returned B (VERDICT bug #1)
    left = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array([0]),
                # long thin rect from x=0..100, centroid at x=50
                "geometry": W.boxes_to_wkb([0.0], [0.0], [100.0], [2.0]),
            }
        )
    )
    right = pa.table(
        {
            "rid": pa.array([0, 1]),
            # A at x=-3 (distance 3 from left edge); B at x=45 (distance 5
            # from centroid is 5 but 0 from... careful: B must be farther
            # from the RECT than A): B at y=40 above centroid: distance to
            # rect = 38; A distance to rect = 3 but to centroid = 53
            "geometry": W.points_to_wkb([-3.0, 50.0], [1.0, 40.0]),
        }
    )
    j = sjoin_nearest(left, right, distance_col="d", right_index="rid").to_pandas()
    assert j.rid.tolist() == [0]
    assert j.d.tolist() == [3.0]


def test_rect_brute_force_oracle(rng):
    # random rects vs random points: exact distance refine vs numpy brute
    n, m = 60, 40
    minx = rng.uniform(0, 900, n)
    miny = rng.uniform(0, 900, n)
    w = rng.uniform(5, 80, n)
    h = rng.uniform(5, 80, n)
    qx = rng.uniform(0, 1000, m)
    qy = rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n)),
                "geometry": W.boxes_to_wkb(minx, miny, minx + w, miny + h),
            }
        )
    )
    right = pa.table(
        {"rid": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)}
    )
    j = sjoin_nearest(left, right, distance_col="d", right_index="rid").to_pandas()
    # brute: point-to-rect distance
    dx = np.maximum(np.maximum(minx[:, None] - qx[None, :], qx[None, :] - (minx + w)[:, None]), 0)
    dy = np.maximum(np.maximum(miny[:, None] - qy[None, :], qy[None, :] - (miny + h)[:, None]), 0)
    d = np.sqrt(dx * dx + dy * dy)
    want_nearest = d.argmin(axis=1)
    got = j.sort_values("pid")
    assert len(got) == n  # no ties expected with random floats
    assert got.rid.tolist() == want_nearest.tolist()
    assert np.allclose(got.d.values, d.min(axis=1))


def test_unbounded_far_point_gets_match():
    # left point farther than the right layer's bbox diagonal: the radius
    # schedule alone leaves it unmatched (r1 ADVICE); full-scan fallback
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array([0]), "geometry": W.points_to_wkb([10000.0], [10000.0])})
    )
    right = pa.table(
        {"rid": pa.array([0, 1]), "geometry": W.points_to_wkb([0.0, 5.0], [0.0, 5.0])}
    )
    j = sjoin_nearest(left, right, right_index="rid").to_pandas()
    assert j.rid.tolist() == [1]


def test_shuffle_nearest_string_ids():
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left = ray.data.from_arrow(
        pa.table(
            {
                "doc": pa.array(["a", "b"]),
                "geometry": W.points_to_wkb([10.0, 500.0], [10.0, 500.0]),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "zone": pa.array(["z1", "z2"]),
                "geometry": W.points_to_wkb([12.0, 490.0], [10.0, 500.0]),
            }
        )
    )
    j = sjoin_nearest_shuffle(
        left, right, max_distance=50.0, res=4, domain=(0.0, 0.0, 1024.0, 1024.0),
        left_id="doc", right_id="zone", distance_col="d",
    ).to_pandas()
    assert sorted(zip(j.doc, j.zone)) == [("a", "z1"), ("b", "z2")]
    assert sorted(j.d) == [2.0, 10.0]


def test_shuffle_nearest_unbounded_matches_brute(rng):
    # max_distance=None -> coarsening ring expansion; sparse far-apart
    # rights force several rounds (many cells have no candidate in round 0)
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n, m = 400, 7
    px = rng.uniform(0, 1020, n)
    py = rng.uniform(0, 1020, n)
    qx = np.array([10.0, 1000.0, 500.0, 10.0, 1000.0, 250.0, 750.0])
    qy = np.array([10.0, 1000.0, 500.0, 1000.0, 10.0, 760.0, 240.0])
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table({"zone_key": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    )
    got = sjoin_nearest_shuffle(left, right, max_distance=None, res=5, distance_col="d").to_pandas()
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    best = d2.min(axis=1)
    expect = {(i, int(d2[i].argmin())) for i in range(n)}
    assert set(zip(got.doc_id, got.zone_key)) == expect
    assert len(got) == n  # unique nearest per left here
    assert np.allclose(np.sort(got.d.to_numpy()), np.sort(np.sqrt(best)))


def test_shuffle_nearest_unbounded_cell_boundary_property(rng):
    # points hugging cell boundaries with the nearest right JUST outside
    # their own cell: the acceptance rule (best <= cell extent) must not
    # accept a wrong local candidate
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    res = 4
    cs = 1024.0 / (1 << res)  # 64
    # left points at cell corners +- epsilon
    base = np.arange(1, 15, dtype=np.float64) * cs
    px = np.concatenate([base - 0.25, base + 0.25])
    py = np.full(len(px), 7 * cs + 0.25)
    # rights: a grid offset so the nearest is often across a boundary
    qx = np.arange(0, 17, dtype=np.float64) * cs + cs / 2
    qy = np.full(len(qx), 7 * cs - 0.5)
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(px))), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table({"zone_key": pa.array(np.arange(len(qx))), "geometry": W.points_to_wkb(qx, qy)})
    )
    got = sjoin_nearest_shuffle(left, right, max_distance=None, res=res).to_pandas()
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    expect = {(i, int(d2[i].argmin())) for i in range(len(px))}
    assert set(zip(got.doc_id, got.zone_key)) == expect


def test_shuffle_nearest_unbounded_ties():
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], type=pa.int64()), "geometry": W.points_to_wkb([512.0], [512.0])})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "zone_key": pa.array([1, 2, 3], type=pa.int64()),
                "geometry": W.points_to_wkb([12.0, 1012.0, 512.0], [512.0, 512.0, 12.0]),
            }
        )
    )
    got = sjoin_nearest_shuffle(left, right, max_distance=None, res=5).to_pandas()
    assert sorted(got.zone_key) == [1, 2, 3]  # all exactly 500 away


def test_shuffle_nearest_unbounded_chunked_kernel(rng, monkeypatch):
    # shrink the dense-block budget so per_cell splits lefts into many
    # chunks; results (incl. ties across a chunk boundary) must be
    # identical to brute force
    import geopandas_ray.stages.nearest as N

    monkeypatch.setattr(N, "_PAIR_BLOCK_ELEMS", 7)  # chunk = 7//m = 1..2
    n, m = 60, 5
    px = rng.randint(0, 1000, n).astype(np.float64)
    py = rng.randint(0, 1000, n).astype(np.float64)
    qx = np.array([100.0, 500.0, 900.0, 100.0, 900.0])
    qy = np.array([100.0, 500.0, 100.0, 900.0, 900.0])
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table({"zone_key": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    )
    got = N.sjoin_nearest_shuffle(
        left, right, max_distance=None, res=4, distance_col="d"
    ).to_pandas()
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    best = d2.min(axis=1)
    expect = {(i, j) for i in range(n) for j in range(m) if d2[i, j] == best[i]}
    assert set(zip(got.doc_id, got.zone_key)) == expect


def test_shuffle_nearest_unbounded_adversarial_bounded_groups(rng, monkeypatch):
    """r3 VERDICT #3: clustered lefts + far sparse rights used to coarsen to
    res 0 and evaluate EVERYTHING in one task. The floor-res + doubling-
    dilation schedule must (a) still be exact, (b) salt the dense left cell,
    and (c) keep every shuffle group under group_row_cap (the cap RAISES on
    violation, so completion is the assertion)."""
    import geopandas_ray.stages.nearest as N

    # every left in one tiny corner patch (one cell at every res), rights in
    # the far corner -> carries until the dilation reaches the diagonal
    n, m = 200, 5
    px = rng.uniform(0, 8, n)
    py = rng.uniform(0, 8, n)
    qx = rng.uniform(1010, 1020, m)
    qy = rng.uniform(1010, 1020, m)
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table({"zone_key": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    )
    # force the salt path: cells above 50 unresolved lefts split
    monkeypatch.setattr(N, "_SALT_TARGET_ROWS", 50)
    got = N.sjoin_nearest_shuffle(
        left,
        right,
        max_distance=None,
        res=6,
        distance_col="d",
        floor_res=3,
        # old plan: one group with all 200 lefts + all rights; salted floor
        # plan: <= ~50 lefts + m rights per group
        group_row_cap=120,
    ).to_pandas()
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    expect = {(i, int(d2[i].argmin())) for i in range(n)}
    assert set(zip(got.doc_id, got.zone_key)) == expect
    assert np.allclose(
        np.sort(got.d.to_numpy()), np.sort(np.sqrt(d2.min(axis=1)))
    )


def test_shuffle_nearest_unbounded_group_cap_trips(rng):
    """The scale guard itself must fire: an impossible cap raises."""
    import pytest as _pytest

    import geopandas_ray.stages.nearest as N

    n, m = 60, 3
    px = rng.uniform(0, 8, n)
    py = rng.uniform(0, 8, n)
    left = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "zone_key": pa.array(np.arange(m)),
                "geometry": W.points_to_wkb(
                    np.full(m, 1000.0), np.full(m, 1000.0)
                ),
            }
        )
    )
    with _pytest.raises(Exception, match="group_row_cap"):
        N.sjoin_nearest_shuffle(
            left, right, max_distance=None, res=5, group_row_cap=10
        ).to_pandas()


def _rect_point_d2(minx, miny, maxx, maxy, qx, qy):
    """(nL, nR) squared distances rect -> point."""
    dx = np.maximum(np.maximum(minx[:, None] - qx[None, :], qx[None, :] - maxx[:, None]), 0.0)
    dy = np.maximum(np.maximum(miny[:, None] - qy[None, :], qy[None, :] - maxy[:, None]), 0.0)
    return dx * dx + dy * dy


@pytest.fixture
def rect_left_fixture(rng):
    n, m = 150, 60
    minx = rng.uniform(0, 900, n)
    miny = rng.uniform(0, 900, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    qx = rng.uniform(0, 1000, m)
    qy = rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array(np.arange(n)),
                "geometry": W.boxes_to_wkb(minx, miny, minx + w, miny + h),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    )
    d2 = _rect_point_d2(minx, miny, minx + w, miny + h, qx, qy)
    return left, right, d2


def test_shuffle_nearest_general_left_bounded(rect_left_fixture):
    """r3 VERDICT next-round #6: NON-POINT lefts on the bounded shuffle path
    (bbox cell replication + exact refine + global min reduce), auto-detected
    (left_points defaults to None -> byte-length scan routes rects to the
    general plan)."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left, right, d2 = rect_left_fixture
    dmax = 60.0
    got = sjoin_nearest_shuffle(
        left, right, max_distance=dmax, res=5, left_id="zid", right_id="rid",
        distance_col="d",
    ).to_pandas()
    best = d2.min(axis=1)
    expect = {
        (i, j)
        for i in range(d2.shape[0])
        for j in range(d2.shape[1])
        if d2[i, j] == best[i] and best[i] <= dmax * dmax
    }
    assert set(zip(got.zid, got.rid)) == expect
    want_d = {(i, j): np.sqrt(d2[i, j]) for (i, j) in expect}
    for zid, rid, dv in zip(got.zid, got.rid, got.d):
        assert np.isclose(dv, want_d[(zid, rid)])


def test_shuffle_nearest_general_left_unbounded(rect_left_fixture):
    """Unbounded shuffle path with rect lefts: per-row extent tightens the
    round acceptance (best <= t - r); exact vs brute force."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left, right, d2 = rect_left_fixture
    got = sjoin_nearest_shuffle(
        left, right, max_distance=None, res=5, left_id="zid", right_id="rid",
        distance_col="d",
    ).to_pandas()
    best = d2.min(axis=1)
    expect = {
        (i, j)
        for i in range(d2.shape[0])
        for j in range(d2.shape[1])
        if d2[i, j] == best[i]
    }
    assert set(zip(got.zid, got.rid)) == expect
    assert np.allclose(np.sort(got.d.to_numpy()), np.sort(np.sqrt(best[sorted({i for i, _ in expect})])))  # noqa: E501


def test_point_left_autodetect_still_fast_path(rng):
    """Point lefts keep routing to the single-shuffle fast plan under
    auto-detection (left_points=None) and stay exact."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n, m = 120, 25
    px, py = rng.uniform(0, 1000, n), rng.uniform(0, 1000, n)
    qx, qy = rng.uniform(0, 1000, m), rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array(np.arange(n)), "geometry": W.points_to_wkb(px, py)})
    )
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array(np.arange(m)), "geometry": W.points_to_wkb(qx, qy)})
    )
    d2 = (px[:, None] - qx[None, :]) ** 2 + (py[:, None] - qy[None, :]) ** 2
    got = sjoin_nearest_shuffle(
        left, right, max_distance=100.0, res=5, left_id="pid", right_id="rid"
    ).to_pandas()
    best = d2.min(axis=1)
    expect = {
        (i, j) for i in range(n) for j in range(m)
        if d2[i, j] == best[i] and best[i] <= 10000.0
    }
    assert set(zip(got.pid, got.rid)) == expect


def test_shuffle_nearest_general_left_duplicate_ids():
    """Two DISTINCT left rows sharing an id each keep their own nearest set
    (r4 review: the global reduce keys per row, not per left id — a
    groupby(left_id) min would collapse row B's matches into row A's)."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    # row A (id=7) is a rect nearest right 0 at d=1; row B (also id=7) is a
    # rect nearest right 1 at d=5; a third row (id=9) sanity-checks uniques
    left = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array([7, 7, 9]),
                "geometry": W.boxes_to_wkb(
                    np.array([0.0, 500.0, 800.0]),
                    np.array([0.0, 500.0, 800.0]),
                    np.array([10.0, 510.0, 810.0]),
                    np.array([10.0, 510.0, 810.0]),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array([0, 1, 2]),
                "geometry": W.points_to_wkb(
                    np.array([11.0, 515.0, 811.0]), np.array([5.0, 505.0, 805.0])
                ),
            }
        )
    )
    got = sjoin_nearest_shuffle(
        left, right, max_distance=20.0, res=4, left_id="zid", right_id="rid",
        distance_col="d",
    ).to_pandas()
    pairs = sorted(zip(got.zid, got.rid, got.d))
    assert pairs == [(7, 0, 1.0), (7, 1, 5.0), (9, 2, 1.0)]


def test_shuffle_nearest_general_left_identical_duplicate_rows():
    """Two IDENTICAL left rows (same id AND geometry) each emit their pair,
    like two rows with a duplicated index in the reference join."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array([3, 3]),
                "geometry": W.boxes_to_wkb(
                    np.array([0.0, 0.0]), np.array([0.0, 0.0]),
                    np.array([10.0, 10.0]), np.array([10.0, 10.0]),
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array([0]), "geometry": W.points_to_wkb([12.0], [5.0])})
    )
    got = sjoin_nearest_shuffle(
        left, right, max_distance=5.0, res=4, left_id="zid", right_id="rid",
        distance_col="d",
    ).to_pandas()
    assert len(got) == 2
    assert sorted(zip(got.zid, got.rid, got.d)) == [(3, 0, 2.0), (3, 0, 2.0)]


def test_shuffle_nearest_bounded_point_group_cap_trips(rng):
    """group_row_cap fires on the bounded POINT plan too (r4 review: the
    guard existed only on the general and unbounded plans)."""
    import pytest as _pytest

    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n = 200
    left = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n)),
                # all points in one tiny cluster -> one cell group > cap
                "geometry": W.points_to_wkb(
                    rng.uniform(0, 1, n), rng.uniform(0, 1, n)
                ),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array([0]), "geometry": W.points_to_wkb([0.5], [0.5])})
    )
    with _pytest.raises(Exception, match="group_row_cap"):
        sjoin_nearest_shuffle(
            left, right, max_distance=10.0, res=3, group_row_cap=50,
            left_id="pid", right_id="rid",
        ).to_pandas()


def test_shuffle_nearest_general_mixed_rights_brute(rng):
    """General plan with NON-POINT rights: rect lefts x (rect + point)
    rights, shuffle result vs an exact geom_to_geom_sqdist brute force.
    Rights replicate to their d-dilated bbox cells; the per-cell kernel
    falls back to the per-pair exact kernel for mixed right types."""
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.geom.wkb import from_wkb
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n, m = 50, 30
    lminx = rng.uniform(0, 900, n)
    lminy = rng.uniform(0, 900, n)
    lw = rng.uniform(5, 60, n)
    lh = rng.uniform(5, 60, n)
    lwkb = W.boxes_to_wkb(lminx, lminy, lminx + lw, lminy + lh)
    # rights: first half rects, second half points (mixed type family)
    rminx = rng.uniform(0, 950, m // 2)
    rminy = rng.uniform(0, 950, m // 2)
    rs = rng.uniform(3, 40, m // 2)
    rects = W.boxes_to_wkb(rminx, rminy, rminx + rs, rminy + rs)
    px = rng.uniform(0, 1000, m - m // 2)
    py = rng.uniform(0, 1000, m - m // 2)
    pts = W.points_to_wkb(px, py)
    rwkb = pa.concat_arrays([rects.combine_chunks() if isinstance(rects, pa.ChunkedArray) else rects,
                             pts.combine_chunks() if isinstance(pts, pa.ChunkedArray) else pts])
    left = ray.data.from_arrow(
        pa.table({"zid": pa.array(np.arange(n)), "geometry": lwkb})
    )
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array(np.arange(m)), "geometry": rwkb})
    )
    dmax = 120.0
    got = sjoin_nearest_shuffle(
        left, right, max_distance=dmax, res=5, left_id="zid", right_id="rid",
        distance_col="d",
    ).to_pandas()
    lg = from_wkb(lwkb)
    rg = from_wkb(rwkb)
    d2 = np.array(
        [[K.geom_to_geom_sqdist(lg, i, rg, j) for j in range(m)] for i in range(n)]
    )
    best = d2.min(axis=1)
    expect = {
        (i, j)
        for i in range(n)
        for j in range(m)
        if d2[i, j] == best[i] and best[i] <= dmax * dmax
    }
    assert set(zip(got.zid, got.rid)) == expect
    for zid, rid, dv in zip(got.zid, got.rid, got.d):
        assert np.isclose(dv, np.sqrt(d2[zid, rid]))


def test_shuffle_nearest_bounded_salted_parity(rng):
    """salt>1 on the bounded POINT plan: identical pair set + distances to
    salt=1 (rights replicate into every left salt bucket; exact)."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    n, m = 300, 40
    left = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n)),
                "geometry": W.points_to_wkb(
                    rng.uniform(0, 1000, n), rng.uniform(0, 1000, n)
                ),
            }
        )
    ).repartition(4)
    right = ray.data.from_arrow(
        pa.table(
            {
                "rid": pa.array(np.arange(m)),
                "geometry": W.points_to_wkb(
                    rng.uniform(0, 1000, m), rng.uniform(0, 1000, m)
                ),
            }
        )
    )
    kw = dict(max_distance=150.0, res=4, left_id="pid", right_id="rid", distance_col="d")
    base = sjoin_nearest_shuffle(left, right, salt=1, **kw).to_pandas()
    salted = sjoin_nearest_shuffle(left, right, salt=4, **kw).to_pandas()
    assert set(zip(base.pid, base.rid)) == set(zip(salted.pid, salted.rid))
    a = base.sort_values(["pid", "rid"]).reset_index(drop=True)
    b = salted.sort_values(["pid", "rid"]).reset_index(drop=True)
    assert np.allclose(a.d.values, b.d.values)


def test_shuffle_nearest_general_salted_parity(rect_left_fixture):
    """salt>1 on the bounded GENERAL plan: identical pair set to salt=1."""
    from geopandas_ray.stages.nearest import sjoin_nearest_shuffle

    left, right, d2 = rect_left_fixture
    kw = dict(max_distance=60.0, res=5, left_id="zid", right_id="rid", distance_col="d")
    base = sjoin_nearest_shuffle(left, right, salt=1, **kw).to_pandas()
    salted = sjoin_nearest_shuffle(left, right, salt=3, **kw).to_pandas()
    assert set(zip(base.zid, base.rid)) == set(zip(salted.zid, salted.rid))
    assert len(base) == len(salted)


def test_how_right_swaps_sides(rng):
    """tools/sjoin.py:365 how='right': nearest LEFT per RIGHT row, right
    keys/geometry retained, suffixes swapped; parity with the manual swap."""
    n, m = 120, 30
    px, py = rng.uniform(0, 1000, n), rng.uniform(0, 1000, n)
    qx, qy = rng.uniform(0, 1000, m), rng.uniform(0, 1000, m)
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array(np.arange(n)), "v": pa.array(np.arange(n) % 7),
                  "geometry": W.points_to_wkb(px, py)})
    )
    right_t = pa.table({"rid": pa.array(np.arange(m)), "v": pa.array(np.arange(m) % 3),
                        "geometry": W.points_to_wkb(qx, qy)})
    right = ray.data.from_arrow(right_t)
    got = sjoin_nearest(left, right, how="right", distance_col="d").to_pandas()
    left_t = pa.table({"pid": pa.array(np.arange(n)), "v": pa.array(np.arange(n) % 7),
                       "geometry": W.points_to_wkb(px, py)})
    want = sjoin_nearest(right, left_t, how="left", lsuffix="right", rsuffix="left",
                         distance_col="d").to_pandas()
    # how='right' relabels the partner column index_right -> index_left
    # (it carries LEFT ids; sjoin how='right' parity)
    want = want.rename(columns={"index_right": "index_left"})
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = want[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # every right row appears (right-join semantics), keys from right
    assert set(got["rid"]) == set(range(m))
    with pytest.raises(TypeError):
        sjoin_nearest(left, right_t, how="right")
