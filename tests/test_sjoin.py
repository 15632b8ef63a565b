"""sjoin conformance: F3 micro-fixtures (reference test_sjoin.py row sets),
randomized brute-force oracle, broadcast/shuffle parity, span invariance."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.sjoin import sjoin, sjoin_shuffle


@pytest.fixture
def micro_left():
    return pa.table(
        {
            "pid": pa.array([0, 1, 2]),
            "value": pa.array([1, 2, 3]),
            "geometry": W.points_to_wkb([0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),
        }
    )


@pytest.fixture
def micro_right():
    return pa.table(
        {
            "zid": pa.array([10, 20]),
            "attr": pa.array(["A", "B"]),
            "geometry": W.boxes_to_wkb([0.0, 1.0], [0.0, 1.0], [1.0, 2.0], [1.0, 2.0]),
        }
    )


def test_micro_inner(micro_left, micro_right):
    j = sjoin(ray.data.from_arrow(micro_left), micro_right, right_index="zid").to_pandas()
    assert sorted(zip(j.pid, j.index_right)) == [(0, 10), (1, 10), (1, 20), (2, 20)]
    # left geometry kept, right's dropped
    assert "geometry" in j.columns


def test_micro_left_outer(micro_left):
    far = pa.table(
        {"zid": pa.array([9]), "geometry": W.boxes_to_wkb([50.0], [50.0], [60.0], [60.0])}
    )
    j = sjoin(ray.data.from_arrow(micro_left), far, how="left", right_index="zid").to_pandas()
    assert len(j) == 3 and j.zid.isna().all()


def test_empty_right_left_join(micro_left):
    empty = pa.table(
        {"zid": pa.array([], type=pa.int64()), "geometry": pa.array([], type=pa.large_binary())}
    )
    j = sjoin(ray.data.from_arrow(micro_left), empty, how="left", right_index="zid").to_pandas()
    assert len(j) == 3 and j.index_right.isna().all()


def test_suffix_rules(micro_left):
    right = pa.table(
        {
            "value": pa.array([7, 8]),  # collides with left's `value`
            "geometry": W.boxes_to_wkb([0.0, 1.0], [0.0, 1.0], [1.0, 2.0], [1.0, 2.0]),
        }
    )
    j = sjoin(ray.data.from_arrow(micro_left), right).to_pandas()
    assert "value_left" in j.columns and "value_right" in j.columns


def test_reserved_index_column_raises(micro_left, micro_right):
    bad = micro_left.append_column("index_right", pa.array([0, 0, 0]))
    with pytest.raises(ValueError, match="index_right"):
        sjoin(ray.data.from_arrow(bad), micro_right)


def _random_layers(rng, n_pts=400, n_zones=60):
    px = rng.uniform(0, 1000, n_pts)
    py = rng.uniform(0, 1000, n_pts)
    left = pa.table(
        {"pid": pa.array(np.arange(n_pts)), "geometry": W.points_to_wkb(px, py)}
    )
    zx = rng.uniform(0, 900, n_zones)
    zy = rng.uniform(0, 900, n_zones)
    w = rng.uniform(10, 120, n_zones)
    h = rng.uniform(10, 120, n_zones)
    right = pa.table(
        {"zid": pa.array(np.arange(n_zones)), "geometry": W.boxes_to_wkb(zx, zy, zx + w, zy + h)}
    )
    expected = set()
    for i in range(n_pts):
        for j in range(n_zones):
            if zx[j] <= px[i] <= zx[j] + w[j] and zy[j] <= py[i] <= zy[j] + h[j]:
                expected.add((i, j))
    return left, right, expected


def test_brute_force_oracle_broadcast(rng):
    left, right, expected = _random_layers(rng)
    j = sjoin(ray.data.from_arrow(left), right, right_index="zid").to_pandas()
    assert set(zip(j.pid, j.zid)) == expected
    assert len(j) == len(expected)  # no dup pairs


@pytest.mark.parametrize("salt", [1, 3])
def test_brute_force_oracle_shuffle(rng, salt):
    left, right, expected = _random_layers(rng)
    j = sjoin_shuffle(
        ray.data.from_arrow(left), ray.data.from_arrow(right), res=5, salt=salt
    ).to_pandas()
    assert set(zip(j.pid, j.zid)) == expected
    assert len(j) == len(expected)


def test_polygon_polygon_shuffle_no_dups(rng):
    n = 40
    ax = rng.uniform(0, 800, n)
    ay = rng.uniform(0, 800, n)
    a = pa.table(
        {"aid": pa.array(np.arange(n)), "geometry": W.boxes_to_wkb(ax, ay, ax + 150, ay + 150)}
    )
    bx = rng.uniform(0, 800, n)
    by = rng.uniform(0, 800, n)
    b = pa.table(
        {"bid": pa.array(np.arange(n)), "geometry": W.boxes_to_wkb(bx, by, bx + 150, by + 150)}
    )
    expected = {
        (i, j)
        for i in range(n)
        for j in range(n)
        if ax[i] <= bx[j] + 150 and ax[i] + 150 >= bx[j] and ay[i] <= by[j] + 150 and ay[i] + 150 >= by[j]
    }
    got = sjoin_shuffle(
        ray.data.from_arrow(a), ray.data.from_arrow(b), res=4
    ).to_pandas()
    assert len(got) == len(expected)
    assert set(zip(got.aid, got.bid)) == expected


def test_span_sequence_invariance(rng):
    """BASELINE input_hint: (kind, text, media_ref, offset) span sequences
    ride through the spatial join untouched."""
    n = 50
    spans_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    spans = [
        [
            {
                "kind": ["text", "image", "audio"][j % 3],
                "text": f"doc-{i}-s{j}" if j % 3 == 0 else "",
                "media_ref": f"ref://doc-{i}/{j}" if j % 3 else "",
                "offset": j,
            }
            for j in range(1 + i % 5)
        ]
        for i in range(n)
    ]
    px = rng.uniform(0, 100, n)
    py = rng.uniform(0, 100, n)
    left = pa.table(
        {
            "doc_id": pa.array(np.arange(n)),
            "spans": pa.array(spans, type=spans_type),
            "geometry": W.points_to_wkb(px, py),
        }
    )
    right = pa.table(
        {"zid": pa.array([0, 1]), "geometry": W.boxes_to_wkb([0.0, 50.0], [0.0, 0.0], [50.0, 100.0], [100.0, 100.0])}
    )
    j = sjoin(ray.data.from_arrow(left), right, how="left", right_index="zid").to_pandas()
    orig = {i: spans[i] for i in range(n)}
    for _, row in j.iterrows():
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in orig[row["doc_id"]]
        ]
        assert got == want


def test_how_right(micro_left, micro_right):
    far = pa.table(
        {
            "zid": pa.array([10, 20, 99]),
            "attr": pa.array(["A", "B", "C"]),
            "geometry": W.boxes_to_wkb([0.0, 1.0, 50.0], [0.0, 1.0, 50.0], [1.0, 2.0, 60.0], [1.0, 2.0, 60.0]),
        }
    )
    j = sjoin(ray.data.from_arrow(micro_left), far, how="right", right_index="zid").to_pandas()
    # pairs: (0,10),(1,10),(1,20),(2,20) + unmatched zone 99 -> 5 rows
    assert len(j) == 5
    unmatched = j[j.zid == 99]
    assert len(unmatched) == 1 and unmatched.pid.isna().all()
    # result keeps RIGHT geometry: zone 10's geometry is the unit box
    g = W.from_wkb(j[j.zid == 10].geometry.tolist())
    from geopandas_ray.geom import kernels as K

    assert (K.area(g) == 1.0).all()
    assert set(j[j.pid.notna()].pid) == {0, 1, 2}


def test_how_right_emits_index_left(micro_left, micro_right):
    # right join carries the LEFT partner index (tools/sjoin.py:174-190);
    # with left_index given, values come from that column
    j = sjoin(
        ray.data.from_arrow(micro_left), micro_right, how="right",
        right_index="zid", left_index="pid",
    ).to_pandas()
    assert "index_left" in j.columns and "index_right" not in j.columns
    assert "__rpos" not in j.columns
    got = sorted(zip(j.zid, j.index_left.fillna(-1).astype(int)))
    assert got == [(10, 0), (10, 1), (20, 1), (20, 2)]


def test_shuffle_dwithin_cross_cell():
    # points and boxes within distance but in DIFFERENT grid cells: the left
    # covering must be distance-dilated or these pairs silently drop
    # cell size at res=5 over [0,1000] is 31.25: point x=93.0 -> cell col 2,
    # box minx=95.0 -> cell col 3; distance 2.0 <= 5.0
    left = pa.table(
        {
            "pid": pa.array([0, 1]),
            "geometry": W.points_to_wkb([93.0, 500.0], [50.0, 500.0]),
        }
    )
    right = pa.table(
        {
            "zid": pa.array([7]),
            "geometry": W.boxes_to_wkb([95.0], [40.0], [99.0], [60.0]),
        }
    )
    j = sjoin_shuffle(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        predicate="dwithin",
        distance=5.0,
        res=5,
        domain=(0.0, 0.0, 1000.0, 1000.0),
    ).to_pandas()
    assert sorted(zip(j.pid, j.zid)) == [(0, 7)]


def test_shuffle_left_outer(micro_left):
    far = pa.table(
        {
            "zid": pa.array([10]),
            "geometry": W.boxes_to_wkb([0.0], [0.0], [1.0], [1.0]),
        }
    )
    j = sjoin_shuffle(
        ray.data.from_arrow(micro_left),
        ray.data.from_arrow(far),
        predicate="intersects",
        how="left",
        left_id="pid",
        res=4,
        domain=(0.0, 0.0, 1024.0, 1024.0),
    ).to_pandas()
    # pairs: pid 0 and 1 hit the unit box; pid 2 is unmatched -> null zid
    assert len(j) == 3
    assert sorted(j[j.zid.notna()].pid) == [0, 1]
    assert j[j.zid.isna()].pid.tolist() == [2]


def test_shuffle_right_outer(micro_left):
    far = pa.table(
        {
            "zid": pa.array([10, 99]),
            "geometry": W.boxes_to_wkb([0.0, 50.0], [0.0, 50.0], [1.0, 60.0], [1.0, 60.0]),
        }
    )
    j = sjoin_shuffle(
        ray.data.from_arrow(micro_left),
        ray.data.from_arrow(far),
        predicate="intersects",
        how="right",
        right_id="zid",
        res=4,
        domain=(0.0, 0.0, 1024.0, 1024.0),
    ).to_pandas()
    # zone 10 matches pids 0,1; zone 99 unmatched -> null pid; result keeps
    # right geometry (unit box / 50-box areas)
    assert len(j) == 3
    assert sorted(j[j.pid.notna()].pid.astype(int)) == [0, 1]
    assert j[j.pid.isna()].zid.tolist() == [99]
    from geopandas_ray.geom import kernels as K

    g = W.from_wkb(j.geometry.tolist())
    assert sorted(K.area(g).tolist()) == [1.0, 1.0, 100.0]


def test_shuffle_left_outer_matches_broadcast(rng):
    left, right, expected = _random_layers(rng)
    js = sjoin_shuffle(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        predicate="intersects",
        how="left",
        left_id="pid",
        res=4,
        domain=(0.0, 0.0, 1024.0, 1024.0),
    ).to_pandas()
    jb = sjoin(ray.data.from_arrow(left), right, how="left", right_index="zid").to_pandas()
    a = sorted(zip(js.pid, js.zid.fillna(-1).astype(int)))
    b = sorted(zip(jb.pid, jb.zid.fillna(-1).astype(int)))
    assert a == b


def test_sjoin_shuffle_left_anti_join_fallback():
    """Force the key-partitioned anti-join path (unmatched_broadcast_cap=0)
    and check it matches the broadcast-pad path."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from geopandas_ray.geom.wkb import boxes_to_wkb, points_to_wkb
    from geopandas_ray.stages.sjoin import sjoin_shuffle

    rng = np.random.RandomState(3)
    n = 400
    px, py = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    pts_t = pa.table({"pid": pa.array(np.arange(n)), "geometry": points_to_wkb(px, py)})
    zones_t = pa.table(
        {"zid": pa.array([0, 1]), "geometry": boxes_to_wkb([0.0, 50.0], [0.0, 0.0], [30.0, 80.0], [30.0, 30.0])}
    )

    def run(cap):
        pts = ray.data.from_arrow(pts_t).repartition(8)
        zones = ray.data.from_arrow(zones_t)
        out = sjoin_shuffle(
            pts, zones, predicate="intersects", res=3, how="left", left_id="pid",
            unmatched_broadcast_cap=cap,
        ).to_pandas()
        return out.sort_values(["pid", "zid"], na_position="last").reset_index(drop=True)

    a = run(10_000_000)  # broadcast pad
    b = run(0)  # anti-join fallback
    assert len(a) == len(b) and len(a) >= n
    assert a["pid"].tolist() == b["pid"].tolist()
    assert a["zid"].fillna(-1).tolist() == b["zid"].fillna(-1).tolist()


# --- covering fast path (interior-cell rule, classify_rect_pairs) ----------


def _l_zone_layers(rng, n_pts=500, n_zones=30):
    """Concave L zones big enough that res-5/6 cells fall WHOLLY INSIDE
    (kind 2), cross the boundary (kind 1) and miss entirely while the bbox
    still covers them (kind 0 - the notch quadrant). Brute-force point
    membership from the two-rect decomposition + 6 boundary segments."""
    from geopandas_ray.geom.wkt import from_wkt
    from geopandas_ray.geom.wkb import to_wkb

    px = rng.uniform(0, 1000, n_pts)
    py = rng.uniform(0, 1000, n_pts)
    # snap half the points to the integer lattice so boundary hits
    # (touches pairs) actually occur against the integer-coordinate zones
    px[::2] = np.floor(px[::2])
    py[::2] = np.floor(py[::2])
    left = pa.table(
        {"pid": pa.array(np.arange(n_pts)), "geometry": W.points_to_wkb(px, py)}
    )
    zx = np.floor(rng.uniform(0, 700, n_zones))
    zy = np.floor(rng.uniform(0, 700, n_zones))
    w = np.floor(rng.uniform(100, 300, n_zones))
    h = np.floor(rng.uniform(100, 300, n_zones))
    cutx, cuty = zx + np.floor(w / 2), zy + np.floor(h / 2)
    wkts = [
        f"POLYGON (({zx[j]} {zy[j]}, {zx[j]+w[j]} {zy[j]}, {zx[j]+w[j]} {cuty[j]}, "
        f"{cutx[j]} {cuty[j]}, {cutx[j]} {zy[j]+h[j]}, {zx[j]} {zy[j]+h[j]}, {zx[j]} {zy[j]}))"
        for j in range(n_zones)
    ]
    right = pa.table(
        {"zid": pa.array(np.arange(n_zones)), "geometry": to_wkb(from_wkt(wkts))}
    )
    inter, within, touches = set(), set(), set()
    for j in range(n_zones):
        in_r1 = (px >= zx[j]) & (px <= zx[j] + w[j]) & (py >= zy[j]) & (py <= cuty[j])
        in_r2 = (px >= zx[j]) & (px <= cutx[j]) & (py >= cuty[j]) & (py <= zy[j] + h[j])
        closed = in_r1 | in_r2
        vs = [
            (zx[j], zy[j]), (zx[j] + w[j], zy[j]), (zx[j] + w[j], cuty[j]),
            (cutx[j], cuty[j]), (cutx[j], zy[j] + h[j]), (zx[j], zy[j] + h[j]),
            (zx[j], zy[j]),
        ]
        on_b = np.zeros(n_pts, dtype=bool)
        for (x0, y0), (x1, y1) in zip(vs[:-1], vs[1:]):
            if x0 == x1:
                lo, hi = min(y0, y1), max(y0, y1)
                on_b |= (px == x0) & (py >= lo) & (py <= hi)
            else:
                lo, hi = min(x0, x1), max(x0, x1)
                on_b |= (py == y0) & (px >= lo) & (px <= hi)
        for i in np.nonzero(closed)[0]:
            inter.add((i, j))
            (touches if on_b[i] else within).add((i, j))
    return left, right, {"intersects": inter, "within": within, "touches": touches}


@pytest.mark.parametrize("predicate", ["intersects", "within", "touches"])
@pytest.mark.parametrize("res", [5, 6])
def test_covering_fast_path_concave_oracle(rng, predicate, res):
    left, right, expected = _l_zone_layers(rng)
    j = sjoin_shuffle(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        predicate=predicate, res=res,
    ).to_pandas()
    assert set(zip(j.pid, j.zid)) == expected[predicate]
    assert len(j) == len(expected[predicate])  # no dup pairs


def test_covering_fast_path_point_contains_empty(rng):
    # left point contains right polygon: interior cells must NOT fast-pair
    left, right, _ = _l_zone_layers(rng, n_pts=200, n_zones=10)
    n = sjoin_shuffle(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        predicate="contains", res=5,
    ).count()
    assert n == 0


def test_sjoin_shuffle_auto_salt_matches_unsalted():
    """salt='auto' must return the identical pair set as salt=1 on a skewed
    corpus (one mega-hot cell)."""
    import numpy as np

    from geopandas_ray.geom import wkb as W
    from geopandas_ray.stages.sjoin import sjoin_shuffle

    rng = np.random.default_rng(11)
    n = 40_000
    # 60% of points inside one 8x8 "city" cell region, rest uniform
    hot = rng.integers(0, 2, n).astype(bool)
    hot[: int(n * 0.6)] = True
    px = np.where(hot[:n], rng.uniform(0, 8, n), rng.uniform(0, 1024, n))
    py = np.where(hot[:n], rng.uniform(0, 8, n), rng.uniform(0, 1024, n))
    pts = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n, dtype=np.int64)),
                "geometry": W.points_to_wkb(px, py),
            }
        )
    )
    m = 200
    zx = rng.uniform(0, 1000, m)
    zy = rng.uniform(0, 1000, m)
    zones = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array(np.arange(m, dtype=np.int64)),
                "geometry": W.boxes_to_wkb(zx, zy, zx + 24, zy + 24),
            }
        )
    )
    base = (
        sjoin_shuffle(pts, zones, predicate="intersects", res=5, salt=1)
        .to_pandas()[["pid", "zid"]]
    )
    auto = (
        sjoin_shuffle(
            pts, zones, predicate="intersects", res=5, salt="auto"
        ).to_pandas()[["pid", "zid"]]
    )
    a = set(map(tuple, base.to_numpy()))
    b = set(map(tuple, auto.to_numpy()))
    assert a == b and len(a) > 0


def test_shuffle_left_anti_join_plan_executes_once(rng):
    """r3 VERDICT defect #1: the how='left' flags plan (tag+union+groupby)
    was consumed lazily by count() AND the row pull, re-executing the whole
    exchange. Probe: tag_left reports every batch's rows through a counter
    actor; a single execution tags exactly len(left) rows total."""
    import ray as _ray
    from geopandas_ray.stages import sjoin as sj

    @_ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def incr(self, k):
            self.n += k

        def get(self):
            return self.n

    left, right, _ = _random_layers(rng, n_pts=300, n_zones=10)
    c = Counter.remote()
    sj._ANTI_JOIN_PROBE = c
    try:
        out = sjoin_shuffle(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            predicate="intersects",
            how="left",
            left_id="pid",
            res=4,
            domain=(0.0, 0.0, 1024.0, 1024.0),
        ).to_pandas()
    finally:
        sj._ANTI_JOIN_PROBE = None
    assert len(out) >= 300
    assert _ray.get(c.get.remote()) == 300  # 600 == double-executed plan


def test_broadcast_sjoin_pandas_block_right(micro_left, micro_right):
    """_materialize must accept a right side whose blocks are PANDAS (e.g.
    from filter(expr=)) - the to_arrow_refs() pitfall (r3 VERDICT item #9)."""
    right = ray.data.from_arrow(micro_right).filter(expr="zid >= 10")
    j = sjoin(
        ray.data.from_arrow(micro_left), right, right_index="zid"
    ).to_pandas()
    assert sorted(j.zid.astype(int)) == [10, 10, 20, 20]


def test_shuffle_matches_broadcast_remaining_predicates(rng):
    """crosses / overlaps / geom_equals on the cell-partitioned path must
    produce the same pair set as the broadcast path (cross-cell dedup and
    candidate generation are predicate-independent; this pins it)."""
    import pyarrow as pa

    from geopandas_ray.geom import wkb as W
    from geopandas_ray.stages.sjoin import sjoin, sjoin_shuffle

    n, m = 120, 80
    lx = rng.uniform(0, 200, n)
    ly = rng.uniform(0, 200, n)
    left = ray.data.from_arrow(
        pa.table(
            {
                "lid": pa.array(np.arange(n)),
                "geometry": W.boxes_to_wkb(lx, ly, lx + rng.uniform(5, 30, n), ly + rng.uniform(5, 30, n)),
            }
        )
    )
    rx = rng.uniform(0, 200, m)
    ry = rng.uniform(0, 200, m)
    rt = pa.table(
        {
            "rid": pa.array(np.arange(m)),
            "geometry": W.boxes_to_wkb(rx, ry, rx + rng.uniform(5, 30, m), ry + rng.uniform(5, 30, m)),
        }
    )
    # force a few exact duplicates for geom_equals coverage
    rt = pa.concat_tables([rt, pa.table({"rid": pa.array(np.arange(m, m + 5)),
                                         "geometry": W.boxes_to_wkb(lx[:5], ly[:5], lx[:5] + 7, ly[:5] + 7)})])
    left2 = ray.data.from_arrow(
        pa.table({"lid": pa.array(np.arange(n, n + 5)),
                  "geometry": W.boxes_to_wkb(lx[:5], ly[:5], lx[:5] + 7, ly[:5] + 7)})
    ).union(left)
    for pred in ("overlaps", "geom_equals", "crosses"):
        b = sjoin(left2, rt, predicate=pred).to_pandas()
        s = sjoin_shuffle(left2, ray.data.from_arrow(rt), predicate=pred, res=4,
                          domain=(0.0, 0.0, 256.0, 256.0)).to_pandas()
        if len(b) == 0 or len(s) == 0:
            # empty results come back schemaless (Ray pitfall); axis-aligned
            # rects can never cross, so both sides must be empty together
            assert len(b) == len(s) == 0, pred
            continue
        bp = sorted(map(tuple, b[["lid", "rid"]].values.tolist()))
        sp = sorted(map(tuple, s[["lid", "rid"]].values.tolist()))
        assert bp == sp, pred


def test_shuffle_on_attribute_matches_broadcast_left(rng):
    """on_attribute on the shuffle plan: inner parity AND how='left' pad
    parity (unmatched rows keep THEIR attribute value, unsuffixed)."""
    import pyarrow as pa

    from geopandas_ray.geom import wkb as W
    from geopandas_ray.stages.sjoin import sjoin, sjoin_shuffle

    n, m = 80, 15
    px, py = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    left = ray.data.from_arrow(
        pa.table({"pid": pa.array(np.arange(n)), "grp": pa.array(np.arange(n) % 3),
                  "geometry": W.points_to_wkb(px, py)})
    )
    zx, zy = rng.uniform(0, 100, m), rng.uniform(0, 100, m)
    rt = pa.table({"zid": pa.array(np.arange(m)), "grp": pa.array(np.arange(m) % 3),
                   "geometry": W.boxes_to_wkb(zx, zy, zx + 25, zy + 25)})
    for how in ("inner", "left"):
        b = sjoin(left, rt, how=how, predicate="within", on_attribute="grp").to_pandas()
        s = sjoin_shuffle(left, ray.data.from_arrow(rt), how=how, predicate="within",
                          on_attribute="grp", res=4, domain=(0.0, 0.0, 128.0, 128.0),
                          left_id="pid").to_pandas()
        cols = ["pid", "grp"] + (["zid"] if how == "inner" else [])
        bp = b[cols].fillna(-1).sort_values(cols).reset_index(drop=True)
        sp = s[cols].fillna(-1).sort_values(cols).reset_index(drop=True)
        assert bp.equals(sp), how
        if how == "left":
            # unmatched rows keep their grp value
            assert s["grp"].notna().all()
