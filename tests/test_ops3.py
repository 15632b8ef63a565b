"""Round-2 unary gap-fill + binary additions (VERDICT r1 item 7)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.clip import _parts_to_wkb
from geopandas_ray.stages import ops3
from geopandas_ray.stages.binary import (
    binary_frechet,
    binary_geom_equals_exact,
    binary_predicate,
    binary_snap,
)
from geopandas_ray.stages.dissolve import intersection_all
from geopandas_ray.stages.ops import rotate, skew
from geopandas_ray.stages.ops2 import with_is_valid


def ring(*xy):
    return np.array(list(xy) + [xy[0]], dtype=float)


HOLEY = _parts_to_wkb(
    [(W.POLYGON, [ring((0, 0), (10, 0), (10, 10), (0, 10)), ring((2, 2), (4, 2), (4, 4), (2, 4))])]
)
SQUARE = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (1, 0), (1, 1), (0, 1))])])
BOWTIE = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (1, 1), (1, 0), (0, 1))])])


def ds_of(wkbs, **extra):
    cols = {"id": pa.array(list(range(len(wkbs)))), **extra}
    cols["geometry"] = pa.array(wkbs, type=pa.large_binary())
    return ray.data.from_arrow(pa.table(cols))


def test_exterior_interiors_counts():
    d = ds_of([HOLEY, SQUARE, None])
    out = ops3.with_exterior(d, out="ext").to_pandas().sort_values("id")
    ge = W.from_wkb([v for v in out.ext[:2]])
    assert K.length(ge).tolist() == [40.0, 4.0]
    assert out.ext.iloc[2] is None

    out = ops3.with_interiors(d, out="ints").to_pandas().sort_values("id")
    gi = W.from_wkb([out.ints.iloc[0]])
    assert K.length(gi)[0] == 8.0  # 2x2 hole perimeter
    out = ops3.with_count_interior_rings(d).to_pandas().sort_values("id")
    assert out.count_interior_rings.tolist() == [1, 0, 0]


def test_extract_unique_points():
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [1, 1], [0, 0], [2, 2]])])])
    out = ops3.extract_unique_points(ds_of([line]), out="up").to_pandas()
    g = W.from_wkb([out.up.iloc[0]])
    px, py = K._row_points(g, 0)
    assert list(zip(px, py)) == [(0, 0), (1, 1), (2, 2)]


def test_is_valid_reason_and_bowtie():
    d = ds_of([SQUARE, BOWTIE, None])
    out = ops3.with_is_valid_reason(d).to_pandas().sort_values("id")
    assert out.is_valid_reason.tolist()[:2] == ["Valid Geometry", "Ring Self-intersection"]
    assert out.is_valid_reason.iloc[2] is None
    v = with_is_valid(d).to_pandas().sort_values("id")
    assert v.is_valid.tolist() == [True, False, False]


def test_minimum_clearance():
    out = ops3.with_minimum_clearance(ds_of([SQUARE])).to_pandas()
    assert out.minimum_clearance.iloc[0] == 1.0


def test_z_and_force_3d():
    pts = W.points_to_wkb([1.0, 2.0], [3.0, 4.0])
    d = ds_of([pts[0].as_py(), pts[1].as_py()])
    z0 = ops3.with_z(d).to_pandas().sort_values("id")
    assert np.isnan(z0.z).all()
    d3 = ops3.force_3d(d, z=7.5)
    z1 = ops3.with_z(d3).to_pandas().sort_values("id")
    assert z1.z.tolist() == [7.5, 7.5]
    # force_2d roundtrip: decoding drops z, x/y survive
    g = W.from_wkb([r["geometry"] for r in d3.take_all()])
    px, py = K._row_points(g, 0)
    assert (px[0], py[0]) in {(1.0, 3.0), (2.0, 4.0)}


def test_isna_fillna_dropna():
    d = ds_of([SQUARE, None])
    assert ops3.geom_isna(d).to_pandas().sort_values("id")["isna"].tolist() == [False, True]
    assert ops3.geom_notna(d).to_pandas().sort_values("id")["notna"].tolist() == [True, False]
    filled = ops3.geom_fillna(d).to_pandas()
    assert filled.geometry.notna().all()
    g = W.from_wkb(filled.sort_values("id").geometry.tolist())
    assert bool(g.is_empty[1]) and not bool(g.is_empty[0])
    assert ops3.geom_dropna(d).count() == 1


def test_transform_and_rotate_skew():
    pts = W.points_to_wkb([1.0], [2.0])
    d = ds_of([pts[0].as_py()])
    t = ops3.transform_coords(d, lambda c: c * 2.0).to_pandas()
    g = W.from_wkb(t.geometry.tolist())
    assert K._row_points(g, 0) == (2.0, 4.0) or tuple(
        np.concatenate(K._row_points(g, 0))
    ) == (2.0, 4.0)
    r = rotate(d, 90.0).to_pandas()
    g = W.from_wkb(r.geometry.tolist())
    px, py = K._row_points(g, 0)
    assert abs(px[0] - (-2.0)) < 1e-12 and abs(py[0] - 1.0) < 1e-12
    s = skew(d, xs=45.0).to_pandas()
    g = W.from_wkb(s.geometry.tolist())
    px, py = K._row_points(g, 0)
    assert abs(px[0] - 3.0) < 1e-12 and py[0] == 2.0


def test_geom_equals_predicate():
    sq2 = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (1, 0), (1, 1), (0, 1))[::-1]])])
    other = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (2, 0), (2, 2), (0, 2))])])
    d = ds_of([SQUARE, SQUARE], other=pa.array([sq2, other], type=pa.large_binary()))
    out = binary_predicate(d, "geom_equals", "other").to_pandas().sort_values("id")
    assert out.geom_equals.tolist() == [True, False]
    # point case
    p = W.points_to_wkb([5.0, 5.0], [5.0, 6.0])
    d2 = ds_of(
        [p[0].as_py(), p[0].as_py()],
        other=pa.array([p[0].as_py(), p[1].as_py()], type=pa.large_binary()),
    )
    out = binary_predicate(d2, "geom_equals", "other").to_pandas().sort_values("id")
    assert out.geom_equals.tolist() == [True, False]


def test_geom_equals_exact_and_frechet_and_snap():
    l1 = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [1, 0], [2, 0]])])])
    l2 = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0.05], [1, 0.05], [2, 0.05]])])])
    d = ds_of([l1], other=pa.array([l2], type=pa.large_binary()))
    assert binary_geom_equals_exact(d, "other", tolerance=0.1).to_pandas().geom_equals_exact.iloc[0]
    assert not binary_geom_equals_exact(d, "other", tolerance=0.01).to_pandas().geom_equals_exact.iloc[0]
    f = binary_frechet(d, "other").to_pandas()
    assert abs(f.frechet_distance.iloc[0] - 0.05) < 1e-12
    snapped = binary_snap(d, "other", tolerance=0.2).to_pandas()
    g = W.from_wkb(snapped.geometry.tolist())
    px, py = K._row_points(g, 0)
    assert (py == 0.05).all()


def test_intersection_all_rects():
    boxes = W.boxes_to_wkb([0.0, 2.0, 1.0], [0.0, 2.0, 1.0], [10.0, 8.0, 9.0], [10.0, 8.0, 9.0])
    d = ds_of([boxes[i].as_py() for i in range(3)])
    w = intersection_all(d)
    g = W.from_wkb([w])
    assert K.bounds(g)[0].tolist() == [2.0, 2.0, 8.0, 8.0]
    # disjoint -> empty
    boxes2 = W.boxes_to_wkb([0.0, 5.0], [0.0, 5.0], [1.0, 6.0], [1.0, 6.0])
    w2 = intersection_all(ds_of([boxes2[i].as_py() for i in range(2)]))
    assert bool(W.from_wkb([w2]).is_empty[0])


def test_feather_roundtrip(tmp_path):
    from geopandas_ray.sources.feather import feather_geo_metadata, read_feather, write_feather

    d = ds_of([SQUARE, HOLEY])
    paths = write_feather(d, str(tmp_path / "out"), crs="EPSG:3857")
    assert paths
    back = read_feather(str(tmp_path / "out")).to_pandas().sort_values("id")
    assert len(back) == 2 and back.geometry.notna().all()
    meta = feather_geo_metadata(paths[0])
    assert meta["primary_column"] == "geometry" and meta["columns"]["geometry"]["crs"] == "EPSG:3857"


def test_concave_hull():
    # two dense clusters joined by a long gap: ratio=1 -> convex hull area,
    # small ratio -> tighter hull with smaller area
    rng = np.random.default_rng(7)
    a = rng.uniform(0, 10, size=(40, 2))
    b = rng.uniform(0, 10, size=(40, 2)) + np.array([40.0, 0.0])
    pts = np.vstack([a, b])
    mp = _parts_to_wkb([(W.POINT, [pts[k : k + 1]]) for k in range(len(pts))])
    d = ds_of([mp])
    convex = ops3.with_concave_hull(d, ratio=1.0, out="h").to_pandas()
    tight = ops3.with_concave_hull(d, ratio=0.1, out="h").to_pandas()
    ga = K.area(W.from_wkb(convex.h.tolist()))[0]
    gt = K.area(W.from_wkb(tight.h.tolist()))[0]
    assert gt < ga
    assert gt > 0


def test_polygonize_and_build_area():
    # square boundary split into 4 separate edges -> one polygon
    edges = _parts_to_wkb(
        [
            (W.LINESTRING, [np.array([[0.0, 0], [4, 0]])]),
            (W.LINESTRING, [np.array([[4.0, 0], [4, 4]])]),
            (W.LINESTRING, [np.array([[4.0, 4], [0, 4]])]),
            (W.LINESTRING, [np.array([[0.0, 4], [0, 0]])]),
        ]
    )
    out = ops3.polygonize(ds_of([edges]), out="p").to_pandas()
    g = W.from_wkb(out.p.tolist())
    assert K.area(g)[0] == 16.0
    # build_area: outer + inner ring -> polygon with hole
    both = _parts_to_wkb(
        [
            (W.LINESTRING, [ring((0, 0), (10, 0), (10, 10), (0, 10))]),
            (W.LINESTRING, [ring((3, 3), (6, 3), (6, 6), (3, 6))]),
        ]
    )
    out = ops3.build_area(ds_of([both]), out="p").to_pandas()
    g = W.from_wkb(out.p.tolist())
    assert K.area(g)[0] == 100.0 - 9.0


def test_offset_curve():
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [10, 0]])])])
    d = ds_of([line])
    left = ops3.offset_curve(d, 2.0).to_pandas()
    g = W.from_wkb(left.geometry.tolist())
    c = g.ring_coords(0)
    assert np.allclose(c, [[0, 2], [10, 2]])
    right = ops3.offset_curve(d, -2.0).to_pandas()
    g = W.from_wkb(right.geometry.tolist())
    assert np.allclose(g.ring_coords(0), [[0, -2], [10, -2]])
    # right-angle path with left offset gains an arc at the convex turn
    bend = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [10, 0], [10, -10]])])])
    out = ops3.offset_curve(ds_of([bend]), 2.0).to_pandas()
    g = W.from_wkb(out.geometry.tolist())
    c = g.ring_coords(0)
    assert len(c) > 4  # arc points inserted
    assert np.allclose(c[0], [0, 2]) and np.allclose(c[-1], [12, -10])


def test_shared_paths():
    from geopandas_ray.stages.binary import binary_shared_paths

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    # a: horizontal 0..10; b overlaps 2..6 forward and 7..9 reversed
    a = line((0, 0), (10, 0))
    b_fwd = line((2, 0), (6, 0))
    b_rev = line((9, 0), (7, 0))
    b_off = line((0, 1), (10, 1))  # parallel, not collinear
    b_cross = line((5, -1), (5, 1))  # crosses at a point: no shared path
    d = ds_of([a, a, a, a], other=pa.array(
        [b_fwd, b_rev, b_off, b_cross],
        type=pa.large_binary(),
    ))
    out = binary_shared_paths(d, "other", out="sp").to_pandas().sort_values("id")

    def decode(v):
        g = W.from_wkb([v])
        # GC(MLS same, MLS opp): parts are linestrings; direction split is
        # validated by total length per class via re-parsing the raw WKB
        import struct

        assert struct.unpack_from("<BI", v, 0) == (1, 7)
        return g

    g0 = decode(out.sp.iloc[0])
    assert K.length(g0)[0] == 4.0  # same-direction overlap 2..6
    g1 = decode(out.sp.iloc[1])
    assert K.length(g1)[0] == 2.0  # opposite overlap 7..9
    g2 = decode(out.sp.iloc[2])
    assert K.length(g2)[0] == 0.0
    g3 = decode(out.sp.iloc[3])
    assert K.length(g3)[0] == 0.0


def test_shared_paths_merges_stacked_partners():
    from geopandas_ray.stages.binary import binary_shared_paths

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    a = line((0, 0), (10, 0))
    # two overlapping forward partner segments 1..5 and 3..8 -> merged 1..8
    b = _parts_to_wkb([
        (W.LINESTRING, [np.array([[1.0, 0], [5, 0]])]),
        (W.LINESTRING, [np.array([[3.0, 0], [8, 0]])]),
    ])
    d = ds_of([a], other=pa.array([b], type=pa.large_binary()))
    out = binary_shared_paths(d, "other", out="sp").to_pandas()
    g = W.from_wkb([out.sp.iloc[0]])
    assert K.length(g)[0] == 7.0


def test_is_valid_structure_classes():
    from geopandas_ray.stages.ops3 import with_is_valid_reason

    def poly(*rings):
        return _parts_to_wkb([(W.POLYGON, [np.array(list(r) + [r[0]], dtype=float) for r in rings])])

    shell = [(0, 0), (10, 0), (10, 10), (0, 10)]
    ok_hole = poly(shell, [(2, 2), (2, 4), (4, 4), (4, 2)])
    hole_outside = poly(shell, [(20, 20), (20, 22), (22, 22), (22, 20)])
    nested_holes = poly(shell, [(1, 1), (1, 8), (8, 8), (8, 1)], [(2, 2), (2, 3), (3, 3), (3, 2)])
    nested_shells = _parts_to_wkb([
        (W.POLYGON, [np.array(shell + [shell[0]], dtype=float)]),
        (W.POLYGON, [np.array([[2.0, 2], [4, 2], [4, 4], [2, 4], [2, 2]])]),
    ])
    d = ds_of([ok_hole, hole_outside, nested_holes, nested_shells])
    out = with_is_valid_reason(d, out="r").to_pandas().sort_values("id")
    assert out.r.tolist() == [
        "Valid Geometry",
        "Hole lies outside shell",
        "Holes are nested",
        "Nested shells",
    ]
    v = with_is_valid(d, out="v").to_pandas().sort_values("id")
    assert v.v.tolist() == [True, False, False, False]


def test_relate_general_polygons():
    from geopandas_ray.stages.binary import binary_relate

    def poly(*pts):
        return _parts_to_wkb([(W.POLYGON, [np.array(list(pts) + [pts[0]], dtype=float)])])

    L1 = poly((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4))  # concave L
    L2 = poly((1, 1), (5, 1), (5, 3), (3, 3), (3, 5), (1, 5))  # shifted L, overlaps
    inner = poly((1, 1), (1.5, 1), (1.5, 1.5), (1, 1.5))  # strictly inside L1
    adj = poly((4, 0), (6, 0), (6, 2), (4, 2))  # shares L1's right edge
    same = poly((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4))
    far = poly((50, 50), (51, 50), (51, 51), (50, 51))
    lefts = [L1, L1, L1, L1, L1]
    rights = [L2, inner, adj, same, far]
    d = ds_of(lefts, other=pa.array(rights, type=pa.large_binary()))
    r = binary_relate(d, "other", out="rel").to_pandas().sort_values("id")
    assert r.rel.tolist() == [
        "212101212",  # proper concave overlap
        "212FF1FF2",  # inner strictly within L1 (L1 contains)
        "FF2F11212",  # edge-touching neighbors
        "2FFF1FFF2",  # identical
        "FF2FF1212",  # disjoint
    ]


def test_relate_point_general_polygon():
    from geopandas_ray.stages.binary import binary_relate

    L1 = _parts_to_wkb(
        [(W.POLYGON, [np.array([[0.0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4], [0, 0]])])]
    )
    pts = W.points_to_wkb([1.0, 2.0, 3.0], [1.0, 3.0, 3.0])  # inside, on notch edge, outside
    d = ds_of(
        [pts[0].as_py(), pts[1].as_py(), pts[2].as_py()],
        other=pa.array([L1, L1, L1], type=pa.large_binary()),
    )
    r = binary_relate(d, "other", out="rel").to_pandas().sort_values("id")
    assert r.rel.tolist() == ["0FFFFF212", "F0FFFF212", "FF0FFF212"]


def test_hausdorff_densify():
    from geopandas_ray.stages.binary import binary_hausdorff

    seg = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [10, 0]])])])
    ends = _parts_to_wkb([
        (W.POINT, [np.array([[0.0, 0]])]),
        (W.POINT, [np.array([[10.0, 0]])]),
    ])
    d = ds_of([seg], other=pa.array([ends], type=pa.large_binary()))
    # discrete (vertex-restricted): 0; densified: midpoint 5 away
    h0 = binary_hausdorff(d, "other").to_pandas().hausdorff_distance.iloc[0]
    h1 = binary_hausdorff(d, "other", densify=0.001).to_pandas().hausdorff_distance.iloc[0]
    assert h0 == 0.0 and abs(h1 - 5.0) < 0.01


def test_relate_lineal_families():
    from geopandas_ray.stages.binary import binary_relate

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    sq = _parts_to_wkb(
        [(W.POLYGON, [np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])])]
    )
    cross_a = line((0, 0), (10, 10))
    cross_b = line((0, 10), (10, 0))
    touch_a = line((0, 0), (5, 0))
    touch_b = line((5, 0), (10, 0))
    over_a = line((0, 0), (10, 0))
    over_b = line((5, 0), (15, 0))
    through = line((-5, 5), (15, 5))
    pt_mid = W.points_to_wkb([5.0], [5.0])[0].as_py()  # interior of cross_a
    lefts = [cross_a, touch_a, over_a, through, pt_mid]
    rights = [cross_b, touch_b, over_b, sq, cross_a]
    d = ds_of(lefts, other=pa.array(rights, type=pa.large_binary()))
    r = binary_relate(d, "other", out="rel").to_pandas().sort_values("id")
    assert r.rel.tolist() == [
        "0F1FF0102",  # proper crossing
        "FF1F00102",  # endpoint-to-endpoint touch
        "1010F0102",  # collinear partial overlap
        "101FF0212",  # line passing through polygon
        "0FFFFF102",  # point on line interior
    ]


def test_binary_symmetric_difference():
    from geopandas_ray.stages.binary import binary_symmetric_difference

    sq1 = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (4, 0), (4, 4), (0, 4))])])
    sq2 = _parts_to_wkb([(W.POLYGON, [ring((2, 0), (6, 0), (6, 4), (2, 4))])])
    pts1 = _parts_to_wkb([(W.POINT, [np.array([[0.0, 0]])]), (W.POINT, [np.array([[1.0, 1]])])])
    pts2 = _parts_to_wkb([(W.POINT, [np.array([[1.0, 1]])]), (W.POINT, [np.array([[2.0, 2]])])])
    d = ds_of([sq1, pts1, sq1, None], other=pa.array([sq2, pts2, None, sq2], type=pa.large_binary()))
    out = binary_symmetric_difference(d, "other", out="sd").to_pandas().sort_values("id")
    g = W.from_wkb([out.sd.iloc[0]])
    assert K.area(g)[0] == 16.0  # two 2x4 slivers
    g1 = W.from_wkb([out.sd.iloc[1]])
    px, py = K._row_points(g1, 0)
    assert sorted(zip(px, py)) == [(0.0, 0.0), (2.0, 2.0)]
    # missing side passes the other through
    assert out.sd.iloc[2] == sq1 and out.sd.iloc[3] == sq2


# --- full noding validity (ring simplicity + cross-ring analysis) ----------


def _poly(*rings_):
    return _parts_to_wkb([(W.POLYGON, list(rings_))])


def _multipoly(*polys):
    return _parts_to_wkb([(W.POLYGON, list(rings_)) for rings_ in polys])


def test_is_valid_noding_ring_classes():
    cases = [
        # (wkb, expected_reason)  - GEOS-canonical fixtures
        (_poly(ring((0, 0), (10, 0), (5, 5), (10, 10), (0, 10), (5, 5))),
         "Ring Self-intersection"),  # vertex revisit (figure-8 pinch)
        (_poly(ring((0, 0), (4, 0), (4, 4), (2, 0), (0, 4))),
         "Ring Self-intersection"),  # T-touch: vertex on non-adjacent edge
        (_poly(ring((0, 0), (4, 0), (6, 0), (4, 0), (4, 4), (0, 4))),
         "Ring Self-intersection"),  # spike (adjacent collinear overlap)
        (_poly(ring((0, 0), (4, 0), (4, 0), (4, 4), (0, 4))),
         "Valid Geometry"),  # repeated vertex is VALID in GEOS
        (_poly(ring((0, 0), (1, 1), (1, 0), (0, 1))),
         "Ring Self-intersection"),  # proper bowtie cross
    ]
    d = ds_of([w for w, _ in cases])
    out = ops3.with_is_valid_reason(d).to_pandas().sort_values("id")
    assert out.is_valid_reason.tolist() == [r for _, r in cases]
    v = with_is_valid(d).to_pandas().sort_values("id")
    assert v.is_valid.tolist() == [r == "Valid Geometry" for _, r in cases]


def test_is_valid_noding_cross_ring_classes():
    shell4 = ring((0, 0), (4, 0), (4, 4), (0, 4))
    shell6 = ring((0, 0), (6, 0), (6, 6), (0, 6))
    cases = [
        # hole crosses shell edge properly
        (_poly(shell4, ring((2, 2), (6, 2), (6, 3), (2, 3))), "Self-intersection"),
        # hole shares a collinear stretch with the shell
        (_poly(shell4, ring((0, 1), (2, 1), (2, 2), (0, 2))), "Self-intersection"),
        # hole touches shell at ONE point: valid
        (_poly(shell4, ring((1, 1), (2, 0), (3, 1), (2, 2))), "Valid Geometry"),
        # hole touches shell at TWO points: pinches interior
        (_poly(shell4, ring((0, 2), (2, 1), (4, 2), (2, 3))), "Interior is disconnected"),
        # two holes crossing each other
        (_poly(shell6, ring((1, 1), (3, 1), (3, 3), (1, 3)), ring((2, 2), (4, 2), (4, 4), (2, 4))),
         "Self-intersection"),
        # chain: shell-A, A-B, B-shell single-point touches close a cycle
        (_poly(shell6, ring((0, 3), (2, 2), (3, 3)), ring((3, 3), (4, 2), (6, 3))),
         "Interior is disconnected"),
        # tree: A touches shell, C touches only A - interior stays connected
        (_poly(shell6, ring((0, 3), (2, 2), (3, 3)), ring((3, 3), (4, 3.5), (4, 2.5))),
         "Valid Geometry"),
    ]
    d = ds_of([w for w, _ in cases])
    out = ops3.with_is_valid_reason(d).to_pandas().sort_values("id")
    assert out.is_valid_reason.tolist() == [r for _, r in cases]
    v = with_is_valid(d).to_pandas().sort_values("id")
    assert v.is_valid.tolist() == [r == "Valid Geometry" for _, r in cases]


def test_is_valid_noding_multipolygon_parts():
    a = ring((0, 0), (2, 0), (2, 2), (0, 2))
    b_touch = ring((2, 2), (4, 2), (4, 4), (2, 4))   # corner touch: valid
    b_cross = ring((1, 1), (3, 1), (3, 3), (1, 3))   # overlapping part
    b_edge = ring((2, 0), (4, 0), (4, 2), (2, 2))    # full shared edge
    d = ds_of([
        _multipoly([a], [b_touch]),
        _multipoly([a], [b_cross]),
        _multipoly([a], [b_edge]),
    ])
    out = ops3.with_is_valid_reason(d).to_pandas().sort_values("id")
    assert out.is_valid_reason.tolist() == [
        "Valid Geometry", "Self-intersection", "Self-intersection"
    ]


def test_pandas_layer_aliases_and_column_management():
    t = pa.table(
        {
            "id": pa.array([0, 1]),
            "geometry": pa.array([SQUARE, None], type=pa.large_binary()),
            "alt": pa.array([SQUARE, SQUARE], type=pa.large_binary()),
        }
    )
    d = ray.data.from_arrow(t)
    out = ops3.geom_isnull(ops3.geom_notnull(d)).to_pandas().sort_values("id")
    assert out["isnull"].tolist() == [False, True]
    assert out["notnull"].tolist() == [True, False]
    r = ops3.rename_geometry(d, "geom").to_pandas()
    assert "geom" in r.columns and "geometry" not in r.columns
    s = ops3.set_geometry(d, "alt", drop_old=True).to_pandas().sort_values("id")
    assert "alt" not in s.columns
    assert s.geometry.notna().all()  # alt copied over the null geometry


def test_geom_almost_equals_alias():
    from geopandas_ray.stages.binary import binary_geom_almost_equals

    near = _parts_to_wkb(
        [(W.POLYGON, [ring((0, 1e-9), (1, 0), (1, 1), (0, 1))])]
    )
    t = pa.table(
        {
            "id": pa.array([0]),
            "geometry": pa.array([SQUARE], type=pa.large_binary()),
            "other": pa.array([near], type=pa.large_binary()),
        }
    )
    out = binary_geom_almost_equals(ray.data.from_arrow(t), "other").to_pandas()
    assert out.geom_almost_equals.tolist() == [True]
    out2 = binary_geom_almost_equals(
        ray.data.from_arrow(t), "other", decimal=12
    ).to_pandas()
    assert out2.geom_almost_equals.tolist() == [False]


def test_binary_symmetric_difference_line_and_mixed():
    """Round-2 closure: line/line interval XOR + mixed-dim GC results."""
    from geopandas_ray.stages.binary import binary_symmetric_difference

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    sq = _parts_to_wkb([(W.POLYGON, [ring((0, 0), (10, 0), (10, 10), (0, 10))])])
    pt_in = W.points_to_wkb([5.0], [5.0])[0].as_py()
    pt_out = W.points_to_wkb([20.0], [5.0])[0].as_py()
    pt_on_line = W.points_to_wkb([5.0], [0.0])[0].as_py()
    la = line((0, 0), (10, 0))
    lb = line((5, 0), (15, 0))        # collinear partial overlap
    lx = line((5, -5), (5, 5))        # proper crossing
    through = line((-5, 5), (15, 5))  # crosses sq, 5 outside each side

    lefts = [la, la, la, pt_in, pt_out, through, pt_on_line, pt_out]
    rights = [lb, lx, la, sq, sq, sq, la, la]
    d = ds_of(lefts, other=pa.array(rights, type=pa.large_binary()))
    out = binary_symmetric_difference(d, "other", out="sd").to_pandas().sort_values("id")

    # line/line collinear overlap: [0,5] + [10,15] remain, length 10
    g = W.from_wkb([out.sd.iloc[0]])
    assert K.length(g)[0] == 10.0 and int(g.row_types[0]) == 5
    # proper crossing removes nothing (measure-zero intersection)
    g = W.from_wkb([out.sd.iloc[1]])
    assert K.length(g)[0] == 20.0
    # identical lines -> empty
    g = W.from_wkb([out.sd.iloc[2]])
    assert g.ring_offsets[-1] == 0
    # point inside polygon -> polygon alone (no GC)
    g = W.from_wkb([out.sd.iloc[3]])
    assert int(g.row_types[0]) == 3 and K.area(g)[0] == 100.0
    # point outside polygon -> GC(polygon, point)
    g = W.from_wkb([out.sd.iloc[4]])
    assert int(g.row_types[0]) == 7 and K.area(g)[0] == 100.0
    assert [int(t) for t in g.part_types] == [3, 1]  # polygon first (OverlayNG order)
    r0, _ = g.part_ring_range(1)
    assert g.ring_coords(r0).tolist() == [[20.0, 5.0]]
    # line through polygon -> GC(polygon, outside stubs): len = 10 stubs + 40 perim
    g = W.from_wkb([out.sd.iloc[5]])
    assert int(g.row_types[0]) == 7
    assert K.area(g)[0] == 100.0 and K.length(g)[0] == 50.0
    # point on line interior -> line alone
    g = W.from_wkb([out.sd.iloc[6]])
    assert int(g.row_types[0]) == 2 and K.length(g)[0] == 10.0
    # point off line -> GC(line, point)
    g = W.from_wkb([out.sd.iloc[7]])
    assert int(g.row_types[0]) == 7 and K.length(g)[0] == 10.0


def test_binary_intersection_difference_line_line():
    """Round-2 closure: line/line intersection (overlap + crossing points)
    and line/line difference (collinear interval subtraction)."""
    from geopandas_ray.stages.binary import binary_difference, binary_intersection

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    la = line((0, 0), (10, 0))
    lb = line((5, 0), (15, 0))   # collinear overlap [5,10]
    lx = line((5, -5), (5, 5))   # proper crossing at (5,0)
    lt = line((0, 0), (0, 10))   # endpoint touch at (0,0)
    ld = line((0, 5), (10, 5))   # disjoint

    lefts = [la, la, la, la, la]
    rights = [lb, lx, lt, ld, la]
    d = ds_of(lefts, other=pa.array(rights, type=pa.large_binary()))

    out = binary_intersection(d, "other", out="ix").to_pandas().sort_values("id")
    g = W.from_wkb([out.ix.iloc[0]])  # overlap -> LINESTRING of length 5
    assert int(g.row_types[0]) == 2 and K.length(g)[0] == 5.0
    g = W.from_wkb([out.ix.iloc[1]])  # crossing -> POINT (5,0)
    assert int(g.row_types[0]) == 1 and g.ring_coords(0).tolist() == [[5.0, 0.0]]
    g = W.from_wkb([out.ix.iloc[2]])  # touch -> POINT (0,0)
    assert int(g.row_types[0]) == 1 and g.ring_coords(0).tolist() == [[0.0, 0.0]]
    assert out.ix.iloc[3] is None     # disjoint -> empty
    g = W.from_wkb([out.ix.iloc[4]])  # self -> full length
    assert K.length(g)[0] == 10.0

    out = binary_difference(d, "other", out="df").to_pandas().sort_values("id")
    g = W.from_wkb([out.df.iloc[0]])  # [0,5] remains
    assert K.length(g)[0] == 5.0
    g = W.from_wkb([out.df.iloc[1]])  # crossing removes nothing
    assert K.length(g)[0] == 10.0
    g = W.from_wkb([out.df.iloc[3]])  # disjoint -> unchanged
    assert K.length(g)[0] == 10.0
    assert out.df.iloc[4] is None     # self-difference -> empty
