import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import algorithms as A
from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.geom.wkt import from_wkt, to_wkt
from geopandas_ray.sources.geojson import from_features, geo_dict_to_wkb, to_json_column
from geopandas_ray.stages.binary import (
    binary_difference,
    binary_distance,
    binary_intersection,
    binary_predicate,
    binary_union,
)
from geopandas_ray.stages.ops2 import (
    collect,
    interpolate,
    remove_repeated_points,
    reverse,
    sample_points,
    segmentize,
    simplify,
    with_boundary,
    with_convex_hull,
    with_is_valid,
    with_min_bounding_circle,
    with_min_rotated_rect,
    with_representative_point,
)


# ---------------------------------------------------------------- WKT


@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1 2)",
        "LINESTRING (0 0, 3 4, 3 10)",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        "POINT EMPTY",
    ],
)
def test_wkt_roundtrip(wkt):
    g = from_wkt([wkt])
    back = to_wkt(g)[0]
    g2 = from_wkt(back)
    assert list(g.row_types) == list(g2.row_types)
    assert np.allclose(g.coords, g2.coords)


def test_wkt_to_wkb_consistency():
    g = from_wkt(["POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", None])
    assert np.isclose(K.area(g)[0], 100.0)
    assert g.is_missing[1]
    g2 = W.from_wkb(W.to_wkb(g))
    assert to_wkt(g2)[0] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"


# ---------------------------------------------------------------- algorithms


def test_convex_hull(rng):
    pts = rng.uniform(0, 100, (200, 2))
    hull = A.convex_hull(pts)
    # all points inside or on hull
    g = W._poly_geoms([[hull]])
    inter, bound = K.points_in_geom(g, 0, pts[:, 0], pts[:, 1])
    assert (inter | bound).all()


def test_douglas_peucker():
    line = np.array([[0, 0], [1, 0.001], [2, -0.001], [3, 0], [3, 5]], dtype=float)
    simp = A.douglas_peucker(line, 0.01)
    assert np.array_equal(simp, np.array([[0, 0], [3, 0], [3, 5]], dtype=float))


def test_min_rotated_rect():
    # 45-degree line of points with width
    pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3], [0.5, -0.5], [3.5, 2.5]])
    ring = A.min_rotated_rect(pts)
    g = W._poly_geoms([[ring]])
    a = K.area(g)[0]
    assert a < 6.1  # axis-aligned bbox would be 3.5*3.5=12.25
    # rotated corners are inexact: containment up to epsilon distance
    d2 = K.points_to_geom_sqdist(g, 0, pts[:, 0], pts[:, 1])
    assert (d2 < 1e-18).all()


def test_min_bounding_circle():
    pts = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]])
    cx, cy, r = A.min_bounding_circle(pts)
    assert np.isclose(cx, 1.0) and np.isclose(cy, 0.0) and np.isclose(r, 1.0)


def test_segmentize_interpolate():
    c = np.array([[0.0, 0.0], [10.0, 0.0]])
    s = A.segmentize(c, 3.0)
    assert len(s) == 5 and np.isclose(np.hypot(*np.diff(s, axis=0).T).max(), 2.5)
    assert A.interpolate_line(c, 4.0) == (4.0, 0.0)
    assert A.interpolate_line(c, 0.5, normalized=True) == (5.0, 0.0)


# ---------------------------------------------------------------- stages


@pytest.fixture
def poly_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0], type=pa.int64()),
                "geometry": W.boxes_to_wkb([0.0], [0.0], [10.0], [10.0]),
            }
        )
    )


def test_boundary_and_hull_stage(poly_ds):
    b = with_boundary(poly_ds).to_pandas()
    gb = W.from_wkb(b.boundary.tolist())
    assert np.isclose(K.length(gb)[0], 40.0)
    h = with_convex_hull(poly_ds).to_pandas()
    gh = W.from_wkb(h.convex_hull.tolist())
    assert np.isclose(K.area(gh)[0], 100.0)


def test_simplify_segmentize_reverse_stage():
    import struct

    line = struct.pack("<BII", 1, 2, 3) + np.array([0.0, 0.0, 5.0, 0.001, 10.0, 0.0]).astype("<f8").tobytes()
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "geometry": pa.array([line], type=pa.large_binary())})
    )
    s = simplify(ds, 0.01).to_pandas()
    assert K.count_coordinates(W.from_wkb(s.geometry.tolist()))[0] == 2
    seg = segmentize(ds, 2.0).to_pandas()
    assert K.count_coordinates(W.from_wkb(seg.geometry.tolist()))[0] > 5
    rev = reverse(ds).to_pandas()
    gr = W.from_wkb(rev.geometry.tolist())
    assert np.allclose(gr.coords[0], [10.0, 0.0])


def test_remove_repeated_stage():
    import struct

    line = struct.pack("<BII", 1, 2, 4) + np.array([0.0, 0.0, 0.0, 0.0, 5.0, 5.0, 5.0, 5.0]).astype("<f8").tobytes()
    ds = ray.data.from_arrow(
        pa.table({"geometry": pa.array([line], type=pa.large_binary())})
    )
    out = remove_repeated_points(ds).to_pandas()
    assert K.count_coordinates(W.from_wkb(out.geometry.tolist()))[0] == 2


def test_representative_point_inside():
    # C-shaped polygon whose centroid is outside
    ring = [(0, 0), (10, 0), (10, 2), (2, 2), (2, 8), (10, 8), (10, 10), (0, 10)]
    g = W._poly_geoms([[ring]])
    ds = ray.data.from_arrow(pa.table({"geometry": W.to_wkb(g)}))
    r = with_representative_point(ds).to_pandas()
    gp = W.from_wkb(r.representative_point.tolist())
    x, y = gp.coords[0]
    inter, bound = K.points_in_geom(g, 0, np.array([x]), np.array([y]))
    assert inter[0] or bound[0]


def test_min_circle_and_rect_stage(poly_ds):
    c = with_min_bounding_circle(poly_ds).to_pandas()
    assert np.isclose(c.minimum_bounding_radius[0], np.sqrt(50.0))
    r = with_min_rotated_rect(poly_ds).to_pandas()
    assert np.isclose(K.area(W.from_wkb(r.min_rotated_rect.tolist()))[0], 100.0)


def test_sample_points_deterministic(poly_ds):
    a = sample_points(poly_ds, 20, seed=7).to_pandas()
    b = sample_points(poly_ds, 20, seed=7).to_pandas()
    assert a.sampled_points.tolist() == b.sampled_points.tolist()
    g = W.from_wkb(a.sampled_points.tolist())
    assert K.count_geometries(g)[0] == 20
    assert (g.coords >= 0).all() and (g.coords <= 10).all()


def test_is_valid(poly_ds):
    v = with_is_valid(poly_ds).to_pandas()
    assert v.is_valid.all()


def test_collect():
    w = collect(W.points_to_wkb([1.0, 2.0], [1.0, 2.0]).to_pylist())
    g = W.from_wkb([w])
    assert g.row_types[0] == 4 and K.count_geometries(g)[0] == 2


# ---------------------------------------------------------------- binary ops


def test_binary_predicate_and_distance():
    t = pa.table(
        {
            "geometry": W.points_to_wkb([1.0, 50.0], [1.0, 50.0]),
            "geom2": W.boxes_to_wkb([0.0, 0.0], [0.0, 0.0], [10.0, 10.0], [10.0, 10.0]),
        }
    )
    ds = ray.data.from_arrow(t)
    p = binary_predicate(ds, "within", "geom2").to_pandas()
    assert p.within.tolist() == [True, False]
    d = binary_distance(ds, "geom2").to_pandas()
    assert np.allclose(d.distance, [0.0, np.hypot(40, 40)])
    # broadcast scalar other
    p2 = binary_predicate(ds, "intersects", W.boxes_to_wkb([0.0], [0.0], [2.0], [2.0])[0].as_py()).to_pandas()
    assert p2.intersects.tolist() == [True, False]


def test_binary_set_ops():
    t = pa.table(
        {
            "geometry": W.boxes_to_wkb([0.0], [0.0], [4.0], [4.0]),
            "geom2": W.boxes_to_wkb([2.0], [2.0], [6.0], [6.0]),
        }
    )
    ds = ray.data.from_arrow(t)
    i = binary_intersection(ds, "geom2").to_pandas()
    assert np.isclose(K.area(W.from_wkb(i.intersection.tolist()))[0], 4.0)
    d = binary_difference(ds, "geom2").to_pandas()
    assert np.isclose(K.area(W.from_wkb(d.difference.tolist()))[0], 12.0)
    u = binary_union(ds, "geom2").to_pandas()
    assert np.isclose(K.area(W.from_wkb(u.union.tolist()))[0], 28.0)


# ---------------------------------------------------------------- geojson


def test_geojson_roundtrip():
    feats = [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}, "properties": {"name": "a"}},
        {
            "type": "Feature",
            "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]},
            "properties": {"name": "b"},
        },
    ]
    t = from_features(feats)
    assert t.column_names == ["name", "geometry"]
    g = W.from_wkb(t.column("geometry"))
    assert np.isclose(K.area(g)[1], 16.0)
    ds = ray.data.from_arrow(t)
    j = to_json_column(ds).to_pandas()
    import json

    back = [json.loads(s) for s in j.feature_json]
    assert back[0]["geometry"]["type"] == "Point"
    assert back[0]["properties"]["name"] == "a"
    assert back[1]["geometry"]["coordinates"][0][1] == [4.0, 0.0]


def test_buffer_points():
    from geopandas_ray.stages.ops2 import buffer

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "geometry": W.points_to_wkb([10.0], [10.0])})
    )
    b = buffer(ds, 5.0, quad_segs=16).to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    a = K.area(g)[0]
    # inscribed 64-gon area = pi*r^2 * sinc correction; within 0.2% of circle
    assert abs(a - np.pi * 25) / (np.pi * 25) < 0.002
    bb = K.bounds(g)[0]
    assert np.allclose(bb, [5, 5, 15, 15])


def test_buffer_lines_polygons():
    from geopandas_ray.stages.ops2 import buffer
    from geopandas_ray.stages.clip import _parts_to_wkb

    # segment buffer: area -> 2*L*d + pi*d^2 (inscribed-polygon deficit)
    line = _parts_to_wkb([(2, [np.array([[0.0, 0.0], [10.0, 0.0]])])])
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([line], type=pa.large_binary())}))
    b = buffer(ds, 2.0, quad_segs=16).to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    want = 2 * 10 * 2 + np.pi * 4
    assert 0 < (want - K.area(g)[0]) / want < 0.005
    assert np.allclose(K.bounds(g)[0], [-2, -2, 12, 2])

    # round polygon buffer: area -> A + P*d + pi*d^2
    sq = W.boxes_to_wkb([0.0], [0.0], [10.0], [10.0])
    ds = ray.data.from_arrow(pa.table({"geometry": sq}))
    b = buffer(ds, 3.0, quad_segs=16).to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    want = 100 + 40 * 3 + np.pi * 9
    assert 0 < (want - K.area(g)[0]) / want < 0.005

    # mitre join on a rect is EXACT: (w+2d)x(h+2d)
    b = buffer(ds, 3.0, join_style="mitre").to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    assert K.area(g)[0] == 16.0 * 16.0
    assert np.allclose(K.bounds(g)[0], [-3, -3, 13, 13])

    # negative buffer erodes exactly for rects
    b = buffer(ds, -2.0).to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    assert K.area(g)[0] == 36.0
    assert np.allclose(K.bounds(g)[0], [2, 2, 8, 8])

    # erosion past collapse -> empty
    b = buffer(ds, -6.0).to_pandas()
    g = W.from_wkb(b.geometry.tolist())
    assert bool(g.is_empty[0])


def test_set_precision_normalize_force2d():
    from geopandas_ray.stages.ops2 import force_2d, normalize, set_precision

    g = W._poly_geoms([[[(0.26, 0.74), (10.12, 0.4), (10.3, 9.8), (0.1, 10.04)]]])
    ds = ray.data.from_arrow(pa.table({"geometry": W.to_wkb(g)}))
    p = set_precision(ds, 0.5).to_pandas()
    gp = W.from_wkb(p.geometry.tolist())
    assert np.all(np.mod(gp.coords * 2, 1) == 0)  # on the 0.5 grid

    # normalize: CW shell ring becomes CCW starting at min vertex
    cw_ring = [(0, 0), (0, 10), (10, 10), (10, 0)]
    g2 = W._poly_geoms([[cw_ring]])
    ds2 = ray.data.from_arrow(pa.table({"geometry": W.to_wkb(g2)}))
    n1 = normalize(ds2).to_pandas()
    gn = W.from_wkb(n1.geometry.tolist())
    ring = gn.ring_coords(0)
    x, y = ring[:, 0], ring[:, 1]
    assert (x[:-1] * y[1:] - x[1:] * y[:-1]).sum() > 0  # CCW
    assert tuple(ring[0]) == (0.0, 0.0)  # starts at min vertex
    # idempotent
    n2 = normalize(ray.data.from_arrow(pa.table({"geometry": W.to_wkb(gn)}))).to_pandas()
    assert n2.geometry.tolist() == n1.geometry.tolist()

    f = force_2d(ds2).to_pandas()
    assert np.isclose(K.area(W.from_wkb(f.geometry.tolist()))[0], 100.0)


def test_ring_flags():
    import struct

    from geopandas_ray.stages.ops2 import with_ring_flags

    ring_line = struct.pack("<BII", 1, 2, 5) + np.array(
        [0.0, 0, 4, 0, 4, 4, 0, 4, 0, 0]
    ).astype("<f8").tobytes()
    open_line = struct.pack("<BII", 1, 2, 2) + np.array([0.0, 0, 5, 5]).astype("<f8").tobytes()
    bowtie = struct.pack("<BII", 1, 2, 4) + np.array(
        [0.0, 0, 4, 4, 4, 0, 0, 4]
    ).astype("<f8").tobytes()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2], type=pa.int64()),
                "geometry": pa.array([ring_line, open_line, bowtie], type=pa.large_binary()),
            }
        )
    )
    f = with_ring_flags(ds).to_pandas().sort_values("id")
    assert f.is_closed.tolist() == [True, False, False]
    assert f.is_ring.tolist() == [True, False, False]
    assert f.is_ccw.tolist() == [True, False, False]
    assert f.is_simple.tolist() == [True, True, False]
    assert not f.has_z.any()


def test_get_geometry():
    import struct

    from geopandas_ray.stages.ops2 import get_geometry

    mp = struct.pack("<BII", 1, 4, 2) + struct.pack("<BI2d", 1, 1, 1.0, 2.0) + struct.pack(
        "<BI2d", 1, 1, 3.0, 4.0
    )
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([mp], type=pa.large_binary())}))
    g1 = W.from_wkb(get_geometry(ds, 1, out="part").to_pandas().part.tolist())
    assert np.allclose(g1.coords, [[3, 4]])
    gneg = W.from_wkb(get_geometry(ds, -2, out="part").to_pandas().part.tolist())
    assert np.allclose(gneg.coords, [[1, 2]])
    goob = get_geometry(ds, 5, out="part").to_pandas()
    assert goob.part.isna().all()


def test_line_merge():
    import struct

    from geopandas_ray.stages.ops2 import line_merge

    seg = lambda pts: struct.pack("<BII", 1, 2, len(pts)) + np.asarray(pts, dtype="<f8").tobytes()
    mls = (
        struct.pack("<BII", 1, 5, 3)
        + seg([(0, 0), (1, 1)])
        + seg([(1, 1), (2, 2)])
        + seg([(5, 5), (6, 6)])
    )
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([mls], type=pa.large_binary())}))
    m = line_merge(ds).to_pandas()
    g = W.from_wkb(m.geometry.tolist())
    assert K.count_geometries(g)[0] == 2  # two chains
    assert np.isclose(K.length(g)[0], np.hypot(2, 2) + np.hypot(1, 1))


def test_hausdorff_shortest_project():
    import struct

    from geopandas_ray.stages.binary import (
        binary_hausdorff,
        binary_project,
        binary_shortest_line,
    )

    # two point rows vs rect column
    t = pa.table(
        {
            "geometry": W.points_to_wkb([0.0, 20.0], [0.0, 5.0]),
            "geom2": W.boxes_to_wkb([10.0, 10.0], [0.0, 0.0], [14.0, 14.0], [10.0, 10.0]),
        }
    )
    ds = ray.data.from_arrow(t)
    h = binary_hausdorff(ds, "geom2").to_pandas()
    # point (0,0) vs rect(10..14, 0..10): directed p->r = 10; r->p = dist from
    # farthest rect vertex (14,10) to point = sqrt(296)
    assert np.isclose(h.hausdorff_distance[0], np.sqrt(14**2 + 10**2))
    s = binary_shortest_line(ds, "geom2").to_pandas()
    g = W.from_wkb(s.shortest_line.tolist())
    assert np.allclose(g.ring_coords(0), [[0, 0], [10, 0]])
    assert np.allclose(g.ring_coords(1), [[20, 5], [14, 5]])

    line = struct.pack("<BII", 1, 2, 3) + np.array([0.0, 0, 10, 0, 10, 10]).astype("<f8").tobytes()
    t2 = pa.table(
        {
            "geometry": pa.array([line], type=pa.large_binary()),
            "pt": W.points_to_wkb([12.0], [3.0]),
        }
    )
    p = binary_project(ray.data.from_arrow(t2), "pt").to_pandas()
    assert np.isclose(p.project[0], 13.0)  # 10 along x + 3 up the vertical leg


def test_relate_de9im():
    from geopandas_ray.stages.binary import binary_relate, binary_relate_pattern

    t = pa.table(
        {
            "geometry": W.points_to_wkb([5.0, 0.0, 50.0], [5.0, 5.0, 50.0]),
            "geom2": W.boxes_to_wkb([0.0] * 3, [0.0] * 3, [10.0] * 3, [10.0] * 3),
        }
    )
    ds = ray.data.from_arrow(t)
    r = binary_relate(ds, "geom2").to_pandas()
    assert r.relate.tolist() == ["0FFFFF212", "F0FFFF212", "FF0FF F212".replace(" ", "")]
    # rect-rect cases
    t2 = pa.table(
        {
            "geometry": W.boxes_to_wkb([0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [4.0, 4.0, 4.0], [4.0, 4.0, 4.0]),
            "geom2": W.boxes_to_wkb([1.0, 2.0, 4.0], [1.0, 2.0, 0.0], [3.0, 6.0, 8.0], [3.0, 6.0, 4.0]),
        }
    )
    r2 = binary_relate(ray.data.from_arrow(t2), "geom2").to_pandas()
    assert r2.relate.tolist()[0] == "212F11FF2"[:0] + "212FF1FF2"  # b strictly inside a
    assert r2.relate.tolist()[1] == "212101212"  # proper overlap
    assert r2.relate.tolist()[2] == "FF2F11212"  # edge touch
    # pattern matching: intersects pattern
    p = binary_relate_pattern(ds, "T********", "geom2").to_pandas()
    assert p.relate_pattern.tolist() == [True, False, False]


def test_delaunay(rng):
    from geopandas_ray.geom.algorithms import delaunay
    from geopandas_ray.stages.ops2 import delaunay_triangles

    pts = rng.uniform(0, 100, (40, 2))
    pts = np.unique(pts, axis=0)
    tris = delaunay(pts)
    assert len(tris) >= len(pts) - 2
    # Delaunay property: no point strictly inside any circumcircle
    for a, b, c in tris:
        ax, ay = pts[a]; bx, by = pts[b]; cx, cy = pts[c]
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        d2 = (pts[:, 0] - ux) ** 2 + (pts[:, 1] - uy) ** 2
        assert (d2 >= r2 * (1 - 1e-9)).sum() >= len(pts) - 3
    # total triangulated area == convex hull area
    hull = A.convex_hull(pts)
    hull_area = abs((hull[:-1, 0] * hull[1:, 1] - hull[1:, 0] * hull[:-1, 1]).sum() / 2)
    tri_area = 0.0
    for a, b, c in tris:
        x = np.array([pts[a], pts[b], pts[c], pts[a]])
        tri_area += abs((x[:-1, 0] * x[1:, 1] - x[1:, 0] * x[:-1, 1]).sum() / 2)
    assert np.isclose(tri_area, hull_area)

    # stage over a multipoint row
    import struct

    mp = struct.pack("<BII", 1, 4, 4) + b"".join(
        struct.pack("<BI2d", 1, 1, float(x), float(y)) for x, y in [(0, 0), (10, 0), (0, 10), (10, 10)]
    )
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([mp], type=pa.large_binary())}))
    t = delaunay_triangles(ds).to_pandas()
    g = W.from_wkb(t.delaunay.tolist())
    assert K.count_geometries(g)[0] == 2
    assert np.isclose(K.area(g)[0], 100.0)


def test_voronoi(rng):
    from geopandas_ray.geom.algorithms import voronoi_cells
    from geopandas_ray.stages.ops2 import voronoi_polygons

    pts = rng.uniform(10, 90, (25, 2))
    env = (0.0, 0.0, 100.0, 100.0)
    cells = voronoi_cells(pts, env)
    # cells partition the envelope: areas sum to envelope area
    total = 0.0
    for k, ring in enumerate(cells):
        assert len(ring) >= 4
        x, y = ring[:, 0], ring[:, 1]
        a = abs((x[:-1] * y[1:] - x[1:] * y[:-1]).sum() / 2)
        total += a
        # the generating point lies in its own cell
        g = W._poly_geoms([[ring]])
        inter, bound = K.points_in_geom(g, 0, pts[k : k + 1, 0], pts[k : k + 1, 1])
        assert inter[0] or bound[0]
    assert np.isclose(total, 100.0 * 100.0)

    import struct

    mp = struct.pack("<BII", 1, 4, 3) + b"".join(
        struct.pack("<BI2d", 1, 1, float(x), float(y)) for x, y in [(10, 10), (90, 10), (50, 90)]
    )
    ds = ray.data.from_arrow(pa.table({"geometry": pa.array([mp], type=pa.large_binary())}))
    v = voronoi_polygons(ds, extend_to=(0, 0, 100, 100)).to_pandas()
    g = W.from_wkb(v.voronoi.tolist())
    assert K.count_geometries(g)[0] == 3
    assert np.isclose(K.area(g)[0], 10000.0)


def test_read_file_to_file_geojson(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file
    from geopandas_ray.geom import kernels as K

    t = pa.table(
        {
            "name": pa.array(["a", "b", "c"]),
            "rank": pa.array([1, 2, 3]),
            "geometry": W.points_to_wkb([0.0, 5.0, 9.0], [1.0, 6.0, 2.0]),
        }
    )
    paths = to_file(ray.data.from_arrow(t).repartition(2), str(tmp_path / "out"))
    assert len(paths) >= 1 and all(p.endswith(".geojson") for p in paths)
    back = read_file(str(tmp_path / "out")).to_pandas().sort_values("rank")
    assert back.name.tolist() == ["a", "b", "c"]
    g = W.from_wkb(back.geometry.tolist())
    assert K.bounds(g)[:, 0].tolist() == [0.0, 5.0, 9.0]
    # columns + rows narrowing
    sub = read_file(str(tmp_path / "out"), columns=["name"], rows=2).to_pandas()
    assert set(sub.columns) == {"name", "geometry"} and len(sub) == 2
    import pytest

    # .shp/.gpkg are natively supported since late r4; OGR-only formats
    # (FileGDB etc.) still refuse
    with pytest.raises(NotImplementedError):
        read_file(str(tmp_path / "out") + "/../whatever.gdb")


def test_is_simple_exact_noding():
    """JTS IsSimpleOp fixtures beyond proper crossings."""
    import numpy as np

    from geopandas_ray.stages.clip import _parts_to_wkb
    from geopandas_ray.stages.ops2 import with_ring_flags

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    def mline(*parts):
        return _parts_to_wkb(
            [(W.LINESTRING, [np.array(p, dtype=float)]) for p in parts]
        )

    def mpoint(*pts):
        return _parts_to_wkb([(W.POINT, [np.array([p], dtype=float)]) for p in pts])

    cases = [
        (line((0, 0), (2, 2), (2, 0), (0, 2)), False),      # proper cross
        (line((0, 0), (4, 0), (2, 2), (2, 0)), False),      # T-touch on seg interior
        (line((0, 0), (2, 0), (1, 0)), False),              # spike backtrack
        (line((0, 0), (1, 0), (1, 0), (2, 0)), True),       # repeated point: simple
        (line((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)), True),  # closed ring: simple
        (line((0, 0), (2, 0), (2, 2), (1, 0)), False),      # lollipop: end on interior
        (mline(((0, 0), (1, 1)), ((1, 1), (2, 0))), True),  # parts meet at endpoints
        (mline(((0, 0), (2, 2)), ((0, 2), (2, 0))), False),  # parts cross
        (mline(((0, 0), (2, 0)), ((1, 0), (1, 2))), False),  # endpoint on interior
        (mpoint((0, 0), (1, 1)), True),
        (mpoint((0, 0), (1, 1), (0, 0)), False),            # repeated point in multipoint
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(list(range(len(cases))), type=pa.int64()),
                "geometry": pa.array([w for w, _ in cases], type=pa.large_binary()),
            }
        )
    )
    out = with_ring_flags(ds).to_pandas().sort_values("id")
    assert out.is_simple.tolist() == [e for _, e in cases]


def test_buffer_distance_column():
    # per-row distance via a column name (reference accepts an aligned
    # array — tests/test_geom_methods.py:1349); mitre on rects is exact
    import numpy as np
    import pyarrow as pa
    import ray.data
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.geom import wkb as W
    from geopandas_ray.stages.ops2 import buffer

    t = pa.table(
        {
            "id": pa.array([0, 1, 2]),
            "d": pa.array([1.0, 2.0, 3.0]),
            "geometry": W.boxes_to_wkb(
                [0.0, 100.0, 200.0], [0.0, 100.0, 200.0], [10.0, 120.0, 230.0], [10.0, 110.0, 240.0]
            ),
        }
    )
    out = buffer(ray.data.from_arrow(t), "d", join_style="mitre").to_pandas()
    out = out.sort_values("id")
    areas = K.area(W.from_wkb(out.geometry.tolist()))
    assert np.allclose(areas, [(10 + 2) * (10 + 2), (20 + 4) * (10 + 4), (30 + 6) * (40 + 6)])
