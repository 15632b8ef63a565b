import numpy as np
import pytest

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W


@pytest.fixture
def hole_poly():
    return W._poly_geoms(
        [[[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (4, 2), (4, 4), (2, 4)]]]
    )


def test_area_length_bounds(hole_poly):
    assert np.isclose(K.area(hole_poly)[0], 96.0)
    assert np.isclose(K.length(hole_poly)[0], 48.0)
    assert np.allclose(K.bounds(hole_poly)[0], [0, 0, 10, 10])


def test_triangle_area_centroid():
    tri = W._poly_geoms([[[(0, 0), (6, 0), (0, 6)]]])
    assert np.isclose(K.area(tri)[0], 18.0)
    cx, cy = K.centroid(tri)
    assert np.isclose(cx[0], 2.0) and np.isclose(cy[0], 2.0)


def test_line_centroid_and_length():
    import struct

    ls = struct.pack("<BII", 1, 2, 3) + np.array(
        [0.0, 0.0, 3.0, 4.0, 3.0, 10.0]
    ).astype("<f8").tobytes()
    g = W.from_wkb([ls])
    assert np.isclose(K.length(g)[0], 11.0)
    cx, cy = K.centroid(g)
    # length-weighted midpoint average: seg1 (1.5,2)*5, seg2 (3,7)*6
    assert np.isclose(cx[0], (1.5 * 5 + 3 * 6) / 11)
    assert np.isclose(cy[0], (2 * 5 + 7 * 6) / 11)


def test_point_in_polygon_brute_force(rng, hole_poly):
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 12, 500)
    inter, bound = K.points_in_geom(hole_poly, 0, px, py)
    inside_shell = (px > 0) & (px < 10) & (py > 0) & (py < 10)
    inside_hole = (px > 2) & (px < 4) & (py > 2) & (py < 4)
    expected = inside_shell & ~inside_hole
    assert np.array_equal(inter, expected)  # random floats never on boundary
    assert not bound.any()


def test_boundary_classification(hole_poly):
    px = np.array([0.0, 5.0, 2.0, 3.0])
    py = np.array([5.0, 10.0, 3.0, 2.0])
    inter, bound = K.points_in_geom(hole_poly, 0, px, py)
    assert list(bound) == [True, True, True, True]  # shell edges + hole edges
    assert not inter.any()


def test_intersects_and_within():
    a = W.box_geoms([0.0], [0.0], [10.0], [10.0])
    b = W.box_geoms([5.0], [5.0], [15.0], [15.0])
    c = W.box_geoms([20.0], [20.0], [21.0], [21.0])
    d = W.box_geoms([2.0], [2.0], [3.0], [3.0])
    assert K.geom_intersects_geom(a, 0, b, 0)
    assert not K.geom_intersects_geom(a, 0, c, 0)
    assert K.geom_within_geom(d, 0, a, 0)
    assert not K.geom_within_geom(b, 0, a, 0)
    # touching boxes intersect but don't overlap interiors
    e = W.box_geoms([10.0], [0.0], [20.0], [10.0])
    assert K.geom_intersects_geom(a, 0, e, 0)


def test_distance_exactness():
    rect = W.box_geoms([0.0], [0.0], [10.0], [10.0])
    px = np.array([15.0, 5.0, -3.0, 13.0])
    py = np.array([5.0, 5.0, -4.0, 14.0])
    d2 = K.points_to_geom_sqdist(rect, 0, px, py)
    assert d2[0] == 25.0  # exact, axis-aligned fast path
    assert d2[1] == 0.0
    assert d2[2] == 25.0
    assert d2[3] == 25.0


def test_segment_distance_diagonal():
    import struct

    seg = struct.pack("<BII", 1, 2, 2) + np.array([0.0, 0.0, 6.0, 8.0]).astype("<f8").tobytes()
    g = W.from_wkb([seg])
    d2 = K.points_to_geom_sqdist(g, 0, np.array([6.0, -3.0]), np.array([8.0, -4.0]))
    assert np.isclose(d2[0], 0.0)
    assert np.isclose(d2[1], 25.0)


def test_counts(hole_poly):
    assert K.count_coordinates(hole_poly)[0] == 10
    assert K.count_geometries(hole_poly)[0] == 1
    assert K.geom_type(hole_poly) == ["Polygon"]


def test_multi_row_before_trailing_null_not_truncated():
    """r4 regression: np.add.reduceat start-clamping for trailing EMPTY
    segments split the preceding segment — a multi-part row followed by a
    trailing null row lost its tail parts in length/area/hole counts."""
    from geopandas_ray.stages.clip import _parts_to_wkb

    mline = _parts_to_wkb(
        [
            (2, [np.array([[0, 0], [0, 5]], dtype=np.float64)]),
            (2, [np.array([[1, 0], [1, 7]], dtype=np.float64)]),
        ]
    )
    line = _parts_to_wkb([(2, [np.array([[0, 0], [3, 4]], dtype=np.float64)])])
    g = W.from_wkb([line, mline, None])
    lens = K.length(g)
    assert lens[0] == 5.0 and lens[1] == 12.0 and np.isnan(lens[2])
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    mpoly = _parts_to_wkb([(3, [shell]), (3, [shell + 100.0])])
    poly = _parts_to_wkb([(3, [shell])])
    g2 = W.from_wkb([poly, mpoly, None])
    areas = K.area(g2)
    assert areas[0] == 100.0 and areas[1] == 200.0
    # hole-count per row with a trailing null after a multi-polygon row
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=np.float64)
    mpoly_holes = _parts_to_wkb([(3, [shell, hole]), (3, [shell + 100.0, hole + 100.0])])
    import pyarrow as pa
    import ray.data

    from geopandas_ray.stages.ops3 import with_count_interior_rings

    ds = ray.data.from_arrow(
        pa.table({"geometry": pa.array([mpoly_holes, None], type=pa.large_binary())})
    )
    got = with_count_interior_rings(ds).to_pandas()["count_interior_rings"].tolist()
    assert got[0] == 2
