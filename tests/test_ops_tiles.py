import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.explode import explode, get_coordinates
from geopandas_ray.stages.ops import (
    cx_filter,
    scale,
    translate,
    with_area,
    with_bounds,
    with_cell,
    with_centroid,
    with_counts,
    with_envelope,
    with_geom_type,
    with_hilbert,
    with_length,
    with_xy,
)
from geopandas_ray.stages.tiles import assign_tiles


@pytest.fixture
def boxes_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1], type=pa.int64()),
                "geometry": W.boxes_to_wkb([0.0, 10.0], [0.0, 10.0], [4.0, 20.0], [2.0, 30.0]),
            }
        )
    )


def test_scalar_ops(boxes_ds):
    df = with_length(with_area(boxes_ds)).to_pandas().sort_values("id")
    assert df.area.tolist() == [8.0, 200.0]
    assert df.length.tolist() == [12.0, 60.0]
    b = with_bounds(boxes_ds).to_pandas().sort_values("id")
    assert b[["minx", "miny", "maxx", "maxy"]].values.tolist() == [[0, 0, 4, 2], [10, 10, 20, 30]]
    t = with_geom_type(boxes_ds).to_pandas()
    assert set(t.geom_type) == {"Polygon"}
    c = with_counts(boxes_ds).to_pandas()
    assert c.count_coordinates.tolist() == [5, 5]


def test_centroid_envelope_xy(boxes_ds):
    d = with_xy(with_centroid(boxes_ds), geometry="centroid").to_pandas().sort_values("id")
    assert d.x.tolist() == [2.0, 15.0]
    assert d.y.tolist() == [1.0, 20.0]
    e = with_envelope(boxes_ds).to_pandas()
    g = W.from_wkb(e.envelope.tolist())
    assert np.allclose(g.coords[0], [0, 0])


def test_affine(boxes_ds):
    t = with_bounds(translate(boxes_ds, 5, -5)).to_pandas().sort_values("id")
    assert t[["minx", "miny"]].values.tolist() == [[5, -5], [15, 5]]
    s = with_bounds(scale(boxes_ds, 2, 2, origin=(0, 0))).to_pandas().sort_values("id")
    assert s[["maxx", "maxy"]].values.tolist() == [[8, 4], [40, 60]]


def test_cx_filter(boxes_ds):
    assert cx_filter(boxes_ds, 0, 0, 5, 5).to_pandas().id.tolist() == [0]
    assert len(cx_filter(boxes_ds, -10, -10, -5, -5).to_pandas()) == 0


def test_cell_and_hilbert(boxes_ds):
    c = with_cell(boxes_ds, 8).to_pandas()
    assert (np.asarray(c.cell) >> 58 == 8).all()
    h = with_hilbert(boxes_ds, total_bounds=(0, 0, 100, 100)).to_pandas()
    assert h.hilbert.nunique() == 2


def test_tiles_boundary_points():
    # F5: boundary points assigned by half-open [min,max) convention
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2], type=pa.int64()),
                "geometry": W.points_to_wkb([32.0, 31.999, 0.0], [64.0, 0.0, 0.0]),
            }
        )
    )
    t = assign_tiles(ds, 5).to_pandas().sort_values("id")
    assert list(zip(t.tile_x, t.tile_y)) == [(1, 2), (0, 0), (0, 0)]


def test_tiles_polygon_exact_filter():
    # L-shaped coverage: bbox says 4 tiles, exact test drops the empty corner
    poly = W._poly_geoms(
        [[[(0, 0), (60, 0), (60, 30), (30, 30), (30, 60), (0, 60)]]]
    )
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "geometry": W.to_wkb(poly)})
    )
    t = assign_tiles(ds, 5).to_pandas()  # 32px tiles
    got = sorted(zip(t.tile_x, t.tile_y))
    assert got == [(0, 0), (0, 1), (1, 0)], got


def test_explode_and_coordinates(boxes_ds):
    e = explode(boxes_ds).to_pandas()
    assert len(e) == 2  # single-part rows stay single
    gc = get_coordinates(boxes_ds).to_pandas()
    assert len(gc) == 10
    assert gc[gc.id == 0].x.tolist() == [0, 4, 4, 0, 0]
