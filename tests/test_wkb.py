import struct

import numpy as np
import pyarrow as pa
import pytest

from geopandas_ray.geom import wkb as W
from geopandas_ray.geom import kernels as K


def test_point_roundtrip_vectorized():
    x = np.array([0.0, 1.5, -3.25, 1e9])
    y = np.array([2.0, -1.0, 7.5, -1e-9])
    arr = W.points_to_wkb(x, y)
    g = W.from_wkb(arr)
    assert g.all_points
    assert np.array_equal(g.coords, np.column_stack([x, y]))
    assert W.to_wkb(g).to_pylist() == arr.to_pylist()


def test_box_roundtrip_and_fallback_parser():
    arr = W.boxes_to_wkb([0.0, 10.0], [0.0, 10.0], [5.0, 20.0], [4.0, 30.0])
    g = W.from_wkb(arr)
    assert list(g.row_types) == [W.POLYGON, W.POLYGON]
    g2 = W.from_wkb(W.to_wkb(g))
    assert np.array_equal(g.coords, g2.coords)


def test_polygon_with_hole_roundtrip():
    g = W._poly_geoms([[[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (4, 2), (4, 4), (2, 4)]]])
    g2 = W.from_wkb(W.to_wkb(g))
    assert np.isclose(K.area(g2)[0], 96.0)
    r0, r1 = g2.part_ring_range(0)
    assert r1 - r0 == 2


def test_missing_and_empty_distinct():
    empty_poly = struct.pack("<BII", 1, 3, 0)
    vals = [None, empty_poly, W.points_to_wkb([1.0], [2.0])[0].as_py()]
    g = W.from_wkb(vals)
    assert list(g.is_missing) == [True, False, False]
    assert list(g.is_empty) == [False, True, False]
    # roundtrip preserves the distinction
    g2 = W.from_wkb(W.to_wkb(g))
    assert list(g2.is_missing) == [True, False, False]
    assert list(g2.is_empty) == [False, True, False]


def test_multi_geometries():
    mp = struct.pack("<BII", 1, 4, 2) + struct.pack("<BI2d", 1, 1, 5.0, 6.0) + struct.pack(
        "<BI2d", 1, 1, 7.0, 8.0
    )
    mls = (
        struct.pack("<BII", 1, 5, 1)
        + struct.pack("<BII", 1, 2, 2)
        + np.array([0.0, 0.0, 3.0, 4.0]).astype("<f8").tobytes()
    )
    g = W.from_wkb([mp, mls])
    assert list(g.row_types) == [W.MULTIPOINT, W.MULTILINESTRING]
    assert list(K.count_geometries(g)) == [2, 1]
    assert np.isclose(K.length(g)[1], 5.0)
    back = W.from_wkb(W.to_wkb(g))
    assert list(back.row_types) == [W.MULTIPOINT, W.MULTILINESTRING]


def test_big_endian_point():
    be = struct.pack(">BI2d", 0, 1, 3.0, 4.0)
    g = W.from_wkb([be])
    assert np.array_equal(g.coords, [[3.0, 4.0]])


def test_z_coordinate_dropped():
    # planar engine: Z parsed but dropped (reference base.py:93-95)
    pz = struct.pack("<BI3d", 1, 1001, 1.0, 2.0, 9.0)
    g = W.from_wkb([pz])
    assert np.array_equal(g.coords, [[1.0, 2.0]])


def test_take():
    arr = W.points_to_wkb([0.0, 1.0, 2.0], [0.0, 1.0, 2.0])
    g = W.from_wkb(arr)
    t = g.take([2, 0, 2])
    assert np.array_equal(t.coords, [[2, 2], [0, 0], [2, 2]])


def test_geoarrow_roundtrips():
    import numpy as np
    import pyarrow as pa
    from geopandas_ray.geom import wkb as W
    from geopandas_ray.geom.wkb import from_wkb, to_wkb
    from geopandas_ray.sources.geoarrow import (
        encoding_of,
        geoarrow_to_geoms,
        geoms_to_geoarrow,
    )
    from geopandas_ray.stages.clip import _parts_to_wkb

    def ring(*xy):
        return np.array(list(xy) + [xy[0]], dtype=float)

    cases = {
        "point": [W.points_to_wkb([1.0], [3.0])[0].as_py(), None],
        "linestring": [
            _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [1, 1], [2, 0]])])]),
            None,
        ],
        "multipoint": [
            _parts_to_wkb(
                [(W.POINT, [np.array([[0.0, 0]])]), (W.POINT, [np.array([[5.0, 5]])])]
            )
        ],
        "polygon": [
            _parts_to_wkb(
                [(W.POLYGON, [ring((0, 0), (10, 0), (10, 10), (0, 10)), ring((2, 2), (4, 2), (4, 4), (2, 4))])]
            )
        ],
        "multilinestring": [
            _parts_to_wkb(
                [
                    (W.LINESTRING, [np.array([[0.0, 0], [1, 0]])]),
                    (W.LINESTRING, [np.array([[2.0, 2], [3, 3]])]),
                ]
            )
        ],
        "multipolygon": [
            _parts_to_wkb(
                [
                    (W.POLYGON, [ring((0, 0), (1, 0), (1, 1), (0, 1))]),
                    (W.POLYGON, [ring((5, 5), (6, 5), (6, 6), (5, 6))]),
                ]
            )
        ],
    }
    for enc, wkbs in cases.items():
        g = from_wkb(pa.array(wkbs, type=pa.large_binary()))
        assert encoding_of(g) == enc
        arr = geoms_to_geoarrow(g, enc)
        back = to_wkb(geoarrow_to_geoms(arr, enc))
        for orig, got in zip(wkbs, back):
            assert (orig is None and not got.is_valid) or got.as_py() == orig, enc


def test_geoarrow_dataset_stage():
    import pyarrow as pa
    import ray.data
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoarrow import from_geoarrow, to_geoarrow

    t = pa.table({"id": pa.array([0, 1]), "geometry": points_to_wkb([1.0, 2.0], [3.0, 4.0])})
    ga = to_geoarrow(ray.data.from_arrow(t))
    sch = ga.schema()
    # nested native type, not binary
    assert "fixed_size_list" in str(sch.types[sch.names.index("geometry")])
    back = from_geoarrow(ga, "point").to_pandas().sort_values("id")
    assert back.geometry.tolist() == t.column("geometry").to_pylist()


def test_geoarrow_separated_and_xyz():
    """Separated struct<x,y> roundtrips for every encoding; xyz inputs
    (interleaved fsl[3] and struct<x,y,z>) decode with Z dropped."""
    import numpy as np
    import pyarrow as pa
    from geopandas_ray.geom import wkb as W
    from geopandas_ray.geom.wkb import from_wkb, to_wkb
    from geopandas_ray.sources.geoarrow import (
        geoarrow_to_geoms,
        geoms_to_geoarrow,
    )
    from geopandas_ray.stages.clip import _parts_to_wkb

    def ring(*xy):
        return np.array(list(xy) + [xy[0]], dtype=float)

    cases = {
        "point": [W.points_to_wkb([1.0], [3.0])[0].as_py(), None],
        "linestring": [
            _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0], [1, 1], [2, 0]])])]),
            None,
        ],
        "multipoint": [
            _parts_to_wkb(
                [(W.POINT, [np.array([[0.0, 0]])]), (W.POINT, [np.array([[5.0, 5]])])]
            )
        ],
        "polygon": [
            _parts_to_wkb(
                [(W.POLYGON, [ring((0, 0), (10, 0), (10, 10), (0, 10)), ring((2, 2), (4, 2), (4, 4), (2, 4))])]
            )
        ],
        "multilinestring": [
            _parts_to_wkb(
                [
                    (W.LINESTRING, [np.array([[0.0, 0], [1, 0]])]),
                    (W.LINESTRING, [np.array([[2.0, 2], [3, 3]])]),
                ]
            )
        ],
        "multipolygon": [
            _parts_to_wkb(
                [
                    (W.POLYGON, [ring((0, 0), (1, 0), (1, 1), (0, 1))]),
                    (W.POLYGON, [ring((5, 5), (6, 5), (6, 6), (5, 6))]),
                ]
            )
        ],
    }
    for enc, wkbs in cases.items():
        g = from_wkb(pa.array(wkbs, type=pa.large_binary()))
        # separated roundtrip
        arr = geoms_to_geoarrow(g, enc, interleaved=False)
        # child coord layout really is the struct variant
        t = arr.type
        while pa.types.is_list(t):
            t = t.value_type
        assert pa.types.is_struct(t), enc
        back = to_wkb(geoarrow_to_geoms(arr, enc))
        for orig, got in zip(wkbs, back):
            assert (orig is None and not got.is_valid) or got.as_py() == orig, enc

    # xyz interleaved: fsl[3] point decodes to the 2-D point
    xyz = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 3.0, 9.0, 2.0, 4.0, 8.0]), 3
    )
    g = geoarrow_to_geoms(xyz, "point")
    assert to_wkb(g).to_pylist() == W.points_to_wkb([1.0, 2.0], [3.0, 4.0]).to_pylist()
    # xyz separated: struct<x,y,z> decodes the same (z ignored)
    sxyz = pa.StructArray.from_arrays(
        [pa.array([1.0, 2.0]), pa.array([3.0, 4.0]), pa.array([9.0, 8.0])],
        ["x", "y", "z"],
    )
    g2 = geoarrow_to_geoms(sxyz, "point")
    assert to_wkb(g2).to_pylist() == W.points_to_wkb([1.0, 2.0], [3.0, 4.0]).to_pylist()
    # xyz nested: multipolygon with fsl[3] coords
    mp = cases["multipolygon"][0]
    gmp = from_wkb(pa.array([mp], type=pa.large_binary()))
    arr2 = geoms_to_geoarrow(gmp, "multipolygon")
    flat = arr2.flatten().flatten().flatten()
    n = len(flat)
    xy = np.asarray(flat.values, dtype=np.float64).reshape(-1, 2)
    flat3 = pa.FixedSizeListArray.from_arrays(
        pa.array(np.column_stack([xy, np.full(len(xy), 7.0)]).ravel()), 3
    )
    rings3 = pa.ListArray.from_arrays(arr2.flatten().flatten().offsets, flat3)
    polys3 = pa.ListArray.from_arrays(arr2.flatten().offsets, rings3)
    arr3 = pa.ListArray.from_arrays(arr2.offsets, polys3)
    back3 = to_wkb(geoarrow_to_geoms(arr3, "multipolygon")).to_pylist()
    assert back3 == [mp]
