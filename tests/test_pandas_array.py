"""pandas ExtensionArray protocol (geopandas_ray/array.py): GeometryDtype
registration, GeometryArray through pandas machinery (Series ctor,
factorize/groupby, concat, unique, take/reindex, fillna/shift, sorting,
astype->WKT), shared-kernel geometry math, and the GeoDataset
to_pandas(geometry_dtype=True)/from_pandas round trip."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from geopandas_ray.array import (
    GeometryArray,
    GeometryDtype,
    from_wkt,
    points_from_xy,
    to_wkt,
)
from geopandas_ray.geom import wkb as W


def _arr(crs=None):
    a = points_from_xy([0.0, 1.0, 2.0, 0.0], [0.0, 1.0, 4.0, 0.0], crs=crs)
    data = a._data.copy()
    data[2] = None
    return GeometryArray(data, crs=crs)


def test_dtype_registered_and_series_ctor():
    s = pd.Series(_arr(), dtype="geometry")
    assert isinstance(s.dtype, GeometryDtype)
    assert s.dtype.name == "geometry"
    assert isinstance(s.array, GeometryArray)
    assert s.isna().tolist() == [False, False, True, False]
    # scalar is WKB bytes (the engine's wire format)
    assert isinstance(s.iloc[0], bytes)


def test_from_wkt_and_astype_str():
    a = from_wkt(["POINT (1 2)", None, "LINESTRING (0 0, 3 4)"])
    s = pd.Series(a)
    out = s.astype(str)
    assert out.iloc[0] == "POINT (1 2)"
    assert to_wkt(a)[2] == "LINESTRING (0 0, 3 4)"
    assert np.array_equal(a.length, [0.0, np.nan, 5.0], equal_nan=True)


def test_factorize_groupby_unique_value_counts():
    a = _arr()
    s = pd.Series(a)
    codes, uniq = s.factorize()
    assert codes.tolist() == [0, 1, -1, 0]  # row 3 duplicates row 0
    assert len(uniq) == 2
    df = pd.DataFrame({"g": s, "v": [1.0, 2.0, 3.0, 4.0]})
    gb = df.groupby("g", dropna=True)["v"].sum()
    assert sorted(gb.tolist()) == [2.0, 5.0]
    assert len(s.unique()) == 3  # two points + NA
    vc = s.value_counts(dropna=True)
    assert sorted(vc.tolist()) == [1, 2]


def test_concat_take_reindex_shift_fillna():
    a, b = _arr(crs="EPSG:4326"), _arr(crs="EPSG:4326")
    c = pd.concat([pd.Series(a), pd.Series(b)], ignore_index=True)
    assert len(c) == 8 and c.array.crs == "EPSG:4326"
    t = a.take([3, 0, 1])
    assert t[0] == a[3] and len(t) == 3
    s = pd.Series(a)
    r = s.reindex([0, 5])  # missing label fills NA
    assert r.isna().tolist() == [False, True]
    sh = s.shift(1)
    assert sh.isna().iloc[0] and sh.iloc[1] == s.iloc[0]
    filled = s.fillna(a[0])
    assert filled.isna().sum() == 0 and filled.iloc[2] == a[0]


def test_sort_and_eq_contains():
    a = _arr()
    s = pd.Series(a)
    srt = s.sort_values(na_position="last")
    assert srt.isna().iloc[-1]
    eq = a == a[0]
    assert eq.tolist() == [True, False, False, True]
    assert a[0] in a and None in a


def test_kernel_math_and_to_crs():
    a = points_from_xy([0.0, 180.0], [0.0, 0.0], crs="EPSG:4326")
    assert np.allclose(a.area, [0.0, 0.0])
    assert a.geom_type.tolist() == ["Point", "Point"]
    assert a.x.tolist() == [0.0, 180.0]
    m = a.to_crs("EPSG:3857")
    assert m.crs == "EPSG:3857"
    assert abs(m.x[1] - 20037508.342789244) < 1e-6
    with pytest.raises(ValueError, match="naive"):
        points_from_xy([0.0], [0.0]).to_crs("EPSG:3857")
    c = from_wkt(["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"]).centroid
    assert c.x.tolist() == [1.0] and c.y.tolist() == [1.0]
    assert from_wkt(["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"]).total_bounds.tolist() == [
        0.0, 0.0, 2.0, 2.0,
    ]


def test_geodataset_roundtrip(ray_session):
    import ray.data

    from geopandas_ray.frame import GeoDataset

    t = pa.table({
        "fid": pa.array([0, 1, 2]),
        "geometry": W.points_to_wkb(
            np.array([1.0, 2.0, 3.0]), np.array([4.0, 5.0, 6.0])
        ),
    })
    gd = GeoDataset(ray.data.from_arrow(t), crs="EPSG:4326")
    df = gd.to_pandas(geometry_dtype=True)
    assert isinstance(df["geometry"].dtype, GeometryDtype)
    assert df["geometry"].array.crs == "EPSG:4326"
    assert np.array_equal(df["geometry"].array.y, [4.0, 5.0, 6.0])
    # plain pull unchanged (value-hash surface): bytes column
    plain = gd.to_pandas()
    assert isinstance(plain["geometry"].iloc[0], bytes)
    back = GeoDataset.from_pandas(df.sort_values("fid"))
    assert back.crs == "EPSG:4326"
    t2 = back.to_pandas().sort_values("fid")
    assert t2["geometry"].tolist() == plain["geometry"].tolist()


def test_geo_accessor():
    s = pd.Series(points_from_xy([1.0, 3.0], [2.0, 4.0], crs="EPSG:4326"))
    assert s.geo.x.tolist() == [1.0, 3.0]
    assert s.geo.y.tolist() == [2.0, 4.0]
    assert s.geo.crs == "EPSG:4326"
    assert s.geo.geom_type.tolist() == ["Point", "Point"]
    assert s.geo.bounds.columns.tolist() == ["minx", "miny", "maxx", "maxy"]
    assert s.geo.total_bounds.tolist() == [1.0, 2.0, 3.0, 4.0]
    m = s.geo.to_crs("EPSG:3857")
    assert isinstance(m.array, GeometryArray) and m.array.crs == "EPSG:3857"
    assert s.geo.to_wkt().tolist() == ["POINT (1 2)", "POINT (3 4)"]
    poly = pd.Series(from_wkt(["POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"]))
    assert poly.geo.area.tolist() == [4.0]
    assert poly.geo.centroid.geo.x.tolist() == [1.0]
    # non-geometry series refuses the accessor
    with pytest.raises(AttributeError, match="geometry-dtyped"):
        pd.Series([1, 2]).geo.area
