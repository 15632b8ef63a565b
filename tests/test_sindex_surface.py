"""Public sindex surface + feature-dict IO + round-4 facade parity fills.

Reference parity targets: geopandas/sindex.py (query/nearest/intersection,
positional indices, predicate orientation :81-87, exclusive :258-260),
geodataframe.py:638 __geo_interface__ / :667 iterfeatures / from_dict.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray import GeoDataset
from geopandas_ray.geom import wkb as W


def _boxes_gd(n=10, step=10.0, size=4.0):
    x0 = np.arange(n) * step
    ds = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array(np.arange(n), type=pa.int64()),
                "geometry": W.boxes_to_wkb(x0, x0, x0 + size, x0 + size),
            }
        )
    ).repartition(3)
    return GeoDataset(ds)


def _pt(x, y):
    return W.points_to_wkb(np.asarray([x]), np.asarray([y]))[0].as_py()


def _box(x0, y0, x1, y1):
    return W.boxes_to_wkb([x0], [y0], [x1], [y1])[0].as_py()


# --- sindex.query -----------------------------------------------------------


def test_sindex_query_scalar_positions():
    gd = _boxes_gd()
    idx = gd.sindex
    assert gd.has_sindex
    assert len(idx) == 10 and not idx.is_empty
    # probe box overlapping rows 0 and 1 (boxes at 0..4 and 10..14)
    got = idx.query(_box(3.0, 3.0, 11.0, 11.0), sort=True)
    assert got.tolist() == [0, 1]


def test_sindex_query_array_predicates():
    gd = _boxes_gd()
    idx = gd.sindex
    probes = [_pt(2.0, 2.0), _pt(12.0, 12.0), _pt(500.0, 500.0)]
    res = idx.query(probes, predicate="within", sort=True)
    assert res.shape[0] == 2
    assert res[0].tolist() == [0, 1]  # input indices
    assert res[1].tolist() == [0, 1]  # tree positions
    # contains never true for a point probe vs a rect
    res2 = idx.query(probes, predicate="contains", sort=True)
    assert res2.shape == (2, 0)
    # dwithin requires distance
    with pytest.raises(ValueError):
        idx.query(probes, predicate="bogus")
    res3 = idx.query([_pt(6.0, 6.0)], predicate="dwithin", distance=3.0, sort=True)
    assert res3[1].tolist() == [0]  # box 0 ends at 4, gap 2*sqrt(2) < 3


def test_sindex_intersection_bounds():
    idx = _boxes_gd().sindex
    got = idx.intersection((0.0, 0.0, 15.0, 15.0))
    assert got.tolist() == [0, 1]


# --- sindex.nearest ---------------------------------------------------------


def test_sindex_nearest_ties_and_distance():
    gd = _boxes_gd()
    idx = gd.sindex
    # equidistant between box 0 (ends 4) and box 1 (starts 10) at x=y=7
    res, dist = idx.nearest([_pt(7.0, 7.0)], return_all=True, return_distance=True)
    assert res[0].tolist() == [0, 0]
    assert sorted(res[1].tolist()) == [0, 1]
    assert np.allclose(dist, np.hypot(3.0, 3.0))
    one = idx.nearest([_pt(7.0, 7.0)], return_all=False)
    assert one.shape == (2, 1)
    assert one[1, 0] in (0, 1)


def test_sindex_nearest_max_distance_and_exclusive():
    gd = _boxes_gd()
    idx = gd.sindex
    far = idx.nearest([_pt(7.0, 7.0)], max_distance=1.0)
    assert far.shape == (2, 0)
    # a probe equal to box 3: exclusive skips the zero-distance self
    self_probe = _box(30.0, 30.0, 34.0, 34.0)
    inc = idx.nearest([self_probe], return_distance=True)
    assert inc[0][1].tolist() == [3] and inc[1][0] == 0.0
    exc, d = idx.nearest([self_probe], exclusive=True, return_distance=True)
    assert 3 not in exc[1].tolist() and d[0] > 0.0


def test_sindex_take_rows_gather():
    idx = _boxes_gd().sindex
    t = idx.take_rows([9, 0, 5], columns=["zid"])
    assert t.column("zid").to_pylist() == [9, 0, 5]
    with pytest.raises(IndexError):
        idx.take_rows([10])
    assert idx.take_rows([], columns=["zid"]).num_rows == 0


def test_sindex_positions_are_global_across_blocks():
    # 10 rows over 3 blocks: positions must be dataset-global, not per-block
    idx = _boxes_gd().sindex
    got = idx.query(_box(82.0, 82.0, 95.0, 95.0), sort=True)
    assert got.tolist() == [8, 9]


# --- feature-dict surface ---------------------------------------------------


def test_iterfeatures_and_geo_dict_roundtrip():
    gd = _boxes_gd(n=4)
    feats = list(gd.iterfeatures(show_bbox=True))
    assert [f["id"] for f in feats] == ["0", "1", "2", "3"]
    assert feats[1]["bbox"] == (10.0, 10.0, 14.0, 14.0)
    d = gd.to_geo_dict(show_bbox=True)
    assert d["type"] == "FeatureCollection" and len(d["features"]) == 4
    assert d["bbox"] == (0.0, 0.0, 34.0, 34.0)
    # __geo_interface__ is the bboxed dict
    assert gd.__geo_interface__["bbox"] == d["bbox"]
    # roundtrip through from_features preserves geometry + properties
    back = GeoDataset.from_features(d["features"])
    assert back.area().to_pandas()["area"].tolist() == [16.0] * 4


def test_iterfeatures_na_modes():
    gd = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "v": pa.array([1, None], type=pa.int64()),
                    "geometry": W.points_to_wkb([0.0, 1.0], [0.0, 1.0]),
                }
            )
        )
    )
    null_fts = list(gd.iterfeatures(na="null"))
    assert null_fts[1]["properties"] == {"v": None}
    drop_fts = list(gd.iterfeatures(na="drop"))
    assert drop_fts[1]["properties"] == {}
    with pytest.raises(ValueError):
        list(gd.iterfeatures(na="bogus"))


def test_from_dict_mixed_geometry_inputs():
    gd = GeoDataset.from_dict(
        {
            "name": ["wkb", "dict", "wkt", "none"],
            "geometry": [
                _pt(1.0, 2.0),
                {"type": "Point", "coordinates": [3.0, 4.0]},
                "POINT (5 6)",
                None,
            ],
        }
    )
    df = gd.get_coordinates()
    assert df.to_pandas()[["x", "y"]].values.tolist() == [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
    assert gd.isna().to_pandas()["isna"].tolist() == [False, False, False, True]


# --- wkb / arrow facade -----------------------------------------------------


def test_facade_wkb_and_arrow_roundtrip():
    gd = _boxes_gd(n=3)
    wk = gd.to_wkb().to_pandas()
    assert (wk["wkb"] == wk["geometry"]).all()
    # from_wkb re-parses a binary column into canonical encoding
    back = GeoDataset.from_wkb(gd.to_wkb().ds.drop_columns(["geometry"]), column="wkb")
    assert back.area().to_pandas()["area"].tolist() == [16.0] * 3
    # to_arrow -> from_arrow roundtrip through the geoarrow encodings
    enc = gd.to_arrow(encoding="polygon")
    back2 = GeoDataset.from_arrow(enc, "polygon")
    assert back2.area().to_pandas()["area"].tolist() == [16.0] * 3


# --- read_file bbox / mask --------------------------------------------------


def test_read_file_bbox_and_mask(tmp_path):
    gd = _boxes_gd(n=5)
    from geopandas_ray.sources.geojson import read_file, to_file

    to_file(gd.ds, str(tmp_path / "f"))
    full = read_file(str(tmp_path / "f"))
    assert full.count() == 5
    bb = read_file(str(tmp_path / "f"), bbox=(0.0, 0.0, 12.0, 12.0))
    assert bb.count() == 2
    mk = read_file(str(tmp_path / "f"), mask=_box(0.0, 0.0, 12.0, 12.0))
    assert mk.count() == 2
    # mask is exact intersects: a thin diagonal-corner box misses box 1
    mk2 = read_file(str(tmp_path / "f"), mask={"type": "Point", "coordinates": [2.0, 2.0]})
    assert mk2.count() == 1
    with pytest.raises(ValueError):
        read_file(str(tmp_path / "f"), bbox=(0, 0, 1, 1), mask=_pt(0.0, 0.0))
    rows2 = read_file(str(tmp_path / "f"), bbox=(0.0, 0.0, 50.0, 50.0), rows=2)
    assert rows2.count() == 2


# --- small facade parity fills ----------------------------------------------


def test_facade_predicate_fills():
    gd = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "geometry": W.points_to_wkb([2.0, 50.0], [2.0, 50.0]),
                }
            )
        )
    )
    zone = _box(0.0, 0.0, 4.0, 4.0)
    df = gd.dwithin(zone, distance=1.0).to_pandas()
    assert df["dwithin"].tolist() == [True, False]
    df2 = gd.contains_properly(zone).to_pandas()
    assert df2["contains_properly"].tolist() == [False, False]
    df3 = gd.relate_pattern(zone, "T********").to_pandas()
    assert df3["relate_pattern"].tolist() == [True, False]
    df4 = gd.geom_almost_equals(_pt(2.0, 2.0 + 1e-9)).to_pandas()
    assert df4["geom_almost_equals"].tolist() == [True, False]


def test_facade_mbc_unary_union_aliases():
    gd = _boxes_gd(n=2)
    df = gd.minimum_bounding_radius().to_pandas()
    assert np.allclose(df["minimum_bounding_radius"], 2.0 * np.sqrt(2.0))
    u = gd.unary_union()
    assert isinstance(u, bytes)
    assert gd.active_geometry_name == "geometry"
    # deprecated aliases resolve
    assert GeoDataset.from_file.__func__ is GeoDataset.read_file.__func__
    tdf = gd.type().to_pandas()
    assert set(tdf["geom_type"]) == {"Polygon"}
    ndf = gd.isnull().to_pandas()
    assert ndf["isna"].tolist() == [False, False]


def test_facade_merge_and_concat():
    import geopandas_ray as gr

    gd = _boxes_gd(n=4)
    dim = pa.table({"zid": pa.array([0, 1, 2, 3], type=pa.int64()),
                    "label": pa.array(list("abcd"))})
    m = gd.merge(dim, on="zid").to_pandas().sort_values("zid")
    assert m["label"].tolist() == ["a", "b", "c", "d"]
    # hash-join plan for a Dataset right side
    m2 = gd.merge(ray.data.from_arrow(dim), on="zid", how="inner").to_pandas()
    assert sorted(m2["label"]) == ["a", "b", "c", "d"]
    # module-level concat axis=0 with CRS rules
    a = GeoDataset(_boxes_gd(2).ds, crs="EPSG:4326")
    b = GeoDataset(_boxes_gd(3).ds, crs="EPSG:4326")
    cat = gr.concat([a, b])
    assert cat.count() == 5 and cat.crs == "EPSG:4326"
    with pytest.raises(ValueError):
        gr.concat([a, GeoDataset(_boxes_gd(2).ds, crs="EPSG:3857")])
    # merge_asof facade delegates
    ev = ray.data.from_arrow(pa.table({"k": pa.array([1, 1]), "t": pa.array([5, 9])}))
    st = ray.data.from_arrow(pa.table({"k": pa.array([1]), "t2": pa.array([4])}))
    got = GeoDataset(ev).merge_asof(st, key="k", left_ts="t", right_ts="t2").to_pandas()
    assert len(got) == 2
