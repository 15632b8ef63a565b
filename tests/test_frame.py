"""GeoPandas-shaped fluent facade (geopandas_ray.frame.GeoDataset)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray import GeoDataset
from geopandas_ray.geom import wkb as W
from geopandas_ray.geom import kernels as K


@pytest.fixture
def boxes():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array([0, 1, 2], type=pa.int64()),
                "cat": pa.array(["a", "a", "b"]),
                "geometry": W.boxes_to_wkb(
                    [0.0, 10.0, 100.0], [0.0, 10.0, 100.0], [4.0, 14.0, 104.0], [4.0, 14.0, 104.0]
                ),
            }
        )
    )
    return GeoDataset(ds)


def test_scalar_accessors_chain(boxes):
    df = boxes.area().length().to_pandas().sort_values("zid")
    assert df.area.tolist() == [16.0, 16.0, 16.0]
    assert df.length.tolist() == [16.0, 16.0, 16.0]


def test_geometry_out_replaces(boxes):
    df = boxes.centroid().get_coordinates().to_pandas().sort_values("zid")
    assert df.x.tolist() == [2.0, 12.0, 102.0]
    # buffer keeps fluency: grown squares have exactly the mitre area
    g = boxes.buffer(1.0, join_style="mitre").area().to_pandas()
    assert sorted(g.area.tolist()) == [36.0, 36.0, 36.0]


def test_cx_indexer_and_clip(boxes):
    assert boxes.cx[0:20, 0:20].count() == 2
    assert boxes.cx[:, 50:].count() == 1
    assert boxes.clip_by_rect(0, 0, 2, 2).count() == 1


def test_sjoin_and_dissolve(boxes):
    pts = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "pid": pa.array([0, 1], type=pa.int64()),
                    "geometry": W.points_to_wkb([1.0, 11.0], [1.0, 11.0]),
                }
            )
        )
    )
    j = pts.sjoin(boxes.ds.to_pandas().pipe(lambda d: pa.Table.from_pandas(d))).to_pandas()
    assert sorted(j.pid.tolist()) == [0, 1]
    d = boxes.dissolve(by="cat", aggfunc={"zid": "count"}).to_pandas()
    assert d.cat.tolist() == ["a", "b"]  # sort=True default
    areas = K.area(W.from_wkb(d.geometry.tolist()))
    assert sorted(areas.tolist()) == [16.0, 32.0]


def test_predicates_and_setops(boxes):
    other = W.boxes_to_wkb([2.0], [2.0], [6.0], [6.0])[0].as_py()
    p = boxes.intersects(other).to_pandas().sort_values("zid")
    assert p.intersects.tolist() == [True, False, False]
    inter = boxes.intersection(other).area().to_pandas().sort_values("zid")
    assert inter.area.fillna(0).tolist() == [4.0, 0.0, 0.0]


def test_crs_roundtrip(boxes):
    with pytest.raises(ValueError):
        boxes.to_crs("EPSG:3857")
    g = boxes.set_crs("EPSG:4326")
    with pytest.raises(ValueError):
        g.set_crs("EPSG:3857")
    g2 = g.set_crs("EPSG:3857", allow_override=True)
    assert g2.crs == "EPSG:3857"


def test_explode_and_total_bounds(boxes):
    assert np.allclose(boxes.total_bounds(), [0, 0, 104, 104])
    assert boxes.explode().count() == 3  # single-part stays 1:1


def test_to_parquet_roundtrip(boxes, tmp_path):
    boxes.to_parquet(str(tmp_path / "o"))
    back = GeoDataset.read_parquet(str(tmp_path / "o") + "/fragments")
    assert back.count() == 3


def test_constructors_and_serializers():
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0, 1], type=pa.int64()), "x": [1.0, 2.0], "y": [3.0, 4.0]})
    )
    g = GeoDataset.from_xy(ds)
    w = g.to_wkt().to_pandas().sort_values("id")
    assert w.wkt.tolist() == ["POINT (1 3)", "POINT (2 4)"]
    # wkt -> geometry -> json roundtrip keeps coordinates
    ds2 = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "wkt": ["POINT (5 6)"]})
    )
    j = GeoDataset.from_wkt(ds2).to_json().to_pandas()
    assert '"coordinates": [5.0, 6.0]' in j.feature_json.iloc[0] or "[5, 6]" in j.feature_json.iloc[0].replace(".0", "")
    f = GeoDataset.from_features(
        [{"type": "Feature", "properties": {"n": 1},
          "geometry": {"type": "Point", "coordinates": [7.0, 8.0]}}]
    )
    assert f.to_wkt().to_pandas().wkt.tolist() == ["POINT (7 8)"]


def test_facade_overlay_shuffle_matches_overlay():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from geopandas_ray.frame import GeoDataset
    from geopandas_ray.geom.wkb import boxes_to_wkb

    def layer(name, off):
        k = np.arange(20, dtype=np.int64)
        x = (k * 47 + off) % 300.0
        y = (k * 31 + off) % 300.0
        return GeoDataset(
            ray.data.from_arrow(
                pa.table({name: pa.array(k), "geometry": boxes_to_wkb(x, y, x + 40, y + 40)})
            )
        )

    a, b = layer("ak", 0), layer("bk", 17)
    want = a.overlay(b, "intersection").ds.to_pandas()
    got = a.overlay_shuffle(b, "intersection", left_id="ak", right_id="bk", res=4).ds.to_pandas()
    key = lambda df: sorted(
        (int(r.ak), int(r.bk), r.geometry.hex()) for r in df.itertuples(index=False)
    )
    assert key(got) == key(want) and len(got) > 0


def test_facade_sjoin_nearest_shuffle(boxes):
    pts = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "pid": pa.array([0, 1], type=pa.int64()),
                    "geometry": W.points_to_wkb([1.0, 11.0], [1.0, 11.0]),
                }
            )
        )
    )
    j = pts.sjoin_nearest_shuffle(
        boxes, max_distance=100.0, res=3, left_id="pid", right_id="zid",
        distance_col="d", salt=2,
    ).to_pandas()
    # both points sit inside a box -> distance 0 to their container
    assert (j.d == 0).all()
    assert set(j.pid) == {0, 1}


def test_facade_geometry_dedup_surface():
    # two distinct points, each duplicated; ids order the keep-first
    xs = [1.0, 1.0, 2.0, 2.0, 2.0]
    t = pa.table(
        {
            "gid": pa.array([4, 1, 2, 3, 5], type=pa.int64()),
            "geometry": W.points_to_wkb(xs, xs),
        }
    )
    g = GeoDataset(ray.data.from_arrow(t), crs="EPSG:4326")

    dd = g.drop_duplicates(id_col="gid").to_pandas()
    assert sorted(dd.gid.tolist()) == [1, 2]  # min id per duplicate set
    assert dd.geometry.nunique() == 2

    u = g.unique()
    assert isinstance(u, GeoDataset) and u.crs == "EPSG:4326"
    up = u.to_pandas()
    assert list(up.columns) == ["geometry"] and up.geometry.nunique() == 2 and len(up) == 2

    vc = g.value_counts().to_pandas()
    assert sorted(vc["count"].tolist()) == [2, 3]


def test_plot_explore_raise_actionable(boxes):
    # deliberate scope errors, not __getattr__'s Dataset AttributeError
    with pytest.raises(NotImplementedError, match="matplotlib"):
        boxes.plot()
    with pytest.raises(NotImplementedError, match="folium"):
        boxes.explore()
