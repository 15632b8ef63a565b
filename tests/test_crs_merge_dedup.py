import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.crs import (
    check_crs,
    crs_mismatch_error,
    estimate_utm_zone,
    register_transform,
    to_crs,
)
from geopandas_ray.functions.geom_dedup import (
    drop_duplicate_geometries,
    geometry_value_counts,
)
from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.merge import asof_join, broadcast_join, hash_join


def test_check_crs():
    assert check_crs(None, "EPSG:4326")
    assert check_crs("EPSG:4326", "EPSG:4326")
    assert not check_crs("EPSG:4326", "EPSG:3857")
    assert "CRS mismatch" in str(crs_mismatch_error("a", "b"))


def test_to_crs_linear_roundtrip():
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0], type=pa.int64()), "geometry": W.points_to_wkb([500000.0], [4000000.0])})
    )
    km = to_crs(ds, "EPSG:32600", "EPSG:32600+km").to_pandas()
    g = W.from_wkb(km.geometry.tolist())
    assert np.allclose(g.coords[0], [500.0, 4000.0])
    with pytest.raises(NotImplementedError):
        to_crs(ds, "EPSG:1", "EPSG:2")
    register_transform("EPSG:1", "EPSG:2", lambda x, y: (x + 1, y))
    out = to_crs(ds, "EPSG:1", "EPSG:2").to_pandas()
    assert np.allclose(W.from_wkb(out.geometry.tolist()).coords[0], [500001.0, 4000000.0])


def test_estimate_utm_zone():
    assert estimate_utm_zone((-3.0, 40.0, -3.0, 40.0)) == "EPSG:32630"  # Madrid-ish
    assert estimate_utm_zone((151.0, -33.0, 151.0, -33.0)) == "EPSG:32756"  # Sydney


def test_geometry_dedup_and_value_counts():
    wkb = W.points_to_wkb([1.0, 2.0, 1.0, 3.0, 1.0], [1.0, 2.0, 1.0, 3.0, 1.0])
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([4, 1, 0, 2, 3], type=pa.int64()), "geometry": wkb})
    )
    d = drop_duplicate_geometries(ds, id_col="id").to_pandas()
    assert len(d) == 3
    # (1,1) appears as ids 4,0,3 -> keeps min id 0
    g = W.from_wkb(d.geometry.tolist())
    row11 = d[(g.coords[:, 0] == 1.0)]
    assert row11.id.tolist() == [0]
    vc = geometry_value_counts(ds).to_pandas()
    assert sorted(vc["count"]) == [1, 1, 3]


def test_hash_join_matches_pandas(rng):
    left = pd.DataFrame({"k": rng.randint(0, 20, 200), "v": np.arange(200)})
    right = pd.DataFrame({"k": np.arange(15), "w": np.arange(15) * 10})
    lds = ray.data.from_pandas(left)
    rds = ray.data.from_pandas(right)
    got = hash_join(lds, rds, on="k").to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    want = left.merge(right, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns].astype(want.dtypes.to_dict()), want)


def test_broadcast_join(rng):
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}))
    right = pa.table({"k": pa.array([1, 3], type=pa.int64()), "name": pa.array(["a", "c"])})
    j = broadcast_join(left, right, on="k").to_pandas().sort_values("k")
    assert j.k.tolist() == [1, 3] and j.name.tolist() == ["a", "c"]


def test_asof_join_matches_pandas():
    ev = pd.DataFrame(
        {
            "key": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2020-01-01 10:00", "2020-01-01 11:00", "2020-01-02 00:00", "2020-01-01 00:00", "2020-01-05 00:00"]
            ),
            "eid": [0, 1, 2, 3, 4],
        }
    )
    quotes = pd.DataFrame(
        {
            "key": [1, 1, 2],
            "qts": pd.to_datetime(["2020-01-01 09:00", "2020-01-01 10:30", "2020-01-03 00:00"]),
            "price": [100.0, 200.0, 300.0],
        }
    )
    got = (
        asof_join(
            ray.data.from_pandas(ev),
            ray.data.from_pandas(quotes),
            key="key",
            left_ts="ts",
            right_ts="qts",
        )
        .to_pandas()
        .sort_values("eid")
    )
    assert got.price.tolist()[:3] == [100.0, 200.0, 200.0]
    assert np.isnan(got.price.tolist()[3])
    assert got.price.tolist()[4] == 300.0


def test_real_projections_webmercator_utm():
    import numpy as np
    from geopandas_ray.crs import (
        _lonlat_to_utm,
        _lonlat_to_webmercator,
        _utm_to_lonlat,
        _webmercator_to_lonlat,
    )

    # public anchor constants
    x, y = _lonlat_to_webmercator(np.array([180.0, 0.0]), np.array([0.0, 45.0]))
    assert abs(x[0] - 20037508.342789244) < 1e-6
    assert abs(y[1] - 5621521.486192335) < 1e-6
    lon, lat = _webmercator_to_lonlat(x, y)
    assert np.allclose(lon, [180.0, 0.0], atol=1e-12)
    assert np.allclose(lat, [0.0, 45.0], atol=1e-12)
    # UTM zone 33N central-meridian anchor + CN Tower (published example)
    E, N = _lonlat_to_utm(np.array([15.0]), np.array([0.0]), 33, False)
    assert abs(E[0] - 500000.0) < 1e-6 and abs(N[0]) < 1e-6
    E, N = _lonlat_to_utm(np.array([-79.387139]), np.array([43.642567]), 17, False)
    assert abs(E[0] - 630084) < 2.0 and abs(N[0] - 4833438) < 2.0
    # zone-wide round trip
    rng = np.random.RandomState(0)
    lon = 15.0 + rng.uniform(-3, 3, 500)
    lat = rng.uniform(-80, 84, 500)
    E, N = _lonlat_to_utm(lon, lat, 33, False)
    lon2, lat2 = _utm_to_lonlat(E, N, 33, False)
    assert max(np.abs(lon2 - lon).max(), np.abs(lat2 - lat).max()) < 1e-9


def test_to_crs_builtin_projections():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from geopandas_ray.crs import to_crs
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.geom.wkb import from_wkb, points_to_wkb

    lon = np.array([15.0, 14.0, 16.5])
    lat = np.array([0.0, 52.0, -33.0])
    d = ray.data.from_arrow(pa.table({"id": pa.array([0, 1, 2]), "geometry": points_to_wkb(lon, lat)}))
    m = to_crs(d, "EPSG:4326", "EPSG:3857").to_pandas().sort_values("id")
    g = from_wkb(m.geometry.tolist())
    px, py = g.coords[:, 0], g.coords[:, 1]
    assert abs(px[0] - 15.0 * 20037508.342789244 / 180.0) < 1e-6
    # 4326 -> UTM 33N -> back through the chained 3857 path
    u = to_crs(d, "EPSG:4326", "EPSG:32633").to_pandas().sort_values("id")
    gu = from_wkb(u.geometry.tolist())
    assert abs(gu.coords[0, 0] - 500000.0) < 1e-6
    back = to_crs(
        to_crs(d, "EPSG:4326", "EPSG:32633"), "EPSG:32633", "EPSG:4326"
    ).to_pandas().sort_values("id")
    gb = from_wkb(back.geometry.tolist())
    assert np.allclose(gb.coords[:, 0], lon, atol=1e-9)
    assert np.allclose(gb.coords[:, 1], lat, atol=1e-9)
    import pytest

    with pytest.raises(NotImplementedError):
        to_crs(d, "EPSG:4326", "EPSG:9999")


def test_concat_axis1():
    # tests/test_merge.py:174-209: axis=1 zips row-aligned frames; a
    # duplicate geometry column name fails with the reference message
    import pyarrow as pa
    import pytest
    import ray.data
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.stages.merge import concat_columns

    gdf = ray.data.from_arrow(
        pa.table({"geometry": points_to_wkb([1.0, 2.0], [3.0, 4.0]), "a": [1, 2]})
    )
    df = ray.data.from_arrow(pa.table({"b": [10, 20], "c": ["x", "y"]}))
    out = concat_columns([gdf, df]).to_pandas()
    assert sorted(out.columns) == ["a", "b", "c", "geometry"]
    assert len(out) == 2 and out.b.tolist() == [10, 20]

    with pytest.raises(ValueError, match="multiple columns using the geometry column name 'geometry'"):
        concat_columns([gdf, gdf])

    g2 = gdf.map_batches(lambda t: t.rename_columns(["geom", "a"]), batch_format="pyarrow")
    with pytest.raises(ValueError, match="'geom'"):
        concat_columns([g2, g2], geometry_cols=["geom", "geom"])
