"""Regression tests for the late-r4 self-review findings (code-review pass
over the session diff): every fix here had a concrete failure scenario."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray import GeoDataset
from geopandas_ray.geom import wkb as W


def _pts(n=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n), type=pa.int64()),
                "geometry": W.points_to_wkb(
                    np.arange(n, dtype=np.float64), np.zeros(n)
                ),
            }
        )
    )


def test_nearest_right_emits_index_left():
    from geopandas_ray.stages.nearest import sjoin_nearest

    left = _pts(3)
    right = ray.data.from_arrow(
        pa.table({"rid": pa.array([0, 1]), "geometry": W.points_to_wkb([0.2, 2.2], [0.0, 0.0])})
    )
    j = sjoin_nearest(left, right, how="right", left_index="pid").to_pandas()
    assert "index_left" in j.columns and "index_right" not in j.columns
    got = dict(zip(j["rid"], j["index_left"]))
    assert got == {0: 0, 1: 2}
    with pytest.raises(ValueError, match="left_index"):
        sjoin_nearest(left, right, how="right", right_index="rid")


def test_gpkg_all_null_shard_schema_stable(tmp_path):
    from geopandas_ray.sources.geopackage import read_geopackage, write_geopackage

    n = 8
    ds = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n), type=pa.int64()),
                "label": pa.array([None] * 4 + ["x"] * 4),  # first shard all-null
                "geometry": W.points_to_wkb(np.arange(n, dtype=float), np.zeros(n)),
            }
        )
    )
    p = str(tmp_path / "nulls.gpkg")
    write_geopackage(ds, p)
    back = read_geopackage(p, shard_rows=4).to_pandas().sort_values("pid")
    assert back["label"].tolist() == [None] * 4 + ["x"] * 4


def test_gpkg_sparse_rowids_shard_by_count(tmp_path):
    import sqlite3

    from geopandas_ray.sources.geopackage import read_geopackage, write_geopackage

    p = str(tmp_path / "sparse.gpkg")
    write_geopackage(_pts(10), p)
    con = sqlite3.connect(p)
    con.execute('DELETE FROM "sparse" WHERE fid % 2 = 0')  # rowid gaps
    con.commit()
    con.close()
    back = read_geopackage(p, shard_rows=2).to_pandas()
    assert len(back) == 5


def test_dbf_numeric_overflow_and_name_collision(tmp_path):
    from geopandas_ray.sources.shapefile import write_shapefile

    big = ray.data.from_arrow(
        pa.table(
            {
                "v": pa.array([-(2**63)], type=pa.int64()),  # 20 chars > N,19
                "geometry": W.points_to_wkb([0.0], [0.0]),
            }
        )
    )
    with pytest.raises(ValueError, match="width"):
        write_shapefile(big, str(tmp_path / "o.shp"))
    coll = ray.data.from_arrow(
        pa.table(
            {
                "attribute_one": pa.array([1]),
                "attribute_two": pa.array([2]),
                "geometry": W.points_to_wkb([0.0], [0.0]),
            }
        )
    )
    with pytest.raises(ValueError, match="collision"):
        write_shapefile(coll, str(tmp_path / "c.shp"))


def test_dbf_deleted_records_skipped(tmp_path):
    from geopandas_ray.sources.shapefile import read_shapefile, write_shapefile

    p = str(tmp_path / "del.shp")
    write_shapefile(_pts(3), p)
    # flip record 1's deletion flag to '*' in the dbf
    dbf = bytearray((tmp_path / "del.dbf").read_bytes())
    hsize, rsize = struct.unpack_from("<HH", dbf, 8)
    dbf[hsize + 1 * rsize] = 0x2A
    (tmp_path / "del.dbf").write_bytes(bytes(dbf))
    back = read_shapefile(p).to_pandas()
    assert sorted(back["pid"].tolist()) == [0, 2]


def test_facade_merge_outer_and_right_not_degraded():
    gd = GeoDataset(_pts(3))
    dim = pa.table({"pid": pa.array([1, 2, 9], type=pa.int64()), "lab": pa.array(list("abc"))})
    out = gd.merge(dim, on="pid", how="outer").to_pandas()
    assert len(out) == 4  # pids 0,1,2 + unmatched 9
    assert set(out.loc[out["lab"].notna(), "lab"]) == {"a", "b", "c"}
    r = gd.merge(dim, on="pid", how="right").to_pandas()
    assert len(r) == 3 and set(r["lab"]) == {"a", "b", "c"}


def test_sindex_exclusive_keeps_touching_nonequal():
    from geopandas_ray.stages.clip import _parts_to_wkb

    line = _parts_to_wkb([(2, [np.array([[0, 0], [10, 0]], dtype=np.float64)])])
    ds = ray.data.from_arrow(
        pa.table({"geometry": pa.array([line], type=pa.large_binary())})
    )
    idx = GeoDataset(ds).sindex
    probe = W.points_to_wkb([5.0], [0.0])[0].as_py()  # ON the line, not equal
    res, d = idx.nearest([probe], exclusive=True, return_distance=True)
    assert res[1].tolist() == [0] and d[0] == 0.0
    # but an equal geometry IS excluded
    ds2 = ray.data.from_arrow(
        pa.table({"geometry": pa.array([line, None], type=pa.large_binary())})
    )
    idx2 = GeoDataset(ds2).sindex
    res2 = idx2.nearest([line], exclusive=True)
    assert res2.shape == (2, 0)


def test_check_like_geometry_only():
    from geopandas_ray.testing import assert_geodataset_equal

    a = pa.table({"geometry": W.points_to_wkb([1.0, 2.0], [1.0, 2.0])})
    b = pa.table({"geometry": W.points_to_wkb([2.0, 1.0], [2.0, 1.0])})
    with pytest.raises(AssertionError):
        assert_geodataset_equal(a, b)
    assert_geodataset_equal(a, b, check_like=True)


def test_concat_axis1_keeps_crs_and_geometry_name():
    import geopandas_ray as gr

    g = GeoDataset(_pts(3), crs="EPSG:4326")
    other = ray.data.from_arrow(pa.table({"w": pa.array([1.0, 2.0, 3.0])}))
    cat = gr.concat([g, other], axis=1)
    assert cat.crs == "EPSG:4326" and cat.geometry == "geometry"
    assert cat.area().to_pandas()["area"].tolist() == [0.0, 0.0, 0.0]


def test_shapefile_writer_large_batch_linear(tmp_path):
    # sanity: the O(n) join-based assembly handles a larger write quickly
    from geopandas_ray.sources.shapefile import read_shapefile, write_shapefile

    n = 20000
    ds = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n), type=pa.int64()),
                "geometry": W.points_to_wkb(
                    np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64)
                ),
            }
        )
    )
    p = str(tmp_path / "big.shp")
    write_shapefile(ds, p)
    assert read_shapefile(p).count() == n
