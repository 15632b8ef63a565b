"""Native Shapefile + GeoPackage IO (sources/shapefile.py, geopackage.py).

The readers are validated two ways: roundtrip through our writer, AND
against hand-crafted spec-conformant bytes (so a shared misunderstanding of
the format cannot hide in a roundtrip)."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray import GeoDataset
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.shapefile import read_shapefile, write_shapefile
from geopandas_ray.sources.geopackage import (
    _parse_gpkg_blob,
    read_geopackage,
    write_geopackage,
)


def _points_ds(n=5):
    return ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array(np.arange(n), type=pa.int64()),
                "name": pa.array([f"pt{i}" for i in range(n)]),
                "w": pa.array(np.arange(n) * 0.5),
                "geometry": W.points_to_wkb(
                    np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64) * 2
                ),
            }
        )
    )


# --- shapefile ---------------------------------------------------------------


def test_shp_point_roundtrip(tmp_path):
    p = str(tmp_path / "pts.shp")
    write_shapefile(_points_ds(), p)
    back = read_shapefile(p).to_pandas().sort_values("pid")
    assert back["pid"].tolist() == [0, 1, 2, 3, 4]
    assert back["name"].tolist() == ["pt0", "pt1", "pt2", "pt3", "pt4"]
    assert back["w"].tolist() == [0.0, 0.5, 1.0, 1.5, 2.0]
    gd = GeoDataset(ray.data.from_pandas(back)).get_coordinates().to_pandas()
    assert gd["x"].tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert gd["y"].tolist() == [0.0, 2.0, 4.0, 6.0, 8.0]


def test_shp_polygon_hole_and_multi_roundtrip(tmp_path):
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=np.float64)
    from geopandas_ray.stages.clip import _parts_to_wkb

    poly_hole = _parts_to_wkb([(3, [shell, hole])])
    multi = _parts_to_wkb(
        [(3, [shell + 100.0]), (3, [shell + 200.0])]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "gid": pa.array([0, 1], type=pa.int64()),
                "geometry": pa.array([poly_hole, multi], type=pa.large_binary()),
            }
        )
    )
    p = str(tmp_path / "polys.shp")
    write_shapefile(ds, p)
    back = GeoDataset(read_shapefile(p)).area().to_pandas().sort_values("gid")
    assert back["area"].tolist() == [96.0, 200.0]  # 100-4, two 10x10 shells
    types = GeoDataset(read_shapefile(p)).geom_type().to_pandas().sort_values("gid")
    assert types["geom_type"].tolist() == ["Polygon", "MultiPolygon"]


def test_shp_lines_and_null_rows(tmp_path):
    from geopandas_ray.stages.clip import _parts_to_wkb

    line = _parts_to_wkb([(2, [np.array([[0, 0], [3, 4]], dtype=np.float64)])])
    mline = _parts_to_wkb(
        [
            (2, [np.array([[0, 0], [0, 5]], dtype=np.float64)]),
            (2, [np.array([[1, 0], [1, 7]], dtype=np.float64)]),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "gid": pa.array([0, 1, 2], type=pa.int64()),
                "geometry": pa.array([line, mline, None], type=pa.large_binary()),
            }
        )
    )
    p = str(tmp_path / "lines.shp")
    write_shapefile(ds, p)
    back = GeoDataset(read_shapefile(p)).length().to_pandas().sort_values("gid")
    assert back["length"].tolist()[:2] == [5.0, 12.0]
    assert np.isnan(back["length"].tolist()[2]) or back["length"].tolist()[2] == 0.0
    na = GeoDataset(read_shapefile(p)).isna().to_pandas().sort_values("gid")
    assert na["isna"].tolist() == [False, False, True]


def test_shp_reader_against_handcrafted_bytes(tmp_path):
    """A spec-conformant point shapefile written byte-by-byte from the ESRI
    whitepaper (independent of our writer)."""
    content = struct.pack("<i2d", 1, 3.0, 4.0)  # Point(3,4)
    rec = struct.pack(">2i", 1, len(content) // 2) + content
    header = (
        struct.pack(">7i", 9994, 0, 0, 0, 0, 0, (100 + len(rec)) // 2)
        + struct.pack("<2i", 1000, 1)
        + struct.pack("<8d", 3.0, 4.0, 3.0, 4.0, 0, 0, 0, 0)
    )
    (tmp_path / "hand.shp").write_bytes(header + rec)
    shx = (
        struct.pack(">7i", 9994, 0, 0, 0, 0, 0, (100 + 8) // 2)
        + struct.pack("<2i", 1000, 1)
        + struct.pack("<8d", 3.0, 4.0, 3.0, 4.0, 0, 0, 0, 0)
        + struct.pack(">2i", 100 // 2, len(content) // 2)
    )
    (tmp_path / "hand.shx").write_bytes(shx)
    # dBASE III: ID (N,4) + NAME (C,5), one record
    dbf = struct.pack("<B3BIHH20x", 0x03, 26, 8, 18, 1, 32 + 64 + 1, 1 + 4 + 5)
    dbf += struct.pack("<11sc4xBB14x", b"ID", b"N", 4, 0)
    dbf += struct.pack("<11sc4xBB14x", b"NAME", b"C", 5, 0)
    dbf += b"\x0d"
    dbf += b" " + b"  42" + b"abc  " + b"\x1a"
    (tmp_path / "hand.dbf").write_bytes(dbf)
    back = read_shapefile(str(tmp_path / "hand.shp")).to_pandas()
    assert back["ID"].tolist() == [42]
    assert back["NAME"].tolist() == ["abc"]
    xy = GeoDataset(ray.data.from_pandas(back)).get_coordinates().to_pandas()
    assert xy[["x", "y"]].values.tolist() == [[3.0, 4.0]]


def test_shp_reader_without_shx(tmp_path):
    p = str(tmp_path / "pts.shp")
    write_shapefile(_points_ds(3), p)
    import os

    os.remove(str(tmp_path / "pts.shx"))
    back = read_shapefile(p).to_pandas()
    assert len(back) == 3


def test_read_file_dispatch_shp_with_bbox(tmp_path):
    from geopandas_ray.sources.geojson import read_file

    p = str(tmp_path / "pts.shp")
    write_shapefile(_points_ds(), p)
    ds = read_file(p, bbox=(0.0, 0.0, 1.5, 10.0))
    assert ds.count() == 2  # points x=0,1
    ds2 = read_file(p, columns=["pid"], rows=3)
    assert ds2.count() == 3
    assert set(ds2.schema().names) == {"pid", "geometry"}


def test_shp_mixed_types_refused(tmp_path):
    from geopandas_ray.stages.clip import _parts_to_wkb

    line = _parts_to_wkb([(2, [np.array([[0, 0], [1, 1]], dtype=np.float64)])])
    pt = W.points_to_wkb([0.0], [0.0])[0].as_py()
    ds = ray.data.from_arrow(
        pa.table({"geometry": pa.array([line, pt], type=pa.large_binary())})
    )
    with pytest.raises(ValueError):
        write_shapefile(ds, str(tmp_path / "bad.shp"))


# --- geopackage --------------------------------------------------------------


def test_gpkg_roundtrip(tmp_path):
    p = str(tmp_path / "pts.gpkg")
    write_geopackage(_points_ds(), p)
    back = read_geopackage(p).to_pandas().sort_values("pid")
    assert back["pid"].tolist() == [0, 1, 2, 3, 4]
    assert back["name"].tolist() == ["pt0", "pt1", "pt2", "pt3", "pt4"]
    assert back["w"].tolist() == [0.0, 0.5, 1.0, 1.5, 2.0]
    assert "fid" in back.columns
    gd = GeoDataset(ray.data.from_pandas(back.drop(columns=["fid"]))).get_coordinates()
    assert gd.to_pandas()["x"].tolist() == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_gpkg_spec_tables_and_header(tmp_path):
    import sqlite3

    p = str(tmp_path / "pts.gpkg")
    write_geopackage(_points_ds(2), p)
    con = sqlite3.connect(p)
    app_id = con.execute("PRAGMA application_id").fetchone()[0]
    assert app_id == 0x47504B47
    c = con.execute(
        "SELECT table_name, data_type, min_x, max_y FROM gpkg_contents"
    ).fetchone()
    assert c[0] == "pts" and c[1] == "features" and c[2] == 0.0 and c[3] == 2.0
    gc = con.execute("SELECT column_name FROM gpkg_geometry_columns").fetchone()
    assert gc[0] == "geometry"
    blob = con.execute('SELECT geometry FROM "pts" LIMIT 1').fetchone()[0]
    con.close()
    assert blob[:2] == b"GP"
    wkb = _parse_gpkg_blob(blob)
    xy = GeoDataset(
        ray.data.from_arrow(pa.table({"geometry": pa.array([wkb], type=pa.large_binary())}))
    ).get_coordinates().to_pandas()
    assert xy[["x", "y"]].values.tolist() == [[0.0, 0.0]]


def test_gpkg_blob_with_envelope_parses():
    # envelope indicator 1 (xy): header 8 + 32 bytes, then WKB
    wkb = W.points_to_wkb([7.0], [8.0])[0].as_py()
    blob = b"GP\x00" + bytes([0b00000011]) + struct.pack("<i", 0)
    blob += struct.pack("<4d", 7.0, 8.0, 7.0, 8.0) + wkb
    assert _parse_gpkg_blob(blob) == wkb
    assert _parse_gpkg_blob(None) is None
    with pytest.raises(ValueError):
        _parse_gpkg_blob(b"XX\x00\x01" + b"\x00" * 8)


def test_read_file_dispatch_gpkg(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file

    p = str(tmp_path / "pts.gpkg")
    to_file(_points_ds(), p)
    ds = read_file(p, bbox=(0.0, 0.0, 1.5, 10.0), columns=["pid"])
    assert ds.count() == 2
    assert set(ds.schema().names) == {"pid", "geometry"}


def test_facade_roundtrip_shp_gpkg(tmp_path):
    gd = GeoDataset(_points_ds())
    gd.to_file(str(tmp_path / "a.shp"))
    gd.to_file(str(tmp_path / "a.gpkg"))
    a = GeoDataset.read_file(str(tmp_path / "a.shp")).area().to_pandas()
    b = GeoDataset.read_file(str(tmp_path / "a.gpkg")).area().to_pandas()
    assert len(a) == len(b) == 5


def test_shp_sharded_read_matches_single_shard(tmp_path):
    p = str(tmp_path / "many.shp")
    write_shapefile(_points_ds(23), p)
    one = read_shapefile(p).to_pandas().sort_values("pid").reset_index(drop=True)
    many = (
        read_shapefile(p, shard_records=4).to_pandas().sort_values("pid").reset_index(drop=True)
    )
    assert one.equals(many) and len(many) == 23


def test_shp_pointz_and_handcrafted_polygon_hole(tmp_path):
    # PointZ (type 11): x,y,z,m — Z/M dropped on read
    content = struct.pack("<i4d", 11, 1.5, 2.5, 9.0, 0.0)
    rec = struct.pack(">2i", 1, len(content) // 2) + content
    # spec polygon: CW shell + CCW hole, one record
    shell = np.array([[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]], dtype=np.float64)  # CW (y-up)
    hole = np.array([[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]], dtype=np.float64)  # CCW
    pts = np.concatenate([shell, hole])
    pcontent = struct.pack("<i4d2i", 5, 0.0, 0.0, 10.0, 10.0, 2, len(pts))
    pcontent += np.array([0, 5], dtype="<i4").tobytes()
    pcontent += np.ascontiguousarray(pts, dtype="<f8").tobytes()
    prec = struct.pack(">2i", 2, len(pcontent) // 2) + pcontent

    def hdr(nbytes, stype):
        return (
            struct.pack(">7i", 9994, 0, 0, 0, 0, 0, nbytes // 2)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<8d", 0, 0, 10, 10, 0, 0, 0, 0)
        )

    # file 1: the PointZ
    (tmp_path / "z.shp").write_bytes(hdr(100 + len(rec), 11) + rec)
    (tmp_path / "z.shx").write_bytes(
        hdr(108, 11) + struct.pack(">2i", 50, len(content) // 2)
    )
    got = GeoDataset(read_shapefile(str(tmp_path / "z.shp"))).get_coordinates().to_pandas()
    assert got[["x", "y"]].values.tolist() == [[1.5, 2.5]]
    # file 2: the spec-wound polygon with hole
    (tmp_path / "h.shp").write_bytes(hdr(100 + len(prec), 5) + prec)
    (tmp_path / "h.shx").write_bytes(
        hdr(108, 5) + struct.pack(">2i", 50, len(pcontent) // 2)
    )
    area = GeoDataset(read_shapefile(str(tmp_path / "h.shp"))).area().to_pandas()
    assert area["area"].tolist() == [96.0]  # 100 shell - 4 hole


def test_shp_gpkg_empty_dataset(tmp_path):
    empty = ray.data.from_arrow(
        pa.table({"pid": pa.array([], type=pa.int64()),
                  "geometry": pa.array([], type=pa.large_binary())})
    )
    p = str(tmp_path / "e.shp")
    write_shapefile(empty, p)
    assert read_shapefile(p).count() == 0
    g = str(tmp_path / "e.gpkg")
    write_geopackage(empty, g)
    assert read_geopackage(g).count() == 0


def test_sindex_empty_dataset():
    from geopandas_ray.stages.sindex import DistributedSpatialIndex

    empty = ray.data.from_arrow(
        pa.table({"geometry": pa.array([], type=pa.large_binary())})
    )
    idx = DistributedSpatialIndex(empty)
    assert idx.is_empty and len(idx) == 0
    got = idx.query(W.points_to_wkb([1.0], [1.0])[0].as_py())
    assert len(got) == 0
    near = idx.nearest([W.points_to_wkb([1.0], [1.0])[0].as_py()])
    assert near.shape == (2, 0)
