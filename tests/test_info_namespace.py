"""Top-level namespace parity (reference __init__.py re-exports) and the
native ``list_layers`` probe (io/file.py _list_layers)."""
from __future__ import annotations

import json
import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import geopandas_ray as gr
from geopandas_ray import GeoDataset
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.info import list_layers


def test_top_level_exports_resolve():
    # classmethod access creates a fresh bound method each time: compare
    # the underlying functions
    assert gr.read_file.__func__ is GeoDataset.read_file.__func__
    assert gr.read_parquet.__func__ is GeoDataset.read_parquet.__func__
    assert gr.read_feather.__func__ is GeoDataset.read_feather.__func__
    assert gr.read_postgis.__func__ is GeoDataset.read_postgis.__func__
    assert gr.GeoDataFrame is GeoDataset
    assert callable(gr.sjoin) and callable(gr.sjoin_nearest)
    assert callable(gr.overlay) and callable(gr.clip)
    assert callable(gr.list_layers) and callable(gr.show_versions)
    with pytest.raises(AttributeError):
        gr.no_such_name


def test_functional_forms_match_methods():
    pts = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "pid": pa.array([0, 1], type=pa.int64()),
                    "geometry": W.points_to_wkb([1.0, 99.0], [1.0, 99.0]),
                }
            )
        )
    )
    boxes = GeoDataset(
        ray.data.from_arrow(
            pa.table(
                {
                    "zid": pa.array([7], type=pa.int64()),
                    "geometry": W.boxes_to_wkb(
                        np.array([0.0]), np.array([0.0]), np.array([5.0]), np.array([5.0])
                    ),
                }
            )
        )
    )
    j = gr.sjoin(pts, boxes).to_pandas()
    assert j.pid.tolist() == [0] and j.zid.tolist() == [7]
    c = gr.clip(pts, (0.0, 0.0, 5.0, 5.0)).to_pandas()
    assert c.pid.tolist() == [0]


def test_list_layers_shapefile(tmp_path):
    # write a real single-point shapefile through the engine's writer
    from geopandas_ray.sources.shapefile import write_shapefile

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1], type=pa.int64()),
                  "geometry": W.points_to_wkb([3.0], [4.0])})
    )
    p = str(tmp_path / "pts.shp")
    write_shapefile(ds, p)
    df = list_layers(p)
    assert df.columns.tolist() == ["name", "geometry_type"]
    assert df.name.tolist() == ["pts"]
    assert df.geometry_type.tolist() == ["Point"]


def test_list_layers_shapefile_header_codes(tmp_path):
    # hand-crafted header: shape type 5 (Polygon) at offset 32
    p = tmp_path / "z.shp"
    head = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", 50)
    head += struct.pack("<i", 1000) + struct.pack("<i", 5) + b"\x00" * 64
    p.write_bytes(head)
    df = list_layers(str(p))
    assert df.geometry_type.tolist() == ["Polygon"]


def test_list_layers_gpkg(tmp_path):
    p = str(tmp_path / "db.gpkg")
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, "
        "identifier TEXT, srs_id INTEGER)"
    )
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name "
        "TEXT, geometry_type_name TEXT, srs_id INTEGER, z INTEGER, m INTEGER)"
    )
    con.execute("INSERT INTO gpkg_contents VALUES ('roads','features','roads',0)")
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES ('roads','geom','MULTILINESTRING',0,0,0)"
    )
    con.execute("INSERT INTO gpkg_contents VALUES ('lookup','attributes','lookup',0)")
    con.commit()
    con.close()
    df = list_layers(p).set_index("name")
    assert df.loc["roads", "geometry_type"] == "MultiLineString"
    assert df.loc["lookup", "geometry_type"] is None  # non-spatial layer


def test_list_layers_fgb(tmp_path):
    from geopandas_ray.sources.flatgeobuf import write_flatgeobuf

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2], type=pa.int64()),
                  "geometry": W.points_to_wkb([0.0, 1.0], [0.0, 1.0])})
    )
    p = str(tmp_path / "pts.fgb")
    write_flatgeobuf(ds, p)
    df = list_layers(p)
    assert len(df) == 1 and df.geometry_type.tolist() == ["Point"]


def test_list_layers_gpx_and_geojson(tmp_path):
    df = list_layers(str(tmp_path / "trip.gpx"))  # fixed OGR surface, no IO
    assert df.name.tolist() == [
        "waypoints", "routes", "tracks", "route_points", "track_points"
    ]
    assert df.geometry_type.tolist() == [
        "Point", "LineString", "MultiLineString", "Point", "Point"
    ]

    gj = tmp_path / "pts.geojson"
    gj.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [1.0, 2.0]}},
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Point", "coordinates": [3.0, 4.0]}},
        ],
    }))
    df = list_layers(str(gj))
    assert df.name.tolist() == ["pts"] and df.geometry_type.tolist() == ["Point"]

    # csv is supported now (geometry type lives per-row -> Unknown)
    csv_df = list_layers(str(tmp_path / "x.csv"))
    assert csv_df.geometry_type.tolist() == ["Unknown"]
    with pytest.raises(ValueError, match="unsupported extension"):
        list_layers(str(tmp_path / "x.tab"))


def test_list_layers_engine_written_gpkg(tmp_path):
    from geopandas_ray.sources.geopackage import write_geopackage

    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([1], type=pa.int64()),
                  "geometry": W.points_to_wkb([3.0], [4.0])})
    )
    p = str(tmp_path / "pts.gpkg")
    write_geopackage(ds, p, layer="pts")
    df = list_layers(p)
    # uniform layer: the writer records the specific type, not GEOMETRY
    assert df.name.tolist() == ["pts"] and df.geometry_type.tolist() == ["Point"]
