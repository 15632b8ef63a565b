"""CSV source/sink (sources/csvgeo.py): WKT-column and X/Y-column
geometry decode, auto-detection, keep_geom_columns, single-file and
parallel-directory writers with bit-exact roundtrip, dispatch."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.csvgeo import read_csv_geo, write_csv_geo
from geopandas_ray.stages.clip import _parts_to_wkb

CSV_WKT = (
    "id,WKT,name\n"
    '1,"POINT (10.5 20.25)",alpha\n'
    '2,"POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))",beta\n'
    "3,,gamma\n"
)

CSV_XY = "id,lon,lat,v\n1,10.5,20.25,7\n2,-3.0,4.0,8\n"


def test_read_wkt_autodetect(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text(CSV_WKT)
    df = read_csv_geo(str(p)).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "name", "geometry"]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert K.area(g)[1] == 15.0
    assert int(g.row_types[2]) == 0  # empty cell -> null geometry
    b = K.bounds(g)
    assert tuple(b[0]) == (10.5, 20.25, 10.5, 20.25)


def test_read_xy_and_keep(tmp_path):
    p = tmp_path / "b.csv"
    p.write_text(CSV_XY)
    df = read_csv_geo(str(p)).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "v", "geometry"]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert tuple(K.bounds(g)[1]) == (-3.0, 4.0, -3.0, 4.0)
    kept = read_csv_geo(str(p), keep_geom_columns=True).to_pandas()
    assert {"lon", "lat", "geometry"} <= set(kept.columns)
    # explicit column names override detection
    df2 = read_csv_geo(str(p), x="lon", y="lat").to_pandas()
    assert "geometry" in df2.columns


def test_plain_csv_no_geometry(tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("a,b\n1,2\n")
    df = read_csv_geo(str(p)).to_pandas()
    assert list(df.columns) == ["a", "b"]


def test_single_file_roundtrip_bit_exact(tmp_path):
    rng = np.random.RandomState(3)
    n = 50
    pts = W.points_to_wkb(rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)).to_pylist()
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.25, 1.5], [2.0, 3.75]])])])
    mpoly = _parts_to_wkb([
        (W.POLYGON, [np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 0.0]])]),
        (W.POLYGON, [np.array([[20.0, 20.0], [21.0, 20.0], [21.0, 21.0], [20.0, 20.0]])]),
    ])
    geoms = pts + [line, mpoly, None]
    m = len(geoms)
    t = pa.table({
        "fid": pa.array(np.arange(m)),
        "w": pa.array(rng.uniform(-4, 4, m)),
        "s": pa.array([f'q"{i},x' if i % 3 else None for i in range(m)]),
        "geometry": pa.array(geoms, type=pa.large_binary()),
    })
    p = str(tmp_path / "rt.csv")
    assert write_csv_geo(ray.data.from_arrow(t), p) == [p]
    # WKT leads the header (OGR layout)
    assert open(p).readline().startswith('"WKT"')
    back = read_csv_geo(p).to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(back) == m
    assert np.array_equal(back["w"].values, t.column("w").to_numpy())
    assert back["s"].tolist() == t.column("s").to_pylist()  # quotes/commas survive
    g_in = W.from_wkb(t.column("geometry"))
    g_out = W.from_wkb(pa.array(back["geometry"], type=pa.large_binary()))
    assert np.array_equal(np.asarray(g_in.row_types), np.asarray(g_out.row_types))
    assert np.array_equal(K.area(g_in), K.area(g_out), equal_nan=True)
    assert np.array_equal(K.bounds(g_in)[:-1], K.bounds(g_out)[:-1])


def test_directory_parallel_roundtrip(tmp_path):
    n = 400
    x = np.arange(n, dtype=np.float64) + 0.5
    t = pa.table({"fid": pa.array(np.arange(n)), "geometry": W.points_to_wkb(x, x)})
    d = str(tmp_path / "parts")
    paths = write_csv_geo(ray.data.from_arrow(t).repartition(4), d)
    assert len(paths) >= 2
    back = read_csv_geo(paths).to_pandas()
    assert sorted(back["fid"]) == list(range(n))


def test_dispatch(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file

    x = np.array([1.0, 5.0, 9.0])
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": W.points_to_wkb(x, x)})
    p = str(tmp_path / "d.csv")
    to_file(ray.data.from_arrow(t), p)
    out = read_file(p, bbox=(0, 0, 6, 6)).to_pandas()
    assert sorted(out["fid"]) == [0, 1]
    with pytest.raises(ValueError, match="not in"):
        read_csv_geo(p, wkt="nope").materialize()
