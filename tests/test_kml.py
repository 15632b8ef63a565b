"""Native KML source/sink (sources/kml.py): Placemark discovery under
Folder nesting, ExtendedData Data/SimpleData attributes, coordinate
tuple parsing (altitude dropped), MultiGeometry, write/read round-trip,
dispatch, guardrail."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.kml import read_kml, write_kml
from geopandas_ray.stages.clip import _parts_to_wkb

KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
<Document><name>doc</name>
  <Folder><name>f1</name>
    <Placemark>
      <name>alpha</name>
      <ExtendedData>
        <Data name="pop"><value>1000</value></Data>
        <Data name="score"><value>2.5</value></Data>
      </ExtendedData>
      <Point><coordinates>10.0,20.0,55.0</coordinates></Point>
    </Placemark>
    <Placemark>
      <name>beta</name>
      <ExtendedData>
        <SchemaData schemaUrl="#s"><SimpleData name="pop">2000</SimpleData></SchemaData>
      </ExtendedData>
      <Polygon>
        <outerBoundaryIs><LinearRing>
          <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
        </LinearRing></outerBoundaryIs>
        <innerBoundaryIs><LinearRing>
          <coordinates>1,1 1,2 2,2 2,1 1,1</coordinates>
        </LinearRing></innerBoundaryIs>
      </Polygon>
    </Placemark>
  </Folder>
  <Placemark>
    <name>gamma</name>
    <MultiGeometry>
      <Polygon><outerBoundaryIs><LinearRing>
        <coordinates>10,10 12,10 12,12 10,12 10,10</coordinates>
      </LinearRing></outerBoundaryIs></Polygon>
      <Polygon><outerBoundaryIs><LinearRing>
        <coordinates>20,20 21,20 21,21 20,21 20,20</coordinates>
      </LinearRing></outerBoundaryIs></Polygon>
    </MultiGeometry>
  </Placemark>
  <Placemark>
    <name>delta</name>
    <LineString><coordinates>0,0 3,4 6,8</coordinates></LineString>
  </Placemark>
</Document>
</kml>
"""


def test_kml_read(tmp_path):
    p = tmp_path / "a.kml"
    p.write_text(KML)
    df = read_kml(str(p)).to_pandas().sort_values("name").reset_index(drop=True)
    assert list(df["name"]) == ["alpha", "beta", "delta", "gamma"]
    assert df["pop"].tolist()[:2] == [1000, 2000]  # Data + SimpleData, int64
    assert df["score"][0] == 2.5
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    a = K.area(g)
    assert a[0] == 0.0
    assert a[1] == 16.0 - 1.0        # square minus hole
    assert K.length(g)[2] == 10.0    # 5 + 5 polyline
    assert a[3] == 4.0 + 1.0         # two-part MultiGeometry
    assert int(g.row_types[3]) == W.MULTIPOLYGON
    # altitude dropped: alpha is a 2D point at (10, 20)
    b = K.bounds(g)
    assert tuple(b[0]) == (10.0, 20.0, 10.0, 20.0)


def test_write_read_roundtrip_all_types(tmp_path):
    rng = np.random.RandomState(7)
    n = 40
    x, y = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    pts = W.points_to_wkb(x, y).to_pylist()
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.25, 1.5], [2.0, 3.75]])])])
    hole_poly = _parts_to_wkb([
        (W.POLYGON, [
            np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0], [0.0, 0.0]]),
            np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]]),
        ])
    ])
    mline = _parts_to_wkb([
        (W.LINESTRING, [np.array([[0.0, 0.0], [1.0, 1.0]])]),
        (W.LINESTRING, [np.array([[2.0, 2.0], [3.5, 3.0]])]),
    ])
    geoms = pts + [line, hole_poly, mline]
    m = len(geoms)
    t = pa.table({
        "fid": pa.array(np.arange(m)),
        "w": pa.array(rng.uniform(-4, 4, m)),
        "name": pa.array([f"n{i}" if i % 5 else None for i in range(m)]),
        "geometry": pa.array(geoms, type=pa.large_binary()),
    })
    p = str(tmp_path / "rt.kml")
    write_kml(ray.data.from_arrow(t), p)
    back = read_kml(p).to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(back) == m
    # float attrs bit-exact (repr), native name element + nulls survive
    assert np.array_equal(back["w"].values, t.column("w").to_numpy())
    assert back["name"].tolist() == t.column("name").to_pylist()
    g_in = W.from_wkb(t.column("geometry"))
    g_out = W.from_wkb(pa.array(back["geometry"], type=pa.large_binary()))
    assert np.array_equal(np.asarray(g_in.row_types), np.asarray(g_out.row_types))
    assert np.array_equal(K.area(g_in), K.area(g_out))
    assert np.array_equal(K.length(g_in), K.length(g_out))
    assert np.array_equal(K.bounds(g_in), K.bounds(g_out))


def test_dispatch_and_guardrail(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file

    x = np.array([1.0, 5.0, 9.0])
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": W.points_to_wkb(x, x)})
    p = str(tmp_path / "d.kml")
    to_file(ray.data.from_arrow(t), p)
    out = read_file(p, bbox=(0, 0, 6, 6)).to_pandas()
    assert sorted(out["fid"]) == [0, 1]
    with pytest.raises(ValueError, match="cap"):
        write_kml(ray.data.from_arrow(t), str(tmp_path / "y.kml"), max_rows=2)


def test_directory_multifile(tmp_path):
    for i in range(3):
        (tmp_path / f"p{i}.kml").write_text(KML)
    df = read_kml(str(tmp_path)).to_pandas()
    assert len(df) == 12
    assert sorted(df["pop"].dropna()) == [1000, 1000, 1000, 2000, 2000, 2000]
