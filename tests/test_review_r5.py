"""Regression tests for the round-5 self-review findings: declared-Multi
preservation on format reads, FGB indexed-bbox exact post-filter, writer
name validation, geometry-name collisions, lossless type coercion."""
from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.clip import _parts_to_wkb

GPX_ONE_SEG = """<?xml version="1.0"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
  <trk><name>solo</name>
    <trkseg>
      <trkpt lat="1.0" lon="2.0"/><trkpt lat="3.0" lon="4.0"/>
    </trkseg>
  </trk>
</gpx>
"""


def _row_type(df, i=0):
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    return int(g.row_types[i])


def test_gpx_single_segment_track_stays_multilinestring(tmp_path):
    from geopandas_ray.sources.gpx import read_gpx, write_gpx

    p = tmp_path / "one.gpx"
    p.write_text(GPX_ONE_SEG)
    df = read_gpx(str(p), layer="tracks").to_pandas()
    assert _row_type(df) == W.MULTILINESTRING  # OGR tracks contract
    # roundtrip: still a <trk>, not transmuted into a <rte> route
    out = str(tmp_path / "rt.gpx")
    write_gpx(ray.data.from_arrow(pa.Table.from_pandas(df)), out)
    back = read_gpx(out, layer="tracks").to_pandas()
    assert len(back) == 1 and _row_type(back) == W.MULTILINESTRING
    assert len(read_gpx(out, layer="routes").to_pandas()) == 0


def test_gml_single_member_multisurface_stays_multipolygon(tmp_path):
    from geopandas_ray.sources.gml import read_gml

    gml = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2"
 xmlns:gr="http://x/">
 <gml:featureMember><gr:f gml:id="f0">
  <gr:geometry><gml:MultiSurface><gml:surfaceMember>
   <gml:Polygon><gml:exterior><gml:LinearRing>
    <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
   </gml:LinearRing></gml:exterior></gml:Polygon>
  </gml:surfaceMember></gml:MultiSurface></gr:geometry>
 </gr:f></gml:featureMember>
</gml:FeatureCollection>
"""
    p = tmp_path / "m.gml"
    p.write_text(gml)
    df = read_gml(str(p)).to_pandas()
    assert _row_type(df) == W.MULTIPOLYGON


def test_kml_single_child_multigeometry_stays_multi(tmp_path):
    from geopandas_ray.sources.kml import read_kml

    kml = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Placemark><name>a</name><MultiGeometry>
  <Polygon><outerBoundaryIs><LinearRing>
   <coordinates>0,0 4,0 4,4 0,4 0,0</coordinates>
  </LinearRing></outerBoundaryIs></Polygon>
 </MultiGeometry></Placemark>
</Document></kml>
"""
    p = tmp_path / "m.kml"
    p.write_text(kml)
    df = read_kml(str(p)).to_pandas()
    assert _row_type(df) == W.MULTIPOLYGON


def test_fgb_indexed_bbox_excludes_null_geometry(tmp_path):
    from geopandas_ray.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf

    geoms = pa.array(
        list(W.points_to_wkb(np.array([5.0, 50.0]), np.array([5.0, 50.0])).to_pylist())
        + [None],
        type=pa.large_binary(),
    )
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": geoms})
    p = str(tmp_path / "n.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), p)
    # bbox covering the origin: the null row's (0,0,0,0) leaf bbox passes
    # the index test but the exact post-filter must drop it
    got = read_flatgeobuf(p, bbox=(-1.0, -1.0, 10.0, 10.0)).to_pandas()
    assert sorted(got["fid"]) == [0]
    # indexed == sequential contract: full read still yields all rows
    assert len(read_flatgeobuf(p).to_pandas()) == 3


def test_fgb_single_part_multipolygon_roundtrip(tmp_path):
    from geopandas_ray.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf

    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    wkb1 = _parts_to_wkb([(W.POLYGON, [ring])], force_multi=True)
    t = pa.table({"fid": pa.array([0]),
                  "geometry": pa.array([wkb1], type=pa.large_binary())})
    p = str(tmp_path / "m.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), p)
    back = read_flatgeobuf(p).to_pandas()
    assert _row_type(back) == W.MULTIPOLYGON


def test_gml_writer_rejects_invalid_element_names(tmp_path):
    from geopandas_ray.sources.gml import write_gml

    t = pa.table({
        "my col": pa.array([1]),
        "geometry": W.points_to_wkb(np.array([1.0]), np.array([2.0])),
    })
    with pytest.raises(ValueError, match="XML element"):
        write_gml(ray.data.from_arrow(t), str(tmp_path / "x.gml"))


def test_kml_geometry_name_collision_raises(tmp_path):
    from geopandas_ray.sources.kml import read_kml

    kml = """<?xml version="1.0"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
 <Placemark><ExtendedData>
  <Data name="geometry"><value>src</value></Data>
 </ExtendedData><Point><coordinates>1,2</coordinates></Point></Placemark>
</Document></kml>
"""
    p = tmp_path / "c.kml"
    p.write_text(kml)
    with pytest.raises(Exception, match="collides"):
        read_kml(str(p)).materialize()


def test_gpkg_integer_affinity_rejects_fractional(tmp_path):
    from geopandas_ray.sources.geopackage import read_geopackage, write_geopackage

    t = pa.table({
        "n": pa.array([1, 2]),
        "geometry": W.points_to_wkb(np.array([1.0, 2.0]), np.array([1.0, 2.0])),
    })
    p = str(tmp_path / "f.gpkg")
    write_geopackage(ray.data.from_arrow(t), p)
    con = sqlite3.connect(p)
    layer = con.execute("SELECT table_name FROM gpkg_contents").fetchone()[0]
    con.execute(f'UPDATE "{layer}" SET n = 2.5 WHERE rowid = 1')  # defy affinity
    con.commit()
    con.close()
    with pytest.raises(Exception, match="non-integral|coerced"):
        read_geopackage(p, layer=layer).materialize()


def test_sql_coerce_rejects_lossy_int():
    from geopandas_ray.sources.sql import _coerce

    assert _coerce(3.0, pa.int64(), "c") == 3
    with pytest.raises(ValueError, match="without loss"):
        _coerce(2.5, pa.int64(), "c")
    assert _coerce(b"ab", pa.string(), "c") == "ab"  # no "b'..'" reprs


def test_sql_paramstyle_detection():
    from geopandas_ray.sources.sql import _detect_paramstyle, _placeholder

    con = sqlite3.connect(":memory:")
    assert _detect_paramstyle(con) == "qmark"
    assert _placeholder("qmark") == "?"
    assert _placeholder("pyformat") == "%s"
    with pytest.raises(NotImplementedError):
        _placeholder("numeric")
    con.close()
