"""Native GPX source/sink (sources/gpx.py): five-layer read, write/read
round-trips, multi-file directory parallel read, read_file/to_file
dispatch, driver-size guardrail, non-line rejection."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.gpx import read_gpx, write_gpx
from geopandas_ray.stages.clip import _parts_to_wkb

SAMPLE = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="t" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="48.2" lon="16.37"><ele>170.5</ele><name>wien</name></wpt>
  <wpt lat="47.07" lon="15.44"><name>graz</name><desc>d2</desc></wpt>
  <rte><name>r1</name>
    <rtept lat="1.0" lon="2.0"/><rtept lat="3.0" lon="4.5"/>
    <rtept lat="5.0" lon="6.0"/>
  </rte>
  <trk><name>t1</name>
    <trkseg>
      <trkpt lat="10.0" lon="20.0"><ele>7.0</ele><time>2020-01-01T00:00:00Z</time></trkpt>
      <trkpt lat="11.0" lon="21.0"/>
    </trkseg>
    <trkseg><trkpt lat="12.0" lon="22.0"/><trkpt lat="13.0" lon="23.0"/></trkseg>
  </trk>
</gpx>
"""


@pytest.fixture
def sample_path(tmp_path):
    p = tmp_path / "s.gpx"
    p.write_text(SAMPLE)
    return str(p)


def test_waypoints_layer(sample_path):
    df = read_gpx(sample_path).to_pandas().sort_values("name").reset_index(drop=True)
    assert list(df["name"]) == ["graz", "wien"]
    assert df["ele"].tolist()[1] == 170.5 and np.isnan(df["ele"][0])
    assert df["desc"].tolist() == ["d2", None]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    xy = [tuple(g.ring_coords(g.part_ring_range(i)[0])[0]) for i in range(2)]
    assert xy == [(15.44, 47.07), (16.37, 48.2)]


def test_routes_and_tracks_layers(sample_path):
    r = read_gpx(sample_path, layer="routes").to_pandas()
    assert list(r["name"]) == ["r1"]
    g = W.from_wkb(pa.array(r["geometry"], type=pa.large_binary()))
    assert g.ring_coords(0).tolist() == [[2.0, 1.0], [4.5, 3.0], [6.0, 5.0]]

    t = read_gpx(sample_path, layer="tracks").to_pandas()
    assert list(t["name"]) == ["t1"]
    g = W.from_wkb(pa.array(t["geometry"], type=pa.large_binary()))
    p0, p1 = g.row_part_range(0)
    assert p1 - p0 == 2  # one part per trkseg
    assert g.ring_coords(g.part_ring_range(p0)[0]).tolist() == [
        [20.0, 10.0], [21.0, 11.0]
    ]


def test_point_sublayers(sample_path):
    rp = read_gpx(sample_path, layer="route_points").to_pandas()
    assert rp["route_fid"].tolist() == [0, 0, 0]
    assert rp["route_point_id"].tolist() == [0, 1, 2]
    tp = read_gpx(sample_path, layer="track_points").to_pandas()
    assert tp["track_fid"].tolist() == [0, 0, 0, 0]
    assert tp["track_seg_id"].tolist() == [0, 0, 1, 1]
    assert tp["track_seg_point_id"].tolist() == [0, 1, 0, 1]
    assert tp["ele"].tolist()[0] == 7.0
    assert tp["time"].tolist()[0] == "2020-01-01T00:00:00Z"


def test_waypoint_write_read_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    n = 257
    x, y = rng.uniform(-180, 180, n), rng.uniform(-85, 85, n)
    t = pa.table({
        "name": pa.array([f"w{i}" for i in range(n)]),
        "ele": pa.array(rng.uniform(0, 4000, n)),
        "geometry": W.points_to_wkb(x, y),
    })
    p = str(tmp_path / "w.gpx")
    write_gpx(ray.data.from_arrow(t), p)
    back = read_gpx(p).to_pandas().sort_values(
        "name", key=lambda s: s.str[1:].astype(int)
    )
    # repr() coordinates survive bit-exact
    g = W.from_wkb(pa.array(back["geometry"], type=pa.large_binary()))
    got = np.array([g.ring_coords(g.part_ring_range(i)[0])[0] for i in range(n)])
    assert np.array_equal(got[:, 0], x) and np.array_equal(got[:, 1], y)
    assert np.array_equal(back["ele"].values, t.column("ele").to_numpy())


def test_track_route_write_roundtrip(tmp_path):
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.5, 1.5], [2.25, 3.0]])])])
    mline = _parts_to_wkb([
        (W.LINESTRING, [np.array([[1.0, 2.0], [3.0, 4.0]])]),
        (W.LINESTRING, [np.array([[5.0, 6.0], [7.0, 8.0], [9.0, 1.0]])]),
    ])
    t = pa.table({
        "name": pa.array(["aroute", "atrack"]),
        "geometry": pa.array([line, mline], type=pa.large_binary()),
    })
    p = str(tmp_path / "rt.gpx")
    write_gpx(ray.data.from_arrow(t), p)
    r = read_gpx(p, layer="routes").to_pandas()
    assert list(r["name"]) == ["aroute"]
    g = W.from_wkb(pa.array(r["geometry"], type=pa.large_binary()))
    assert g.ring_coords(0).tolist() == [[0.5, 1.5], [2.25, 3.0]]
    tr = read_gpx(p, layer="tracks").to_pandas()
    g = W.from_wkb(pa.array(tr["geometry"], type=pa.large_binary()))
    p0, p1 = g.row_part_range(0)
    assert p1 - p0 == 2
    assert g.ring_coords(g.part_ring_range(p0 + 1)[0]).tolist() == [
        [5.0, 6.0], [7.0, 8.0], [9.0, 1.0]
    ]


def test_directory_multifile_read(tmp_path):
    for i in range(4):
        (tmp_path / f"f{i}.gpx").write_text(SAMPLE)
    ds = read_gpx(str(tmp_path))
    df = ds.to_pandas()
    assert len(df) == 8  # 2 waypoints per file
    assert sorted(df["name"])[:2] == ["graz", "graz"]
    # per-file parent ids on the sublayers
    tp = read_gpx(str(tmp_path), layer="track_points").to_pandas()
    assert set(tp["track_fid"]) == {0}


def test_read_file_to_file_dispatch(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file

    x = np.array([1.0, 5.0, 9.0])
    t = pa.table({"name": pa.array(["a", "b", "c"]),
                  "geometry": W.points_to_wkb(x, x)})
    p = str(tmp_path / "d.gpx")
    to_file(ray.data.from_arrow(t), p)
    out = read_file(p, bbox=(0, 0, 6, 6)).to_pandas()
    assert sorted(out["name"]) == ["a", "b"]
    out2 = read_file(p, columns=["name"]).to_pandas()
    assert set(out2.columns) == {"name", "geometry"}


def test_rejects_polygons_and_caps(tmp_path):
    t = pa.table({
        "geometry": W.boxes_to_wkb(
            np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([1.0])
        )
    })
    with pytest.raises(NotImplementedError, match="points, routes"):
        write_gpx(ray.data.from_arrow(t), str(tmp_path / "x.gpx"))
    pts = pa.table({"geometry": W.points_to_wkb(np.zeros(5), np.zeros(5))})
    with pytest.raises(ValueError, match="cap"):
        write_gpx(ray.data.from_arrow(pts), str(tmp_path / "y.gpx"), max_rows=2)
