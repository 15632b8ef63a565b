"""Newline-delimited GeoJSON (sources/geojsonseq.py): line-sharded read,
driver head-probe schema pinning, column_types widening, single-file and
parallel-directory writers, dispatch + list_layers."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.geojsonseq import (
    probe_schema,
    read_geojsonseq,
    write_geojsonseq,
)
from geopandas_ray.stages.clip import _parts_to_wkb

LINES = "\n".join(
    [
        # RS prefix tolerated (RFC 8142), blank line skipped
        '\x1e{"type": "Feature", "properties": {"pop": 1000, "name": "alpha"},'
        ' "geometry": {"type": "Point", "coordinates": [10.0, 20.0]}}',
        "",
        '{"type": "Feature", "properties": {"pop": 2000, "score": 2.5},'
        ' "geometry": {"type": "Polygon", "coordinates":'
        " [[[0,0],[4,0],[4,4],[0,4],[0,0]], [[1,1],[1,2],[2,2],[2,1],[1,1]]]}}",
        # bare geometry record is legal GeoJSONSeq
        '{"type": "LineString", "coordinates": [[0,0],[3,4],[6,8]]}',
        '{"type": "Feature", "properties": {"pop": null, "name": "delta"},'
        ' "geometry": null}',
    ]
)


def test_read_basic(tmp_path):
    p = tmp_path / "a.geojsonl"
    p.write_text(LINES)
    df = (
        read_geojsonseq(str(p))
        .to_pandas()
        .sort_values("pop", na_position="last")
        .reset_index(drop=True)
    )
    assert len(df) == 4
    assert df["pop"].dropna().tolist() == [1000, 2000]  # int64 inference
    assert df["score"][1] == 2.5
    assert sorted(df["name"].dropna()) == ["alpha", "delta"]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    a = K.area(g)
    assert a[1] == 16.0 - 1.0
    assert 10.0 in K.length(g).tolist()  # the bare LineString record
    assert 0 in [int(t) for t in g.row_types]  # null geometry row


def test_probe_and_unknown_key_raises(tmp_path):
    p = tmp_path / "b.geojsonl"
    p.write_text(
        '{"type": "Feature", "properties": {"a": 1}, "geometry": null}\n'
        '{"type": "Feature", "properties": {"a": 2, "late": "x"}, "geometry": null}\n'
    )
    names, types = probe_schema(str(p), probe_lines=1)
    assert names == ["a"] and types["a"] == pa.int64()
    with pytest.raises(Exception, match="column_types"):
        read_geojsonseq(str(p), probe_lines=1).materialize()
    # declaring the late column fixes it
    df = (
        read_geojsonseq(str(p), probe_lines=1, column_types={"late": pa.string()})
        .to_pandas()
        .sort_values("a")
    )
    assert df["late"].tolist() == [None, "x"]


def test_type_widening_error_and_override(tmp_path):
    p = tmp_path / "c.geojsonl"
    p.write_text(
        '{"type": "Feature", "properties": {"v": 1}, "geometry": null}\n'
        '{"type": "Feature", "properties": {"v": 2.5}, "geometry": null}\n'
    )
    # int probe, lossy float later -> loud error (never silent truncation)
    with pytest.raises(Exception, match="column_types"):
        read_geojsonseq(str(p), probe_lines=1).materialize()
    df = read_geojsonseq(
        str(p), probe_lines=1, column_types={"v": pa.float64()}
    ).to_pandas()
    assert sorted(df["v"]) == [1.0, 2.5]


def test_single_file_roundtrip_all_types(tmp_path):
    rng = np.random.RandomState(11)
    n = 40
    pts = W.points_to_wkb(rng.uniform(0, 100, n), rng.uniform(0, 100, n)).to_pylist()
    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.25, 1.5], [2.0, 3.75]])])])
    hole_poly = _parts_to_wkb([
        (W.POLYGON, [
            np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0], [0.0, 0.0]]),
            np.array([[1.0, 1.0], [1.0, 2.0], [2.0, 2.0], [2.0, 1.0], [1.0, 1.0]]),
        ])
    ])
    mpoly = _parts_to_wkb([
        (W.POLYGON, [np.array([[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 10.0]])]),
        (W.POLYGON, [np.array([[20.0, 20.0], [21.0, 20.0], [21.0, 21.0], [20.0, 20.0]])]),
    ])
    geoms = pts + [line, hole_poly, mpoly, None]
    m = len(geoms)
    t = pa.table({
        "fid": pa.array(np.arange(m)),
        "w": pa.array(rng.uniform(-4, 4, m)),
        "name": pa.array([f"n{i}" if i % 5 else None for i in range(m)]),
        "geometry": pa.array(geoms, type=pa.large_binary()),
    })
    p = str(tmp_path / "rt.geojsonl")
    out = write_geojsonseq(ray.data.from_arrow(t), p)
    assert out == [p]
    back = read_geojsonseq(p).to_pandas().sort_values("fid").reset_index(drop=True)
    assert len(back) == m
    # json float repr is shortest-roundtrip: attributes bit-exact
    assert np.array_equal(back["w"].values, t.column("w").to_numpy())
    assert back["name"].tolist() == t.column("name").to_pylist()
    g_in = W.from_wkb(t.column("geometry"))
    g_out = W.from_wkb(pa.array(back["geometry"], type=pa.large_binary()))
    assert np.array_equal(np.asarray(g_in.row_types), np.asarray(g_out.row_types))
    assert np.array_equal(K.area(g_in), K.area(g_out), equal_nan=True)
    assert np.array_equal(K.bounds(g_in)[:-1], K.bounds(g_out)[:-1])


def test_directory_parallel_roundtrip(tmp_path):
    n = 500
    x = np.arange(n, dtype=np.float64)
    t = pa.table({"fid": pa.array(np.arange(n)), "geometry": W.points_to_wkb(x, x)})
    d = str(tmp_path / "parts")
    paths = write_geojsonseq(
        ray.data.from_arrow(t).repartition(4), d
    )
    assert len(paths) >= 2 and all(p.endswith(".geojsonl") for p in paths)
    back = read_geojsonseq(d).to_pandas()
    assert sorted(back["fid"]) == list(range(n))
    # parts concatenate into one valid file (line-delimited format)
    whole = tmp_path / "all.geojsonl"
    whole.write_text("".join(open(p).read() for p in paths))
    again = read_geojsonseq(str(whole)).to_pandas()
    assert sorted(again["fid"]) == list(range(n))


def test_dispatch_bbox_and_list_layers(tmp_path):
    from geopandas_ray.sources.geojson import read_file, to_file
    from geopandas_ray.sources.info import list_layers

    x = np.array([1.0, 5.0, 9.0])
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": W.points_to_wkb(x, x)})
    p = str(tmp_path / "d.ndjson")
    to_file(ray.data.from_arrow(t), p)
    out = read_file(p, bbox=(0, 0, 6, 6)).to_pandas()
    assert sorted(out["fid"]) == [0, 1]
    ll = list_layers(p)
    assert ll["name"].tolist() == ["d"] and ll["geometry_type"].tolist() == ["Point"]


def test_geometry_name_collision_and_multiline_error(tmp_path):
    p = tmp_path / "bad.geojsonl"
    p.write_text(
        '{"type": "Feature", "properties": {"geometry": 1}, "geometry": null}\n'
    )
    with pytest.raises(ValueError, match="collides"):
        read_geojsonseq(str(p))
    q = tmp_path / "pretty.geojsonl"
    q.write_text('{"type": "Feature",\n  "geometry": null}\n')
    with pytest.raises(Exception, match="one record per line|complete JSON"):
        read_geojsonseq(str(q)).materialize()
