"""Round-5 second review pass: regression tests for the ten findings
(ZM WKB dims, GML 3D/Curve/Surface/empty parsing, cross-file type
promotion, SQL empty-shard schema, GPX schema validity, ordered writer
pulls)."""
from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W


# ---------------------------------------------------------------------------
# finding 2: ISO/EWKB M and ZM dims in from_wkb
# ---------------------------------------------------------------------------

def _wkb_line(code: int, pts: list[tuple]) -> bytes:
    buf = struct.pack("<bII", 1, code, len(pts))
    for p in pts:
        buf += struct.pack("<" + "d" * len(p), *p)
    return buf


def test_from_wkb_iso_zm_linestring():
    # ISO ZM code 3002: 4 doubles per vertex; the old dims=3 read consumed
    # only 3, interleaving M into the next vertex's x
    buf = _wkb_line(3002, [(1.0, 2.0, 3.0, 4.0), (5.0, 6.0, 7.0, 8.0)])
    g = W.from_wkb(pa.array([buf], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0], [5.0, 6.0]])


def test_from_wkb_iso_m_linestring():
    buf = _wkb_line(2002, [(1.0, 2.0, 9.0), (5.0, 6.0, 9.5)])
    g = W.from_wkb(pa.array([buf], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0], [5.0, 6.0]])


def test_from_wkb_ewkb_m_flag_point():
    # EWKB M flag (0x40000000) without the ISO block: 3 doubles per vertex
    buf = struct.pack("<bIddd", 1, 0x40000001, 1.0, 2.0, 42.0)
    g = W.from_wkb(pa.array([buf], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0]])


def test_from_wkb_ewkb_zm_flags_point():
    buf = struct.pack("<bIdddd", 1, 0xC0000001, 1.0, 2.0, 3.0, 4.0)
    g = W.from_wkb(pa.array([buf], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0]])


def test_read_postgis_zm_roundtrip(tmp_path):
    # end-to-end: a ZM EWKB value through _ewkb_to_iso + from_wkb
    from geopandas_ray.sources.sql import _decode_geom_values

    raw = 0x80000000 | 0x40000000 | 0x20000000 | 2  # LineString Z|M|SRID
    ewkb_zm = (
        struct.pack("<bI", 1, raw)
        + struct.pack("<I", 4326)  # SRID payload
        + struct.pack("<I", 2)     # npoints
        + struct.pack("<dddd", 1.0, 2.0, 3.0, 4.0)
        + struct.pack("<dddd", 5.0, 6.0, 7.0, 8.0)
    )
    iso = _decode_geom_values([ewkb_zm])[0]
    g = W.from_wkb(pa.array([iso], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0], [5.0, 6.0]])


# ---------------------------------------------------------------------------
# findings 1/3/6: GML 3D coordinates, Curve segments, Surface patches, empties
# ---------------------------------------------------------------------------

_GML_HEAD = (
    '<?xml version="1.0"?>\n'
    '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2">\n'
)


def _gml_doc(feature_bodies: list[str]) -> str:
    members = "\n".join(
        f"<gml:featureMember><f><k>{i}</k><g>{b}</g></f></gml:featureMember>"
        for i, b in enumerate(feature_bodies)
    )
    return _GML_HEAD + members + "\n</gml:FeatureCollection>\n"


def _read_gml_rows(tmp_path, bodies: list[str]):
    from geopandas_ray.sources.gml import read_gml

    p = tmp_path / "t.gml"
    p.write_text(_gml_doc(bodies))
    return read_gml(str(p)).to_pandas().sort_values("k").reset_index(drop=True)


def test_gml_3d_poslist_declared(tmp_path):
    df = _read_gml_rows(tmp_path, [
        '<gml:LineString srsDimension="3">'
        "<gml:posList>1 2 100 3 4 200</gml:posList></gml:LineString>",
        # odd total count (3 pts x 3 dims) used to crash reshape(-1, 2)
        '<gml:LineString><gml:posList srsDimension="3">'
        "0 0 5 1 0 6 2 0 7</gml:posList></gml:LineString>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords[:2], [[1.0, 2.0], [3.0, 4.0]])
    np.testing.assert_array_equal(g.coords[2:], [[0, 0], [1, 0], [2, 0]])


def test_gml_3d_poslist_undeclared_odd_count_infers_3d(tmp_path):
    df = _read_gml_rows(tmp_path, [
        "<gml:LineString><gml:posList>1 2 100 3 4 200 5 6 300</gml:posList>"
        "</gml:LineString>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    np.testing.assert_array_equal(g.coords, [[1, 2], [3, 4], [5, 6]])


def test_gml_pos_sequence_linestring(tmp_path):
    # GML 3 allows one <gml:pos> per vertex; only the first used to be read
    df = _read_gml_rows(tmp_path, [
        "<gml:LineString><gml:pos>0 0</gml:pos><gml:pos>3 4</gml:pos>"
        "<gml:pos>6 8</gml:pos></gml:LineString>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert K.length(g)[0] == 10.0


def test_gml_curve_two_segments(tmp_path):
    # two LineStringSegments sharing an endpoint stitch into ONE path;
    # the second segment used to be dropped
    df = _read_gml_rows(tmp_path, [
        "<gml:Curve><gml:segments>"
        "<gml:LineStringSegment><gml:posList>0 0 3 4</gml:posList>"
        "</gml:LineStringSegment>"
        "<gml:LineStringSegment><gml:posList>3 4 6 8</gml:posList>"
        "</gml:LineStringSegment>"
        "</gml:segments></gml:Curve>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert int(g.row_types[0]) == W.LINESTRING
    assert K.length(g)[0] == 10.0
    # junction point not duplicated
    assert g.coords.shape == (3, 2)


def test_gml_curve_arc_raises(tmp_path):
    from geopandas_ray.sources.gml import read_gml

    p = tmp_path / "arc.gml"
    p.write_text(_gml_doc([
        "<gml:Curve><gml:segments><gml:Arc>"
        "<gml:posList>0 0 1 1 2 0</gml:posList>"
        "</gml:Arc></gml:segments></gml:Curve>",
    ]))
    with pytest.raises(Exception, match="non-linear"):
        read_gml(str(p)).to_pandas()


def test_gml_surface_patch_with_hole(tmp_path):
    # Surface/patches/PolygonPatch with an interior: the hole used to vanish
    df = _read_gml_rows(tmp_path, [
        "<gml:Surface><gml:patches><gml:PolygonPatch>"
        "<gml:exterior><gml:LinearRing>"
        "<gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior>"
        "<gml:interior><gml:LinearRing>"
        "<gml:posList>1 1 1 2 2 2 2 1 1 1</gml:posList>"
        "</gml:LinearRing></gml:interior>"
        "</gml:PolygonPatch></gml:patches></gml:Surface>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert K.area(g)[0] == 15.0  # 16 - 1 hole


def test_gml_surface_two_patches_multipolygon(tmp_path):
    df = _read_gml_rows(tmp_path, [
        "<gml:Surface><gml:patches>"
        "<gml:PolygonPatch><gml:exterior><gml:LinearRing>"
        "<gml:posList>0 0 2 0 2 2 0 2 0 0</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:PolygonPatch>"
        "<gml:PolygonPatch><gml:exterior><gml:LinearRing>"
        "<gml:posList>5 5 6 5 6 6 5 6 5 5</gml:posList>"
        "</gml:LinearRing></gml:exterior></gml:PolygonPatch>"
        "</gml:patches></gml:Surface>",
    ])
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert int(g.row_types[0]) == W.MULTIPOLYGON
    assert K.area(g)[0] == 5.0


def test_gml_empty_multipoint_and_bare_point_read_null(tmp_path):
    df = _read_gml_rows(tmp_path, [
        "<gml:MultiPoint></gml:MultiPoint>",  # used to KeyError in-task
        "<gml:Point/>",                        # used to IndexError
        "<gml:Point><gml:pos>7 8</gml:pos></gml:Point>",
    ])
    assert df["geometry"][0] is None and df["geometry"][1] is None
    assert df["geometry"][2] is not None


# ---------------------------------------------------------------------------
# findings 4/5: cross-file int64-vs-float64 promotion in one read batch
# ---------------------------------------------------------------------------

def test_gml_directory_mixed_int_float_column(tmp_path):
    from geopandas_ray.sources.gml import read_gml

    body_int = "<gml:Point><gml:pos>0 0</gml:pos></gml:Point>"
    (tmp_path / "a.gml").write_text(
        _GML_HEAD + "<gml:featureMember><f><v>1</v><g>" + body_int +
        "</g></f></gml:featureMember></gml:FeatureCollection>"
    )
    (tmp_path / "b.gml").write_text(
        _GML_HEAD + "<gml:featureMember><f><v>2.5</v><g>" + body_int +
        "</g></f></gml:featureMember></gml:FeatureCollection>"
    )
    df = read_gml(str(tmp_path)).to_pandas()
    assert sorted(df["v"].tolist()) == [1.0, 2.5]


def test_kml_directory_mixed_int_float_column(tmp_path):
    from geopandas_ray.sources.kml import read_kml

    def doc(v):
        return (
            '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
            "<Document><Placemark><ExtendedData>"
            f'<Data name="v"><value>{v}</value></Data></ExtendedData>'
            "<Point><coordinates>1,2</coordinates></Point>"
            "</Placemark></Document></kml>"
        )

    (tmp_path / "a.kml").write_text(doc("1"))
    (tmp_path / "b.kml").write_text(doc("1.5"))
    df = read_kml(str(tmp_path)).to_pandas()
    assert sorted(df["v"].tolist()) == [1.0, 1.5]


def test_kml_empty_multigeometry_reads_null(tmp_path):
    from geopandas_ray.sources.kml import read_kml

    (tmp_path / "e.kml").write_text(
        '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
        "<Document><Placemark><name>n</name>"
        "<MultiGeometry></MultiGeometry></Placemark></Document></kml>"
    )
    df = read_kml(str(tmp_path / "e.kml")).to_pandas()
    assert len(df) == 1 and df["geometry"][0] is None


# ---------------------------------------------------------------------------
# finding 8: empty sharded read_postgis keeps the full column schema
# ---------------------------------------------------------------------------

def test_read_postgis_empty_sharded_full_schema(tmp_path):
    from geopandas_ray.sources.sql import read_postgis, sqlite_factory

    db = str(tmp_path / "e.sqlite")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE t (a INTEGER, b TEXT, geom BLOB)")
    con.commit()
    con.close()
    ds = read_postgis("t", sqlite_factory(db), shard_col="rowid")
    assert ds.count() == 0
    # the empty read used to collapse to a {geometry}-only schema
    assert {"a", "b", "geometry"} <= set(ds.schema().names)


# ---------------------------------------------------------------------------
# finding 9: GPX writer emits ele/time on waypoints only
# ---------------------------------------------------------------------------

def test_gpx_writer_no_ele_time_in_rte(tmp_path):
    from geopandas_ray.sources.gpx import write_gpx
    from geopandas_ray.stages.clip import _parts_to_wkb

    wpt = W.points_to_wkb(np.array([1.0]), np.array([2.0])).to_pylist()[0]
    rte = _parts_to_wkb(
        [(W.LINESTRING, [np.array([[0.0, 0.0], [1.0, 1.0]])])]
    )
    t = pa.table({
        "name": ["w", "r"],
        "ele": [10.0, 20.0],
        "time": ["2020-01-01T00:00:00Z", "2020-01-02T00:00:00Z"],
        "geometry": pa.array([wpt, rte], type=pa.large_binary()),
    })
    p = str(tmp_path / "o.gpx")
    write_gpx(ray.data.from_arrow(t), p)
    xml = open(p).read()
    wpt_part = xml[xml.index("<wpt"):xml.index("</wpt>")]
    rte_part = xml[xml.index("<rte>"):xml.index("</rte>")]
    assert "<ele>" in wpt_part and "<time>" in wpt_part
    assert "<ele>" not in rte_part and "<time>" not in rte_part
    assert "<name>r</name>" in rte_part


# ---------------------------------------------------------------------------
# finding 10: driver-assembled writers pull in INPUT order
# ---------------------------------------------------------------------------

def test_writer_feature_order_deterministic(tmp_path):
    from geopandas_ray.sources.kml import read_kml, write_kml

    n = 200
    x = np.arange(n, dtype=np.float64)
    t = pa.table({
        "fid": pa.array(np.arange(n)),
        "geometry": W.points_to_wkb(x, x + 0.5),
    })
    # multi-block dataset through a map stage (task-completion order would
    # rotate without the ordered pull)
    ds = ray.data.from_arrow(t).repartition(8).map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    p = str(tmp_path / "o.kml")
    write_kml(ds, p)
    back = read_kml(p).to_pandas()
    # repartition(8) preserves global row order; written file must too
    assert back["fid"].tolist() == list(range(n))


# ---------------------------------------------------------------------------
# second review pass: windows, knn edge cases, proj identity
# ---------------------------------------------------------------------------

def _ts_events(ts_us: list[int], users=None):
    import pandas as pd

    n = len(ts_us)
    return ray.data.from_pandas(pd.DataFrame({
        "user": users or [1] * n,
        "ts": pd.to_datetime(np.array(ts_us, dtype="int64"), unit="us"),
    }))


def test_sliding_ragged_window_slide():
    from geopandas_ray.stages.window import sliding

    # window=90, slide=60: k=ceil(1.5)=2 candidates, kept by containment.
    # t=100 is in [60,150) only; t=70 is in [0,90) AND [60,150).
    out = sliding(
        _ts_events([100_000_000, 70_000_000]), "user", "ts", 90, 60
    ).to_pandas().sort_values("window_start")
    got = dict(zip(out.window_start, out.n))
    assert got == {0: 1, 60: 2}


def test_sliding_slide_gt_window():
    from geopandas_ray.stages.window import sliding

    # slide=90 > window=60: events between window end and next slide land
    # in NO aligned window; the old floor-k emitted zero rows for ALL
    out = sliding(
        _ts_events([100_000_000, 80_000_000]), "user", "ts", 60, 90
    ).to_pandas()
    got = dict(zip(out.window_start, out.n))
    assert got == {90: 1}  # t=100 in [90,150); t=80 in no window


def test_sessionize_subsecond_gap():
    from geopandas_ray.stages.window import sessionize

    # true gap 1.9s > 1 must split (second-truncation merged them);
    # true gap 1.1s > 1 must also split (truncation got this right only
    # by accident)
    # gaps: 1.9s (split), 8.1s (split), 0.9s (merge), 1.1s (split) -> 4
    # sessions; the old whole-second truncation merged the first pair and
    # reported 3
    out = sessionize(
        _ts_events([0, 1_900_000, 10_000_000, 10_900_000, 12_000_000]),
        "user", "ts", gap_s=1,
    ).to_pandas()
    assert len(out) == 4
    assert sorted(out.n_events.tolist()) == [1, 1, 1, 2]


def test_knn_brute_small_corpus_no_self_inf():
    from geopandas_ray.functions.knn import knn_brute

    t = pa.table({
        "vec_id": pa.array([1, 2, 3], type=pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], type=pa.list_(pa.float64())
        ),
    })
    out = knn_brute(
        ray.data.from_arrow(t), t, k=5, exclude_self=True
    ).to_pandas()
    # k > corpus size: the masked self slot must NOT surface as a
    # neighbor_id==vec_id row with cosine=-inf
    assert (out.vec_id != out.neighbor_id).all()
    assert np.isfinite(out.cosine).all()
    assert len(out) == 6  # each of 3 queries gets the 2 others


def test_knn_brute_empty_corpus():
    from geopandas_ray.functions.knn import knn_brute

    q = pa.table({
        "vec_id": pa.array([1], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0]], type=pa.list_(pa.float64())),
    })
    empty = q.slice(0, 0)
    out = knn_brute(ray.data.from_arrow(q), empty, k=3)
    assert out.count() == 0
    assert set(out.schema().names) == {"vec_id", "neighbor_id", "rank", "cosine"}


def test_cosine_pairs_cross_set():
    from geopandas_ray.functions.knn import cosine_near_dup_pairs

    corpus = pa.table({
        "vec_id": pa.array([1, 2], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], type=pa.list_(pa.float64())),
    })
    queries = pa.table({
        "vec_id": pa.array([10, 11], type=pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]], type=pa.list_(pa.float64())),
    })
    # query ids all EXCEED corpus ids: the self-join dedup (id_a < id_b)
    # dropped every pair here
    out = cosine_near_dup_pairs(
        ray.data.from_arrow(queries), corpus, threshold=0.99, self_join=False
    ).to_pandas()
    assert sorted(zip(out.id_a, out.id_b)) == [(10, 1), (11, 2)]


def test_proj_resolve_identity_bit_exact():
    from geopandas_ray import proj

    fn = proj.resolve("EPSG:27700", "EPSG:27700")
    x = np.array([400000.123456789, 123456.987654321])
    y = np.array([100000.111111111, 654321.222222222])
    ox, oy = fn(x, y)
    assert np.array_equal(np.asarray(ox), x) and np.array_equal(np.asarray(oy), y)


def test_gml_column_types_pins_cross_file_schema(tmp_path):
    # files in DIFFERENT read tasks can infer int64 vs float64; declaring
    # the type pins every task's schema
    from geopandas_ray.sources.gml import read_gml

    body = "<gml:Point><gml:pos>0 0</gml:pos></gml:Point>"
    for i, v in enumerate(["1", "2", "3", "4.5"]):
        (tmp_path / f"f{i}.gml").write_text(
            _GML_HEAD + f"<gml:featureMember><f><v>{v}</v><g>{body}</g></f>"
            "</gml:featureMember></gml:FeatureCollection>"
        )
    ds = read_gml(str(tmp_path), column_types={"v": pa.float64()})
    sch = ds.schema()
    assert dict(zip(sch.names, sch.types))["v"] == pa.float64()
    assert sorted(ds.to_pandas()["v"].tolist()) == [1.0, 2.0, 3.0, 4.5]
