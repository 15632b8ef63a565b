"""PostGIS-style SQL source/sink (sources/sql.py): EWKB normalization,
rowid-sharded parallel read, hex-EWKB parallel write, if_exists semantics,
facade wiring. Backend = sqlite (the sandbox's DB-API implementation)."""
from __future__ import annotations

import sqlite3
import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.sql import (
    _ewkb_to_iso,
    read_postgis,
    sqlite_factory,
    write_postgis,
)
from geopandas_ray.stages.clip import _parts_to_wkb


def _pt(x, y):
    return bytes([1]) + struct.pack("<I", 1) + struct.pack("<dd", x, y)


def test_ewkb_to_iso_point_srid_z():
    ewkb = (bytes([1]) + struct.pack("<I", 1 | 0x80000000 | 0x20000000)
            + struct.pack("<I", 4326) + struct.pack("<ddd", 1.5, 2.5, 9.0))
    iso = _ewkb_to_iso(ewkb)
    assert struct.unpack_from("<I", iso, 1)[0] == 1001  # ISO PointZ
    assert struct.unpack_from("<ddd", iso, 5) == (1.5, 2.5, 9.0)
    # engine decode drops Z, keeps XY
    g = W.from_wkb(pa.array([iso], type=pa.large_binary()))
    assert tuple(K.bounds(g)[0]) == (1.5, 2.5, 1.5, 2.5)


def test_ewkb_to_iso_nested_multipolygon_srid():
    # EWKB MultiPolygon with SRID on the OUTER header only (PostGIS form);
    # inner polygons carry plain headers
    ring = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]])
    inner = _parts_to_wkb([(W.POLYGON, [ring])])
    outer = (bytes([1]) + struct.pack("<I", 6 | 0x20000000)
             + struct.pack("<I", 31370) + struct.pack("<I", 2) + inner + inner)
    iso = _ewkb_to_iso(outer)
    assert struct.unpack_from("<I", iso, 1)[0] == 6
    g = W.from_wkb(pa.array([iso], type=pa.large_binary()))
    assert K.area(g)[0] == 32.0
    assert int(g.row_types[0]) == W.MULTIPOLYGON


def test_ewkb_iso_passthrough():
    plain = _pt(3.0, 4.0)
    assert _ewkb_to_iso(plain) == plain
    # ISO codes with +1000/+2000 dims blocks decode their dims correctly
    z = bytes([1]) + struct.pack("<I", 1001) + struct.pack("<ddd", 1, 2, 3)
    assert _ewkb_to_iso(z) == z
    m = bytes([1]) + struct.pack("<I", 2001) + struct.pack("<ddd", 1, 2, 3)
    assert _ewkb_to_iso(m) == m  # XYM: 3 doubles
    zm = bytes([1]) + struct.pack("<I", 3001) + struct.pack("<dddd", 1, 2, 3, 4)
    assert _ewkb_to_iso(zm) == zm  # XYZM: 4 doubles


def _write_fixture_db(path, n=100):
    rng = np.random.RandomState(3)
    t = pa.table({
        "fid": pa.array(np.arange(n)),
        "w": pa.array(rng.uniform(-5, 5, n)),
        "tag": pa.array([f"t{i % 7}" if i % 9 else None for i in range(n)]),
        "geometry": W.points_to_wkb(rng.uniform(0, 100, n), rng.uniform(0, 100, n)),
    })
    write_postgis(ray.data.from_arrow(t), "pts", sqlite_factory(path), srid=4326)
    return t


def test_roundtrip_sharded(tmp_path):
    db = str(tmp_path / "a.db")
    t = _write_fixture_db(db)
    # the stored wire format is hex-EWKB text with the SRID flag
    raw = sqlite3.connect(db).execute("SELECT geom FROM pts LIMIT 1").fetchone()[0]
    assert isinstance(raw, str)
    assert struct.unpack_from("<I", bytes.fromhex(raw), 1)[0] & 0x20000000

    back = read_postgis("pts", sqlite_factory(db, readonly=True),
                        shard_col="rowid", parallelism=8)
    m = back.materialize()
    assert m.num_blocks() == 8  # the read really fanned out
    df = m.to_pandas().sort_values("fid").reset_index(drop=True)
    assert np.array_equal(df["fid"].values, t.column("fid").to_numpy())
    assert np.array_equal(df["w"].values, t.column("w").to_numpy())
    assert df["tag"].tolist() == t.column("tag").to_pylist()
    g_in = W.from_wkb(t.column("geometry"))
    g_out = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert np.array_equal(K.bounds(g_in), K.bounds(g_out))


def test_arbitrary_sql_unsharded_and_wrapped_shard(tmp_path):
    db = str(tmp_path / "b.db")
    _write_fixture_db(db)
    q = "SELECT fid, w, geom FROM pts WHERE fid < 40"
    df = read_postgis(q, sqlite_factory(db, readonly=True)).to_pandas()
    assert len(df) == 40 and set(df.columns) == {"fid", "w", "geometry"}
    # subselect sharding: shard_col must be in the SELECT list
    df2 = read_postgis(q, sqlite_factory(db, readonly=True),
                       shard_col="fid", parallelism=4).to_pandas()
    assert sorted(df2["fid"]) == sorted(df["fid"])


def test_if_exists_semantics(tmp_path):
    db = str(tmp_path / "c.db")
    t = pa.table({"fid": pa.array([1, 2]), "geometry": W.points_to_wkb(
        np.array([1.0, 2.0]), np.array([3.0, 4.0]))})
    ds = ray.data.from_arrow(t)
    fac = sqlite_factory(db)
    assert write_postgis(ds, "x", fac) == 2
    with pytest.raises(ValueError, match="already exists"):
        write_postgis(ds, "x", fac)
    assert write_postgis(ds, "x", fac, if_exists="append") == 2
    assert read_postgis("x", fac).count() == 4
    assert write_postgis(ds, "x", fac, if_exists="replace") == 2
    assert read_postgis("x", fac).count() == 2
    with pytest.raises(ValueError, match="if_exists"):
        write_postgis(ds, "x", fac, if_exists="nope")
    with pytest.raises(ValueError, match="table name"):
        write_postgis(ds, "x; DROP TABLE x", fac)


def test_nulls_and_raw_wkb_mode(tmp_path):
    db = str(tmp_path / "d.db")
    geoms = pa.array([_pt(1, 2), None, _pt(3, 4)], type=pa.large_binary())
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": geoms})
    write_postgis(ray.data.from_arrow(t), "g", sqlite_factory(db), hex_encode=False)
    raw = sqlite3.connect(db).execute(
        "SELECT geom FROM g WHERE fid=0").fetchone()[0]
    assert isinstance(raw, bytes)  # BLOB column in raw mode
    df = read_postgis("g", sqlite_factory(db, readonly=True),
                      shard_col="rowid").to_pandas().sort_values("fid")
    assert df["geometry"].isna().tolist() == [False, True, False]


def test_empty_shard_blocks_keep_full_schema(tmp_path):
    # sparse shard_col values leave some range shards (and possibly whole
    # repartitioned blocks) empty; every block must still carry the full
    # probe schema or downstream union/schema() diverges
    db = str(tmp_path / "f.db")
    t = pa.table({
        "fid": pa.array([0, 1000]),  # huge gap: middle shards match no rows
        "w": pa.array([1.5, 2.5]),
        "geometry": W.points_to_wkb(np.array([1.0, 2.0]), np.array([3.0, 4.0])),
    })
    write_postgis(ray.data.from_arrow(t), "sparse", sqlite_factory(db))
    back = read_postgis("sparse", sqlite_factory(db, readonly=True),
                        shard_col="fid", parallelism=8)
    m = back.materialize()
    schemas = {str(ray.get(ref).schema) for ref in m.to_arrow_refs()}
    assert len(schemas) == 1  # identical schema on every block, empty or not
    df = m.to_pandas().sort_values("fid")
    assert df["fid"].tolist() == [0, 1000]
    assert df["w"].tolist() == [1.5, 2.5]

    # the zero-row-batch fallback itself must emit the same schema too
    from geopandas_ray.sources.sql import _SqlShard, _shard_sql
    sh = _SqlShard(sqlite_factory(db, readonly=True),
                   _shard_sql("sparse", "fid"), "geom", "geometry",
                   ["fid", "w", "geom"],
                   {"fid": pa.int64(), "w": pa.float64()})
    empty = sh(pa.table({"lo": pa.array([], type=pa.int64()),
                         "hi": pa.array([], type=pa.int64())}))
    full = sh(pa.table({"lo": pa.array([0]), "hi": pa.array([1000])}))
    assert empty.schema.equals(full.schema)
    assert empty.num_rows == 0 and full.num_rows == 2


def test_facade(tmp_path):
    import geopandas_ray as gr

    db = str(tmp_path / "e.db")
    t = pa.table({"fid": pa.array([1, 2, 3]), "geometry": W.points_to_wkb(
        np.array([1.0, 5.0, 9.0]), np.array([1.0, 5.0, 9.0]))})
    g = gr.GeoDataset(ray.data.from_arrow(t))
    assert g.to_postgis("pts", sqlite_factory(db), srid=4326) == 3
    back = gr.GeoDataset.read_postgis("pts", sqlite_factory(db, readonly=True),
                                      shard_col="rowid")
    assert back.ds.count() == 3
