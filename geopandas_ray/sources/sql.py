"""PostGIS-style SQL source/sink over DB-API connections (reference
``io/sql.py`` — ``read_postgis`` :158, ``to_postgis`` via ``_write_postgis``
:199). The reference rides sqlalchemy + a live engine; a live connection
cannot be shipped to Ray workers, so the Ray-native contract is a zero-arg
picklable **connection factory** — each read/write task opens its own
connection in actor ``__init__`` (the stateful-stage pattern, same as the
GeoPackage rowid shards).

Ray-first layout
----------------
* ``read_postgis(sql, con_factory, shard_col=...)``: the driver runs ONE
  cheap ``SELECT MIN/MAX(shard_col)`` probe, then ``parallelism`` range
  shards execute ``... WHERE shard_col BETWEEN lo AND hi`` concurrently —
  the table never flows through the driver. Without ``shard_col`` the query
  runs as a single task (documented fallback for arbitrary SQL).
* ``write_postgis(ds, name, con_factory)``: the driver creates the table
  (DDL is tiny), then every batch inserts from its own task/connection.
  Single-writer databases (sqlite) serialize on the file lock; real
  client-server backends (PostGIS) take the inserts concurrently.

Geometry travels as the reference's wire formats: hex-EWKB text (what
``pd.read_sql`` hands back from a PostGIS ``geom`` column) or raw WKB
bytes. EWKB's SRID/Z/M header flags are normalized to ISO WKB before the
engine sees the bytes (``geom/wkb.from_wkb`` speaks ISO + the 0x80000000 Z
flag, not the SRID flag).
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pyarrow as pa
import ray.data

from ..util import default_pool

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


def _ewkb_to_iso(buf: bytes) -> bytes:
    """Rewrite one (E)WKB value to ISO WKB: drop SRID payloads, fold the
    Z/M flag bits into ISO +1000/+2000 type codes. Recurses into Multi*/
    GeometryCollection members (each carries its own header). Plain ISO
    input round-trips unchanged (cheap header check short-circuits)."""
    out = bytearray()
    _ewkb_walk(buf, 0, out)
    return bytes(out)


def _ewkb_walk(buf: bytes, pos: int, out: bytearray) -> int:
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (raw,) = struct.unpack_from(endian + "I", buf, pos + 1)
    code = raw & 0x1FFFFFFF  # strip the EWKB Z/M/SRID flag bits
    k = code // 1000  # ISO dims block: 0=2D 1=Z 2=M 3=ZM
    has_z = bool(raw & _EWKB_Z) or k in (1, 3)
    has_m = bool(raw & _EWKB_M) or k in (2, 3)
    base = code % 1000
    iso = base + (1000 if has_z else 0) + (2000 if has_m else 0)
    out.append(byte_order)
    out += struct.pack(endian + "I", iso)
    pos += 5
    if raw & _EWKB_SRID:
        pos += 4  # SRID is connection metadata, not geometry — dropped
    dims = 2 + int(has_z) + int(has_m)
    if base == 1:  # Point
        out += buf[pos : pos + 8 * dims]
        return pos + 8 * dims
    if base == 2:  # LineString
        (n,) = struct.unpack_from(endian + "I", buf, pos)
        ln = 4 + 8 * dims * n
        out += buf[pos : pos + ln]
        return pos + ln
    if base == 3:  # Polygon
        (nrings,) = struct.unpack_from(endian + "I", buf, pos)
        out += buf[pos : pos + 4]
        pos += 4
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "I", buf, pos)
            ln = 4 + 8 * dims * n
            out += buf[pos : pos + ln]
            pos += ln
        return pos
    if base in (4, 5, 6, 7):  # Multi* / GeometryCollection: nested headers
        (nparts,) = struct.unpack_from(endian + "I", buf, pos)
        out += buf[pos : pos + 4]
        pos += 4
        for _ in range(nparts):
            pos = _ewkb_walk(buf, pos, out)
        return pos
    raise ValueError(f"unsupported WKB geometry type code {raw:#x}")


def _decode_geom_values(vals: list) -> list[bytes | None]:
    """DB geometry cell -> ISO WKB bytes. Accepts raw bytes/memoryview WKB
    or hex text (PostGIS's ``geom`` arrives as hex-EWKB through DB-API)."""
    out: list[bytes | None] = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        if isinstance(v, memoryview):
            v = v.tobytes()
        if isinstance(v, str):
            v = bytes.fromhex(v)
        elif isinstance(v, bytearray):
            v = bytes(v)
        out.append(_ewkb_to_iso(v))
    return out


_BARE_TABLE = re.compile(r"^[A-Za-z_][\w.$]*$")


def sqlite_factory(path: str, readonly: bool = False):
    """A picklable connection factory for sqlite files, pre-configured for
    Ray actors (``check_same_thread=False``: the actor's ``__call__`` runs
    on a different thread than ``__init__``; each connection is only ever
    used serially per actor — same note as ``geopackage._GpkgShard``)."""

    def _open():
        import sqlite3

        if readonly:
            con = sqlite3.connect(f"file:{path}?mode=ro", uri=True,
                                  check_same_thread=False)
        else:
            con = sqlite3.connect(path, check_same_thread=False, timeout=60)
        return con

    return _open


def _detect_paramstyle(con) -> str:
    """DB-API exposes ``paramstyle`` on the MODULE, not the connection;
    resolve it from the connection class's root module (sqlite3 -> qmark,
    psycopg2/MySQLdb -> pyformat/format). Unknown modules fall back to
    qmark."""
    import sys

    root = type(con).__module__.split(".")[0]
    mod = sys.modules.get(root)
    return getattr(mod, "paramstyle", "qmark")


def _placeholder(paramstyle: str) -> str:
    if paramstyle in ("format", "pyformat"):
        return "%s"
    if paramstyle == "qmark":
        return "?"
    raise NotImplementedError(
        f"DB-API paramstyle {paramstyle!r} is not supported (qmark and "
        "format/pyformat are); wrap the connection to translate"
    )


def _shard_sql(sql: str, shard_col: str, ph: str = "?") -> str:
    """Range-sharded form of the user's query. A bare table name filters
    directly (lets sqlite's implicit ``rowid`` shard a ``SELECT *``); an
    arbitrary query wraps as a subselect, so ``shard_col`` must appear in
    its SELECT list."""
    if _BARE_TABLE.match(sql.strip()):
        return f'SELECT * FROM {sql.strip()} WHERE "{shard_col}" BETWEEN {ph} AND {ph}'
    return f'SELECT * FROM ({sql}) AS __q WHERE "{shard_col}" BETWEEN {ph} AND {ph}'


def _probe_sql(sql: str, shard_col: str) -> str:
    if _BARE_TABLE.match(sql.strip()):
        return f'SELECT MIN("{shard_col}"), MAX("{shard_col}") FROM {sql.strip()}'
    return f'SELECT MIN("{shard_col}"), MAX("{shard_col}") FROM ({sql}) AS __q'


def _rows_to_table(rows: list, names: list[str], geom_col: str,
                   geometry: str, types: dict[str, pa.DataType] | None) -> pa.Table:
    cols: dict = {}
    for j, c in enumerate(names):
        vals = [r[j] for r in rows]
        if c == geom_col:
            cols[geometry] = pa.array(_decode_geom_values(vals), type=pa.large_binary())
            continue
        t = (types or {}).get(c)
        if t is None:
            cols[c] = pa.array(vals)
            continue
        try:
            # infer first, then SAFE cast to the shard schema type:
            # pa.array(vals, type=int64) silently truncates python floats
            # (2.5 -> 2); a float64 -> int64 safe cast raises instead
            inferred = pa.array(vals)
            cols[c] = inferred if inferred.type.equals(t) else inferred.cast(t)
        except (pa.ArrowInvalid, pa.ArrowTypeError,
                pa.ArrowNotImplementedError, TypeError, OverflowError):
            # the probe sample can under-observe a column (all-NULL first
            # rows); coerce per value so every shard emits the SAME schema
            # (the GPKG affinity lesson — per-shard inference breaks union).
            # Lossy coercions RAISE rather than corrupt (int(2.5) == 2).
            cols[c] = pa.array(
                [None if v is None else _coerce(v, t, c) for v in vals], type=t
            )
    return pa.table(cols)


def _coerce(v, t: pa.DataType, col: str):
    if pa.types.is_integer(t):
        iv = int(v)
        if iv != v:
            raise ValueError(
                f"column {col!r}: value {v!r} does not fit the shard schema "
                f"type {t} without loss; read with shard_col=None or fix the "
                "source column typing"
            )
        return iv
    if pa.types.is_floating(t):
        return float(v)
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).decode("utf-8", "replace")
    return str(v)


def _result_types(rows: list, names: list[str], geom_col: str) -> dict[str, pa.DataType]:
    """Stable cross-shard Arrow types from the probe shard's values
    (int64 -> float64 -> string widening; all-NULL columns pin to string
    rather than Arrow's null type, which breaks shard union)."""
    types: dict[str, pa.DataType] = {}
    for j, c in enumerate(names):
        if c == geom_col:
            continue
        t: pa.DataType = pa.string()
        seen = [r[j] for r in rows if r[j] is not None]
        if seen:
            if all(isinstance(v, (int, np.integer)) and not isinstance(v, bool) for v in seen):
                t = pa.int64()
            elif all(isinstance(v, (int, float, np.floating)) and not isinstance(v, bool) for v in seen):
                t = pa.float64()
            elif all(isinstance(v, (bytes, bytearray, memoryview)) for v in seen):
                t = pa.large_binary()
        types[c] = t
    return types


class _SqlShard:
    """Execute one shard range; connection opened once per actor
    (``con_factory`` runs in the worker, never pickled live handles)."""

    def __init__(self, con_factory, sharded_sql: str, geom_col: str,
                 geometry: str, names: list[str], types: dict[str, pa.DataType]):
        self.con = con_factory()
        self.sql = sharded_sql
        self.geom_col = geom_col
        self.geometry = geometry
        self.names = names
        self.types = types

    def __call__(self, b: pa.Table) -> pa.Table:
        tables = []
        for i in range(b.num_rows):
            lo = b.column("lo")[i].as_py()
            hi = b.column("hi")[i].as_py()
            cur = self.con.cursor()  # DB-API: execute lives on the cursor
            cur.execute(self.sql, (lo, hi))
            rows = cur.fetchall()
            tables.append(_rows_to_table(rows, self.names, self.geom_col,
                                         self.geometry, self.types))
        if not tables:
            # empty blocks must carry the SAME schema as populated shards
            # (names + probe types), or downstream union/schema() diverges
            return _rows_to_table([], self.names, self.geom_col,
                                  self.geometry, self.types)
        return pa.concat_tables(tables)


def read_postgis(
    sql: str,
    con_factory,
    geom_col: str = "geom",
    geometry: str = "geometry",
    shard_col: str | None = None,
    parallelism: int = 16,
    params: tuple = (),
) -> ray.data.Dataset:
    """Reference ``io/sql.py:158 _read_postgis(sql, con, geom_col, ...)``.

    ``sql`` is a table name or a full query whose ``geom_col`` holds WKB
    bytes or hex-EWKB text. ``con_factory`` is a zero-arg picklable callable
    returning a DB-API connection (e.g. ``lambda: sqlite3.connect(path)``;
    for PostGIS, a psycopg2 ``connect`` partial). With ``shard_col`` (an
    indexed integer column; sqlite's implicit ``rowid`` works on bare table
    names) the read fans out over ``parallelism`` range shards. ``params``
    only applies to the unsharded single-task path.
    """
    if not isinstance(sql, str):
        raise ValueError("sql must be a string")
    con = con_factory()
    try:
        ph = _placeholder(_detect_paramstyle(con))
        cur = con.cursor()
        if shard_col is None:
            q = f"SELECT * FROM {sql.strip()}" if _BARE_TABLE.match(sql.strip()) else sql
            cur.execute(q, params) if params else cur.execute(q)
            names = [d[0] for d in cur.description]
            if geom_col not in names:
                raise ValueError(f"Query missing geometry column {geom_col!r}")
            rows = cur.fetchall()
            return ray.data.from_arrow(
                _rows_to_table(rows, names, geom_col, geometry,
                               _result_types(rows, names, geom_col))
            )
        if params:
            raise ValueError("params and shard_col cannot be combined (the "
                             "sharded WHERE clause owns the placeholders)")
        cur.execute(_probe_sql(sql, shard_col))
        lo, hi = cur.fetchone()
        # a bounded probe pins column names + cross-shard types; LIMIT keeps
        # backends without lazy cursors from materializing the whole range
        # server-side just to hand back 256 sample rows. It runs even when
        # the MIN/MAX probe says EMPTY — cur.description carries the full
        # column set at 0 rows, so an empty read keeps the populated-path
        # schema instead of collapsing to {geometry} (downstream
        # select_columns/union would fail only on the empty case otherwise)
        empty = lo is None
        cur.execute(
            _shard_sql(sql, shard_col, ph) + " LIMIT 256",
            (0, -1) if empty else (lo, hi),
        )
        names = [d[0] for d in cur.description]
        if geom_col not in names:
            raise ValueError(f"Query missing geometry column {geom_col!r}")
        sample = cur.fetchmany(256)
        types = _result_types(sample, names, geom_col)
        if empty:
            return ray.data.from_arrow(
                _rows_to_table([], names, geom_col, geometry, types)
            )
    finally:
        con.close()

    lo, hi = int(lo), int(hi)
    nshards = max(1, min(int(parallelism), hi - lo + 1))
    edges = np.linspace(lo, hi + 1, nshards + 1).astype(np.int64)
    shards = pa.table({
        "lo": pa.array(edges[:-1]),
        "hi": pa.array(edges[1:] - 1),
    })
    return ray.data.from_arrow(shards).repartition(nshards).map_batches(
        _SqlShard,
        fn_constructor_args=(con_factory, _shard_sql(sql, shard_col, ph),
                             geom_col, geometry, names, types),
        batch_format="pyarrow",
        concurrency=(1, nshards),  # autoscaling pool, one actor per shard max
    )


_ARROW_TO_SQL = [
    (pa.types.is_boolean, "BOOLEAN"),
    (pa.types.is_integer, "BIGINT"),
    (pa.types.is_floating, "DOUBLE PRECISION"),
    (pa.types.is_string, "TEXT"),
    (pa.types.is_large_string, "TEXT"),
]


def _sql_type(t: pa.DataType) -> str:
    for pred, name in _ARROW_TO_SQL:
        if pred(t):
            return name
    raise NotImplementedError(
        f"write_postgis: no SQL type mapping for Arrow {t}; cast the column "
        "first (timestamps -> int64 epoch or ISO text)"
    )


class _SqlInsert:
    def __init__(self, con_factory, insert_sql: str, names: list[str],
                 geometry: str, srid: int, hex_encode: bool):
        self.con = con_factory()
        try:  # single-writer backends: wait for the file lock
            self.con.cursor().execute("PRAGMA busy_timeout = 60000")
        except Exception:
            try:  # not sqlite: clear the aborted transaction the failed
                self.con.rollback()  # statement left open (postgres)
            except Exception:
                pass
        # the insert placeholders are rendered per the WORKER connection's
        # paramstyle (same detection as the driver DDL path)
        ph = _placeholder(_detect_paramstyle(self.con))
        self.sql = insert_sql.replace("\x00PH\x00", ph)
        self.names = names
        self.geometry = geometry
        self.srid = srid
        self.hex = hex_encode

    def _encode(self, wkb: bytes | None):
        if wkb is None:
            return None
        if self.srid:  # reference _convert_to_ewkb: hex EWKB with SRID flag
            endian = "<" if wkb[0] == 1 else ">"
            (raw,) = struct.unpack_from(endian + "I", wkb, 1)
            head = wkb[:1] + struct.pack(endian + "I", raw | _EWKB_SRID) \
                + struct.pack(endian + "I", self.srid)
            wkb = head + wkb[5:]
        return wkb.hex() if self.hex else wkb

    def __call__(self, b: pa.Table) -> pa.Table:
        rows = []
        cols = [b.column(c).to_pylist() for c in self.names]
        gi = self.names.index(self.geometry)
        for tup in zip(*cols):
            tup = list(tup)
            tup[gi] = self._encode(tup[gi])
            rows.append(tuple(tup))
        self.con.cursor().executemany(self.sql, rows)
        self.con.commit()
        return pa.table({"rows_written": pa.array([len(rows)], type=pa.int64())})


def write_postgis(
    ds: ray.data.Dataset,
    name: str,
    con_factory,
    geometry: str = "geometry",
    geom_col: str = "geom",
    if_exists: str = "fail",
    srid: int = 0,
    hex_encode: bool = True,
    concurrency: int | None = None,
) -> int:
    """Reference ``io/sql.py:199 _write_postgis(gdf, name, con, if_exists)``.

    The driver issues the DDL (create/replace per ``if_exists``:
    fail|replace|append, reference semantics), then batches insert in
    parallel from worker-owned connections. Geometry is written as hex-EWKB
    text when ``hex_encode`` (the reference's ``_convert_to_ewkb`` wire
    form, ``io/sql.py:195``; SRID folded into the header when nonzero) else
    raw WKB bytes. Returns rows written.
    """
    if if_exists not in ("fail", "replace", "append"):
        raise ValueError(f"'{if_exists}' is not valid for if_exists")
    if not _BARE_TABLE.match(name):
        raise ValueError(f"invalid table name {name!r}")
    schema = ds.schema()
    names = list(schema.names)
    if geometry not in names:
        raise ValueError(f"dataset has no geometry column {geometry!r}")
    col_defs = []
    for c, t in zip(schema.names, schema.types):
        if c == geometry:
            col_defs.append(f'"{geom_col}" TEXT' if hex_encode else f'"{geom_col}" BLOB')
        else:
            col_defs.append(f'"{c}" {_sql_type(t)}')

    con = con_factory()
    try:
        cur = con.cursor()
        exists = True
        try:
            cur.execute(f"SELECT 1 FROM {name} LIMIT 1")
            cur.fetchall()
        except Exception:
            exists = False
            try:  # aborted-transaction backends (postgres) need a reset
                con.rollback()
            except Exception:
                pass
        if exists and if_exists == "fail":
            raise ValueError(f"Table {name!r} already exists")
        if exists and if_exists == "replace":
            cur.execute(f"DROP TABLE {name}")
            exists = False
        if not exists:
            cur.execute(f'CREATE TABLE {name} ({", ".join(col_defs)})')
        con.commit()
    finally:
        con.close()

    out_names = [geom_col if c == geometry else c for c in names]
    # placeholder marker rendered per-worker in _SqlInsert.__init__ (the
    # worker's DB-API module decides qmark vs format)
    placeholders = ", ".join(["\x00PH\x00"] * len(names))
    quoted = ", ".join(f'"{c}"' for c in out_names)
    insert = f"INSERT INTO {name} ({quoted}) VALUES ({placeholders})"
    pool = default_pool(concurrency)
    written = ds.map_batches(
        _SqlInsert,
        fn_constructor_args=(con_factory, insert, names, geometry, srid, hex_encode),
        batch_format="pyarrow",
        concurrency=pool,
    ).sum("rows_written")
    return int(written or 0)
