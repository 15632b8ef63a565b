"""Native GeoPackage read/write (no GDAL) — io/file.py read_file/to_file for
`.gpkg`, the OGC GeoPackage format (a SQLite database; public spec
OGC 12-128r19). Python's stdlib ``sqlite3`` reads it directly; geometry
cells are a "GP" header (magic, version, flags, srs_id, optional envelope)
followed by standard WKB — exactly the engine's native encoding.

Ray-first layout: the driver opens the file once for metadata (layer name,
geometry column, rowid span), then rowid-range shards decode in parallel
``map_batches`` actors, each holding its own read-only sqlite connection
(connection per actor in ``__init__``, spec's stateful-stage pattern).
Writes are driver-side: sqlite is single-writer by design — use the
parquet/feather sinks for scale; this exists for interchange.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

_GPKG_APP_ID = 0x47504B47  # "GPKG"


def _parse_gpkg_blob(b: bytes | None) -> bytes | None:
    """GeoPackageBinaryHeader -> the embedded standard WKB."""
    if b is None:
        return None
    if b[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = b[3]
    env = (flags >> 1) & 0b111
    envlen = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env]
    if flags & 0b00100000:
        raise NotImplementedError("GeoPackage extension geometry encodings")
    wkb = b[8 + envlen :]
    return wkb if wkb else None


def _decl_to_arrow(decl: str | None) -> pa.DataType:
    """SQLite declared type -> Arrow type via the documented affinity rules.

    Per-shard inference would give an all-NULL shard a null-typed column
    that conflicts with other shards' schemas (blocks must agree)."""
    d = (decl or "").upper()
    if "INT" in d:
        return pa.int64()
    if any(k in d for k in ("CHAR", "CLOB", "TEXT")):
        return pa.string()
    if "BLOB" in d or d == "":
        return pa.large_binary()
    if any(k in d for k in ("REAL", "FLOA", "DOUB")):
        return pa.float64()
    return pa.float64()  # NUMERIC affinity


def _coerce_vals(vals: list, t: pa.DataType, col: str) -> list:
    """Per-value coercion to the declared Arrow type (SQLite stores type per
    VALUE, not per column). Keeps the cross-shard schema stable when a value
    defies the declared affinity; unrepresentable values raise."""
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        try:
            if pa.types.is_integer(t):
                iv = int(v)
                if iv != v:  # int(2.5) == 2 would silently corrupt
                    raise ValueError(f"non-integral value {v!r}")
                out.append(iv)
            elif pa.types.is_floating(t):
                out.append(float(v))
            elif pa.types.is_string(t):
                out.append(v.decode("utf-8", "replace") if isinstance(v, bytes) else str(v))
            elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
                out.append(v if isinstance(v, (bytes, bytearray)) else str(v).encode())
            else:
                out.append(v)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f"GeoPackage column {col!r}: value {v!r} cannot be coerced to the "
                f"declared type {t} (SQLite stores types per value; this file "
                f"violates its declared column affinity)"
            ) from e
    return out


class _GpkgShard:
    """Decode one rowid range; sqlite connection opened once per actor."""

    def __init__(self, path: str, layer: str, gcol: str, attrs: list[str],
                 attr_types: list[str | None], geometry: str):
        import sqlite3

        # Ray's actor map worker calls __call__ from a different thread than
        # __init__; the connection is only ever used serially per actor
        self.con = sqlite3.connect(f"file:{path}?mode=ro", uri=True, check_same_thread=False)
        self.layer = layer
        self.gcol = gcol
        self.attrs = attrs
        self.types = [_decl_to_arrow(t) for t in attr_types]
        self.geometry = geometry

    def __call__(self, b: pa.Table) -> pa.Table:
        tables = []
        sel = ", ".join([f'"{c}"' for c in self.attrs] + [f'"{self.gcol}"'])
        for i in range(b.num_rows):
            lo = int(b.column("lo")[i].as_py())
            hi = int(b.column("hi")[i].as_py())
            rows = self.con.execute(
                f'SELECT {sel} FROM "{self.layer}" WHERE rowid BETWEEN ? AND ? ORDER BY rowid',
                (lo, hi),
            ).fetchall()
            cols: dict = {}
            for j, (c, t) in enumerate(zip(self.attrs, self.types)):
                vals = [r[j] for r in rows]
                try:
                    # infer first, then SAFE cast: pa.array(vals, type=int64)
                    # silently truncates python floats (2.5 -> 2), while a
                    # float64 -> int64 safe cast raises on any lossy value
                    inferred = pa.array(vals)
                    cols[c] = (
                        inferred if inferred.type.equals(t) else inferred.cast(t)
                    )
                except (pa.ArrowInvalid, pa.ArrowTypeError,
                        pa.ArrowNotImplementedError, TypeError, OverflowError):
                    # SQLite columns are dynamically typed per VALUE; letting
                    # pyarrow infer a per-shard type here would produce
                    # cross-shard schema divergence (the exact thing
                    # _decl_to_arrow exists to prevent) and fail downstream
                    # union/concat. Coerce each value to the DECLARED type so
                    # every shard emits the same schema; values that defy
                    # coercion raise with a clear message.
                    cols[c] = pa.array(_coerce_vals(vals, t, c), type=t)
            cols[self.geometry] = pa.array(
                [_parse_gpkg_blob(r[-1]) for r in rows], type=pa.large_binary()
            )
            tables.append(pa.table(cols))
        if not tables:
            return pa.table({self.geometry: pa.array([], type=pa.large_binary())})
        return pa.concat_tables(tables)


def read_geopackage(
    path: str,
    layer: str | None = None,
    geometry: str = "geometry",
    shard_rows: int = 65536,
) -> ray.data.Dataset:
    import sqlite3

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        if layer is None:
            row = con.execute(
                "SELECT table_name FROM gpkg_contents WHERE data_type='features' LIMIT 1"
            ).fetchone()
            if row is None:
                raise ValueError(f"no feature layers in {path!r}")
            layer = row[0]
        grow = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?", (layer,)
        ).fetchone()
        if grow is None:
            raise ValueError(f"layer {layer!r} has no registered geometry column")
        gcol = grow[0]
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        attrs = [r[1] for r in info if r[1] != gcol]
        attr_types = [r[2] for r in info if r[1] != gcol]
        span = con.execute(f'SELECT MIN(rowid), MAX(rowid) FROM "{layer}"').fetchone()
        # exact shard boundaries from every shard_rows-th rowid: a sparse
        # rowid space (deletes) would otherwise spawn shards of nothing
        bounds = [
            r[0]
            for r in con.execute(
                "SELECT rowid FROM (SELECT rowid, ROW_NUMBER() OVER (ORDER BY rowid) rn "
                f'FROM "{layer}") WHERE (rn - 1) % ? = 0 ORDER BY rowid',
                (shard_rows,),
            ).fetchall()
        ]
    finally:
        con.close()
    if span[0] is None:
        return ray.data.from_arrow(pa.table({geometry: pa.array([], type=pa.large_binary())}))
    hi = int(span[1])
    shards = [
        {"lo": int(b), "hi": int(bounds[i + 1]) - 1 if i + 1 < len(bounds) else hi}
        for i, b in enumerate(bounds)
    ]
    return ray.data.from_items(shards).map_batches(
        _GpkgShard,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(
            path=path, layer=layer, gcol=gcol, attrs=attrs, attr_types=attr_types,
            geometry=geometry
        ),
    )


def _sqlite_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    return "TEXT"


def write_geopackage(
    ds: ray.data.Dataset, path: str, layer: str | None = None, geometry: str = "geometry",
    max_rows: int = 10_000_000, max_bytes: int = 8 * 2**30
) -> str:
    """Spec-conformant single-layer sink: required gpkg_spatial_ref_sys rows,
    gpkg_contents + gpkg_geometry_columns registration, "GP" blob headers
    (little-endian, no envelope), application_id 'GPKG'.

    Single-sqlite-writer sink (the format is one sqlite file) — refuses
    metadata-provably oversized inputs; use to_parquet() for scale."""
    import sqlite3

    from ..geom import kernels as K
    from ..geom.wkb import from_wkb
    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_geopackage",
        "GeoPackage is a single-sqlite-file interchange sink written by one "
        "process; use to_parquet() (partitioned, parallel) for scale sinks.",
        max_rows, max_bytes,
    )
    t = pull_table(ds, ordered=True)
    if geometry not in t.column_names:
        if t.num_rows:
            raise KeyError(f"no column {geometry!r} in input")
        # an empty Dataset pulls as a 0-column table (Ray drops the schema)
        t = pa.table({geometry: pa.array([], type=pa.large_binary())})
    layer = layer or os.path.splitext(os.path.basename(path))[0]
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute(f"PRAGMA application_id = {_GPKG_APP_ID}")
        con.execute("PRAGMA user_version = 10300")  # GeoPackage 1.3
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER "
            "PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                (
                    "WGS 84 geodetic",
                    4326,
                    "EPSG",
                    4326,
                    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]]',
                    None,
                ),
            ],
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type "
            "TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name "
            "TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, PRIMARY KEY (table_name, column_name))"
        )
        attrs = [c for c in t.column_names if c != geometry]
        defs = "".join(
            f'"{c}" {_sqlite_type(t.schema.field(c).type)}, ' for c in attrs
        )
        con.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, '
            f'{defs}"{geometry}" BLOB)'
        )
        g = from_wkb(t.column(geometry))
        gb = K.bounds(g)
        ok = ~np.isnan(gb).any(axis=1)
        box = (
            (float(gb[ok, 0].min()), float(gb[ok, 1].min()),
             float(gb[ok, 2].max()), float(gb[ok, 3].max()))
            if ok.any()
            else (None, None, None, None)
        )
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, min_x, min_y, "
            "max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,0)",
            (layer, "features", layer, *box),
        )
        # record the specific type when the layer is uniform (what OGR
        # writes; list_layers and other readers surface it), generic
        # GEOMETRY for mixed/empty layers
        _names = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 4: "MULTIPOINT",
                  5: "MULTILINESTRING", 6: "MULTIPOLYGON", 7: "GEOMETRYCOLLECTION"}
        present = set(np.unique(g.row_types[g.row_types > 0]).tolist())
        gt_name = _names[present.pop()] if len(present) == 1 else "GEOMETRY"
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,0,0,0)",
            (layer, geometry, gt_name),
        )
        head = b"GP\x00\x01" + struct.pack("<i", 0)  # v0, LE, no envelope, srs 0
        wcol = t.column(geometry).to_pylist()
        blobs = [None if w is None else head + w for w in wcol]
        acols = {c: t.column(c).to_pylist() for c in attrs}
        ph = ", ".join(["?"] * (len(attrs) + 1))
        names = ", ".join([f'"{c}"' for c in attrs] + [f'"{geometry}"'])
        con.executemany(
            f'INSERT INTO "{layer}" ({names}) VALUES ({ph})',
            [tuple(acols[c][i] for c in attrs) + (blobs[i],) for i in range(t.num_rows)],
        )
        con.commit()
    finally:
        con.close()
    return path
