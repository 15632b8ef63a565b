"""GeoJSON encode/decode (reference geodataframe.py:416 from_features,
:573 to_json, :638 __geo_interface__, :667 iterfeatures).

Row-wise dict emit per the reference; implemented as map_batches returning
JSON strings (to_json as a column / whole-batch FeatureCollection) and a
from_features constructor building WKB from geometry dicts.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

from ..geom.wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geoms,
    from_wkb,
)
from .geoparquet import create_geo_metadata  # noqa: F401  (shared metadata shape)
from ..stages.clip import _parts_to_wkb


def geometry_to_geo_dict(g: Geoms, i: int) -> dict | None:
    t = int(g.row_types[i])
    if t == 0:
        return None
    p0, p1 = g.row_part_range(i)

    def part_coords(p):
        r0, r1 = g.part_ring_range(p)
        pt = int(g.part_types[p])
        if pt == POINT:
            c = g.ring_coords(r0)[0]
            return [float(c[0]), float(c[1])]
        if pt == LINESTRING:
            return [[float(x), float(y)] for x, y in g.ring_coords(r0)]
        return [
            [[float(x), float(y)] for x, y in g.ring_coords(r)] for r in range(r0, r1)
        ]

    parts = [part_coords(p) for p in range(p0, p1)]
    ptypes = [int(g.part_types[p]) for p in range(p0, p1)]
    if t == POINT:
        return {"type": "Point", "coordinates": parts[0] if parts else []}
    if t == LINESTRING:
        return {"type": "LineString", "coordinates": parts[0] if parts else []}
    if t == POLYGON:
        return {"type": "Polygon", "coordinates": parts[0] if parts else []}
    if t == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": parts}
    if t == MULTILINESTRING:
        return {"type": "MultiLineString", "coordinates": parts}
    if t == MULTIPOLYGON:
        return {"type": "MultiPolygon", "coordinates": parts}
    names = {POINT: "Point", LINESTRING: "LineString", POLYGON: "Polygon"}
    return {
        "type": "GeometryCollection",
        "geometries": [
            {"type": names[pt], "coordinates": c} for pt, c in zip(ptypes, parts)
        ],
    }


def geo_dict_to_wkb(d: dict | None) -> bytes | None:
    if d is None:
        return None
    t = d["type"]
    c = d.get("coordinates")
    if t == "Point":
        return _parts_to_wkb([(POINT, [np.asarray([c], dtype=np.float64)])])
    if t == "LineString":
        return _parts_to_wkb([(LINESTRING, [np.asarray(c, dtype=np.float64)])])
    if t == "Polygon":
        return _parts_to_wkb([(POLYGON, [np.asarray(r, dtype=np.float64) for r in c])])
    if t == "MultiPoint":
        return _parts_to_wkb([(POINT, [np.asarray([p], dtype=np.float64)]) for p in c])
    if t == "MultiLineString":
        return _parts_to_wkb([(LINESTRING, [np.asarray(l, dtype=np.float64)]) for l in c])
    if t == "MultiPolygon":
        return _parts_to_wkb(
            [(POLYGON, [np.asarray(r, dtype=np.float64) for r in poly]) for poly in c]
        )
    if t == "GeometryCollection":
        parts = []
        for sub in d["geometries"]:
            st = sub["type"]
            sc = sub["coordinates"]
            if st == "Point":
                parts.append((POINT, [np.asarray([sc], dtype=np.float64)]))
            elif st == "LineString":
                parts.append((LINESTRING, [np.asarray(sc, dtype=np.float64)]))
            elif st == "Polygon":
                parts.append((POLYGON, [np.asarray(r, dtype=np.float64) for r in sc]))
        return _parts_to_wkb(parts)
    raise ValueError(t)


def to_json_column(ds: ray.data.Dataset, geometry="geometry", out="feature_json"):
    """One GeoJSON Feature string per row (iterfeatures semantics)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        props_cols = [c for c in b.column_names if c != geometry]
        props = {c: b.column(c).to_pylist() for c in props_cols}
        vals = []
        for i in range(len(g)):
            vals.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "geometry": geometry_to_geo_dict(g, i),
                        "properties": {c: props[c][i] for c in props_cols},
                    },
                    default=str,
                )
            )
        return b.append_column(out, pa.array(vals, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def from_features(features: list[dict], geometry: str = "geometry") -> pa.Table:
    """GeoDataFrame.from_features analog -> Arrow table with WKB geometry."""
    wkbs = []
    prop_keys: list[str] = []
    for ft in features:
        wkbs.append(geo_dict_to_wkb(ft.get("geometry")))
        for k in (ft.get("properties") or {}):
            if k not in prop_keys:
                prop_keys.append(k)
    cols: dict = {}
    for k in prop_keys:
        cols[k] = pa.array([(ft.get("properties") or {}).get(k) for ft in features])
    cols[geometry] = pa.array(wkbs, type=pa.large_binary())
    return pa.table(cols)


def read_file(path: str, columns: list[str] | None = None, rows: int | None = None) -> ray.data.Dataset:
    """io/file.py:50 ``read_file`` for the GDAL-free formats this engine can
    parse itself: .geojson / .json FeatureCollections (single file or a
    directory of them). OGR formats (shapefile, GPKG, ...) still need GDAL
    on a real cluster. Supports the reference's ``columns`` and ``rows``
    narrowing; bbox/mask filtering composes downstream (stages.clip / cx).
    """
    import glob
    import os

    if os.path.isdir(path):
        paths = sorted(
            glob.glob(os.path.join(path, "*.geojson")) + glob.glob(os.path.join(path, "*.json"))
        )
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no .geojson/.json files under {path!r}")
    if not all(p.endswith((".geojson", ".json")) for p in paths):
        raise NotImplementedError(
            "read_file parses GeoJSON in-sandbox; OGR formats need GDAL (cluster path)"
        )
    tables = []
    taken = 0
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
        if rows is not None:
            feats = feats[: max(0, rows - taken)]
            taken += len(feats)
        t = from_features(feats)
        if columns is not None:
            keep = [c for c in columns if c in t.column_names]
            if "geometry" not in keep and "geometry" in t.column_names:
                keep.append("geometry")
            t = t.select(keep)
        tables.append(t)
        if rows is not None and taken >= rows:
            break
    return ray.data.from_arrow(tables if len(tables) > 1 else tables[0])


def to_file(ds: ray.data.Dataset, path: str, geometry: str = "geometry") -> list[str]:
    """io/file.py:159 ``to_file`` for GeoJSON: one FeatureCollection file
    per block (resumable fragments, like the parquet sink), returns the
    written paths. Attribute columns become properties."""
    import os

    os.makedirs(path, exist_ok=True)
    paths: list[str] = []

    def write_block(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        attrs = [c for c in b.column_names if c != geometry]
        feats = []
        for i in range(len(b)):
            props = {c: b.column(c)[i].as_py() for c in attrs}
            feats.append(
                {
                    "type": "Feature",
                    "properties": props,
                    "geometry": geometry_to_geo_dict(g, i),
                }
            )
        return pa.table({"__json": pa.array([json.dumps({"type": "FeatureCollection", "features": feats})])})

    import uuid

    for i, block in enumerate(ds.map_batches(write_block, batch_format="pyarrow").iter_batches(batch_size=None, batch_format="pyarrow")):
        for j in range(len(block)):
            p = os.path.join(path, f"part-{i:05d}-{j}.geojson")
            with open(p, "w") as f:
                f.write(block.column("__json")[j].as_py())
            paths.append(p)
    return paths
