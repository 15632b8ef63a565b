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
