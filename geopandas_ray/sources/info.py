"""``list_layers`` — the reference's file-introspection surface
(io/file.py ``_list_layers``: "a DataFrame with columns 'name' and
'geometry_type' and one row per layer"), implemented natively per format
instead of via pyogrio/fiona.

Driver-only metadata probes: every branch reads headers / catalog tables,
never feature payloads (except GeoJSON, whose type lives only in the
features — documented below). Layers GeoPandas would not read (non-spatial
GPKG tables) carry ``geometry_type=None``, matching the reference contract.
"""

from __future__ import annotations

import json
import os

import pandas as pd

# ESRI shape-type code -> OGR-style layer geometry name (spec table;
# mirrors shapefile._SHAPES base types, adding the Z/M suffix OGR reports)
_SHP_NAMES = {
    0: None,
    1: "Point", 11: "Point Z", 21: "Point M",
    3: "LineString", 13: "LineString Z", 23: "LineString M",
    5: "Polygon", 15: "Polygon Z", 25: "Polygon M",
    8: "MultiPoint", 18: "MultiPoint Z", 28: "MultiPoint M",
}

# FlatGeobuf header.fbs GeometryType enum -> name
_FGB_NAMES = {
    0: "Unknown", 1: "Point", 2: "LineString", 3: "Polygon",
    4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon",
    7: "GeometryCollection",
}

# GPKG stores uppercase type names in gpkg_geometry_columns; OGR reports
# mixed case
_GPKG_NAMES = {
    "GEOMETRY": "Unknown", "POINT": "Point", "LINESTRING": "LineString",
    "POLYGON": "Polygon", "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString", "MULTIPOLYGON": "MultiPolygon",
    "GEOMETRYCOLLECTION": "GeometryCollection",
}

# OGR's fixed GPX datasource surface (gpx.LAYERS with their types)
_GPX_LAYERS = [
    ("waypoints", "Point"),
    ("routes", "LineString"),
    ("tracks", "MultiLineString"),
    ("route_points", "Point"),
    ("track_points", "Point"),
]


def _df(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["name", "geometry_type"])


def _shp_layers(path: str) -> pd.DataFrame:
    import struct

    with open(path, "rb") as f:
        head = f.read(36)
    if len(head) < 36:
        raise ValueError(f"{path!r}: truncated shapefile header")
    (stype,) = struct.unpack_from("<i", head, 32)
    if stype not in _SHP_NAMES:
        raise ValueError(f"{path!r}: unknown shape type code {stype}")
    name = os.path.splitext(os.path.basename(path))[0]
    return _df([(name, _SHP_NAMES[stype])])


def _gpkg_layers(path: str) -> pd.DataFrame:
    import sqlite3

    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, c.data_type, g.geometry_type_name "
            "FROM gpkg_contents c LEFT JOIN gpkg_geometry_columns g "
            "ON c.table_name = g.table_name ORDER BY c.table_name"
        ).fetchall()
    finally:
        con.close()
    out = []
    for name, data_type, gt in rows:
        if data_type == "features" and gt is not None:
            out.append((name, _GPKG_NAMES.get(gt.upper(), "Unknown")))
        else:
            # non-spatial layer: reference contract is geometry_type None
            out.append((name, None))
    return _df(out)


def _fgb_layers(path: str) -> pd.DataFrame:
    from .flatgeobuf import _read_header

    h = _read_header(path)
    name = h.get("name") or os.path.splitext(os.path.basename(path))[0]
    gt = _FGB_NAMES.get(h["geometry_type"], "Unknown")
    if h.get("has_z") and gt not in (None, "Unknown"):
        gt += " Z"
    return _df([(name, gt)])


def _geojson_layers(path: str) -> pd.DataFrame:
    # the type lives only in the features (no header): one driver-side
    # parse — GeoJSON is the interchange format, files are driver-sized
    # by construction (to_json writes one FeatureCollection per block)
    with open(path) as f:
        doc = json.load(f)
    feats = doc.get("features", []) if isinstance(doc, dict) else []
    types = {
        (ft.get("geometry") or {}).get("type")
        for ft in feats
        if ft.get("geometry") is not None
    }
    types.discard(None)
    gt = types.pop() if len(types) == 1 else "Unknown"
    name = os.path.splitext(os.path.basename(path))[0]
    return _df([(name, gt)])


def list_layers(path: str) -> pd.DataFrame:
    """Layers in ``path`` with their geometry types (io/file.py
    ``_list_layers``). Single-layer formats report one row named after the
    file; GPX reports OGR's fixed five-layer surface; GPKG enumerates
    ``gpkg_contents`` (non-spatial tables get ``geometry_type=None``);
    GML/KML report 'Unknown' (their type lives per-feature and probing it
    would read the whole document)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".shp":
        return _shp_layers(path)
    if ext == ".gpkg":
        return _gpkg_layers(path)
    if ext == ".fgb":
        return _fgb_layers(path)
    if ext == ".gpx":
        return _df(list(_GPX_LAYERS))
    if ext in (".geojson", ".json"):
        return _geojson_layers(path)
    if ext in (".gml", ".xml", ".kml"):
        name = os.path.splitext(os.path.basename(path))[0]
        return _df([(name, "Unknown")])
    if ext in (".geojsonl", ".geojsons", ".ndjson"):
        return _geojsonseq_layers(path)
    if ext == ".csv":
        # geometry type lives per-row in the WKT field; OGR also reports
        # the CSV layer without probing
        name = os.path.splitext(os.path.basename(path))[0]
        return _df([(name, "Unknown")])
    raise ValueError(
        f"list_layers: unsupported extension {ext!r} for {path!r} "
        "(.shp/.gpkg/.fgb/.gpx/.geojson/.json/.gml/.xml/.kml/"
        ".geojsonl/.geojsons/.ndjson/.csv)"
    )


def _geojsonseq_layers(path: str) -> pd.DataFrame:
    # head probe only — the type lives per-feature and the file may be
    # huge; OGR's GeoJSONSeq driver likewise reports from a bounded scan
    from .geojsonseq import _clean, _parse_record

    types: set = set()
    truncated = False
    with open(path, encoding="utf-8") as f:
        for n, raw in enumerate(f):
            if n >= 4096:
                truncated = True  # unscanned tail -> can't claim uniform
                break
            s = _clean(raw)
            if not s:
                continue
            geom, _ = _parse_record(s)
            if geom is not None:
                types.add(geom.get("type"))
    gt = types.pop() if (len(types) == 1 and not truncated) else "Unknown"
    name = os.path.splitext(os.path.basename(path))[0]
    return _df([(name, gt)])
