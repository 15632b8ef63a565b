"""Native KML (OGC Keyhole Markup Language 2.2) source/sink — no GDAL.

Format: the public OGC KML 2.2 encoding. Reference surface:
io/file.py:30-34 (the OGR driver map routes ``.kml`` through GDAL's
KML/LIBKML drivers; this engine parses the XML natively like its
shapefile / GeoPackage / FlatGeobuf / GPX / GML sources).

Covered encoding (what the basic OGR KML driver reads/writes):
- ``<Placemark>`` features anywhere under Document/Folder nesting;
- ``<name>`` / ``<description>`` as the OGR-style Name/Description
  attributes, plus ``<ExtendedData>`` ``Data[@name]/value`` and
  ``SchemaData/SimpleData[@name]`` typed by per-file inference
  (int64 → float64 → string);
- geometries: Point / LineString / LinearRing / Polygon
  (outerBoundaryIs/innerBoundaryIs) / MultiGeometry, with the KML
  ``lon,lat[,alt]`` tuple encoding (altitude dropped — 2D engine).

Scale design: like the GPX/GML sources, the driver only lists paths;
each .kml file parses INSIDE a Ray task (``read_binary_files`` →
``map_batches``), so a directory of KML exports parses file-parallel.
Attribute typing is inferred per file. The writer emits a KML Document
of Placemarks on the driver (interchange sink, same
``guard_driver_sized`` guardrail as .shp/.gpkg/.gpx/.gml): ``name`` /
``description`` columns map to the native elements, every other column
to ExtendedData Data/value pairs, floats via repr() so read-backs are
bit-exact.
"""

from __future__ import annotations

import os
from xml.etree import ElementTree as ET

import numpy as np
import pyarrow as pa
import ray.data

from ..geom.wkb import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    from_wkb,
)
from ..stages.clip import _parts_to_wkb
from .gml import _local, _typed_column

_GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon", "MultiGeometry"}


def _kml_coords(el) -> np.ndarray:
    """2D coordinate array off a <coordinates> child: whitespace-separated
    ``lon,lat[,alt]`` tuples (altitude dropped)."""
    for c in el.iter():
        if _local(c.tag) == "coordinates" and c.text:
            pts = [
                tuple(float(v) for v in tok.split(",")[:2])
                for tok in c.text.split()
            ]
            return np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    return np.empty((0, 2), dtype=np.float64)


def _geom_to_parts(el) -> list:
    """[(part_type, [rings...])] for _parts_to_wkb off a KML geometry."""
    t = _local(el.tag)
    if t == "Point":
        c = _kml_coords(el)
        return [(POINT, [c])] if len(c) else []  # coordinate-less => empty
    if t in ("LineString", "LinearRing"):
        c = _kml_coords(el)
        return [(LINESTRING, [c])] if len(c) else []
    if t == "Polygon":
        ext, ints = None, []
        for b in el:
            n = _local(b.tag)
            if n == "outerBoundaryIs":
                ext = _kml_coords(b)
            elif n == "innerBoundaryIs":
                ints.append(_kml_coords(b))
        if ext is None:
            ext = _kml_coords(el)
            ints = []
        return [(POLYGON, [ext, *ints])] if len(ext) else []
    if t == "MultiGeometry":
        parts = []
        for sub in el:
            if _local(sub.tag) in _GEOM_TAGS:
                parts.extend(_geom_to_parts(sub))
        return parts
    raise ValueError(f"unsupported KML geometry element <{t}>")


def _parse_kml(data: bytes, geometry: str = "geometry") -> pa.Table:
    root = ET.fromstring(data)
    rows: list[dict] = []
    attr_names: list[str] = []

    def note(row, n, v):
        if n not in row:
            row[n] = v
            if n not in attr_names:
                attr_names.append(n)

    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        row: dict = {}
        geom = None
        for child in pm:
            n = _local(child.tag)
            if n in _GEOM_TAGS:
                geom = child
            elif n in ("name", "description"):
                note(row, n, child.text)
            elif n == "ExtendedData":
                for d in child.iter():
                    dn = _local(d.tag)
                    if dn == "Data":
                        val = next(
                            (k.text for k in d if _local(k.tag) == "value"), None
                        )
                        note(row, d.get("name", "data"), val)
                    elif dn == "SimpleData":
                        note(row, d.get("name", "data"), d.text)
        # single-child MultiGeometry keeps its Multi row type (OGR parity);
        # a child-less <MultiGeometry/> or coordinate-less geometry reads
        # as null rather than crashing _parts_to_wkb([])
        parts = _geom_to_parts(geom) if geom is not None else []
        row[geometry] = (
            _parts_to_wkb(parts, force_multi=_local(geom.tag) == "MultiGeometry")
            if parts
            else None
        )
        rows.append(row)
    if geometry in attr_names:
        raise ValueError(
            f"KML attribute {geometry!r} collides with the geometry output "
            "column; pass geometry=<other name> to read_kml"
        )
    cols = {n: _typed_column([r.get(n) for r in rows]) for n in attr_names}
    cols[geometry] = pa.array(
        [r.get(geometry) for r in rows], type=pa.large_binary()
    )
    return pa.table(cols)


def read_kml(
    path: str,
    geometry: str = "geometry",
    column_types: dict | None = None,
) -> ray.data.Dataset:
    """File-parallel KML read: one parse task per .kml file.

    ``column_types``: optional {name: pyarrow type} overrides applied
    after per-file inference — pass for heterogeneous directories where
    files disagree on an ExtendedData column's numeric type (see
    gml._cast_declared)."""
    from .gml import _cast_declared

    if os.path.isdir(path):
        import glob

        paths = sorted(glob.glob(os.path.join(path, "*.kml")))
        if not paths:
            raise FileNotFoundError(f"no .kml files under {path!r}")
    else:
        paths = [path]
    raw = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        tables = [
            _cast_declared(_parse_kml(d.as_py(), geometry), column_types)
            for d in b.column("bytes")
        ]
        # "permissive": per-file inference can disagree (int64 vs double)
        # across files in one batch; "default" promotion raises in-task
        return pa.concat_tables(tables, promote_options="permissive")

    return raw.map_batches(parse, batch_format="pyarrow")


def _fmt(x: float) -> str:
    return repr(float(x))


def _coord_text(coords: np.ndarray) -> str:
    return " ".join(f"{_fmt(c[0])},{_fmt(c[1])}" for c in coords)


def _geom_to_kml(g, i: int) -> str:
    rt = int(g.row_types[i])
    if rt == 0:
        return ""
    p0, p1 = g.row_part_range(i)

    def part_xml(p: int) -> str:
        pt = int(g.part_types[p])
        r0, r1 = g.part_ring_range(p)
        if pt == POINT:
            c = g.ring_coords(r0)[0]
            return f"<Point><coordinates>{_fmt(c[0])},{_fmt(c[1])}</coordinates></Point>"
        if pt == LINESTRING:
            return (
                "<LineString><coordinates>"
                + _coord_text(g.ring_coords(r0))
                + "</coordinates></LineString>"
            )
        rings = []
        for r in range(r0, r1):
            tag = "outerBoundaryIs" if r == r0 else "innerBoundaryIs"
            rings.append(
                f"<{tag}><LinearRing><coordinates>"
                + _coord_text(g.ring_coords(r))
                + f"</coordinates></LinearRing></{tag}>"
            )
        return "<Polygon>" + "".join(rings) + "</Polygon>"

    parts = [part_xml(p) for p in range(p0, p1)]
    if rt in (POINT, LINESTRING, POLYGON):
        return parts[0]
    if rt in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON) or rt > POLYGON:
        return "<MultiGeometry>" + "".join(parts) + "</MultiGeometry>"
    return parts[0]


def write_kml(
    ds: ray.data.Dataset,
    path: str,
    geometry: str = "geometry",
    document_name: str = "geopandas_ray",
    max_rows: int = 5_000_000,
    max_bytes: int = 2 * 2**30,
) -> str:
    """Driver-assembled KML Document sink (interchange; use the parquet
    sink for scale). ``name``/``description`` columns map to the native
    Placemark elements; every other column becomes an ExtendedData
    Data/value pair recovered through per-file type inference."""
    from xml.sax.saxutils import escape

    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_kml",
        "KML is a driver-assembled XML interchange format; use to_parquet() "
        "(partitioned, parallel) for scale sinks.",
        max_rows, max_bytes,
    )
    t = pull_table(ds, ordered=True)
    if geometry not in t.column_names:
        if t.num_rows:
            raise KeyError(f"no column {geometry!r} in input")
        t = pa.table({geometry: pa.array([], type=pa.large_binary())})
    g = from_wkb(t.column(geometry))
    attrs = [c for c in t.column_names if c != geometry]
    native = [c for c in attrs if c in ("name", "description")]
    extended = [c for c in attrs if c not in ("name", "description")]
    cols = {c: t.column(c).to_pylist() for c in attrs}
    is_float = {c: pa.types.is_floating(t.schema.field(c).type) for c in attrs}

    def txt(c, v):
        return _fmt(v) if is_float[c] else escape(str(v))

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2">',
        f"<Document><name>{escape(document_name)}</name>",
    ]
    for i in range(len(g)):
        out.append("  <Placemark>")
        for c in native:
            v = cols[c][i]
            if v is not None:
                out.append(f"    <{c}>{txt(c, v)}</{c}>")
        if extended:
            ed = ["    <ExtendedData>"]
            any_v = False
            for c in extended:
                v = cols[c][i]
                if v is None:
                    continue
                any_v = True
                # quote-escape too: Data name is an ATTRIBUTE value, a bare
                # '"' in a column name would break the XML
                nm = escape(c, {'"': "&quot;"})
                ed.append(
                    f'      <Data name="{nm}"><value>{txt(c, v)}</value></Data>'
                )
            ed.append("    </ExtendedData>")
            if any_v:
                out.extend(ed)
        gx = _geom_to_kml(g, i)
        if gx:
            out.append(f"    {gx}")
        out.append("  </Placemark>")
    out.append("</Document></kml>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")
    return path
