"""Native GML (OGC Geography Markup Language) source/sink — no GDAL.

Format: the public OGC GML 3.2 / 2.1 encodings. Reference surface:
io/file.py:30-34 (the OGR driver map routes ``.gml``/``.xml`` through
GDAL's GML driver; this engine parses the XML natively like its
shapefile / GeoPackage / FlatGeobuf / GPX sources).

Covered encoding (the pragmatic subset real WFS/GML dumps use):
- feature containers: ``gml:featureMember`` / ``gml:featureMembers`` /
  ``wfs:member`` children of the collection root;
- one attribute per simple child element (text content), typed by
  per-file inference (int64 → float64 → string);
- geometry properties holding ``Point`` / ``LineString`` / ``Polygon``
  (exterior/interior or outer/innerBoundaryIs) / ``MultiPoint`` /
  ``MultiCurve``/``MultiLineString`` / ``MultiSurface``/``MultiPolygon``
  with ``pos`` / ``posList`` / ``coordinates`` coordinate encodings.

Scale design: like the GPX source, the driver only lists paths; each
.gml file parses INSIDE a Ray task (``read_binary_files`` →
``map_batches``), so a directory of WFS page dumps parses file-parallel.
Attribute typing is inferred per file — a heterogeneous directory should
be normalized with ``map_batches``/casts downstream (single-file inputs,
the common case, are always self-consistent). The writer emits a GML 3.2
FeatureCollection on the driver (interchange sink, same
``guard_driver_sized`` guardrail as .shp/.gpkg/.gpx).
"""

from __future__ import annotations

import os
import re
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

_GEOM_TAGS = {
    "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
    "MultiCurve", "MultiSurface", "MultiPolygon", "MultiGeometry", "Curve",
    "Surface",
}
_MEMBER_TAGS = {"featureMember", "member", "featureMembers"}


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else str(tag)


def _declared_dim(el) -> int:
    d = el.get("srsDimension")
    return int(d) if d else 0


def _axis_split(vals: np.ndarray, dim: int) -> np.ndarray:
    """Flat axis-value list -> (n, 2) xy. A declared srsDimension wins;
    undeclared lists infer 3D only when the count fits 3D and NOT 2D
    (an even-count 3D posList without srsDimension is undecidable per
    spec and reads as 2D). The old unconditional reshape(-1, 2) silently
    interleaved z values into x/y on declared-3D input."""
    if not dim:
        if vals.size % 2 == 0:
            dim = 2
        elif vals.size % 3 == 0:
            dim = 3
        else:
            raise ValueError(
                f"GML coordinate list of {vals.size} values fits neither 2D "
                "nor 3D and carries no srsDimension"
            )
    return np.ascontiguousarray(vals.reshape(-1, dim)[:, :2])


def _coords_of(el) -> np.ndarray:
    """Coordinate array off a geometry element supporting pos / posList /
    coordinates (GML 2 ``x,y x,y`` or GML 3 space-separated tuples).
    srsDimension-aware (z dropped — planar engine); a SEQUENCE of
    <gml:pos> children concatenates in document order (GML 3 allows
    pos-per-vertex lines/rings)."""
    dim = _declared_dim(el)
    pos_pts: list[np.ndarray] = []
    for c in el.iter():
        n = _local(c.tag)
        if n == "posList":
            vals = np.asarray(c.text.split(), dtype=np.float64)
            return _axis_split(vals, _declared_dim(c) or dim)
        if n == "pos":
            vals = np.asarray(c.text.split(), dtype=np.float64)
            pos_pts.append(vals[:2])
        elif n == "coordinates":
            txt = c.text.strip()
            # GML2: tuples separated by whitespace, members by comma
            pts = [tuple(float(v) for v in tok.split(",")[:2]) for tok in txt.split()]
            return np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    if pos_pts:
        return np.vstack(pos_pts)
    return np.empty((0, 2), dtype=np.float64)


def _curve_coords(el) -> np.ndarray:
    """gml:Curve -> ONE coordinate path: concatenate every linear
    segment's coordinates in document order, dropping a segment's first
    point when it repeats the previous segment's last (adjacent curve
    segments share endpoints per spec). Non-linear segments (Arc family)
    would need densification and raise instead of corrupting."""
    segs: list[np.ndarray] = []
    for c in el.iter():
        n = _local(c.tag)
        if n in ("LineStringSegment", "GeodesicString"):
            segs.append(_coords_of(c))
        elif n in ("Arc", "ArcString", "ArcByCenterPoint", "Circle",
                   "CircleByCenterPoint", "CubicSpline", "Bezier"):
            raise ValueError(
                f"GML non-linear curve segment <{n}> is not supported "
                "(linear LineStringSegment/GeodesicString only)"
            )
    if not segs:
        return _coords_of(el)  # bare Curve without <segments>
    out: list[np.ndarray] = []
    for p in segs:
        if not len(p):
            continue
        if out and np.array_equal(out[-1][-1], p[0]):
            p = p[1:]
        if len(p):
            out.append(p)
    return np.vstack(out) if out else np.empty((0, 2), dtype=np.float64)


def _ring_coords(poly_el):
    """(exterior, [interiors...]) coordinate arrays of a Polygon element."""
    ext, ints = None, []
    for c in poly_el:
        n = _local(c.tag)
        if n in ("exterior", "outerBoundaryIs"):
            ext = _coords_of(c)
        elif n in ("interior", "innerBoundaryIs"):
            ints.append(_coords_of(c))
    if ext is None:
        ext = _coords_of(poly_el)
        ints = []
    return ext, ints


def _geom_to_parts(el) -> list:
    """[(part_type, [rings...])] for _parts_to_wkb off a GML geometry."""
    t = _local(el.tag)
    if t == "Point":
        c = _coords_of(el)
        return [(POINT, [c])] if len(c) else []  # coordinate-less => empty
    if t in ("LineString", "Curve"):
        c = _curve_coords(el) if t == "Curve" else _coords_of(el)
        return [(LINESTRING, [c])] if len(c) else []
    if t in ("Polygon", "Surface"):
        if t == "Surface":
            # gml:Surface carries its rings under patches/PolygonPatch —
            # the generic _ring_coords fallback saw only the first posList
            # (exterior) and silently dropped holes + later patches. One
            # POLYGON part per patch (multi-patch Surface reads back as a
            # MultiPolygon row, OGR parity).
            patches = [
                c for c in el.iter()
                if _local(c.tag) in ("PolygonPatch", "Rectangle", "Triangle")
            ]
            if patches:
                parts = []
                for p in patches:
                    ext, ints = _ring_coords(p)
                    if len(ext):
                        parts.append((POLYGON, [ext, *ints]))
                return parts
        ext, ints = _ring_coords(el)
        return [(POLYGON, [ext, *ints])] if len(ext) else []
    if t in (
        "MultiPoint", "MultiLineString", "MultiCurve", "MultiSurface",
        "MultiPolygon", "MultiGeometry",
    ):
        parts = []
        for mem in el:  # pointMember / curveMember / surfaceMember / ...Members
            for sub in ([mem] if _local(mem.tag) in _GEOM_TAGS else list(mem)):
                if _local(sub.tag) in _GEOM_TAGS:
                    parts.extend(_geom_to_parts(sub))
        return parts
    raise ValueError(f"unsupported GML geometry element <{t}>")


def _feature_elements(root):
    for m in root.iter():
        if _local(m.tag) in _MEMBER_TAGS:
            for f in m:
                yield f


def _typed_column(vals: list):
    """int64 -> float64 -> string inference over one file's column."""
    nn = [v for v in vals if v is not None]
    for typ, cast in ((pa.int64(), int), (pa.float64(), float)):
        try:
            return pa.array(
                [cast(v) if v is not None else None for v in vals], type=typ
            )
        except (ValueError, TypeError):
            continue
    return pa.array(
        [str(v) if v is not None else None for v in vals], type=pa.string()
    ) if nn or vals else pa.array(vals, type=pa.string())


def _parse_gml(data: bytes, geometry: str = "geometry") -> pa.Table:
    root = ET.fromstring(data)
    rows: list[dict] = []
    attr_names: list[str] = []
    for feat in _feature_elements(root):
        row: dict = {}
        geom = None
        for prop in feat:
            n = _local(prop.tag)
            kids = [k for k in prop if _local(k.tag) in _GEOM_TAGS]
            if kids:
                geom = kids[0]
            elif _local(prop.tag) in _GEOM_TAGS:
                geom = prop
            elif len(prop) == 0:
                if n not in row:
                    row[n] = prop.text
                    if n not in attr_names:
                        attr_names.append(n)
        # a Multi* container with ONE member keeps its declared Multi row
        # type (OGR parity — no demotion to the singular); an EMPTY
        # container / coordinate-less geometry reads as null (the GPX/FGB
        # readers' guard — _parts_to_wkb([]) raises)
        parts = _geom_to_parts(geom) if geom is not None else []
        row[geometry] = (
            _parts_to_wkb(parts, force_multi=_local(geom.tag).startswith("Multi"))
            if parts
            else None
        )
        rows.append(row)
    if geometry in attr_names:
        raise ValueError(
            f"GML property {geometry!r} collides with the geometry output "
            "column; pass geometry=<other name> to read_gml"
        )
    cols = {
        n: _typed_column([r.get(n) for r in rows]) for n in attr_names
    }
    cols[geometry] = pa.array(
        [r.get(geometry) for r in rows], type=pa.large_binary()
    )
    return pa.table(cols)


def _cast_declared(t: pa.Table, column_types: dict | None) -> pa.Table:
    """Apply caller-declared attribute types after per-file inference —
    the cross-TASK schema escape hatch: two files landing in DIFFERENT
    read tasks can infer int64 vs float64 for the same column (permissive
    promotion only unifies within one task's batch), leaving the dataset
    with conflicting block schemas. Declaring the type pins every task to
    the same schema. Unknown columns are ignored (sparse attributes)."""
    if not column_types:
        return t
    for c, typ in column_types.items():
        if c in t.column_names:
            i = t.column_names.index(c)
            t = t.set_column(i, c, t.column(c).cast(typ))
    return t


def read_gml(
    path: str,
    geometry: str = "geometry",
    column_types: dict | None = None,
) -> ray.data.Dataset:
    """File-parallel GML read: one parse task per .gml/.xml file.

    ``column_types``: optional {name: pyarrow type} overrides applied
    after per-file inference — pass for heterogeneous directories where
    files disagree on a column's numeric type (see _cast_declared)."""
    if os.path.isdir(path):
        import glob

        paths = sorted(
            glob.glob(os.path.join(path, "*.gml"))
            + glob.glob(os.path.join(path, "*.xml"))
        )
        if not paths:
            raise FileNotFoundError(f"no .gml/.xml files under {path!r}")
    else:
        paths = [path]
    raw = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        tables = [
            _cast_declared(_parse_gml(d.as_py(), geometry), column_types)
            for d in b.column("bytes")
        ]
        # per-file inference can disagree across files in ONE batch (file A
        # all-int "1", file B "2.5"): "default" promotion refuses int64 vs
        # double and kills the read task; "permissive" unifies to double
        return pa.concat_tables(tables, promote_options="permissive")

    return raw.map_batches(parse, batch_format="pyarrow")


def _fmt(x: float) -> str:
    return repr(float(x))


def _pos_list(coords: np.ndarray) -> str:
    return " ".join(_fmt(v) for v in coords.reshape(-1))


def _geom_to_gml(g, i: int) -> str:
    rt = int(g.row_types[i])
    if rt == 0:
        return ""
    p0, p1 = g.row_part_range(i)

    def part_xml(p: int) -> str:
        pt = int(g.part_types[p])
        r0, r1 = g.part_ring_range(p)
        if pt == POINT:
            c = g.ring_coords(r0)[0]
            return f"<gml:Point><gml:pos>{_fmt(c[0])} {_fmt(c[1])}</gml:pos></gml:Point>"
        if pt == LINESTRING:
            return (
                "<gml:LineString><gml:posList>"
                + _pos_list(g.ring_coords(r0))
                + "</gml:posList></gml:LineString>"
            )
        rings = []
        for r in range(r0, r1):
            tag = "exterior" if r == r0 else "interior"
            rings.append(
                f"<gml:{tag}><gml:LinearRing><gml:posList>"
                + _pos_list(g.ring_coords(r))
                + f"</gml:posList></gml:LinearRing></gml:{tag}>"
            )
        return "<gml:Polygon>" + "".join(rings) + "</gml:Polygon>"

    parts = [part_xml(p) for p in range(p0, p1)]
    if rt in (POINT, LINESTRING, POLYGON):
        return parts[0]
    wrap, mem = {
        MULTIPOINT: ("MultiPoint", "pointMember"),
        MULTILINESTRING: ("MultiCurve", "curveMember"),
        MULTIPOLYGON: ("MultiSurface", "surfaceMember"),
    }.get(rt, ("MultiGeometry", "geometryMember"))
    inner = "".join(f"<gml:{mem}>{p}</gml:{mem}>" for p in parts)
    return f"<gml:{wrap}>{inner}</gml:{wrap}>"


def write_gml(
    ds: ray.data.Dataset,
    path: str,
    geometry: str = "geometry",
    feature_name: str = "feature",
    max_rows: int = 5_000_000,
    max_bytes: int = 2 * 2**30,
) -> str:
    """Driver-assembled GML 3.2 FeatureCollection sink (interchange;
    use the parquet sink for scale). Attribute columns emit as simple
    child elements; a read-back recovers values through per-file type
    inference (int64/float64/string)."""
    from xml.sax.saxutils import escape

    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_gml",
        "GML is a driver-assembled XML interchange format; use to_parquet() "
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
    # column names become XML ELEMENT names — an invalid name would write
    # a file no parser (ours included) can read back: fail loudly instead
    bad = [c for c in attrs if not re.match(r"^[A-Za-z_][\w.\-]*$", c)]
    if bad:
        raise ValueError(
            f"write_gml: column names {bad!r} are not valid XML element "
            "names; rename them (letters/digits/_/./- only, non-digit start)"
        )
    cols = {c: t.column(c).to_pylist() for c in attrs}
    is_float = {c: pa.types.is_floating(t.schema.field(c).type) for c in attrs}

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2" '
        'xmlns:gr="http://geopandas-ray/gml">',
    ]
    for i in range(len(g)):
        out.append("  <gml:featureMember>")
        out.append(f'    <gr:{feature_name} gml:id="f{i}">')
        for c in attrs:
            v = cols[c][i]
            if v is None:
                continue
            # repr() on floats keeps read-backs bit-exact (like the GPX sink)
            txt = _fmt(v) if is_float[c] else escape(str(v))
            out.append(f"      <gr:{c}>{txt}</gr:{c}>")
        gx = _geom_to_gml(g, i)
        if gx:
            out.append(f"      <gr:{geometry}>{gx}</gr:{geometry}>")
        out.append(f"    </gr:{feature_name}>")
        out.append("  </gml:featureMember>")
    out.append("</gml:FeatureCollection>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")
    return path
