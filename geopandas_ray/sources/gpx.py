"""Native GPX (GPS Exchange Format 1.1) source/sink — no GDAL.

Format: the public Topografix GPX 1.1 XML schema. Reference surface:
io/file.py:30-34 (the OGR driver map routes ``.gpx`` through GDAL's GPX
driver; this engine parses the XML natively like its shapefile /
GeoPackage / FlatGeobuf sources). OGR exposes a GPX datasource as five
layers — ``waypoints`` (Point), ``routes`` (LineString), ``tracks``
(MultiLineString, one part per <trkseg>), ``route_points`` and
``track_points`` (Point with parent ids) — mirrored here via ``layer=``.

Scale design: the driver only lists paths; each .gpx file is read and
parsed INSIDE a Ray task (``read_binary_files`` → ``map_batches``), so a
directory of thousands of GPX traces parses file-parallel and the driver
never touches feature bytes. Fixed per-layer schemas keep multi-file
blocks union-compatible. Geometry is built vectorized per file
(``points_to_wkb`` / ``single_rings_to_wkb``). The writer is a
driver-assembled interchange sink like .shp/.gpkg (single XML document —
inherently non-parallel), guarded by ``guard_driver_sized``.
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
    POINT,
    from_wkb,
    points_to_wkb,
    single_rings_to_wkb,
)
from ..stages.clip import _parts_to_wkb

LAYERS = ("waypoints", "routes", "tracks", "route_points", "track_points")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _child_text(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c.text
    return None


def _f(v):
    return float(v) if v is not None else None


def _pt_fields(el):
    """(lon, lat, ele, time, name, desc) off a wpt/rtept/trkpt element."""
    ele = t = name = desc = None
    for c in el:
        n = _local(c.tag)
        if n == "ele":
            ele = c.text
        elif n == "time":
            t = c.text
        elif n == "name":
            name = c.text
        elif n == "desc":
            desc = c.text
    return (
        float(el.get("lon")), float(el.get("lat")), _f(ele), t, name, desc,
    )


def _parse_layer(data: bytes, layer: str) -> pa.Table:
    root = ET.fromstring(data)
    name_v: list = []
    desc_v: list = []
    ele_v: list = []
    time_v: list = []
    lon_v: list = []
    lat_v: list = []
    ids: list[list[int]] = []
    geoms: list = []

    if layer == "waypoints":
        for el in root:
            if _local(el.tag) != "wpt":
                continue
            lon, lat, ele, t, nm, dsc = _pt_fields(el)
            lon_v.append(lon); lat_v.append(lat); ele_v.append(ele)
            time_v.append(t); name_v.append(nm); desc_v.append(dsc)
        cols = {
            "name": pa.array(name_v, type=pa.string()),
            "desc": pa.array(desc_v, type=pa.string()),
            "ele": pa.array(ele_v, type=pa.float64()),
            "time": pa.array(time_v, type=pa.string()),
            "geometry": points_to_wkb(
                np.asarray(lon_v, dtype=np.float64),
                np.asarray(lat_v, dtype=np.float64),
            ),
        }
        return pa.table(cols)

    if layer == "routes":
        coords: list[np.ndarray] = []
        for el in root:
            if _local(el.tag) != "rte":
                continue
            name_v.append(_child_text(el, "name"))
            desc_v.append(_child_text(el, "desc"))
            pts = [
                (float(p.get("lon")), float(p.get("lat")))
                for p in el
                if _local(p.tag) == "rtept"
            ]
            coords.append(np.asarray(pts, dtype=np.float64).reshape(-1, 2))
        lens = np.array([len(c) for c in coords], dtype=np.int64)
        flat = (
            np.concatenate(coords) if coords else np.empty((0, 2), dtype=np.float64)
        )
        geom = single_rings_to_wkb(
            np.full(len(coords), LINESTRING, dtype=np.int64), lens, flat
        )
        return pa.table(
            {
                "name": pa.array(name_v, type=pa.string()),
                "desc": pa.array(desc_v, type=pa.string()),
                "geometry": geom,
            }
        )

    if layer == "tracks":
        for el in root:
            if _local(el.tag) != "trk":
                continue
            name_v.append(_child_text(el, "name"))
            desc_v.append(_child_text(el, "desc"))
            parts = []
            for seg in el:
                if _local(seg.tag) != "trkseg":
                    continue
                pts = [
                    (float(p.get("lon")), float(p.get("lat")))
                    for p in seg
                    if _local(p.tag) == "trkpt"
                ]
                parts.append(
                    (LINESTRING, [np.asarray(pts, dtype=np.float64).reshape(-1, 2)])
                )
            # OGR tracks layer contract: MultiLineString, one part per
            # trkseg — a single-segment trk must NOT demote to LineString
            # (write_gpx would transmute it into a <rte> route)
            geoms.append(_parts_to_wkb(parts, force_multi=True) if parts else None)
        return pa.table(
            {
                "name": pa.array(name_v, type=pa.string()),
                "desc": pa.array(desc_v, type=pa.string()),
                "geometry": pa.array(geoms, type=pa.large_binary()),
            }
        )

    if layer == "route_points":
        fid = 0
        for el in root:
            if _local(el.tag) != "rte":
                continue
            pid = 0
            for p in el:
                if _local(p.tag) != "rtept":
                    continue
                lon, lat, ele, t, _, _ = _pt_fields(p)
                ids.append([fid, pid])
                lon_v.append(lon); lat_v.append(lat)
                ele_v.append(ele); time_v.append(t)
                pid += 1
            fid += 1
        a = np.asarray(ids, dtype=np.int64).reshape(-1, 2)
        return pa.table(
            {
                "route_fid": pa.array(a[:, 0]),
                "route_point_id": pa.array(a[:, 1]),
                "ele": pa.array(ele_v, type=pa.float64()),
                "time": pa.array(time_v, type=pa.string()),
                "geometry": points_to_wkb(
                    np.asarray(lon_v, dtype=np.float64),
                    np.asarray(lat_v, dtype=np.float64),
                ),
            }
        )

    if layer == "track_points":
        fid = 0
        for el in root:
            if _local(el.tag) != "trk":
                continue
            sid = 0
            for seg in el:
                if _local(seg.tag) != "trkseg":
                    continue
                pid = 0
                for p in seg:
                    if _local(p.tag) != "trkpt":
                        continue
                    lon, lat, ele, t, _, _ = _pt_fields(p)
                    ids.append([fid, sid, pid])
                    lon_v.append(lon); lat_v.append(lat)
                    ele_v.append(ele); time_v.append(t)
                    pid += 1
                sid += 1
            fid += 1
        a = np.asarray(ids, dtype=np.int64).reshape(-1, 3)
        return pa.table(
            {
                "track_fid": pa.array(a[:, 0]),
                "track_seg_id": pa.array(a[:, 1]),
                "track_seg_point_id": pa.array(a[:, 2]),
                "ele": pa.array(ele_v, type=pa.float64()),
                "time": pa.array(time_v, type=pa.string()),
                "geometry": points_to_wkb(
                    np.asarray(lon_v, dtype=np.float64),
                    np.asarray(lat_v, dtype=np.float64),
                ),
            }
        )

    raise ValueError(f"unknown GPX layer {layer!r}; one of {LAYERS}")


def read_gpx(path: str, layer: str = "waypoints") -> ray.data.Dataset:
    """File-parallel GPX read: one parse task per .gpx file.

    ``path`` is a single file or a directory of ``*.gpx``. Parent ids in the
    ``route_points`` / ``track_points`` layers number per FILE (OGR numbers
    per datasource; a directory here is many datasources).
    """
    if layer not in LAYERS:
        raise ValueError(f"unknown GPX layer {layer!r}; one of {LAYERS}")
    if os.path.isdir(path):
        import glob

        paths = sorted(glob.glob(os.path.join(path, "*.gpx")))
        if not paths:
            raise FileNotFoundError(f"no .gpx files under {path!r}")
    else:
        paths = [path]

    raw = ray.data.read_binary_files(paths)

    def parse(b: pa.Table) -> pa.Table:
        tables = [_parse_layer(data.as_py(), layer) for data in b.column("bytes")]
        return pa.concat_tables(tables, promote_options="none")

    return raw.map_batches(parse, batch_format="pyarrow")


def _fmt(x: float) -> str:
    return repr(float(x))


def write_gpx(
    ds: ray.data.Dataset,
    path: str,
    geometry: str = "geometry",
    max_rows: int = 5_000_000,
    max_bytes: int = 2 * 2**30,
) -> str:
    """Driver-assembled GPX sink (single XML document — inherently
    non-parallel; use the parquet sink for scale). Points → <wpt>,
    LineStrings → <rte>, MultiLineStrings → <trk> (one <trkseg> per part),
    matching the GDAL GPX writer's type routing. ``name``/``desc`` columns
    map to the corresponding GPX child elements when present; ``ele``/
    ``time`` map on waypoints only (GPX 1.1 rteType/trkType have no
    ele/time children). Coordinates emit shortest-roundtrip (``repr``) so
    a read-back is bit-exact.
    """
    from xml.sax.saxutils import escape

    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_gpx",
        "GPX is a driver-assembled XML interchange format; use to_parquet() "
        "(partitioned, parallel) for scale sinks.",
        max_rows, max_bytes,
    )
    t = pull_table(ds, ordered=True)
    if geometry not in t.column_names:
        if t.num_rows:
            raise KeyError(f"no column {geometry!r} in input")
        t = pa.table({geometry: pa.array([], type=pa.large_binary())})
    g = from_wkb(t.column(geometry))

    def col(n):
        return t.column(n).to_pylist() if n in t.column_names else [None] * len(g)

    names, descs, eles, times = col("name"), col("desc"), col("ele"), col("time")

    def meta_children(i, pad, point_level=False):
        # GPX 1.1: <ele>/<time> are wptType children only (wpt/rtept/trkpt);
        # rteType/trkType allow name/desc but NOT ele/time — emitting them
        # there produced schema-invalid files that validating consumers
        # (OGR's GPX driver) reject, and read_gpx's route/track layers
        # ignored the values anyway
        out = []
        if point_level:
            if eles[i] is not None:
                out.append(f"{pad}<ele>{_fmt(eles[i])}</ele>")
            if times[i] is not None:
                out.append(f"{pad}<time>{escape(str(times[i]))}</time>")
        if names[i] is not None:
            out.append(f"{pad}<name>{escape(str(names[i]))}</name>")
        if descs[i] is not None:
            out.append(f"{pad}<desc>{escape(str(descs[i]))}</desc>")
        return out

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gpx version="1.1" creator="geopandas_ray" '
        'xmlns="http://www.topografix.com/GPX/1/1">',
    ]
    for i in range(len(g)):
        rt = int(g.row_types[i])
        if rt == 0:
            continue  # GPX has no null-geometry feature concept
        p0, p1 = g.row_part_range(i)
        if rt == POINT:
            r0, _ = g.part_ring_range(p0)
            x, y = g.ring_coords(r0)[0]
            lines.append(f'  <wpt lat="{_fmt(y)}" lon="{_fmt(x)}">')
            lines.extend(meta_children(i, "    ", point_level=True))
            lines.append("  </wpt>")
        elif rt == LINESTRING:
            lines.append("  <rte>")
            lines.extend(meta_children(i, "    "))
            r0, _ = g.part_ring_range(p0)
            for x, y in g.ring_coords(r0):
                lines.append(f'    <rtept lat="{_fmt(y)}" lon="{_fmt(x)}"/>')
            lines.append("  </rte>")
        elif rt == MULTILINESTRING:
            lines.append("  <trk>")
            lines.extend(meta_children(i, "    "))
            for p in range(p0, p1):
                lines.append("    <trkseg>")
                r0, _ = g.part_ring_range(p)
                for x, y in g.ring_coords(r0):
                    lines.append(
                        f'      <trkpt lat="{_fmt(y)}" lon="{_fmt(x)}"/>'
                    )
                lines.append("    </trkseg>")
            lines.append("  </trk>")
        else:
            raise NotImplementedError(
                "GPX stores points, routes (LineString) and tracks "
                f"(MultiLineString); row {i} has geometry type {rt}"
            )
    lines.append("</gpx>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path
