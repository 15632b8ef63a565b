"""Round-2 unary gap-fill operators (SURVEY.md §2.2, VERDICT r1 item 7).

Each stage is a stateless ``map_batches`` transform over WKB geometry
columns, CSR slices over the decoded ``Geoms`` batch - no Python-per-row
work beyond the (small-side) polygon loops the rest of the engine already
uses. Reference citations are to geopandas 1.0.1 files/lines.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.wkb import (
    Geoms,
    LINESTRING,
    MULTIPOINT,
    POINT,
    POLYGON,
    from_wkb,
    to_wkb,
)
from .clip import _parts_to_wkb
from .ops2 import _map_rows_geometry, _row_to_rings

_EMPTY_GC = struct.pack("<BII", 1, 7, 0)


def with_exterior(ds, geometry="geometry", out="exterior"):
    """Shell ring of a Polygon as a LineString (base.py:1197); None for
    non-polygonal rows, first part's shell for MultiPolygons (per-part
    exteriors come via explode first, like the reference's .explode().exterior
    idiom in tests/test_geom_methods.py)."""

    def fn(g, i):
        for t, rings in _row_to_rings(g, i):
            if t == POLYGON and rings:
                return _parts_to_wkb([(LINESTRING, [rings[0]])])
        return None

    return _map_rows_geometry(ds, fn, geometry, out)


def with_interiors(ds, geometry="geometry", out="interiors"):
    """Hole rings of a polygonal row as a MultiLineString (base.py:1311
    returns a list of LinearRings; we carry them as one geometry column)."""

    def fn(g, i):
        holes = []
        for t, rings in _row_to_rings(g, i):
            if t == POLYGON:
                holes.extend(rings[1:])
        if not holes:
            return struct.pack("<BII", 1, 5, 0)  # MULTILINESTRING EMPTY
        return _parts_to_wkb([(LINESTRING, [h]) for h in holes])

    return _map_rows_geometry(ds, fn, geometry, out)


def with_count_interior_rings(ds, geometry="geometry", out="count_interior_rings"):
    """Number of holes over all polygon parts of the row (base.py:408).
    Vectorized: rings-per-part minus one, summed over polygon parts."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n_parts = len(g.part_offsets) - 1
        rings_per_part = g.part_offsets[1:] - g.part_offsets[:-1]
        holes_per_part = np.where(
            g.part_types[:n_parts] == POLYGON, np.maximum(rings_per_part - 1, 0), 0
        )
        # sum per row over its part range (K._ring_reduceat: reduceat with
        # empty segments filtered — clamping corrupts the preceding row)
        from ..geom.kernels import _ring_reduceat

        out_v = _ring_reduceat(
            holes_per_part.astype(np.float64),
            np.asarray(g.row_offsets, dtype=np.int64),
            len(g),
        ).astype(np.int64)
        return b.append_column(out, pa.array(out_v))

    return ds.map_batches(f, batch_format="pyarrow")


def extract_unique_points(ds, geometry="geometry", out="unique_points"):
    """Distinct vertices in order of first occurrence, as a MultiPoint
    (base.py:1234)."""

    def fn(g, i):
        px, py = K._row_points(g, i)
        if len(px) == 0:
            return struct.pack("<BII", 1, 4, 0)  # MULTIPOINT EMPTY
        pts = np.column_stack([px, py])
        _, first = np.unique(pts, axis=0, return_index=True)
        keep = pts[np.sort(first)]
        return _parts_to_wkb([(POINT, [keep[k : k + 1]]) for k in range(len(keep))])

    return _map_rows_geometry(ds, fn, geometry, out)


def with_is_valid_reason(ds, geometry="geometry", out="is_valid_reason"):
    """GEOS-style reason strings for the invalidity classes with_is_valid
    detects (base.py:249): 'Valid Geometry', 'Too few points in geometry
    component', 'Ring Self-intersection' (full ring simplicity incl. vertex
    self-touches and spikes), 'Self-intersection' (ring-pair crossing or
    collinear overlap), 'Interior is disconnected' (touch-graph cycle),
    'Hole lies outside shell', 'Holes are nested', 'Nested shells'."""
    from ..geom.algorithms import (
        multipolygon_noding_reason,
        polygon_noding_reason,
        polygon_structure_reason,
        ring_noding_reason,
    )

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        reasons: list[str | None] = []
        for i in range(len(g)):
            if g.row_types[i] == 0:
                reasons.append(None)
                continue
            reason = "Valid Geometry"
            parts = list(_row_to_rings(g, i))
            for t, rings in parts:
                if t == POLYGON:
                    for ring in rings:
                        if len(ring) < 4:
                            reason = "Too few points in geometry component"
                            break
                        r = ring_noding_reason(ring)
                        if r is not None:
                            reason = (
                                "Ring Self-intersection"
                                if r.startswith("Ring")
                                else r
                            )
                            break
                elif t == LINESTRING and len(rings[0]) < 2:
                    reason = "Too few points in geometry component"
                if reason != "Valid Geometry":
                    break
            if reason == "Valid Geometry":
                polys = [rings for t, rings in parts if t == POLYGON]
                for rings in polys:
                    r = polygon_noding_reason(rings)
                    if r is not None:
                        reason = r
                        break
                if reason == "Valid Geometry" and len(polys) > 1:
                    reason = multipolygon_noding_reason(polys) or reason
            if reason == "Valid Geometry":
                reason = polygon_structure_reason(parts) or reason
            reasons.append(reason)
        return b.append_column(out, pa.array(reasons, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def with_minimum_clearance(ds, geometry="geometry", out="minimum_clearance"):
    """Minimum clearance (base.py:1575): the smallest distance by which a
    vertex could move to produce an invalid geometry = min over vertices of
    the distance to any non-adjacent segment or other vertex. Brute force
    per row (polygon sides are the small side of every pipeline)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        vals = np.full(len(g), np.inf)
        for i in range(len(g)):
            if g.row_types[i] == 0 or g.is_empty[i]:
                vals[i] = np.nan
                continue
            segs = K._segments_of_row(g, i)
            px, py = K._row_points(g, i)
            if len(segs) == 0:
                vals[i] = np.inf  # points have no clearance constraint
                continue
            best = np.inf
            for k in range(len(px)):
                # exclude segments adjacent to this vertex
                adj = (
                    ((segs[:, 0] == px[k]) & (segs[:, 1] == py[k]))
                    | ((segs[:, 2] == px[k]) & (segs[:, 3] == py[k]))
                )
                rest = segs[~adj]
                if len(rest):
                    d2 = K.point_to_segments_sqdist(
                        np.array([px[k]]), np.array([py[k]]), rest
                    )
                    best = min(best, float(np.sqrt(d2[0])))
            vals[i] = best
        return b.append_column(out, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Z coordinate support (z / force_3d / force_2d round trip)
# ---------------------------------------------------------------------------


def _wkb_point_z(buf: bytes):
    """Z of a WKB Point if it has one (geoseries.py:227 .z), else NaN."""
    if buf is None or len(buf) < 21:
        return np.nan
    little = buf[0] == 1
    (code,) = struct.unpack("<I" if little else ">I", buf[1:5])
    has_z = bool(code & 0x80000000) or (1000 <= (code & 0xFFFF) < 2000)
    base = code & 0x80000000 ^ code if code & 0x80000000 else code % 1000
    if base != POINT or not has_z or len(buf) < 29:
        return np.nan
    (z,) = struct.unpack("<d" if little else ">d", buf[21:29])
    return z


def with_z(ds, geometry="geometry", out="z"):
    """Z coordinate of Point rows (geoseries.py:227); NaN when absent."""

    def f(b: pa.Table) -> pa.Table:
        vals = [_wkb_point_z(v) for v in b.column(geometry).to_pylist()]
        return b.append_column(out, pa.array(vals, type=pa.float64()))

    return ds.map_batches(f, batch_format="pyarrow")


def force_3d(ds, z: float = 0.0, geometry="geometry"):
    """Rewrite geometry WKB with a constant Z (base.py:1824). The CSR batch
    is 2-D internally, so this re-encodes rows with the Z flag set and the
    given z for every coordinate."""

    def _encode_z(g: Geoms, i: int) -> bytes | None:
        if g.row_types[i] == 0:
            return None
        t = int(g.row_types[i])
        p0, p1 = g.row_part_range(i)
        parts = []
        for p in range(p0, p1):
            pt = int(g.part_types[p])
            r0, r1 = g.part_ring_range(p)
            if pt == POINT:
                c = g.ring_coords(r0)
                body = struct.pack("<BI", 1, 0x80000001) + struct.pack(
                    "<3d", c[0, 0], c[0, 1], z
                )
            elif pt == LINESTRING:
                c = g.ring_coords(r0)
                body = struct.pack("<BII", 1, 0x80000002, len(c))
                for x, y in c:
                    body += struct.pack("<3d", x, y, z)
            else:
                body = struct.pack("<BII", 1, 0x80000003, r1 - r0)
                for r in range(r0, r1):
                    c = g.ring_coords(r)
                    body += struct.pack("<I", len(c))
                    for x, y in c:
                        body += struct.pack("<3d", x, y, z)
            parts.append(body)
        if t in (POINT, LINESTRING, POLYGON) and len(parts) == 1:
            return parts[0]
        multi = {POINT: 4, LINESTRING: 5, POLYGON: 6}.get(
            int(g.part_types[p0]) if p1 > p0 else POINT, 7
        )
        if t == 7:
            multi = 7
        return struct.pack("<BII", 1, 0x80000000 | multi, len(parts)) + b"".join(parts)

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        vals = [_encode_z(g, i) for i in range(len(g))]
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# missing-geometry handling (geoseries.py:566-656)
# ---------------------------------------------------------------------------


def geom_isna(ds, geometry="geometry", out="isna"):
    """True for missing geometry (None); empties are NOT missing
    (geoseries.py:566 isna; empty-vs-missing split per testing.py:18-46)."""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.compute.is_null(b.column(geometry)))

    return ds.map_batches(f, batch_format="pyarrow")


def geom_notna(ds, geometry="geometry", out="notna"):
    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.compute.is_valid(b.column(geometry)))

    return ds.map_batches(f, batch_format="pyarrow")


def geom_fillna(ds, value: bytes | None = None, geometry="geometry"):
    """Replace missing geometry with ``value`` WKB (geoseries.py:600 fillna;
    default = empty GeometryCollection, the reference's None -> empty rule)."""
    fill = value if value is not None else _EMPTY_GC

    def f(b: pa.Table) -> pa.Table:
        col = b.column(geometry)
        filled = pa.compute.fill_null(col, pa.scalar(fill, type=col.type))
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, filled)

    return ds.map_batches(f, batch_format="pyarrow")


def geom_dropna(ds, geometry="geometry"):
    """Drop rows with missing geometry (geoseries.py:656)."""

    def f(b: pa.Table) -> pa.Table:
        return b.filter(pa.compute.is_valid(b.column(geometry)))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# coordinate UDF (base.py:1751 transform)
# ---------------------------------------------------------------------------


def transform_coords(ds, fn, geometry="geometry"):
    """Apply ``fn((C,2) ndarray) -> (C,2) ndarray`` to every coordinate of
    every geometry, vectorized over the whole batch's coordinate buffer
    (the reference's .transform with a vectorized callable)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        if len(g.coords):
            new_coords = np.asarray(fn(g.coords), dtype=np.float64).reshape(-1, 2)
            if new_coords.shape != g.coords.shape:
                raise ValueError("transform fn must preserve coordinate count")
            g = Geoms(
                new_coords, g.ring_offsets, g.part_offsets, g.row_offsets,
                g.part_types, g.row_types,
            )
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, to_wkb(g))

    return ds.map_batches(f, batch_format="pyarrow")


def make_valid(ds, geometry="geometry"):
    """base.py:1641 make_valid: regularize self-intersecting polygons via
    the even-odd slab sweep (GEOS 'structure' semantics for the bowtie /
    self-crossing class; geom/booleans.py). Non-polygonal rows pass
    through unchanged."""
    from ..geom.booleans import geom_polygons, make_valid_rings

    def fn(g, i):
        t = int(g.row_types[i])
        if t not in (POLYGON, 6, 7):
            return None if g.row_types[i] == 0 else _row_wkb(g, i)
        polys = geom_polygons(g, i)
        if not polys:
            return _row_wkb(g, i)
        fixed = make_valid_rings(polys)
        if not fixed:
            return struct.pack("<BII", 1, 7, 0)
        return _parts_to_wkb([(POLYGON, rings) for rings in fixed])

    return _map_rows_geometry(ds, fn, geometry)


def _row_wkb(g: Geoms, i: int) -> bytes:
    return to_wkb(g.take([i]))[0].as_py()


def with_concave_hull(ds, ratio: float = 0.5, allow_holes: bool = False, geometry="geometry", out="concave_hull"):
    """base.py:799 concave_hull: Delaunay triangulation, then peel border
    triangles whose longest boundary edge exceeds the ratio-interpolated
    length threshold (the chi-shape / GEOS ConcaveHullOfPoints recipe);
    surviving triangles union via the even-odd kernel so the result comes
    back as canonical rings. ratio=1 -> convex hull; smaller -> tighter."""
    from ..geom import algorithms as A
    from ..geom.booleans import make_valid_rings

    def fn(g, i):
        px, py = K._row_points(g, i)
        pts = np.unique(np.column_stack([px, py]), axis=0)
        if len(pts) < 3:
            if len(pts) == 0:
                return None
            if len(pts) == 1:
                return _parts_to_wkb([(POINT, [pts])])
            return _parts_to_wkb([(LINESTRING, [pts])])
        tris = A.delaunay(pts)
        if not tris:
            return _parts_to_wkb([(LINESTRING, [pts])])
        edge_len = {}

        def elen(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_len:
                edge_len[key] = float(np.hypot(*(pts[a] - pts[b])))
            return edge_len[key]

        all_lens = [elen(a, b) for t in tris for a, b in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2]))]
        lo, hi = min(all_lens), max(all_lens)
        threshold = lo + max(0.0, min(1.0, ratio)) * (hi - lo)
        alive = set(range(len(tris)))
        # edge -> triangles sharing it
        edge_tris: dict[tuple, list[int]] = {}
        for ti, t in enumerate(tris):
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2])):
                edge_tris.setdefault((min(a, b), max(a, b)), []).append(ti)
        changed = True
        while changed:
            changed = False
            for ti in sorted(alive):
                t = tris[ti]
                border = [
                    (a, b)
                    for a, b in ((t[0], t[1]), (t[1], t[2]), (t[0], t[2]))
                    if sum(1 for x in edge_tris[(min(a, b), max(a, b))] if x in alive) == 1
                ]
                # peel only ear triangles (exactly one interior neighbor)
                if len(border) == 2 and len(alive) > 1:
                    if max(elen(a, b) for a, b in border) > threshold:
                        alive.discard(ti)
                        changed = True
                elif len(border) == 1 and len(alive) > 1:
                    if elen(*border[0]) > threshold:
                        alive.discard(ti)
                        changed = True
        polys = []
        for ti in alive:
            a, b, c = tris[ti]
            ring = np.array([pts[a], pts[b], pts[c], pts[a]])
            polys.append([ring])
        merged = make_valid_rings(polys)
        if not allow_holes:
            merged = [[rings[0]] for rings in merged]
        if not merged:
            return None
        return _parts_to_wkb([(POLYGON, rings) for rings in merged])

    return _map_rows_geometry(ds, fn, geometry, out)


def _closed_rings_of_lines(g: Geoms, i: int) -> list[np.ndarray]:
    """Merge a row's line parts into closed rings (line_merge order); open
    chains are dropped (documented polygonize scope: pre-closed linework)."""
    chains = []
    p0, p1 = g.row_part_range(i)
    for p in range(p0, p1):
        if g.part_types[p] == LINESTRING:
            r0, _ = g.part_ring_range(p)
            c = g.ring_coords(r0)
            if len(c) >= 2:
                chains.append(c)
    # greedy endpoint stitching
    rings = []
    pending = [c for c in chains]
    while pending:
        cur = pending.pop()
        changed = True
        while changed and not np.array_equal(cur[0], cur[-1]):
            changed = False
            for k, other in enumerate(pending):
                if np.array_equal(other[0], cur[-1]):
                    cur = np.vstack([cur, other[1:]])
                elif np.array_equal(other[-1], cur[-1]):
                    cur = np.vstack([cur, other[::-1][1:]])
                elif np.array_equal(other[-1], cur[0]):
                    cur = np.vstack([other, cur[1:]])
                elif np.array_equal(other[0], cur[0]):
                    cur = np.vstack([other[::-1], cur[1:]])
                else:
                    continue
                pending.pop(k)
                changed = True
                break
        if len(cur) >= 4 and np.array_equal(cur[0], cur[-1]):
            rings.append(cur)
    return rings


def polygonize(ds, geometry="geometry", out="polygonized"):
    """base.py:5763 - polygons from closed-ring linework. Scope: lines that
    stitch into closed rings (no mid-edge noding - run the boolean kernel's
    crossing split upstream if needed); each even-odd face becomes a
    polygon, nested rings become holes."""
    from ..geom.booleans import make_valid_rings

    def fn(g, i):
        rings = _closed_rings_of_lines(g, i)
        if not rings:
            return None
        polys = make_valid_rings([rings])  # single parity group: global even-odd
        if not polys:
            return None
        return _parts_to_wkb([(POLYGON, rr) for rr in polys])

    return _map_rows_geometry(ds, fn, geometry, out)


def build_area(ds, geometry="geometry", out="built_area"):
    """base.py:5712 - same face-forming semantics as polygonize but the
    input is a collection of rings/polygon boundaries (GEOS BuildArea:
    even-odd nesting, inner rings become holes)."""
    from ..geom.booleans import make_valid_rings

    def fn(g, i):
        rings = _closed_rings_of_lines(g, i)
        # polygon parts contribute their rings directly
        for t, rr in _row_to_rings(g, i):
            if t == POLYGON:
                rings.extend(rr)
        if not rings:
            return None
        polys = make_valid_rings([rings])
        if not polys:
            return None
        return _parts_to_wkb([(POLYGON, rr) for rr in polys])

    return _map_rows_geometry(ds, fn, geometry, out)


def offset_curve(ds, distance: float, quad_segs: int = 8,
                 join_style: str = "round", mitre_limit: float = 5.0,
                 geometry="geometry"):
    """base.py:1265 - parallel line offset to the left (positive) / right
    (negative) of each LineString. join_style 'round' (default) inserts
    vertex arcs at convex turns and natural intersections at concave turns;
    'mitre' extends the offset edges to their exact intersection (beveled
    past mitre_limit*|distance| from the vertex — exact arithmetic on
    integer polylines); 'bevel' connects the raw offset endpoints. GEOS also
    trims self-intersections of the offset; that trimming is out of scope.
    The path kernel is shared with the single-sided buffer
    (ops2._offset_path)."""
    from .ops2 import _offset_path

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == LINESTRING:
                path = _offset_path(rings[0], float(distance), quad_segs,
                                    join_style, mitre_limit)
                parts.append((LINESTRING, [rings[0] if path is None else path]))
        if not parts:
            return None
        return _parts_to_wkb(parts)

    return _map_rows_geometry(ds, fn, geometry)


# ---------------------------------------------------------------------------
# pandas-layer aliases + column management (completeness audit round 2)
# ---------------------------------------------------------------------------


def geom_isnull(ds, geometry="geometry", out="isnull"):
    """geoseries.py isnull = alias of isna."""
    return geom_isna(ds, geometry, out)


def geom_notnull(ds, geometry="geometry", out="notnull"):
    """geoseries.py notnull = alias of notna."""
    return geom_notna(ds, geometry, out)


def rename_geometry(ds, new_name: str, geometry="geometry"):
    """geodataframe.py rename_geometry: rename the active geometry column
    (pure Arrow metadata move, zero-copy per batch)."""

    def f(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            [new_name if c == geometry else c for c in b.column_names]
        )

    return ds.map_batches(f, batch_format="pyarrow")


def set_geometry(ds, column: str, out: str = "geometry", drop_old: bool = False):
    """geodataframe.py set_geometry: make ``column`` the active geometry
    column (copied to ``out`` so downstream stages' default applies)."""

    def f(b: pa.Table) -> pa.Table:
        col = b.column(column)
        if out in b.column_names:
            b = b.set_column(b.column_names.index(out), out, col)
        else:
            b = b.append_column(out, col)
        if drop_old and column != out:
            b = b.drop_columns([column])
        return b

    return ds.map_batches(f, batch_format="pyarrow")
