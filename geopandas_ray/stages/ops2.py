"""Second tranche of unary geometry operators (SURVEY.md §2.2), each one
stateless ``map_batches``. Cites into reference geopandas/base.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import algorithms as A
from ..geom import kernels as K
from ..geom.wkb import (
    LINESTRING,
    POINT,
    POLYGON,
    Geoms,
    from_wkb,
    points_to_wkb,
    to_wkb,
)
from .clip import _parts_to_wkb


def _map_rows_geometry(ds, fn, geometry="geometry", out=None):
    """Helper: per-row geometry -> wkb-or-None transform as map_batches."""
    out = out or geometry

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        vals = [fn(g, i) if g.row_types[i] != 0 else None for i in range(len(g))]
        arr = pa.array(vals, type=pa.large_binary())
        if out in b.column_names:
            return b.set_column(b.column_names.index(out), out, arr)
        return b.append_column(out, arr)

    return ds.map_batches(f, batch_format="pyarrow")


def _row_to_rings(g: Geoms, i: int):
    p0, p1 = g.row_part_range(i)
    for p in range(p0, p1):
        r0, r1 = g.part_ring_range(p)
        yield int(g.part_types[p]), [g.ring_coords(r) for r in range(r0, r1)]


def with_convex_hull(ds, geometry="geometry", out="convex_hull"):
    """base.py:862 — BATCHED: one lexsort dedupes/orders every row's
    points, the chain runs on plain floats, one vectorized WKB encode
    (measured ~13x the per-row path on 100k boxes)."""
    from ..geom.wkb import single_rings_to_wkb

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        kinds, lens, coords = A.convex_hull_batch(g)
        live = kinds > 0
        enc = single_rings_to_wkb(kinds[live], lens[live], coords)
        if live.all():
            arr = enc
        else:
            vals = np.full(len(g), None, dtype=object)
            vals[live] = enc.to_pylist()
            arr = pa.array(vals.tolist(), type=pa.large_binary())
        if out in b.column_names:
            return b.set_column(b.column_names.index(out), out, arr)
        return b.append_column(out, arr)

    return ds.map_batches(f, batch_format="pyarrow")


def with_boundary(ds, geometry="geometry", out="boundary"):
    """base.py:729 - polygon -> rings as (Multi)LineString; line -> end
    MultiPoint; point -> empty.

    Single-ring-polygon rows (the hot shape) skip the per-row walk: their
    boundary is the ring itself as a LineString, encoded for the whole
    batch in one vectorized pass; everything else takes the generic path."""

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == POLYGON:
                for ring in rings:
                    parts.append((LINESTRING, [ring]))
            elif t == LINESTRING:
                c = rings[0]
                if len(c) and not np.array_equal(c[0], c[-1]):
                    parts.append((POINT, [c[:1]]))
                    parts.append((POINT, [c[-1:]]))
        if not parts:
            import struct

            return struct.pack("<BII", 1, 7, 0)  # GEOMETRYCOLLECTION EMPTY
        return _parts_to_wkb(parts)

    from ..geom.wkb import single_rings_to_wkb

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        nparts = np.diff(g.row_offsets)
        first_part = g.row_offsets[:-1].clip(max=max(len(g.part_types) - 1, 0))
        ptype = g.part_types[first_part] if len(g.part_types) else np.zeros(n, dtype=np.int8)
        nrings = np.diff(g.part_offsets)[first_part] if len(g.part_types) else np.zeros(n, dtype=np.int64)
        fast = (nparts == 1) & (ptype == POLYGON) & (nrings == 1)
        vals = np.full(n, None, dtype=object)
        slow = False
        rt = g.row_types
        for i in np.nonzero(~fast)[0]:
            if rt[i] != 0:
                vals[i] = fn(g, i)
                slow = True
        if fast.any():
            p = g.row_offsets[:-1][fast]
            r0 = g.part_offsets[p]
            starts = g.ring_offsets[r0]
            ends = g.ring_offsets[r0 + 1]
            lens = (ends - starts).astype(np.int64)
            total = int(lens.sum())
            cum = np.cumsum(lens) - lens
            sel = np.repeat(starts, lens) + (np.arange(total) - np.repeat(cum, lens))
            enc = single_rings_to_wkb(
                np.full(int(fast.sum()), LINESTRING, dtype=np.uint8), lens, g.coords[sel]
            )
            if fast.all() and not slow:
                arr = enc
            else:
                vals[fast] = enc.to_pylist()
                arr = pa.array(vals.tolist(), type=pa.large_binary())
        else:
            arr = pa.array(vals.tolist(), type=pa.large_binary())
        if out in b.column_names:
            return b.set_column(b.column_names.index(out), out, arr)
        return b.append_column(out, arr)

    return ds.map_batches(f, batch_format="pyarrow")


def simplify(ds, tolerance: float, geometry="geometry"):
    """base.py:4874 (Douglas-Peucker, preserve_topology not needed for our
    per-ring scope).

    Single-part single-ring rows (the overwhelming majority) skip the
    per-row structure walk + per-row encode: DP per ring, then ONE
    vectorized WKB encode for the whole batch; multi-part/holed rows fall
    back to the generic per-row path."""
    from ..geom.wkb import single_rings_to_wkb

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == POINT:
                parts.append((t, rings))
            else:
                parts.append((t, [A.douglas_peucker(r, tolerance) for r in rings]))
        return _parts_to_wkb(parts) if parts else None

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        nparts = np.diff(g.row_offsets)
        first_part = g.row_offsets[:-1].clip(max=max(len(g.part_types) - 1, 0))
        ptype = g.part_types[first_part] if len(g.part_types) else np.zeros(n, dtype=np.int8)
        nrings = np.diff(g.part_offsets)[first_part] if len(g.part_types) else np.zeros(n, dtype=np.int64)
        fast = (nparts == 1) & (
            (ptype == POINT)
            | (ptype == LINESTRING)
            | ((ptype == POLYGON) & (nrings == 1))
        )
        kinds = np.zeros(n, dtype=np.uint8)
        vals = np.full(n, None, dtype=object)
        slow = False
        # global keep mask: DP only SELECTS vertices, so the whole block's
        # output coords are one boolean slice of g.coords - zero per-ring
        # array allocations (the old concat of 100k tiny arrays dominated)
        keep = np.zeros(len(g.coords), dtype=bool)
        X = g.coords[:, 0].tolist()
        Y = g.coords[:, 1].tolist()
        tol2 = float(tolerance) * float(tolerance)
        row_off = g.row_offsets
        part_types = g.part_types
        part_off = g.part_offsets
        ring_off = g.ring_offsets
        starts = np.zeros(n, dtype=np.int64)
        ends = np.zeros(n, dtype=np.int64)
        fast_list = fast.tolist()
        rt = g.row_types
        for i in range(n):
            if not fast_list[i]:
                if rt[i] != 0:
                    vals[i] = fn(g, i)
                    slow = True
                continue
            p = row_off[i]
            t = part_types[p]
            s = ring_off[part_off[p]]
            e = ring_off[part_off[p] + 1]
            starts[i], ends[i] = s, e
            if t == POINT or e - s <= 2:
                keep[s:e] = True
            else:
                A.dp_mark(X, Y, int(s), int(e), tol2, keep)
            kinds[i] = t
        live = kinds > 0
        if live.any():
            coords = g.coords[keep]
            csum = np.zeros(len(keep) + 1, dtype=np.int64)
            np.cumsum(keep, out=csum[1:])
            lens = csum[ends] - csum[starts]
            enc = single_rings_to_wkb(kinds[live], lens[live], coords)
            if live.all() and not slow:
                arr = enc
            else:
                vals[live] = enc.to_pylist()
                arr = pa.array(vals.tolist(), type=pa.large_binary())
        else:
            arr = pa.array(vals.tolist(), type=pa.large_binary())
        return b.set_column(b.column_names.index(geometry), geometry, arr)

    return ds.map_batches(f, batch_format="pyarrow")


def segmentize(ds, max_segment_length: float, geometry="geometry"):
    """base.py:1711"""

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == POINT:
                parts.append((t, rings))
            else:
                parts.append((t, [A.segmentize(r, max_segment_length) for r in rings]))
        return _parts_to_wkb(parts) if parts else None

    return _map_rows_geometry(ds, fn, geometry)


def remove_repeated_points(ds, tolerance: float = 0.0, geometry="geometry"):
    """base.py:1351"""

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == POINT:
                parts.append((t, rings))
            else:
                parts.append((t, [A.remove_repeated(r, tolerance) for r in rings]))
        return _parts_to_wkb(parts) if parts else None

    return _map_rows_geometry(ds, fn, geometry)


def reverse(ds, geometry="geometry"):
    """base.py:1679 - reverse coordinate order of every ring/line."""

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            parts.append((t, [r[::-1] for r in rings]))
        return _parts_to_wkb(parts) if parts else None

    return _map_rows_geometry(ds, fn, geometry)


def with_min_rotated_rect(ds, geometry="geometry", out="min_rotated_rect"):
    """base.py:1156"""

    def fn(g, i):
        px, py = K._row_points(g, i)
        if len(px) == 0:
            return None
        ring = A.min_rotated_rect(np.column_stack([px, py]))
        if len(ring) <= 2:
            return _parts_to_wkb([(POINT, [ring[:1]])] if len(ring) == 1 else [(LINESTRING, [ring])])
        return _parts_to_wkb([(POLYGON, [ring])])

    return _map_rows_geometry(ds, fn, geometry, out)


def with_min_bounding_circle(ds, geometry="geometry"):
    """base.py:1509/:1542 - emits center x/y + radius columns (the circle
    polygon itself is an approximation artifact; radius is the testable
    value, minimum_bounding_radius)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        cx = np.full(n, np.nan)
        cy = np.full(n, np.nan)
        r = np.full(n, np.nan)
        for i in range(n):
            if g.row_types[i] == 0:
                continue
            px, py = K._row_points(g, i)
            if len(px) == 0:
                continue
            cx[i], cy[i], r[i] = A.min_bounding_circle(np.column_stack([px, py]))
        b = b.append_column("mbc_x", pa.array(cx))
        b = b.append_column("mbc_y", pa.array(cy))
        b = b.append_column("minimum_bounding_radius", pa.array(r))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def with_representative_point(ds, geometry="geometry", out="representative_point"):
    """base.py:1476"""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        xs = np.full(n, np.nan)
        ys = np.full(n, np.nan)
        for i in range(n):
            if g.row_types[i] == 0 or g.is_empty[i]:
                continue
            xs[i], ys[i] = A.representative_point(g, i)
        return b.append_column(out, points_to_wkb(xs, ys))

    return ds.map_batches(f, batch_format="pyarrow")


def interpolate(ds, distance: float, normalized: bool = False, geometry="geometry", out="interpolated"):
    """base.py:5240 - point at distance along each line row."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        xs = np.full(n, np.nan)
        ys = np.full(n, np.nan)
        for i in range(n):
            if g.row_types[i] not in (LINESTRING, 5):
                continue
            p0, _ = g.row_part_range(i)
            c = g.ring_coords(g.part_ring_range(p0)[0])
            xs[i], ys[i] = A.interpolate_line(c, distance, normalized)
        return b.append_column(out, points_to_wkb(xs, ys))

    return ds.map_batches(f, batch_format="pyarrow")


def sample_points(ds, size: int, seed: int = 42, geometry="geometry", key_col=None, out="sampled_points"):
    """base.py:5652 / tools/_random.py - per-row deterministic sampling;
    rng keyed by (seed, key_col value or row position) so results are
    stable under re-execution (Ray retry determinism, SURVEY.md §4.2)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        keys = (
            np.asarray(b.column(key_col), dtype=np.int64)
            if key_col
            else np.arange(len(g), dtype=np.int64)
        )
        vals = []
        for i in range(len(g)):
            if g.row_types[i] == 0:
                vals.append(None)
                continue
            pts = A.sample_points_in_geom(g, i, size, seed, int(keys[i]))
            if len(pts) == 0:
                vals.append(None)
            else:
                vals.append(_parts_to_wkb([(POINT, [p.reshape(1, 2)]) for p in pts]))
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def with_is_valid(ds, geometry="geometry", out="is_valid"):
    """base.py:210 - full noding validity: ring closure + >=4 ring points +
    OGC ring simplicity (proper crossings, vertex self-touches, T-touches,
    spikes - algorithms.ring_noding_reason) + cross-ring noding per polygon
    (ring crossings/overlaps, interior disconnection via the touch-graph
    cycle rule) + cross-part ring crossings + hole-outside-shell /
    nested-holes / nested-shells structure (reasons via
    ops3.with_is_valid_reason)."""
    from ..geom.algorithms import (
        multipolygon_noding_reason,
        polygon_noding_reason,
        polygon_structure_reason,
        ring_noding_reason,
    )

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            if g.row_types[i] == 0:
                continue
            valid = True
            parts = list(_row_to_rings(g, i))
            for t, rings in parts:
                if t == POLYGON:
                    for r in rings:
                        if len(r) < 4 or not np.array_equal(r[0], r[-1]):
                            valid = False
                        elif ring_noding_reason(r) is not None:
                            valid = False
                elif t == LINESTRING and len(rings[0]) < 2:
                    valid = False
            if valid:
                polys = [rings for t, rings in parts if t == POLYGON]
                if any(polygon_noding_reason(rings) is not None for rings in polys):
                    valid = False
                elif len(polys) > 1 and multipolygon_noding_reason(polys) is not None:
                    valid = False
                elif polygon_structure_reason(parts) is not None:
                    valid = False
            ok[i] = valid
        return b.append_column(out, pa.array(ok))

    return ds.map_batches(f, batch_format="pyarrow")


def collect(values_wkb: list[bytes]) -> bytes:
    """tools/util.py:10 - combine geometries into one Multi/Collection."""
    g = from_wkb([v for v in values_wkb if v is not None])
    parts = []
    for i in range(len(g)):
        for t, rings in _row_to_rings(g, i):
            parts.append((t, rings))
    return _parts_to_wkb(parts)


def _capsule_ring(p, q, d: float, quad_segs: int) -> np.ndarray:
    """Discretized stadium (Minkowski sum of segment pq with a radius-d
    disk): offset rectangle sides + 2*quad_segs-segment half-circle caps."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    L = float(np.hypot(dx, dy))
    ux, uy = dx / L, dy / L
    nx, ny = -uy, ux  # left normal
    theta0 = np.arctan2(ny, nx)
    # arc around q: from +n to -n going through the +u direction (clockwise
    # in normal space = CCW boundary)
    arc_q = theta0 - np.linspace(0.0, np.pi, 2 * quad_segs + 1)
    arc_p = (theta0 - np.pi) - np.linspace(0.0, np.pi, 2 * quad_segs + 1)
    pts = [
        np.array([[p[0] + d * nx, p[1] + d * ny]]),
        np.column_stack([q[0] + d * np.cos(arc_q), q[1] + d * np.sin(arc_q)]),
        np.column_stack([p[0] + d * np.cos(arc_p), p[1] + d * np.sin(arc_p)]),
    ]
    ring = np.concatenate(pts)
    return np.vstack([ring, ring[:1]])


def _circle_ring(cx, cy, d: float, quad_segs: int) -> np.ndarray:
    ang = np.linspace(0.0, 2 * np.pi, 4 * quad_segs, endpoint=False)
    ring = np.column_stack([cx + d * np.cos(ang), cy + d * np.sin(ang)])
    return np.vstack([ring, ring[:1]])


def _mitre_offset_ring(ring: np.ndarray, d: float, mitre_limit: float = 5.0) -> np.ndarray:
    """Offset a closed ring outward by d with mitre joins: each vertex moves
    to the intersection of its two offset edges. Exact for convex CCW rings
    (base.py:4806 join_style=2); concave results are regularized by the
    even-odd union downstream. A miter point farther than mitre_limit*|d|
    from its vertex is replaced by a bevel (two raw offset points — GEOS
    mitre_limit semantics, base.py:4807)."""
    c = ring[:-1]
    n = len(c)
    prev = np.roll(c, 1, axis=0)
    nxt = np.roll(c, -1, axis=0)
    e1 = c - prev
    e2 = nxt - c
    l1 = np.hypot(e1[:, 0], e1[:, 1])
    l2 = np.hypot(e2[:, 0], e2[:, 1])
    n1 = np.column_stack([e1[:, 1] / l1, -e1[:, 0] / l1])  # outward for CCW
    n2 = np.column_stack([e2[:, 1] / l2, -e2[:, 0] / l2])
    lim = mitre_limit * abs(d)
    # solve for miter point: v + d*n1 + t*e1_dir == v + d*n2 - s*e2_dir
    out: list = []
    for i in range(n):
        # axis-aligned corner fast paths: float-EXACT miter points so rect
        # zones grow to exact integer rects (oracle-critical, same reasoning
        # as kernels.point_to_segments_sqdist's clamped paths)
        if e1[i, 1] == 0.0 and e2[i, 0] == 0.0:
            m = np.array([c[i, 0] + d * n2[i, 0], c[i, 1] + d * n1[i, 1]])
        elif e1[i, 0] == 0.0 and e2[i, 1] == 0.0:
            m = np.array([c[i, 0] + d * n1[i, 0], c[i, 1] + d * n2[i, 1]])
        else:
            a = np.array([[e1[i, 0], -e2[i, 0]], [e1[i, 1], -e2[i, 1]]])
            rhs = d * (n2[i] - n1[i])
            det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
            if abs(det) < 1e-12:  # collinear edges: straight offset
                out.append(c[i] + d * n1[i])
                continue
            t = (rhs[0] * a[1, 1] - rhs[1] * a[0, 1]) / det
            m = c[i] + d * n1[i] + t * e1[i]
        if np.hypot(m[0] - c[i, 0], m[1] - c[i, 1]) > lim:
            out.append(c[i] + d * n1[i])
            out.append(c[i] + d * n2[i])
        else:
            out.append(m)
    arr = np.asarray(out)
    return np.vstack([arr, arr[:1]])


def _seg_rect(p, q, d: float, ext_p: float = 0.0, ext_q: float = 0.0) -> np.ndarray:
    """CCW offset rectangle (width 2d) of segment pq, optionally extended
    ext_p / ext_q beyond the endpoints along the segment direction (the
    square-cap extension)."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    L = float(np.hypot(dx, dy))
    ux, uy = dx / L, dy / L
    nx, ny = -uy, ux  # left normal
    p0 = (p[0] - ext_p * ux, p[1] - ext_p * uy)
    q0 = (q[0] + ext_q * ux, q[1] + ext_q * uy)
    return np.array(
        [
            [p0[0] - d * nx, p0[1] - d * ny],
            [q0[0] - d * nx, q0[1] - d * ny],
            [q0[0] + d * nx, q0[1] + d * ny],
            [p0[0] + d * nx, p0[1] + d * ny],
            [p0[0] - d * nx, p0[1] - d * ny],
        ]
    )


def _square_ring(cx: float, cy: float, d: float) -> np.ndarray:
    """Axis-aligned square of half-side d (GEOS square cap on a point)."""
    return np.array(
        [[cx - d, cy - d], [cx + d, cy - d], [cx + d, cy + d], [cx - d, cy + d], [cx - d, cy - d]]
    )


def _dedupe_polyline(c: np.ndarray) -> np.ndarray:
    keep = np.ones(len(c), dtype=bool)
    if len(c) > 1:
        keep[1:] = (np.diff(c, axis=0) != 0).any(axis=1)
    return c[keep]


def _offset_path(
    c: np.ndarray,
    distance: float,
    quad_segs: int = 8,
    join_style: str = "round",
    mitre_limit: float = 5.0,
) -> np.ndarray | None:
    """Offset path of polyline ``c`` at signed distance (positive = left of
    the travel direction, GEOS convention). Round joins insert vertex arcs;
    mitre joins extend the offset edges to their exact intersection (beveled
    past mitre_limit*|distance| from the vertex); bevel joins connect the raw
    offset endpoints. Shared by offset_curve (base.py:1265) and the
    single-sided buffer (base.py:4806-4807)."""
    c = _dedupe_polyline(np.asarray(c, dtype=np.float64))
    if len(c) < 2:
        return None
    d = float(distance)
    side = 1.0 if d >= 0 else -1.0
    ad = abs(d)
    mitre = join_style in ("mitre", "miter", 2)
    bevel = join_style in ("bevel", 3)
    segs = []  # (start_off, end_off, angle_of_normal, original_end_vertex)
    for k in range(len(c) - 1):
        dx, dy = c[k + 1] - c[k]
        L = np.hypot(dx, dy)
        nx, ny = -dy / L * side, dx / L * side
        segs.append(
            (c[k] + (ad * nx, ad * ny), c[k + 1] + (ad * nx, ad * ny), np.arctan2(ny, nx), c[k + 1])
        )
    pts = [segs[0][0]]
    for k in range(len(segs) - 1):
        a_start, a_end, ang_a, v = segs[k]
        b_start, b_end, ang_b, _ = segs[k + 1]
        if mitre:
            e1 = a_end - a_start
            e2 = b_end - b_start
            det = e1[0] * e2[1] - e1[1] * e2[0]
            # axis-aligned corner fast paths: float-EXACT miter points
            # (oracle-critical, mirrors _mitre_offset_ring)
            if e1[1] == 0.0 and e2[0] == 0.0:
                m = np.array([b_start[0], a_end[1]])
            elif e1[0] == 0.0 and e2[1] == 0.0:
                m = np.array([a_end[0], b_start[1]])
            elif abs(det) < 1e-12:  # straight continuation / reversal: bevel
                pts.append(a_end)
                pts.append(b_start)
                continue
            else:
                w = b_start - a_start
                t = (w[0] * e2[1] - w[1] * e2[0]) / det
                m = a_start + t * e1
            if np.hypot(m[0] - v[0], m[1] - v[1]) > mitre_limit * ad:
                pts.append(a_end)
                pts.append(b_start)
            else:
                pts.append(m)
        elif bevel:
            pts.append(a_end)
            pts.append(b_start)
        else:  # round: arc around the original vertex
            pts.append(a_end)
            sweep = (ang_b - ang_a + np.pi) % (2 * np.pi) - np.pi
            if abs(sweep) > 1e-12:
                steps = max(1, int(np.ceil(abs(sweep) / (np.pi / 2) * quad_segs)))
                for s in range(1, steps):
                    th = ang_a + sweep * s / steps
                    pts.append(v + ad * np.array([np.cos(th), np.sin(th)]))
            pts.append(b_start)
    pts.append(segs[-1][1])
    out_pts = [pts[0]]
    for p in pts[1:]:
        if not np.array_equal(p, out_pts[-1]):
            out_pts.append(p)
    return np.asarray(out_pts)


def _convex_round_offset(ring: np.ndarray, d: float, quad_segs: int) -> np.ndarray | None:
    """Exact round-join offset of a CONVEX simple ring, skipping the
    capsule-union boolean: offset edges connected by vertex arcs (the
    Minkowski sum of a convex polygon with a disk). Returns None when the
    ring is not convex (caller falls back to the general kernel)."""
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n < 3:
        return None
    e = np.roll(pts, -1, axis=0) - pts  # edge i: pts[i] -> pts[i+1]
    L = np.hypot(e[:, 0], e[:, 1])
    keep = L > 0
    if not keep.all():
        pts, e, L = pts[keep], None, None
        n = len(pts)
        if n < 3:
            return None
        e = np.roll(pts, -1, axis=0) - pts
        L = np.hypot(e[:, 0], e[:, 1])
    cross = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
    if (cross >= 0).all():
        pass  # CCW convex
    elif (cross <= 0).all():  # CW convex: reverse to CCW
        pts = pts[::-1]
        e = np.roll(pts, -1, axis=0) - pts
        L = np.hypot(e[:, 0], e[:, 1])
    else:
        return None
    # outward normal of CCW edge (dx,dy) is (dy,-dx)/L
    nx, ny = e[:, 1] / L, -e[:, 0] / L
    ang = np.arctan2(ny, nx)
    step = np.pi / (2 * quad_segs)
    out = []
    for i in range(len(pts)):
        a0 = ang[i - 1]  # normal of the incoming edge
        a1 = ang[i]  # normal of the outgoing edge
        span = (a1 - a0) % (2 * np.pi)
        narc = max(1, int(np.ceil(span / step)))
        arc = a0 + span * np.arange(narc + 1) / narc
        out.append(
            np.column_stack([pts[i, 0] + d * np.cos(arc), pts[i, 1] + d * np.sin(arc)])
        )
    ringo = np.concatenate(out)
    return np.vstack([ringo, ringo[:1]])


def buffer(ds, distance, quad_segs: int = 16, cap_style: str = "round",
           join_style: str = "round", mitre_limit: float = 5.0,
           single_sided: bool = False, geometry="geometry"):
    """base.py:4806-4807 buffer for point / line / polygon rows.

    ``distance``: a scalar, or a COLUMN NAME for per-row distances
    (reference accepts an array aligned to the rows -
    tests/test_geom_methods.py:1349; here per-row data rides the batch as
    a column, the distributed analog of an aligned array).

    ``cap_style`` ('round'|'flat'|'square', or 1|2|3) shapes line ENDS and
    point buffers: flat caps a point to EMPTY and a line to the bare offset
    rectangles (round joins at interior vertices); square extends the end
    rectangles by ``distance`` past the endpoints (a point becomes the
    axis-aligned 2d x 2d square). ``single_sided`` buffers a line on one
    side only — positive distance = left of travel, negative = right, flat
    ends (GEOS semantics); points buffer to empty, polygon rows fall back
    to the two-sided path (their boundary is closed).

    round joins (default): Minkowski union of per-segment capsules (+ the
    polygon itself), merged by the slab-sweep boolean kernel
    (geom/booleans.py) - the same discretization count as shapely
    (4*quad_segs per full circle). mitre: offset-edge intersection joins
    (exact for convex rings, e.g. rect zones grow to exact rects), beveled
    past ``mitre_limit``*distance. Negative distance erodes polygons
    (polygon minus boundary capsules); points/lines buffer to empty."""
    import struct

    from ..geom.booleans import geom_polygons, make_valid_rings, rings_boolean

    empty = struct.pack("<BII", 1, 3, 0)
    cap_map = {"round": "round", 1: "round", "flat": "flat", 2: "flat",
               "square": "square", 3: "square"}
    if cap_style not in cap_map:
        raise ValueError(f"unknown cap_style {cap_style!r}; use 'round'|'flat'|'square'")
    cap = cap_map[cap_style]

    def line_parts(g, i) -> list[np.ndarray]:
        return [
            _dedupe_polyline(rings[0])
            for t, rings in _row_to_rings(g, i)
            if t == LINESTRING
        ]

    def row_buffer(g, i, distance) -> bytes | None:
        if g.row_types[i] == 0:
            return None
        if g.is_empty[i]:
            return empty
        t = int(g.row_types[i])
        polys = []
        if t in (1, 4):  # points
            if distance <= 0 or cap == "flat" or single_sided:
                return empty
            px, py = K._row_points(g, i)
            for k in range(len(px)):
                if cap == "square":
                    polys.append([_square_ring(px[k], py[k], distance)])
                else:
                    polys.append([_circle_ring(px[k], py[k], distance, quad_segs)])
            merged = make_valid_rings(polys) if len(polys) > 1 else polys
            return _parts_to_wkb([(POLYGON, rings) for rings in merged])
        segs = K._segments_of_row(g, i)
        if t in (2, 5):  # lines
            if single_sided:
                if distance == 0:
                    return empty
                for c in line_parts(g, i):
                    path = _offset_path(c, distance, quad_segs, join_style, mitre_limit)
                    if path is None:
                        continue
                    ring = np.vstack([c, path[::-1], c[:1]])
                    polys.append([ring])
                if not polys:
                    return empty
                merged = make_valid_rings(polys)
                return _parts_to_wkb([(POLYGON, rings) for rings in merged]) if merged else empty
            if distance <= 0:
                return empty
            if cap in ("flat", "square"):
                for c in line_parts(g, i):
                    if len(c) < 2:
                        continue
                    closed = bool(np.array_equal(c[0], c[-1]))
                    nseg = len(c) - 1
                    for k in range(nseg):
                        ext_p = distance if (cap == "square" and k == 0 and not closed) else 0.0
                        ext_q = distance if (cap == "square" and k == nseg - 1 and not closed) else 0.0
                        polys.append([_seg_rect(c[k], c[k + 1], distance, ext_p, ext_q)])
                    # round joins at interior vertices (GEOS default
                    # join_style; caps only shape the two ENDS)
                    for k in range(1, nseg):
                        polys.append([_circle_ring(c[k][0], c[k][1], distance, quad_segs)])
                    if closed:
                        polys.append([_circle_ring(c[0][0], c[0][1], distance, quad_segs)])
                if not polys:
                    return empty
                merged = make_valid_rings(polys)
                return _parts_to_wkb([(POLYGON, rings) for rings in merged])
            for x0, y0, x1, y1 in segs:
                if x0 == x1 and y0 == y1:
                    continue
                polys.append([_capsule_ring((x0, y0), (x1, y1), distance, quad_segs)])
            if not polys:
                return empty
            merged = make_valid_rings(polys)
            return _parts_to_wkb([(POLYGON, rings) for rings in merged])
        # polygonal rows (cap_style / single_sided don't apply: the boundary
        # is closed, so there are no ends to cap)
        own = geom_polygons(g, i)
        if distance == 0:
            return _parts_to_wkb([(POLYGON, rings) for rings in own])
        if (
            distance > 0
            and join_style not in ("mitre", "miter", 2)
            and len(own) == 1
            and len(own[0]) == 1
        ):
            fast = _convex_round_offset(own[0][0], float(distance), quad_segs)
            if fast is not None:
                return _parts_to_wkb([(POLYGON, [fast])])
        if join_style in ("mitre", "miter", 2):
            d = float(distance)
            mitred = [
                [_mitre_offset_ring(rings[0], d, mitre_limit)] + [r for r in rings[1:]]
                for rings in own
            ]
            merged = make_valid_rings(mitred)
            return _parts_to_wkb([(POLYGON, rings) for rings in merged]) if merged else empty
        caps = []
        for x0, y0, x1, y1 in segs:
            if x0 == x1 and y0 == y1:
                continue
            caps.append([_capsule_ring((x0, y0), (x1, y1), abs(distance), quad_segs)])
        if distance > 0:
            merged = make_valid_rings(own + caps)
        else:
            merged = rings_boolean(own, caps, "difference")
        return _parts_to_wkb([(POLYGON, rings) for rings in merged]) if merged else empty

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        if isinstance(distance, str):
            dv = np.asarray(b.column(distance).to_numpy(zero_copy_only=False), dtype=np.float64)
        else:
            dv = np.full(len(g), float(distance))
        vals = [row_buffer(g, i, dv[i]) for i in range(len(g))]
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def set_precision(ds, grid_size: float, geometry="geometry"):
    """base.py:1389 - snap every coordinate to the grid (round-half-even,
    matching GEOS's default precision model)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        g.coords = np.round(g.coords / grid_size) * grid_size
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, to_wkb(g))

    return ds.map_batches(f, batch_format="pyarrow")


def normalize(ds, geometry="geometry"):
    """base.py:1608 - canonical form: polygon shells CCW, holes CW, rings
    start at their lexicographically smallest vertex; linestrings oriented
    so the smaller endpoint comes first."""

    def canon_ring(ring: np.ndarray, want_ccw: bool) -> np.ndarray:
        r = ring[:-1]
        x, y = ring[:, 0], ring[:, 1]
        signed = (x[:-1] * y[1:] - x[1:] * y[:-1]).sum()
        if (signed > 0) != want_ccw:
            r = r[::-1]
        # rotate to start at the smallest (x, y) vertex
        k = np.lexsort((r[:, 1], r[:, 0]))[0]
        r = np.roll(r, -k, axis=0)
        return np.vstack([r, r[:1]])

    def fn(g, i):
        parts = []
        for t, rings in _row_to_rings(g, i):
            if t == POLYGON:
                new_rings = [canon_ring(rings[0], want_ccw=True)]
                new_rings += [canon_ring(r, want_ccw=False) for r in rings[1:]]
                parts.append((t, new_rings))
            elif t == LINESTRING:
                c = rings[0]
                if tuple(c[-1]) < tuple(c[0]):
                    c = c[::-1]
                parts.append((t, [c]))
            else:
                parts.append((t, rings))
        return _parts_to_wkb(parts) if parts else None

    return _map_rows_geometry(ds, fn, geometry)


def force_2d(ds, geometry="geometry"):
    """base.py:1791 - the engine is planar (Z dropped at WKB decode), so
    this is a WKB-normalizing identity pass."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, to_wkb(g))

    return ds.map_batches(f, batch_format="pyarrow")


def with_ring_flags(ds, geometry="geometry"):
    """base.py:454 is_simple / :482 is_ring / :517 is_ccw / :558 is_closed /
    :592 has_z - one pass, four boolean columns.

    is_simple is the exact JTS IsSimpleOp: within-part simplicity (proper
    crossings, T-touches, vertex revisits, spikes - algorithms.
    line_is_simple), cross-part line meetings only at shared boundary
    points (multiline_parts_simple), repeated points in multipoints,
    polygon-ring simplicity; has_z is always False (planar engine drops Z
    at decode)."""
    from ..geom.algorithms import line_is_simple, multiline_parts_simple

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        is_closed = np.zeros(n, dtype=bool)
        is_ring = np.zeros(n, dtype=bool)
        is_ccw = np.zeros(n, dtype=bool)
        is_simple = np.ones(n, dtype=bool)
        for i in range(n):
            if g.row_types[i] == 0:
                continue
            p0, p1 = g.row_part_range(i)
            closed_all = p1 > p0
            line_parts: list[np.ndarray] = []
            pt_coords: list[tuple[float, float]] = []
            for p in range(p0, p1):
                t = int(g.part_types[p])
                r0, r1 = g.part_ring_range(p)
                for r in range(r0, r1):
                    c = g.ring_coords(r)
                    closed = len(c) > 1 and np.array_equal(c[0], c[-1])
                    if t == LINESTRING:
                        closed_all &= closed
                        line_parts.append(c)
                        if is_simple[i] and not line_is_simple(c):
                            is_simple[i] = False
                    elif t == POLYGON:
                        if is_simple[i] and not line_is_simple(c):
                            is_simple[i] = False
                    elif t == POINT:
                        closed_all = False
                        if len(c):
                            pt_coords.append((float(c[0, 0]), float(c[0, 1])))
            if is_simple[i] and len(line_parts) > 1:
                is_simple[i] = multiline_parts_simple(line_parts)
            if is_simple[i] and len(pt_coords) > 1:
                is_simple[i] = len(set(pt_coords)) == len(pt_coords)
            if p1 - p0 == 1 and int(g.part_types[p0]) == LINESTRING:
                r0, _ = g.part_ring_range(p0)
                c = g.ring_coords(r0)
                closed = len(c) > 1 and np.array_equal(c[0], c[-1])
                is_closed[i] = closed
                is_ring[i] = closed and is_simple[i] and len(c) >= 4
                # shapely is_ccw is False for non-closed lines (base.py:517)
                if closed and len(c) > 3:
                    x, y = c[:, 0], c[:, 1]
                    is_ccw[i] = (x[:-1] * y[1:] - x[1:] * y[:-1]).sum() > 0
        b = b.append_column("is_closed", pa.array(is_closed))
        b = b.append_column("is_ring", pa.array(is_ring))
        b = b.append_column("is_ccw", pa.array(is_ccw))
        b = b.append_column("is_simple", pa.array(is_simple))
        b = b.append_column("has_z", pa.array(np.zeros(n, dtype=bool)))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def get_geometry(ds, index: int, geometry="geometry", out=None):
    """base.py:672 - the index-th part of each multi-geometry (negative
    indexes from the end; out of range -> missing)."""
    out = out or geometry

    def fn(g, i):
        p0, p1 = g.row_part_range(i)
        k = p1 - p0
        idx = index if index >= 0 else k + index
        if idx < 0 or idx >= k:
            return None
        p = p0 + idx
        t = int(g.part_types[p])
        r0, r1 = g.part_ring_range(p)
        return _parts_to_wkb([(t, [g.ring_coords(r) for r in range(r0, r1)])])

    return _map_rows_geometry(ds, fn, geometry, out)


def with_get_precision(ds, geometry="geometry", out="precision"):
    """base.py:622 - no precision model is attached to decoded WKB, so this
    reports 0.0 (GEOS 'full precision'), matching arrays never passed
    through set_precision."""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(np.zeros(len(b))))

    return ds.map_batches(f, batch_format="pyarrow")


def line_merge(ds, geometry="geometry"):
    """base.py:1887 - stitch MultiLineString parts that share endpoints into
    maximal chains (degree<=2 joins, like GEOS LineMerger)."""

    def fn(g, i):
        lines = []
        others = []
        for t, rings in _row_to_rings(g, i):
            if t == LINESTRING:
                lines.append(rings[0])
            else:
                others.append((t, rings))
        if not lines:
            return _parts_to_wkb(others) if others else None
        # endpoint -> line indices
        from collections import defaultdict

        def key(pt):
            return (float(pt[0]), float(pt[1]))

        ends = defaultdict(list)
        for k, c in enumerate(lines):
            ends[key(c[0])].append(k)
            ends[key(c[-1])].append(k)
        used = [False] * len(lines)
        merged = []
        for k in range(len(lines)):
            if used[k]:
                continue
            used[k] = True
            chain = list(map(tuple, lines[k]))
            # extend forward then backward while the junction has degree 2
            for direction in (1, 0):
                while True:
                    endpoint = chain[-1] if direction else chain[0]
                    cands = [j for j in ends[key(np.asarray(endpoint))] if not used[j]]
                    if len(cands) != 1 or len(ends[key(np.asarray(endpoint))]) != 2:
                        break
                    j = cands[0]
                    seg = list(map(tuple, lines[j]))
                    if direction:
                        chain = chain + (seg[1:] if seg[0] == endpoint else seg[::-1][1:])
                    else:
                        chain = (seg[:-1] if seg[-1] == endpoint else seg[::-1][:-1]) + chain
                    used[j] = True
            merged.append(np.asarray(chain, dtype=np.float64))
        parts = [(LINESTRING, [m]) for m in merged] + others
        return _parts_to_wkb(parts)

    return _map_rows_geometry(ds, fn, geometry)


def delaunay_triangles(ds, geometry="geometry", out="delaunay"):
    """base.py:908 - Delaunay triangulation of each row's vertices as a
    MultiPolygon of triangles (Bowyer-Watson, geom/algorithms.py)."""

    def fn(g, i):
        px, py = K._row_points(g, i)
        if len(px) < 3:
            return None
        pts = np.unique(np.column_stack([px, py]), axis=0)
        tris = A.delaunay(pts)
        if not tris:
            return None
        parts = []
        for a, b, c in tris:
            ring = np.vstack([pts[a], pts[b], pts[c], pts[a]])
            parts.append((POLYGON, [ring]))
        return _parts_to_wkb(parts)

    return _map_rows_geometry(ds, fn, geometry, out)


def voronoi_polygons(ds, extend_to=None, geometry="geometry", out="voronoi"):
    """base.py:999 - Voronoi cells of each row's vertices as a MultiPolygon,
    clipped to ``extend_to`` bounds (default: the row's bbox inflated 50%,
    mirroring GEOS's default envelope expansion)."""

    def fn(g, i):
        px, py = K._row_points(g, i)
        if len(px) < 2:
            return None
        pts = np.unique(np.column_stack([px, py]), axis=0)
        if extend_to is not None:
            env = extend_to
        else:
            w = max(px.max() - px.min(), 1.0)
            h = max(py.max() - py.min(), 1.0)
            env = (px.min() - 0.5 * w, py.min() - 0.5 * h, px.max() + 0.5 * w, py.max() + 0.5 * h)
        cells = A.voronoi_cells(pts, env)
        parts = [(POLYGON, [c]) for c in cells if len(c)]
        return _parts_to_wkb(parts) if parts else None

    return _map_rows_geometry(ds, fn, geometry, out)
