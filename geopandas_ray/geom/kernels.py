"""Vectorized geometry kernels over the CSR ``Geoms`` batch.

Each function mirrors a GeoPandas operator (cites into the reference's
geopandas/base.py by line) but is implemented as NumPy array math so it can
run inside ``ray.data.Dataset.map_batches`` with zero Python-per-row work on
the hot paths (points). Polygon paths loop over rings/parts, which is fine:
polygons are the small side of every join in the target workload.
"""

from __future__ import annotations

import numpy as np

from .wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geoms,
    TYPE_NAMES,
)

# ---------------------------------------------------------------------------
# per-ring helpers (vectorized with reduceat over the CSR offsets)
# ---------------------------------------------------------------------------


def _ring_reduceat(values: np.ndarray, offsets: np.ndarray, n_items: int) -> np.ndarray:
    """Sum ``values`` per CSR segment; empty segments give 0.

    reduceat cannot take start == len(values) (trailing empty segments), and
    CLAMPING the start corrupts the preceding segment by splitting it (a
    multi-part row followed by a trailing null row lost its tail parts in
    area/length — r4 fix). CSR segments tile ``values``, so the nonempty
    starts alone are exactly the reduceat boundaries."""
    out = np.zeros(n_items, dtype=np.float64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if values.size and nonempty.any():
        out[nonempty] = np.add.reduceat(values, starts[nonempty])
    return out


def _segment_sums_per_row(g: Geoms, ring_values: np.ndarray) -> np.ndarray:
    """Aggregate one value per ring up to one value per row."""
    n_rings = len(g.ring_offsets) - 1
    n_parts = len(g.part_offsets) - 1
    per_part = _ring_reduceat(ring_values, g.part_offsets.astype(np.int64), n_parts)
    return _ring_reduceat(per_part, g.row_offsets.astype(np.int64), len(g))


def _ring_signed_areas(g: Geoms) -> np.ndarray:
    """Shoelace signed area of every ring (vectorized over all coords)."""
    c = g.coords
    n_rings = len(g.ring_offsets) - 1
    if len(c) == 0:
        return np.zeros(n_rings)
    x, y = c[:, 0], c[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    cross = np.append(cross, 0.0)
    # zero out the contribution that crosses ring boundaries
    ends = g.ring_offsets[1:] - 1
    cross[ends[ends >= 0]] = 0.0
    out = _ring_reduceat(cross, np.asarray(g.ring_offsets, dtype=np.int64), n_rings)
    return out * 0.5


def area(g: Geoms) -> np.ndarray:
    """Planar area per row (reference base.py:40). Holes subtract.

    Ring role (shell vs hole) is by position: first ring of a polygon part is
    the shell. Signs are normalized with abs() so winding doesn't matter,
    matching GEOS behavior for valid polygons.
    """
    ring_area = np.abs(_ring_signed_areas(g))
    n_parts = len(g.part_offsets) - 1
    # holes: every ring after the first within a polygon part
    sign = np.ones(len(ring_area))
    for p in range(n_parts):
        r0, r1 = g.part_ring_range(p)
        if g.part_types[p] == POLYGON:
            sign[r0 + 1 : r1] = -1.0
        else:
            sign[r0:r1] = 0.0
    out = _segment_sums_per_row(g, ring_area * sign)
    out[g.is_missing] = np.nan
    return out


def length(g: Geoms) -> np.ndarray:
    """Perimeter/length per row (reference base.py:154)."""
    c = g.coords
    n_rings = len(g.ring_offsets) - 1
    if len(c) == 0:
        seg = np.zeros(0)
    else:
        d = np.diff(c, axis=0)
        seg = np.hypot(d[:, 0], d[:, 1])
        seg = np.append(seg, 0.0)
        ends = g.ring_offsets[1:] - 1
        seg[ends[ends >= 0]] = 0.0
    ring_len = _ring_reduceat(seg, np.asarray(g.ring_offsets, dtype=np.int64), n_rings)
    # points contribute 0; line+polygon rings contribute their length
    keep = np.ones(n_rings)
    for p in range(len(g.part_offsets) - 1):
        if g.part_types[p] == POINT:
            r0, r1 = g.part_ring_range(p)
            keep[r0:r1] = 0.0
    out = _segment_sums_per_row(g, ring_len * keep)
    out[g.is_missing] = np.nan
    return out


def bounds(g: Geoms) -> np.ndarray:
    """(N,4) [minx,miny,maxx,maxy]; NaN rows for missing/empty (base.py:4673)."""
    n = len(g)
    out = np.full((n, 4), np.nan)
    c = g.coords
    if len(c) == 0:
        return out
    # per-ring min/max then per-row via reduceat chains; easiest correct path:
    # compute per-row coordinate ranges from row -> part -> ring -> coord offsets.
    row_coord_start = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
    row_coord_end = g.ring_offsets[g.part_offsets[g.row_offsets[1:]]]
    nonempty = row_coord_end > row_coord_start
    idx = np.nonzero(nonempty)[0]
    if len(idx) == 0:
        return out
    starts = row_coord_start[idx]
    x, y = c[:, 0], c[:, 1]
    out[idx, 0] = np.minimum.reduceat(x, starts)
    out[idx, 1] = np.minimum.reduceat(y, starts)
    out[idx, 2] = np.maximum.reduceat(x, starts)
    out[idx, 3] = np.maximum.reduceat(y, starts)
    # reduceat reduces to the NEXT start, not the row end; rows are contiguous
    # in coords so segments between consecutive nonempty rows are exact, but
    # the gap after the last row must not leak - coords end at last row end,
    # so it is exact as well. (Rows' coord ranges are contiguous by layout.)
    return out


def total_bounds(g: Geoms) -> np.ndarray:
    b = bounds(g)
    with np.errstate(invalid="ignore"):
        return np.array(
            [
                np.nanmin(b[:, 0]) if len(b) else np.nan,
                np.nanmin(b[:, 1]) if len(b) else np.nan,
                np.nanmax(b[:, 2]) if len(b) else np.nan,
                np.nanmax(b[:, 3]) if len(b) else np.nan,
            ]
        )


def centroid(g: Geoms) -> tuple[np.ndarray, np.ndarray]:
    """Per-row centroid (reference base.py:764).

    Highest-dimension rule like GEOS: polygons use area-weighted centroid,
    lines length-weighted, points the mean.
    """
    n = len(g)
    cx = np.full(n, np.nan)
    cy = np.full(n, np.nan)
    for i in range(n):
        if g.row_types[i] == MISSING:
            continue
        p0, p1 = g.row_part_range(i)
        if p1 == p0:
            continue
        types = g.part_types[p0:p1]
        best_dim = 0
        if (types == POLYGON).any():
            best_dim = 2
        elif (types == LINESTRING).any():
            best_dim = 1
        num_x = num_y = den = 0.0
        for p in range(p0, p1):
            t = g.part_types[p]
            r0, r1 = g.part_ring_range(p)
            if best_dim == 2 and t == POLYGON:
                for r in range(r0, r1):
                    c = g.ring_coords(r)
                    x, y = c[:, 0], c[:, 1]
                    cr = x[:-1] * y[1:] - x[1:] * y[:-1]
                    sa = cr.sum() * 0.5  # ring signed area
                    if sa == 0:
                        continue
                    gx = ((x[:-1] + x[1:]) * cr).sum() / (6 * sa)
                    gy = ((y[:-1] + y[1:]) * cr).sum() / (6 * sa)
                    w = abs(sa) if r == r0 else -abs(sa)
                    num_x += gx * w
                    num_y += gy * w
                    den += w
            elif best_dim == 1 and t == LINESTRING:
                c = g.ring_coords(r0)
                d = np.diff(c, axis=0)
                seg = np.hypot(d[:, 0], d[:, 1])
                mid = (c[:-1] + c[1:]) * 0.5
                num_x += (mid[:, 0] * seg).sum()
                num_y += (mid[:, 1] * seg).sum()
                den += seg.sum()
            elif best_dim == 0 and t == POINT:
                c = g.ring_coords(r0)
                num_x += c[0, 0]
                num_y += c[0, 1]
                den += 1.0
        if den != 0:
            cx[i] = num_x / den
            cy[i] = num_y / den
    return cx, cy


def geom_type(g: Geoms) -> list[str | None]:
    """Geometry type name per row (reference base.py:129)."""
    return [TYPE_NAMES[int(t)] for t in g.row_types]


def count_coordinates(g: Geoms) -> np.ndarray:
    """(reference base.py:321)"""
    start = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
    end = g.ring_offsets[g.part_offsets[g.row_offsets[1:]]]
    return (end - start).astype(np.int64)


def count_geometries(g: Geoms) -> np.ndarray:
    """(reference base.py:364)"""
    return (g.row_offsets[1:] - g.row_offsets[:-1]).astype(np.int64)


# ---------------------------------------------------------------------------
# point-in-polygon + segment predicates
# ---------------------------------------------------------------------------


def _ring_contains_points(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: strictly-inside-or-on-edge handled separately.

    Returns crossing parity (True = inside by even-odd rule), boundary NOT
    guaranteed either way - combine with _points_on_ring for closed tests.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(px), dtype=bool)
    for i in range(len(x0)):
        cond = (y0[i] > py) != (y1[i] > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x0[i] + (py - y0[i]) * (x1[i] - x0[i]) / (y1[i] - y0[i])
        inside ^= cond & (px < xint)
    return inside


def _points_on_ring(ring: np.ndarray, px: np.ndarray, py: np.ndarray, eps=0.0) -> np.ndarray:
    """True where (px,py) lies exactly on a segment of ``ring``."""
    on = np.zeros(len(px), dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(len(x0)):
        minx, maxx = min(x0[i], x1[i]), max(x0[i], x1[i])
        miny, maxy = min(y0[i], y1[i]), max(y0[i], y1[i])
        cand = (px >= minx - eps) & (px <= maxx + eps) & (py >= miny - eps) & (py <= maxy + eps)
        if not cand.any():
            continue
        cross = (x1[i] - x0[i]) * (py - y0[i]) - (y1[i] - y0[i]) * (px - x0[i])
        on |= cand & (np.abs(cross) <= eps)
    return on


def points_in_polygon(
    g: Geoms, part: int, px: np.ndarray, py: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """For one polygon part: (interior_mask, boundary_mask) for many points.

    interior excludes the boundary; callers compose:
      intersects = interior | boundary   (predicate table sindex.py:6-8)
      within     = interior | boundary-with-interior ... for points GEOS says
                   a boundary point is NOT within, so within = interior.
    """
    r0, r1 = g.part_ring_range(part)
    shell = g.ring_coords(r0)
    inside = _ring_contains_points(shell, px, py)
    boundary = _points_on_ring(shell, px, py)
    for r in range(r0 + 1, r1):
        hole = g.ring_coords(r)
        hb = _points_on_ring(hole, px, py)
        boundary |= hb
        inside &= ~_ring_contains_points(hole, px, py) | hb
    interior = inside & ~boundary
    return interior, boundary


def points_in_geom(g: Geoms, row: int, px: np.ndarray, py: np.ndarray):
    """(interior, boundary) union over all polygon parts of one row."""
    interior = np.zeros(len(px), dtype=bool)
    boundary = np.zeros(len(px), dtype=bool)
    p0, p1 = g.row_part_range(row)
    for p in range(p0, p1):
        t = int(g.part_types[p])
        if t == POLYGON:
            i_, b_ = points_in_polygon(g, p, px, py)
            interior |= i_
            boundary |= b_
        elif t == LINESTRING:
            c = g.ring_coords(g.part_ring_range(p)[0])
            on = _points_on_ring(c, px, py)
            closed = len(c) > 1 and np.array_equal(c[0], c[-1])
            if closed:
                interior |= on  # a ring has no boundary points
            else:
                ends = ((px == c[0, 0]) & (py == c[0, 1])) | (
                    (px == c[-1, 0]) & (py == c[-1, 1])
                )
                interior |= on & ~ends
                boundary |= on & ends
        elif t == POINT:
            # a point's interior is the point itself (its boundary is empty)
            c = g.ring_coords(g.part_ring_range(p)[0])
            interior |= (px == c[0, 0]) & (py == c[0, 1])
    interior &= ~boundary
    return interior, boundary


def _segments_of_row(g: Geoms, row: int) -> np.ndarray:
    """(S,4) array of segments [x0,y0,x1,y1] over all rings of a row."""
    segs = []
    p0, p1 = g.row_part_range(row)
    for p in range(p0, p1):
        r0, r1 = g.part_ring_range(p)
        for r in range(r0, r1):
            c = g.ring_coords(r)
            if len(c) >= 2:
                segs.append(np.hstack([c[:-1], c[1:]]))
    if not segs:
        return np.empty((0, 4))
    return np.concatenate(segs)


def segments_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Any segment of (S,4) ``a`` intersects any of (T,4) ``b`` (incl. touch)."""
    if len(a) == 0 or len(b) == 0:
        return False
    # vectorized orientation tests over the S x T pair grid
    ax0, ay0, ax1, ay1 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx0, by0, bx1, by1 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True

    # collinear / endpoint touches
    def on_seg(px_, py_, x0, y0, x1, y1, d):
        return (
            (d == 0)
            & (px_ >= np.minimum(x0, x1))
            & (px_ <= np.maximum(x0, x1))
            & (py_ >= np.minimum(y0, y1))
            & (py_ <= np.maximum(y0, y1))
        )

    touch = (
        on_seg(bx0, by0, ax0, ay0, ax1, ay1, d1)
        | on_seg(bx1, by1, ax0, ay0, ax1, ay1, d2)
        | on_seg(ax0, ay0, bx0, by0, bx1, by1, d3)
        | on_seg(ax1, ay1, bx0, by0, bx1, by1, d4)
    )
    return bool(touch.any())


def geom_intersects_geom(ga: Geoms, ia: int, gb: Geoms, ib: int) -> bool:
    """General pairwise 'intersects' (reference base.py:2845 semantics).

    bbox prefilter is the caller's job. Strategy: boundary-cross test plus
    containment tests via representative vertices.
    """
    sa = _segments_of_row(ga, ia)
    sb = _segments_of_row(gb, ib)
    ta = int(ga.row_types[ia])
    tb = int(gb.row_types[ib])
    # point cases
    if ta in (POINT, MULTIPOINT):
        px, py = _row_points(ga, ia)
        inter, bound = points_in_geom(gb, ib, px, py)
        return bool((inter | bound).any())
    if tb in (POINT, MULTIPOINT):
        px, py = _row_points(gb, ib)
        inter, bound = points_in_geom(ga, ia, px, py)
        return bool((inter | bound).any())
    if segments_intersect(sa, sb):
        return True
    # containment: any vertex of a strictly inside b, or vice versa
    if len(sa) and _any_vertex_inside(ga, ia, gb, ib):
        return True
    if len(sb) and _any_vertex_inside(gb, ib, ga, ia):
        return True
    return False


def _row_points(g: Geoms, row: int) -> tuple[np.ndarray, np.ndarray]:
    p0, p1 = g.row_part_range(row)
    c0 = g.ring_offsets[g.part_offsets[p0]]
    c1 = g.ring_offsets[g.part_offsets[p1]]
    c = g.coords[c0:c1]
    return c[:, 0], c[:, 1]


def _any_vertex_inside(ga: Geoms, ia: int, gb: Geoms, ib: int) -> bool:
    px, py = _row_points(ga, ia)
    if len(px) == 0:
        return False
    inter, bound = points_in_geom(gb, ib, px[:1], py[:1])
    return bool(inter[0] or bound[0])


def geom_within_geom(ga: Geoms, ia: int, gb: Geoms, ib: int) -> bool:
    """'a within b' (reference base.py:3179): a's interior inside b's interior,
    a not touching b's exterior. Implemented for the test-relevant cases:
    point-in-polygon (boundary point is NOT within) and polygon-in-polygon
    (all vertices inside-or-on, no boundary crossing, at least one interior)."""
    ta = int(ga.row_types[ia])
    if ta in (POINT, MULTIPOINT):
        px, py = _row_points(ga, ia)
        inter, bound = points_in_geom(gb, ib, px, py)
        return bool(inter.all() if ta == POINT else ((inter | bound).all() and inter.any()))
    px, py = _row_points(ga, ia)
    inter, bound = points_in_geom(gb, ib, px, py)
    if not (inter | bound).all():
        return False
    # no proper boundary crossings
    sa = _segments_of_row(ga, ia)
    sb = _segments_of_row(gb, ib)
    if _proper_cross(sa, sb):
        return False
    if inter.any():
        return True
    # every vertex sits on b's boundary (e.g. equal rects, shared edges):
    # within still holds if a's interior meets b's interior - probe a
    # representative interior point (centroid; exact for convex a)
    cx, cy = centroid(ga.take([ia]))
    if np.isnan(cx[0]):
        return False
    i2, _ = points_in_geom(gb, ib, np.array([cx[0]]), np.array([cy[0]]))
    return bool(i2[0])


def _proper_cross(a: np.ndarray, b: np.ndarray) -> bool:
    if len(a) == 0 or len(b) == 0:
        return False
    ax0, ay0, ax1, ay1 = a[:, 0, None], a[:, 1, None], a[:, 2, None], a[:, 3, None]
    bx0, by0, bx1, by1 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]

    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    return bool(proper.any())


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------


def point_to_segments_sqdist(px, py, segs: np.ndarray) -> np.ndarray:
    """Min squared distance from each point to a fixed set of segments."""
    if len(segs) == 0:
        return np.full(len(px), np.inf)
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x1 - x0, y1 - y0
    seg_len2 = dx * dx + dy * dy
    out = np.full(len(px), np.inf)
    for i in range(len(segs)):
        if seg_len2[i] == 0:
            d2 = (px - x0[i]) ** 2 + (py - y0[i]) ** 2
        elif dy[i] == 0.0:
            # axis-aligned fast paths: clamp the coordinate directly so the
            # result is float-EXACT for integer inputs (the generic t-param
            # form rounds the parallel component, e.g. (1/3)*3 != 1)
            nx = np.clip(px, min(x0[i], x1[i]), max(x0[i], x1[i]))
            d2 = (px - nx) ** 2 + (py - y0[i]) ** 2
        elif dx[i] == 0.0:
            ny = np.clip(py, min(y0[i], y1[i]), max(y0[i], y1[i]))
            d2 = (px - x0[i]) ** 2 + (py - ny) ** 2
        else:
            t = np.clip(((px - x0[i]) * dx[i] + (py - y0[i]) * dy[i]) / seg_len2[i], 0, 1)
            d2 = (px - (x0[i] + t * dx[i])) ** 2 + (py - (y0[i] + t * dy[i])) ** 2
        np.minimum(out, d2, out=out)
    return out


def points_to_geom_sqdist(g: Geoms, row: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Squared euclidean distance from many points to one geometry row
    (reference distance, base.py:3521). 0 inside polygons."""
    t = int(g.row_types[row])
    if t in (POINT, MULTIPOINT):
        gx, gy = _row_points(g, row)
        out = np.full(len(px), np.inf)
        for j in range(len(gx)):
            np.minimum(out, (px - gx[j]) ** 2 + (py - gy[j]) ** 2, out=out)
        return out
    segs = _segments_of_row(g, row)
    d2 = point_to_segments_sqdist(px, py, segs)
    if t in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        inter, bound = points_in_geom(g, row, px, py)
        d2 = np.where(inter | bound, 0.0, d2)
    return d2


def nearest_point_on_geom(g: Geoms, row: int, px: float, py: float):
    """Nearest point of geometry ``row`` to (px, py) -> (qx, qy, d2).
    Interior containment counts as distance 0 (the point itself)."""
    t = int(g.row_types[row])
    P = np.array([px]), np.array([py])
    if t in (POLYGON, MULTIPOLYGON, GEOMETRYCOLLECTION):
        inter, bound = points_in_geom(g, row, *P)
        if inter[0] or bound[0]:
            return (px, py, 0.0)
    if t in (POINT, MULTIPOINT):
        gx, gy = _row_points(g, row)
        d2 = (gx - px) ** 2 + (gy - py) ** 2
        k = int(np.argmin(d2))
        return (float(gx[k]), float(gy[k]), float(d2[k]))
    segs = _segments_of_row(g, row)
    best = (np.nan, np.nan, np.inf)
    for x0, y0, x1, y1 in segs:
        dx, dy = x1 - x0, y1 - y0
        L2 = dx * dx + dy * dy
        if L2 == 0:
            qx, qy = x0, y0
        elif dy == 0.0:
            qx = min(max(px, min(x0, x1)), max(x0, x1))
            qy = y0
        elif dx == 0.0:
            qx = x0
            qy = min(max(py, min(y0, y1)), max(y0, y1))
        else:
            tpar = min(max(((px - x0) * dx + (py - y0) * dy) / L2, 0.0), 1.0)
            qx, qy = x0 + tpar * dx, y0 + tpar * dy
        d2 = (px - qx) ** 2 + (py - qy) ** 2
        if d2 < best[2]:
            best = (float(qx), float(qy), float(d2))
    return best


def hausdorff_distance_pair(ga: Geoms, ia: int, gb: Geoms, ib: int, densify: float | None = None) -> float:
    """Symmetric Hausdorff distance (reference base.py:3617).

    Matches GEOS/JTS DiscreteHausdorffDistance for ALL geometry types:
    max over each side's VERTICES of the exact distance to the other
    geometry (segment interiors included), symmetrized. GEOS uses the
    same vertex-restricted sup (its densify knob just adds vertices), so
    this is bit-parity with hausdorff_distance(densify=None); it lower-
    bounds the true continuous Hausdorff, which both attain when each
    directed target is convex."""
    if densify is not None and not (0.0 < densify <= 1.0):
        # GEOS DiscreteHausdorffDistance range check
        raise ValueError("densify must be in the range (0.0, 1.0]")

    def directed(g1, i1, g2, i2):
        if densify is not None:
            segs = _segments_of_row(g1, i1)
            if len(segs):
                # GEOS uses rint(1/densifyFrac) subsegments (half-even)
                n = max(1, int(np.rint(1.0 / densify)))
                t = np.linspace(0.0, 1.0, n, endpoint=False)
                px = np.concatenate(
                    [(segs[:, 0, None] * (1 - t) + segs[:, 2, None] * t).ravel(), segs[:, 2]]
                )
                py = np.concatenate(
                    [(segs[:, 1, None] * (1 - t) + segs[:, 3, None] * t).ravel(), segs[:, 3]]
                )
            else:
                px, py = _row_points(g1, i1)
        else:
            px, py = _row_points(g1, i1)
        d2 = points_to_geom_sqdist(g2, i2, px, py)
        return float(np.sqrt(d2.max())) if len(d2) else 0.0

    return max(directed(ga, ia, gb, ib), directed(gb, ib, ga, ia))


def geom_to_geom_sqdist(ga: Geoms, ia: int, gb: Geoms, ib: int) -> float:
    """Exact squared distance between two geometry rows (base.py:3521).

    In 2-D the min distance between two non-intersecting segment sets is
    attained at a vertex of one of them, so min(vertices-of-A -> B,
    vertices-of-B -> A) is exact; a residual proper crossing (distance 0
    with no near vertex) is caught by the intersects test."""
    ta = int(ga.row_types[ia])
    tb = int(gb.row_types[ib])
    if ta in (POINT, MULTIPOINT):
        px, py = _row_points(ga, ia)
        d2 = points_to_geom_sqdist(gb, ib, px, py)
        return float(d2.min()) if len(d2) else np.inf
    if tb in (POINT, MULTIPOINT):
        px, py = _row_points(gb, ib)
        d2 = points_to_geom_sqdist(ga, ia, px, py)
        return float(d2.min()) if len(d2) else np.inf
    ax, ay = _row_points(ga, ia)
    bx, by = _row_points(gb, ib)
    best = np.inf
    if len(ax):
        best = min(best, float(points_to_geom_sqdist(gb, ib, ax, ay).min()))
    if len(bx):
        best = min(best, float(points_to_geom_sqdist(ga, ia, bx, by).min()))
    if best > 0.0 and geom_intersects_geom(ga, ia, gb, ib):
        return 0.0
    return best


# ---------------------------------------------------------------------------
# Vectorized geometry-vs-rect candidate evaluation (the polyfill / tile /
# rect-zone hot path). One numpy pass over ALL candidate pairs - no
# per-pair Python - for the case where one side is an axis-aligned rect.
# ---------------------------------------------------------------------------


def _edge_table(g: Geoms):
    """Global flat edge list over the CSR batch.

    Returns (edge_start, edge_row, edge_is_poly, row_edge_offsets):
    ``edge_start[e]`` is the coord index of edge e's first vertex (its
    second is ``edge_start[e]+1``, guaranteed same ring), ``edge_row`` the
    owning row, ``edge_is_poly`` whether the edge's part is a Polygon
    (ring bounds a region - participates in even-odd point-in-polygon),
    and ``row_edge_offsets`` a CSR index so a row's edges are the slice
    ``[row_edge_offsets[i], row_edge_offsets[i+1])`` of the edge arrays.
    """
    nc = len(g.coords)
    in_ring = np.ones(nc, dtype=bool)
    ring_last = g.ring_offsets[1:] - 1
    ring_nonempty = g.ring_offsets[1:] > g.ring_offsets[:-1]
    if nc:
        in_ring[ring_last[ring_nonempty]] = False
    edge_start = np.nonzero(in_ring)[0] if nc else np.empty(0, dtype=np.int64)
    # rows' coords are contiguous in CSR order
    row_coord_end = g.ring_offsets[g.part_offsets[g.row_offsets[1:]]]
    edge_row = np.searchsorted(row_coord_end, edge_start, side="right")
    ring_part = (
        np.searchsorted(g.part_offsets, np.arange(len(g.ring_offsets) - 1), side="right") - 1
    )
    ring_is_poly = g.part_types[ring_part] == POLYGON if len(ring_part) else ring_part
    edge_ring = np.searchsorted(g.ring_offsets, edge_start, side="right") - 1
    edge_is_poly = (
        ring_is_poly[edge_ring] if len(edge_start) else np.empty(0, dtype=bool)
    )
    row_edge_offsets = np.concatenate(
        [[0], np.cumsum(np.bincount(edge_row, minlength=len(g)))]
    ).astype(np.int64)
    return edge_start, edge_row, edge_is_poly, row_edge_offsets


def _csr_expand(counts: np.ndarray):
    """(flat_parent, flat_local) enumeration of per-parent counts."""
    total = int(counts.sum())
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    local = np.arange(total, dtype=np.int64) - offs[parent]
    return parent, local


def pairs_intersect_rects(
    g: Geoms, gi: np.ndarray, rects: np.ndarray
) -> np.ndarray:
    """Closed-set ``intersects(g[gi[k]], rect_k)`` for all candidate pairs.

    Thin wrapper over :func:`classify_rect_pairs` (kind > 0).
    """
    return classify_rect_pairs(g, gi, rects) > 0


def classify_rect_pairs(
    g: Geoms, gi: np.ndarray, rects: np.ndarray
) -> np.ndarray:
    """Classify each candidate (geometry row, axis-aligned rect) pair:
    0 = disjoint, 1 = boundary (the geometry's boundary meets the rect),
    2 = interior (the rect lies entirely inside a polygon region - every
    point of the rect is inside the geometry).

    The interior kind is what lets a covering-driven PIP join skip exact
    point tests for fully-covered cells (quadtree interior-cell rule).

    Decomposition, each stage fully vectorized and only run on pairs the
    previous stage left undecided:
      1. any vertex of the row inside the closed rect -> boundary;
      2. any edge of the row meets the closed rect (Liang-Barsky clip
         interval nonempty - inclusive bounds, so touches count)
         -> boundary;
      3. rect center strictly inside the row's polygon region (even-odd
         ray parity over polygon-ring edges) -> interior: with no vertex
         and no edge in the rect, parity of the center decides the whole
         rect (a rect inside a HOLE gets even parity, correctly 0). The
         center cannot lie on a polygon edge here: stage 2 already
         classified any edge meeting the rect.
    Matches geom_intersects_geom semantics for missing/empty rows (0).
    """
    gi = np.asarray(gi, dtype=np.int64)
    n = len(gi)
    kind = np.zeros(n, dtype=np.int8)
    if n == 0:
        return kind
    rminx, rminy, rmaxx, rmaxy = rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3]

    # --- stage 1: vertex in rect
    row_cstart = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
    row_cend = g.ring_offsets[g.part_offsets[g.row_offsets[1:]]]
    ncoords = (row_cend - row_cstart).astype(np.int64)
    pair_v, local_v = _csr_expand(ncoords[gi])
    ci = row_cstart[gi[pair_v]] + local_v
    vx = g.coords[ci, 0]
    vy = g.coords[ci, 1]
    inside = (
        (vx >= rminx[pair_v])
        & (vx <= rmaxx[pair_v])
        & (vy >= rminy[pair_v])
        & (vy <= rmaxy[pair_v])
    )
    if inside.any():
        kind[np.unique(pair_v[inside])] = 1

    # --- stage 2: edge clips rect (Liang-Barsky, inclusive)
    rem = np.nonzero(kind == 0)[0]
    if len(rem) == 0:
        return kind
    edge_start, _, edge_is_poly, row_eoff = _edge_table(g)
    ecounts = (row_eoff[1:] - row_eoff[:-1]).astype(np.int64)
    sub_rows = gi[rem]
    pair_e, local_e = _csr_expand(ecounts[sub_rows])
    if len(pair_e):
        ei = row_eoff[sub_rows[pair_e]] + local_e
        a = edge_start[ei]
        ax, ay = g.coords[a, 0], g.coords[a, 1]
        bx, by = g.coords[a + 1, 0], g.coords[a + 1, 1]
        k = rem[pair_e]
        dx = bx - ax
        dy = by - ay
        t0 = np.zeros(len(pair_e))
        t1 = np.ones(len(pair_e))
        ok = np.ones(len(pair_e), dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for p, q in (
                (-dx, ax - rminx[k]),
                (dx, rmaxx[k] - ax),
                (-dy, ay - rminy[k]),
                (dy, rmaxy[k] - ay),
            ):
                zero = p == 0
                ok &= ~zero | (q >= 0)
                r = np.where(zero, 0.0, q / np.where(zero, 1.0, p))
                t0 = np.where(~zero & (p < 0), np.maximum(t0, r), t0)
                t1 = np.where(~zero & (p > 0), np.minimum(t1, r), t1)
        hit = ok & (t0 <= t1)
        if hit.any():
            kind[np.unique(k[hit])] = 1

    # --- stage 3: rect center inside polygon region (even-odd) -> interior
    rem = np.nonzero(kind == 0)[0]
    if len(rem) == 0:
        return kind
    sub_rows = gi[rem]
    pair_e, local_e = _csr_expand(ecounts[sub_rows])
    if len(pair_e) == 0:
        return kind
    ei = row_eoff[sub_rows[pair_e]] + local_e
    poly = edge_is_poly[ei]
    pair_e, ei = pair_e[poly], ei[poly]
    if len(pair_e) == 0:
        return kind
    a = edge_start[ei]
    ax, ay = g.coords[a, 0], g.coords[a, 1]
    bx, by = g.coords[a + 1, 0], g.coords[a + 1, 1]
    k = rem[pair_e]
    cx = (rminx[k] + rmaxx[k]) * 0.5
    cy = (rminy[k] + rmaxy[k]) * 0.5
    straddle = (ay > cy) != (by > cy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = ax + (cy - ay) * (bx - ax) / np.where(straddle, by - ay, 1.0)
    crossing = straddle & (cx < xi)
    parity = np.bincount(pair_e[crossing], minlength=len(rem)) % 2 == 1
    kind[rem[parity]] = 2
    return kind
