"""Polygon clipping + boolean region ops (no GEOS in this sandbox).

Scope is explicitly bounded (SURVEY.md §7.3): the overlay/clip/dissolve
semantics the reference's tests exercise use axis-aligned rectangles and
convex polygons. We implement:

- Sutherland-Hodgman clipping of an arbitrary ring by a CONVEX clip ring
  (exact for the pairwise-intersection leg of overlay and for clip-by-mask);
- the `clip_by_rect` fast path (reference base.py:4305, tools/clip.py:63-68);
- rectilinear region boolean ops (union / intersection / difference) via a
  coordinate-grid decomposition - exact for axis-aligned inputs, used by
  dissolve's union_all and overlay's difference legs. Output regions are
  MultiPolygons of disjoint maximal rectangles: region-equivalent to the
  canonical merged polygon (same area / bounds / point membership), not
  byte-identical. On a cluster with shapely installed the kernels/ interface
  swaps in GEOS unions unchanged.
"""

from __future__ import annotations

import numpy as np

from .wkb import Geoms, POLYGON


def _is_ccw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return (x[:-1] * y[1:] - x[1:] * y[:-1]).sum() > 0


def suth_hodgman(subject: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Clip closed ``subject`` ring by CONVEX closed ``clip_ring``.

    Returns the clipped closed ring (possibly empty (0,2)).
    """
    if not _is_ccw(clip_ring):
        clip_ring = clip_ring[::-1]
    output = subject[:-1] if len(subject) and np.array_equal(subject[0], subject[-1]) else subject
    for i in range(len(clip_ring) - 1):
        if len(output) == 0:
            break
        cx0, cy0 = clip_ring[i]
        cx1, cy1 = clip_ring[i + 1]
        ex, ey = cx1 - cx0, cy1 - cy0
        pts = np.asarray(output, dtype=np.float64)
        side = ex * (pts[:, 1] - cy0) - ey * (pts[:, 0] - cx0)  # >0 = inside (left)
        inside = side >= 0
        new_pts = []
        n = len(pts)
        for j in range(n):
            k = (j + 1) % n
            if inside[j]:
                new_pts.append(pts[j])
            if inside[j] != inside[k]:
                # intersection of edge (j,k) with the clip line
                denom = side[j] - side[k]
                if denom != 0:
                    t = side[j] / denom
                    new_pts.append(pts[j] + t * (pts[k] - pts[j]))
        output = new_pts
    if len(output) < 3:
        return np.empty((0, 2))
    ring = np.asarray(output, dtype=np.float64)
    return np.vstack([ring, ring[:1]])


def clip_ring_by_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    rect = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]], dtype=np.float64
    )
    return suth_hodgman(ring, rect)


def clip_segments_by_rect(coords: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Clip an open polyline; returns list of clipped sub-polylines
    (Cohen-Sutherland per segment, stitched)."""
    out: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    for i in range(len(coords) - 1):
        seg = _clip_seg(coords[i], coords[i + 1], minx, miny, maxx, maxy)
        if seg is None:
            if len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = []
            continue
        a, b = seg
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                out.append(np.asarray(cur))
            cur = [a, b]
    if len(cur) >= 2:
        out.append(np.asarray(cur))
    return out


def _clip_seg(p, q, minx, miny, maxx, maxy):
    """Liang-Barsky segment clip; returns (a, b) or None."""
    p = np.asarray(p, dtype=np.float64)
    d = np.asarray(q, dtype=np.float64) - p
    t0, t1 = 0.0, 1.0
    for pi, qi in (
        (-d[0], p[0] - minx),
        (d[0], maxx - p[0]),
        (-d[1], p[1] - miny),
        (d[1], maxy - p[1]),
    ):
        if pi == 0:
            if qi < 0:
                return None
            continue
        r = qi / pi
        if pi < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    return p + t0 * d, p + t1 * d


def convex_intersection(ring_a: np.ndarray, ring_b: np.ndarray) -> np.ndarray:
    """Intersection ring of ring_a (any simple) with CONVEX ring_b."""
    return suth_hodgman(ring_a, ring_b)


# ---------------------------------------------------------------------------
# Rectilinear region algebra (coordinate-grid decomposition)
# ---------------------------------------------------------------------------


class RectRegion:
    """A set of disjoint axis-aligned rectangles (N,4) [minx,miny,maxx,maxy]."""

    __slots__ = ("rects",)

    def __init__(self, rects: np.ndarray):
        self.rects = np.asarray(rects, dtype=np.float64).reshape(-1, 4)

    @classmethod
    def from_rects(cls, rects) -> "RectRegion":
        return cls(np.asarray(rects, dtype=np.float64).reshape(-1, 4))

    @property
    def area(self) -> float:
        r = self.rects
        if len(r) == 0:
            return 0.0
        # rects may overlap (e.g. raw input); compute exact union area by grid
        return _grid_boolean([self], lambda m: m[0]).area_raw()

    def area_raw(self) -> float:
        r = self.rects
        return float(((r[:, 2] - r[:, 0]) * (r[:, 3] - r[:, 1])).sum()) if len(r) else 0.0

    def bounds(self):
        r = self.rects
        if len(r) == 0:
            return (np.nan,) * 4
        return (r[:, 0].min(), r[:, 1].min(), r[:, 2].max(), r[:, 3].max())

    def is_empty(self) -> bool:
        return len(self.rects) == 0

    def normalized(self) -> "RectRegion":
        """Merge possibly-overlapping rects into disjoint maximal rects in a
        single grid pass."""
        if len(self.rects) <= 1:
            return self
        return _grid_boolean([self], lambda m: m[0])


def _grid_boolean(regions: list[RectRegion], op) -> RectRegion:
    """Evaluate a boolean ``op`` over regions on their shared coordinate grid.

    ``op`` receives a list of boolean occupancy grids (one per region) and
    returns the combined grid. Exact for axis-aligned inputs; output rects
    are merged into maximal horizontal runs then vertical runs.
    """
    all_rects = [r.rects for r in regions if len(r.rects)]
    if not all_rects:
        return RectRegion(np.empty((0, 4)))
    cat = np.concatenate(all_rects)
    xs = np.unique(np.concatenate([cat[:, 0], cat[:, 2]]))
    ys = np.unique(np.concatenate([cat[:, 1], cat[:, 3]]))
    nx, ny = len(xs) - 1, len(ys) - 1
    if nx <= 0 or ny <= 0:
        return RectRegion(np.empty((0, 4)))
    masks = []
    for reg in regions:
        m = np.zeros((ny, nx), dtype=bool)
        for minx, miny, maxx, maxy in reg.rects:
            i0 = np.searchsorted(xs, minx)
            i1 = np.searchsorted(xs, maxx)
            j0 = np.searchsorted(ys, miny)
            j1 = np.searchsorted(ys, maxy)
            m[j0:j1, i0:i1] = True
        masks.append(m)
    out = op(masks)
    return RectRegion(_mask_to_rects(out, xs, ys))


def _mask_to_rects(mask: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Cell mask -> disjoint rectangles, vectorized.

    Horizontal runs are found with one diff over the padded mask (no Python
    per-cell loop); vertical merging then folds row-adjacent runs with the
    same column span (loop is O(#runs), not O(#cells))."""
    ny, nx = mask.shape
    padded = np.zeros((ny, nx + 2), dtype=np.int8)
    padded[:, 1 : nx + 1] = mask
    d = np.diff(padded, axis=1)
    rows_s, cols_s = np.nonzero(d == 1)  # run starts (row-major order)
    rows_e, cols_e = np.nonzero(d == -1)  # run ends, pairs up with starts
    if len(rows_s) == 0:
        return np.empty((0, 4))
    # vertical merge: runs sorted by (col span, row); row-adjacent identical
    # spans merge into taller rects
    order = np.lexsort((rows_s, cols_e, cols_s))
    sc, ec, rr = cols_s[order], cols_e[order], rows_s[order]
    rects = []
    k = 0
    n = len(sc)
    while k < n:
        j = k
        while (
            j + 1 < n and sc[j + 1] == sc[k] and ec[j + 1] == ec[k] and rr[j + 1] == rr[j] + 1
        ):
            j += 1
        rects.append((xs[sc[k]], ys[rr[k]], xs[ec[k]], ys[rr[j] + 1]))
        k = j + 1
    return np.asarray(rects, dtype=np.float64).reshape(-1, 4)


def region_union(a: RectRegion, b: RectRegion) -> RectRegion:
    return _grid_boolean([a, b], lambda m: m[0] | m[1])


def region_intersection(a: RectRegion, b: RectRegion) -> RectRegion:
    return _grid_boolean([a, b], lambda m: m[0] & m[1])


def region_difference(a: RectRegion, b: RectRegion) -> RectRegion:
    return _grid_boolean([a, b], lambda m: m[0] & ~m[1])


def rect_of_ring(ring: np.ndarray):
    """If ``ring`` is an axis-aligned rectangle, return (minx,miny,maxx,maxy);
    else None."""
    if len(ring) not in (5,):
        return None
    xs = np.unique(ring[:, 0])
    ys = np.unique(ring[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return None
    # all vertices must be corners
    ok = np.all(np.isin(ring[:, 0], xs) & np.isin(ring[:, 1], ys))
    if not ok:
        return None
    return (xs[0], ys[0], xs[1], ys[1])


def geom_rects(g: Geoms, row: int):
    """All polygon parts of a row as rects, or None if any part is not an
    axis-aligned hole-free rectangle."""
    out = []
    p0, p1 = g.row_part_range(row)
    for p in range(p0, p1):
        if g.part_types[p] != POLYGON:
            return None
        r0, r1 = g.part_ring_range(p)
        if r1 - r0 != 1:
            return None
        rect = rect_of_ring(g.ring_coords(r0))
        if rect is None:
            return None
        out.append(rect)
    return RectRegion.from_rects(out) if out else RectRegion(np.empty((0, 4)))
