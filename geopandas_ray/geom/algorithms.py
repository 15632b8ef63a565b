"""Derived-geometry algorithms (pure NumPy, per-row helpers).

Backing kernels for the SURVEY.md §2.2 geometry-out operators: convex hull
(Andrew monotone chain), Douglas-Peucker simplify, rotating-calipers minimum
rotated rectangle, Welzl minimum bounding circle, segmentize, repeated-point
removal, line interpolation, representative points, seeded polygon point
sampling (tools/_random.py:8-97 semantics: per-row deterministic rng).
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull ring CCW, closed."""
    pts = np.unique(points, axis=0)
    if len(pts) == 1:
        return pts
    if len(pts) == 2:
        return pts
    # lexicographic sort (unique already sorts rows)
    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = np.asarray(lower[:-1] + upper[:-1], dtype=np.float64)
    return np.vstack([ring, ring[:1]])


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative Douglas-Peucker polyline simplification."""
    n = len(coords)
    if n <= 2:
        return coords
    if n <= 64:
        # scalar path: numpy slice/clip overhead dominates tiny rings
        # (measured 73us -> ~5us per 5-pt ring); dp_mark is the single
        # source of the scalar loop so the per-row and batched simplify
        # paths can't diverge
        keep = np.zeros(n, dtype=bool)
        dp_mark(coords[:, 0].tolist(), coords[:, 1].tolist(), 0, n, tol * tol, keep)
        return coords[keep]
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = coords[b] - coords[a]
        L2 = seg @ seg
        rel = coords[a + 1 : b] - coords[a]
        if L2 == 0:
            d2 = (rel**2).sum(axis=1)
        else:
            t = np.clip((rel @ seg) / L2, 0, 1)
            proj = np.outer(t, seg)
            d2 = ((rel - proj) ** 2).sum(axis=1)
        k = int(np.argmax(d2))
        if d2[k] > tol * tol:
            idx = a + 1 + k
            keep[idx] = True
            stack.append((a, idx))
            stack.append((idx, b))
    return coords[keep]


def min_rotated_rect(points: np.ndarray) -> np.ndarray:
    """Minimum-area oriented rectangle via rotating calipers on the hull.
    Returns the closed 5-point ring."""
    hull = convex_hull(points)
    if len(hull) <= 2:
        return hull
    h = hull[:-1]
    edges = np.diff(hull, axis=0)
    angles = np.unique(np.mod(np.arctan2(edges[:, 1], edges[:, 0]), np.pi / 2))
    best = None
    for a in angles:
        c, s = np.cos(a), np.sin(a)
        R = np.array([[c, s], [-s, c]])
        rot = h @ R.T
        mn = rot.min(axis=0)
        mx = rot.max(axis=0)
        area = np.prod(mx - mn)
        if best is None or area < best[0]:
            best = (area, a, mn, mx)
    _, a, mn, mx = best
    c, s = np.cos(a), np.sin(a)
    Rinv = np.array([[c, -s], [s, c]])
    corners = np.array(
        [[mn[0], mn[1]], [mx[0], mn[1]], [mx[0], mx[1]], [mn[0], mx[1]], [mn[0], mn[1]]]
    )
    return corners @ Rinv.T


def min_bounding_circle(points: np.ndarray, seed: int = 42) -> tuple[float, float, float]:
    """Welzl's algorithm (iterative move-to-front); returns (cx, cy, r)."""
    pts = np.unique(points, axis=0)
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(pts))
    pts = pts[order]

    def circle2(a, b):
        c = (a + b) / 2.0
        return (c[0], c[1], float(np.hypot(*(a - b)) / 2.0))

    def circle3(a, b, c):
        ax, ay = a; bx, by = b; cx, cy = c
        d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if d == 0:
            return None
        ux = ((ax**2 + ay**2) * (by - cy) + (bx**2 + by**2) * (cy - ay) + (cx**2 + cy**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx - bx) + (bx**2 + by**2) * (ax - cx) + (cx**2 + cy**2) * (bx - ax)) / d
        r = float(np.hypot(ux - ax, uy - ay))
        return (ux, uy, r)

    def inside(circ, p, eps=1e-9):
        return np.hypot(p[0] - circ[0], p[1] - circ[1]) <= circ[2] + eps

    if len(pts) == 0:
        return (np.nan, np.nan, np.nan)
    if len(pts) == 1:
        return (pts[0][0], pts[0][1], 0.0)
    circ = circle2(pts[0], pts[1])
    for i in range(2, len(pts)):
        if inside(circ, pts[i]):
            continue
        circ = circle2(pts[i], pts[0])
        for j in range(1, i):
            if inside(circ, pts[j]):
                continue
            circ = circle2(pts[i], pts[j])
            for k in range(j):
                if inside(circ, pts[k]):
                    continue
                c3 = circle3(pts[i], pts[j], pts[k])
                if c3 is not None:
                    circ = c3
    return circ


def segmentize(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Insert vertices so no segment exceeds max_len (base.py:1711)."""
    if len(coords) < 2:
        return coords
    out = [coords[:1]]
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        d = float(np.hypot(*(b - a)))
        k = max(1, int(np.ceil(d / max_len)))
        if k > 1:
            t = np.arange(1, k) / k
            out.append(a + t[:, None] * (b - a))
        out.append(b.reshape(1, 2))
    return np.concatenate(out)


def remove_repeated(coords: np.ndarray, tolerance: float = 0.0) -> np.ndarray:
    """Drop consecutive duplicate vertices (base.py:1351)."""
    if len(coords) < 2:
        return coords
    d = np.hypot(*np.diff(coords, axis=0).T)
    keep = np.concatenate([[True], d > tolerance])
    out = coords[keep]
    if len(out) < 2:
        return coords[:1]
    return out


def interpolate_line(coords: np.ndarray, distance: float, normalized: bool = False) -> tuple[float, float]:
    """Point at `distance` along the polyline (base.py:5240)."""
    seg = np.hypot(*np.diff(coords, axis=0).T)
    total = seg.sum()
    d = distance * total if normalized else distance
    d = min(max(d, 0.0), total)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    i = int(np.searchsorted(cum, d, side="right") - 1)
    i = min(i, len(seg) - 1)
    if seg[i] == 0:
        return tuple(coords[i])
    t = (d - cum[i]) / seg[i]
    p = coords[i] + t * (coords[i + 1] - coords[i])
    return (float(p[0]), float(p[1]))


def representative_point(g, row) -> tuple[float, float]:
    """A point guaranteed inside the geometry (base.py:1476): centroid if
    interior, else midpoint of an interior scanline crossing."""
    from . import kernels as K

    t = int(g.row_types[row])
    if t in (1, 4):  # point-ish
        px, py = K._row_points(g, row)
        return (float(px[0]), float(py[0]))
    if t in (2, 5):  # line: a vertex midpoint on the line
        p0, _ = g.row_part_range(row)
        c = g.ring_coords(g.part_ring_range(p0)[0])
        mid = len(c) // 2
        return (float(c[mid][0]), float(c[mid][1]))
    cx, cy = K.centroid(g.take([row]))
    inter, _ = K.points_in_geom(g, row, np.array([cx[0]]), np.array([cy[0]]))
    if inter[0]:
        return (float(cx[0]), float(cy[0]))
    # scanline through the bbox mid-y: find interior x intervals
    b = K.bounds(g.take([row]))[0]
    ys = (b[1] + b[3]) / 2.0
    xs = np.linspace(b[0], b[2], 257)[1:-1]
    inter, bound = K.points_in_geom(g, row, xs, np.full(len(xs), ys))
    hit = np.nonzero(inter)[0]
    if len(hit):
        return (float(xs[hit[len(hit) // 2]]), float(ys))
    return (float(cx[0]), float(cy[0]))


def sample_points_in_geom(g, row, size: int, seed: int, row_key: int) -> np.ndarray:
    """Uniform points inside a polygon row (area-weighted across parts) by
    seeded rejection sampling - deterministic per (seed, row_key)
    (tools/_random.py:8-97 semantics)."""
    from . import kernels as K

    rng = np.random.RandomState((seed * 1000003 + row_key) % (2**32))
    b = K.bounds(g.take([row]))[0]
    if np.isnan(b).any():
        return np.empty((0, 2))
    out = []
    need = size
    for _ in range(200):  # bounded retries
        m = max(need * 4, 16)
        xs = rng.uniform(b[0], b[2], m)
        ys = rng.uniform(b[1], b[3], m)
        inter, bound = K.points_in_geom(g, row, xs, ys)
        ok = np.nonzero(inter | bound)[0][:need]
        if len(ok):
            out.append(np.column_stack([xs[ok], ys[ok]]))
            need -= len(ok)
        if need <= 0:
            break
    return np.concatenate(out) if out else np.empty((0, 2))


def delaunay(points: np.ndarray) -> list[tuple[int, int, int]]:
    """Bowyer-Watson Delaunay triangulation of a point set.

    Returns triangles as index triples into the UNIQUE-point array that is
    also returned... callers should pass pre-uniqued points. O(n^2) worst
    case - fine for per-row vertex sets (base.py:908 operates per geometry).
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    # super-triangle bounding everything
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    # the super-triangle must be effectively "at infinity": too close and
    # hull-adjacent circumcircles interact with its vertices, dropping valid
    # boundary triangles (under-triangulated hulls)
    span = max(pts[:, 0].ptp(), pts[:, 1].ptp(), 1.0) * 1e5
    sp = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span], [cx, cy + 2 * span]])
    allp = np.vstack([pts, sp])
    S = n, n + 1, n + 2
    tris = [(S[0], S[1], S[2])]

    def circum(tri):
        ax, ay = allp[tri[0]]
        bx, by = allp[tri[1]]
        cx_, cy_ = allp[tri[2]]
        d = 2 * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        if d == 0:
            return (0.0, 0.0, np.inf)
        ux = ((ax**2 + ay**2) * (by - cy_) + (bx**2 + by**2) * (cy_ - ay) + (cx_**2 + cy_**2) * (ay - by)) / d
        uy = ((ax**2 + ay**2) * (cx_ - bx) + (bx**2 + by**2) * (ax - cx_) + (cx_**2 + cy_**2) * (bx - ax)) / d
        r2 = (ax - ux) ** 2 + (ay - uy) ** 2
        return (ux, uy, r2)

    centers = [circum(tris[0])]
    for p in range(n):
        px, py = allp[p]
        bad = []
        for t_idx, (ux, uy, r2) in enumerate(centers):
            if (px - ux) ** 2 + (py - uy) ** 2 <= r2 * (1 + 1e-12):
                bad.append(t_idx)
        # polygon hole boundary = edges of bad triangles not shared twice
        edge_count = {}
        for t_idx in bad:
            a, b, c = tris[t_idx]
            for e in ((a, b), (b, c), (c, a)):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        for t_idx in sorted(bad, reverse=True):
            tris.pop(t_idx)
            centers.pop(t_idx)
        for a, b in boundary:
            tri = (a, b, p)
            tris.append(tri)
            centers.append(circum(tri))
    out = [t for t in tris if all(v < n for v in t)]
    return out


def voronoi_cells(points: np.ndarray, envelope: tuple[float, float, float, float]) -> list[np.ndarray]:
    """Voronoi cell polygon per input point, clipped to ``envelope``.

    Each cell is the envelope rectangle cut by the perpendicular-bisector
    half-plane against every other point (exact, O(n^2) per row - reference
    voronoi_polygons base.py:999 operates per geometry's vertex set).
    Returns closed rings (possibly empty for duplicate points).
    """
    pts = np.asarray(points, dtype=np.float64)
    minx, miny, maxx, maxy = envelope
    base = np.array(
        [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
    )
    cells = []
    for i in range(len(pts)):
        ring = base
        p = pts[i]
        for j in range(len(pts)):
            if j == i or len(ring) == 0:
                continue
            q = pts[j]
            d = q - p
            if d @ d == 0:
                ring = np.empty((0, 2))
                break
            # keep the side closer to p: d . (x - m) <= 0, m = midpoint
            m = (p + q) / 2.0
            # clip ring by half-plane via the Sutherland-Hodgman inner step:
            # inside(x) = d . (x - m) <= 0
            out = []
            pts_open = ring[:-1]
            side = (pts_open - m) @ d
            nv = len(pts_open)
            for k in range(nv):
                k2 = (k + 1) % nv
                a_in = side[k] <= 0
                b_in = side[k2] <= 0
                if a_in:
                    out.append(pts_open[k])
                if a_in != b_in:
                    denom = side[k] - side[k2]
                    if denom != 0:
                        t = side[k] / denom
                        out.append(pts_open[k] + t * (pts_open[k2] - pts_open[k]))
            if len(out) < 3:
                ring = np.empty((0, 2))
            else:
                r = np.asarray(out)
                ring = np.vstack([r, r[:1]])
        cells.append(ring)
    return cells


def polygon_structure_reason(parts) -> str | None:
    """Structural invalidity over assembled polygon parts (reference
    base.py:210/:249 classes beyond ring geometry): 'Hole lies outside
    shell', 'Holes are nested', 'Nested shells'. ``parts`` is the
    (type, rings) sequence of one row; polygon rings are [shell, *holes]
    by position. Returns None when no structural violation is found.

    Probe policy: a ring is tested by its vertices plus edge midpoints;
    strictly-inside wins over on-boundary ambiguity (crossing test)."""
    from .booleans import _point_in_ring

    def probes(ring: np.ndarray) -> np.ndarray:
        mids = (ring[:-1] + ring[1:]) / 2.0
        return np.vstack([ring[:-1], mids])

    def any_inside(ring: np.ndarray, outer: np.ndarray) -> bool:
        return any(_point_in_ring(outer, float(x), float(y)) for x, y in probes(ring))

    POLYGON = 3
    polys = [rings for t, rings in parts if t == POLYGON and len(rings) > 0]
    for rings in polys:
        shell = rings[0]
        holes = rings[1:]
        for h in holes:
            if len(h) >= 4 and len(shell) >= 4 and not any_inside(h, shell):
                return "Hole lies outside shell"
        for a in range(len(holes)):
            for b in range(len(holes)):
                if a == b or len(holes[a]) < 4 or len(holes[b]) < 4:
                    continue
                # a nested in b: every probe of a inside-or-ambiguous b and
                # at least one strictly inside
                pr = probes(holes[a])
                ins = [_point_in_ring(holes[b], float(x), float(y)) for x, y in pr]
                if all(ins):
                    return "Holes are nested"
    for i in range(len(polys)):
        for j in range(len(polys)):
            if i == j or len(polys[i][0]) < 4 or len(polys[j][0]) < 4:
                continue
            pr = probes(polys[i][0])
            ins = [_point_in_ring(polys[j][0], float(x), float(y)) for x, y in pr]
            if ins and all(ins):
                # shell i fully inside shell j: invalid unless it sits inside
                # one of j's holes
                in_hole = any(
                    len(h) >= 4 and all(_point_in_ring(h, float(x), float(y)) for x, y in pr)
                    for h in polys[j][1:]
                )
                if not in_hole:
                    return "Nested shells"
    return None


# ---------------------------------------------------------------------------
# full noding validity (OGC ring simplicity + cross-ring analysis)
# ---------------------------------------------------------------------------


def _dedup_ring(ring: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (repeated points are VALID in
    GEOS and must not read as zero-length-segment touches) and re-close."""
    if len(ring) < 2:
        return ring
    keep = np.concatenate([[True], np.any(ring[1:] != ring[:-1], axis=1)])
    r = ring[keep]
    if len(r) < 2 or np.array_equal(r[0], r[-1]):
        return r
    return np.vstack([r, r[:1]])


def _seg_pair_flags(a0, a1, b0, b1):
    """Vectorized segment-pair relations between two segment sets.

    a0,a1: (n,2) starts/ends; b0,b1: (m,2). Returns (proper, touch,
    overlap) boolean (n,m) matrices: proper interior crossing; single-point
    touch (an endpoint of one lies on the other, incl. endpoint-endpoint);
    collinear overlap in more than a point. The three are disjoint."""

    def orient(px, py, qx, qy, rx, ry):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    ax0, ay0 = a0[:, 0][:, None], a0[:, 1][:, None]
    ax1, ay1 = a1[:, 0][:, None], a1[:, 1][:, None]
    bx0, by0 = b0[:, 0][None, :], b0[:, 1][None, :]
    bx1, by1 = b1[:, 0][None, :], b1[:, 1][None, :]
    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = (d1 * d2 < 0) & (d3 * d4 < 0)

    def onseg(px, py, qx, qy, rx, ry):
        return (
            (rx >= np.minimum(px, qx))
            & (rx <= np.maximum(px, qx))
            & (ry >= np.minimum(py, qy))
            & (ry <= np.maximum(py, qy))
        )

    t = (d1 == 0) & onseg(ax0, ay0, ax1, ay1, bx0, by0)
    t |= (d2 == 0) & onseg(ax0, ay0, ax1, ay1, bx1, by1)
    t |= (d3 == 0) & onseg(bx0, by0, bx1, by1, ax0, ay0)
    t |= (d4 == 0) & onseg(bx0, by0, bx1, by1, ax1, ay1)
    col = (d1 == 0) & (d2 == 0)
    ovx = np.maximum(np.minimum(ax0, ax1), np.minimum(bx0, bx1)) < np.minimum(
        np.maximum(ax0, ax1), np.maximum(bx0, bx1)
    )
    ovy = np.maximum(np.minimum(ay0, ay1), np.minimum(by0, by1)) < np.minimum(
        np.maximum(ay0, ay1), np.maximum(by0, by1)
    )
    overlap = col & (ovx | ovy)
    touch = t & ~proper & ~overlap
    return proper, touch, overlap


def ring_noding_reason(ring: np.ndarray) -> str | None:
    """OGC ring simplicity, exact: non-adjacent segments may not intersect
    AT ALL (proper cross, vertex revisit, T-touch), adjacent segments may
    not collinearly overlap (spike). Processed in row blocks so the pair
    matrices stay ~32MB even for huge rings."""
    r = _dedup_ring(ring)
    n = len(r) - 1
    if n < 3:
        return "Too few points in geometry component"
    s0, s1 = r[:-1], r[1:]
    blk = max(1, 4_000_000 // n)
    j = np.arange(n)[None, :]
    for lo in range(0, n, blk):
        hi = min(n, lo + blk)
        proper, touch, overlap = _seg_pair_flags(s0[lo:hi], s1[lo:hi], s0, s1)
        diff = np.abs(np.arange(lo, hi)[:, None] - j)
        adjacent = (diff <= 1) | (diff == n - 1)
        if (proper & ~adjacent).any():
            return "Ring Self-intersection"
        if ((touch | overlap) & ~adjacent).any():
            return "Ring Self-intersection"
        if (overlap & adjacent & (diff > 0)).any():  # spike
            return "Ring Self-intersection"
    return None


def _pair_touch_points(A: np.ndarray, B: np.ndarray, touch: np.ndarray) -> set:
    """Exact coordinates where flagged segment pairs touch (the endpoint of
    one that lies on the other); touch pairs are few, so a Python loop."""
    pts = set()
    a0, a1, b0, b1 = A[:-1], A[1:], B[:-1], B[1:]

    def orient(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    def onseg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    for i, j in zip(*np.nonzero(touch)):
        p, q = a0[i], a1[i]
        u, v = b0[j], b1[j]
        for r, (s, t2) in ((u, (p, q)), (v, (p, q)), (p, (u, v)), (q, (u, v))):
            if orient(s, t2, r) == 0 and onseg(s, t2, r):
                pts.add((float(r[0]), float(r[1])))
    return pts


def polygon_noding_reason(rings) -> str | None:
    """Cross-ring noding for ONE polygon [shell, *holes]: a proper cross or
    collinear overlap between two rings is 'Self-intersection'; single-point
    touches are legal until they close a cycle in the ring-touch multigraph
    (union-find; two touch points between the same pair, or a hole chain
    back to the shell, pinch off part of the interior) -> 'Interior is
    disconnected' (GEOS ConnectedInteriorTester)."""
    rs = [_dedup_ring(r) for r in rings if len(r) >= 4]
    k = len(rs)
    if k < 2:
        return None
    parent = list(range(k))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(k):
        for b in range(a + 1, k):
            A, B = rs[a], rs[b]
            proper, touch, overlap = _seg_pair_flags(A[:-1], A[1:], B[:-1], B[1:])
            if proper.any() or overlap.any():
                return "Self-intersection"
            if touch.any():
                for _ in _pair_touch_points(A, B, touch):
                    ra, rb = find(a), find(b)
                    if ra == rb:
                        return "Interior is disconnected"
                    parent[ra] = rb
    return None


def multipolygon_noding_reason(polys) -> str | None:
    """Cross-PART ring analysis for a multipolygon (``polys`` = list of
    [shell, *holes]): rings of distinct parts may touch at finitely many
    points (OGC allows any finite count) but never properly cross or share
    a collinear stretch."""
    cleaned = [[_dedup_ring(r) for r in rings if len(r) >= 4] for rings in polys]
    for i in range(len(cleaned)):
        for j in range(i + 1, len(cleaned)):
            for A in cleaned[i]:
                for B in cleaned[j]:
                    proper, _, overlap = _seg_pair_flags(A[:-1], A[1:], B[:-1], B[1:])
                    if proper.any() or overlap.any():
                        return "Self-intersection"
    return None


def _dedup_line(c: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicate vertices (repeated points do not make a
    line non-simple in GEOS)."""
    if len(c) < 2:
        return c
    keep = np.concatenate([[True], np.any(c[1:] != c[:-1], axis=1)])
    return c[keep]


def line_is_simple(coords: np.ndarray) -> bool:
    """OGC simplicity for one LineString, exact: the only permitted
    self-intersection is the shared endpoint of a closed line. Catches
    proper crossings, T-touches (an endpoint or vertex on a non-adjacent
    segment's interior), vertex revisits, and spikes (adjacent backtracks);
    JTS IsSimpleOp semantics."""
    r = _dedup_line(np.asarray(coords, dtype=np.float64))
    n = len(r) - 1
    if n <= 0:
        return True
    closed = np.array_equal(r[0], r[-1])
    s0, s1 = r[:-1], r[1:]
    proper, touch, overlap = _seg_pair_flags(s0, s1, s0, s1)
    diff = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    adjacent = diff <= 1
    if closed:
        adjacent |= diff == n - 1
    if (proper & ~adjacent).any():
        return False
    if ((touch | overlap) & ~adjacent).any():
        return False
    if (overlap & adjacent & (diff > 0)).any():  # spike
        return False
    return True


def multiline_parts_simple(parts) -> bool:
    """OGC MultiLineString simplicity across elements: two parts may meet
    ONLY at points that are boundary points (endpoints) of BOTH (a closed
    element has an empty boundary, so nothing may touch it)."""
    cl = [_dedup_line(np.asarray(c, dtype=np.float64)) for c in parts]
    ends = []
    for r in cl:
        e: set = set()
        if len(r) >= 2 and not np.array_equal(r[0], r[-1]):
            e = {(float(r[0][0]), float(r[0][1])), (float(r[-1][0]), float(r[-1][1]))}
        ends.append(e)
    for i in range(len(cl)):
        for j in range(i + 1, len(cl)):
            A, B = cl[i], cl[j]
            if len(A) < 2 or len(B) < 2:
                continue
            proper, touch, overlap = _seg_pair_flags(A[:-1], A[1:], B[:-1], B[1:])
            if proper.any() or overlap.any():
                return False
            if touch.any() and not _pair_touch_points(A, B, touch) <= (ends[i] & ends[j]):
                return False
    return True


def convex_hull_batch(g) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched convex hull over a whole CSR batch (VERDICT r2 #5: the
    per-row path paid np.unique + np.cross per row).

    ONE global lexsort orders+dedupes every row's points at C speed; the
    per-row monotone chain then runs on plain Python floats (no per-point
    numpy calls). Semantics identical to :func:`convex_hull` per row,
    including the degenerate collinear case.

    Returns (kinds, lens, coords): kinds per row 0=null/empty, 1=Point,
    2=LineString(2pts), 3=Polygon(closed ring); coords concatenated."""
    n = len(g)
    row_ring = g.part_offsets[g.row_offsets]
    row_coord = g.ring_offsets[row_ring]
    counts = np.diff(row_coord)
    rowid = np.repeat(np.arange(n, dtype=np.int64), counts)
    xs = g.coords[:, 0]
    ys = g.coords[:, 1]
    if len(rowid):
        order = np.lexsort((ys, xs, rowid))
        rs, sx, sy = rowid[order], xs[order], ys[order]
        keep = np.concatenate(
            [[True], (rs[1:] != rs[:-1]) | (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1])]
        )
        rs, sx, sy = rs[keep], sx[keep], sy[keep]
    else:
        rs = np.empty(0, dtype=np.int64)
        sx = sy = np.empty(0)
    starts = np.searchsorted(rs, np.arange(n + 1))
    X = sx.tolist()
    Y = sy.tolist()
    missing = g.is_missing
    kinds = np.zeros(n, dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    cx: list[float] = []
    cy: list[float] = []
    for i in range(n):
        s, e = int(starts[i]), int(starts[i + 1])
        m = e - s
        if missing[i] or m == 0:
            continue
        if m == 1:
            kinds[i] = 1
            lens[i] = 1
            cx.append(X[s])
            cy.append(Y[s])
            continue
        if m == 2:
            kinds[i] = 2
            lens[i] = 2
            cx += X[s:e]
            cy += Y[s:e]
            continue
        lo_x: list[float] = []
        lo_y: list[float] = []
        for j in range(s, e):
            px, py = X[j], Y[j]
            while len(lo_x) >= 2 and (lo_x[-1] - lo_x[-2]) * (py - lo_y[-2]) - (
                lo_y[-1] - lo_y[-2]
            ) * (px - lo_x[-2]) <= 0.0:
                lo_x.pop()
                lo_y.pop()
            lo_x.append(px)
            lo_y.append(py)
        up_x: list[float] = []
        up_y: list[float] = []
        for j in range(e - 1, s - 1, -1):
            px, py = X[j], Y[j]
            while len(up_x) >= 2 and (up_x[-1] - up_x[-2]) * (py - up_y[-2]) - (
                up_y[-1] - up_y[-2]
            ) * (px - up_x[-2]) <= 0.0:
                up_x.pop()
                up_y.pop()
            up_x.append(px)
            up_y.append(py)
        rx = lo_x[:-1] + up_x[:-1]
        ry = lo_y[:-1] + up_y[:-1]
        rx.append(rx[0])
        ry.append(ry[0])
        kinds[i] = 3
        lens[i] = len(rx)
        cx += rx
        cy += ry
    coords = np.column_stack([np.asarray(cx), np.asarray(cy)]) if cx else np.empty((0, 2))
    return kinds, lens, coords


def dp_mark(X: list, Y: list, s: int, e: int, tol2: float, keep: np.ndarray) -> None:
    """Douglas-Peucker over the GLOBAL scalar coordinate lists on the
    absolute range [s, e), marking kept indices in ``keep`` in place.
    Identical point selection to :func:`douglas_peucker` (first-max tie
    rule); lets a batched stage simplify every ring of a block without a
    single per-ring array allocation."""
    keep[s] = True
    keep[e - 1] = True
    if e - s <= 2:
        return
    stack = [(s, e - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay = X[a], Y[a]
        sx, sy = X[b] - ax, Y[b] - ay
        L2 = sx * sx + sy * sy
        best = -1.0
        k = -1
        for j in range(a + 1, b):
            rx, ry = X[j] - ax, Y[j] - ay
            if L2 == 0.0:
                d2 = rx * rx + ry * ry
            else:
                t = (rx * sx + ry * sy) / L2
                if t < 0.0:
                    t = 0.0
                elif t > 1.0:
                    t = 1.0
                dx, dy = rx - t * sx, ry - t * sy
                d2 = dx * dx + dy * dy
            if d2 > best:
                best = d2
                k = j
        if best > tol2:
            keep[k] = True
            stack.append((a, k))
            stack.append((k, b))
