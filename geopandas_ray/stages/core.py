"""Shared batch utilities + pair-predicate evaluation for the join stages.

Predicate names and their meaning follow the reference's valid-predicate set
(geopandas/sindex.py:6-8: intersects, within, contains, contains_properly,
covers, covered_by, crosses, overlaps, touches, dwithin) evaluated as
predicate(left_geometry, right_geometry) per sindex.py:81-87.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import kernels as K
from ..geom.wkb import Geoms, MULTIPOINT, POINT, from_wkb

VALID_PREDICATES = {
    None,
    "intersects",
    "within",
    "contains",
    "contains_properly",
    "covers",
    "covered_by",
    "touches",
    "dwithin",
    "geom_equals",
    "crosses",
    "overlaps",
    "disjoint",
}

# disjoint is complement-shaped: a bbox-candidate search CANNOT drive it
# (the matches are exactly the pairs a bbox tree prunes), so joins reject it
# while the element-wise binary_predicate path accepts it.
JOIN_PREDICATES = VALID_PREDICATES - {"disjoint"}


def _row_dim(g: Geoms, i: int) -> int:
    """Topological dimension of row i (0 puntal, 1 lineal, 2 polygonal)."""
    t = int(g.row_types[i])
    return 0 if t in (1, 4) else (1 if t in (2, 5) else 2)


def _de9im_match(m: str, pattern: str) -> bool:
    return all(
        p == "*" or (p == "T" and c in "012") or p == c for p, c in zip(pattern, m)
    )


def decode_geoms(batch: pa.Table, col: str = "geometry") -> Geoms:
    return from_wkb(batch.column(col))


def bbox_equiv_mask(g: Geoms) -> np.ndarray:
    """Rows whose geometry IS its bounding box: single Points and
    axis-aligned single-ring rectangle Polygons.

    For such rows every supported predicate evaluates from bounds alone,
    which turns the per-pair loop into pure vectorized math - the dominant
    case in the tiling/zone workloads (points vs rectangular zones/tiles).
    """
    n = len(g)
    out = np.zeros(n, dtype=bool)
    ok = ~(g.is_missing | g.is_empty)
    out |= (g.row_types == POINT) & ok
    # candidate rect rows: single part, polygon, single 5-coord ring
    nparts = g.row_offsets[1:] - g.row_offsets[:-1]
    cand = ok & (g.row_types == 3) & (nparts == 1)
    if cand.any():
        p_idx = g.row_offsets[:-1].copy()
        idx = np.nonzero(cand)[0]
        p = p_idx[idx]
        single_ring = (g.part_offsets[p + 1] - g.part_offsets[p]) == 1
        idx = idx[single_ring]
        p = p[single_ring]
        r = g.part_offsets[p]
        c0 = g.ring_offsets[r]
        five = (g.ring_offsets[r + 1] - c0) == 5
        idx = idx[five]
        c0 = c0[five]
        if len(idx):
            gather = c0[:, None] + np.arange(5)[None, :]
            cx = g.coords[:, 0][gather]
            cy = g.coords[:, 1][gather]
            minx, maxx = cx.min(axis=1), cx.max(axis=1)
            miny, maxy = cy.min(axis=1), cy.max(axis=1)
            on_corner = ((cx == minx[:, None]) | (cx == maxx[:, None])) & (
                (cy == miny[:, None]) | (cy == maxy[:, None])
            )
            closed = (cx[:, 0] == cx[:, 4]) & (cy[:, 0] == cy[:, 4])
            # consecutive vertices differ in exactly one axis (proper ring)
            step_x = cx[:, 1:] != cx[:, :-1]
            step_y = cy[:, 1:] != cy[:, :-1]
            proper = (step_x ^ step_y).all(axis=1)
            nondeg = (maxx > minx) & (maxy > miny)
            is_rect = on_corner.all(axis=1) & closed & proper & nondeg
            out[idx[is_rect]] = True
    return out


def _dist_take(distance, idx):
    """Per-pair distance selection: dwithin ``distance`` may be a scalar or
    a PER-PAIR float array (reference base.py:2294-2297 accepts an array
    aligned elementwise; here per-row data rides the batch as a column and
    callers gather it per pair). Scalars pass through, arrays index."""
    if isinstance(distance, np.ndarray):
        return distance[idx]
    return distance


def eval_pairs_bbox(
    pred: str | None,
    lb: np.ndarray,
    l_is_point: np.ndarray,
    rb: np.ndarray,
    distance,
) -> np.ndarray:
    """Vectorized predicates for bbox-equivalent pair arrays.

    lb/rb: (k,4) bounds of the left/right element of each pair.
    l_is_point: (k,) whether the left element is a point (degenerate box) -
    needed because `within` excludes boundary contact for points.
    ``distance`` (dwithin only): scalar or per-pair (k,) array.
    """
    ox = np.minimum(lb[:, 2], rb[:, 2]) - np.maximum(lb[:, 0], rb[:, 0])
    oy = np.minimum(lb[:, 3], rb[:, 3]) - np.maximum(lb[:, 1], rb[:, 1])
    overlap = (ox >= 0) & (oy >= 0)
    if pred in (None, "intersects"):
        return overlap
    if pred == "disjoint":
        return ~overlap
    if pred == "dwithin":
        dx = np.maximum(np.maximum(rb[:, 0] - lb[:, 2], lb[:, 0] - rb[:, 2]), 0.0)
        dy = np.maximum(np.maximum(rb[:, 1] - lb[:, 3], lb[:, 1] - rb[:, 3]), 0.0)
        d = np.asarray(distance, dtype=np.float64)  # scalar or per-pair
        return dx * dx + dy * dy <= d * d
    inside_closed = (
        (lb[:, 0] >= rb[:, 0]) & (lb[:, 2] <= rb[:, 2]) & (lb[:, 1] >= rb[:, 1]) & (lb[:, 3] <= rb[:, 3])
    )
    inside_strict = (
        (lb[:, 0] > rb[:, 0]) & (lb[:, 2] < rb[:, 2]) & (lb[:, 1] > rb[:, 1]) & (lb[:, 3] < rb[:, 3])
    )
    contains_closed = (
        (rb[:, 0] >= lb[:, 0]) & (rb[:, 2] <= lb[:, 2]) & (rb[:, 1] >= lb[:, 1]) & (rb[:, 3] <= lb[:, 3])
    )
    contains_strict = (
        (rb[:, 0] > lb[:, 0]) & (rb[:, 2] < lb[:, 2]) & (rb[:, 1] > lb[:, 1]) & (rb[:, 3] < lb[:, 3])
    )
    r_is_point = (rb[:, 0] == rb[:, 2]) & (rb[:, 1] == rb[:, 3])
    equal_pts = (
        l_is_point & r_is_point & (lb[:, 0] == rb[:, 0]) & (lb[:, 1] == rb[:, 1])
    )
    if pred == "within":
        # a point on the boundary of r is NOT within; a rect sharing an edge
        # is; a point within an equal point is
        return np.where(l_is_point, inside_strict | equal_pts, inside_closed)
    if pred == "covered_by":
        return inside_closed
    if pred == "contains":
        return np.where(r_is_point, contains_strict | equal_pts, contains_closed)
    if pred == "covers":
        return contains_closed
    if pred == "contains_properly":
        return np.where(r_is_point, contains_strict | equal_pts, contains_strict)
    if pred == "geom_equals":
        # bbox-equivalent rows ARE their bounds: spatially equal iff equal
        # bounds AND same dimensionality (a point is not equal to a
        # degenerate-empty rect; rects here always have positive extent)
        return inside_closed & contains_closed & (l_is_point == r_is_point)
    if pred == "touches":
        # touches = intersects but interiors disjoint; a degenerate box (a
        # point) has zero overlap width by construction, so its interior
        # test is strict containment instead of zero-width overlap
        interiors = np.where(
            l_is_point & r_is_point,
            equal_pts,  # two points intersect only via their interiors
            np.where(
                l_is_point,
                inside_strict,
                np.where(r_is_point, contains_strict, (ox > 0) & (oy > 0)),
            ),
        )
        return overlap & ~interiors
    if pred == "crosses":
        # crosses needs dim(A∩B) < max(dim A, dim B) with interiors meeting
        # on both sides' interior AND exterior; no point/rect combination can
        # satisfy it (single points have no splittable interior, equal-dim
        # rects never cross)
        return np.zeros(len(lb), dtype=bool)
    if pred == "overlaps":
        # same-dimension partial interior overlap: only rect x rect can
        # qualify; interiors must meet (positive-area overlap) and neither
        # may cover the other
        return (
            ~l_is_point & ~r_is_point & (ox > 0) & (oy > 0)
            & ~inside_closed & ~contains_closed
        )
    raise ValueError(f"unsupported predicate {pred!r}")


def _point_vs_geom_mask(
    pred: str,
    px: np.ndarray,
    py: np.ndarray,
    g: Geoms,
    row: int,
    distance: float | None,
    swapped: bool,
) -> np.ndarray:
    """Predicate for many points (left unless swapped) vs one geometry row.

    ``distance`` (dwithin): scalar or a per-point array aligned with px/py."""
    if pred == "dwithin":
        d2 = K.points_to_geom_sqdist(g, row, px, py)
        d = np.asarray(distance, dtype=np.float64)
        return d2 <= d * d
    interior, boundary = K.points_in_geom(g, row, px, py)
    if pred in (None, "intersects"):
        return interior | boundary
    if pred == "disjoint":
        return ~(interior | boundary)
    if pred in ("crosses", "overlaps"):
        # a single point can never cross anything (its interior cannot lie
        # both inside and outside the partner) and never overlaps (either
        # II or IE/EI is empty for every partner dimension)
        return np.zeros(len(px), dtype=bool)
    if pred == "geom_equals":
        # a point equals a geometry only when that geometry is spatially the
        # same single point (base.py:2391 spatial equality)
        if int(g.row_types[row]) in (POINT, MULTIPOINT) and not (
            g.is_empty[row] or g.is_missing[row]
        ):
            gx, gy = K._row_points(g, row)
            if len(np.unique(np.column_stack([gx, gy]), axis=0)) == 1:
                return (px == gx[0]) & (py == gy[0])
        return np.zeros(len(px), dtype=bool)
    if not swapped:
        # point <pred> geom
        if pred == "within":
            return interior
        if pred == "covered_by":
            return interior | boundary
        if pred == "touches":
            return boundary
        if pred in ("contains", "contains_properly", "covers"):
            # a point can only contain/cover a geometry that is an equal point
            if int(g.row_types[row]) == POINT and not (g.is_empty[row] or g.is_missing[row]):
                c = g.ring_coords(g.part_ring_range(int(g.row_offsets[row]))[0])
                return (px == c[0, 0]) & (py == c[0, 1])
            return np.zeros(len(px), dtype=bool)
    else:
        # geom <pred> point
        if pred == "contains":
            return interior
        if pred == "contains_properly":
            return interior
        if pred == "covers":
            return interior | boundary
        if pred == "touches":
            return boundary
        if pred in ("within", "covered_by"):
            # geom within/covered_by a point: only an equal point qualifies
            if int(g.row_types[row]) == POINT and not (g.is_empty[row] or g.is_missing[row]):
                c = g.ring_coords(g.part_ring_range(int(g.row_offsets[row]))[0])
                return (px == c[0, 0]) & (py == c[0, 1])
            return np.zeros(len(px), dtype=bool)
    raise ValueError(f"unsupported predicate {pred!r}")


def _pair_predicate(pred: str, lg: Geoms, i: int, rg: Geoms, j: int, distance) -> bool:
    """General (non-point-batch) pairwise predicate."""
    if pred == "dwithin":
        # distance 0 the moment anything intersects (vertex checks alone
        # miss boundary crossings where no vertex is near the other shape)
        if K.geom_intersects_geom(lg, i, rg, j):
            return True
        px, py = K._row_points(lg, i)
        d2 = K.points_to_geom_sqdist(rg, j, px, py)
        if (d2 <= float(distance) ** 2).any():
            return True
        qx, qy = K._row_points(rg, j)
        d2b = K.points_to_geom_sqdist(lg, i, qx, qy)
        return bool((d2b <= float(distance) ** 2).any())
    if pred in (None, "intersects"):
        return K.geom_intersects_geom(lg, i, rg, j)
    if pred == "within":
        return K.geom_within_geom(lg, i, rg, j)
    if pred == "contains":
        return K.geom_within_geom(rg, j, lg, i)
    if pred == "contains_properly":
        # no boundary contact at all: every vertex of r strictly interior to
        # l and no boundary crossing (exact for convex l)
        qx, qy = K._row_points(rg, j)
        inter, _ = K.points_in_geom(lg, i, qx, qy)
        if not inter.all():
            return False
        return not K._proper_cross(K._segments_of_row(lg, i), K._segments_of_row(rg, j))
    if pred == "covers":
        return _covered_by(rg, j, lg, i)
    if pred == "covered_by":
        return _covered_by(lg, i, rg, j)
    if pred == "touches":
        if not K.geom_intersects_geom(lg, i, rg, j):
            return False
        return not _interiors_intersect(lg, i, rg, j)
    if pred == "geom_equals":
        # spatial equality = mutual containment (base.py:2391); exact for
        # the same geometry families geom_within_geom is exact for
        return K.geom_within_geom(lg, i, rg, j) and K.geom_within_geom(rg, j, lg, i)
    if pred == "disjoint":
        return not K.geom_intersects_geom(lg, i, rg, j)
    if pred in ("crosses", "overlaps"):
        # DE-9IM definitions (OGC SFA 6.1.15.3) evaluated off the full relate
        # matrix the engine already computes for every type-pair family
        from .binary import relate_pair  # lazy: binary.py imports this module

        m = relate_pair(lg, i, rg, j)
        if m is None:
            return False
        da, db = _row_dim(lg, i), _row_dim(rg, j)
        if pred == "crosses":
            if da < db:
                return _de9im_match(m, "T*T******")
            if da > db:
                return _de9im_match(m, "T*****T**")
            if da == 1:
                return m[0] == "0"  # line/line: point intersection only
            return False
        if da != db:
            return False
        return _de9im_match(m, "1*T***T**" if da == 1 else "T*T***T**")
    raise ValueError(f"unsupported predicate {pred!r}")


def _covered_by(ga: Geoms, ia: int, gb: Geoms, ib: int) -> bool:
    """Every point of a lies in b (boundary allowed)."""
    px, py = K._row_points(ga, ia)
    inter, bound = K.points_in_geom(gb, ib, px, py)
    if not (inter | bound).all():
        return False
    sa = K._segments_of_row(ga, ia)
    sb = K._segments_of_row(gb, ib)
    return not K._proper_cross(sa, sb)


def _interiors_intersect(ga: Geoms, ia: int, gb: Geoms, ib: int) -> bool:
    """Approximate interior-interior test for the touches predicate: proper
    boundary crossing, or a vertex of one strictly interior to the other."""
    sa = K._segments_of_row(ga, ia)
    sb = K._segments_of_row(gb, ib)
    if K._proper_cross(sa, sb):
        return True
    for g1, i1, g2, i2 in ((ga, ia, gb, ib), (gb, ib, ga, ia)):
        px, py = K._row_points(g1, i1)
        inter, _ = K.points_in_geom(g2, i2, px, py)
        if inter.any():
            return True
        # no vertex strictly inside (equal / edge-aligned shapes): probe a
        # representative interior point (centroid; exact for convex parts)
        cx, cy = K.centroid(g1.take([i1]))
        if not np.isnan(cx[0]):
            i2m, _ = K.points_in_geom(g2, i2, np.array([cx[0]]), np.array([cy[0]]))
            if i2m[0]:
                return True
    # partial edge-aligned overlaps: probe the bbox-overlap midpoint (exact
    # for axis-aligned rectangles, best-effort otherwise)
    ba = K.bounds(ga.take([ia]))[0]
    bb = K.bounds(gb.take([ib]))[0]
    mx = (max(ba[0], bb[0]) + min(ba[2], bb[2])) / 2.0
    my = (max(ba[1], bb[1]) + min(ba[3], bb[3])) / 2.0
    pa_, _ = K.points_in_geom(ga, ia, np.array([mx]), np.array([my]))
    pb_, _ = K.points_in_geom(gb, ib, np.array([mx]), np.array([my]))
    return bool(pa_[0] and pb_[0])


def eval_pairs(
    pred: str | None,
    lg: Geoms,
    li: np.ndarray,
    rg: Geoms,
    ri: np.ndarray,
    distance: float | None = None,
    l_bounds: np.ndarray | None = None,
    r_bounds: np.ndarray | None = None,
    l_bbox_equiv: np.ndarray | None = None,
    r_bbox_equiv: np.ndarray | None = None,
) -> np.ndarray:
    """Evaluate predicate(left[li[k]], right[ri[k]]) for candidate pairs.

    Three tiers, fastest first:
    1. pairs where BOTH rows are bbox-equivalent (point / axis-aligned rect):
       one vectorized bounds computation for the whole pair array;
    2. the batched side is all points: pairs grouped by the other row, one
       kernel call per geometry over all its candidate points;
    3. per-pair general kernels.
    Callers that hold precomputed bounds / bbox-equiv masks (broadcast
    actors) pass them in to skip recomputation per batch.

    ``distance`` (dwithin): a scalar, or a PER-PAIR (n,) float array
    (base.py:2294-2297 array-valued distance) — every tier selects its
    sub-pairs from it via _dist_take.
    """
    if pred not in VALID_PREDICATES:
        raise ValueError(
            f"`predicate` = `{pred}` not a supported option; use one of {sorted(map(str, VALID_PREDICATES))}"
        )
    n = len(li)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out

    # -- tier 1: bbox-equivalent pair fast path
    if l_bbox_equiv is None:
        l_bbox_equiv = bbox_equiv_mask(lg)
    if r_bbox_equiv is None:
        r_bbox_equiv = bbox_equiv_mask(rg)
    fast = l_bbox_equiv[li] & r_bbox_equiv[ri]
    if fast.any():
        from ..geom import kernels as _K

        if l_bounds is None:
            l_bounds = _K.bounds(lg)
        if r_bounds is None:
            r_bounds = _K.bounds(rg)
        lf, rf = li[fast], ri[fast]
        out[fast] = eval_pairs_bbox(
            pred,
            l_bounds[lf],
            (lg.row_types[lf] == POINT),
            r_bounds[rf],
            _dist_take(distance, fast),
        )
        if fast.all():
            return out
        rest = ~fast
        sub = eval_pairs(
            pred,
            lg,
            li[rest],
            rg,
            ri[rest],
            _dist_take(distance, rest),
            l_bounds=l_bounds,
            r_bounds=r_bounds,
            l_bbox_equiv=l_bbox_equiv,  # tier 1 finds nothing on the rest;
            r_bbox_equiv=r_bbox_equiv,  # tier 1.5 (one-side rect) still can
        )
        out[rest] = sub
        return out
    # -- tier 1.5: exactly one side is an axis-aligned rect (non-point):
    # one vectorized geometry-vs-rect pass (the polyfill / tile hot path)
    if pred == "intersects":
        r_rect = r_bbox_equiv[ri] & (rg.row_types[ri] != POINT)
        l_rect = l_bbox_equiv[li] & (lg.row_types[li] != POINT) & ~r_rect
        if r_rect.any() or l_rect.any():
            from ..geom import kernels as _K

            if l_bounds is None:
                l_bounds = _K.bounds(lg)
            if r_bounds is None:
                r_bounds = _K.bounds(rg)
            if r_rect.any():
                out[r_rect] = _K.pairs_intersect_rects(
                    lg, li[r_rect], r_bounds[ri[r_rect]]
                )
            if l_rect.any():
                out[l_rect] = _K.pairs_intersect_rects(
                    rg, ri[l_rect], l_bounds[li[l_rect]]
                )
            done = r_rect | l_rect
            if done.all():
                return out
            rest = ~done
            out[rest] = eval_pairs(
                pred,
                lg,
                li[rest],
                rg,
                ri[rest],
                _dist_take(distance, rest),
                l_bounds=l_bounds,
                r_bounds=r_bounds,
                l_bbox_equiv=np.zeros(len(lg), dtype=bool),  # force slow tiers
                r_bbox_equiv=np.zeros(len(rg), dtype=bool),
            )
            return out
    if lg.all_points:
        order = np.argsort(ri, kind="stable")
        li_s, ri_s = li[order], ri[order]
        d_s = _dist_take(distance, order)
        # row -> coord index (rows with missing/empty geometry contribute no
        # coords, so a direct coords[row] gather would be misaligned)
        ci = lg.ring_offsets[lg.part_offsets[lg.row_offsets[li_s]]]
        px = lg.coords[:, 0][ci]
        py = lg.coords[:, 1][ci]
        bounds_idx = np.nonzero(np.diff(ri_s))[0] + 1
        starts = np.concatenate([[0], bounds_idx])
        ends = np.concatenate([bounds_idx, [n]])
        res = np.empty(n, dtype=bool)
        for s, e in zip(starts, ends):
            j = int(ri_s[s])
            res[s:e] = _point_vs_geom_mask(
                pred, px[s:e], py[s:e], rg, j, _dist_take(d_s, slice(s, e)), swapped=False
            )
        out[order] = res
        return out
    if rg.all_points:
        order = np.argsort(li, kind="stable")
        li_s, ri_s = li[order], ri[order]
        d_s = _dist_take(distance, order)
        ci = rg.ring_offsets[rg.part_offsets[rg.row_offsets[ri_s]]]
        px = rg.coords[:, 0][ci]
        py = rg.coords[:, 1][ci]
        bounds_idx = np.nonzero(np.diff(li_s))[0] + 1
        starts = np.concatenate([[0], bounds_idx])
        ends = np.concatenate([bounds_idx, [n]])
        res = np.empty(n, dtype=bool)
        for s, e in zip(starts, ends):
            i = int(li_s[s])
            res[s:e] = _point_vs_geom_mask(
                pred, px[s:e], py[s:e], lg, i, _dist_take(d_s, slice(s, e)), swapped=True
            )
        out[order] = res
        return out
    for k in range(n):
        out[k] = _pair_predicate(pred, lg, int(li[k]), rg, int(ri[k]), _dist_take(distance, k))
    return out


# ---------------------------------------------------------------------------
# column-name plumbing (reference tools/sjoin.py:174-224)
# ---------------------------------------------------------------------------


def suffixed_columns(
    left_names: list[str],
    right_names: list[str],
    lsuffix: str = "left",
    rsuffix: str = "right",
    geometry: str = "geometry",
) -> tuple[dict[str, str], dict[str, str]]:
    """Rename maps for overlapping non-geometry column names."""
    overlap = (set(left_names) & set(right_names)) - {geometry}
    lmap = {c: (f"{c}_{lsuffix}" if c in overlap else c) for c in left_names}
    rmap = {c: (f"{c}_{rsuffix}" if c in overlap else c) for c in right_names}
    return lmap, rmap
