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
}


def decode_geoms(batch: pa.Table, col: str = "geometry") -> Geoms:
    return from_wkb(batch.column(col))


def _point_vs_geom_mask(
    pred: str,
    px: np.ndarray,
    py: np.ndarray,
    g: Geoms,
    row: int,
    distance: float | None,
    swapped: bool,
) -> np.ndarray:
    """Predicate for many points (left unless swapped) vs one geometry row."""
    if pred == "dwithin":
        d2 = K.points_to_geom_sqdist(g, row, px, py)
        return d2 <= float(distance) ** 2
    interior, boundary = K.points_in_geom(g, row, px, py)
    if pred in (None, "intersects"):
        return interior | boundary
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
            return np.zeros(len(px), dtype=bool)
    raise ValueError(f"unsupported predicate {pred!r}")


def _pair_predicate(pred: str, lg: Geoms, i: int, rg: Geoms, j: int, distance) -> bool:
    """General (non-point-batch) pairwise predicate."""
    if pred == "dwithin":
        px, py = K._row_points(lg, i)
        # lower bound: vertex-to-geom distance; exact for point/segment pairs
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
    if pred == "contains" or pred == "contains_properly":
        return K.geom_within_geom(rg, j, lg, i)
    if pred == "covers":
        return _covered_by(rg, j, lg, i)
    if pred == "covered_by":
        return _covered_by(lg, i, rg, j)
    if pred == "touches":
        if not K.geom_intersects_geom(lg, i, rg, j):
            return False
        return not _interiors_intersect(lg, i, rg, j)
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
    return False


def eval_pairs(
    pred: str | None,
    lg: Geoms,
    li: np.ndarray,
    rg: Geoms,
    ri: np.ndarray,
    distance: float | None = None,
) -> np.ndarray:
    """Evaluate predicate(left[li[k]], right[ri[k]]) for candidate pairs.

    Vectorized fast path when the batched side is all points: pairs are
    grouped by the geometry row and all its candidate points are tested in
    one kernel call (the hot path: document points vs zone polygons).
    """
    if pred not in VALID_PREDICATES:
        raise ValueError(
            f"`predicate` = `{pred}` not a supported option; use one of {sorted(map(str, VALID_PREDICATES))}"
        )
    n = len(li)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    if lg.all_points:
        order = np.argsort(ri, kind="stable")
        li_s, ri_s = li[order], ri[order]
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
            res[s:e] = _point_vs_geom_mask(pred, px[s:e], py[s:e], rg, j, distance, swapped=False)
        out[order] = res
        return out
    if rg.all_points:
        order = np.argsort(li, kind="stable")
        li_s, ri_s = li[order], ri[order]
        ci = rg.ring_offsets[rg.part_offsets[rg.row_offsets[ri_s]]]
        px = rg.coords[:, 0][ci]
        py = rg.coords[:, 1][ci]
        bounds_idx = np.nonzero(np.diff(li_s))[0] + 1
        starts = np.concatenate([[0], bounds_idx])
        ends = np.concatenate([bounds_idx, [n]])
        res = np.empty(n, dtype=bool)
        for s, e in zip(starts, ends):
            i = int(li_s[s])
            res[s:e] = _point_vs_geom_mask(pred, px[s:e], py[s:e], lg, i, distance, swapped=True)
        out[order] = res
        return out
    for k in range(n):
        out[k] = _pair_predicate(pred, lg, int(li[k]), rg, int(ri[k]), distance)
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
