"""Binary element-wise geometry ops between two columns of ONE table
(SURVEY.md §2.3): the row-aligned case. Two-dataset alignment is a zip-join
on the row-id column upstream (hash shuffle on id) - in practice pipelines
keep both geometry columns in one table, making every op here a single
stateless map_batches.

Scalar ``other`` (one broadcast geometry) is also supported: pass WKB bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.wkb import Geoms, from_wkb, to_wkb
from .core import _pair_predicate, bbox_equiv_mask, eval_pairs


def _two_sides(b: pa.Table, geometry, other):
    lg = from_wkb(b.column(geometry))
    if isinstance(other, bytes):
        og = from_wkb([other] * 0 + [other])  # single row
        ri = np.zeros(len(lg), dtype=np.int64)
        rg = og
    else:
        rg = from_wkb(b.column(other))
        ri = np.arange(len(lg), dtype=np.int64)
    return lg, rg, ri


def binary_predicate(
    ds: ray.data.Dataset,
    predicate: str,
    other,
    geometry: str = "geometry",
    distance: float | str | None = None,
    out: str | None = None,
):
    """contains/within/intersects/... as a bool column (base.py:2043-3407).

    ``other``: a second geometry column name, or WKB bytes for broadcast.
    ``distance`` (dwithin, base.py:2294-2297): a scalar, or a COLUMN NAME
    for per-row radii (the distributed analog of the reference's
    elementwise-aligned array). Missing rows on either side evaluate False
    (GEOS semantics)."""
    out = out or predicate

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        li = np.arange(len(lg), dtype=np.int64)
        ok = ~(lg.is_missing | lg.is_empty) & ~(rg.is_missing[ri] | rg.is_empty[ri])
        res = np.zeros(len(lg), dtype=bool)
        if ok.any():
            d = distance
            if isinstance(d, str):
                # null radii -> NaN -> dwithin False for that row
                d = b.column(d).to_numpy(zero_copy_only=False).astype(np.float64)[li[ok]]
            res[ok] = eval_pairs(predicate, lg, li[ok], rg, ri[ok], d)
        return b.append_column(out, pa.array(res))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_distance(
    ds: ray.data.Dataset, other, geometry: str = "geometry", out: str = "distance"
):
    """base.py:3521 row-aligned distance."""

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        n = len(lg)
        d = np.full(n, np.nan)
        for i in range(n):
            if lg.is_missing[i] or lg.is_empty[i]:
                continue
            j = int(ri[i])
            if rg.is_missing[j] or rg.is_empty[j]:
                continue
            px, py = K._row_points(lg, i)
            d2 = K.points_to_geom_sqdist(rg, j, px, py)
            qx, qy = K._row_points(rg, j)
            d2b = K.points_to_geom_sqdist(lg, i, qx, qy)
            best = min(d2.min(), d2b.min())
            if best > 0 and K.geom_intersects_geom(lg, i, rg, j):
                best = 0.0
            d[i] = np.sqrt(best)
        return b.append_column(out, pa.array(d))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_intersection(
    ds: ray.data.Dataset, other, geometry: str = "geometry", out: str = "intersection"
):
    """base.py:4192 row-aligned pairwise intersection geometry (general
    simple polygons via the slab-sweep boolean kernel; point/line layers
    clip against polygonal partners - same kernel as overlay)."""
    from .overlay import pair_intersection_wkb

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.is_missing[i] or rg.is_missing[j]:
                vals.append(None)
                continue
            if not K.geom_intersects_geom(lg, i, rg, j):
                vals.append(None)
                continue
            vals.append(pair_intersection_wkb(lg, i, rg, j))
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_difference(
    ds: ray.data.Dataset, other, geometry: str = "geometry", out: str = "difference"
):
    """base.py:3852 row-aligned difference (general simple polygons via
    the slab-sweep boolean kernel, like overlay's difference leg)."""
    from .overlay import pair_difference_wkb

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        ow = b.column(other) if isinstance(other, str) else None
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.is_missing[i]:
                vals.append(None)
                continue
            if rg.is_missing[j] or not K.geom_intersects_geom(lg, i, rg, j):
                vals.append(to_wkb(lg.take([i]))[0].as_py())
                continue
            partner = ow[j].as_py() if ow is not None else other
            vals.append(pair_difference_wkb(lg, i, [partner]))
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_union(
    ds: ray.data.Dataset, other, geometry: str = "geometry", out: str = "union"
):
    """base.py:4078 row-aligned union (collects / merges rect regions)."""
    from ..geom.union import union_wkb_values

    def f(b: pa.Table) -> pa.Table:
        lw = b.column(geometry)
        ow = b.column(other) if isinstance(other, str) else None
        vals = []
        for i in range(len(b)):
            a = lw[i].as_py()
            o = ow[i].as_py() if ow is not None else other
            vals.append(union_wkb_values([a, o]))
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


_DIM = {1: 0, 4: 0, 2: 1, 5: 1, 3: 2, 6: 2}


def _row_parts(g, idx: int) -> list[tuple[int, list[np.ndarray]]]:
    """Row ``idx`` as the [(base_type, rings)] structure _parts_to_wkb takes."""
    parts = []
    p0, p1 = g.row_part_range(idx)
    for p in range(p0, p1):
        r0, r1 = g.part_ring_range(p)
        rings = [g.ring_coords(r) for r in range(r0, r1)]
        parts.append((int(g.part_types[p]), rings))
    return parts


# shared with geom/union.py's exact line union and overlay's line legs
from ..geom.booleans import segments_minus as _segments_minus  # noqa: E402


def _pt_on_collinear_segs(x: float, y: float, segs: list[tuple]) -> bool:
    """True when (x, y) lies on any of the given [x0,y0,x1,y1] segments
    (exact arithmetic; used to drop crossing points already covered by a
    dimension-1 overlap in line/line intersection)."""
    for x0, y0, x1, y1 in segs:
        if (x1 - x0) * (y - y0) - (y1 - y0) * (x - x0) == 0:
            if min(x0, x1) <= x <= max(x0, x1) and min(y0, y1) <= y <= max(y0, y1):
                return True
    return False


def binary_symmetric_difference(
    ds: ray.data.Dataset, other, geometry: str = "geometry", out: str = "symmetric_difference"
):
    """base.py:3958 row-aligned symmetric difference, all type-pair families:

    - point/point: coordinate-set XOR
    - polygon/polygon: slab-sweep boolean kernel
    - line/line: 1-D interval subtraction of collinear overlaps both ways
      (point-set equal to GEOS; linestrings are not re-merged/noded at
      crossings, so the PARTITION into segments can differ from GEOS while
      covering the identical point set)
    - mixed dimension: GC(higher-dim geometry, lower-dim parts outside it)
      — GEOS drops the lower-dim operand's covered portion and keeps the
      higher-dim operand whole; parts are emitted higher-dimension first
      (OverlayNG result order)

    A missing side passes the other through, GEOS-style."""
    import struct

    from ..geom.booleans import polygon_boolean
    from .clip import _parts_to_wkb

    empty = struct.pack("<BII", 1, 3, 0)  # POLYGON EMPTY
    empty_line = struct.pack("<BII", 1, 2, 0)  # LINESTRING EMPTY

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            l_mis = bool(lg.is_missing[i])
            r_mis = bool(rg.is_missing[j])
            if l_mis and r_mis:
                vals.append(None)
                continue
            if l_mis or r_mis:
                src, row = (rg, j) if l_mis else (lg, i)
                vals.append(to_wkb(src.take([row]))[0].as_py())
                continue
            tl, tr = int(lg.row_types[i]), int(rg.row_types[j])
            if tl in (1, 4) and tr in (1, 4):
                ax, ay = K._row_points(lg, i)
                bx, by = K._row_points(rg, j)
                a = {(float(x), float(y)) for x, y in zip(ax, ay)}
                bset = {(float(x), float(y)) for x, y in zip(bx, by)}
                keep = sorted(a ^ bset)
                vals.append(
                    _parts_to_wkb([(1, [np.array([[x, y]])]) for x, y in keep])
                    if keep
                    else empty
                )
                continue
            if tl in (3, 6) and tr in (3, 6):
                polys = polygon_boolean(lg, i, rg, j, "symmetric_difference")
                vals.append(
                    _parts_to_wkb([(3, rings) for rings in polys]) if polys else empty
                )
                continue
            if tl == 7 or tr == 7:
                # GEOS OverlayOp rejects GeometryCollection operands
                raise ValueError(
                    "symmetric_difference does not support GeometryCollection operands"
                )
            if tl in (2, 5) and tr in (2, 5):
                sa = K._segments_of_row(lg, i)
                sb = K._segments_of_row(rg, j)
                rem = _segments_minus(sa, sb) + _segments_minus(sb, sa)
                vals.append(_mls_wkb(rem) if rem else empty_line)
                continue
            # mixed dimension: lower-dim operand minus higher-dim operand,
            # collected with the higher-dim operand (kept whole)
            from .overlay import pair_difference_wkb

            lo_g, lo_i, hi_g, hi_i = (
                (lg, i, rg, j) if _DIM[tl] < _DIM[tr] else (rg, j, lg, i)
            )
            hi_wkb = to_wkb(hi_g.take([hi_i]))[0].as_py()
            low_rem = pair_difference_wkb(lo_g, lo_i, [hi_wkb])
            if low_rem is None:
                vals.append(hi_wkb)
            else:
                rem_g = from_wkb([low_rem])
                vals.append(_parts_to_wkb(_row_parts(hi_g, hi_i) + _row_parts(rem_g, 0)))
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def _shared_subsegments(sa: np.ndarray, sb: np.ndarray):
    """Collinear overlapping portions between segment sets ``sa``/``sb``
    ((S,4) arrays of [x0,y0,x1,y1]).

    Returns (same, opposite): lists of (ax, ay, bx, by) sub-segments of
    ``sa``'s linework that coincide with some segment of ``sb``, split by
    relative direction. Per-a-segment 1-D intervals are merged so stacked
    partner segments don't duplicate linework (GEOS SharedPaths returns
    the noded union of the shared linework)."""
    same: list[tuple] = []
    opp: list[tuple] = []
    if len(sa) == 0 or len(sb) == 0:
        return same, opp
    bx0, by0, bx1, by1 = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
    dbx, dby = bx1 - bx0, by1 - by0
    for ax0, ay0, ax1, ay1 in sa:
        dax, day = ax1 - ax0, ay1 - ay0
        L2 = dax * dax + day * day
        if L2 == 0:
            continue
        # collinear <=> both b endpoints lie on the infinite line of a
        c0 = dax * (by0 - ay0) - day * (bx0 - ax0)
        c1 = dax * (by1 - ay0) - day * (bx1 - ax0)
        col = (c0 == 0) & (c1 == 0)
        if not col.any():
            continue
        t0 = ((bx0 - ax0) * dax + (by0 - ay0) * day) / L2
        t1 = ((bx1 - ax0) * dax + (by1 - ay0) * day) / L2
        fwd = dax * dbx + day * dby > 0
        ivals: dict[bool, list] = {True: [], False: []}
        for j in np.nonzero(col)[0]:
            lo = max(0.0, min(t0[j], t1[j]))
            hi = min(1.0, max(t0[j], t1[j]))
            if hi > lo:
                ivals[bool(fwd[j])].append((lo, hi))
        for direction, pairs in ivals.items():
            if not pairs:
                continue
            pairs.sort()
            merged = [list(pairs[0])]
            for lo, hi in pairs[1:]:
                if lo <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], hi)
                else:
                    merged.append([lo, hi])
            out = same if direction else opp
            for lo, hi in merged:
                out.append(
                    (ax0 + lo * dax, ay0 + lo * day, ax0 + hi * dax, ay0 + hi * day)
                )
    return same, opp


def _mls_wkb(segs: list[tuple]) -> bytes:
    import struct

    buf = struct.pack("<BII", 1, 5, len(segs))
    for ax, ay, bx, by in segs:
        buf += struct.pack("<BII", 1, 2, 2) + np.array(
            [ax, ay, bx, by], dtype="<f8"
        ).tobytes()
    return buf


def binary_shared_paths(
    ds: ray.data.Dataset, other, geometry="geometry", out="shared_paths"
):
    """base.py:4574 - shared linework between two (multi)linestrings, as
    GEOMETRYCOLLECTION(MULTILINESTRING same-direction, MULTILINESTRING
    opposite-direction) per GEOS SharedPaths. Exact where shared portions
    are collinear segment overlaps (the float-representable case; GEOS's
    snap-rounding noding beyond that is out of in-sandbox scope)."""
    import struct

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.is_missing[i] or rg.is_missing[j]:
                vals.append(None)
                continue
            if int(lg.row_types[i]) not in (2, 5) or int(rg.row_types[j]) not in (2, 5):
                vals.append(None)  # GEOS raises for non-lineal input
                continue
            sa = K._segments_of_row(lg, i)
            sb = K._segments_of_row(rg, j)
            same, opp = _shared_subsegments(sa, sb)
            vals.append(
                struct.pack("<BII", 1, 7, 2) + _mls_wkb(same) + _mls_wkb(opp)
            )
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_hausdorff(ds: ray.data.Dataset, other, geometry="geometry", out="hausdorff_distance", densify: float | None = None):
    """base.py:3617 row-aligned Hausdorff distance, GEOS discrete-algorithm
    parity for all types; ``densify`` (fraction of each segment) inserts
    vertices first, as in shapely - see kernels.hausdorff_distance_pair."""

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        n = len(lg)
        d = np.full(n, np.nan)
        for i in range(n):
            j = int(ri[i])
            if lg.is_missing[i] or rg.is_missing[j]:
                continue
            d[i] = K.hausdorff_distance_pair(lg, i, rg, j, densify=densify)
        return b.append_column(out, pa.array(d))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_shortest_line(ds: ray.data.Dataset, other, geometry="geometry", out="shortest_line"):
    """base.py:4370 - the 2-point LineString connecting the nearest pair
    (source point chosen among vertices; exact for point/segment/convex
    pairs by vertex-attainment of the nearest pair)."""
    import struct

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.is_missing[i] or rg.is_missing[j]:
                vals.append(None)
                continue
            if K.geom_intersects_geom(lg, i, rg, j):
                # degenerate: zero-length line at any shared point
                px, py = K._row_points(lg, i)
                inter, bound = K.points_in_geom(rg, j, px, py)
                hit = inter | bound
                if hit.any():
                    k = int(np.nonzero(hit)[0][0])
                    ax, ay = float(px[k]), float(py[k])
                else:
                    ax, ay = float(px[0]), float(py[0])
                vals.append(
                    struct.pack("<BII", 1, 2, 2)
                    + np.array([ax, ay, ax, ay], dtype="<f8").tobytes()
                )
                continue
            best = None
            # vertices of a projected onto b, and vice versa
            px, py = K._row_points(lg, i)
            for k in range(len(px)):
                qx, qy, d2 = K.nearest_point_on_geom(rg, j, float(px[k]), float(py[k]))
                if best is None or d2 < best[0]:
                    best = (d2, float(px[k]), float(py[k]), qx, qy)
            qx_, qy_ = K._row_points(rg, j)
            for k in range(len(qx_)):
                ax, ay, d2 = K.nearest_point_on_geom(lg, i, float(qx_[k]), float(qy_[k]))
                if best is None or d2 < best[0]:
                    best = (d2, ax, ay, float(qx_[k]), float(qy_[k]))
            _, ax, ay, bx, by = best
            vals.append(
                struct.pack("<BII", 1, 2, 2) + np.array([ax, ay, bx, by], dtype="<f8").tobytes()
            )
        return b.append_column(out, pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_project(ds: ray.data.Dataset, other, geometry="geometry", out="project", normalized=False):
    """base.py:5141 - arc-length position along the LINE in ``geometry`` of
    the point nearest to the ``other`` point geometry."""

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        n = len(lg)
        d = np.full(n, np.nan)
        for i in range(n):
            j = int(ri[i])
            if lg.is_missing[i] or rg.is_missing[j]:
                continue
            if int(lg.row_types[i]) not in (2, 5):
                continue
            px, py = K._row_points(rg, j)
            p0, _ = lg.row_part_range(i)
            c = lg.ring_coords(lg.part_ring_range(p0)[0])
            seg = np.hypot(*np.diff(c, axis=0).T)
            cum = np.concatenate([[0.0], np.cumsum(seg)])
            best = (np.inf, 0.0)
            for s in range(len(c) - 1):
                x0, y0 = c[s]
                x1, y1 = c[s + 1]
                dx, dy = x1 - x0, y1 - y0
                L2 = dx * dx + dy * dy
                t = 0.0 if L2 == 0 else min(max(((px[0] - x0) * dx + (py[0] - y0) * dy) / L2, 0.0), 1.0)
                qx, qy = x0 + t * dx, y0 + t * dy
                d2 = (px[0] - qx) ** 2 + (py[0] - qy) ** 2
                if d2 < best[0]:
                    best = (d2, cum[s] + t * seg[s])
            d[i] = best[1] / cum[-1] if normalized and cum[-1] > 0 else best[1]
        return b.append_column(out, pa.array(d))

    return ds.map_batches(f, batch_format="pyarrow")


def _de9im_point_rect(px, py, rb) -> str:
    """DE-9IM for (Point, non-degenerate rect Polygon)."""
    inside = rb[0] < px < rb[2] and rb[1] < py < rb[3]
    on_edge = (
        (px == rb[0] or px == rb[2]) and rb[1] <= py <= rb[3]
    ) or ((py == rb[1] or py == rb[3]) and rb[0] <= px <= rb[2])
    if inside:
        return "0FFFFF212"
    if on_edge:
        return "F0FFFF212"
    return "FF0FFF212"


def _de9im_rect_rect(a, b) -> str:
    """DE-9IM for two non-degenerate axis-aligned rects."""
    ox = min(a[2], b[2]) - max(a[0], b[0])
    oy = min(a[3], b[3]) - max(a[1], b[1])
    if ox < 0 or oy < 0:
        return "FF2FF1212"  # disjoint
    a_in_b = a[0] >= b[0] and a[2] <= b[2] and a[1] >= b[1] and a[3] <= b[3]
    b_in_a = b[0] >= a[0] and b[2] <= a[2] and b[1] >= a[1] and b[3] <= a[3]
    if ox == 0 or oy == 0:
        # boundary-only contact: point corner touch or edge segment touch
        contact_dim = "0" if (ox == 0 and oy == 0) else "1"
        return f"FF2F{contact_dim}1212"
    if a == b:
        return "2FFF1FFF2"
    flush = a[0] == b[0] or a[2] == b[2] or a[1] == b[1] or a[3] == b[3]
    if a_in_b:
        # nested: shared boundary segment iff any side is flush
        return "2FF11F212" if flush else "2FF1FF212"
    if b_in_a:
        return "212F11FF2" if flush else "212FF1FF2"
    # proper area overlap: boundaries meet in crossing points (dim 0) unless
    # an edge line is flush, which makes a shared boundary segment (dim 1)
    flush_seg = ((a[0] in (b[0], b[2]) or a[2] in (b[0], b[2])) and oy > 0) or (
        (a[1] in (b[1], b[3]) or a[3] in (b[1], b[3])) and ox > 0
    )
    return "212111212" if flush_seg else "212101212"


def _transpose_de9im(m: str) -> str:
    return "".join(m[k] for k in (0, 3, 6, 1, 4, 7, 2, 5, 8))


def _classify_boundary_vs(src_polys, dst_polys, dst_g, dst_i):
    """Split the source polygon boundary at crossings with the destination
    region and bucket segment lengths by where their midpoints fall:
    (inside destination interior, on its boundary, outside). Per-SEGMENT
    midpoint classification so a piece starting on the boundary and turning
    inward still counts its interior run."""
    from ..geom.booleans import clip_polyline

    lin = lon = lout = 0.0
    for rings in src_polys:
        for r in rings:
            pieces = clip_polyline(r, dst_polys, True) + clip_polyline(
                r, dst_polys, False
            )
            for piece in pieces:
                if len(piece) < 2:
                    continue
                seg = piece[1:] - piece[:-1]
                L = np.hypot(seg[:, 0], seg[:, 1])
                mids = (piece[:-1] + piece[1:]) / 2.0
                inter, bound = K.points_in_geom(dst_g, dst_i, mids[:, 0], mids[:, 1])
                lon += float(L[bound].sum())
                lin += float(L[inter & ~bound].sum())
                lout += float(L[~inter & ~bound].sum())
    return lin, lon, lout


def _relate_poly_poly(lg, i, rg, j) -> str:
    """General polygon x polygon DE-9IM off the boolean kernel: interior
    entries from sweep areas, boundary rows from clipped-boundary segment
    classification, BB from collinear overlap / any segment contact."""
    from ..geom.booleans import boolean_area, geom_polygons

    A = geom_polygons(lg, i)
    B = geom_polygons(rg, j)
    ii = "2" if boolean_area(A, B, "intersection") > 0 else "F"
    ie = "2" if boolean_area(A, B, "difference") > 0 else "F"
    ei = "2" if boolean_area(B, A, "difference") > 0 else "F"
    b_in, b_on, b_out = _classify_boundary_vs(B, A, lg, i)
    a_in, a_on, a_out = _classify_boundary_vs(A, B, rg, j)
    ib = "1" if b_in > 0 else "F"
    eb = "1" if b_out > 0 else "F"
    bi = "1" if a_in > 0 else "F"
    be = "1" if a_out > 0 else "F"
    if a_on > 0 or b_on > 0:
        bb = "1"
    else:
        sa = K._segments_of_row(lg, i)
        sb = K._segments_of_row(rg, j)
        bb = "0" if len(sa) and len(sb) and K.segments_intersect(sa, sb) else "F"
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


def _relate_points_poly(lg, i, rg, j) -> str:
    """(Multi)Point x general polygon: classify every point."""
    px, py = K._row_points(lg, i)
    inter, bound = K.points_in_geom(rg, j, px, py)
    ii = "0" if (inter & ~bound).any() else "F"
    ib = "0" if bound.any() else "F"
    ie = "0" if (~inter & ~bound).any() else "F"
    return f"{ii}{ib}{ie}FFF212"


def _relate_points_points(lg, i, rg, j) -> str:
    ax, ay = K._row_points(lg, i)
    bx, by = K._row_points(rg, j)
    a = {(float(x), float(y)) for x, y in zip(ax, ay)}
    b = {(float(x), float(y)) for x, y in zip(bx, by)}
    ii = "0" if a & b else "F"
    ie = "0" if a - b else "F"
    ei = "0" if b - a else "F"
    return f"{ii}F{ie}FFF{ei}F2"


def _line_boundary_points(g, i) -> set:
    """Mod-2 boundary of a (multi)linestring: endpoints of odd degree
    (a closed ring therefore has an empty boundary)."""
    p0, p1 = g.row_part_range(i)
    cnt: dict[tuple, int] = {}
    for p in range(p0, p1):
        r0, _ = g.part_ring_range(p)
        c = g.ring_coords(r0)
        if len(c) == 0:
            continue
        for q in ((float(c[0, 0]), float(c[0, 1])), (float(c[-1, 0]), float(c[-1, 1]))):
            cnt[q] = cnt.get(q, 0) + 1
    return {q for q, n in cnt.items() if n % 2 == 1}


def _seg_common_points(sa: np.ndarray, sb: np.ndarray) -> set:
    """All isolated common points between two segment sets (crossings,
    endpoint touches, collinear-overlap endpoints)."""
    pts: set = set()
    if len(sa) == 0 or len(sb) == 0:
        return pts
    bx0, by0, bx1, by1 = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
    dbx, dby = bx1 - bx0, by1 - by0
    for ax0, ay0, ax1, ay1 in sa:
        dax, day = ax1 - ax0, ay1 - ay0
        den = dax * dby - day * dbx
        rx, ry = bx0 - ax0, by0 - ay0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (rx * dby - ry * dbx) / den
            u = (rx * day - ry * dax) / den
        ok = (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        for j in np.nonzero(ok)[0]:
            pts.add((float(ax0 + t[j] * dax), float(ay0 + t[j] * day)))
        # collinear pairs: overlap-interval endpoints are common points
        par = den == 0
        if par.any():
            c0 = dax * (by0 - ay0) - day * (bx0 - ax0)
            L2 = dax * dax + day * day
            if L2 > 0:
                col = par & (c0 == 0)
                t0 = ((bx0 - ax0) * dax + (by0 - ay0) * day) / L2
                t1 = ((bx1 - ax0) * dax + (by1 - ay0) * day) / L2
                for j in np.nonzero(col)[0]:
                    lo = max(0.0, min(t0[j], t1[j]))
                    hi = min(1.0, max(t0[j], t1[j]))
                    if hi >= lo:
                        pts.add((float(ax0 + lo * dax), float(ay0 + lo * day)))
                        pts.add((float(ax0 + hi * dax), float(ay0 + hi * day)))
    return pts


def _on_geom(g, i, q) -> bool:
    return float(K.points_to_geom_sqdist(g, i, np.array([q[0]]), np.array([q[1]]))[0]) == 0.0


def _relate_line_line(lg, i, rg, j) -> str:
    sa = K._segments_of_row(lg, i)
    sb = K._segments_of_row(rg, j)
    ba = _line_boundary_points(lg, i)
    bb_pts = _line_boundary_points(rg, j)
    same, opp = _shared_subsegments(sa, sb)
    shared = sum(np.hypot(x1 - x0, y1 - y0) for x0, y0, x1, y1 in same + opp)
    common = _seg_common_points(sa, sb)
    int_int = any(q not in ba and q not in bb_pts for q in common)
    ii = "1" if shared > 0 else ("0" if int_int else "F")
    la = float(np.hypot(sa[:, 2] - sa[:, 0], sa[:, 3] - sa[:, 1]).sum()) if len(sa) else 0.0
    lb = float(np.hypot(sb[:, 2] - sb[:, 0], sb[:, 3] - sb[:, 1]).sum()) if len(sb) else 0.0
    ie = "1" if la - shared > 1e-12 * max(la, 1.0) else "F"
    ei = "1" if lb - shared > 1e-12 * max(lb, 1.0) else "F"
    ib = "0" if any(q not in ba and _on_geom(lg, i, q) for q in bb_pts) else "F"
    bi = "0" if any(q not in bb_pts and _on_geom(rg, j, q) for q in ba) else "F"
    bb = "0" if ba & bb_pts else "F"
    be = "0" if any(not _on_geom(rg, j, q) for q in ba) else "F"
    eb = "0" if any(not _on_geom(lg, i, q) for q in bb_pts) else "F"
    return ii + ib + ie + bi + bb + be + ei + eb + "2"


def _relate_points_line(lg, i, rg, j) -> str:
    """(Multi)Point x (multi)linestring."""
    px, py = K._row_points(lg, i)
    bl = _line_boundary_points(rg, j)
    on = K.points_to_geom_sqdist(rg, j, px, py) == 0.0
    at_bound = np.array([(float(x), float(y)) in bl for x, y in zip(px, py)])
    ii = "0" if (on & ~at_bound).any() else "F"
    ib = "0" if (on & at_bound).any() else "F"
    ie = "0" if (~on).any() else "F"
    pts = {(float(x), float(y)) for x, y in zip(px, py)}
    eb = "0" if any(q not in pts for q in bl) else "F"
    return f"{ii}{ib}{ie}FFF1{eb}2"


def _relate_line_poly(lg, i, rg, j) -> str:
    """(Multi)linestring x general polygon."""
    from ..geom.booleans import geom_polygons

    B = geom_polygons(rg, j)
    l_in, l_on, l_out = _classify_boundary_vs(_line_rings(lg, i), B, rg, j)
    sa = K._segments_of_row(lg, i)
    sb = K._segments_of_row(rg, j)
    ii = "1" if l_in > 0 else "F"
    if l_on > 0:
        ib = "1"
    else:
        ib = "0" if _seg_common_points(sa, sb) else "F"
    ie = "1" if l_out > 0 else "F"
    ba = _line_boundary_points(lg, i)
    bi = bb = be = "F"
    for q in ba:
        inter, bound = K.points_in_geom(rg, j, np.array([q[0]]), np.array([q[1]]))
        if bound[0]:
            bb = "0"
        elif inter[0]:
            bi = "0"
        else:
            be = "0"
    perim = float(np.hypot(sb[:, 2] - sb[:, 0], sb[:, 3] - sb[:, 1]).sum()) if len(sb) else 0.0
    eb = "1" if perim - l_on > 1e-12 * max(perim, 1.0) else "F"
    return ii + ib + ie + bi + bb + be + "2" + eb + "2"


def _line_rings(g, i):
    """Line row as the [[ring,...]] structure _classify_boundary_vs walks."""
    p0, p1 = g.row_part_range(i)
    rings = []
    for p in range(p0, p1):
        r0, _ = g.part_ring_range(p)
        c = g.ring_coords(r0)
        if len(c) >= 2:
            rings.append(c)
    return [rings] if rings else []


def _relate_pair_impl(lg, i, rg, j, lbi, rbj, lbei, rbej) -> str | None:
    """DE-9IM matrix for one row pair (scalar bounds/bbox-equiv supplied)."""
    if lg.is_missing[i] or rg.is_missing[j]:
        return None
    tl, tr = int(lg.row_types[i]), int(rg.row_types[j])
    l_pt = tl in (1, 4)
    r_pt = tr in (1, 4)
    l_poly = tl in (3, 6)
    r_poly = tr in (3, 6)
    if tl == 1 and tr == 1:
        eq = lbi[0] == rbj[0] and lbi[1] == rbj[1]
        return "0FFFFFFF2" if eq else "FF0FFF0F2"
    if l_pt and r_pt:
        return _relate_points_points(lg, i, rg, j)
    if tl == 1 and rbej and r_poly:
        return _de9im_point_rect(lbi[0], lbi[1], rbj)
    if tr == 1 and lbei and l_poly:
        return _transpose_de9im(_de9im_point_rect(rbj[0], rbj[1], lbi))
    if l_pt and r_poly:
        return _relate_points_poly(lg, i, rg, j)
    if r_pt and l_poly:
        return _transpose_de9im(_relate_points_poly(rg, j, lg, i))
    if l_poly and r_poly and lbei and rbej:
        return _de9im_rect_rect(tuple(lbi), tuple(rbj))
    if l_poly and r_poly:
        return _relate_poly_poly(lg, i, rg, j)
    l_line = tl in (2, 5)
    r_line = tr in (2, 5)
    if l_line and r_line:
        return _relate_line_line(lg, i, rg, j)
    if l_pt and r_line:
        return _relate_points_line(lg, i, rg, j)
    if l_line and r_pt:
        return _transpose_de9im(_relate_points_line(rg, j, lg, i))
    if l_line and r_poly:
        return _relate_line_poly(lg, i, rg, j)
    if l_poly and r_line:
        return _transpose_de9im(_relate_line_poly(rg, j, lg, i))
    # reference parity: GEOS/JTS RelateOp itself rejects GeometryCollection
    # operands ("This method does not support GeometryCollection arguments"),
    # so shapely-backed geopandas raises here too - not an engine gap.
    raise ValueError(
        f"relate does not support GeometryCollection arguments (type pair {tl},{tr})"
    )


def relate_pair(lg, i, rg, j) -> str | None:
    """DE-9IM matrix for one row pair, computing per-row bounds on demand
    (used by the crosses/overlaps predicates in stages/core.py)."""
    li, rj = lg.take([i]), rg.take([j])
    return _relate_pair_impl(
        lg, i, rg, j,
        K.bounds(li)[0], K.bounds(rj)[0],
        bool(bbox_equiv_mask(li)[0]), bool(bbox_equiv_mask(rj)[0]),
    )


def binary_relate(ds: ray.data.Dataset, other, geometry="geometry", out="relate"):
    """base.py:4924 - DE-9IM matrix string, all type families: exact
    point/rect fast paths; puntal x lineal / puntal x polygonal / lineal x
    lineal / lineal x polygonal / polygonal x polygonal general (boolean-
    kernel areas, boundary-piece classification, mod-2 line boundaries;
    float-exact scope like shared_paths)."""

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        lbe = bbox_equiv_mask(lg)
        rbe = bbox_equiv_mask(rg)
        lb = K.bounds(lg)
        rb = K.bounds(rg)
        vals = []
        for i in range(len(lg)):
            j = int(ri[i])
            vals.append(
                _relate_pair_impl(lg, i, rg, j, lb[i], rb[j], bool(lbe[i]), bool(rbe[j]))
            )
        return b.append_column(out, pa.array(vals, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_relate_pattern(ds, pattern: str, other, geometry="geometry", out="relate_pattern"):
    """base.py:5029 - DE-9IM pattern match ('*'=any, 'T'=non-empty)."""
    rel = binary_relate(ds, other, geometry=geometry, out="__relate")

    def f(b: pa.Table) -> pa.Table:
        vals = []
        for m in b.column("__relate").to_pylist():
            if m is None:
                vals.append(None)
                continue
            ok = all(
                p == "*" or (p == "T" and c in "012") or (p == c)
                for p, c in zip(pattern, m)
            )
            vals.append(ok)
        return b.drop_columns(["__relate"]).append_column(out, pa.array(vals, type=pa.bool_()))

    return rel.map_batches(f, batch_format="pyarrow")


def binary_frechet(ds: ray.data.Dataset, other, geometry="geometry", out="frechet_distance"):
    """Discrete Fréchet distance per row pair (base.py:3732; the discrete
    variant over the stored vertices - densify upstream for tighter bounds).
    Classic O(n*m) dynamic program per pair (Eiter & Mannila 1994)."""

    def _frechet(a: np.ndarray, b: np.ndarray) -> float:
        n, m = len(a), len(b)
        if n == 0 or m == 0:
            return np.nan
        # pairwise point distances, then DP over the coupling lattice
        d = np.hypot(a[:, 0, None] - b[None, :, 0], a[:, 1, None] - b[None, :, 1])
        ca = np.empty((n, m))
        ca[0, 0] = d[0, 0]
        for j in range(1, m):
            ca[0, j] = max(ca[0, j - 1], d[0, j])
        for i in range(1, n):
            ca[i, 0] = max(ca[i - 1, 0], d[i, 0])
            # row-wise: ca[i,j] = max(d[i,j], min(ca[i-1,j], ca[i-1,j-1], ca[i,j-1]))
            for j in range(1, m):
                ca[i, j] = max(
                    d[i, j], min(ca[i - 1, j], ca[i - 1, j - 1], ca[i, j - 1])
                )
        return float(ca[n - 1, m - 1])

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        vals = np.full(len(lg), np.nan)
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.row_types[i] == 0 or rg.row_types[j] == 0:
                continue
            ax, ay = K._row_points(lg, i)
            bx, by = K._row_points(rg, j)
            vals[i] = _frechet(np.column_stack([ax, ay]), np.column_stack([bx, by]))
        return b.append_column(out, pa.array(vals))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_geom_equals_exact(
    ds: ray.data.Dataset, other, tolerance: float = 0.0, geometry="geometry", out="geom_equals_exact"
):
    """Structural equality within tolerance (base.py:2569): same type, same
    part/ring structure, coordinates pairwise within tolerance in order."""

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        res = np.zeros(len(lg), dtype=bool)
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.row_types[i] != rg.row_types[j] or lg.row_types[i] == 0:
                continue
            lp0, lp1 = lg.row_part_range(i)
            rp0, rp1 = rg.row_part_range(j)
            if lp1 - lp0 != rp1 - rp0:
                continue
            same = True
            for dp in range(lp1 - lp0):
                pl, pr = lp0 + dp, rp0 + dp
                if lg.part_types[pl] != rg.part_types[pr]:
                    same = False
                    break
                lr0, lr1 = lg.part_ring_range(pl)
                rr0, rr1 = rg.part_ring_range(pr)
                if lr1 - lr0 != rr1 - rr0:
                    same = False
                    break
                for dr in range(lr1 - lr0):
                    ca = lg.ring_coords(lr0 + dr)
                    cb = rg.ring_coords(rr0 + dr)
                    if len(ca) != len(cb) or not np.all(np.abs(ca - cb) <= tolerance):
                        same = False
                        break
                if not same:
                    break
            res[i] = same
        return b.append_column(out, pa.array(res))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_snap(ds: ray.data.Dataset, other, tolerance: float, geometry="geometry"):
    """Snap vertices of the left geometry to the nearest VERTEX of the right
    geometry within tolerance (base.py:4473; GEOS also inserts segment
    points - vertex snapping is the documented in-sandbox scope)."""
    from ..geom.wkb import to_wkb as _to_wkb

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        coords = lg.coords.copy()
        for i in range(len(lg)):
            j = int(ri[i])
            if lg.row_types[i] == 0 or rg.row_types[j] == 0:
                continue
            qx, qy = K._row_points(rg, j)
            if len(qx) == 0:
                continue
            c0 = lg.ring_offsets[lg.part_offsets[lg.row_offsets[i]]]
            c1 = lg.ring_offsets[lg.part_offsets[lg.row_offsets[i + 1]]]
            seg = coords[c0:c1]
            if not len(seg):
                continue
            d2 = (seg[:, 0, None] - qx[None, :]) ** 2 + (seg[:, 1, None] - qy[None, :]) ** 2
            k = np.argmin(d2, axis=1)
            hit = d2[np.arange(len(seg)), k] <= tolerance * tolerance
            seg[hit, 0] = qx[k[hit]]
            seg[hit, 1] = qy[k[hit]]
            coords[c0:c1] = seg
        g2 = Geoms(coords, lg.ring_offsets, lg.part_offsets, lg.row_offsets, lg.part_types, lg.row_types)
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, _to_wkb(g2))

    return ds.map_batches(f, batch_format="pyarrow")


def binary_geom_almost_equals(
    ds: ray.data.Dataset, other, decimal: int = 6, geometry="geometry", out="geom_almost_equals"
):
    """base.py geom_almost_equals (deprecated in 1.0 toward
    geom_equals_exact): tolerance = 0.5 * 10**-decimal."""
    return binary_geom_equals_exact(
        ds, other, tolerance=0.5 * 10.0 ** (-decimal), geometry=geometry, out=out
    )
