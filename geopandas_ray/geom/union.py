"""Geometry union (union_all / dissolve geometry leg).

Reference: GeoSeries.union_all (base.py:1982) unions every geometry in a
set; dissolve (geodataframe.py:1325) applies it per group. Unions are
associative + commutative, so the engine computes them as partial per-block
unions followed by a final merge (a classic combiner - SURVEY.md §3.2).

The union is exact (point-set equal to GEOS unary_union) for:
- points: coordinate-set union, minus points absorbed by lines/polygons;
- lines: collinear overlaps appear once (1-D interval subtraction) and
  portions inside the polygon cover are dropped; linestrings are not
  re-noded at crossings (same point set, different segmentation);
- polygons: rectilinear region union via the coordinate-grid decomposition
  (disjoint maximal rectangles - region-equivalent outline), general simple
  polygons via the slab-sweep even-odd union (canonical merged rings).
"""

from __future__ import annotations

import numpy as np

from .clip import RectRegion, geom_rects, region_union
from .kernels import bounds as k_bounds
from .wkb import (
    LINESTRING,
    MISSING,
    POINT,
    POLYGON,
    Geoms,
    _poly_geoms,
    box_geoms,
    from_wkb,
    points_from_xy,
    to_wkb,
)


def union_rows(g: Geoms, rows=None) -> bytes | None:
    """Union the given rows (default all) into a single WKB geometry."""
    if rows is None:
        rows = np.arange(len(g))
    rows = [int(r) for r in rows if g.row_types[r] != MISSING]
    if not rows:
        return None

    pts: list[np.ndarray] = []
    line_rings: list[np.ndarray] = []
    poly_parts: list[list[np.ndarray]] = []  # each: [shell, holes...]
    all_rect = True
    rect_regions: list[RectRegion] = []
    for i in rows:
        p0, p1 = g.row_part_range(i)
        rr = geom_rects(g, i)
        row_has_poly = False
        for p in range(p0, p1):
            t = int(g.part_types[p])
            r0, r1 = g.part_ring_range(p)
            if t == POINT:
                pts.append(g.ring_coords(r0))
            elif t == LINESTRING:
                line_rings.append(g.ring_coords(r0))
            else:
                row_has_poly = True
                poly_parts.append([g.ring_coords(r) for r in range(r0, r1)])
        if row_has_poly:
            if rr is None:
                all_rect = False
            else:
                rect_regions.append(rr)

    # cross-dimension absorption (GEOS unary_union): points on lines or in
    # polygons vanish; line portions inside polygons vanish; collinear line
    # overlaps appear once. Compute the merged polygon cover lazily — only
    # when lower-dimension parts coexist with polygons.
    cover_polys: list[list[np.ndarray]] | None = None
    if poly_parts and (pts or line_rings):
        from .booleans import make_valid_rings

        cover_polys = make_valid_rings(poly_parts)

    out_geoms: list[Geoms] = []
    if pts:
        c = np.unique(np.concatenate(pts), axis=0)
        keep = np.ones(len(c), dtype=bool)
        if line_rings:
            from .booleans import points_on_segments

            segs = np.concatenate(
                [np.hstack([r[:-1], r[1:]]) for r in line_rings if len(r) >= 2]
                or [np.zeros((0, 4))]
            )
            keep &= ~points_on_segments(c[:, 0], c[:, 1], segs)
        if cover_polys:
            from .booleans import points_covered_by_polys

            keep &= ~points_covered_by_polys(c[:, 0], c[:, 1], cover_polys)
        if keep.any():
            c = c[keep]
            out_geoms.append(points_from_xy(c[:, 0], c[:, 1]))
    if line_rings:
        line_rings = _dedup_clip_linework(line_rings, cover_polys)
    if line_rings:
        gl = Geoms(
            np.concatenate(line_rings),
            np.concatenate([[0], np.cumsum([len(r) for r in line_rings])]),
            np.arange(len(line_rings) + 1),
            np.array([0, len(line_rings)]),
            np.full(len(line_rings), LINESTRING, dtype=np.int8),
            np.array([LINESTRING], dtype=np.int8),
        )
        out_geoms.append(gl)
    if poly_parts:
        if all_rect and rect_regions:
            # one coordinate-grid pass over ALL rects (not pairwise folds)
            all_rects = np.concatenate([rr.rects for rr in rect_regions])
            reg = RectRegion.from_rects(all_rects).normalized()
            r = reg.rects
            out_geoms.append(box_geoms(r[:, 0], r[:, 1], r[:, 2], r[:, 3]))
        else:
            # general polygons: slab-sweep union (each part its own parity
            # counter -> exact even-odd union incl. overlaps + holes;
            # geom/booleans.py). Output rings are region-canonical
            # (collinear-simplified), replacing r1's collect-only approx.
            from .booleans import make_valid_rings

            merged_polys = make_valid_rings(poly_parts)
            out_geoms.append(_collect_polys(merged_polys))

    if not out_geoms:
        return None
    merged = _merge_parts(out_geoms)
    return to_wkb(merged)[0].as_py()


def _collect_polys(poly_parts: list[list[np.ndarray]]) -> Geoms:
    coords_chunks = []
    ring_off = [0]
    part_off = [0]
    part_types = []
    for rings in poly_parts:
        for ring in rings:
            coords_chunks.append(ring)
            ring_off.append(ring_off[-1] + len(ring))
        part_off.append(part_off[-1] + len(rings))
        part_types.append(POLYGON)
    return Geoms(
        np.concatenate(coords_chunks),
        ring_off,
        part_off,
        np.array([0, len(poly_parts)]),
        part_types,
        np.array([POLYGON], dtype=np.int8),
    )


def _merge_parts(gs: list[Geoms]) -> Geoms:
    """Merge several single-row Geoms into one row (collection if mixed)."""
    coords = []
    ring_off = [0]
    part_off = [0]
    part_types = []
    for g in gs:
        for p in range(len(g.part_offsets) - 1):
            r0, r1 = g.part_ring_range(p)
            for r in range(r0, r1):
                c = g.ring_coords(r)
                coords.append(c)
                ring_off.append(ring_off[-1] + len(c))
            part_off.append(part_off[-1] + (r1 - r0))
            part_types.append(int(g.part_types[p]))
    tset = set(part_types)
    if tset == {POINT}:
        row_type = POINT if len(part_types) == 1 else 4
    elif tset == {LINESTRING}:
        row_type = LINESTRING if len(part_types) == 1 else 5
    elif tset == {POLYGON}:
        row_type = POLYGON if len(part_types) == 1 else 6
    else:
        row_type = 7
    return Geoms(
        np.concatenate(coords) if coords else np.empty((0, 2)),
        ring_off,
        part_off,
        np.array([0, len(part_types)]),
        part_types,
        np.array([row_type], dtype=np.int8),
    )


def _dedup_clip_linework(
    line_rings: list[np.ndarray], cover_polys: list[list[np.ndarray]] | None
) -> list[np.ndarray]:
    """Exact line-union linework: collinear overlaps between rings appear
    ONCE (1-D interval subtraction against the accumulated earlier rings),
    and portions inside the polygon cover are dropped. Point-set equal to
    GEOS unary_union's lineal component; linestrings are not re-noded at
    crossings. The untouched fast path preserves the original polyline
    representation (so homogeneous overlap-free unions are byte-stable)."""
    from .booleans import segments_minus

    seg_arrays = [
        np.hstack([r[:-1], r[1:]]) if len(r) >= 2 else np.zeros((0, 4))
        for r in line_rings
    ]
    acc = np.concatenate(seg_arrays) if seg_arrays else np.zeros((0, 4))
    # overlap dedup: ring k minus rings 0..k-1
    rem_per_ring: list[list[tuple]] = []
    changed = False
    off = 0
    for segs in seg_arrays:
        prior = acc[:off]
        rem = segments_minus(segs, prior)
        if len(rem) != len(segs) or any(
            tuple(map(float, s)) != r for s, r in zip(segs, rem)
        ):
            changed = True
        rem_per_ring.append(rem)
        off += len(segs)

    if not changed and not cover_polys:
        return line_rings

    if not changed and cover_polys:
        # try polyline-preserving clip first
        from .booleans import clip_polyline

        out: list[np.ndarray] = []
        clip_changed = False
        for r in line_rings:
            pieces = clip_polyline(r, cover_polys, inside=False)
            if not (len(pieces) == 1 and np.array_equal(pieces[0], r)):
                clip_changed = True
            out.extend(pieces)
        return out if clip_changed else line_rings

    # overlaps removed -> emit 2-point segments (clipped against the cover)
    segs_flat = [s for rem in rem_per_ring for s in rem]
    out = []
    if cover_polys:
        from .booleans import clip_polyline

        for x0, y0, x1, y1 in segs_flat:
            out.extend(
                clip_polyline(
                    np.array([[x0, y0], [x1, y1]]), cover_polys, inside=False
                )
            )
    else:
        out = [np.array([[x0, y0], [x1, y1]]) for x0, y0, x1, y1 in segs_flat]
    return out


def union_wkb_values(wkb_values) -> bytes | None:
    """Union a list/array of WKB scalars (partial-union combiner step)."""
    vals = [v for v in wkb_values if v is not None]
    if not vals:
        return None
    g = from_wkb(vals)
    return union_rows(g)
