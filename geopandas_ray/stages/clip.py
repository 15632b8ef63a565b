"""clip (SURVEY.md §2.7) - reference tools/clip.py:54.

Mask forms:
- (minx, miny, maxx, maxy) tuple -> clip_by_rect fast path (clip.py:63-68):
  polygons via Sutherland-Hodgman against the rect, lines via Liang-Barsky,
  points by closed-interval membership;
- a geometry table / WKB list -> dissolved to its union first (clip.py:76-77)
  and clipped against each convex part (scope: convex mask parts;
  rectilinear masks exact via the region machinery).

Rows whose clipped geometry is empty are dropped (clip.py:45-46). The mask
is broadcast (it is one geometry after dissolve) so this is a stateless
map_batches - no shuffle (SURVEY.md §2.7 RD mapping).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.clip import clip_ring_by_rect, clip_segments_by_rect
from ..geom.wkb import (
    LINESTRING,
    POINT,
    POLYGON,
    Geoms,
    from_wkb,
    to_wkb,
)


def _clip_geoms_by_rect(g: Geoms, minx, miny, maxx, maxy) -> tuple[list, np.ndarray]:
    """Clip every row; returns (wkb_values_or_None, keep_mask)."""
    out_vals: list = []
    n = len(g)
    keep = np.zeros(n, dtype=bool)
    for i in range(n):
        if g.row_types[i] == 0:
            out_vals.append(None)
            continue
        p0, p1 = g.row_part_range(i)
        new_parts: list[tuple[int, list[np.ndarray]]] = []
        for p in range(p0, p1):
            t = int(g.part_types[p])
            r0, r1 = g.part_ring_range(p)
            if t == POINT:
                c = g.ring_coords(r0)
                x, y = c[0]
                if minx <= x <= maxx and miny <= y <= maxy:
                    new_parts.append((POINT, [c]))
            elif t == LINESTRING:
                for piece in clip_segments_by_rect(g.ring_coords(r0), minx, miny, maxx, maxy):
                    new_parts.append((LINESTRING, [piece]))
            else:  # POLYGON: clip shell and holes separately (convex clip)
                shell = clip_ring_by_rect(g.ring_coords(r0), minx, miny, maxx, maxy)
                if len(shell) == 0:
                    continue
                rings = [shell]
                for r in range(r0 + 1, r1):
                    hole = clip_ring_by_rect(g.ring_coords(r), minx, miny, maxx, maxy)
                    if len(hole):
                        rings.append(hole)
                new_parts.append((POLYGON, rings))
        if not new_parts:
            out_vals.append(None)
            continue
        keep[i] = True
        out_vals.append(_parts_to_wkb(new_parts))
    return out_vals, keep


def _parts_to_wkb(parts: list[tuple[int, list[np.ndarray]]],
                  force_multi: bool = False) -> bytes:
    """``force_multi`` keeps a single-part row at the Multi* row type —
    format readers (GPX tracks, GML MultiSurface, KML MultiGeometry, FGB
    declared-Multi layers) must preserve the source's declared type, not
    demote one-part multis to the singular (OGR parity)."""
    coords = []
    ring_off = [0]
    part_off = [0]
    part_types = []
    for t, rings in parts:
        for ring in rings:
            coords.append(ring)
            ring_off.append(ring_off[-1] + len(ring))
        part_off.append(part_off[-1] + len(rings))
        part_types.append(t)
    tset = {t for t, _ in parts}
    if len(tset) > 1:
        row_type = 7
    else:
        t = tset.pop()
        single = len(parts) == 1 and not force_multi
        row_type = t if single else {POINT: 4, LINESTRING: 5, POLYGON: 6}[t]
    g = Geoms(
        np.concatenate(coords),
        ring_off,
        part_off,
        np.array([0, len(part_types)]),
        part_types,
        np.array([row_type], dtype=np.int8),
    )
    return to_wkb(g)[0].as_py()


def _input_dims(ds: ray.data.Dataset, geometry: str) -> tuple[set, bool]:
    """(set of dims present {0 point,1 line,2 poly}, any GeometryCollection).

    One slim streaming scan over the geometry column; the per-batch result is
    a <=4-row table, so the driver pull is O(batches)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        rt = np.asarray(g.row_types)
        dims = np.full(len(rt), -9, dtype=np.int8)
        dims[(rt == 1) | (rt == 4)] = 0
        dims[(rt == 2) | (rt == 5)] = 1
        dims[(rt == 3) | (rt == 6)] = 2
        dims[rt == 7] = -1  # collection marker
        return pa.table({"d": pa.array(np.unique(dims[dims != -9]))})

    from ..util import pull_table

    t = pull_table(ds.map_batches(f, batch_format="pyarrow"), columns=["d"])
    vals = set(np.unique(np.asarray(t.column("d"))).tolist()) if len(t) else set()
    return {d for d in vals if d >= 0}, (-1 in vals)


def _finish_clip(
    ds_in: ray.data.Dataset,
    out: ray.data.Dataset,
    geometry: str,
    keep_geom_type: bool,
    sort: bool,
    sort_col: str | None,
) -> ray.data.Dataset:
    """Shared keep_geom_type / sort epilogue (reference tools/clip.py:54
    kwargs; tests/test_clip.py:290-319,376). keep_geom_type on a mixed-type
    or collection-bearing input warns and is skipped (test_clip.py:308-319);
    on homogeneous input it drops output parts of other dimensions (shared
    machinery with overlay, stages/overlay.py _keep_geom_type). sort orders
    by ``sort_col`` - the engine's index-as-column analog of the reference's
    sort_index; defaults to the first non-geometry column."""
    if keep_geom_type:
        import warnings

        dims, has_coll = _input_dims(ds_in, geometry)
        if has_coll or len(dims) > 1:
            warnings.warn(
                "Geometry types of input geodataframe are not homogenous; "
                "keep_geom_type is skipped",
                UserWarning,
                stacklevel=3,
            )
        elif dims:
            from .overlay import _keep_geom_type

            out = _keep_geom_type(out, True, dims.pop(), geometry=geometry)
    if sort:
        if sort_col is None:
            sort_col = next((n for n in ds_in.schema().names if n != geometry), None)
            if sort_col is None:
                raise ValueError(
                    "clip(sort=True) needs a non-geometry column to order by; "
                    "pass sort_col explicitly"
                )
        out = out.sort(sort_col)
    return out


def clip_rect(
    ds: ray.data.Dataset,
    minx,
    miny,
    maxx,
    maxy,
    geometry="geometry",
    keep_geom_type: bool = False,
    sort: bool = False,
    sort_col: str | None = None,
):
    """clip with a rectangle mask (the clip_by_rect fast path)."""
    if keep_geom_type:
        # the _input_dims scan is a second consumer of the (lazy) input —
        # materialize or the clip stage re-executes the whole upstream plan
        ds = ds.materialize()

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        vals, keep = _clip_geoms_by_rect(g, minx, miny, maxx, maxy)
        idx = b.column_names.index(geometry)
        b = b.set_column(idx, geometry, pa.array(vals, type=pa.large_binary()))
        return b.filter(pa.array(keep))

    out = ds.map_batches(f, batch_format="pyarrow")
    if keep_geom_type or sort:
        out = _finish_clip(ds, out, geometry, keep_geom_type, sort, sort_col)
    return out


def clip(
    ds: ray.data.Dataset,
    mask,
    geometry="geometry",
    keep_geom_type: bool = False,
    sort: bool = False,
    sort_col: str | None = None,
):
    """clip by a mask: rect tuple, WKB bytes, or a pa.Table of geometry.

    Non-rect masks: each mask polygon part must be convex (documented scope,
    SURVEY.md §7.3); the row keeps the piece inside the union of parts.
    ``keep_geom_type`` / ``sort`` per reference tools/clip.py:54 (see
    _finish_clip).
    """
    kw = dict(keep_geom_type=keep_geom_type, sort=sort, sort_col=sort_col)
    if isinstance(mask, tuple) and len(mask) == 4:
        return clip_rect(ds, *mask, geometry=geometry, **kw)
    if keep_geom_type:
        # _input_dims is a second consumer of the (lazy) input (CLAUDE.md
        # consumer-count rule) — clip_rect materializes on its own path
        ds = ds.materialize()
    if isinstance(mask, bytes):
        mg = from_wkb([mask])
    elif isinstance(mask, pa.Table):
        mg = from_wkb(mask.column(geometry))
    else:
        raise TypeError(type(mask))
    # rect fast path when the dissolved mask is a single axis-aligned box
    from ..geom.clip import geom_rects

    regions = []
    for i in range(len(mg)):
        rr = geom_rects(mg, i)
        if rr is None:
            regions = None
            break
        regions.append(rr)
    if regions is not None:
        rects = np.concatenate([r.rects for r in regions]) if regions else np.empty((0, 4))
        if len(rects) == 1:
            return clip_rect(ds, *rects[0], geometry=geometry, **kw)

        def f_multi(b: pa.Table) -> pa.Table:
            g = from_wkb(b.column(geometry))
            pieces = []
            keeps = np.zeros((len(rects), len(g)), dtype=bool)
            all_vals = []
            # clip against each rect, keep first non-empty piece per row
            # (exact for disjoint mask rects; overlapping handled by union)
            vals_per_rect = []
            for k in range(len(rects)):
                v, kp = _clip_geoms_by_rect(g, *rects[k])
                vals_per_rect.append(v)
                keeps[k] = kp
            out_vals = []
            keep = keeps.any(axis=0)
            for i in range(len(g)):
                hit = np.nonzero(keeps[:, i])[0]
                if len(hit) == 0:
                    out_vals.append(None)
                elif len(hit) == 1:
                    out_vals.append(vals_per_rect[hit[0]][i])
                else:
                    from ..geom.union import union_wkb_values

                    out_vals.append(union_wkb_values([vals_per_rect[k][i] for k in hit]))
            idx = b.column_names.index(geometry)
            b = b.set_column(idx, geometry, pa.array(out_vals, type=pa.large_binary()))
            return b.filter(pa.array(keep))

        out = ds.map_batches(f_multi, batch_format="pyarrow")
        if keep_geom_type or sort:
            out = _finish_clip(ds, out, geometry, keep_geom_type, sort, sort_col)
        return out

    # general polygon mask: slab-sweep boolean kernel per polygon row,
    # even-odd membership for points, segment-split clip for lines
    # (tools/clip.py:54 general-mask semantics; geom/booleans.py)
    from ..geom.booleans import clip_polyline, geom_polygons, rings_boolean

    mask_polys: list = []
    for i in range(len(mg)):
        mask_polys.extend(geom_polygons(mg, i))
    if not mask_polys:
        raise NotImplementedError("clip mask has no polygonal parts")

    def f_general(b: pa.Table) -> pa.Table:
        from ..geom.booleans import _point_in_ring

        g = from_wkb(b.column(geometry))
        out_vals: list = []
        keep = np.zeros(len(g), dtype=bool)
        for i in range(len(g)):
            t = int(g.row_types[i])
            if t == 0:
                out_vals.append(None)
                continue
            if t in (1, 4):
                px, py = K._row_points(g, i)
                inside = np.zeros(len(px), dtype=bool)
                for k in range(len(px)):
                    cnt = 0
                    for rings in mask_polys:
                        for r in rings:
                            if _point_in_ring(r, px[k], py[k]):
                                cnt += 1
                    inside[k] = cnt % 2 == 1
                if not inside.any():
                    out_vals.append(None)
                    continue
                keep[i] = True
                out_vals.append(
                    _parts_to_wkb(
                        [(1, [np.array([[px[k], py[k]]])]) for k in np.nonzero(inside)[0]]
                    )
                )
            elif t in (2, 5):
                pieces = []
                p0, p1 = g.row_part_range(i)
                for p in range(p0, p1):
                    r0, _ = g.part_ring_range(p)
                    pieces.extend(clip_polyline(g.ring_coords(r0), mask_polys))
                if not pieces:
                    out_vals.append(None)
                    continue
                keep[i] = True
                out_vals.append(_parts_to_wkb([(2, [c]) for c in pieces]))
            else:
                from ..geom.booleans import geom_polygons as _gp

                polys = rings_boolean(_gp(g, i), mask_polys, "intersection")
                if not polys:
                    out_vals.append(None)
                    continue
                keep[i] = True
                out_vals.append(_parts_to_wkb([(3, rings) for rings in polys]))
        idx = b.column_names.index(geometry)
        b = b.set_column(idx, geometry, pa.array(out_vals, type=pa.large_binary()))
        return b.filter(pa.array(keep))

    out = ds.map_batches(f_general, batch_format="pyarrow")
    if keep_geom_type or sort:
        out = _finish_clip(ds, out, geometry, keep_geom_type, sort, sort_col)
    return out
