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
    distance: float | None = None,
    out: str | None = None,
):
    """contains/within/intersects/... as a bool column (base.py:2043-3407).

    ``other``: a second geometry column name, or WKB bytes for broadcast.
    Missing rows on either side evaluate False (GEOS semantics)."""
    out = out or predicate

    def f(b: pa.Table) -> pa.Table:
        lg, rg, ri = _two_sides(b, geometry, other)
        li = np.arange(len(lg), dtype=np.int64)
        ok = ~(lg.is_missing | lg.is_empty) & ~(rg.is_missing[ri] | rg.is_empty[ri])
        res = np.zeros(len(lg), dtype=bool)
        if ok.any():
            res[ok] = eval_pairs(predicate, lg, li[ok], rg, ri[ok], distance)
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
    """base.py:4192 row-aligned pairwise intersection geometry (scope:
    rectilinear / convex operands, like overlay's kernel)."""
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
    """base.py:3852 row-aligned difference (rectilinear scope)."""
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


def shared_paths_stub(*a, **k):
    """base.py:4574 - needs linework noding (GEOS); documented out of
    in-sandbox scope."""
    raise NotImplementedError("shared_paths requires GEOS noding (cluster path)")
