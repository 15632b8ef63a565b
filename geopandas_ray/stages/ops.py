"""Column-level geometry operators as stateless map_batches kernels.

Every §2.2/§2.3 operator from SURVEY.md that appends a scalar or geometry
column maps to one ``ds.map_batches(fn, batch_format="pyarrow")`` here.
The reference methods they mirror are cited per function.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.wkb import from_wkb, points_to_wkb, to_wkb, boxes_to_wkb
from ..grid import DEFAULT_DOMAIN, cell_id, hilbert_distance


def with_area(ds, geometry="geometry", out="area"):
    """base.py:40"""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(K.area(from_wkb(b.column(geometry)))))

    return ds.map_batches(f, batch_format="pyarrow")


def with_length(ds, geometry="geometry", out="length"):
    """base.py:154"""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(K.length(from_wkb(b.column(geometry)))))

    return ds.map_batches(f, batch_format="pyarrow")


def with_bounds(ds, geometry="geometry"):
    """base.py:4673 - appends minx/miny/maxx/maxy float columns."""

    def f(b: pa.Table) -> pa.Table:
        bb = K.bounds(from_wkb(b.column(geometry)))
        for i, name in enumerate(("minx", "miny", "maxx", "maxy")):
            b = b.append_column(name, pa.array(bb[:, i]))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def with_centroid(ds, geometry="geometry", out="centroid"):
    """base.py:764 - appends centroid as a new WKB geometry column."""

    def f(b: pa.Table) -> pa.Table:
        cx, cy = K.centroid(from_wkb(b.column(geometry)))
        return b.append_column(out, points_to_wkb(cx, cy))

    return ds.map_batches(f, batch_format="pyarrow")


def with_envelope(ds, geometry="geometry", out="envelope"):
    """base.py:1116 - bbox polygon per row."""

    def f(b: pa.Table) -> pa.Table:
        bb = K.bounds(from_wkb(b.column(geometry)))
        return b.append_column(out, boxes_to_wkb(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3]))

    return ds.map_batches(f, batch_format="pyarrow")


def with_geom_type(ds, geometry="geometry", out="geom_type"):
    """base.py:129"""

    def f(b: pa.Table) -> pa.Table:
        return b.append_column(out, pa.array(K.geom_type(from_wkb(b.column(geometry))), type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def with_counts(ds, geometry="geometry"):
    """base.py:321 count_coordinates / :364 count_geometries."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        b = b.append_column("count_coordinates", pa.array(K.count_coordinates(g)))
        b = b.append_column("count_geometries", pa.array(K.count_geometries(g)))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def with_is_empty(ds, geometry="geometry", out="is_empty"):
    """base.py:290; empty distinct from missing (testing.py:18-46)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        return b.append_column(out, pa.array(g.is_empty))

    return ds.map_batches(f, batch_format="pyarrow")


def with_xy(ds, geometry="geometry"):
    """geoseries.py:171/199 x/y accessors (point rows)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        x = np.full(n, np.nan)
        y = np.full(n, np.nan)
        ok = ~(g.is_missing | g.is_empty)
        ci = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
        if ok.any():
            x[ok] = g.coords[ci[ok], 0]
            y[ok] = g.coords[ci[ok], 1]
        b = b.append_column("x", pa.array(x))
        b = b.append_column("y", pa.array(y))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def with_cell(ds, res: int, geometry="geometry", domain=DEFAULT_DOMAIN, out="cell"):
    """North-rule cell encoding over bbox centers (single cell per row)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        cx = (bb[:, 0] + bb[:, 2]) * 0.5
        cy = (bb[:, 1] + bb[:, 3]) * 0.5
        cells = cell_id(np.nan_to_num(cx), np.nan_to_num(cy), res, domain).astype(np.int64)
        return b.append_column(out, pa.array(cells))

    return ds.map_batches(f, batch_format="pyarrow")


def with_hilbert(ds, total_bounds, level: int = 15, geometry="geometry", out="hilbert"):
    """base.py:5624 hilbert_distance of bbox midpoints (tools/hilbert_curve.py)."""
    tb = tuple(float(v) for v in total_bounds)

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        cx = (bb[:, 0] + bb[:, 2]) * 0.5
        cy = (bb[:, 1] + bb[:, 3]) * 0.5
        h = hilbert_distance(np.nan_to_num(cx), np.nan_to_num(cy), tb, level)
        return b.append_column(out, pa.array(h.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def cx_filter(ds, minx, miny, maxx, maxy, geometry="geometry"):
    """The .cx[bbox] indexer (base.py:5514): keep rows whose bbox intersects."""

    def f(b: pa.Table) -> pa.Table:
        bb = K.bounds(from_wkb(b.column(geometry)))
        keep = (bb[:, 0] <= maxx) & (bb[:, 2] >= minx) & (bb[:, 1] <= maxy) & (bb[:, 3] >= miny)
        return b.filter(pa.array(np.nan_to_num(keep, nan=False).astype(bool)))

    return ds.map_batches(f, batch_format="pyarrow")


def with_distance_to(ds, other_wkb: bytes, geometry="geometry", out="distance"):
    """Binary distance vs a broadcast scalar geometry (base.py:3521)."""
    og = from_wkb([other_wkb])

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        n = len(g)
        d = np.full(n, np.nan)
        ok = ~(g.is_missing | g.is_empty)
        if g.all_points:
            ci = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
            d2 = K.points_to_geom_sqdist(og, 0, g.coords[ci[ok], 0], g.coords[ci[ok], 1])
            d[ok] = np.sqrt(d2)
        else:
            for i in np.nonzero(ok)[0]:
                px, py = K._row_points(g, int(i))
                d[i] = np.sqrt(K.points_to_geom_sqdist(og, 0, px, py).min())
        return b.append_column(out, pa.array(d))

    return ds.map_batches(f, batch_format="pyarrow")


def with_sq_distance_to_point(ds, x0: float, y0: float, geometry="geometry", out="sq_dist"):
    """Exact squared distance to a fixed point (float-exact for the oracle)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        ci = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
        n = len(g)
        d = np.full(n, np.nan)
        ok = ~(g.is_missing | g.is_empty)
        if ok.any():
            dx = g.coords[ci[ok], 0] - x0
            dy = g.coords[ci[ok], 1] - y0
            d[ok] = dx * dx + dy * dy
        return b.append_column(out, pa.array(d))

    return ds.map_batches(f, batch_format="pyarrow")


def affine_transform(ds, a, b_, d, e, xoff, yoff, geometry="geometry"):
    """base.py:5284 family (translate/scale/rotate/skew are special cases):
    x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff, vectorized over ALL
    coordinates of the batch at once."""

    def f(bt: pa.Table) -> pa.Table:
        g = from_wkb(bt.column(geometry))
        c = g.coords
        nc = np.empty_like(c)
        nc[:, 0] = a * c[:, 0] + b_ * c[:, 1] + xoff
        nc[:, 1] = d * c[:, 0] + e * c[:, 1] + yoff
        g.coords = nc
        return bt.set_column(
            bt.column_names.index(geometry), geometry, to_wkb(g)
        )

    return ds.map_batches(f, batch_format="pyarrow")


def translate(ds, xoff=0.0, yoff=0.0, geometry="geometry"):
    """base.py:5326"""
    return affine_transform(ds, 1, 0, 0, 1, xoff, yoff, geometry)


def scale(ds, xfact=1.0, yfact=1.0, origin=(0.0, 0.0), geometry="geometry"):
    """base.py:5414 (origin as explicit coords)."""
    ox, oy = origin
    return affine_transform(
        ds, xfact, 0, 0, yfact, ox - xfact * ox, oy - yfact * oy, geometry
    )


def rotate(ds, angle, origin=(0.0, 0.0), use_radians=False, geometry="geometry"):
    """base.py:5363 - rotation about explicit origin coords."""
    theta = angle if use_radians else np.deg2rad(angle)
    ca, sa = np.cos(theta), np.sin(theta)
    ox, oy = origin
    return affine_transform(
        ds, ca, -sa, sa, ca,
        ox - ca * ox + sa * oy, oy - sa * ox - ca * oy, geometry,
    )


def skew(ds, xs=0.0, ys=0.0, origin=(0.0, 0.0), use_radians=False, geometry="geometry"):
    """base.py:5469 - shear by angles along x/y about explicit origin."""
    tx = np.tan(xs if use_radians else np.deg2rad(xs))
    ty = np.tan(ys if use_radians else np.deg2rad(ys))
    ox, oy = origin
    return affine_transform(
        ds, 1, tx, ty, 1, -tx * oy, -ty * ox, geometry
    )
