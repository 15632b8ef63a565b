"""GeoArrow native encodings <-> WKB (reference io/_geoarrow.py:13-149,
GEOARROW_ENCODINGS = point/linestring/polygon/multipoint/multilinestring/
multipolygon; interleaved AND separated coordinate variants; xyz inputs
accepted on decode with Z dropped - the engine is planar, matching
from_wkb's documented Z-drop).

The CSR ``Geoms`` batch IS GeoArrow's memory layout — coords buffer +
nested offsets — so encoding is offset re-slicing, not per-row work:

- coords        -> FixedSizeList<double>[2] ("interleaved" in the spec)
- point         -> coords (one per row; missing -> null)
- multipoint    -> list<coords>
- linestring    -> list<coords>               (one ring per row)
- multilinestring -> list<list<coords>>
- polygon       -> list<list<coords>>         (rings of the single part)
- multipolygon  -> list<list<list<coords>>>

GeoArrow columns are single-geometry-type: a mixed WKB column must be
split (or kept as WKB) first; ``to_geoarrow`` raises on mixed input.
Extension-type registration is metadata-only in the spec; we attach the
``ARROW:extension:name = geoarrow.<enc>`` key on the field metadata.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..geom.wkb import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geoms,
    from_wkb,
    to_wkb,
)

_SINGLE = {
    "point": POINT,
    "linestring": LINESTRING,
    "polygon": POLYGON,
    "multipoint": MULTIPOINT,
    "multilinestring": MULTILINESTRING,
    "multipolygon": MULTIPOLYGON,
}
# a Multi column may also carry single-part rows of the member type
_MEMBER = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING, MULTIPOLYGON: POLYGON}


def _coords_array(g: Geoms, interleaved: bool = True) -> pa.Array:
    """Coordinate child array: interleaved FixedSizeList<double>[2] or the
    SEPARATED struct<x,y> variant (reference io/_geoarrow.py:71-149 covers
    both; the engine is planar so xy only — xyz inputs are accepted on
    decode with Z dropped, matching from_wkb's documented Z-drop)."""
    if interleaved:
        flat = pa.array(np.ascontiguousarray(g.coords).ravel(), type=pa.float64())
        return pa.FixedSizeListArray.from_arrays(flat, 2)
    return pa.StructArray.from_arrays(
        [
            pa.array(np.ascontiguousarray(g.coords[:, 0]), type=pa.float64()),
            pa.array(np.ascontiguousarray(g.coords[:, 1]), type=pa.float64()),
        ],
        ["x", "y"],
    )


def _offsets(arr: np.ndarray) -> pa.Array:
    return pa.array(arr.astype(np.int32))


def encoding_of(g: Geoms) -> str:
    """The GeoArrow encoding a Geoms batch fits, or raise for mixed."""
    kinds = {int(t) for t in g.row_types if t != MISSING}
    for name, code in _SINGLE.items():
        if kinds <= ({code} | ({_MEMBER[code]} if code in _MEMBER else set())):
            if name.startswith("multi") or kinds <= {code}:
                return name
    raise ValueError(
        f"mixed geometry types {sorted(kinds)}: GeoArrow columns are single-type"
    )


def geoms_to_geoarrow(
    g: Geoms, encoding: str | None = None, interleaved: bool = True
) -> pa.Array:
    enc = encoding or encoding_of(g)
    coords = _coords_array(g, interleaved=interleaved)
    null_mask = pa.array(g.is_missing)
    # per-level offset chains straight off the CSR
    row_part = g.row_offsets
    part_ring = g.part_offsets
    ring_coord = g.ring_offsets
    row_ring = part_ring[row_part]
    row_coord = ring_coord[row_ring]
    part_coord = ring_coord[part_ring]
    if enc == "point":
        n = len(g)
        dead = g.is_missing | g.is_empty
        if dead.all():
            # coords is length 0 here: take([0]) would be out of bounds
            arr = pa.nulls(n, coords.type)
        else:
            idx = np.where(dead, 0, row_coord[:-1])
            out = coords.take(pa.array(idx.astype(np.int64)))
            if dead.any():
                m = pa.array(~dead)
                out = pa.compute.if_else(m, out, pa.nulls(n, out.type))
            arr = out
    elif enc in ("multipoint", "linestring"):
        arr = pa.ListArray.from_arrays(_offsets(row_coord), coords, mask=null_mask)
    elif enc == "polygon":
        rings = pa.ListArray.from_arrays(_offsets(ring_coord), coords)
        arr = pa.ListArray.from_arrays(_offsets(row_ring), rings, mask=null_mask)
    elif enc == "multilinestring":
        lines = pa.ListArray.from_arrays(_offsets(part_coord), coords)
        arr = pa.ListArray.from_arrays(_offsets(row_part), lines, mask=null_mask)
    elif enc == "multipolygon":
        rings = pa.ListArray.from_arrays(_offsets(ring_coord), coords)
        polys = pa.ListArray.from_arrays(_offsets(part_ring), rings)
        arr = pa.ListArray.from_arrays(_offsets(row_part), polys, mask=null_mask)
    else:
        raise ValueError(f"unknown GeoArrow encoding {enc!r}")
    return arr


def _coords_of(carr: pa.Array) -> np.ndarray:
    """(n, 2) xy from any GeoArrow coord layout: interleaved
    FixedSizeList[2] or [3] (xyz: Z dropped, planar engine) or the
    separated struct<x,y[,z]> variant."""
    if isinstance(carr, pa.ChunkedArray):
        carr = carr.combine_chunks()
    if pa.types.is_struct(carr.type):
        x = carr.field("x").to_numpy(zero_copy_only=False).astype(np.float64)
        y = carr.field("y").to_numpy(zero_copy_only=False).astype(np.float64)
        return np.column_stack([x, y]) if len(x) else np.empty((0, 2))
    w = carr.type.list_size
    flat = np.asarray(carr.values, dtype=np.float64)
    off = carr.offset * w
    c = flat[off : off + len(carr) * w].reshape(-1, w)
    return np.ascontiguousarray(c[:, :2])


def geoarrow_to_geoms(arr: pa.Array, encoding: str) -> Geoms:
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    valid = np.asarray(pa.compute.is_valid(arr))

    coords_of = _coords_of

    code = _SINGLE[encoding]
    if encoding == "point":
        c = coords_of(arr)
        ring_off = [0]
        part_off = [0]
        row_off = [0]
        part_types = []
        chunks = []
        for i in range(n):
            if valid[i]:
                chunks.append(c[i : i + 1])
                ring_off.append(ring_off[-1] + 1)
                part_off.append(part_off[-1] + 1)
                part_types.append(POINT)
            row_off.append(row_off[-1] + (1 if valid[i] else 0))
        coords = np.concatenate(chunks) if chunks else np.empty((0, 2))
        row_types = np.where(valid, POINT, MISSING).astype(np.int8)
        return Geoms(coords, ring_off, part_off, row_off, part_types, row_types)
    # nested list encodings: rebuild CSR level by level
    def offs(a) -> np.ndarray:
        o = np.asarray(a.offsets, dtype=np.int64)
        return o - o[0]  # normalize: offsets index the RAW child buffer

    if encoding in ("multipoint", "linestring"):
        coords = coords_of(arr.flatten())
        row_coord = offs(arr)
        if encoding == "linestring":
            ring_off = row_coord
            part_off = np.arange(n + 1)
            part_types = np.full(n, LINESTRING, dtype=np.int8)
            row_off = np.arange(n + 1)
        else:
            # each point is its own part with a 1-coord ring
            counts = np.diff(row_coord)
            total = int(counts.sum())
            ring_off = np.arange(total + 1)
            part_off = np.arange(total + 1)
            part_types = np.full(total, POINT, dtype=np.int8)
            row_off = row_coord
        row_types = np.where(valid, code, MISSING).astype(np.int8)
        g = Geoms(coords, ring_off, part_off, row_off, part_types, row_types)
        return _null_to_empty(g, valid)
    if encoding in ("polygon", "multilinestring"):
        inner = arr.flatten()
        coords = coords_of(inner.flatten())
        lvl1 = offs(arr)  # row -> inner
        lvl2 = offs(inner)  # inner -> coords
        if encoding == "polygon":
            ring_off = lvl2
            part_off = lvl1
            part_types = np.full(n, POLYGON, dtype=np.int8)
            row_off = np.arange(n + 1)
        else:
            ring_off = lvl2
            n_inner = len(inner)
            part_off = np.arange(n_inner + 1)
            part_types = np.full(n_inner, LINESTRING, dtype=np.int8)
            row_off = lvl1
        row_types = np.where(valid, code, MISSING).astype(np.int8)
        g = Geoms(coords, ring_off, part_off, row_off, part_types, row_types)
        return _null_to_empty(g, valid)
    if encoding == "multipolygon":
        polys = arr.flatten()
        rings = polys.flatten()
        coords = coords_of(rings.flatten())
        row_off = offs(arr)
        part_off = offs(polys)
        ring_off = offs(rings)
        part_types = np.full(len(polys), POLYGON, dtype=np.int8)
        row_types = np.where(valid, MULTIPOLYGON, MISSING).astype(np.int8)
        g = Geoms(coords, ring_off, part_off, row_off, part_types, row_types)
        return _null_to_empty(g, valid)
    raise ValueError(f"unknown GeoArrow encoding {encoding!r}")


def _null_to_empty(g: Geoms, valid: np.ndarray) -> Geoms:
    """Null rows already have zero parts; mark them MISSING (done by the
    row_types construction) - hook kept for symmetry/clarity."""
    return g


def to_geoarrow(
    ds: ray.data.Dataset,
    encoding: str | None = None,
    geometry: str = "geometry",
    interleaved: bool = True,
) -> ray.data.Dataset:
    """WKB column -> GeoArrow native nested-list column (same name), with
    the ARROW:extension:name metadata the spec prescribes.

    ``interleaved=False`` emits the SEPARATED struct<x,y> coordinate
    variant (io/_geoarrow.py interleaved param)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        enc = encoding or encoding_of(g)
        arr = geoms_to_geoarrow(g, enc, interleaved=interleaved)
        idx = b.column_names.index(geometry)
        b2 = b.set_column(idx, geometry, arr)
        field = b2.schema.field(geometry).with_metadata(
            {b"ARROW:extension:name": f"geoarrow.{enc}".encode()}
        )
        return b2.cast(b2.schema.set(idx, field))

    return ds.map_batches(f, batch_format="pyarrow")


def from_geoarrow(
    ds: ray.data.Dataset, encoding: str, geometry: str = "geometry"
) -> ray.data.Dataset:
    """GeoArrow native column -> WKB large_binary (same name)."""

    def f(b: pa.Table) -> pa.Table:
        g = geoarrow_to_geoms(b.column(geometry), encoding)
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, to_wkb(g))

    return ds.map_batches(f, batch_format="pyarrow")
