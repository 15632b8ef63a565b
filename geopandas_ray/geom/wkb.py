"""Vectorized WKB codec over a flat CSR geometry representation.

The engine carries geometry as WKB bytes inside Arrow ``large_binary``
columns (the reference's Arrow mapping: geopandas/io/arrow.py:60-112 encodes
geometry columns as WKB + "geo" schema metadata). This module decodes a
batch of WKB values into a struct-of-arrays ``Geoms`` and encodes back.

No shapely/GEOS in this environment, so the codec and all kernels are
NumPy-only. Point-only batches (the dominant shape at scale - the document
table is points) decode and encode fully vectorized; mixed/polygon batches
fall back to a per-row parse loop (the polygon side of a join is typically
the small side).

CSR layout (three nesting levels):

- ``coords``        float64 (C, 2)      all vertices of the batch
- ``ring_offsets``  int64 (R+1,)        ring r = coords[ring_offsets[r]:ring_offsets[r+1]]
                                        (a point or linestring is one "ring")
- ``part_offsets``  int64 (P+1,)        part p = rings [part_offsets[p]:part_offsets[p+1]]
                                        (a polygon part = shell ring + hole rings)
- ``row_offsets``   int64 (N+1,)        row i = parts [row_offsets[i]:row_offsets[i+1]]
- ``part_types``    int8 (P,)           1=Point 2=LineString 3=Polygon
- ``row_types``     int8 (N,)           0=missing, 1..7 = WKB geometry type codes
                                        (rows with 0 parts and row_types>0 are EMPTY,
                                        distinct from missing - testing.py:18-46 semantics)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# WKB geometry type codes (OGC)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7
MISSING = 0

TYPE_NAMES = {
    0: None,
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}

_POINT_WKB_LEN = 21  # 1 byte order + 4 type + 16 coords


class Geoms:
    """Flat CSR batch of geometries. See module docstring for layout."""

    __slots__ = (
        "coords",
        "ring_offsets",
        "part_offsets",
        "row_offsets",
        "part_types",
        "row_types",
    )

    def __init__(self, coords, ring_offsets, part_offsets, row_offsets, part_types, row_types):
        self.coords = np.asarray(coords, dtype=np.float64).reshape(-1, 2)
        self.ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
        self.part_offsets = np.asarray(part_offsets, dtype=np.int64)
        self.row_offsets = np.asarray(row_offsets, dtype=np.int64)
        self.part_types = np.asarray(part_types, dtype=np.int8)
        self.row_types = np.asarray(row_types, dtype=np.int8)

    def __len__(self):
        return len(self.row_types)

    @property
    def is_missing(self):
        return self.row_types == MISSING

    @property
    def is_empty(self):
        n_parts = self.row_offsets[1:] - self.row_offsets[:-1]
        return (n_parts == 0) & (self.row_types != MISSING)

    @property
    def all_points(self):
        """True when every non-missing row is a single Point."""
        return bool(np.all((self.row_types == POINT) | (self.row_types == MISSING)))

    def row_part_range(self, i):
        return int(self.row_offsets[i]), int(self.row_offsets[i + 1])

    def part_ring_range(self, p):
        return int(self.part_offsets[p]), int(self.part_offsets[p + 1])

    def ring_coords(self, r):
        return self.coords[self.ring_offsets[r] : self.ring_offsets[r + 1]]

    def take(self, indices) -> "Geoms":
        """Gather rows by integer indices (repeats allowed)."""
        indices = np.asarray(indices, dtype=np.int64)
        coords_chunks = []
        ring_off = [0]
        part_off = [0]
        row_off = [0]
        part_types = []
        for i in indices:
            p0, p1 = self.row_part_range(i)
            for p in range(p0, p1):
                r0, r1 = self.part_ring_range(p)
                for r in range(r0, r1):
                    c = self.ring_coords(r)
                    coords_chunks.append(c)
                    ring_off.append(ring_off[-1] + len(c))
                part_off.append(part_off[-1] + (r1 - r0))
                part_types.append(self.part_types[p])
            row_off.append(row_off[-1] + (p1 - p0))
        coords = (
            np.concatenate(coords_chunks) if coords_chunks else np.empty((0, 2), dtype=np.float64)
        )
        return Geoms(coords, ring_off, part_off, row_off, part_types, self.row_types[indices])


def _empty_geoms(n: int, row_types=None) -> Geoms:
    rt = np.zeros(n, dtype=np.int8) if row_types is None else row_types
    z = np.zeros(n + 1, dtype=np.int64)
    return Geoms(np.empty((0, 2)), [0], [0], z, np.empty(0, dtype=np.int8), rt)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------


def _binary_parts(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (data_bytes, offsets, validity_bool) for an Arrow binary array,
    a numpy object array, or a Python list of bytes/None."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (pa.LargeBinaryArray, pa.BinaryArray)):
        valid = np.asarray(arr.is_valid())
        # concatenate via python; offsets from buffers
        bufs = arr.buffers()
        off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        return data, offsets.astype(np.int64), valid
    # generic python sequence
    vals = list(arr)
    valid = np.array([v is not None for v in vals], dtype=bool)
    chunks = [v if v is not None else b"" for v in vals]
    lens = np.array([len(c) for c in chunks], dtype=np.int64)
    offsets = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    return data, offsets, valid


def from_wkb(arr) -> Geoms:
    """Decode a batch of WKB values (Arrow binary array / list of bytes|None).

    Mirrors geopandas.array.from_wkb (reference geopandas/array.py:118) minus
    shapely: output is the CSR ``Geoms``.
    """
    data, offsets, valid = _binary_parts(arr)
    n = len(offsets) - 1
    if n == 0:
        return _empty_geoms(0)
    lens = offsets[1:] - offsets[:-1]

    # ---- vectorized fast path: every valid row is a little-endian 2D Point
    pt_rows = valid & (lens == _POINT_WKB_LEN)
    if pt_rows.all():
        starts = offsets[:-1]
        head_ok = (data[starts] == 1) & (data[starts + 1] == POINT) & (data[starts + 2] == 0)
        if head_ok.all():
            idx = starts[:, None] + (5 + np.arange(16))[None, :]
            xy = data[idx].reshape(-1).view(np.float64).reshape(n, 2)
            one = np.ones(n, dtype=np.int64)
            ring_off = np.concatenate([[0], np.cumsum(one)])
            return Geoms(
                xy,
                ring_off,
                ring_off.copy(),
                ring_off.copy(),
                np.full(n, POINT, dtype=np.int8),
                np.full(n, POINT, dtype=np.int8),
            )

    # ---- generic loop path
    coords_chunks: list[np.ndarray] = []
    ring_off = [0]
    part_off = [0]
    row_off = [0]
    part_types: list[int] = []
    row_types = np.zeros(n, dtype=np.int8)
    raw = data.tobytes()

    for i in range(n):
        if not valid[i]:
            row_off.append(row_off[-1])
            continue
        buf = raw[offsets[i] : offsets[i + 1]]
        if len(buf) == 0:
            row_off.append(row_off[-1])
            continue
        gtype, nparts = _parse_geom(buf, 0, coords_chunks, ring_off, part_off, part_types)[1:]
        row_types[i] = gtype
        row_off.append(row_off[-1] + nparts)

    coords = np.concatenate(coords_chunks) if coords_chunks else np.empty((0, 2))
    return Geoms(coords, ring_off, part_off, row_off, part_types, row_types)


def _parse_geom(buf, pos, coords_chunks, ring_off, part_off, part_types):
    """Parse one geometry at ``pos``; append to CSR builders.

    Returns (new_pos, top_level_type, n_parts_appended).
    """
    byte_order = buf[pos]
    endian = "<" if byte_order == 1 else ">"
    (raw_type,) = struct.unpack_from(endian + "I", buf, pos + 1)
    # every op is planar (reference base.py:93-95): decode Z/M but drop
    # them. Dims must honor BOTH conventions, combined: ISO blocks
    # (+1000 Z, +2000 M, +3000 ZM) and the EWKB flag bits (0x80000000 Z,
    # 0x40000000 M). The old `base >= 1000 -> 3` read only 3 of a ZM
    # vertex's 4 doubles, interleaving M values into later coordinates.
    base = raw_type & 0x1FFFFFFF
    iso_block = base // 1000  # 0=2D 1=Z 2=M 3=ZM
    has_z = bool(raw_type & 0x80000000) or iso_block in (1, 3)
    has_m = bool(raw_type & 0x40000000) or iso_block in (2, 3)
    dims = 2 + int(has_z) + int(has_m)
    gtype = base % 1000
    pos += 5

    if gtype == POINT:
        vals = struct.unpack_from(endian + "d" * dims, buf, pos)
        pos += 8 * dims
        if all(v != v for v in vals):  # POINT EMPTY encoded as NaN coords
            return pos, POINT, 0
        coords_chunks.append(np.array([[vals[0], vals[1]]]))
        ring_off.append(ring_off[-1] + 1)
        part_off.append(part_off[-1] + 1)
        part_types.append(POINT)
        return pos, POINT, 1

    if gtype == LINESTRING:
        (npts,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        if npts == 0:
            return pos, LINESTRING, 0
        flat = np.frombuffer(buf, dtype=endian + "f8", count=npts * dims, offset=pos)
        pos += 8 * dims * npts
        coords_chunks.append(flat.reshape(npts, dims)[:, :2].astype(np.float64))
        ring_off.append(ring_off[-1] + npts)
        part_off.append(part_off[-1] + 1)
        part_types.append(LINESTRING)
        return pos, LINESTRING, 1

    if gtype == POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        if nrings == 0:
            return pos, POLYGON, 0
        for _ in range(nrings):
            (npts,) = struct.unpack_from(endian + "I", buf, pos)
            pos += 4
            flat = np.frombuffer(buf, dtype=endian + "f8", count=npts * dims, offset=pos)
            pos += 8 * dims * npts
            coords_chunks.append(flat.reshape(npts, dims)[:, :2].astype(np.float64))
            ring_off.append(ring_off[-1] + npts)
        part_off.append(part_off[-1] + nrings)
        part_types.append(POLYGON)
        return pos, POLYGON, 1

    if gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (ngeom,) = struct.unpack_from(endian + "I", buf, pos)
        pos += 4
        total_parts = 0
        for _ in range(ngeom):
            pos, _, nparts = _parse_geom(buf, pos, coords_chunks, ring_off, part_off, part_types)
            total_parts += nparts
        return pos, gtype, total_parts

    raise ValueError(f"unsupported WKB geometry type {raw_type}")


# ---------------------------------------------------------------------------
# Encoding
# ---------------------------------------------------------------------------


def points_to_wkb(x, y) -> pa.LargeBinaryArray:
    """Vectorized: build WKB Point bytes from coordinate arrays.

    Same bytes GeoPandas' to_wkb would produce (geoseries.py:1040): little
    endian, type 1, two float64.
    """
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    n = len(x)
    out = np.zeros((n, _POINT_WKB_LEN), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1] = POINT
    out[:, 5:13] = x.view(np.uint8).reshape(n, 8)
    out[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    data = out.reshape(-1).tobytes()
    offsets = np.arange(0, (n + 1) * _POINT_WKB_LEN, _POINT_WKB_LEN, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)]
    )


def _encode_part(p: int, g: Geoms) -> bytes:
    t = int(g.part_types[p])
    r0, r1 = g.part_ring_range(p)
    if t == POINT:
        c = g.ring_coords(r0)
        return struct.pack("<BI2d", 1, POINT, c[0, 0], c[0, 1])
    if t == LINESTRING:
        c = g.ring_coords(r0)
        return struct.pack("<BII", 1, LINESTRING, len(c)) + c.astype("<f8").tobytes()
    if t == POLYGON:
        out = [struct.pack("<BII", 1, POLYGON, r1 - r0)]
        for r in range(r0, r1):
            c = g.ring_coords(r)
            out.append(struct.pack("<I", len(c)) + c.astype("<f8").tobytes())
        return b"".join(out)
    raise ValueError(f"bad part type {t}")


_MULTI_OF = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING, POLYGON: MULTIPOLYGON}
_EMPTY_WKB = {
    POINT: struct.pack("<BI2d", 1, POINT, float("nan"), float("nan")),
    LINESTRING: struct.pack("<BII", 1, LINESTRING, 0),
    POLYGON: struct.pack("<BII", 1, POLYGON, 0),
    MULTIPOINT: struct.pack("<BII", 1, MULTIPOINT, 0),
    MULTILINESTRING: struct.pack("<BII", 1, MULTILINESTRING, 0),
    MULTIPOLYGON: struct.pack("<BII", 1, MULTIPOLYGON, 0),
    GEOMETRYCOLLECTION: struct.pack("<BII", 1, GEOMETRYCOLLECTION, 0),
}


def to_wkb(g: Geoms) -> pa.LargeBinaryArray:
    """Encode a ``Geoms`` batch back to an Arrow large_binary WKB column."""
    n = len(g)
    # vectorized point fast path
    if g.all_points and not g.is_missing.any() and not g.is_empty.any():
        return points_to_wkb(g.coords[:, 0], g.coords[:, 1])

    vals: list[bytes | None] = []
    for i in range(n):
        t = int(g.row_types[i])
        if t == MISSING:
            vals.append(None)
            continue
        p0, p1 = g.row_part_range(i)
        if p1 == p0:
            vals.append(_EMPTY_WKB[t])
            continue
        if p1 - p0 == 1 and t == int(g.part_types[p0]):
            vals.append(_encode_part(p0, g))
            continue
        # multi / collection
        body = b"".join(_encode_part(p, g) for p in range(p0, p1))
        out_type = t
        if t not in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            out_type = _MULTI_OF[int(g.part_types[p0])]
        vals.append(struct.pack("<BII", 1, out_type, p1 - p0) + body)
    return pa.array(vals, type=pa.large_binary())


# ---------------------------------------------------------------------------
# Constructors (reference: geoseries.py:295 from_wkt-ish helpers not needed;
# points_from_xy mirrors array.py:210)
# ---------------------------------------------------------------------------


def points_from_xy(x, y) -> Geoms:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    off = np.arange(n + 1, dtype=np.int64)
    return Geoms(
        np.column_stack([x, y]),
        off,
        off.copy(),
        off.copy(),
        np.full(n, POINT, dtype=np.int8),
        np.full(n, POINT, dtype=np.int8),
    )


def _poly_geoms(list_of_rings_lists) -> Geoms:
    """Build polygons from [[shell, hole, ...], ...]; each ring an (m,2) array.

    Rings are closed automatically if the caller did not repeat the first
    vertex (WKB requires closed rings).
    """
    coords_chunks = []
    ring_off = [0]
    part_off = [0]
    row_off = [0]
    part_types = []
    n = len(list_of_rings_lists)
    row_types = np.zeros(n, dtype=np.int8)
    for i, rings in enumerate(list_of_rings_lists):
        if rings is None:
            row_off.append(row_off[-1])
            continue
        row_types[i] = POLYGON
        if len(rings) == 0:
            row_off.append(row_off[-1])
            continue
        for ring in rings:
            ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
            if len(ring) and not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            coords_chunks.append(ring)
            ring_off.append(ring_off[-1] + len(ring))
        part_off.append(part_off[-1] + len(rings))
        part_types.append(POLYGON)
        row_off.append(row_off[-1] + 1)
    coords = np.concatenate(coords_chunks) if coords_chunks else np.empty((0, 2))
    return Geoms(coords, ring_off, part_off, row_off, part_types, row_types)


def box_geoms(minx, miny, maxx, maxy) -> Geoms:
    """Vectorized: one axis-aligned rectangle Polygon per row (CCW shells)."""
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    n = len(minx)
    coords = np.empty((n * 5, 2), dtype=np.float64)
    coords[0::5] = np.column_stack([minx, miny])
    coords[1::5] = np.column_stack([maxx, miny])
    coords[2::5] = np.column_stack([maxx, maxy])
    coords[3::5] = np.column_stack([minx, maxy])
    coords[4::5] = np.column_stack([minx, miny])
    ring_off = np.arange(0, (n + 1) * 5, 5, dtype=np.int64)
    off = np.arange(n + 1, dtype=np.int64)
    return Geoms(
        coords,
        ring_off,
        off,
        off.copy(),
        np.full(n, POLYGON, dtype=np.int8),
        np.full(n, POLYGON, dtype=np.int8),
    )


def boxes_to_wkb(minx, miny, maxx, maxy) -> pa.LargeBinaryArray:
    """Vectorized WKB encoding of axis-aligned rectangles (93 bytes each)."""
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    n = len(minx)
    # header: order(1) type(4) nrings(4) npts(4) = 13 bytes, then 5 xy pairs
    item = 13 + 5 * 16
    out = np.zeros((n, item), dtype=np.uint8)
    out[:, 0] = 1
    out[:, 1] = POLYGON
    out[:, 5] = 1  # nrings
    out[:, 9] = 5  # npts
    ring = np.empty((n, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = minx, miny
    ring[:, 2], ring[:, 3] = maxx, miny
    ring[:, 4], ring[:, 5] = maxx, maxy
    ring[:, 6], ring[:, 7] = minx, maxy
    ring[:, 8], ring[:, 9] = minx, miny
    out[:, 13:] = ring.view(np.uint8).reshape(n, 80)
    offsets = np.arange(0, (n + 1) * item, item, dtype=np.int64)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(out.tobytes())]
    )


def single_rings_to_wkb(kinds: np.ndarray, lens: np.ndarray, coords: np.ndarray) -> pa.LargeBinaryArray:
    """Vectorized WKB encoder for one-part, single-ring rows.

    ``kinds``: per-row geometry type — POINT (len 1), LINESTRING, or
    POLYGON (exactly one ring, already closed). ``lens``: coords per row.
    ``coords``: the rows' coordinates concatenated, shape (sum(lens), 2).
    Byte-identical to the generic ``to_wkb`` encoder (asserted in tests);
    builds the whole column with numpy scatters — no per-row Python."""
    kinds = np.asarray(kinds, dtype=np.uint8)
    lens = np.asarray(lens, dtype=np.int64)
    n = len(kinds)
    hdr = np.where(kinds == POLYGON, 13, np.where(kinds == LINESTRING, 9, 5)).astype(np.int64)
    sizes = hdr + 16 * lens
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(sizes, out=offs[1:])
    buf = np.zeros(int(offs[-1]), dtype=np.uint8)
    base = offs[:-1]
    buf[base] = 1  # little-endian flag
    buf[base + 1] = kinds  # uint32 type: low byte only for 1..3
    lens32 = np.ascontiguousarray(lens.astype("<u4")).view(np.uint8).reshape(n, 4)
    m3 = kinds == POLYGON
    if m3.any():
        b3 = base[m3]
        buf[b3 + 5] = 1  # numRings = 1
        pos = (b3[:, None] + 9 + np.arange(4)[None, :]).ravel()
        buf[pos] = lens32[m3].ravel()
    m2 = kinds == LINESTRING
    if m2.any():
        b2 = base[m2]
        pos = (b2[:, None] + 5 + np.arange(4)[None, :]).ravel()
        buf[pos] = lens32[m2].ravel()
    cb = np.ascontiguousarray(coords, dtype="<f8").view(np.uint8).ravel()
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(16 * lens, out=cum[1:])
    within = np.arange(len(cb), dtype=np.int64) - np.repeat(cum[:-1], 16 * lens)
    buf[np.repeat(base + hdr, 16 * lens) + within] = cb
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(buf)]
    )
