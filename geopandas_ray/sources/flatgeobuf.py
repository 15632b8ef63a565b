"""Native FlatGeobuf (.fgb) source/sink — no GDAL.

Format: the public FlatGeobuf spec (flatgeobuf.org / BSD reference
implementation): 8-byte magic ``fgb\\x03fgb\\x00``, a size-prefixed
flatbuffers ``Header``, an optional packed Hilbert R-tree index (40-byte
nodes: 4 float64 bbox + uint64 offset), then size-prefixed flatbuffers
``Feature`` records. Reference surface: io/file.py:50 (the OGR formats the
reference reads through GDAL; this engine parses the format natively like
its shapefile/GeoPackage sources).

Flatbuffers are parsed and built directly from the public wire format
(vtable / soffset / uoffset rules) — the ``flatbuffers`` runtime isn't in
this container, and the two fixed schemas (Header, Feature/Geometry) don't
need codegen.

Scale design (the point of the format's R-tree): the DRIVER reads only the
header — O(1) bytes. Each shard task seeks into the LEAF level of the
packed R-tree to learn its own feature byte range (one contiguous pread of
40 B/feature for its slice only), then parses its features sequentially.
With ``bbox=`` the shard prunes by leaf-node bbox BEFORE touching the
feature section at all: a shard with zero intersecting leaves returns empty
without a single feature-section read (row-group-style pushdown). Files
without an index fall back to one sequential scan task.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

MAGIC = b"fgb\x03fgb\x00"
NODE_LEN = 40  # 4 float64 bbox + uint64 offset

# GeometryType enum (header.fbs)
GT_UNKNOWN, GT_POINT, GT_LINESTRING, GT_POLYGON = 0, 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_COLLECTION = 4, 5, 6, 7

# ColumnType enum (header.fbs) -> (arrow type, struct fmt or None)
_COLTYPES = {
    0: (pa.int8(), "<b"),      # Byte
    1: (pa.uint8(), "<B"),     # UByte
    2: (pa.bool_(), "<?"),     # Bool
    3: (pa.int16(), "<h"),     # Short
    4: (pa.uint16(), "<H"),    # UShort
    5: (pa.int32(), "<i"),     # Int
    6: (pa.uint32(), "<I"),    # UInt
    7: (pa.int64(), "<q"),     # Long
    8: (pa.uint64(), "<Q"),    # ULong
    9: (pa.float32(), "<f"),   # Float
    10: (pa.float64(), "<d"),  # Double
    11: (pa.string(), None),   # String
    12: (pa.string(), None),   # Json
    13: (pa.string(), None),   # DateTime (ISO string)
    14: (pa.large_binary(), None),  # Binary
}
_ARROW_TO_COLTYPE = [
    (pa.types.is_boolean, 2),
    (pa.types.is_int8, 0), (pa.types.is_uint8, 1),
    (pa.types.is_int16, 3), (pa.types.is_uint16, 4),
    (pa.types.is_int32, 5), (pa.types.is_uint32, 6),
    (pa.types.is_int64, 7), (pa.types.is_uint64, 8),
    (pa.types.is_float32, 9), (pa.types.is_float64, 10),
    (pa.types.is_string, 11), (pa.types.is_large_string, 11),
    (pa.types.is_binary, 14), (pa.types.is_large_binary, 14),
]


# ---------------------------------------------------------------------------
# minimal flatbuffers wire-format access (read)
# ---------------------------------------------------------------------------


def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _i32(b, p):
    return struct.unpack_from("<i", b, p)[0]


class _FB:
    """Table accessor: pos -> soffset -> vtable -> per-slot field offsets."""

    __slots__ = ("b", "pos", "vt", "vsize")

    def __init__(self, buf, pos):
        self.b = buf
        self.pos = pos
        self.vt = pos - _i32(buf, pos)
        self.vsize = _u16(buf, self.vt)

    def _field(self, slot):
        off = 4 + 2 * slot
        if off >= self.vsize:
            return 0
        v = _u16(self.b, self.vt + off)
        return (self.pos + v) if v else 0

    def scalar(self, slot, fmt, default):
        p = self._field(slot)
        return struct.unpack_from(fmt, self.b, p)[0] if p else default

    def indirect(self, slot):
        p = self._field(slot)
        return (p + _u32(self.b, p)) if p else 0

    def string(self, slot):
        t = self.indirect(slot)
        if not t:
            return None
        n = _u32(self.b, t)
        return bytes(self.b[t + 4 : t + 4 + n]).decode("utf-8")

    def vector(self, slot):
        """(position of element 0, element count); (0, 0) when absent."""
        t = self.indirect(slot)
        if not t:
            return 0, 0
        return t + 4, _u32(self.b, t)


# ---------------------------------------------------------------------------
# minimal flatbuffers wire-format assembly (write)
# ---------------------------------------------------------------------------


def _fb_table(scalars: dict, refs: dict) -> bytes:
    """Serialize one table to a position-independent blob (table at 0).

    scalars: {slot: (struct fmt, value)} stored inline;
    refs: {slot: child blob} (string / vector / table) spliced after the
    vtable with forward uoffsets. Layout: [soffset][inline][vtable][children]
    with the vtable directly after the inline area (soffset = -tsize).
    """
    slots = sorted(set(scalars) | set(refs))
    max_slot = slots[-1] if slots else -1
    off = 4
    voffs: dict = {}
    parts: list = []
    for s in slots:
        if s in scalars:
            fmt, v = scalars[s]
            size = struct.calcsize(fmt)
            pad = (-off) % size
            parts.append(b"\x00" * pad)
            off += pad
            voffs[s] = off
            parts.append(struct.pack(fmt, v))
            off += size
        else:
            pad = (-off) % 4
            parts.append(b"\x00" * pad)
            off += pad
            voffs[s] = off
            parts.append(b"\x00\x00\x00\x00")  # uoffset patched below
            off += 4
    tsize = off
    vt = struct.pack("<HH", 4 + 2 * (max_slot + 1), tsize) + b"".join(
        struct.pack("<H", voffs.get(s, 0)) for s in range(max_slot + 1)
    )
    blob = bytearray(struct.pack("<i", -tsize))
    for p in parts:
        blob += p
    blob += vt
    for s in slots:
        if s in refs:
            pad = (-(len(blob) + 4)) % 8  # child data areas 8-aligned-ish
            blob += b"\x00" * pad
            struct.pack_into("<I", blob, voffs[s], len(blob) - voffs[s])
            blob += refs[s]
    return bytes(blob)


def _fb_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<I", len(b)) + b + b"\x00"


def _fb_scalar_vec(fmt_char: str, values) -> bytes:
    arr = np.asarray(values)
    return struct.pack("<I", len(arr)) + arr.astype(fmt_char).tobytes()


def _fb_vec_tables(blobs: list) -> bytes:
    out = bytearray(struct.pack("<I", len(blobs)))
    slot_pos = []
    for _ in blobs:
        slot_pos.append(len(out))
        out += b"\x00" * 4
    for i, bl in enumerate(blobs):
        out += b"\x00" * ((-len(out)) % 8)
        struct.pack_into("<I", out, slot_pos[i], len(out) - slot_pos[i])
        out += bl
    return bytes(out)


def _size_prefixed(root_table_blob: bytes) -> bytes:
    buf = struct.pack("<I", 4) + root_table_blob  # root uoffset -> table at 4
    return struct.pack("<I", len(buf)) + buf


# ---------------------------------------------------------------------------
# packed Hilbert R-tree math (public reference layout: root level first,
# leaves last; internal node offset = first-child NODE INDEX, leaf offset =
# feature byte offset relative to the features section)
# ---------------------------------------------------------------------------


def _tree_levels(num_items: int, node_size: int) -> list[int]:
    """Nodes per level, leaf level first (do-while: 1 item -> [1, 1])."""
    ns = min(max(int(node_size), 2), 65535)
    sizes = [num_items]
    n = num_items
    while True:
        n = -(-n // ns)
        sizes.append(n)
        if n == 1:
            break
    return sizes


def _tree_num_nodes(num_items: int, node_size: int) -> int:
    return sum(_tree_levels(num_items, node_size))


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------


def _read_header(path: str) -> dict:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:3] != MAGIC[:3] or magic[4:7] != MAGIC[4:7]:
            raise ValueError(f"{path!r} is not a FlatGeobuf file (bad magic)")
        hsize = struct.unpack("<I", f.read(4))[0]
        buf = f.read(hsize)
        file_size = os.fstat(f.fileno()).st_size
    h = _FB(buf, _u32(buf, 0))
    cols = []
    cpos, cn = h.vector(7)
    for k in range(cn):
        ep = cpos + 4 * k
        c = _FB(buf, ep + _u32(buf, ep))
        cols.append((c.string(0), c.scalar(1, "<B", 0)))
    crs_code = None
    crs_pos = h.indirect(10)
    if crs_pos:
        crs_code = _FB(buf, crs_pos).scalar(1, "<i", 0) or None
    n = h.scalar(8, "<Q", 0)
    node_size = h.scalar(9, "<H", 16)
    index_size = _tree_num_nodes(n, node_size) * NODE_LEN if (node_size > 0 and n > 0) else 0
    return {
        "name": h.string(0),
        "geometry_type": h.scalar(2, "<B", 0),
        "has_z": h.scalar(3, "<?", False),
        "columns": cols,
        "features_count": n,
        "node_size": node_size,
        "crs_code": crs_code,
        "index_start": 12 + hsize,
        "features_start": 12 + hsize + index_size,
        "file_size": file_size,
        "has_index": index_size > 0,
    }


def _geom_to_parts(buf, g: _FB, default_type: int, out: list) -> None:
    """Append (wkb_part_type, rings) entries for one Geometry table."""
    t = g.scalar(6, "<B", 0) or default_type
    ppos, pn = g.vector(7)
    if pn:  # MultiPolygon / GeometryCollection: recursive parts
        child_default = GT_POLYGON if t == GT_MULTIPOLYGON else 0
        for k in range(pn):
            ep = ppos + 4 * k
            _geom_to_parts(buf, _FB(buf, ep + _u32(buf, ep)), child_default, out)
        return
    xpos, xn = g.vector(1)
    if xn == 0:
        return
    coords = np.frombuffer(buf, dtype="<f8", count=xn, offset=xpos).reshape(-1, 2)
    epos, en = g.vector(0)
    ends = (
        np.frombuffer(buf, dtype="<u4", count=en, offset=epos).astype(np.int64)
        if en
        else np.array([len(coords)], dtype=np.int64)
    )
    if t == GT_POINT:
        out.append((1, [coords[:1]]))
    elif t == GT_MULTIPOINT:
        for i in range(len(coords)):
            out.append((1, [coords[i : i + 1]]))
    elif t in (GT_LINESTRING, GT_MULTILINESTRING):
        s = 0
        for e in ends:
            out.append((2, [coords[s:e]]))
            s = int(e)
    elif t in (GT_POLYGON, GT_MULTIPOLYGON):
        # flat polygon encoding: ends delimit rings (spec: a MultiPolygon
        # with one part may be encoded flat, same as Polygon)
        rings = []
        s = 0
        for e in ends:
            rings.append(coords[s:e])
            s = int(e)
        out.append((3, rings))
    else:
        raise ValueError(f"unsupported FlatGeobuf geometry type {t}")


def _decode_properties(buf, pos, count, cols, row_out):
    """One feature's properties bytes -> per-column values in row_out."""
    p = pos
    end = pos + count
    while p < end:
        idx = _u16(buf, p)
        p += 2
        name, ct = cols[idx]
        at, fmt = _COLTYPES[ct]
        if fmt is not None:
            row_out[idx] = struct.unpack_from(fmt, buf, p)[0]
            p += struct.calcsize(fmt)
        else:
            n = _u32(buf, p)
            p += 4
            raw = bytes(buf[p : p + n])
            p += n
            row_out[idx] = raw if ct == 14 else raw.decode("utf-8")


class _FgbShard:
    """Decode one leaf-range shard (or the whole file when no index).

    The file handle opens once per actor; each shard row reads its own leaf
    slice and the matching feature span only.
    """

    def __init__(self, path, meta, geometry, columns, bbox):
        self.path = path
        self.meta = meta
        self.geometry = geometry
        self.columns = columns
        self.bbox = bbox
        self.f = open(path, "rb")
        cols = meta["columns"]
        self.keep_idx = [
            i for i, (nm, _) in enumerate(cols)
            if columns is None or nm in columns
        ]

    def _read_span(self, start: int, size: int) -> bytes:
        self.f.seek(start)
        return self.f.read(size)

    def _leaf_nodes(self, leaf_lo: int, leaf_hi: int):
        m = self.meta
        levels = _tree_levels(m["features_count"], m["node_size"])
        leaf_node0 = sum(levels) - levels[0]  # leaves are stored LAST
        start = m["index_start"] + (leaf_node0 + leaf_lo) * NODE_LEN
        raw = self._read_span(start, (leaf_hi - leaf_lo) * NODE_LEN)
        rec = np.frombuffer(raw, dtype=[("b", "<f8", 4), ("off", "<u8")])
        return rec["b"], rec["off"].astype(np.int64)

    def _parse_features(self, blob, rel_offsets) -> pa.Table:
        from ..geom.wkb import Geoms  # noqa: F401 (documented dependency)
        from ..stages.clip import _parts_to_wkb

        cols_meta = self.meta["columns"]
        default_t = self.meta["geometry_type"]
        prop_rows: list = []
        wkbs: list = []
        for off in rel_offsets:
            fsize = _u32(blob, off)
            fpos = off + 4
            ft = _FB(blob, fpos + _u32(blob, fpos))
            parts: list = []
            top_t = 0
            gpos = ft.indirect(0)
            if gpos:
                gfb = _FB(blob, gpos)
                top_t = gfb.scalar(6, "<B", 0) or default_t
                _geom_to_parts(blob, gfb, default_t, parts)
            # declared Multi*/collection stays Multi even with one part
            # (the spec's flat one-part MultiPolygon encoding, OGR parity)
            wkbs.append(
                _parts_to_wkb(parts, force_multi=top_t >= GT_MULTIPOINT)
                if parts else None
            )
            row = [None] * len(cols_meta)
            ppos, pn = ft.vector(1)
            if pn:
                _decode_properties(blob, ppos, pn, cols_meta, row)
            prop_rows.append(row)
        out: dict = {}
        for i in self.keep_idx:
            nm, ct = cols_meta[i]
            out[nm] = pa.array([r[i] for r in prop_rows], type=_COLTYPES[ct][0])
        out[self.geometry] = pa.array(wkbs, type=pa.large_binary())
        return pa.table(out)

    def _empty(self) -> pa.Table:
        out = {
            nm: pa.array([], type=_COLTYPES[ct][0])
            for i, (nm, ct) in enumerate(self.meta["columns"])
            if i in self.keep_idx
        }
        out[self.geometry] = pa.array([], type=pa.large_binary())
        return pa.table(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.meta
        tables = []
        for row in batch.to_pylist():
            if row.get("sequential"):
                blob = self._read_span(
                    m["features_start"], m["file_size"] - m["features_start"]
                )
                offs, p = [], 0
                while p + 4 <= len(blob):
                    offs.append(p)
                    p += 4 + _u32(blob, p)
                t = self._parse_features(blob, offs)
                if self.bbox is not None:
                    t = _bbox_filter(t, self.geometry, self.bbox)
                tables.append(t)
                continue
            lo, hi = int(row["leaf_lo"]), int(row["leaf_hi"])
            bounds, offsets = self._leaf_nodes(lo, hi)
            take = np.ones(len(offsets), dtype=bool)
            if self.bbox is not None:
                qx0, qy0, qx1, qy1 = self.bbox
                take = (
                    (bounds[:, 0] <= qx1) & (bounds[:, 2] >= qx0)
                    & (bounds[:, 1] <= qy1) & (bounds[:, 3] >= qy0)
                )
                if not take.any():
                    # index-only pruning: the feature section is never read
                    tables.append(self._empty())
                    continue
            span_lo = int(offsets[0])
            span_hi = (
                int(row["next_off"]) if row["next_off"] >= 0
                else m["file_size"] - m["features_start"]
            )
            blob = self._read_span(m["features_start"] + span_lo, span_hi - span_lo)
            rel = (offsets[take] - span_lo).tolist()
            t = self._parse_features(blob, rel)
            if self.bbox is not None:
                # exact post-filter on top of the index prune — null/empty
                # geometries carry a (0,0,0,0) leaf bbox the index test can
                # wrongly admit; this keeps indexed == sequential results
                t = _bbox_filter(t, self.geometry, self.bbox)
            tables.append(t)
        out = pa.concat_tables(tables) if tables else self._empty()
        return out


def _bbox_filter(t: pa.Table, geometry: str, bbox) -> pa.Table:
    from ..geom import kernels as K
    from ..geom.wkb import from_wkb

    if t.num_rows == 0:
        return t
    b = K.bounds(from_wkb(t.column(geometry)))
    qx0, qy0, qx1, qy1 = bbox
    keep = (b[:, 0] <= qx1) & (b[:, 2] >= qx0) & (b[:, 1] <= qy1) & (b[:, 3] >= qy0)
    return t.filter(pa.array(keep))


def read_flatgeobuf(
    path: str,
    geometry: str = "geometry",
    columns: list[str] | None = None,
    bbox: tuple | None = None,
    shard_features: int = 65536,
) -> ray.data.Dataset:
    """Parallel FlatGeobuf read with R-tree leaf pushdown.

    ``bbox`` (minx, miny, maxx, maxy) prunes features by their INDEX bbox
    before any feature bytes are read or parsed (exact post-filter applied
    on top, so the result equals a full read + filter). ``columns`` narrows
    the property columns (geometry always kept).
    """
    meta = _read_header(path)
    if any(nm == geometry for nm, _ in meta["columns"]):
        raise ValueError(
            f"FlatGeobuf property {geometry!r} collides with the geometry "
            "output column; pass geometry=<other name>"
        )
    n = meta["features_count"]
    shards: list[dict] = []
    if meta["has_index"]:
        starts = list(range(0, n, shard_features))
        for i, s in enumerate(starts):
            e = min(n, s + shard_features)
            shards.append({"leaf_lo": s, "leaf_hi": e, "next_off": -1, "sequential": False})
        # each shard's feature span ends at the NEXT shard's first feature
        # offset; resolve those boundary offsets once on the driver (one
        # 40-byte read per shard — O(shards), not O(features))
        if len(shards) > 1:
            levels = _tree_levels(n, meta["node_size"])
            leaf_node0 = sum(levels) - levels[0]
            with open(path, "rb") as f:
                for i in range(len(shards) - 1):
                    nxt = shards[i + 1]["leaf_lo"]
                    f.seek(meta["index_start"] + (leaf_node0 + nxt) * NODE_LEN + 32)
                    shards[i]["next_off"] = struct.unpack("<Q", f.read(8))[0]
    else:
        shards.append({"leaf_lo": 0, "leaf_hi": 0, "next_off": -1, "sequential": True})
    if not shards:  # indexed file with zero features
        shards.append({"leaf_lo": 0, "leaf_hi": 0, "next_off": -1, "sequential": True})
    from ..util import default_pool

    ds = ray.data.from_items(shards)
    return ds.map_batches(
        _FgbShard,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=default_pool(),
        fn_constructor_kwargs=dict(
            path=path, meta=meta, geometry=geometry, columns=columns, bbox=bbox
        ),
    )


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------


def _encode_geometry(g, i) -> tuple[bytes, tuple] | None:
    """Row i -> (Geometry table blob, bbox); None for missing/empty."""
    from ..geom import kernels as K  # noqa: F401

    if g.is_missing[i] or g.is_empty[i]:
        return None
    p0, p1 = g.row_part_range(i)
    parts = []
    for p in range(p0, p1):
        r0, r1 = g.part_ring_range(p)
        parts.append((int(g.part_types[p]), [g.ring_coords(r) for r in range(r0, r1)]))
    t = int(g.row_types[i])
    allc = np.concatenate([r for _, rings in parts for r in rings])
    bbox = (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())

    def flat(coords_list):
        xy = np.concatenate(coords_list)
        ends = np.cumsum([len(c) for c in coords_list])
        refs = {1: _fb_scalar_vec("<f8", xy.reshape(-1))}
        if len(coords_list) > 1:
            refs[0] = _fb_scalar_vec("<u4", ends)
        return refs

    if t in (1, 4):  # (Multi)Point
        gt = GT_POINT if t == 1 else GT_MULTIPOINT
        xy = np.concatenate([rings[0] for _, rings in parts])
        blob = _fb_table({6: ("<B", gt)}, {1: _fb_scalar_vec("<f8", xy.reshape(-1))})
    elif t in (2, 5):  # (Multi)LineString
        gt = GT_LINESTRING if t == 2 else GT_MULTILINESTRING
        blob = _fb_table({6: ("<B", gt)}, flat([rings[0] for _, rings in parts]))
    elif t == 3:  # Polygon: ends delimit rings
        blob = _fb_table({6: ("<B", GT_POLYGON)}, flat(parts[0][1]))
    elif t == 6:  # MultiPolygon: one child Geometry per polygon
        children = [_fb_table({6: ("<B", GT_POLYGON)}, flat(rings)) for _, rings in parts]
        blob = _fb_table({6: ("<B", GT_MULTIPOLYGON)}, {7: _fb_vec_tables(children)})
    else:
        raise NotImplementedError(
            "write_flatgeobuf: GeometryCollection rows are not supported "
            "(the engine's .fgb sink covers the six simple-feature types); "
            "explode() the collection first"
        )
    return blob, bbox


def _encode_properties(row_vals, col_meta) -> bytes:
    out = bytearray()
    for idx, ((nm, ct), v) in enumerate(zip(col_meta, row_vals)):
        if v is None:
            continue
        out += struct.pack("<H", idx)
        _, fmt = _COLTYPES[ct]
        if fmt is not None:
            out += struct.pack(fmt, v)
        else:
            raw = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
            out += struct.pack("<I", len(raw)) + raw
    return bytes(out)


def write_flatgeobuf(
    ds: ray.data.Dataset,
    path: str,
    geometry: str = "geometry",
    name: str | None = None,
    crs_code: int | None = None,
    node_size: int = 16,
    max_rows: int = 10_000_000,
    max_bytes: int = 4 * 2**30,
) -> str:
    """Driver-assembled .fgb sink with a packed Hilbert R-tree index.

    Single-file interchange sink (the monolithic header + index make it
    inherently non-parallel, same trade as the .shp/.gpkg writers) —
    refuses metadata-provably oversized inputs; use to_parquet() for scale.
    Features are written in Hilbert order of bbox centers so the index
    localizes reads (the format's own layout recommendation).
    """
    from ..geom import kernels as K
    from ..geom.wkb import from_wkb
    from ..grid import hilbert_distance
    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_flatgeobuf",
        "FlatGeobuf is a single-file interchange sink assembled on the "
        "driver; use to_parquet() (partitioned, parallel) for scale sinks.",
        max_rows, max_bytes,
    )
    t = pull_table(ds, ordered=True)
    if geometry not in t.column_names:
        # an empty Dataset loses its schema through Ray (no columns at all):
        # write a valid zero-feature file; non-empty inputs must carry it
        if t.num_rows:
            raise ValueError(f"geometry column {geometry!r} missing")
        t = pa.table({geometry: pa.array([], type=pa.large_binary())})
    g = from_wkb(t.column(geometry))
    nrows = t.num_rows

    # Hilbert order of bbox centers over the layer's total bounds
    if nrows:
        b = K.bounds(g)
        ok = ~np.isnan(b).any(axis=1)
        cx = np.where(ok, (b[:, 0] + b[:, 2]) * 0.5, 0.0)
        cy = np.where(ok, (b[:, 1] + b[:, 3]) * 0.5, 0.0)
        if ok.any():
            tb = (
                float(b[ok, 0].min()), float(b[ok, 1].min()),
                float(b[ok, 2].max()), float(b[ok, 3].max()),
            )
        else:
            tb = (0.0, 0.0, 1.0, 1.0)
        if tb[2] <= tb[0]:
            tb = (tb[0], tb[1], tb[0] + 1.0, tb[3])
        if tb[3] <= tb[1]:
            tb = (tb[0], tb[1], tb[2], tb[1] + 1.0)
        order = np.argsort(hilbert_distance(cx, cy, tb, 15), kind="stable")
    else:
        order = np.arange(0)

    # column metadata from the non-geometry schema
    col_meta: list[tuple[str, int]] = []
    col_arrays = []
    for field in t.schema:
        if field.name == geometry:
            continue
        ct = None
        for pred, code in _ARROW_TO_COLTYPE:
            if pred(field.type):
                ct = code
                break
        if ct is None:
            raise NotImplementedError(
                f"write_flatgeobuf: column {field.name!r} type {field.type} has "
                "no FlatGeobuf ColumnType; cast it first"
            )
        col_meta.append((field.name, ct))
        col_arrays.append(t.column(field.name).to_pylist())

    # features (Hilbert order), leaf bboxes, byte offsets
    feats: list[bytes] = []
    bboxes = np.empty((nrows, 4), dtype=np.float64)
    offsets = np.empty(nrows, dtype=np.int64)
    pos = 0
    for k, i in enumerate(order):
        i = int(i)
        enc = _encode_geometry(g, i)
        refs: dict = {}
        if enc is not None:
            gblob, bbox = enc
            refs[0] = gblob
            bboxes[k] = bbox
        else:
            bboxes[k] = (0.0, 0.0, 0.0, 0.0)
        props = _encode_properties([a[i] for a in col_arrays], col_meta)
        if props:
            refs[1] = struct.pack("<I", len(props)) + props  # [ubyte] vector
        fblob = _size_prefixed(_fb_table({}, refs) if refs else _fb_table({}, {}))
        offsets[k] = pos
        pos += len(fblob)
        feats.append(fblob)

    # geometry_type: uniform -> that type, else Unknown (per-feature types)
    gts = set()
    for i in range(nrows):
        if not (g.is_missing[i] or g.is_empty[i]):
            gts.add(int(g.row_types[i]))
    wkb_to_gt = {1: GT_POINT, 2: GT_LINESTRING, 3: GT_POLYGON,
                 4: GT_MULTIPOINT, 5: GT_MULTILINESTRING, 6: GT_MULTIPOLYGON}
    header_gt = wkb_to_gt.get(gts.pop(), GT_UNKNOWN) if len(gts) == 1 else GT_UNKNOWN

    # header
    col_blobs = [
        _fb_table({1: ("<B", ct)}, {0: _fb_string(nm)}) for nm, ct in col_meta
    ]
    refs = {0: _fb_string(name or os.path.splitext(os.path.basename(path))[0])}
    if col_blobs:
        refs[7] = _fb_vec_tables(col_blobs)
    if crs_code:
        refs[10] = _fb_table({1: ("<i", int(crs_code))}, {0: _fb_string("EPSG")})
    header = _size_prefixed(
        _fb_table(
            {2: ("<B", header_gt), 8: ("<Q", nrows), 9: ("<H", node_size if nrows else 0)},
            refs,
        )
    )

    # packed Hilbert R-tree: build leaf level, then parents bottom-up;
    # serialize ROOT level first (spec layout). Internal offset = first
    # child node INDEX; leaf offset = feature byte offset.
    index = b""
    if nrows and node_size > 0:
        levels = _tree_levels(nrows, node_size)
        num_nodes = sum(levels)
        nb = np.zeros((num_nodes, 4), dtype=np.float64)
        noff = np.zeros(num_nodes, dtype=np.uint64)
        leaf0 = num_nodes - nrows
        nb[leaf0:] = bboxes
        noff[leaf0:] = offsets.astype(np.uint64)
        child0 = leaf0
        ns = min(max(int(node_size), 2), 65535)
        for lvl in range(1, len(levels)):
            cnt = levels[lvl]
            p0 = child0 - cnt
            nchild = levels[lvl - 1]
            for j in range(cnt):
                c_lo = child0 + j * ns
                c_hi = min(child0 + (j + 1) * ns, child0 + nchild)
                nb[p0 + j, 0] = nb[c_lo:c_hi, 0].min()
                nb[p0 + j, 1] = nb[c_lo:c_hi, 1].min()
                nb[p0 + j, 2] = nb[c_lo:c_hi, 2].max()
                nb[p0 + j, 3] = nb[c_lo:c_hi, 3].max()
                noff[p0 + j] = c_lo
            child0 = p0
        rec = np.zeros(num_nodes, dtype=[("b", "<f8", 4), ("off", "<u8")])
        rec["b"] = nb
        rec["off"] = noff
        index = rec.tobytes()

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        f.write(index)
        for fb in feats:
            f.write(fb)
    return path
