"""Native ESRI Shapefile read/write (no GDAL) — io/file.py:50 read_file /
:159 to_file for the `.shp` format the reference reaches through pyogrio.

Format per the public ESRI whitepaper ("ESRI Shapefile Technical
Description", 1998): `.shp` geometry records (big-endian record headers,
little-endian shape payloads), `.shx` fixed 8-byte record index, `.dbf`
dBASE-III attribute table (fixed-width ASCII records).

Ray-first layout: the driver reads only the tiny `.shx` (8 bytes/record) to
build record offsets, splits them into shards, and a `map_batches` stage
decodes each shard's byte range in parallel workers — the `.shp` itself is
never pulled through the driver.  Coordinates bulk-decode with
``np.frombuffer``; supported shapes: Null(0), Point(1), PolyLine(3),
Polygon(5), MultiPoint(8) and their Z/M variants (Z/M dropped, matching the
engine's 2-D WKB model, geom/wkb.py Z-drop).

Polygon ring assembly: the spec stores outer rings clockwise and holes
counter-clockwise, holes belonging to the shell that contains them; on
write shells/holes are re-wound to spec.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pyarrow as pa
import ray.data

from ..geom.wkb import LINESTRING, POINT, POLYGON, Geoms, from_wkb
from ..stages.clip import _parts_to_wkb

# shape-type -> (base type, has_z, has_m)
_SHAPES = {
    0: ("null", False, False),
    1: ("point", False, False), 11: ("point", True, True), 21: ("point", False, True),
    3: ("polyline", False, False), 13: ("polyline", True, True), 23: ("polyline", False, True),
    5: ("polygon", False, False), 15: ("polygon", True, True), 25: ("polygon", False, True),
    8: ("multipoint", False, False), 18: ("multipoint", True, True), 28: ("multipoint", False, True),
}


# --------------------------------------------------------------------------
# decode
# --------------------------------------------------------------------------


def _ring_signed_area2(c: np.ndarray) -> float:
    x, y = c[:, 0], c[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _point_in_ring(x: float, y: float, c: np.ndarray) -> bool:
    x0, y0 = c[:-1, 0], c[:-1, 1]
    x1, y1 = c[1:, 0], c[1:, 1]
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cond & (x < xi)) % 2)


def _assemble_polygon(rings: list[np.ndarray]) -> list[tuple[int, list[np.ndarray]]]:
    """Spec ring soup -> [(POLYGON, [shell, hole...]), ...].

    CW rings (negative signed area in the y-up plane) are shells; CCW are
    holes assigned to the (unique per spec) shell containing them."""
    shells: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    for r in rings:
        if len(r) < 4:
            continue
        if _ring_signed_area2(r) <= 0:  # CW = shell
            shells.append([r])
        else:
            holes.append(r)
    if not shells:
        # degenerate: all rings wound as holes — treat them as shells
        shells = [[r] for r in holes]
        holes = []
    for h in holes:
        placed = False
        hx, hy = float(h[0, 0]), float(h[0, 1])
        for s in shells:
            if _point_in_ring(hx, hy, s[0]):
                s.append(h)
                placed = True
                break
        if not placed:
            shells[0].append(h)
    # normalize to the engine's canonical winding (ops2 normalize: shell
    # CCW, holes CW) — the file stores the opposite
    out = []
    for s in shells:
        rings = [_wind(s[0], clockwise=False)] + [_wind(h, clockwise=True) for h in s[1:]]
        out.append((POLYGON, rings))
    return out


def _decode_record(buf: bytes) -> bytes | None:
    """One .shp record content -> WKB (or None for Null shapes)."""
    (stype,) = struct.unpack_from("<i", buf, 0)
    base, _, _ = _SHAPES[stype]
    if base == "null":
        return None
    if base == "point":
        x, y = struct.unpack_from("<2d", buf, 4)
        return _parts_to_wkb([(POINT, [np.asarray([[x, y]], dtype=np.float64)])])
    if base == "multipoint":
        (n,) = struct.unpack_from("<i", buf, 36)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        return _parts_to_wkb([(POINT, [pts[i : i + 1].astype(np.float64)]) for i in range(n)])
    # polyline / polygon
    nparts, npts = struct.unpack_from("<2i", buf, 36)
    parts = np.frombuffer(buf, dtype="<i4", count=nparts, offset=44).astype(np.int64)
    coords = np.frombuffer(buf, dtype="<f8", count=2 * npts, offset=44 + 4 * nparts).reshape(npts, 2)
    bounds = np.concatenate([parts, [npts]])
    pieces = [coords[bounds[i] : bounds[i + 1]].astype(np.float64) for i in range(nparts)]
    if base == "polyline":
        return _parts_to_wkb([(LINESTRING, [p]) for p in pieces if len(p) >= 2])
    return _parts_to_wkb(_assemble_polygon(pieces))


def _read_shx(path: str) -> np.ndarray:
    """(n, 2) [byte offset, content byte length] per record."""
    with open(path, "rb") as f:
        data = f.read()
    body = np.frombuffer(data, dtype=">i4", offset=100).reshape(-1, 2).astype(np.int64)
    return np.column_stack([body[:, 0] * 2, body[:, 1] * 2])


def _scan_offsets(shp_path: str) -> np.ndarray:
    """Fallback when .shx is missing: one header-skipping pass."""
    out = []
    size = os.path.getsize(shp_path)
    with open(shp_path, "rb") as f:
        pos = 100
        while pos + 8 <= size:
            f.seek(pos)
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            _, clen = struct.unpack(">2i", hdr)
            out.append((pos, clen * 2))
            pos += 8 + clen * 2
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def _read_dbf_meta(path: str):
    with open(path, "rb") as f:
        head = f.read(32)
        nrec, hsize, rsize = struct.unpack_from("<IHH", head, 4)
        fields = []
        fdata = f.read(hsize - 32)
    pos = 0
    while pos + 32 <= len(fdata) and fdata[pos] != 0x0D:
        raw = fdata[pos : pos + 32]
        name = raw[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(raw[11])
        flen = raw[16]
        fdec = raw[17]
        fields.append((name, ftype, int(flen), int(fdec)))
        pos += 32
    return nrec, hsize, rsize, fields


def _decode_dbf_rows(path: str, hsize: int, rsize: int, fields, start: int, count: int) -> dict:
    """Vectorized fixed-width decode: the record block views as a
    (count, rsize) byte matrix; each field is one column slice turned into
    a fixed-width bytes array (zero Python per row for the slicing; numeric
    parse via np.char strip + astype)."""
    with open(path, "rb") as f:
        f.seek(hsize + start * rsize)
        blob = f.read(count * rsize)
    mat = np.frombuffer(blob, dtype=np.uint8, count=count * rsize).reshape(count, rsize)
    cols: dict[str, object] = {}
    # dBASE soft-delete: first record byte 0x2A '*'; GDAL skips such
    # features entirely, so the caller filters geometry rows by this mask
    deleted = mat[:, 0] == 0x2A
    off = 1  # deletion flag
    for name, ftype, flen, fdec in fields:
        raw = np.ascontiguousarray(mat[:, off : off + flen]).view(f"S{flen}").ravel()
        off += flen
        txt = np.char.strip(raw)
        if ftype in ("N", "F"):
            empty = (txt == b"") | (txt == b"*" * flen)
            vals: list = []
            if fdec or ftype == "F":
                num = np.where(empty, b"0", txt).astype(np.float64)
                vals = [None if e else float(v) for e, v in zip(empty, num)]
            else:
                # integer column unless any value carries a decimal point
                has_dot = np.char.find(txt, b".") >= 0
                if has_dot.any():
                    num = np.where(empty, b"0", txt).astype(np.float64)
                    vals = [
                        None if e else (float(v) if d else int(v))
                        for e, d, v in zip(empty, has_dot, num)
                    ]
                else:
                    num = np.where(empty, b"0", txt).astype(np.int64)
                    vals = [None if e else int(v) for e, v in zip(empty, num)]
            cols[name] = vals
        elif ftype == "L":
            cols[name] = [
                None if t in (b"", b"?") else t in (b"Y", b"y", b"T", b"t") for t in txt
            ]
        else:  # C, D and anything else: text
            cols[name] = [t.decode("ascii", "replace") if t else None for t in txt]
    return cols, deleted


class _ShardReader:
    """map_batches callable: decode a shard of records from .shp + .dbf.

    File handles / dbf metadata resolve once per actor (__init__), record
    decode per batch of shard specs. Point shapefiles (the dominant
    at-scale shape: one fixed 28-byte record) take a fully vectorized
    path — one reshape + one points_to_wkb over the whole shard."""

    @staticmethod
    def _decode_shard(blob: bytes, offs: np.ndarray, lo: int) -> object:
        from ..geom.wkb import points_to_wkb

        n = len(offs)
        # vectorized Point fast path: every record 20 content bytes and
        # contiguous (28-byte stride incl. the record header)
        if (
            n
            and (offs[:, 1] == 20).all()
            and (np.diff(offs[:, 0]) == 28).all()
            and len(blob) >= n * 28
        ):
            rec = np.frombuffer(blob, dtype=np.uint8, count=n * 28).reshape(n, 28)
            stype = np.ascontiguousarray(rec[:, 8:12]).view("<i4").ravel()
            if (stype == 1).all():
                xy = np.ascontiguousarray(rec[:, 12:28]).view("<f8").reshape(n, 2)
                return points_to_wkb(xy[:, 0], xy[:, 1])
        return [
            _decode_record(blob[int(o - lo) + 8 : int(o - lo) + 8 + int(ln)])
            for o, ln in offs
        ]

    def __init__(self, shp_path: str, dbf_path: str | None, geometry: str):
        self.shp_path = shp_path
        self.geometry = geometry
        self.dbf_path = dbf_path
        self.dbf_meta = _read_dbf_meta(dbf_path) if dbf_path else None

    def __call__(self, b: pa.Table) -> pa.Table:
        tables = []
        for i in range(b.num_rows):
            start = int(b.column("start")[i].as_py())
            count = int(b.column("count")[i].as_py())
            offs = np.frombuffer(b.column("offsets")[i].as_py(), dtype=np.int64).reshape(-1, 2)
            with open(self.shp_path, "rb") as f:
                lo = int(offs[0, 0])
                hi = int(offs[-1, 0] + 8 + offs[-1, 1])
                f.seek(lo)
                blob = f.read(hi - lo)
            wkbs = self._decode_shard(blob, offs, lo)
            cols: dict = {}
            deleted = None
            if self.dbf_meta is not None:
                nrec, hsize, rsize, fields = self.dbf_meta
                cols, deleted = _decode_dbf_rows(
                    self.dbf_path, hsize, rsize, fields, start, count
                )
            cols[self.geometry] = (
                wkbs if isinstance(wkbs, pa.Array) else pa.array(wkbs, type=pa.large_binary())
            )
            tbl = pa.table(cols)
            if deleted is not None and deleted.any():
                tbl = tbl.filter(pa.array(~deleted))
            tables.append(tbl)
        return pa.concat_tables(tables) if tables else pa.table({self.geometry: pa.array([], type=pa.large_binary())})


def read_shapefile(path: str, geometry: str = "geometry",
                   shard_records: int = 65536) -> ray.data.Dataset:
    """Parallel shapefile read: driver touches only the 8-byte-per-record
    .shx (or one header-skip pass when it is missing); record shards decode
    in parallel map_batches tasks."""
    base, ext = os.path.splitext(path)
    if ext.lower() != ".shp":
        raise ValueError(f"expected a .shp path, got {path!r}")
    shx = base + ".shx"
    offs = _read_shx(shx) if os.path.exists(shx) else _scan_offsets(path)
    dbf = base + ".dbf"
    dbf_path = dbf if os.path.exists(dbf) else None
    n = len(offs)
    shards = []
    for s in range(0, max(n, 1), shard_records):
        e = min(n, s + shard_records)
        if e <= s:
            break
        shards.append({
            "start": s,
            "count": e - s,
            "offsets": offs[s:e].tobytes(),
        })
    if not shards:
        return ray.data.from_arrow(pa.table({geometry: pa.array([], type=pa.large_binary())}))
    ds = ray.data.from_items(shards)
    return ds.map_batches(
        _ShardReader,
        batch_format="pyarrow",
        batch_size=1,
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(shp_path=path, dbf_path=dbf_path, geometry=geometry),
    )


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------


def _wind(c: np.ndarray, clockwise: bool) -> np.ndarray:
    a2 = _ring_signed_area2(c)
    if (a2 > 0) == clockwise:
        return c[::-1]
    return c


def _encode_record(g: Geoms, i: int) -> tuple[int, bytes]:
    """row -> (shape_type, content bytes)."""
    t = int(g.row_types[i])
    if t == 0 or g.is_empty[i]:
        return 0, struct.pack("<i", 0)
    p0, p1 = g.row_part_range(i)
    part_rings: list[tuple[int, list[np.ndarray]]] = []
    for p in range(p0, p1):
        r0, r1 = g.part_ring_range(p)
        part_rings.append((int(g.part_types[p]), [g.ring_coords(r) for r in range(r0, r1)]))
    kinds = {pt for pt, _ in part_rings}
    if kinds == {POINT}:
        pts = np.concatenate([rs[0] for _, rs in part_rings])
        if len(pts) == 1:
            return 1, struct.pack("<i2d", 1, float(pts[0, 0]), float(pts[0, 1]))
        box = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
        return 8, struct.pack("<i4di", 8, *box) + np.ascontiguousarray(pts, dtype="<f8").tobytes()
    if kinds == {LINESTRING}:
        lines = [rs[0] for _, rs in part_rings]
        return 3, _encode_parts(3, lines)
    if kinds == {POLYGON}:
        rings = []
        for _, rs in part_rings:
            for k, r in enumerate(rs):
                r = np.asarray(r, dtype=np.float64)
                if not np.array_equal(r[0], r[-1]):
                    r = np.concatenate([r, r[:1]])
                rings.append(_wind(r, clockwise=(k == 0)))
        return 5, _encode_parts(5, rings)
    raise NotImplementedError(
        "shapefile records are single-family; GeometryCollection rows cannot be written"
    )


def _encode_parts(stype: int, pieces: list[np.ndarray]) -> bytes:
    allc = np.concatenate(pieces)
    box = (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())
    starts = np.cumsum([0] + [len(p) for p in pieces[:-1]]).astype("<i4")
    head = struct.pack("<i4d2i", stype, *box, len(pieces), len(allc))
    return head + starts.tobytes() + np.ascontiguousarray(allc, dtype="<f8").tobytes()


def _dbf_field_spec(name: str, arr: pa.ChunkedArray) -> tuple[str, int, int]:
    t = arr.type
    if pa.types.is_integer(t):
        return "N", 19, 0
    if pa.types.is_floating(t):
        # size the width from the actual column (GDAL widens the same way) —
        # a fixed N(30,10) rejects legitimate |value| >= ~1e19 doubles whose
        # %.10f rendering exceeds 30 chars. dBASE caps field width at 254.
        width = 30
        vals = arr.to_pylist()
        for v in vals:
            if v is not None:
                width = max(width, len(f"{v:.10f}"))
        return "N", min(width, 254), 10
    if pa.types.is_boolean(t):
        return "L", 1, 0
    # strings: width = longest value (dBASE caps at 254)
    lens = [len(str(v)) for v in arr.to_pylist() if v is not None] or [1]
    return "C", min(max(lens), 254), 0


def _format_dbf(value, ftype: str, flen: int, fdec: int) -> bytes:
    if value is None:
        return b" " * flen
    if ftype == "N":
        txt = f"{value:.{fdec}f}" if fdec else str(int(value))
        if len(txt) > flen:
            # silent head-truncation would corrupt the number (keeps the
            # HIGH digits' prefix => value/10^k) — refuse instead
            raise ValueError(
                f"numeric value {value!r} does not fit DBF field width {flen}"
            )
        return txt.rjust(flen).encode("ascii")
    if ftype == "L":
        return b"T" if value else b"F"
    return str(value)[:flen].ljust(flen).encode("ascii", "replace")


def write_shapefile(ds: ray.data.Dataset, path: str, geometry: str = "geometry",
                    max_rows: int = 10_000_000, max_bytes: int = 2 * 2**30) -> str:
    """Driver-assembled .shp/.shx/.dbf sink (the format's single-file
    monolithic headers make it inherently non-parallel — use the parquet /
    feather sinks for scale; this exists for interchange).

    Refuses metadata-provably oversized inputs up front: the format itself
    caps files at 2 GiB (32-bit record offsets), so the byte cap is a hard
    format limit, not just a driver-memory guard."""
    from ..util import guard_driver_sized, pull_table

    guard_driver_sized(
        ds, "write_shapefile",
        "Shapefile is a 2 GiB-capped interchange format assembled on the "
        "driver; use to_parquet() (partitioned, parallel) for scale sinks.",
        max_rows, max_bytes,
    )
    t = pull_table(ds, ordered=True)
    if geometry not in t.column_names:
        if t.num_rows:
            raise KeyError(f"no column {geometry!r} in input")
        # an empty Dataset pulls as a 0-column table (Ray drops the schema)
        t = pa.table({geometry: pa.array([], type=pa.large_binary())})
    g = from_wkb(t.column(geometry))
    recs = [_encode_record(g, i) for i in range(len(g))]
    stypes = {s for s, _ in recs if s != 0}
    file_type = next(iter(stypes)) if len(stypes) == 1 else (max(stypes) if stypes else 1)
    if len(stypes) > 1:
        raise ValueError(f"shapefiles are single-type; got shape types {sorted(stypes)}")

    base, ext = os.path.splitext(path)
    if ext.lower() != ".shp":
        base = path
    shp_path, shx_path, dbf_path = base + ".shp", base + ".shx", base + ".dbf"

    # bbox across non-null records
    from ..geom import kernels as K

    gb = K.bounds(g)
    ok = ~np.isnan(gb).any(axis=1)
    box = (
        (gb[ok, 0].min(), gb[ok, 1].min(), gb[ok, 2].max(), gb[ok, 3].max())
        if ok.any()
        else (0.0, 0.0, 0.0, 0.0)
    )

    body_parts: list[bytes] = []
    index_parts: list[bytes] = []
    pos = 100
    for i, (stype, content) in enumerate(recs):
        index_parts.append(struct.pack(">2i", pos // 2, len(content) // 2))
        body_parts.append(struct.pack(">2i", i + 1, len(content) // 2))
        body_parts.append(content)
        pos += 8 + len(content)
    body = b"".join(body_parts)
    index = b"".join(index_parts)

    def header(total_bytes: int) -> bytes:
        return (
            struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_bytes // 2)
            + struct.pack("<2i", 1000, file_type)
            + struct.pack("<8d", box[0], box[1], box[2], box[3], 0, 0, 0, 0)
        )

    with open(shp_path, "wb") as f:
        f.write(header(100 + len(body)) + body)
    with open(shx_path, "wb") as f:
        f.write(header(100 + len(index)) + index)

    # dbf (dBASE III): always written; at least one field is required
    attrs = [c for c in t.column_names if c != geometry]
    if not attrs:
        t = t.append_column("FID", pa.array(np.arange(t.num_rows, dtype=np.int64)))
        attrs = ["FID"]
    specs = []
    seen_names: set[str] = set()
    for c in attrs:
        ftype, flen, fdec = _dbf_field_spec(c, t.column(c))
        short = c[:10]
        if short in seen_names:
            # dBASE caps names at 10 chars; colliding truncations would
            # silently overwrite each other on read-back
            raise ValueError(
                f"DBF field name collision after 10-char truncation: {short!r} "
                f"(rename column {c!r})"
            )
        seen_names.add(short)
        specs.append((short, ftype, flen, fdec))
    rsize = 1 + sum(s[2] for s in specs)
    hsize = 32 + 32 * len(specs) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH20x", 0x03, 26, 8, 18, t.num_rows, hsize, rsize)
    for name, ftype, flen, fdec in specs:
        out += struct.pack(
            "<11sc4xBB14x", name.encode("ascii")[:11], ftype.encode("ascii"), flen, fdec
        )
    out += b"\x0d"
    cols = {c: t.column(c).to_pylist() for c in attrs}
    for r in range(t.num_rows):
        out += b" "
        for (name, ftype, flen, fdec), c in zip(specs, attrs):
            out += _format_dbf(cols[c][r], ftype, flen, fdec)
    out += b"\x1a"
    with open(dbf_path, "wb") as f:
        f.write(bytes(out))
    return shp_path
