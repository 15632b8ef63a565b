"""WKT codec (from_wkt / to_wkt - reference array.py:181/:203,
geoseries.py:334, display precision via options in _config.py:63-66).

Parser handles the 7 OGC types + EMPTY; writer mirrors GeoPandas'
formatting (uppercase tags, comma-separated "x y" pairs, ``rounding_precision``
like shapely's to_wkt default of 6 -> trim trailing zeros).
"""

from __future__ import annotations

import re

import numpy as np

from .wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geoms,
    TYPE_NAMES,
)

_TYPE_CODES = {v.upper(): k for k, v in TYPE_NAMES.items() if v}


def _parse_coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        parts = pair.split()
        pts.append((float(parts[0]), float(parts[1])))  # Z dropped (planar)
    return np.asarray(pts, dtype=np.float64)


def _split_parens(s: str) -> list[str]:
    """Split a '(..),(..)' list at depth-0 commas."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out]


def _strip_parens(s: str) -> str:
    s = s.strip()
    assert s.startswith("(") and s.endswith(")"), s
    return s[1:-1]


def from_wkt(values) -> Geoms:
    """Parse a sequence of WKT strings (None/'' -> missing row)."""
    if isinstance(values, str):
        values = [values]
    coords_chunks: list[np.ndarray] = []
    ring_off = [0]
    part_off = [0]
    row_off = [0]
    part_types: list[int] = []
    n = len(values)
    row_types = np.zeros(n, dtype=np.int8)

    def add_part(ptype: int, rings: list[np.ndarray]) -> int:
        for ring in rings:
            coords_chunks.append(ring)
            ring_off.append(ring_off[-1] + len(ring))
        part_off.append(part_off[-1] + len(rings))
        part_types.append(ptype)
        return 1

    for i, raw in enumerate(values):
        if raw is None or not str(raw).strip():
            row_off.append(row_off[-1])
            continue
        s = str(raw).strip()
        m = re.match(r"([A-Za-z ]+?)\s*(\bZ\b|\bM\b|\bZM\b)?\s*(EMPTY|\()", s, re.I)
        if not m:
            raise ValueError(f"invalid WKT: {s[:40]!r}")
        tag = m.group(1).strip().upper().replace(" ", "")
        code = _TYPE_CODES.get(tag)
        if code is None:
            raise ValueError(f"unknown WKT type {tag!r}")
        row_types[i] = code
        if m.group(3) == "EMPTY":
            row_off.append(row_off[-1])
            continue
        body = s[m.end(3) - 1 :].strip()
        nparts = _parse_geom_text(code, body, add_part, row_types, i)
        row_off.append(row_off[-1] + nparts)

    coords = np.concatenate(coords_chunks) if coords_chunks else np.empty((0, 2))
    return Geoms(coords, ring_off, part_off, row_off, part_types, row_types)


def _parse_geom_text(code: int, body: str, add_part, row_types, i) -> int:
    inner = _strip_parens(body)
    if code == POINT:
        return add_part(POINT, [_parse_coords(inner).reshape(1, 2)])
    if code == LINESTRING:
        return add_part(LINESTRING, [_parse_coords(inner)])
    if code == POLYGON:
        rings = [_parse_coords(_strip_parens(r)) for r in _split_parens(inner)]
        return add_part(POLYGON, rings)
    if code == MULTIPOINT:
        nparts = 0
        for p in _split_parens(inner):
            p = p.strip()
            c = _parse_coords(_strip_parens(p) if p.startswith("(") else p)
            nparts += add_part(POINT, [c.reshape(1, 2)])
        return nparts
    if code == MULTILINESTRING:
        return sum(add_part(LINESTRING, [_parse_coords(_strip_parens(p))]) for p in _split_parens(inner))
    if code == MULTIPOLYGON:
        nparts = 0
        for poly in _split_parens(inner):
            rings = [_parse_coords(_strip_parens(r)) for r in _split_parens(_strip_parens(poly))]
            nparts += add_part(POLYGON, rings)
        return nparts
    if code == GEOMETRYCOLLECTION:
        nparts = 0
        for sub in _split_parens(inner):
            m = re.match(r"([A-Za-z ]+?)\s*(EMPTY|\()", sub.strip(), re.I)
            sub_code = _TYPE_CODES[m.group(1).strip().upper().replace(" ", "")]
            if m.group(2) == "EMPTY":
                continue
            nparts += _parse_geom_text(sub_code, sub.strip()[m.end(2) - 1 :], add_part, row_types, i)
        return nparts
    raise ValueError(code)


def _fmt(v: float, precision: int) -> str:
    if precision < 0:
        # shapely's rounding_precision=-1: shortest-roundtrip repr, the
        # bit-exact interchange mode (CSV/WKT roundtrips)
        s = repr(float(v))
        return s[:-2] if s.endswith(".0") else s
    s = f"{v:.{precision}f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


def _ring_text(ring: np.ndarray, precision: int) -> str:
    return ", ".join(f"{_fmt(x, precision)} {_fmt(y, precision)}" for x, y in ring)


def to_wkt(g: Geoms, rounding_precision: int = 6) -> list[str | None]:
    out: list[str | None] = []
    for i in range(len(g)):
        t = int(g.row_types[i])
        if t == 0:
            out.append(None)
            continue
        p0, p1 = g.row_part_range(i)
        if p0 == p1:
            out.append(f"{TYPE_NAMES[t].upper()} EMPTY")
            continue
        parts = []
        for p in range(p0, p1):
            pt = int(g.part_types[p])
            r0, r1 = g.part_ring_range(p)
            if pt == POINT:
                parts.append((pt, f"({_ring_text(g.ring_coords(r0), rounding_precision)})"))
            elif pt == LINESTRING:
                parts.append((pt, f"({_ring_text(g.ring_coords(r0), rounding_precision)})"))
            else:
                rings = ", ".join(
                    f"({_ring_text(g.ring_coords(r), rounding_precision)})" for r in range(r0, r1)
                )
                parts.append((pt, f"({rings})"))
        if t in (POINT, LINESTRING, POLYGON) and len(parts) == 1:
            out.append(f"{TYPE_NAMES[t].upper()} {parts[0][1]}")
        elif t == GEOMETRYCOLLECTION:
            body = ", ".join(f"{TYPE_NAMES[pt].upper()} {txt}" for pt, txt in parts)
            out.append(f"GEOMETRYCOLLECTION ({body})")
        else:
            body = ", ".join(txt for _, txt in parts)
            out.append(f"{TYPE_NAMES[t].upper()} ({body})")
    return out
