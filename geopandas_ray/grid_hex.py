"""Hexagonal cell keys — the H3 analog of the engine's grid layer.

The north rule's index is "H3 (res 7-10) and S2 cell keys". ``grid.py``
carries the S2 analog (Morton square hierarchy); this module carries the
hex side with H3's OPERATIONAL surface on a planar axial grid:

- ``hex_cell(x, y, res)``      point -> hex id (pointy-top axial + cube round)
- ``hex_center(id)``           cell centroid
- ``hex_parent(id, levels)``   hierarchy by CENTROID CONTAINMENT on an
                               aperture-4 size pyramid (cell size halves per
                               res). H3 proper uses an aperture-7 rotated
                               subdivision; the rotation bookkeeping buys
                               nothing on a plane, so the analog keeps the
                               same API with centroid-parent semantics and
                               documents the deviation here.
- ``hex_kring(id, k)``         all cells within grid distance k
- ``hex_polyfill(...)``        H3 polyfill PARITY: a cell is in the cover
                               iff its CENTER is inside the polygon
                               (H3's polyfill is centroid containment).

All float math uses operation orders reproducible in ANSI SQL (floor(x+0.5)
rounding, not banker's round), so hex assignment carries a hash-exact
DuckDB oracle (`hex_assign` query).

Id layout (int64): ``res*2^52 + (q + 2^25)*2^26 + (r + 2^25)``.
"""

from __future__ import annotations

import numpy as np

# size of a hex (center-to-vertex) at res 0; halves each res (aperture 4)
SIZE0 = 512.0
_OFF = 1 << 25
_QSHIFT = 1 << 26
_RES_SHIFT = 1 << 52
SQRT3 = float(np.sqrt(3.0))


def hex_size(res: int) -> float:
    return SIZE0 / (2.0**res)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest-hex rounding in cube coordinates; floor(x+0.5) ties so the
    SQL oracle reproduces bit-identically (DuckDB round() is half-away,
    numpy round() is half-even — floor(x+0.5) sidesteps both)."""
    x = qf
    z = rf
    y = -x - z
    rx = np.floor(x + 0.5)
    ry = np.floor(y + 0.5)
    rz = np.floor(z + 0.5)
    dx = np.abs(rx - x)
    dy = np.abs(ry - y)
    dz = np.abs(rz - z)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_qr(x, y, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Point -> axial (q, r) at ``res`` (pointy-top)."""
    s = hex_size(res)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    qf = (SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 * y / 3.0) / s
    return _cube_round(qf, rf)


def hex_pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        np.int64(res) * np.int64(_RES_SHIFT)
        + (q.astype(np.int64) + _OFF) * np.int64(_QSHIFT)
        + (r.astype(np.int64) + _OFF)
    )


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // _RES_SHIFT
    rem = cell - res * _RES_SHIFT
    q = rem // _QSHIFT - _OFF
    r = rem - (q + _OFF) * _QSHIFT - _OFF
    return res.astype(np.int64), q, r


def hex_cell(x, y, res: int) -> np.ndarray:
    q, r = hex_qr(x, y, res)
    return hex_pack(res, q, r)


def hex_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_unpack(cell)
    s = SIZE0 / (2.0 ** res.astype(np.float64))
    cx = s * SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    cy = s * 1.5 * r.astype(np.float64)
    return cx, cy


def hex_parent(cell: np.ndarray, levels: int = 1) -> np.ndarray:
    """Coarser cell whose area contains this cell's CENTER."""
    cell = np.atleast_1d(np.asarray(cell, dtype=np.int64))
    res, _, _ = hex_unpack(cell)
    ures = np.unique(res)
    if len(ures) > 1:
        raise ValueError("hex_parent expects a single resolution per call")
    out_res = (int(ures[0]) if len(ures) else 0) - levels
    if out_res < 0:
        raise ValueError("parent resolution below 0")
    cx, cy = hex_center(cell)
    return hex_cell(cx, cy, out_res)


def hex_kring(cell: int, k: int) -> np.ndarray:
    """All cells within hex grid distance k (includes the center cell)."""
    res, q0, r0 = hex_unpack(np.asarray([cell], dtype=np.int64))
    res, q0, r0 = int(res[0]), int(q0[0]), int(r0[0])
    qs, rs = [], []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            qs.append(q0 + dq)
            rs.append(r0 + dr)
    return hex_pack(res, np.array(qs, dtype=np.int64), np.array(rs, dtype=np.int64))


def hex_grid_distance(a: int, b: int) -> int:
    _, qa, ra = hex_unpack(np.asarray([a], dtype=np.int64))
    _, qb, rb = hex_unpack(np.asarray([b], dtype=np.int64))
    dq = int(qa[0] - qb[0])
    dr = int(ra[0] - rb[0])
    return int((abs(dq) + abs(dr) + abs(dq + dr)) // 2)


def hex_polyfill(rings: list[np.ndarray], res: int) -> np.ndarray:
    """H3-parity polyfill: cells whose CENTER lies in the even-odd region
    of ``rings`` (list of closed (N,2) arrays; first = shell, rest holes of
    one polygon — pass all rings of a multipolygon for even-odd semantics).

    Candidate enumeration: the axial images of the bbox corners bound q and
    r ranges (the axial transform is linear), then one vectorized even-odd
    crossing test over all candidate centers.
    """
    allc = np.concatenate([r for r in rings if len(r)])
    minx, miny = allc.min(axis=0)
    maxx, maxy = allc.max(axis=0)
    s = hex_size(res)
    # conservative axial bounds (linear map of the bbox corners +- 1)
    xs = np.array([minx, minx, maxx, maxx])
    ys = np.array([miny, maxy, miny, maxy])
    qf = (SQRT3 / 3.0 * xs - ys / 3.0) / s
    rf = (2.0 * ys / 3.0) / s
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    qq, rr = np.meshgrid(
        np.arange(q0, q1 + 1, dtype=np.int64), np.arange(r0, r1 + 1, dtype=np.int64)
    )
    qq = qq.ravel()
    rr = rr.ravel()
    cx = s * SQRT3 * (qq.astype(np.float64) + rr.astype(np.float64) / 2.0)
    cy = s * 1.5 * rr.astype(np.float64)
    inside = np.zeros(len(cx), dtype=bool)
    for ring in rings:
        rx, ry = ring[:, 0], ring[:, 1]
        x0, y0 = rx[:-1], ry[:-1]
        x1, y1 = rx[1:], ry[1:]
        # even-odd crossing parity, vectorized over centers x edges
        cond = (y0[None, :] > cy[:, None]) != (y1[None, :] > cy[:, None])
        with np.errstate(divide="ignore", invalid="ignore"):
            xs_at = x0[None, :] + (cy[:, None] - y0[None, :]) / (y1 - y0)[None, :] * (
                x1 - x0
            )[None, :]
        crossings = (cond & (cx[:, None] < xs_at)).sum(axis=1)
        inside ^= (crossings % 2).astype(bool)
    return hex_pack(res, qq[inside], rr[inside])
