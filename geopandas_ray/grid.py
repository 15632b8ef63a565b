"""Hierarchical spatial cell keys + tile math (the partitioning backbone).

The north rule asks for H3/S2-style cell keys (res 7-10) as the shuffle key
of every spatial join. Nothing in this sandbox can verify bit-level H3, so we
implement what the architecture actually needs (SURVEY.md §7.0 item 3):
deterministic, hierarchical, skew-splittable integer cell ids.

Cell id layout (uint64): ``(res << 58) | morton(cx, cy)`` over a square
domain. Morton (Z-order) interleaving keeps children of a cell contiguous in
id space - parent/child relations are bit shifts, exactly like S2 - and is
cheap to compute vectorized AND to express in ANSI SQL for the DuckDB oracle
(sum over bit positions), which pure H3 hex math is not.

The Hilbert key (for spatial sort, reference tools/hilbert_curve.py:4-108) is
implemented separately below with the standard rotate/flip walk.
"""

from __future__ import annotations

import numpy as np

# default domain matches the synthetic fixture space; engines at world scale
# would pass lon/lat-scaled domains. Width 1024 so tile sizes at z<=10 are
# exact integers (keeps the DuckDB oracle float-free).
DEFAULT_DOMAIN = (0.0, 0.0, 1024.0, 1024.0)


def _spread_bits_u32(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of v (<= 2^29) -> even bit positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return _spread_bits_u32(cx) | (_spread_bits_u32(cy) << np.uint64(1))


def cell_coords(x, y, res: int, domain=DEFAULT_DOMAIN) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coords of each point at resolution ``res`` (2^res x 2^res)."""
    x0, y0, x1, y1 = domain
    n = np.int64(1) << np.int64(res)
    sx = (x1 - x0) / float(n)
    sy = (y1 - y0) / float(n)
    cx = np.clip(np.floor((np.asarray(x, dtype=np.float64) - x0) / sx).astype(np.int64), 0, n - 1)
    cy = np.clip(np.floor((np.asarray(y, dtype=np.float64) - y0) / sy).astype(np.int64), 0, n - 1)
    return cx, cy


def cell_id(x, y, res: int, domain=DEFAULT_DOMAIN) -> np.ndarray:
    """uint64 cell key per point: (res << 58) | morton(cx, cy)."""
    cx, cy = cell_coords(x, y, res, domain)
    return (np.uint64(res) << np.uint64(58)) | morton(cx.astype(np.uint64), cy.astype(np.uint64))


def cell_parent(cell: np.ndarray, levels: int = 1) -> np.ndarray:
    """Parent cell id ``levels`` up the hierarchy (S2-style bit shift)."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    pos = cell & np.uint64((1 << 58) - 1)
    new_res = res - levels
    return (new_res.astype(np.uint64) << np.uint64(58)) | (pos >> np.uint64(2 * levels))


def cells_for_bbox(minx, miny, maxx, maxy, res: int, domain=DEFAULT_DOMAIN):
    """Covering cells per bbox row -> (row_index, cell_id) flat arrays.

    A polygon spanning k cells emits k rows (the sjoin flat-map stage); join
    tasks dedup pairs with the reference-point rule (SURVEY.md §2.4).
    """
    minx = np.asarray(minx, dtype=np.float64)
    cx0, cy0 = cell_coords(minx, miny, res, domain)
    cx1, cy1 = cell_coords(maxx, maxy, res, domain)
    nx = (cx1 - cx0 + 1).astype(np.int64)
    ny = (cy1 - cy0 + 1).astype(np.int64)
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(minx), dtype=np.int64), counts)
    # vectorized enumeration of each row's (dx, dy) lattice
    offs = np.concatenate([[0], np.cumsum(counts)])
    local = np.arange(total, dtype=np.int64) - offs[row_idx]
    dx = local % nx[row_idx]
    dy = local // nx[row_idx]
    cx = (cx0[row_idx] + dx).astype(np.uint64)
    cy = (cy0[row_idx] + dy).astype(np.uint64)
    cells = (np.uint64(res) << np.uint64(58)) | morton(cx, cy)
    return row_idx, cells


def cell_bounds(cell: np.ndarray, domain=DEFAULT_DOMAIN) -> np.ndarray:
    """(N,4) bbox of each cell id."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    pos = cell & np.uint64((1 << 58) - 1)
    cx = _compact_bits(pos)
    cy = _compact_bits(pos >> np.uint64(1))
    x0, y0, x1, y1 = domain
    n = (np.int64(1) << res).astype(np.float64)
    sx = (x1 - x0) / n
    sy = (y1 - y0) / n
    minx = x0 + cx * sx
    miny = y0 + cy * sy
    return np.column_stack([minx, miny, minx + sx, miny + sy])


def _compact_bits(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v.astype(np.float64)


# ---------------------------------------------------------------------------
# Hilbert distance (spatial sort key) - reference tools/hilbert_curve.py:4-108:
# midpoint of bounds, discretized to a 2^level grid, mapped to curve position.
# ---------------------------------------------------------------------------


def hilbert_d(cx: np.ndarray, cy: np.ndarray, level: int) -> np.ndarray:
    """Vectorized Hilbert curve rank of integer grid coords at 2^level."""
    x = np.asarray(cx, dtype=np.int64).copy()
    y = np.asarray(cy, dtype=np.int64).copy()
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.int64(1) << np.int64(level - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += np.uint64(s) * np.uint64(s) * ((3 * rx) ^ ry).astype(np.uint64)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        # careful: the flip above modified x in place; recompute swap pairs
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s //= 2
    return d


def hilbert_distance(x, y, total_bounds, level: int = 15) -> np.ndarray:
    """Hilbert key of point(/bbox midpoint) coords, like base.py:5624."""
    minx, miny, maxx, maxy = total_bounds
    wx = (maxx - minx) or 1.0
    wy = (maxy - miny) or 1.0
    n = (1 << level) - 1
    cx = np.clip(((np.asarray(x) - minx) / wx * n).astype(np.int64), 0, n)
    cy = np.clip(((np.asarray(y) - miny) / wy * n).astype(np.int64), 0, n)
    return hilbert_d(cx, cy, level)


# ---------------------------------------------------------------------------
# Raster tile math (F5 / SURVEY.md §2.10) - arithmetic, no tree
# ---------------------------------------------------------------------------


def tile_id(z: int, tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """(z<<40)|(x<<20)|y - fixture F5's layout."""
    return (
        (np.uint64(z) << np.uint64(40))
        | (np.asarray(tx, dtype=np.uint64) << np.uint64(20))
        | np.asarray(ty, dtype=np.uint64)
    )


def point_tiles(x, y, z: int, domain=DEFAULT_DOMAIN):
    """Tile coords per point, half-open [min,max) convention (F5)."""
    x0, y0, x1, y1 = domain
    ts_x = (x1 - x0) / float(1 << z)
    ts_y = (y1 - y0) / float(1 << z)
    tx = np.floor((np.asarray(x, dtype=np.float64) - x0) / ts_x).astype(np.int64)
    ty = np.floor((np.asarray(y, dtype=np.float64) - y0) / ts_y).astype(np.int64)
    return tx, ty
