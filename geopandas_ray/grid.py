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
# Hierarchy completion (H3/S2-style cell-set algebra): children, k-ring
# neighbors, compact/uncompact covering minimization. All pure uint64 bit
# math - no geometry - so they vectorize and reproduce exactly in SQL.
# ---------------------------------------------------------------------------

_POS_MASK = np.uint64((1 << 58) - 1)


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(res, cx, cy) int64 arrays for each cell id."""
    cell = np.asarray(cell, dtype=np.uint64)
    res = (cell >> np.uint64(58)).astype(np.int64)
    pos = cell & _POS_MASK
    cx = _compact_bits(pos).astype(np.int64)
    cy = _compact_bits(pos >> np.uint64(1)).astype(np.int64)
    return res, cx, cy


def cell_from_coords(res, cx, cy) -> np.ndarray:
    """Inverse of :func:`cell_decode` (res may be scalar or array)."""
    res = np.asarray(res, dtype=np.uint64)
    return (res << np.uint64(58)) | morton(
        np.asarray(cx, dtype=np.uint64), np.asarray(cy, dtype=np.uint64)
    )


def cell_children(cell: np.ndarray, levels: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """All 4**levels descendants of each cell, Z-order contiguous.

    Returns flat ``(row_index, child_id)`` arrays - the S2-style inverse of
    :func:`cell_parent` (children of ``c`` occupy the id range
    ``pos(c)*4**levels .. +4**levels`` at ``res+levels``).
    """
    cell = np.asarray(cell, dtype=np.uint64)
    res = cell >> np.uint64(58)
    pos = cell & _POS_MASK
    k = 4**levels
    n = len(cell)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), k)
    sub = np.tile(np.arange(k, dtype=np.uint64), n)
    child = (
        ((res[row_idx] + np.uint64(levels)) << np.uint64(58))
        | (pos[row_idx] << np.uint64(2 * levels))
        | sub
    )
    return row_idx, child


def cell_neighbors(
    cell: np.ndarray, k: int = 1, include_center: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """k-ring: same-res cells within Chebyshev distance ``k`` (H3 kRing
    analog on the square grid). Off-grid neighbors are DROPPED, not
    clamped, so border cells emit fewer rows. Returns flat
    ``(row_index, neighbor_id)``; the center cell is included unless
    ``include_center=False``.
    """
    res, cx, cy = cell_decode(cell)
    side = 2 * k + 1
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    dx = dx.ravel()
    dy = dy.ravel()
    if not include_center:
        keep = (dx != 0) | (dy != 0)
        dx, dy = dx[keep], dy[keep]
    m = len(dx)
    n = len(cx)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), m)
    nx = np.repeat(cx, m) + np.tile(dx, n)
    ny = np.repeat(cy, m) + np.tile(dy, n)
    lim = np.int64(1) << res[row_idx]
    valid = (nx >= 0) & (ny >= 0) & (nx < lim) & (ny < lim)
    row_idx, nx, ny = row_idx[valid], nx[valid], ny[valid]
    ids = cell_from_coords(res[row_idx], nx, ny)
    return row_idx, ids


def uncompact_cells(cell: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Expand each (possibly coarser) cell to its descendants at ``res``.

    Mixed input resolutions are fine; cells already at ``res`` pass through.
    Returns flat ``(row_index, cell_id)``.
    """
    cell = np.asarray(cell, dtype=np.uint64)
    cres = (cell >> np.uint64(58)).astype(np.int64)
    if np.any(cres > res):
        raise ValueError("uncompact_cells: input cell finer than target res")
    dr = (res - cres).astype(np.int64)
    counts = np.int64(1) << (2 * dr)
    row_idx = np.repeat(np.arange(len(cell), dtype=np.int64), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])
    local = (np.arange(int(counts.sum()), dtype=np.int64) - offs[row_idx]).astype(np.uint64)
    pos = cell[row_idx] & _POS_MASK
    ids = (np.uint64(res) << np.uint64(58)) | (pos << (np.uint64(2) * dr[row_idx].astype(np.uint64))) | local
    return row_idx, ids


def compact_cells(cells: np.ndarray) -> np.ndarray:
    """Minimal covering: every complete sibling quartet is replaced by its
    parent, cascading upward (H3 ``compact`` / S2 cell-union normalize).
    Input is treated as a set; returns sorted unique uint64 ids.
    """
    keys, out = compact_keyed(np.zeros(len(np.atleast_1d(cells)), dtype=np.int64), cells)
    return out


def compact_keyed(keys: np.ndarray, cells: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-key compact: compacts each key's cell set
    independently in ONE pass over the flat (key, cell) pair arrays - the
    shape a hash-partitioned Ray stage hands a worker. No per-key Python.
    """
    keys = np.asarray(keys)
    cells = np.asarray(cells, dtype=np.uint64)
    # set semantics per key
    order = np.lexsort((cells, keys))
    keys, cells = keys[order], cells[order]
    if len(cells):
        first = np.concatenate([[True], (keys[1:] != keys[:-1]) | (cells[1:] != cells[:-1])])
        keys, cells = keys[first], cells[first]
    res = (cells >> np.uint64(58)).astype(np.int64)
    for r in range(int(res.max(initial=0)), 0, -1):
        at = res == r
        if not at.any():
            continue
        sub_keys = keys[at]
        sub = cells[at]
        parent = cell_parent(sub)
        # quartet detection: pairs are unique, so 4 identical (key, parent)
        # rows mean all 4 children are present
        order = np.lexsort((parent, sub_keys))
        sk, sp = sub_keys[order], parent[order]
        new_grp = np.concatenate([[True], (sk[1:] != sk[:-1]) | (sp[1:] != sp[:-1])])
        gid = np.cumsum(new_grp) - 1
        sizes = np.bincount(gid)
        full = sizes[gid] == 4
        # drop the 4 children, add the parent once per full group
        drop = np.zeros(at.sum(), dtype=bool)
        drop[order] = full
        add_mask = new_grp & full
        add_keys = sk[add_mask]
        add_cells = sp[add_mask]
        keep = np.ones(len(cells), dtype=bool)
        keep[np.nonzero(at)[0][drop]] = False
        keys = np.concatenate([keys[keep], add_keys])
        cells = np.concatenate([cells[keep], add_cells])
        # re-dedupe (key, cell): collapsing P's children re-adds P even when
        # the input already contained P; a duplicate row would make the next
        # level's quartet bincount count ROWS instead of distinct children
        # and over-collapse {P, S1, S2, children(P)} past the missing S3.
        order = np.lexsort((cells, keys))
        keys, cells = keys[order], cells[order]
        if len(cells):
            first = np.concatenate([[True], (keys[1:] != keys[:-1]) | (cells[1:] != cells[:-1])])
            keys, cells = keys[first], cells[first]
        res = (cells >> np.uint64(58)).astype(np.int64)
    order = np.lexsort((cells, keys))
    return keys[order], cells[order]


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
