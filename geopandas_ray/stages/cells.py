"""Hierarchical cell-index stages (north-rule H3/S2-analog surface).

The north rule's partitioning backbone is a hierarchical cell key. grid.py
holds the pure bit math (cell_id / parent / children / k-ring / compact);
this module lifts it onto ray.data Datasets:

- ``with_cell_cover``: polyfill - one output row per (input row, cell) the
  geometry ACTUALLY intersects at a resolution (bbox candidate enumeration
  + the engine's exact pairwise intersects kernel), the exact analog of
  H3 ``polyfill`` / S2 ``RegionCoverer`` at a fixed level. Stateless
  flat-map, embarrassingly parallel - scale path is identical to sjoin's
  cell-covering stage.
- ``with_cell_kring``: k-ring expansion of an existing cell column
  (H3 ``kRing``); used for neighborhood joins (match a point's cell
  against dilated zone coverings).
- ``with_cell_children``: one row per child cell (``uncompact`` one level
  or more).
- ``compact_cover``: covering minimization per key (H3 ``compact``) -
  quartets of siblings collapse to their parent, cascading. Runs as a
  hash-partitioned vectorized pass (CLAUDE.md invariant: never per-key
  map_groups for cheap-per-group work); one worker compacts ALL its keys
  in a single lexsort-based sweep (grid.compact_keyed).

Reference surface parity: GeoPandas has no cell index (sindex is an
STRtree, sindex.py:11); these are engine extensions the north rule names
explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.wkb import box_geoms, from_wkb
from ..grid import (
    DEFAULT_DOMAIN,
    cell_bounds,
    cell_children,
    cell_neighbors,
    cells_for_bbox,
    compact_keyed,
)
from ..util import default_shuffle_partitions
from .core import eval_pairs


def cover_cells(g, res: int, domain=DEFAULT_DOMAIN, exact: bool = True):
    """Flat (row_index, cell_id) covering arrays for a Geoms batch.

    Covering contract (the one a shuffle key needs): every cell that any
    point of the geometry MAPS INTO under the half-open cell grid (the
    same floor mapping ``cell_id`` applies to points) is present, so a
    cell-equality join never loses a pair. Candidates come from the bbox's
    half-open enumeration; ``exact=True`` then drops candidates whose
    closed cell rectangle does not intersect the geometry (pairwise
    kernel), which can retain a boundary-degenerate superset but never
    undercovers - unlike H3 ``polyfill``'s centroid rule.
    ``exact=False`` keeps the whole bbox covering (cheap superset).
    """
    bb = K.bounds(g)
    valid = ~np.isnan(bb).any(axis=1)
    vrows = np.nonzero(valid)[0]
    if len(vrows) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    sub_idx, cells = cells_for_bbox(
        bb[vrows, 0], bb[vrows, 1], bb[vrows, 2], bb[vrows, 3], res, domain
    )
    row_idx = vrows[sub_idx]
    if exact and len(row_idx):
        rects = cell_bounds(cells, domain)
        boxes = box_geoms(rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3])
        mask = eval_pairs(
            "intersects", g, row_idx, boxes, np.arange(len(cells), dtype=np.int64)
        )
        row_idx, cells = row_idx[mask], cells[mask]
    return row_idx, cells


def with_cell_cover(
    ds: ray.data.Dataset,
    res: int,
    geometry: str = "geometry",
    out: str = "cell",
    exact: bool = True,
    domain=DEFAULT_DOMAIN,
) -> ray.data.Dataset:
    """Polyfill: expand each row to one row per covering cell at ``res``."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        row_idx, cells = cover_cells(g, res, domain, exact)
        t = b.take(pa.array(row_idx))
        return t.append_column(out, pa.array(cells.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def with_cell_kring(
    ds: ray.data.Dataset,
    cell_col: str = "cell",
    k: int = 1,
    out: str = "neighbor_cell",
    include_center: bool = True,
) -> ray.data.Dataset:
    """k-ring expansion: one row per (row, same-res neighbor cell)."""

    def f(b: pa.Table) -> pa.Table:
        cells = np.asarray(b.column(cell_col), dtype=np.uint64)
        row_idx, ids = cell_neighbors(cells, k, include_center)
        t = b.take(pa.array(row_idx))
        return t.append_column(out, pa.array(ids.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def with_cell_children(
    ds: ray.data.Dataset,
    cell_col: str = "cell",
    levels: int = 1,
    out: str = "child_cell",
) -> ray.data.Dataset:
    """One row per descendant cell ``levels`` down (4**levels fanout)."""

    def f(b: pa.Table) -> pa.Table:
        cells = np.asarray(b.column(cell_col), dtype=np.uint64)
        row_idx, ids = cell_children(cells, levels)
        t = b.take(pa.array(row_idx))
        return t.append_column(out, pa.array(ids.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def compact_cover(
    ds: ray.data.Dataset,
    key_col: str,
    cell_col: str = "cell",
    nparts: int | None = None,
) -> ray.data.Dataset:
    """Minimize each key's cell covering (H3 compact): (key, cell) in ->
    (key, cell) out with complete sibling quartets collapsed to parents,
    cascading to the coarsest possible mixed-res set.

    One hash shuffle on the key, then a single vectorized multi-key sweep
    per partition - no per-key tasks, so a 10^9-key covering compacts at
    full parallelism.
    """
    import pandas as pd

    nparts = nparts or default_shuffle_partitions()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[key_col].to_numpy()) % nparts
        return df

    def compact_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns="__part")
        keys, cells = compact_keyed(
            df[key_col].to_numpy(), df[cell_col].to_numpy().astype(np.uint64)
        )
        return pd.DataFrame({key_col: keys, cell_col: cells.astype(np.int64)})

    ds = ds.map_batches(add_part, batch_format="pandas")
    # CLAUDE.md invariant: repartition before groupby or the shuffle emits
    # one output partition per input block
    ds = ds.repartition(nparts)
    return ds.groupby("__part").map_groups(compact_part, batch_format="pandas")


def with_hex_cell(ds, res: int, geometry: str = "geometry", out: str = "hex_cell"):
    """H3-analog hex key per row (centroid-assigned for non-points, like
    H3's cellToParent-of-centroid convention for feature bucketing).
    Stateless vectorized map; see grid_hex.py for the id scheme."""
    import pyarrow as pa

    from ..geom import kernels as K
    from ..geom.wkb import from_wkb
    from ..grid_hex import hex_cell

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        cx = (bb[:, 0] + bb[:, 2]) / 2.0
        cy = (bb[:, 1] + bb[:, 3]) / 2.0
        import numpy as np

        cells = np.where(
            np.isnan(cx), -1, hex_cell(np.nan_to_num(cx), np.nan_to_num(cy), res)
        ).astype(np.int64)
        return b.append_column(out, pa.array(cells))

    return ds.map_batches(f, batch_format="pyarrow")


def with_hex_kring(ds, k: int, cell_col: str = "hex_cell", out: str = "hex_neighbor"):
    """Flat-map each row to its kRing neighborhood (H3 gridDisk analog)."""
    import numpy as np
    import pyarrow as pa

    from ..grid_hex import hex_kring, hex_pack, hex_unpack

    def f(b: pa.Table) -> pa.Table:
        cells = np.asarray(b.column(cell_col), dtype=np.int64)
        res, q0, r0 = hex_unpack(cells)
        # vectorized disk: offsets once, broadcast over rows
        dq, dr = [], []
        for a in range(-k, k + 1):
            for c in range(max(-k, -a - k), min(k, -a + k) + 1):
                dq.append(a)
                dr.append(c)
        dq = np.array(dq, dtype=np.int64)
        dr = np.array(dr, dtype=np.int64)
        n = len(cells)
        m = len(dq)
        rows = np.repeat(np.arange(n, dtype=np.int64), m)
        nq = q0[rows] + np.tile(dq, n)
        nr = r0[rows] + np.tile(dr, n)
        nb = hex_pack(int(res[0]) if n else 0, nq, nr)
        t = b.take(pa.array(rows))
        return t.append_column(out, pa.array(nb))

    return ds.map_batches(f, batch_format="pyarrow")


def with_hex_cover(ds, res: int, geometry: str = "geometry", out: str = "hex_cell"):
    """Flat-map each polygon row to its hex polyfill (H3 polyfill analog:
    center-containment, grid_hex.py). Rows expand one-per-cell; non-areal
    rows fall back to their centroid cell so every row keeps >=1 key."""
    import numpy as np
    import pyarrow as pa

    from ..geom import kernels as K
    from ..geom.booleans import geom_polygons
    from ..geom.wkb import from_wkb
    from ..grid_hex import hex_cell, hex_polyfill

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        rows: list[int] = []
        cells: list[int] = []
        bb = K.bounds(g)
        for i in range(len(g)):
            polys = geom_polygons(g, i) if int(g.row_types[i]) in (3, 6, 7) else []
            got = []
            if polys:
                rings = [r for rings in polys for r in rings]
                got = hex_polyfill(rings, res).tolist()
            if not got and not np.isnan(bb[i, 0]):
                cx = (bb[i, 0] + bb[i, 2]) / 2.0
                cy = (bb[i, 1] + bb[i, 3]) / 2.0
                got = hex_cell(np.array([cx]), np.array([cy]), res).tolist()
            rows.extend([i] * len(got))
            cells.extend(int(c) for c in got)
        t = b.take(pa.array(np.array(rows, dtype=np.int64)))
        return t.append_column(out, pa.array(np.array(cells, dtype=np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")
