"""Raster-tile <-> vector assignment (SURVEY.md §2.10, north-rule operator).

Assigns each row to the tile(s) its geometry intersects, arithmetically
(floor-divide by tile size - no tree, no shuffle): points emit one row,
polygons/lines enumerate candidate tiles from the bbox and keep those that
pass the exact intersects test. Half-open [min, max) tile convention (F5).

Tile id layout (z<<40)|(x<<20)|y per fixture F5. Stateless flat-map -
embarrassingly parallel; tiling throughput is part of the headline metric.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.wkb import from_wkb
from ..grid import DEFAULT_DOMAIN, point_tiles, tile_id


def assign_tiles(
    ds: ray.data.Dataset,
    z: int,
    geometry: str = "geometry",
    domain=DEFAULT_DOMAIN,
    exact: bool = True,
) -> ray.data.Dataset:
    """Appends z/tile_x/tile_y/tile_id; multi-tile geometries expand rows."""
    x0, y0, x1, y1 = domain
    ts_x = (x1 - x0) / float(1 << z)
    ts_y = (y1 - y0) / float(1 << z)

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        if g.all_points and not g.is_missing.any() and not g.is_empty.any():
            ci = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
            px = g.coords[ci, 0]
            py = g.coords[ci, 1]
            tx, ty = point_tiles(px, py, z, domain)
            out = b
            row_idx = None
        else:
            bb = K.bounds(g)
            valid = ~np.isnan(bb).any(axis=1)
            tx0 = np.floor((bb[:, 0] - x0) / ts_x).astype(np.int64)
            ty0 = np.floor((bb[:, 1] - y0) / ts_y).astype(np.int64)
            # half-open: a bbox max exactly on a tile edge stays in the lower tile
            tx1 = np.floor(np.nextafter((bb[:, 2] - x0) / ts_x, -np.inf)).astype(np.int64)
            ty1 = np.floor(np.nextafter((bb[:, 3] - y0) / ts_y, -np.inf)).astype(np.int64)
            tx1 = np.maximum(tx1, tx0)
            ty1 = np.maximum(ty1, ty0)
            counts = np.where(valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
            row_idx = np.repeat(np.arange(len(g), dtype=np.int64), counts)
            offs = np.concatenate([[0], np.cumsum(counts)])
            local = np.arange(len(row_idx), dtype=np.int64) - offs[row_idx]
            nx = (tx1 - tx0 + 1)[row_idx]
            tx = tx0[row_idx] + local % nx
            ty = ty0[row_idx] + local // nx
            if exact and len(row_idx):
                from ..geom.wkb import box_geoms
                from .core import eval_pairs

                keep = np.ones(len(row_idx), dtype=bool)
                # point rows always pass (their single tile is exact already)
                check = ~np.isin(g.row_types[row_idx], (1, 4))
                ck = np.nonzero(check)[0]
                if len(ck):
                    tb = box_geoms(
                        x0 + tx[ck] * ts_x,
                        y0 + ty[ck] * ts_y,
                        x0 + (tx[ck] + 1) * ts_x,
                        y0 + (ty[ck] + 1) * ts_y,
                    )
                    keep[ck] = eval_pairs(
                        "intersects",
                        g,
                        row_idx[ck],
                        tb,
                        np.arange(len(ck), dtype=np.int64),
                    )
                row_idx, tx, ty = row_idx[keep], tx[keep], ty[keep]
            out = b.take(pa.array(row_idx))
        out = out.append_column("z", pa.array(np.full(len(tx), z, dtype=np.int8)))
        out = out.append_column("tile_x", pa.array(tx))
        out = out.append_column("tile_y", pa.array(ty))
        out = out.append_column(
            "tile_id", pa.array(tile_id(z, tx, ty).astype(np.int64))
        )
        return out

    return ds.map_batches(f, batch_format="pyarrow")
