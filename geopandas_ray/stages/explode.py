"""explode - multipart to one row per part (SURVEY.md §2.2).

Reference: GeoDataFrame.explode (geodataframe.py:1417): each part of a
Multi* geometry becomes its own row; part order is preserved within each
parent (test_geom_methods.py:1694 test_explode_order). The pandas
MultiIndex level is modeled as an explicit ``part_index`` column
(SURVEY.md §1.3 index-as-columns rule); ``ignore_index`` simply omits it.

Pure row-expanding map_batches - embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom.wkb import Geoms, from_wkb, to_wkb


def _explode_batch(g: Geoms) -> tuple[np.ndarray, np.ndarray, Geoms]:
    """-> (parent_row_idx, part_index, single-part Geoms)."""
    n_parts_per_row = g.row_offsets[1:] - g.row_offsets[:-1]
    # missing/empty rows keep one output row (reference keeps them)
    out_counts = np.maximum(n_parts_per_row, 1)
    parent = np.repeat(np.arange(len(g), dtype=np.int64), out_counts)
    offs = np.concatenate([[0], np.cumsum(out_counts)])
    part_index = np.arange(len(parent), dtype=np.int64) - offs[parent]

    coords_chunks = []
    ring_off = [0]
    part_off = [0]
    row_off = [0]
    part_types = []
    row_types = np.zeros(len(parent), dtype=np.int8)
    k = 0
    for i in range(len(g)):
        p0, p1 = g.row_part_range(i)
        if p1 == p0:
            row_types[k] = g.row_types[i]
            row_off.append(row_off[-1])
            k += 1
            continue
        for p in range(p0, p1):
            r0, r1 = g.part_ring_range(p)
            for r in range(r0, r1):
                c = g.ring_coords(r)
                coords_chunks.append(c)
                ring_off.append(ring_off[-1] + len(c))
            part_off.append(part_off[-1] + (r1 - r0))
            part_types.append(int(g.part_types[p]))
            row_off.append(row_off[-1] + 1)
            row_types[k] = int(g.part_types[p])
            k += 1
    coords = np.concatenate(coords_chunks) if coords_chunks else np.empty((0, 2))
    return parent, part_index, Geoms(coords, ring_off, part_off, row_off, part_types, row_types)


def explode(
    ds: ray.data.Dataset,
    geometry: str = "geometry",
    ignore_index: bool = False,
    index_parts: bool = True,
) -> ray.data.Dataset:
    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        parent, part_index, parts = _explode_batch(g)
        out = b.take(pa.array(parent))
        idx = out.column_names.index(geometry)
        out = out.set_column(idx, geometry, to_wkb(parts))
        if index_parts and not ignore_index:
            out = out.append_column("part_index", pa.array(part_index))
        return out

    return ds.map_batches(f, batch_format="pyarrow")


def get_coordinates(ds: ray.data.Dataset, geometry: str = "geometry") -> ray.data.Dataset:
    """base.py:5550 - one row per coordinate pair (x, y appended)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        start = g.ring_offsets[g.part_offsets[g.row_offsets[:-1]]]
        end = g.ring_offsets[g.part_offsets[g.row_offsets[1:]]]
        counts = (end - start).astype(np.int64)
        parent = np.repeat(np.arange(len(g), dtype=np.int64), counts)
        out = b.take(pa.array(parent))
        out = out.append_column("x", pa.array(g.coords[:, 0]))
        out = out.append_column("y", pa.array(g.coords[:, 1]))
        return out.drop_columns([geometry])

    return ds.map_batches(f, batch_format="pyarrow")
