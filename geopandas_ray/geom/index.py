"""Sort-tile-recursive bbox tree in flat NumPy arrays.

The reference wraps shapely.STRtree (geopandas/sindex.py:11) as a cached
per-GeometryArray index. In the Ray engine an index is never global: a tree
is built ephemeral per join task / per broadcast actor (SURVEY.md §2.9),
so build cost must be low and queries vectorized. This tree is a two-level
STR layout: items sorted by Hilbert rank of bbox centers, chunked into
leaves, leaf bboxes kept as flat arrays; queries test query-vs-leaf bboxes
vectorized then refine members, all NumPy.
"""

from __future__ import annotations

import numpy as np

from ..grid import hilbert_d


class BBoxTree:
    """Static bbox tree over (N,4) [minx,miny,maxx,maxy] rows.

    Rows with any NaN bound (missing/empty geometry) are excluded at build,
    mirroring sindex.py:21-25 (empties mapped out before insertion).
    """

    def __init__(self, bounds: np.ndarray, leaf_size: int = 32):
        bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 4)
        self.n = len(bounds)
        valid = ~np.isnan(bounds).any(axis=1)
        idx = np.nonzero(valid)[0]
        b = bounds[idx]
        if len(b):
            cx = (b[:, 0] + b[:, 2]) * 0.5
            cy = (b[:, 1] + b[:, 3]) * 0.5
            span = max(
                b[:, 2].max() - b[:, 0].min(),
                b[:, 3].max() - b[:, 1].min(),
                1e-12,
            )
            level = 16
            gx = np.clip(((cx - b[:, 0].min()) / span * ((1 << level) - 1)).astype(np.int64), 0, (1 << level) - 1)
            gy = np.clip(((cy - b[:, 1].min()) / span * ((1 << level) - 1)).astype(np.int64), 0, (1 << level) - 1)
            order = np.argsort(hilbert_d(gx, gy, level), kind="stable")
        else:
            order = np.empty(0, dtype=np.int64)
        self.item_ids = idx[order]  # original row ids in leaf order
        self.item_bounds = bounds[self.item_ids]
        self.leaf_size = leaf_size
        n_items = len(self.item_ids)
        n_leaves = max(1, (n_items + leaf_size - 1) // leaf_size) if n_items else 0
        self.leaf_offsets = np.minimum(
            np.arange(n_leaves + 1, dtype=np.int64) * leaf_size, n_items
        )
        if n_leaves:
            starts = self.leaf_offsets[:-1]
            lb = np.empty((n_leaves, 4))
            lb[:, 0] = np.minimum.reduceat(self.item_bounds[:, 0], starts)
            lb[:, 1] = np.minimum.reduceat(self.item_bounds[:, 1], starts)
            lb[:, 2] = np.maximum.reduceat(self.item_bounds[:, 2], starts)
            lb[:, 3] = np.maximum.reduceat(self.item_bounds[:, 3], starts)
            self.leaf_bounds = lb
        else:
            self.leaf_bounds = np.empty((0, 4))

    def __len__(self):
        return len(self.item_ids)

    # -- queries ------------------------------------------------------------

    def query_boxes(self, qb: np.ndarray, chunk: int = 2048):
        """Candidate pairs for bbox-overlap: returns (query_idx, item_id).

        Overlap is closed-interval (touching bboxes are candidates), matching
        tree-based candidate generation before exact predicates.
        """
        qb = np.asarray(qb, dtype=np.float64).reshape(-1, 4)
        m = len(qb)
        L = len(self.leaf_bounds)
        if m == 0 or L == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        out_q: list[np.ndarray] = []
        out_t: list[np.ndarray] = []
        lb = self.leaf_bounds
        for s in range(0, m, chunk):
            q = qb[s : s + chunk]
            qvalid = ~np.isnan(q).any(axis=1)
            # (mq, L) leaf overlap
            ov = (
                (q[:, None, 0] <= lb[None, :, 2])
                & (q[:, None, 2] >= lb[None, :, 0])
                & (q[:, None, 1] <= lb[None, :, 3])
                & (q[:, None, 3] >= lb[None, :, 1])
                & qvalid[:, None]
            )
            qi, li = np.nonzero(ov)
            if len(qi) == 0:
                continue
            # expand members of each candidate leaf (single repeat + arange)
            starts = self.leaf_offsets[li]
            counts = self.leaf_offsets[li + 1] - starts
            total = int(counts.sum())
            offs = np.empty(len(counts), dtype=np.int64)
            offs[0] = 0
            np.cumsum(counts[:-1], out=offs[1:])
            member = np.arange(total, dtype=np.int64) + np.repeat(starts - offs, counts)
            pair_q = np.repeat(qi, counts)
            ib = self.item_bounds[member]
            hit = (
                (q[pair_q, 0] <= ib[:, 2])
                & (q[pair_q, 2] >= ib[:, 0])
                & (q[pair_q, 1] <= ib[:, 3])
                & (q[pair_q, 3] >= ib[:, 1])
            )
            out_q.append(pair_q[hit] + s)
            out_t.append(self.item_ids[member[hit]])
        if not out_q:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_q), np.concatenate(out_t)

    def query_points(self, px: np.ndarray, py: np.ndarray, expand: float = 0.0):
        """Candidate pairs for point containment (optionally dilated by
        ``expand`` for dwithin): returns (query_idx, item_id)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        qb = np.column_stack([px - expand, py - expand, px + expand, py + expand])
        return self.query_boxes(qb)
