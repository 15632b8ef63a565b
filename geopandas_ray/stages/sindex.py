"""Public spatial-index query surface (reference geopandas/sindex.py).

The reference exposes ``GeoSeries.sindex`` with ``query(geometry, predicate,
sort, distance)``, ``nearest(geometry, return_all, max_distance,
return_distance, exclusive)`` and ``intersection(coordinates)``, all
returning POSITIONAL integer indices into the indexed frame
(sindex.py:81-87 predicate orientation, :258-260 exclusive).

Distributed design (not a port): the indexed dataset is normalized to Arrow
blocks and materialized ONCE; each block keeps its global row offset.  A
query broadcasts the probe WKB via ``ray.put`` and fans out ONE Ray task per
block — the block's bbox tree builds inside the task, candidates refine with
the shared :func:`eval_pairs` kernels — and only the matched
``(input_idx, position)`` pairs return to the driver, so driver memory is
bounded by match volume, never dataset size.  Probe sets are by contract
driver-sized (this is the index-probe surface; dataset-vs-dataset workloads
belong to sjoin/sjoin_nearest which never collect positions centrally).

Raw ``@ray.remote`` tasks are justified here: the result is a positional
index vector (a driver-side object by definition), not a Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geom import kernels as K
from ..geom.index import BBoxTree
from ..geom.wkb import from_wkb
from .core import JOIN_PREDICATES, eval_pairs


def _probe_array(geometry) -> tuple[pa.Array, bool]:
    """Normalize scalar WKB / iterable of WKB to a LargeBinary array.

    Returns (array, was_scalar)."""
    if geometry is None:
        raise TypeError("sindex query needs WKB bytes or an iterable of them")
    if isinstance(geometry, (bytes, bytearray)):
        return pa.array([bytes(geometry)], type=pa.large_binary()), True
    if isinstance(geometry, (pa.Array, pa.ChunkedArray)):
        return pa.array(geometry.to_pylist(), type=pa.large_binary()), False
    return pa.array([bytes(g) if g is not None else None for g in geometry],
                    type=pa.large_binary()), False


@ray.remote
def _block_nrows(block: pa.Table) -> int:
    return block.num_rows


@ray.remote
def _take_block(block: pa.Table, local: np.ndarray, columns) -> pa.Table:
    if columns is not None:
        block = block.select(columns)
    return block.take(pa.array(np.asarray(local, dtype=np.int64), type=pa.int64()))


@ray.remote
def _query_block(
    block: pa.Table,
    offset: int,
    probes,
    geometry: str,
    predicate: str | None,
    distance: float | None,
):
    """Matched (probe_idx, global_position) pairs for one block."""
    g = from_wkb(block.column(geometry))
    gb = K.bounds(g)
    tree = BBoxTree(gb)
    pg = from_wkb(probes)
    pb = K.bounds(pg)
    if predicate == "dwithin":
        if distance is None:
            raise ValueError("predicate='dwithin' requires a distance")
        qb = pb.copy()
        qb[:, 0] -= distance
        qb[:, 1] -= distance
        qb[:, 2] += distance
        qb[:, 3] += distance
    else:
        qb = pb
    pi, ri = tree.query_boxes(qb)
    if len(pi) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    if predicate is not None:
        keep = eval_pairs(predicate, pg, pi, g, ri, distance=distance,
                          l_bounds=pb, r_bounds=gb)
        pi, ri = pi[keep], ri[keep]
    return pi, ri + offset


@ray.remote
def _intersection_block(block: pa.Table, offset: int, box, geometry: str):
    g = from_wkb(block.column(geometry))
    tree = BBoxTree(K.bounds(g))
    _, ri = tree.query_boxes(np.asarray(box, dtype=np.float64).reshape(1, 4))
    return ri + offset


@ray.remote
def _nearest_block(
    block: pa.Table,
    offset: int,
    probes,
    geometry: str,
    max_distance: float | None,
    exclusive: bool,
):
    """Per-probe best candidates within one block: (probe_idx, position,
    distance) with all exact ties kept; the driver reduces across blocks."""
    g = from_wkb(block.column(geometry))
    gb = K.bounds(g)
    valid = np.nonzero(~np.isnan(gb).any(axis=1))[0]
    pg = from_wkb(probes)
    pb = K.bounds(pg)
    out_p: list[int] = []
    out_r: list[int] = []
    out_d: list[float] = []
    if len(valid) == 0:
        return (np.asarray(out_p, dtype=np.int64), np.asarray(out_r, dtype=np.int64),
                np.asarray(out_d, dtype=np.float64))
    vb = gb[valid]
    max_d2 = None if max_distance is None else float(max_distance) ** 2
    for p in range(len(pg)):
        if np.isnan(pb[p]).any():
            continue
        # vectorized bbox lower-bound distance probe -> every valid row
        dx = np.maximum(np.maximum(vb[:, 0] - pb[p, 2], pb[p, 0] - vb[:, 2]), 0.0)
        dy = np.maximum(np.maximum(vb[:, 1] - pb[p, 3], pb[p, 1] - vb[:, 3]), 0.0)
        lb2 = dx * dx + dy * dy
        order = np.argsort(lb2, kind="stable")
        best = np.inf
        ties_r: list[int] = []
        for k in order:
            l2 = lb2[k]
            if l2 > best or (max_d2 is not None and l2 > max_d2):
                break
            j = int(valid[k])
            d2 = K.geom_to_geom_sqdist(pg, p, g, j)
            if exclusive and d2 == 0.0:
                # reference exclusive (sindex.py:258-260) skips geometries
                # EQUAL to the probe — a probe touching/on a different
                # geometry at distance 0 is still its nearest
                if eval_pairs(
                    "geom_equals",
                    pg,
                    np.asarray([p], dtype=np.int64),
                    g,
                    np.asarray([j], dtype=np.int64),
                )[0]:
                    continue
            if max_d2 is not None and d2 > max_d2:
                continue
            if d2 < best:
                best = d2
                ties_r = [j]
            elif d2 == best:
                ties_r.append(j)
        for j in ties_r:
            out_p.append(p)
            out_r.append(j + offset)
            out_d.append(float(np.sqrt(best)))
    return (np.asarray(out_p, dtype=np.int64), np.asarray(out_r, dtype=np.int64),
            np.asarray(out_d, dtype=np.float64))


class DistributedSpatialIndex:
    """Positional query surface over a Dataset's geometry column.

    Built lazily by ``GeoDataset.sindex``; the dataset materializes once
    (Arrow-normalized via an identity map_batches so ``to_arrow_refs`` is
    safe on any upstream block type, CLAUDE.md pitfall) and the blocks stay
    in the object store — queries re-read them zero-copy."""

    #: default admission caps — ``.sindex`` is a driver-probe surface
    #: (matched pairs return to the driver); dataset-scale joins belong to
    #: sjoin / sjoin_nearest. Metadata-cheap check only: post-transform
    #: plans with unknown size pass through.
    MAX_ROWS = 50_000_000
    MAX_BYTES = 8 * 2**30

    def __init__(self, ds: ray.data.Dataset, geometry: str = "geometry",
                 max_rows: int | None = None, max_bytes: int | None = None):
        from ..util import guard_driver_sized

        guard_driver_sized(
            ds, "sindex",
            "Use sjoin()/sjoin_nearest() (distributed, streaming) for "
            "dataset-scale spatial joins.",
            self.MAX_ROWS if max_rows is None else max_rows,
            self.MAX_BYTES if max_bytes is None else max_bytes,
        )
        self.geometry = geometry
        # positions must equal the dataset's LOGICAL row order (file order
        # for reads) — Ray's streaming executor reorders output bundles by
        # task completion unless preserve_order is set, which would make
        # positions nondeterministic run to run (measured: a single-file
        # read_parquet materialized rotated by task completion).
        # (set on the dataset's CAPTURED DataContext — datasets snapshot the
        # context at creation, so mutating the global one is a no-op here)
        tmp = ds.map_batches(lambda b: b, batch_format="pyarrow")
        tmp.context.execution_options.preserve_order = True
        mat = tmp.materialize()
        self._refs = mat.to_arrow_refs()
        counts = ray.get([_block_nrows.remote(r) for r in self._refs])
        # drop zero-row blocks: Ray emits them schemaless (no geometry
        # column) and they contribute no positions anyway
        keep = [i for i, c in enumerate(counts) if c > 0]
        self._refs = [self._refs[i] for i in keep]
        counts = [counts[i] for i in keep]
        self._offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.size = int(self._offsets[-1])

    def __len__(self) -> int:
        return self.size

    @property
    def is_empty(self) -> bool:
        return self.size == 0

    @property
    def valid_query_predicates(self) -> set:
        return set(JOIN_PREDICATES)

    def take_rows(self, positions, columns: list[str] | None = None) -> pa.Table:
        """Gather rows by global position (the reference idiom
        ``gdf.iloc[sindex.query(...)]``), preserving the given order.
        Driver-bounded by len(positions)."""
        if not self._refs:
            return pa.table({})
        pos = np.asarray(positions, dtype=np.int64)
        if len(pos) == 0:
            return ray.get(_take_block.remote(self._refs[0], pos, columns))
        if pos.min() < 0 or pos.max() >= self.size:
            raise IndexError("position out of range")
        blk = np.searchsorted(self._offsets, pos, side="right") - 1
        order = np.argsort(blk, kind="stable")  # group by block, caller order within
        parts = []
        for b in np.unique(blk):
            local = pos[order][blk[order] == b] - self._offsets[b]
            parts.append(_take_block.remote(self._refs[b], local, columns))
        cat = pa.concat_tables(ray.get(parts))
        # cat row i corresponds to caller index order[i]; invert
        return cat.take(pa.array(np.argsort(order), type=pa.int64()))

    def query(self, geometry, predicate: str | None = None, sort: bool = False,
              distance: float | None = None):
        """Reference sindex.query: scalar WKB -> 1-D positions; iterable of
        WKB -> (2, n) [input_idx, position]. ``sort=True`` orders by
        (input, position); otherwise block order."""
        if predicate is not None and predicate not in JOIN_PREDICATES:
            raise ValueError(
                f"`predicate` = `{predicate}` not a supported option; "
                f"use one of {sorted(map(str, JOIN_PREDICATES))}"
            )
        if predicate == "dwithin" and distance is None:
            raise ValueError("predicate='dwithin' requires a distance")
        probes, scalar = _probe_array(geometry)
        probes_ref = ray.put(probes)
        parts = ray.get([
            _query_block.remote(r, int(off), probes_ref, self.geometry, predicate, distance)
            for r, off in zip(self._refs, self._offsets[:-1])
        ])
        pi = np.concatenate([p for p, _ in parts]) if parts else np.empty(0, dtype=np.int64)
        ri = np.concatenate([r for _, r in parts]) if parts else np.empty(0, dtype=np.int64)
        if sort:
            o = np.lexsort((ri, pi))
            pi, ri = pi[o], ri[o]
        if scalar:
            return np.sort(ri) if sort else ri
        return np.vstack([pi, ri])

    def intersection(self, coordinates):
        """Reference sindex.intersection: positions whose bounds overlap the
        (minx, miny, maxx, maxy) box."""
        box = np.asarray(coordinates, dtype=np.float64)
        parts = ray.get([
            _intersection_block.remote(r, int(off), box, self.geometry)
            for r, off in zip(self._refs, self._offsets[:-1])
        ])
        out = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        return np.sort(out)

    def nearest(self, geometry, return_all: bool = True,
                max_distance: float | None = None, return_distance: bool = False,
                exclusive: bool = False):
        """Reference sindex.nearest: (2, n) [input_idx, position] of the
        nearest indexed geometry per probe (all exact ties when
        ``return_all``); optionally the distances."""
        probes, scalar = _probe_array(geometry)
        probes_ref = ray.put(probes)
        parts = ray.get([
            _nearest_block.remote(r, int(off), probes_ref, self.geometry,
                                  max_distance, exclusive)
            for r, off in zip(self._refs, self._offsets[:-1])
        ])
        pi = np.concatenate([a for a, _, _ in parts]) if parts else np.empty(0, dtype=np.int64)
        ri = np.concatenate([b for _, b, _ in parts]) if parts else np.empty(0, dtype=np.int64)
        di = np.concatenate([c for _, _, c in parts]) if parts else np.empty(0, dtype=np.float64)
        # global reduce: per probe keep min distance (+ ties / first position)
        keep_p: list[np.ndarray] = []
        keep_r: list[np.ndarray] = []
        keep_d: list[np.ndarray] = []
        if len(pi):
            o = np.lexsort((ri, di, pi))
            pi, ri, di = pi[o], ri[o], di[o]
            starts = np.concatenate([[0], np.nonzero(np.diff(pi))[0] + 1])
            ends = np.concatenate([starts[1:], [len(pi)]])
            for s, e in zip(starts, ends):
                best = di[s]
                if return_all:
                    m = s + int(np.searchsorted(di[s:e], best, side="right"))
                else:
                    m = s + 1
                keep_p.append(pi[s:m])
                keep_r.append(ri[s:m])
                keep_d.append(di[s:m])
        pj = np.concatenate(keep_p) if keep_p else np.empty(0, dtype=np.int64)
        rj = np.concatenate(keep_r) if keep_r else np.empty(0, dtype=np.int64)
        dj = np.concatenate(keep_d) if keep_d else np.empty(0, dtype=np.float64)
        idx = np.vstack([pj, rj])
        if return_distance:
            return idx, dj
        return idx
