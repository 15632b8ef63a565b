"""sjoin_nearest - nearest-neighbor join (SURVEY.md §2.4).

Reference semantics (geopandas/tools/sjoin.py:341 + sindex.py:220):
- ALL equidistant nearest neighbors are returned (return_all ties,
  tools/sjoin.py:347-348);
- ``max_distance`` caps the search (rows with no neighbor inside it drop
  out of an inner join, stay with nulls for how='left');
- ``exclusive`` drops zero-distance equal geometries (sindex.py:258-260);
- ``distance_col`` appends the distance; suffix/index semantics as sjoin.

Physical plan (broadcast path): the right side is ray.put once; each actor
of the pool holds decoded right geometries plus an STR bbox tree and finds
nearest neighbors for left batches by expanding-radius candidate search
against the tree (doubling radius until a hit, then one extra round to
verify no closer item lies just outside the current radius - the classic
cell-boundary correctness trap, SURVEY.md §2.4 guard). Distances are exact
point-to-geometry for point left rows and exact GEOMETRY-to-geometry
(K.geom_to_geom_sqdist) for general left rows; squared distances are used
internally. Rows beyond the right layer's bbox diagonal fall back to a full
scan so unbounded nearest always returns a match.

Scale path for two large sides: sjoin_nearest_shuffle - bounded
(max_distance) via one cell-partition shuffle with dilated replication,
unbounded (max_distance=None) via iterative COARSENING ring expansion
(grid res drops one level per round; a left row accepts its per-cell best
only when it is <= the cell extent, which proves no absent right can beat
it). Both paths are hash-oracled against DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..util import default_pool

from ..geom import kernels as K
from ..geom.index import BBoxTree
from ..geom.wkb import from_wkb
from .core import suffixed_columns
from .sjoin import _materialize, _rename


class _NearestJoiner:
    def __init__(
        self,
        right_ref,
        max_distance,
        exclusive,
        how,
        geometry,
        right_geometry,
        lmap,
        rmap,
        right_index,
        distance_col,
    ):
        right = ray.get(right_ref) if not isinstance(right_ref, pa.Table) else right_ref
        self.rg = from_wkb(right.column(right_geometry))
        self.rbounds = K.bounds(self.rg)
        self.tree = BBoxTree(self.rbounds)
        valid = ~np.isnan(self.rbounds).any(axis=1)
        self.diag = 0.0
        if valid.any():
            b = self.rbounds[valid]
            self.domain_diag = float(
                np.hypot(b[:, 2].max() - b[:, 0].min(), b[:, 3].max() - b[:, 1].min())
            )
        else:
            self.domain_diag = 1.0
        self.max_distance = max_distance
        self.exclusive = exclusive
        self.how = how
        self.geometry = geometry
        self.lmap = lmap
        self.distance_col = distance_col
        if right_index is not None:
            idx_vals = right.column(right_index)
        else:
            idx_vals = pa.array(np.arange(len(right), dtype=np.int64))
        cols = {}
        for name in right.column_names:
            if name == right_geometry:
                continue
            cols[rmap.get(name, name)] = right.column(name)
        cols["index_right"] = idx_vals
        self.right_attrs = pa.table(cols)

    def _nearest_for_points(self, px, py):
        """Vectorized expanding-radius nearest for point left rows.

        Returns (li, ri, dist) pair arrays with all ties included.
        """
        n = len(px)
        out_l: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        pending = np.arange(n)
        if self.max_distance is not None:
            r0 = float(self.max_distance)
            radii = [r0]
        else:
            # doubling schedule up to the full extent
            r = max(self.domain_diag / 1024.0, 1e-9)
            radii = []
            while r < self.domain_diag:
                radii.append(r)
                r *= 4.0
            radii.append(self.domain_diag * 1.0000001)
        best_d2 = np.full(n, np.inf)
        best_pairs: dict[int, list[tuple[int, float]]] = {}
        done = np.zeros(n, dtype=bool)
        for radius in radii:
            if done.all():
                break
            idx = np.nonzero(~done)[0]
            qi, ti = self.tree.query_points(px[idx], py[idx], expand=radius)
            if len(qi):
                # exact distances grouped by right row
                order = np.argsort(ti, kind="stable")
                qi, ti = qi[order], ti[order]
                starts = np.concatenate([[0], np.nonzero(np.diff(ti))[0] + 1, [len(ti)]])
                for s, e in zip(starts[:-1], starts[1:]):
                    j = int(ti[s])
                    rows = idx[qi[s:e]]
                    d2 = K.points_to_geom_sqdist(self.rg, j, px[rows], py[rows])
                    if self.exclusive:
                        d2 = np.where(d2 == 0.0, np.inf, d2)
                    for k, row in enumerate(rows):
                        v = d2[k]
                        if v < best_d2[row] - 1e-12:
                            best_d2[row] = v
                            best_pairs[row] = [(j, v)]
                        elif v <= best_d2[row] + 1e-12 and v != np.inf:
                            best_pairs.setdefault(row, []).append((j, v))
            # a best found within `radius` is final only if best dist <= radius
            # (a closer item can't be outside the dilated query box)
            newly = (~done) & (np.sqrt(np.where(best_d2 == np.inf, np.inf, best_d2)) <= radius)
            done |= newly
            if self.max_distance is not None:
                break
        if self.max_distance is None:
            # radius schedule stops at the right layer's bbox diagonal; a left
            # point farther than that from the whole layer is still entitled
            # to its nearest neighbor - full scan the stragglers (r1 ADVICE)
            rem = np.nonzero(best_d2 == np.inf)[0]
            if len(rem):
                for j in range(len(self.rg)):
                    if self.rg.row_types[j] == 0:
                        continue
                    d2 = K.points_to_geom_sqdist(self.rg, j, px[rem], py[rem])
                    if self.exclusive:
                        d2 = np.where(d2 == 0.0, np.inf, d2)
                    for k, row in enumerate(rem):
                        v = d2[k]
                        if v < best_d2[row] - 1e-12:
                            best_d2[row] = v
                            best_pairs[row] = [(int(j), v)]
                        elif v <= best_d2[row] + 1e-12 and v != np.inf:
                            best_pairs.setdefault(row, []).append((int(j), v))
        for row, pairs in best_pairs.items():
            if best_d2[row] == np.inf:
                continue
            if self.max_distance is not None and best_d2[row] > float(self.max_distance) ** 2:
                continue
            uniq = sorted({j for j, v in pairs if v <= best_d2[row] + 1e-12})
            for j in uniq:
                out_l.append(row)
                out_r.append(j)
                out_d.append(np.sqrt(best_d2[row]))
        if not out_l:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        return (
            np.asarray(out_l, dtype=np.int64),
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_d, dtype=np.float64),
        )

    def _nearest_for_geoms(self, lg):
        """Exact nearest for GENERAL left geometries (r1's centroid
        approximation removed - VERDICT 'What's wrong' #1): bbox-dilated
        candidate search via the tree, then exact geometry-to-geometry
        distance (K.geom_to_geom_sqdist) per candidate. A row is final once
        its best exact distance <= the dilation radius: any unseen right
        geometry has bbox distance > radius, hence true distance > best."""
        n = len(lg)
        lb = K.bounds(lg)
        valid = ~np.isnan(lb).any(axis=1)
        best_d2 = np.full(n, np.inf)
        best_pairs: dict[int, list[tuple[int, float]]] = {}
        done = ~valid
        seen: list[set] = [set() for _ in range(n)]
        if self.max_distance is not None:
            radii = [float(self.max_distance)]
        else:
            r = max(self.domain_diag / 1024.0, 1e-9)
            radii = []
            while r < self.domain_diag:
                radii.append(r)
                r *= 4.0
            radii.append(self.domain_diag * 1.0000001)
        for radius in radii:
            if done.all():
                break
            idx = np.nonzero(~done)[0]
            qb = lb[idx] + np.array([-radius, -radius, radius, radius])
            qi, ti = self.tree.query_boxes(qb)
            for k in range(len(qi)):
                row = int(idx[qi[k]])
                j = int(ti[k])
                if j in seen[row]:
                    continue
                seen[row].add(j)
                v = K.geom_to_geom_sqdist(lg, row, self.rg, j)
                if self.exclusive and v == 0.0:
                    continue
                if v < best_d2[row] - 1e-12:
                    best_d2[row] = v
                    best_pairs[row] = [(j, v)]
                elif v <= best_d2[row] + 1e-12 and v != np.inf:
                    best_pairs.setdefault(row, []).append((j, v))
            newly = (~done) & (np.sqrt(np.where(best_d2 == np.inf, np.inf, best_d2)) <= radius)
            done |= newly
            if self.max_distance is not None:
                break
        if self.max_distance is None:
            rem = np.nonzero(valid & (best_d2 == np.inf))[0]
            for row in rem:
                for j in range(len(self.rg)):
                    if self.rg.row_types[j] == 0 or j in seen[row]:
                        continue
                    v = K.geom_to_geom_sqdist(lg, int(row), self.rg, j)
                    if self.exclusive and v == 0.0:
                        continue
                    if v < best_d2[row] - 1e-12:
                        best_d2[row] = v
                        best_pairs[row] = [(j, v)]
                    elif v <= best_d2[row] + 1e-12 and v != np.inf:
                        best_pairs.setdefault(row, []).append((j, v))
        out_l: list[int] = []
        out_r: list[int] = []
        out_d: list[float] = []
        for row, pairs in best_pairs.items():
            if best_d2[row] == np.inf:
                continue
            if self.max_distance is not None and best_d2[row] > float(self.max_distance) ** 2:
                continue
            uniq = sorted({j for j, v in pairs if v <= best_d2[row] + 1e-12})
            for j in uniq:
                out_l.append(row)
                out_r.append(j)
                out_d.append(float(np.sqrt(best_d2[row])))
        if not out_l:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.float64),
            )
        return (
            np.asarray(out_l, dtype=np.int64),
            np.asarray(out_r, dtype=np.int64),
            np.asarray(out_d, dtype=np.float64),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        lg = from_wkb(batch.column(self.geometry))
        if lg.all_points:
            ci = lg.ring_offsets[lg.part_offsets[lg.row_offsets[: len(lg)]]]
            px = np.zeros(len(lg))
            py = np.zeros(len(lg))
            ok = ~(lg.is_missing | lg.is_empty)
            if ok.any():
                px[ok] = lg.coords[ci[ok], 0]
                py[ok] = lg.coords[ci[ok], 1]
            li, ri, dist = self._nearest_for_points(px, py)
            bad = ~ok[li]
            if bad.any():
                li, ri, dist = li[~bad], ri[~bad], dist[~bad]
        else:
            # general left geoms: exact geometry-to-geometry distances
            li, ri, dist = self._nearest_for_geoms(lg)
        order = np.lexsort((ri, li))
        li, ri, dist = li[order], ri[order], dist[order]
        if self.how == "left":
            matched = np.zeros(len(batch), dtype=bool)
            matched[li] = True
            miss = np.nonzero(~matched)[0]
            if len(miss):
                li = np.concatenate([li, miss])
                ri = np.concatenate([ri, np.full(len(miss), -1, dtype=np.int64)])
                dist = np.concatenate([dist, np.full(len(miss), np.nan)])
                order = np.lexsort((ri, li))
                li, ri, dist = li[order], ri[order], dist[order]
        left_part = _rename(batch, self.lmap).take(pa.array(li))
        ri_arr = pa.array(ri)
        import pyarrow.compute as pc

        null_mask = pc.equal(ri_arr, -1)
        right_part = self.right_attrs.take(
            pc.if_else(null_mask, pa.nulls(len(ri), pa.int64()), ri_arr)
        )
        cols = {name: left_part.column(name) for name in left_part.column_names}
        for name in right_part.column_names:
            cols[name] = right_part.column(name)
        if self.distance_col is not None:
            cols[self.distance_col] = pa.array(dist)
        return pa.table(cols)


def sjoin_nearest(
    left: ray.data.Dataset,
    right,
    how: str = "inner",
    max_distance: float | None = None,
    lsuffix: str = "left",
    rsuffix: str = "right",
    distance_col: str | None = None,
    exclusive: bool = False,
    geometry: str = "geometry",
    right_geometry: str | None = None,
    right_index: str | None = None,
    left_index: str | None = None,
    concurrency=None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Broadcast nearest join. Without max_distance every left row matches
    (left-join-like, tools/sjoin.py docstring), ties all returned.

    ``how='right'`` (tools/sjoin.py:365: keys + geometry from right_df,
    nearest computed per RIGHT row) is the same physical plan with the
    sides and suffixes swapped — right must be a Dataset there (it becomes
    the streamed side). The partner column is ``index_left`` carrying LEFT
    ids (``left_index`` column values if given, else broadcast-table
    positional); ``right_index`` names a RIGHT column and has no meaning
    on that path."""
    if how == "right":
        if not isinstance(right, ray.data.Dataset):
            raise TypeError("how='right' needs the right side as a Dataset (it streams)")
        if right_index is not None:
            raise ValueError(
                "how='right' emits index_left (left partner ids); pass left_index "
                "to select the left id column, not right_index"
            )
        swapped = sjoin_nearest(
            right,
            left,
            how="left",
            max_distance=max_distance,
            lsuffix=rsuffix,
            rsuffix=lsuffix,
            distance_col=distance_col,
            exclusive=exclusive,
            geometry=right_geometry or geometry,
            right_geometry=geometry,
            right_index=left_index,
            concurrency=concurrency,
            batch_size=batch_size,
        )
        # reference right-join semantics: the partner column carries LEFT
        # ids and is named index_left (sjoin how='right' parity)
        def _relabel(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                ["index_left" if c == "index_right" else c for c in b.column_names]
            )

        return swapped.map_batches(_relabel, batch_format="pyarrow")
    if how not in ("inner", "left"):
        raise ValueError("sjoin_nearest supports how in {'inner','left','right'}")
    right_geometry = right_geometry or geometry
    rt = _materialize(right)
    lmap, rmap = suffixed_columns(left.schema().names, rt.column_names, lsuffix, rsuffix, geometry)
    right_ref = ray.put(rt)
    return left.map_batches(
        _NearestJoiner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=dict(
            right_ref=right_ref,
            max_distance=max_distance,
            exclusive=exclusive,
            how=how,
            geometry=geometry,
            right_geometry=right_geometry,
            lmap=lmap,
            rmap=rmap,
            right_index=right_index,
            distance_col=distance_col,
        ),
    )


# ---------------------------------------------------------------------------
# shuffle scale path (two large sides)
# ---------------------------------------------------------------------------


def sjoin_nearest_shuffle(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    max_distance: float | None = None,
    res: int = 6,
    domain=None,
    geometry: str = "geometry",
    right_geometry: str | None = None,
    left_id: str = "doc_id",
    right_id: str = "zone_key",
    distance_col: str | None = None,
    floor_res: int = 3,
    group_row_cap: int | None = None,
    left_points: bool | None = None,
    salt: int = 1,
) -> "ray.data.Dataset":
    """Cell-partitioned nearest join for two LARGE sides.

    Bounded plan (``max_distance`` set), point lefts: left rows key to their
    cell at ``res``; right rows replicate to every cell their
    max_distance-dilated bbox covers. One groupby(cell) shuffle; per cell,
    exact nearest among the replicated candidates. A left row's true nearest
    within max_distance is guaranteed to be among its cell's candidates
    because any right geometry within max_distance of the point dilates
    into that cell. Ties all returned (return_all).

    NON-POINT lefts (r3 VERDICT next-round #6, reference tools/sjoin.py:341
    takes any geometry): lefts replicate to every cell of their (undilated)
    bbox, rights dilate by max_distance as above - any right within
    max_distance of the left shares >=1 cell (per-axis gap <= Euclidean
    distance). Each cell emits its per-left min+ties with EXACT
    geometry-to-geometry distances (point rights vectorize through
    points_to_geom_sqdist per left row; mixed rights fall back to the
    per-pair kernel), then one hash-partitioned reduce on the left id keeps
    the global min+ties and dedupes pairs seen from multiple shared cells.

    ``left_points=None`` auto-detects with a slim byte-length scan (a point
    WKB is exactly 21 bytes; no decode) - one extra pass over the left's
    geometry column; pass True/False to skip it.

    Contract: ``right_id`` should identify right ROWS uniquely. Two distinct
    right rows sharing an id that both tie at a left row's min distance
    collapse to one output pair on the shuffle plans (the broadcast
    ``sjoin_nearest`` keeps both rows, like the reference's duplicated
    index). Left ids may repeat freely - each left ROW keeps its own
    nearest set on every plan.

    Unbounded plan (``max_distance=None``, reference sindex.py:220
    default): iterative COARSENING + DILATION expansion. Rounds coarsen the
    grid one level at a time down to ``floor_res``, then stay at floor_res
    doubling the right-side dilation; a left row ACCEPTS its per-cell best
    when best <= the round's dilation (any right absent from the cell is
    provably farther: its dilated bbox missed the whole cell), otherwise it
    carries to the next round. The last round dilates past the domain
    diagonal so every cell holds the full candidate set and every left row
    resolves - but the work stays spread over the floor grid (4^floor_res
    tasks, salted further when a cell is dense) instead of collapsing into
    one res-0 task. Isolated points cost O(log) rounds, each a groupby over
    the (shrinking) unresolved set - never a broadcast of either side.
    ``group_row_cap`` makes any oversized shuffle group raise (scale guard).

    ``salt`` (bounded plans) splits every cell's LEFT rows across ``salt``
    shuffle groups, replicating the cell's right candidates into each -
    exact (nearest per left row is independent), trades right-side
    replication for straggler relief on dense-city cells. The unbounded
    plan sizes its own per-round salt from live-cell counts and ignores
    this knob.
    """
    import numpy as np
    import pyarrow as pa

    from ..grid import DEFAULT_DOMAIN, cell_id, cells_for_bbox

    domain = domain or DEFAULT_DOMAIN
    right_geometry = right_geometry or geometry
    if left_points is None:
        # the detection scan is a SECOND consumer of the (lazy) left plan —
        # materialize first or the chosen join plan re-executes the whole
        # upstream (CLAUDE.md consumer-count rule)
        left = left.materialize()
        left_points = _all_point_wkb(left, geometry)
    if max_distance is None:
        return _nearest_shuffle_unbounded(
            left, right, res=res, domain=domain, geometry=geometry,
            right_geometry=right_geometry, left_id=left_id, right_id=right_id,
            distance_col=distance_col, floor_res=floor_res,
            group_row_cap=group_row_cap, left_points=left_points,
        )
    if not left_points:
        return _nearest_shuffle_bounded_general(
            left, right, d=float(max_distance), res=res, domain=domain,
            geometry=geometry, right_geometry=right_geometry, left_id=left_id,
            right_id=right_id, distance_col=distance_col,
            group_row_cap=group_row_cap, salt=salt,
        )
    d = float(max_distance)
    salt = max(1, int(salt))
    # id columns keep their ORIGINAL arrow types (r1 cast to int64 broke
    # string doc_ids); nulls for the other side use the matching type
    ltype = dict(zip(left.schema().names, left.schema().types))[left_id]
    rtype = dict(zip(right.schema().names, right.schema().types))[right_id]

    def key_left(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        cx = (bb[:, 0] + bb[:, 2]) * 0.5
        cy = (bb[:, 1] + bb[:, 3]) * 0.5
        cells = cell_id(np.nan_to_num(cx), np.nan_to_num(cy), res, domain).astype(np.int64)
        out = pa.table(
            {
                "cell": pa.array(np.where(valid, cells, -1)),
                "__salt2": pa.array((np.arange(len(g), dtype=np.int64) % salt).astype(np.int8)),
                "__side": pa.array(np.zeros(len(g), dtype=np.int8)),
                "__lid": b.column(left_id),
                "__rid": pa.nulls(len(g), rtype),
                "__geom": b.column(geometry),
            }
        )
        return out.filter(pa.array(valid))

    def key_right(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(right_geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        row_idx, cells = cells_for_bbox(
            np.where(valid, bb[:, 0] - d, 0.0),
            np.where(valid, bb[:, 1] - d, 0.0),
            np.where(valid, bb[:, 2] + d, 0.0),
            np.where(valid, bb[:, 3] + d, 0.0),
            res,
            domain,
        )
        keep = valid[row_idx]
        row_idx, cells = row_idx[keep], cells[keep]
        # rights replicate into every left salt bucket of each cell (nearest
        # per left row is independent, so splitting lefts is exact)
        if salt > 1:
            row_idx = np.repeat(row_idx, salt)
            cells = np.repeat(cells, salt)
            salts = np.tile(np.arange(salt, dtype=np.int8), len(row_idx) // salt)
        else:
            salts = np.zeros(len(row_idx), dtype=np.int8)
        taken = b.take(pa.array(row_idx))
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64)),
                "__salt2": pa.array(salts),
                "__side": pa.array(np.ones(len(row_idx), dtype=np.int8)),
                "__lid": pa.nulls(len(row_idx), ltype),
                "__rid": taken.column(right_id),
                "__geom": taken.column(right_geometry),
            }
        )

    lkeyed = left.map_batches(key_left, batch_format="pyarrow")
    rkeyed = right.map_batches(key_right, batch_format="pyarrow")

    def per_cell(b: pa.Table) -> pa.Table:
        if group_row_cap is not None and len(b) > group_row_cap:
            raise RuntimeError(
                f"nearest-shuffle group of {len(b)} rows exceeds "
                f"group_row_cap={group_row_cap}"
            )
        side = np.asarray(b.column("__side"))
        lmask = side == 0
        if not lmask.any() or lmask.all():
            return pa.table(
                {
                    left_id: pa.array([], type=ltype),
                    right_id: pa.array([], type=rtype),
                    "distance": pa.array([], type=pa.float64()),
                }
            )
        lt = b.filter(pa.array(lmask))
        rt = b.filter(pa.array(~lmask))
        lg = from_wkb(lt.column("__geom"))
        rg = from_wkb(rt.column("__geom"))
        ci = lg.ring_offsets[lg.part_offsets[lg.row_offsets[:-1]]]
        px = lg.coords[ci, 0]
        py = lg.coords[ci, 1]
        n_r = len(rt)
        nL = len(px)
        dmax2 = d * d
        # single chunked pass (r3 VERDICT #2 - the old shape recomputed every
        # distance in a second tie-emission pass): chunk lefts so the dense
        # (R x chunk) block stays ~16MB, extract min AND ties from the block
        chunk = max(1, int(_PAIR_BLOCK_ELEMS // max(n_r, 1)))
        best = np.full(nL, np.inf)
        pair_li: list[np.ndarray] = []
        pair_rj: list[np.ndarray] = []
        for s in range(0, nL, chunk):
            e = min(s + chunk, nL)
            cx, cy = px[s:e], py[s:e]
            D = np.empty((n_r, e - s))
            for j in range(n_r):
                D[j] = K.points_to_geom_sqdist(rg, j, cx, cy)
            bc = D.min(axis=0)
            best[s:e] = bc
            within = bc <= dmax2
            if not within.any():
                continue
            for j in range(n_r):
                hit = within & (D[j] == bc)
                if hit.any():
                    idx = np.nonzero(hit)[0]
                    pair_li.append(idx + s)
                    pair_rj.append(np.full(len(idx), j, dtype=np.int64))
        if not pair_li:
            return pa.table(
                {
                    left_id: pa.array([], type=ltype),
                    right_id: pa.array([], type=rtype),
                    "distance": pa.array([], type=pa.float64()),
                }
            )
        li = np.concatenate(pair_li)
        rj = np.concatenate(pair_rj)
        # dedupe ties that share a right ID: sort by (left, right-id) and
        # keep the first occurrence per (left, rid) pair
        rid_col = rt.column("__rid")
        lid_col = lt.column("__lid")
        out = pa.table(
            {
                left_id: lid_col.take(pa.array(li, type=pa.int64())),
                right_id: rid_col.take(pa.array(rj, type=pa.int64())),
                "distance": pa.array(np.sqrt(best[li])),
            }
        )
        # drop duplicate (left, right) pairs (a right id replicated into the
        # cell multiple times can't happen - one row per cell per right row -
        # but ties with identical ids from dirty input dedupe here)
        import pyarrow.compute as pc

        keys = pc.binary_join_element_wise(
            pc.cast(out.column(left_id), pa.string()),
            pc.cast(out.column(right_id), pa.string()),
            "\x1f",
        )
        first = np.unique(np.asarray(keys, dtype=object), return_index=True)[1]
        return out.take(pa.array(np.sort(first), type=pa.int64()))

    from ..util import default_shuffle_partitions

    out = (
        lkeyed.union(rkeyed)
        .repartition(default_shuffle_partitions())
        .groupby(["cell", "__salt2"])
        .map_groups(per_cell, batch_format="pyarrow")
    )
    if distance_col is None:
        out = out.drop_columns(["distance"]) if hasattr(out, "drop_columns") else out.map_batches(
            lambda t: t.drop_columns(["distance"]), batch_format="pyarrow"
        )
    elif distance_col != "distance":
        out = out.map_batches(
            lambda t: t.rename_columns(
                [distance_col if c == "distance" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return out


# dense d2 block budget for the unbounded per-cell kernel (elements, i.e.
# ~16MB of float64 per task temporary; tests shrink it to force chunking)
_PAIR_BLOCK_ELEMS = 2_000_000

# unresolved-row ceiling under which the unbounded round loop pulls exact
# per-cell counts to the driver (live-cell pruning + exact salt sizing)
_LIVE_CELL_PULL_CAP = 2_000_000

# target unresolved-left rows per shuffle group; cells above it are salted
_SALT_TARGET_ROWS = 200_000


def _all_point_wkb(ds: "ray.data.Dataset", geometry: str) -> bool:
    """True iff every geometry is a single 2-D Point. Slim detection scan:
    the engine's canonical point WKB is exactly 21 bytes (header + x + y)
    and no other geometry fits in 21, so byte LENGTHS decide - no decode.
    False positives are impossible; a false negative (e.g. a 29-byte XYZ
    point from external data) just routes to the general path, which is
    correct for points too."""
    import pyarrow.compute as pc

    from ..util import pull_table

    def f(b: pa.Table) -> pa.Table:
        ln = pc.binary_length(b.column(geometry))
        ok = pc.all(pc.equal(ln, 21)).as_py()
        return pa.table({"ok": pa.array([ok is not False])})

    t = pull_table(
        ds.select_columns([geometry]).map_batches(f, batch_format="pyarrow"),
        columns=["ok"],
    )
    if not t.num_columns or not len(t):
        return True
    return bool(np.all(np.asarray(t.column("ok"))))


def _general_min_ties(lg, rg, thr2: np.ndarray):
    """Exact per-left-row min squared distance to the right rows + tie
    pairs for rows whose best clears the per-row threshold.

    Point rights (the common table shape) vectorize: one
    points_to_geom_sqdist call per LEFT row over all right points (C-level
    over rights). Mixed rights fall back to the per-pair exact kernel
    (geom_to_geom_sqdist) - correct for every type family, Python-per-pair,
    sized by the cell's candidate volume."""
    nL, nR = len(lg), len(rg)
    best = np.full(nL, np.inf)
    pair_li: list[np.ndarray] = []
    pair_rj: list[np.ndarray] = []
    if nR == 0:
        return best, pair_li, pair_rj
    rts = np.asarray(rg.row_types)
    point_rights = bool(np.all(rts == 1))
    if point_rights:
        ci = rg.ring_offsets[rg.part_offsets[rg.row_offsets[:-1]]]
        rx = rg.coords[ci, 0]
        ry = rg.coords[ci, 1]
    for i in range(nL):
        if point_rights:
            d2 = K.points_to_geom_sqdist(lg, i, rx, ry)
        else:
            d2 = np.array([K.geom_to_geom_sqdist(lg, i, rg, j) for j in range(nR)])
        b = float(np.min(d2))
        best[i] = b
        if b <= thr2[i]:
            ties = np.nonzero(d2 == b)[0].astype(np.int64)
            pair_li.append(np.full(len(ties), i, dtype=np.int64))
            pair_rj.append(ties)
    return best, pair_li, pair_rj


def _nearest_shuffle_bounded_general(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    d: float,
    res: int,
    domain,
    geometry: str,
    right_geometry: str,
    left_id: str,
    right_id: str,
    distance_col: str | None,
    group_row_cap: int | None = None,
    salt: int = 1,
) -> "ray.data.Dataset":
    """Bounded nearest for NON-POINT lefts (see sjoin_nearest_shuffle
    docstring): lefts replicate to their bbox's cells, rights to their
    d-dilated bbox's cells, each cell emits its per-left exact min+ties,
    and a hash-partitioned reduce on the left id keeps the global min+ties
    (deduping pairs emitted by multiple shared cells). Two exchanges total;
    the reduce is one vectorized pandas pass per partition, never
    per-distinct-key (CLAUDE.md)."""
    import pandas as pd

    from ..grid import cells_for_bbox
    from ..util import default_shuffle_partitions

    ltype = dict(zip(left.schema().names, left.schema().types))[left_id]
    rtype = dict(zip(right.schema().names, right.schema().types))[right_id]
    nparts = default_shuffle_partitions()
    dmax2 = d * d
    salt = max(1, int(salt))

    def key_left(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        row_idx, cells = cells_for_bbox(
            np.where(valid, bb[:, 0], 0.0),
            np.where(valid, bb[:, 1], 0.0),
            np.where(valid, bb[:, 2], 0.0),
            np.where(valid, bb[:, 3], 0.0),
            res,
            domain,
        )
        keep = valid[row_idx]
        row_idx, cells = row_idx[keep], cells[keep]
        taken = b.take(pa.array(row_idx))
        n = len(row_idx)
        # per-ROW identity for the global reduce: left ids may repeat (two
        # distinct rows sharing an id each keep their own nearest set, like
        # a duplicated pandas index in the reference join). 64-bit random
        # batch salt + row index is unique across the run; replicas of the
        # same row (this take) share it, so the reduce still dedupes pairs
        # seen from multiple shared cells.
        import uuid

        bsalt = uuid.uuid4().hex[:16]
        uid = pa.array(np.char.add(bsalt + ":", np.arange(len(b)).astype("U12")))
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64)),
                "__salt2": pa.array((np.arange(n, dtype=np.int64) % salt).astype(np.int8)),
                "__side": pa.array(np.zeros(n, dtype=np.int8)),
                "__lid": taken.column(left_id),
                "__uid": uid.take(pa.array(row_idx)),
                "__rid": pa.nulls(n, rtype),
                "__geom": taken.column(geometry).cast(pa.large_binary()),
            }
        )

    def key_right(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(right_geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        row_idx, cells = cells_for_bbox(
            np.where(valid, bb[:, 0] - d, 0.0),
            np.where(valid, bb[:, 1] - d, 0.0),
            np.where(valid, bb[:, 2] + d, 0.0),
            np.where(valid, bb[:, 3] + d, 0.0),
            res,
            domain,
        )
        keep = valid[row_idx]
        row_idx, cells = row_idx[keep], cells[keep]
        # rights replicate into every left salt bucket (exact: nearest per
        # left row is independent)
        if salt > 1:
            row_idx = np.repeat(row_idx, salt)
            cells = np.repeat(cells, salt)
            salts = np.tile(np.arange(salt, dtype=np.int8), len(row_idx) // salt)
        else:
            salts = np.zeros(len(row_idx), dtype=np.int8)
        taken = b.take(pa.array(row_idx))
        n = len(row_idx)
        return pa.table(
            {
                "cell": pa.array(cells.astype(np.int64)),
                "__salt2": pa.array(salts),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__lid": pa.nulls(n, ltype),
                "__uid": pa.nulls(n, pa.string()),
                "__rid": taken.column(right_id),
                "__geom": taken.column(right_geometry).cast(pa.large_binary()),
            }
        )

    def empty_pairs() -> pa.Table:
        return pa.table(
            {
                left_id: pa.nulls(0, ltype),
                "__uid": pa.nulls(0, pa.string()),
                right_id: pa.nulls(0, rtype),
                "distance": pa.nulls(0, pa.float64()),
            }
        )

    def per_cell(b: pa.Table) -> pa.Table:
        if group_row_cap is not None and len(b) > group_row_cap:
            raise RuntimeError(
                f"nearest-shuffle group of {len(b)} rows exceeds "
                f"group_row_cap={group_row_cap}"
            )
        side = np.asarray(b.column("__side"))
        lmask = side == 0
        if not lmask.any() or lmask.all():
            return empty_pairs()
        lt = b.filter(pa.array(lmask))
        rt = b.filter(pa.array(~lmask))
        lg = from_wkb(lt.column("__geom"))
        rg = from_wkb(rt.column("__geom"))
        thr2 = np.full(len(lg), dmax2)
        best, pair_li, pair_rj = _general_min_ties(lg, rg, thr2)
        if not pair_li:
            return empty_pairs()
        li = np.concatenate(pair_li)
        rj = np.concatenate(pair_rj)
        return pa.table(
            {
                left_id: lt.column("__lid").take(pa.array(li, type=pa.int64())),
                "__uid": lt.column("__uid").take(pa.array(li, type=pa.int64())),
                right_id: rt.column("__rid").take(pa.array(rj, type=pa.int64())),
                "distance": pa.array(np.sqrt(best[li])),
            }
        )

    lkeyed = left.map_batches(key_left, batch_format="pyarrow")
    rkeyed = right.map_batches(key_right, batch_format="pyarrow")
    pairs = (
        lkeyed.union(rkeyed)
        .repartition(nparts)
        .groupby(["cell", "__salt2"])
        .map_groups(per_cell, batch_format="pyarrow")
    )

    # global reduce: a pair can be emitted by every cell the two bboxes
    # share, always with the SAME exact distance - keep the per-ROW min
    # (+ties) and dedupe (row, rid). Keyed on __uid, not the left id: ids
    # may repeat across distinct rows and each row keeps its own nearest
    # set. Hash-partitioned, one vectorized pandas pass per partition.
    def part_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df["__uid"].to_numpy()) % nparts
        return df

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.drop(columns=["__part", "__uid"])
        m = df.groupby("__uid")["distance"].transform("min")
        out = df[df["distance"] == m].drop_duplicates(["__uid", right_id])
        return out.drop(columns=["__part", "__uid"])

    out = (
        pairs.map_batches(part_key, batch_format="pandas")
        .repartition(nparts)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pandas")
    )
    if distance_col is None:
        out = out.map_batches(
            lambda t: t.drop_columns(["distance"]), batch_format="pyarrow"
        )
    elif distance_col != "distance":
        out = out.map_batches(
            lambda t: t.rename_columns(
                [distance_col if c == "distance" else c for c in t.column_names]
            ),
            batch_format="pyarrow",
        )
    return out


def _nearest_shuffle_unbounded(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    res: int,
    domain,
    geometry: str,
    right_geometry: str,
    left_id: str,
    right_id: str,
    distance_col: str | None,
    floor_res: int = 3,
    group_row_cap: int | None = None,
    left_points: bool = True,
) -> "ray.data.Dataset":
    """Unbounded two-large-sides nearest: coarsening + dilation expansion
    (see sjoin_nearest_shuffle docstring). Rights are arbitrary geometries;
    ``left_points=False`` lifts the points-only left contract (r3 VERDICT
    next-round #6): each left keys by its bbox CENTER and carries its WKB
    plus extent bound r = half the bbox diagonal; the round acceptance
    tightens to ``best <= t - r`` (a right absent from the cell is farther
    than t from the center, hence farther than t - r from any point of the
    left geometry), and per-cell distances are exact geometry-to-geometry.

    Round schedule (r3 VERDICT #3 - the old final round coarsened to res 0,
    concentrating ALL unresolved lefts x ALL rights into ONE task):

    - phase 1 COARSENS: (rr=res, m=1), (res-1, 1), ... down to (floor_res, 1);
    - phase 2 stays at ``floor_res`` and DOUBLES the dilation multiplier m
      (2, 4, ...) until m x cell-extent covers the domain diagonal - that
      last round has the complete candidate set per cell, so every left
      resolves, but the work stays spread over the floor grid's cells
      (4^floor_res tasks) instead of one.

    Acceptance invariant per round (dilation t = m x cell extent): a right
    absent from a cell has bbox farther than t from every point of the cell,
    so a per-cell best <= t is the global best. Rights replicate only into
    cells that still HOLD unresolved lefts (the live-cell set is pulled each
    round - bounded by 4^rr ids); when many lefts share a floor cell the
    left side is salted so no group exceeds ~the salt target (rights
    replicate per salt - nearest per left is independent so the split is
    exact). ``group_row_cap`` is a scale guard: any shuffle group larger
    than it raises instead of silently serializing."""
    from ..grid import cell_id, cells_for_bbox
    from ..util import default_shuffle_partitions, pull_table

    ltype = dict(zip(left.schema().names, left.schema().types))[left_id]
    rtype = dict(zip(right.schema().names, right.schema().types))[right_id]
    x0, y0, x1, y1 = domain
    nparts = default_shuffle_partitions()
    floor_res = max(0, min(floor_res, res))

    gen = not left_points

    def slim_left(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        cols = {
            "__lid": b.column(left_id),
            "__lx": pa.array(np.where(valid, (bb[:, 0] + bb[:, 2]) * 0.5, np.nan)),
            "__ly": pa.array(np.where(valid, (bb[:, 1] + bb[:, 3]) * 0.5, np.nan)),
        }
        if gen:
            # extent bound: max distance from the bbox center to the
            # geometry <= half the bbox diagonal
            cols["__lr"] = pa.array(
                0.5 * np.hypot(bb[:, 2] - bb[:, 0], bb[:, 3] - bb[:, 1])
            )
            cols["__lgeom"] = b.column(geometry).cast(pa.large_binary())
        return pa.table(cols).filter(pa.array(valid))

    unresolved = left.map_batches(slim_left, batch_format="pyarrow").materialize()

    def slim_right(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(right_geometry))
        bb = K.bounds(g)
        valid = ~np.isnan(bb).any(axis=1)
        return pa.table(
            {
                "__srid": b.column(right_id),
                "__sgeom": b.column(right_geometry).cast(pa.large_binary()),
                "__minx": pa.array(bb[:, 0]),
                "__miny": pa.array(bb[:, 1]),
                "__maxx": pa.array(bb[:, 2]),
                "__maxy": pa.array(bb[:, 3]),
            }
        ).filter(pa.array(valid))

    # slim + materialize ONCE: the round loop consumes the right side up to
    # res+1 times — a lazy right would re-execute its whole upstream plan
    # (and re-decode every WKB) per round
    rslim = right.map_batches(slim_right, batch_format="pyarrow").materialize()

    # round schedule: coarsen res -> floor_res at dilation m=1, then stay at
    # floor_res doubling m until m x cell-extent covers the domain diagonal
    # (that round sees the full candidate set per cell -> everything resolves)
    diag = float(np.hypot(x1 - x0, y1 - y0))
    schedule: list[tuple[int, int]] = [(rr, 1) for rr in range(res, floor_res - 1, -1)]
    m = 2
    while True:
        schedule.append((floor_res, m))
        csize_f = min((x1 - x0), (y1 - y0)) / float(1 << floor_res)
        if m * csize_f >= diag:
            break
        m *= 2

    rounds: list[ray.data.Dataset] = []
    n_unres = unresolved.count()
    for rr, mult in schedule:
        n_cells = 1 << rr
        csize = min((x1 - x0) / n_cells, (y1 - y0) / n_cells)
        t_accept = mult * csize
        final_round = t_accept >= diag

        # live-cell pull: rights only replicate into cells that still hold
        # unresolved lefts; per-cell counts also size the left salt so no
        # group serializes a dense city cell (r3 VERDICT #3)
        salt = 1
        live_sorted = None
        if n_unres <= _LIVE_CELL_PULL_CAP:

            def cell_counts(b: pa.Table, _rr=rr) -> pa.Table:
                lx = np.asarray(b.column("__lx"), dtype=np.float64)
                ly = np.asarray(b.column("__ly"), dtype=np.float64)
                cells = cell_id(lx, ly, _rr, domain).astype(np.int64)
                uniq, cnt = np.unique(cells, return_counts=True)
                return pa.table({"cell": pa.array(uniq), "n": pa.array(cnt)})

            cc = pull_table(unresolved.map_batches(cell_counts, batch_format="pyarrow"))
            if cc.num_columns and len(cc):
                cells_all = np.asarray(cc.column("cell"), dtype=np.int64)
                cnts_all = np.asarray(cc.column("n"), dtype=np.int64)
                live_sorted, inv = np.unique(cells_all, return_inverse=True)
                per_cell_n = np.zeros(len(live_sorted), dtype=np.int64)
                np.add.at(per_cell_n, inv, cnts_all)
                salt = int(min(32, max(1, int(np.ceil(per_cell_n.max() / _SALT_TARGET_ROWS)))))
            else:
                live_sorted = np.empty(0, dtype=np.int64)
        else:
            # too many unresolved rows to pull exact counts: assume the worst
            # plausible concentration and salt proportionally
            salt = int(min(32, 1 + n_unres // (4 * _SALT_TARGET_ROWS)))
        live_ref = ray.put(live_sorted)

        def key_left(b: pa.Table, _rr=rr, _salt=salt) -> pa.Table:
            lx = np.asarray(b.column("__lx"), dtype=np.float64)
            ly = np.asarray(b.column("__ly"), dtype=np.float64)
            cells = cell_id(lx, ly, _rr, domain).astype(np.int64)
            cols = {
                "cell": pa.array(cells),
                "__salt2": pa.array(
                    (np.arange(len(b), dtype=np.int64) % _salt).astype(np.int8)
                ),
                "__side": pa.array(np.zeros(len(b), dtype=np.int8)),
                "__lid": b.column("__lid"),
                "__lx": b.column("__lx"),
                "__ly": b.column("__ly"),
                "__rid": pa.nulls(len(b), rtype),
                "__geom": pa.nulls(len(b), pa.large_binary()),
            }
            if gen:
                cols["__lr"] = b.column("__lr")
                cols["__lgeom"] = b.column("__lgeom")
            return pa.table(cols)

        def key_right(b: pa.Table, _rr=rr, _d=t_accept, _salt=salt, _live=live_ref) -> pa.Table:
            row_idx, cells = cells_for_bbox(
                np.asarray(b.column("__minx"), dtype=np.float64) - _d,
                np.asarray(b.column("__miny"), dtype=np.float64) - _d,
                np.asarray(b.column("__maxx"), dtype=np.float64) + _d,
                np.asarray(b.column("__maxy"), dtype=np.float64) + _d,
                _rr,
                domain,
            )
            cells = cells.astype(np.int64)
            live = ray.get(_live)
            if live is not None:
                keep = np.isin(cells, live)
                row_idx, cells = row_idx[keep], cells[keep]
            # replicate each right row into every left salt bucket (nearest
            # per left is independent, so splitting lefts is exact)
            if _salt > 1:
                row_idx = np.repeat(row_idx, _salt)
                cells = np.repeat(cells, _salt)
                salts = np.tile(np.arange(_salt, dtype=np.int8), len(row_idx) // _salt)
            else:
                salts = np.zeros(len(row_idx), dtype=np.int8)
            taken = b.take(pa.array(row_idx))
            n = len(row_idx)
            cols = {
                "cell": pa.array(cells),
                "__salt2": pa.array(salts),
                "__side": pa.array(np.ones(n, dtype=np.int8)),
                "__lid": pa.nulls(n, ltype),
                "__lx": pa.nulls(n, pa.float64()),
                "__ly": pa.nulls(n, pa.float64()),
                "__rid": taken.column("__srid"),
                "__geom": taken.column("__sgeom"),
            }
            if gen:
                cols["__lr"] = pa.nulls(n, pa.float64())
                cols["__lgeom"] = pa.nulls(n, pa.large_binary())
            return pa.table(cols)

        def per_cell(b: pa.Table, _t=t_accept, _final=final_round) -> pa.Table:
            """Emit accepted pairs (rid set) and carried lefts (rid null)."""
            if group_row_cap is not None and len(b) > group_row_cap:
                raise RuntimeError(
                    f"nearest-shuffle group of {len(b)} rows exceeds "
                    f"group_row_cap={group_row_cap}"
                )
            side = np.asarray(b.column("__side"))
            lmask = side == 0
            lt = b.filter(pa.array(lmask))
            if len(lt) == 0:
                return _empty_round(ltype, rtype, gen)
            rt = b.filter(pa.array(~lmask))
            px = np.asarray(lt.column("__lx"), dtype=np.float64)
            py = np.asarray(lt.column("__ly"), dtype=np.float64)
            if len(rt) == 0:
                if _final:
                    return _empty_round(ltype, rtype, gen)  # no rights at all
                cols = {
                    "__lid": lt.column("__lid"),
                    "__lx": lt.column("__lx"),
                    "__ly": lt.column("__ly"),
                    "__rid": pa.nulls(len(lt), rtype),
                    "__dist": pa.nulls(len(lt), pa.float64()),
                }
                if gen:
                    cols["__lr"] = lt.column("__lr")
                    cols["__lgeom"] = lt.column("__lgeom")
                return pa.table(cols)
            rg = from_wkb(rt.column("__geom"))
            nL, nR = len(px), len(rt)
            if gen:
                # exact geometry-to-geometry distances; per-row acceptance
                # threshold t - r_i (see docstring invariant)
                lg = from_wkb(lt.column("__lgeom"))
                lr = np.asarray(lt.column("__lr"), dtype=np.float64)
                if _final:
                    thr2 = np.full(nL, np.inf)
                else:
                    # rows whose extent exceeds t can NEVER accept this
                    # round (the invariant only bounds absent rights below
                    # by t - r, which is negative): thr2=-1 rejects even
                    # best=0, where a zero-clamp would wrongly accept while
                    # distance-0 ties are still outside the cell
                    thr = _t - lr
                    thr2 = np.where(thr >= 0.0, thr * thr, -1.0)
                best, pair_li, pair_rj = _general_min_ties(lg, rg, thr2)
                accept = np.isfinite(best) if _final else best <= thr2
            else:
                # single kernel pass: chunk lefts so the dense d2 block stays
                # ~16MB, take min + tie hits from the same block instead of
                # recomputing every distance for the pair-emission loop
                chunk = max(1, int(_PAIR_BLOCK_ELEMS // max(nR, 1)))
                best = np.full(nL, np.inf)
                pair_li, pair_rj = [], []
                for s in range(0, nL, chunk):
                    e = min(s + chunk, nL)
                    cx, cy = px[s:e], py[s:e]
                    D = np.empty((nR, e - s))
                    for j in range(nR):
                        D[j] = K.points_to_geom_sqdist(rg, j, cx, cy)
                    bc = D.min(axis=0)
                    best[s:e] = bc
                    acc = np.isfinite(bc) if _final else bc <= _t * _t
                    for j in range(nR):
                        hit = acc & (D[j] == bc)
                        if hit.any():
                            idx = np.nonzero(hit)[0]
                            pair_li.append(idx + s)
                            pair_rj.append(np.full(len(idx), j, dtype=np.int64))
                accept = np.isfinite(best) if _final else best <= _t * _t
            parts = []
            if pair_li:
                li = np.concatenate(pair_li)
                rj = np.concatenate(pair_rj)
                pcols = {
                    "__lid": lt.column("__lid").take(pa.array(li, type=pa.int64())),
                    "__lx": pa.nulls(len(li), pa.float64()),
                    "__ly": pa.nulls(len(li), pa.float64()),
                    "__rid": rt.column("__rid").take(pa.array(rj, type=pa.int64())),
                    "__dist": pa.array(np.sqrt(best[li])),
                }
                if gen:
                    pcols["__lr"] = pa.nulls(len(li), pa.float64())
                    pcols["__lgeom"] = pa.nulls(len(li), pa.large_binary())
                parts.append(pa.table(pcols))
            carry = ~accept
            if carry.any():
                ct = lt.filter(pa.array(carry))
                ccols = {
                    "__lid": ct.column("__lid"),
                    "__lx": ct.column("__lx"),
                    "__ly": ct.column("__ly"),
                    "__rid": pa.nulls(len(ct), rtype),
                    "__dist": pa.nulls(len(ct), pa.float64()),
                }
                if gen:
                    ccols["__lr"] = ct.column("__lr")
                    ccols["__lgeom"] = ct.column("__lgeom")
                parts.append(pa.table(ccols))
            if not parts:
                return _empty_round(ltype, rtype, gen)
            return pa.concat_tables(parts)

        lkeyed = unresolved.map_batches(key_left, batch_format="pyarrow")
        rkeyed = rslim.map_batches(key_right, batch_format="pyarrow")
        round_out = (
            lkeyed.union(rkeyed)
            .repartition(nparts)
            .groupby(["cell", "__salt2"])
            .map_groups(per_cell, batch_format="pyarrow")
            .materialize()
        )
        import pyarrow.compute as pc

        pairs = round_out.map_batches(
            lambda t: t.filter(pc.is_valid(t.column("__rid"))), batch_format="pyarrow"
        )
        rounds.append(pairs)
        unresolved = (
            round_out.map_batches(
                lambda t: t.filter(pc.is_null(t.column("__rid"))).drop_columns(
                    ["__rid", "__dist"]
                ),
                batch_format="pyarrow",
            )
        ).materialize()
        n_unres = unresolved.count()
        if n_unres == 0:
            break

    out = rounds[0]
    for r in rounds[1:]:
        out = out.union(r)

    def finish(b: pa.Table) -> pa.Table:
        cols = {left_id: b.column("__lid"), right_id: b.column("__rid")}
        if distance_col is not None:
            cols[distance_col] = b.column("__dist")
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def _empty_round(ltype, rtype, gen: bool = False) -> pa.Table:
    cols = {
        "__lid": pa.nulls(0, ltype),
        "__lx": pa.nulls(0, pa.float64()),
        "__ly": pa.nulls(0, pa.float64()),
        "__rid": pa.nulls(0, rtype),
        "__dist": pa.nulls(0, pa.float64()),
    }
    if gen:
        cols["__lr"] = pa.nulls(0, pa.float64())
        cols["__lgeom"] = pa.nulls(0, pa.large_binary())
    return pa.table(cols)
