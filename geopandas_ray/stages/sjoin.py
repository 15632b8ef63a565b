"""Spatial predicate join - the heart of the engine (SURVEY.md §2.4).

Semantics follow the reference's sjoin (geopandas/tools/sjoin.py:11,
docstrings + tools/tests/test_sjoin.py row sets):

- ``how`` in {inner, left, right}; inner/left keep LEFT geometry, right
  keeps RIGHT geometry (tools/sjoin.py:265-329 _frame_join).
- partner index emitted as column ``index_right`` (``index_left`` for
  how='right'), values taken from the chosen index column of the other side
  (tools/sjoin.py:174-190 _reset_index_with_suffix).
- overlapping non-geometry column names get ``_{lsuffix}``/``_{rsuffix}``
  (tools/sjoin.py:193-224).
- ``on_attribute`` restricts pairs to equal attribute values
  (tools/sjoin.py:168-171).
- output order is left-row-major, right index ascending within each left row
  (tests/test_sjoin.py:32-38).

Two physical plans:

**broadcast** (small right side - zone/tile catalogs): the right table is
``ray.put`` once; an actor pool (`map_batches(Cls, concurrency=N)`) builds a
NumPy STR tree per actor in ``__init__`` and streams left batches through
it. No shuffle at all.

**shuffle** (both sides large): both sides flat-map to covering cell keys at
resolution ``res`` (grid.py), union, one ``groupby(cell)`` exchange,
per-cell join tasks build the tree on the smaller side; duplicate pairs from
multi-cell geometries are suppressed with the reference-point rule (a pair
is emitted only by the cell containing the [max(minx), max(miny)] corner of
the bbox intersection) so no second shuffle is needed. Hot cells can be
salted: the point side hashes into ``salt`` sub-keys and the polygon side is
replicated across them, then results merge trivially (no re-aggregation
needed for a join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import default_pool
import ray.data

from ..geom import kernels as K
from ..geom.index import BBoxTree
from ..geom.wkb import from_wkb
from ..grid import DEFAULT_DOMAIN, cell_bounds, cell_id, cells_for_bbox
from .core import JOIN_PREDICATES, eval_pairs, suffixed_columns

# test-only execution probe: when set to a counter actor handle, the
# how='left' anti-join tag stage reports every batch's row count through it,
# letting tests assert the flags plan executed exactly once (total == n_left)
_ANTI_JOIN_PROBE = None


def _materialize(right) -> pa.Table:
    """Pull a (small, broadcast-side) dataset to one driver arrow table.

    Routed through util.pull_table so PANDAS blocks (from filter(expr=) or
    pandas map_batches upstreams) convert instead of raising - the
    to_arrow_refs()-on-filtered pitfall in CLAUDE.md."""
    if isinstance(right, pa.Table):
        return right
    if isinstance(right, ray.data.Dataset):
        from ..util import pull_table

        return pull_table(right)
    raise TypeError(type(right))


def _basic_checks(how, predicate, left_cols, right_cols, on_attribute, lsuffix, rsuffix):
    if how not in ("inner", "left", "right"):
        raise ValueError(f"`how` was `{how}` but is expected to be in {('left', 'right', 'inner')}")
    if predicate not in JOIN_PREDICATES:
        raise ValueError(f"`predicate` = `{predicate}` not supported")
    for frame_cols in (left_cols, right_cols):
        for idx_col in (f"index_{lsuffix}", f"index_{rsuffix}"):
            if idx_col in frame_cols:
                raise ValueError(f"'{idx_col}' cannot be a column name in the frames being joined")
    if on_attribute:
        for col in on_attribute:
            if col not in left_cols or col not in right_cols:
                raise ValueError(f"Expected column {col} is missing from a frame being joined")


class _BroadcastJoiner:
    """Actor-pool stage: STR tree over the broadcast right side, streamed
    left batches. Setup once per actor in __init__ (never per batch)."""

    def __init__(
        self,
        right_ref,
        predicate,
        distance,
        how,
        geometry,
        right_geometry,
        lmap,
        rmap,
        right_index,
        partner_col,
        on_attribute,
        keep_geom: str = "left",
        left_index: str | None = None,
    ):
        from .core import bbox_equiv_mask

        right = ray.get(right_ref) if not isinstance(right_ref, pa.Table) else right_ref
        self.rg = from_wkb(right.column(right_geometry))
        self.rbounds = K.bounds(self.rg)
        self.r_bbeq = bbox_equiv_mask(self.rg)  # once per actor, not per batch
        self.tree = BBoxTree(self.rbounds)
        self.predicate = predicate
        self.distance = distance
        self.how = how
        self.geometry = geometry
        self.keep_geom = keep_geom
        self.lmap = lmap
        self.rmap = rmap
        self.left_index = left_index
        self.on_attribute = on_attribute or []
        # right payload: renamed attrs + partner index col; right geometry
        # included (as "geometry") only when the result keeps the right side
        if right_index is not None:
            idx_vals = right.column(right_index)
        else:
            idx_vals = pa.array(np.arange(len(right), dtype=np.int64))
        cols = {}
        for name in right.column_names:
            if name == right_geometry:
                if keep_geom == "right":
                    cols["geometry"] = right.column(name)
                continue
            if name in self.on_attribute:
                # compared then emitted ONCE from the LEFT side — including
                # the right copy under the unsuffixed name overwrote the
                # left value with NULL on unmatched left-join rows (r4 fix)
                continue
            cols[rmap.get(name, name)] = right.column(name)
        if keep_geom == "right":
            # how='right': the partner column is index_LEFT (tools/sjoin.py:
            # 174-190 - a right join carries the left frame's index); the
            # right positional id rides along for the distributed pad step.
            cols["__rpos"] = pa.array(np.arange(len(right), dtype=np.int64))
        else:
            cols[partner_col] = idx_vals
        self.right_attrs = pa.table(cols)
        self.partner_col = partner_col
        self._right_on = {
            c: np.asarray(right.column(c)) for c in self.on_attribute
        }
        self._right_on_valid = {
            c: pc.is_valid(right.column(c)).to_numpy(zero_copy_only=False)
            for c in self.on_attribute
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        lg = from_wkb(batch.column(self.geometry))
        lb = K.bounds(lg)
        qb = lb
        dist = self.distance
        if self.predicate == "dwithin":
            if isinstance(dist, str):
                # per-LEFT-row radii ride the batch as a column
                # (tools/sjoin.py:38 "number or array_like"): each row's
                # query window dilates by its OWN radius; null radii become
                # NaN boxes and match nothing
                d = batch.column(dist).to_numpy(zero_copy_only=False).astype(np.float64)
                qb = lb + np.column_stack([-d, -d, d, d])
                dist = d
            else:
                d = float(dist)
                qb = lb + np.array([-d, -d, d, d])
                dist = d
        qi, ti = self.tree.query_boxes(qb)
        if len(qi):
            from .core import bbox_equiv_mask

            l_bbeq = bbox_equiv_mask(lg)
            if self.predicate in (None, "intersects") and l_bbeq.all() and self.r_bbeq.all():
                # the tree's closed-bbox hit test IS `intersects` for
                # bbox-equivalent geometries: no per-pair predicate needed
                li, ri = qi, ti
            else:
                mask = eval_pairs(
                    self.predicate, lg, qi, self.rg, ti,
                    dist[qi] if isinstance(dist, np.ndarray) else dist,
                    l_bounds=lb, r_bounds=self.rbounds,
                    l_bbox_equiv=l_bbeq, r_bbox_equiv=self.r_bbeq,
                )
                li, ri = qi[mask], ti[mask]
        else:
            li = ri = np.empty(0, dtype=np.int64)
        if self.on_attribute and len(li):
            keep = np.ones(len(li), dtype=bool)
            for c in self.on_attribute:
                lv = np.asarray(batch.column(c))[li]
                keep &= lv == self._right_on[c][ri]
                # merge semantics: null keys never match (object-column nulls
                # surface as None and None == None is True)
                lvalid = pc.is_valid(batch.column(c)).to_numpy(zero_copy_only=False)
                keep &= lvalid[li] & self._right_on_valid[c][ri]
            li, ri = li[keep], ri[keep]
        # left-row-major, right ascending (reference tree-query order)
        order = np.lexsort((ri, li))
        li, ri = li[order], ri[order]
        if self.how == "left":
            matched = np.zeros(len(batch), dtype=bool)
            matched[li] = True
            miss = np.nonzero(~matched)[0]
            if len(miss):
                li = np.concatenate([li, miss])
                ri = np.concatenate([ri, np.full(len(miss), -1, dtype=np.int64)])
                order = np.lexsort((ri, li))
                li, ri = li[order], ri[order]
        # chunked output assembly (large single allocations collapse this
        # host's memory throughput under high concurrency)
        renamed = _rename(batch, self.lmap)
        if self.keep_geom == "right":
            renamed = renamed.drop_columns([self.lmap.get(self.geometry, self.geometry)])
        pieces = []
        CH = 400_000
        for s in range(0, max(len(li), 1), CH):
            li_c = pa.array(li[s : s + CH])
            ri_c = pa.array(ri[s : s + CH])
            left_part = renamed.take(li_c)
            null_mask = pc.equal(ri_c, -1)
            right_part = self.right_attrs.take(
                pc.if_else(null_mask, pa.nulls(len(ri_c), pa.int64()), ri_c)
            )
            cols = {name: left_part.column(name) for name in left_part.column_names}
            for name in right_part.column_names:
                cols[name] = right_part.column(name)
            if self.keep_geom == "right":
                # partner column = the LEFT index per reference right-join
                # semantics; per-batch positional when no left_index column
                # is designated (document: pass left_index for a global id)
                if self.left_index is not None:
                    lidx = np.asarray(batch.column(self.left_index))
                else:
                    lidx = np.arange(len(batch), dtype=np.int64)
                cols[self.partner_col] = pa.array(lidx[li[s : s + CH]])
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]


def _rename(t: pa.Table, m: dict) -> pa.Table:
    return t.rename_columns([m.get(c, c) for c in t.column_names])


def sjoin(
    left: ray.data.Dataset,
    right,
    how: str = "inner",
    predicate: str = "intersects",
    lsuffix: str = "left",
    rsuffix: str = "right",
    distance: float | str | None = None,
    on_attribute=None,
    geometry: str = "geometry",
    right_geometry: str | None = None,
    right_index: str | None = None,
    left_index: str | None = None,
    concurrency: int | tuple | None = None,
    batch_size: int = 8192,
) -> ray.data.Dataset:
    """Broadcast-path spatial join (right side must fit in the object store).

    ``distance`` (predicate='dwithin'): a scalar, or a LEFT column name for
    per-row radii (tools/sjoin.py:38 "number or array_like" - the
    distributed analog of an array aligned to the left rows).

    For how='right' the result keeps RIGHT geometry and every right row and
    emits ``index_left`` (the left partner's index - ``left_index`` column
    values if given, else per-batch positional); unmatched-right padding is
    bounded by the broadcast table (matched ids aggregated in-cluster).
    """
    if isinstance(on_attribute, str):
        on_attribute = [on_attribute]
    right_geometry = right_geometry or geometry
    rt = _materialize(right)
    left_cols = left.schema().names
    _basic_checks(how, predicate, left_cols, rt.column_names, on_attribute, lsuffix, rsuffix)
    lmap, rmap = suffixed_columns(left_cols, rt.column_names, lsuffix, rsuffix, geometry)
    for c in on_attribute or []:
        # equality columns are compared then emitted once, unsuffixed
        lmap[c] = c
        rmap[c] = None
    rmap = {k: v for k, v in rmap.items() if v is not None}
    # inner/left joins carry the right partner index; a right join carries
    # the LEFT partner index (tools/sjoin.py:174-190 _reset_index_with_suffix)
    partner_col = "index_left" if how == "right" else "index_right"
    right_ref = ray.put(rt)
    joined = left.map_batches(
        _BroadcastJoiner,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=default_pool(concurrency),
        fn_constructor_kwargs=dict(
            right_ref=right_ref,
            predicate=predicate,
            distance=distance,
            how="left" if how == "left" else "inner",
            geometry=geometry,
            right_geometry=right_geometry,
            lmap=lmap,
            rmap=rmap,
            right_index=right_index,
            partner_col=partner_col,
            on_attribute=on_attribute,
            keep_geom="right" if how == "right" else "left",
            left_index=left_index,
        ),
    )
    if how != "right":
        return joined
    joined = joined.materialize()  # consumed twice (matched ids + result)
    # how='right': result keeps RIGHT geometry and every right row
    # (tools/sjoin.py:265-329). The matched-id set is aggregated IN THE
    # CLUSTER (distinct right positions <= broadcast-table rows), never the
    # pair stream itself - a high-fanout join must not land on the driver.
    matched_tbl = joined.select_columns(["__rpos"]).groupby("__rpos").count().take_all()
    matched_pos = {int(r["__rpos"]) for r in matched_tbl}
    miss = [i for i in range(rt.num_rows) if i not in matched_pos]

    def _drop_rpos(b: pa.Table) -> pa.Table:
        return b.drop_columns(["__rpos"]) if "__rpos" in b.column_names else b

    if not miss:
        return joined.map_batches(_drop_rpos, batch_format="pyarrow")
    mpart = _rename(rt, {**rmap, right_geometry: "geometry"}).take(pa.array(miss, type=pa.int64()))
    sch = joined.schema()
    types = dict(zip(sch.names, sch.types))
    cols = {}
    for name in sch.names:
        if name == "__rpos":
            cols[name] = pa.array(miss, type=pa.int64())
        elif name in mpart.column_names:
            cols[name] = mpart.column(name)
        else:
            # unmatched right rows: null left attributes + null index_left
            cols[name] = pa.nulls(len(miss), types[name])
    padded = joined.union(ray.data.from_arrow(pa.table(cols).select(sch.names)))
    return padded.map_batches(_drop_rpos, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# shuffle path
# ---------------------------------------------------------------------------

_L = "__sjl_"
_R = "__sjr_"


class _CellIndexer:
    """Actor-pool stage: WKB -> bbox -> covering cell keys (flat-map).

    Stateful so the domain/res tables and any future salt histogram are
    built once per actor (north_star: 'batched stateful actor-pool stage').
    """

    def __init__(
        self, geometry, res, domain, side, salt, prefix, out_schema_names, expand=0.0,
        salt_map=None,
    ):
        self.geometry = geometry
        self.res = res
        self.domain = domain
        self.side = side  # 0 = left (points side salted), 1 = right (replicated)
        self.salt = salt
        self.prefix = prefix
        self.out_names = out_schema_names
        # per-cell salt factors (hot cells only; everything else 1). Sorted
        # key/value arrays -> vectorized searchsorted lookup per batch.
        if salt_map:
            keys = np.array(sorted(salt_map), dtype=np.int64)
            self.salt_keys = keys
            self.salt_vals = np.array([salt_map[k] for k in keys], dtype=np.int64)
        else:
            self.salt_keys = None
            self.salt_vals = None
        # dwithin: the LEFT side's cell covering is computed from the
        # distance-dilated bbox (matching the dilated query box the per-cell
        # join uses), else cross-cell pairs within distance would be dropped.
        # The join recomputes RAW bounds from the WKB it decodes, so the
        # dilation is never applied twice. A str expand names a PER-ROW
        # radius column (post-rename name): each left row replicates only
        # into cells within its OWN radius (tools/sjoin.py:38 array-valued
        # distance).
        self.expand = expand if isinstance(expand, str) else float(expand)

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = from_wkb(batch.column(self.geometry))
        b = K.bounds(g)
        valid = ~np.isnan(b).any(axis=1)
        e = self.expand
        if isinstance(e, str):
            # null radius -> no dilation here, and the pair never matches at
            # eval time (NaN <= d*d is False), mirroring null-key semantics
            e = np.nan_to_num(
                batch.column(e).to_numpy(zero_copy_only=False).astype(np.float64),
                nan=0.0,
            )
        row_idx, cells = cells_for_bbox(
            np.where(valid, b[:, 0] - e, 0.0),
            np.where(valid, b[:, 1] - e, 0.0),
            np.where(valid, b[:, 2] + e, 0.0),
            np.where(valid, b[:, 3] + e, 0.0),
            self.res,
            self.domain,
        )
        keep = valid[row_idx]
        row_idx, cells = row_idx[keep], cells[keep]
        if self.salt_keys is not None:
            # per-cell factors: hot cells fan out, everything else stays 1
            pos = np.searchsorted(self.salt_keys, cells)
            posc = np.clip(pos, 0, len(self.salt_keys) - 1)
            s_c = np.where(self.salt_keys[posc] == cells, self.salt_vals[posc], 1)
            if self.side == 0:
                salt = (cells.astype(np.int64) * 31 + row_idx) % s_c
            else:
                row_idx = np.repeat(row_idx, s_c)
                cells = np.repeat(cells, s_c)
                # per-row 0..s_c-1 ranges without a Python loop
                tot = int(s_c.sum())
                starts = np.cumsum(s_c) - s_c
                salt = np.arange(tot, dtype=np.int64) - np.repeat(starts, s_c)
        elif self.salt > 1:
            if self.side == 0:
                # any deterministic-per-row bucket works for a join: each left
                # row lands in exactly one salt bucket, the right side is
                # replicated across all of them
                salt = (cells.astype(np.int64) * 31 + row_idx) % self.salt
            else:
                row_idx = np.repeat(row_idx, self.salt)
                cells = np.repeat(cells, self.salt)
                salt = np.tile(np.arange(self.salt, dtype=np.int64), len(cells) // self.salt)
        else:
            salt = np.zeros(len(row_idx), dtype=np.int64)
        taken = batch.take(pa.array(row_idx))
        cols = {"cell": pa.array(cells.astype(np.int64))}
        cols["__salt"] = pa.array(salt.astype(np.int8))
        cols["__side"] = pa.array(np.full(len(row_idx), self.side, dtype=np.int8))
        for name in taken.column_names:
            cols[self.prefix + name] = taken.column(name)
        # pad with the other side's columns as nulls for a unionable schema
        out = pa.table(cols)
        for name, typ in self.out_names:
            if name not in out.column_names:
                out = out.append_column(name, pa.nulls(len(out), typ))
        return out.select([n for n, _ in self.out_names])


def _group_join(
    batch: pa.Table,
    predicate,
    distance,
    res,
    domain,
    lgeom_col,
    rgeom_col,
) -> pa.Table:
    side = np.asarray(batch.column("__side"))
    lmask = side == 0
    rmask = ~lmask
    if not lmask.any() or not rmask.any():
        return _take_join_output(batch, batch, lgeom_col, rgeom_col, [], [])
    lt = batch.filter(pa.array(lmask))
    rt = batch.filter(pa.array(rmask))
    lg = from_wkb(lt.column(lgeom_col))
    rg = from_wkb(rt.column(rgeom_col))
    lb = K.bounds(lg)
    rb = K.bounds(rg)
    qb = lb
    if predicate == "dwithin":
        if isinstance(distance, str):
            # per-LEFT-row radii: `distance` arrives as the PREFIXED
            # post-rename column name (set by sjoin_shuffle); null radii
            # surface as NaN and never match (NaN <= d*d is False)
            d = lt.column(distance).to_numpy(zero_copy_only=False).astype(np.float64)
            qb = lb + np.column_stack([-d, -d, d, d])
            distance = d
        else:
            d = float(distance)
            qb = lb + np.array([-d, -d, d, d])
    this_cell = int(batch.column("cell")[0].as_py())
    # tree over the smaller side
    if len(rt) <= len(lt):
        tree = BBoxTree(rb)
        li, ri = tree.query_boxes(qb)
    else:
        tree = BBoxTree(qb)
        ri, li = tree.query_boxes(rb)
    if len(li):
        from .core import bbox_equiv_mask

        l_bbeq = bbox_equiv_mask(lg)
        r_bbeq = bbox_equiv_mask(rg)
        if not (predicate in (None, "intersects") and l_bbeq.all() and r_bbeq.all()):
            # (bbox-equivalent intersects is already decided by the tree query)
            # --- covering fast path (quadtree interior-cell rule) ---------
            # When every LEFT row is a point (degenerate bbox: the point IS
            # in this cell), a RIGHT geometry's relation to this cell's
            # closed rect decides ALL its pairs at once: kind 2 (cell wholly
            # in the geometry's interior) -> True for intersects/within/
            # covered_by, False for touches/contains/covers; kind 0 (the
            # geometry misses the cell, its bbox notwithstanding) -> False
            # for all seven. Only kind 1 (boundary crosses the cell) runs
            # the exact kernel - the S2/H3 covering-join rule. Classifying
            # a right row costs ~3 edge sweeps while an exact pair test
            # costs ~1, so classification is ADAPTIVE: only rights with
            # >= _CELL_CLASSIFY_MIN_PAIRS candidate pairs are classified
            # (per-(row,cell) work must amortize over the pairs it decides;
            # a replica-heavy/point-light cell would otherwise pay more for
            # classification than the exact tests it saves - measured).
            pair_kind = None
            if (
                predicate in _CELL_KIND_PREDICATES
                and (lb[:, 0] == lb[:, 2]).all()
                and (lb[:, 1] == lb[:, 3]).all()
            ):
                counts = np.bincount(ri, minlength=len(rt))
                cand = np.nonzero(counts >= _CELL_CLASSIFY_MIN_PAIRS)[0]
                if len(cand):
                    rect = cell_bounds(np.array([this_cell], dtype=np.uint64), domain)
                    kind = np.ones(len(rt), dtype=np.int8)  # default: exact
                    kind[cand] = K.classify_rect_pairs(
                        rg, cand, np.broadcast_to(rect, (len(cand), 4))
                    )
                    pair_kind = kind[ri]
            dist_pairs = (
                distance[li] if isinstance(distance, np.ndarray) else distance
            )
            if pair_kind is None:
                mask = eval_pairs(
                    predicate, lg, li, rg, ri, dist_pairs,
                    l_bounds=lb, r_bounds=rb, l_bbox_equiv=l_bbeq, r_bbox_equiv=r_bbeq,
                )
            else:
                mask = (
                    (pair_kind == 2)
                    if predicate in _CELL_KIND_TRUE
                    else np.zeros(len(li), dtype=bool)
                )
                sub = np.nonzero(pair_kind == 1)[0]
                if len(sub):
                    m = eval_pairs(
                        predicate, lg, li[sub], rg, ri[sub],
                        dist_pairs[sub] if isinstance(dist_pairs, np.ndarray) else dist_pairs,
                        l_bounds=lb, r_bounds=rb, l_bbox_equiv=l_bbeq, r_bbox_equiv=r_bbeq,
                    )
                    mask[sub[m]] = True
            li, ri = li[mask], ri[mask]
    if len(li):
        # reference-point dedup: only the cell containing the bbox-overlap
        # reference corner emits the pair (no second shuffle needed)
        refx = np.maximum(qb[li, 0], rb[ri, 0])
        refy = np.maximum(qb[li, 1], rb[ri, 1])
        ref_cell = cell_id(refx, refy, res, domain).astype(np.int64)
        keep = ref_cell == this_cell
        li, ri = li[keep], ri[keep]
        order = np.lexsort((ri, li))
        li, ri = li[order], ri[order]
    return _take_join_output(lt, rt, lgeom_col, rgeom_col, li, ri)


def _take_join_output(lt, rt, lgeom_col, rgeom_col, li, ri, chunk: int = 400_000):
    """Assemble stripped-name output rows; right geometry is dropped
    (inner/left sjoin keeps left geometry, tools/sjoin.py:265-329).

    Output is built in ~16MB chunks: one giant take() allocates
    hundreds of MB per task, and concurrent large allocations collapse this
    host's memory throughput (measured 10x); chunked takes land as a
    zero-copy chunked Arrow table."""
    lcols = [c for c in lt.column_names if c.startswith(_L)]
    rcols = [c for c in rt.column_names if c.startswith(_R) and c != rgeom_col]
    lsel = lt.select(lcols)
    rsel = rt.select(rcols)
    pieces = []
    n = len(li)
    for s in range(0, max(n, 1), chunk):
        li_c = pa.array(li[s : s + chunk], type=pa.int64())
        ri_c = pa.array(ri[s : s + chunk], type=pa.int64())
        lpart = lsel.take(li_c)
        rpart = rsel.take(ri_c)
        cols = {c[len(_L) :]: lpart.column(c) for c in lcols}
        for c in rcols:
            cols[c[len(_R) :]] = rpart.column(c)
        pieces.append(pa.table(cols))
    return pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]


# predicates a point-left pair can decide from the cell-vs-right-geometry
# classification alone. Interior cell (kind 2: point in right's interior)
# -> True for the _CELL_KIND_TRUE set, False for the rest (a point cannot
# touch/contain/cover a geometry whose interior surrounds it). Disjoint
# cell (kind 0: point not on right) -> False for all seven. dwithin is
# excluded (dilated queries) and None is excluded (bbox-only matching
# ignores the geometry).
_CELL_KIND_PREDICATES = frozenset(
    {"intersects", "within", "contains", "contains_properly", "covers", "covered_by", "touches"}
)
_CELL_KIND_TRUE = frozenset({"intersects", "within", "covered_by"})
# classify a right row against the cell only when it has at least this many
# candidate pairs: classification is ~3 edge sweeps, one exact test is ~1
_CELL_CLASSIFY_MIN_PAIRS = 4

_SWAPPED_PREDICATE = {
    None: None,
    "intersects": "intersects",
    "dwithin": "dwithin",
    "touches": "touches",
    "geom_equals": "geom_equals",
    "within": "contains",
    "contains": "within",
    "contains_properly": None,  # no swapped form on the shuffle path
    "covers": "covered_by",
    "covered_by": "covers",
    "crosses": "crosses",  # symmetric: the mixed-dim patterns transpose
    "overlaps": "overlaps",  # symmetric by definition
}


def _estimate_salt_map(
    ds: ray.data.Dataset,
    geometry: str,
    res: int,
    domain,
    stride: int = 16,
    target_rows_per_shard: int = 65536,
    cap: int = 64,
) -> dict[int, int] | None:
    """Sampled hot-cell detector for salt='auto': one strided pass over the
    left side's cell assignments (every ``stride``-th row per batch), a tiny
    per-cell-count groupby, and ONLY cells whose estimated row count exceeds
    the shard target reach the driver. Returns {cell: salt_factor} for hot
    cells (factor = ceil(est / target), capped) or None when nothing is hot.
    Cost: one extra scan of the left geometry at 1/stride sampling."""

    def part(b: pa.Table) -> pa.Table:
        # stride BEFORE decoding: the estimator touches 1/stride of the WKB
        sampled = b.column(geometry).take(pa.array(np.arange(0, b.num_rows, stride)))
        g = from_wkb(sampled)
        bb = K.bounds(g)
        bb = bb[~np.isnan(bb).any(axis=1)]
        if not len(bb):
            return pa.table({"cell": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        _, cells = cells_for_bbox(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], res, domain)
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u.astype(np.int64)), "n": pa.array(c.astype(np.int64))})

    est = ds.map_batches(part, batch_format="pyarrow").groupby("cell").sum("n")

    def hot(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("sum(n)"), dtype=np.int64)
        return b.filter(pa.array(n * stride > target_rows_per_shard))

    rows = est.map_batches(hot, batch_format="pyarrow").take_all()  # hot cells only
    out: dict[int, int] = {}
    for r in rows:
        s = int(min(-(-int(r["sum(n)"]) * stride // target_rows_per_shard), cap))
        if s > 1:
            out[int(r["cell"])] = s
    return out or None


def sjoin_shuffle(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    predicate: str = "intersects",
    distance: float | None = None,
    geometry: str = "geometry",
    right_geometry: str | None = None,
    res: int = 7,
    domain=DEFAULT_DOMAIN,
    salt: int | str = 1,
    lsuffix: str = "left",
    rsuffix: str = "right",
    how: str = "inner",
    left_id: str | None = None,
    right_id: str | None = None,
    indexer_concurrency=None,
    batch_size: int = 8192,
    shuffle_partitions: int | None = None,
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    unmatched_broadcast_cap: int = 10_000_000,
    on_attribute=None,
) -> ray.data.Dataset:
    """Cell-partitioned sjoin for two large sides (one groupby shuffle).

    Column collisions are suffixed like the broadcast path; the right
    geometry column is emitted as ``geometry_right`` when names collide.

    ``left_columns``/``right_columns`` prune the payload BEFORE the shuffle
    (the semi-join pushdown of SURVEY.md §7.3): a join with a 200x fanout
    re-materializes every carried byte per output pair, so narrow inputs
    directly multiply throughput. Geometry is always kept.

    ``salt``: 1 (off), an int (uniform fan-out: every cell gets that many
    shards, right side replicated into all of them), or 'auto' — a sampled
    pre-pass measures per-cell left-row counts and salts ONLY hot cells,
    each by its own factor (see _estimate_salt_map).

    ``how``: inner (default) / left / right (tools/sjoin.py:239-262
    _adjust_indexers - r1 was inner-only). Outer hows need ``left_id``
    (resp. ``right_id``) naming a unique row-id column on the padded side.
    Unmatched ids are discovered with a fully VECTORIZED distributed
    anti-join (tag + union + native Sum aggregate - no Python per group, no
    pair-proportional driver pull); the final pad broadcasts the unmatched
    id set when it fits (typical: the unmatched tail is small) and falls
    back to a key-partitioned anti-join groupby otherwise. how='right'
    runs the swapped join (predicate inverted) and keeps RIGHT geometry
    like the reference.
    """
    if how not in ("inner", "left", "right"):
        raise ValueError(f"`how` was `{how}` but is expected to be in ('inner', 'left', 'right')")
    right_geometry = right_geometry or geometry
    if how == "right":
        swapped = _SWAPPED_PREDICATE.get(predicate, None)
        if swapped is None and predicate is not None:
            raise ValueError(f"predicate {predicate!r} has no swapped form for how='right'")
        if isinstance(distance, str):
            # the swapped plan dilates the (new) left = original RIGHT side,
            # but per-row radii align to the original LEFT rows
            raise NotImplementedError(
                "sjoin_shuffle(how='right') with a per-row distance column is "
                "not supported on the shuffle plan; use the broadcast sjoin "
                "(it streams left batches under every `how`)"
            )
        return sjoin_shuffle(
            right,
            left,
            predicate=swapped,
            distance=distance,
            geometry=right_geometry,
            right_geometry=geometry,
            res=res,
            domain=domain,
            salt=salt,
            lsuffix=rsuffix,
            rsuffix=lsuffix,
            how="left",
            left_id=right_id,
            indexer_concurrency=indexer_concurrency,
            batch_size=batch_size,
            shuffle_partitions=shuffle_partitions,
            left_columns=right_columns,
            right_columns=left_columns,
            unmatched_broadcast_cap=unmatched_broadcast_cap,
            on_attribute=on_attribute,
        )
    if how == "left" and left_id is None:
        raise ValueError("how='left' on the shuffle path requires `left_id`")
    if isinstance(on_attribute, str):
        on_attribute = [on_attribute]
    if on_attribute:
        lnames0 = left.schema().names
        rnames0 = right.schema().names
        for col in on_attribute:
            if col not in lnames0 or col not in rnames0:
                raise ValueError(f"Expected column {col} is missing from a frame being joined")
    salt_map = None
    if salt == "auto":
        # measure-then-salt: sampled per-cell counts pick PER-CELL factors,
        # so the right side replicates only into genuinely hot cells
        # (uniform salt replicates it into every cell)
        salt_map = _estimate_salt_map(left, geometry, res, domain)
        salt = 1
    if left_columns is not None:
        keep_left = set(left_columns) | {geometry}
        if isinstance(distance, str):
            keep_left.add(distance)  # per-row radii ride the left payload
        left = left.select_columns(sorted(keep_left))
    if right_columns is not None:
        right = right.select_columns(sorted(set(right_columns) | {right_geometry}))
    if isinstance(distance, str) and distance not in left.schema().names:
        raise ValueError(
            f"distance column {distance!r} is missing from the left frame "
            "(per-row radii must ride the LEFT side, tools/sjoin.py:38)"
        )
    lschema = left.schema()
    rschema = right.schema()
    lmap, rmap = suffixed_columns(lschema.names, rschema.names, lsuffix, rsuffix, geometry)
    # build union schema: control cols + prefixed both sides
    # NOTE: bboxes are NOT shipped through the shuffle — the per-cell join
    # decodes both sides' WKB anyway and recomputes bounds in one vectorized
    # pass; shipping 4 float64s per row costs more object-store bandwidth
    # than the recompute costs CPU (32B/row on a ~70B narrow row).
    control = [
        ("cell", pa.int64()),
        ("__salt", pa.int8()),
        ("__side", pa.int8()),
    ]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lnames = [(_L + lmap[n], ltypes[n]) for n in lschema.names]
    rnames = [(_R + rmap[n], rtypes[n]) for n in rschema.names]
    out_names = control + lnames + rnames

    # the cell indexer's state is pure constants (res/domain/schema), so it
    # runs as STATELESS TASKS, not an actor pool: elastic scheduling, no
    # actor startup/teardown churn (measured: pool churn inverted scaling -
    # 8 cpus beat 32). The broadcast joiner keeps its actor pool because its
    # state (the STR tree) is genuinely expensive per-worker.
    def make_indexer(side, rename_map, geom):
        idx = _CellIndexer(
            geometry=geom, res=res, domain=domain, side=side, salt=salt,
            prefix=_L if side == 0 else _R, out_schema_names=out_names,
            expand=(
                (lmap[distance] if isinstance(distance, str) else float(distance))
                if (predicate == "dwithin" and side == 0)
                else 0.0
            ),
            salt_map=salt_map,
        )

        def f(batch: pa.Table) -> pa.Table:
            return idx(_rename(batch, rename_map))

        return f

    lkeyed = left.map_batches(
        make_indexer(0, lmap, lmap[geometry]),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    rkeyed = right.map_batches(
        make_indexer(1, rmap, rmap[right_geometry]),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    both = lkeyed.union(rkeyed)
    # Ray's sort-based groupby emits one output partition per INPUT BLOCK;
    # with few/large input blocks the whole cell-local join would run in a
    # handful of tasks (measured: 2-16 tasks for a 106M-row join). Split to
    # ~4 blocks per CPU so the join actually fans out.
    if shuffle_partitions is None:
        from ..util import default_shuffle_partitions

        shuffle_partitions = default_shuffle_partitions()
    if shuffle_partitions:
        both = both.repartition(shuffle_partitions)
    lgeom_col = _L + lmap[geometry]
    rgeom_col = _R + rmap[right_geometry]
    # per-row radii: hand the join the PREFIXED post-rename column name
    dist_arg = (_L + lmap[distance]) if isinstance(distance, str) else distance
    joined = both.groupby(["cell", "__salt"]).map_groups(
        lambda b: _group_join(b, predicate, dist_arg, res, domain, lgeom_col, rgeom_col),
        batch_format="pyarrow",
    )
    if on_attribute:
        # equality post-filter per joined batch; columns emitted once,
        # unsuffixed (broadcast-path parity, tools/sjoin.py:168-171). A
        # pre-shuffle key refinement would prune earlier, but the filter is
        # exact and keeps the shuffle plan untouched.
        pairs = [(f"{c}_{lsuffix}", f"{c}_{rsuffix}", c) for c in on_attribute]

        def attr_filter(b: pa.Table) -> pa.Table:
            keep = np.ones(b.num_rows, dtype=bool)
            for lc, rc, _ in pairs:
                keep &= np.asarray(b.column(lc)) == np.asarray(b.column(rc))
                # merge semantics: null keys NEVER match (for object columns
                # Arrow nulls surface as Python None and None == None is
                # True, which would wrongly join null-keyed pairs)
                keep &= pc.is_valid(b.column(lc)).to_numpy(zero_copy_only=False)
                keep &= pc.is_valid(b.column(rc)).to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(keep))
            b = b.drop_columns([rc for _, rc, _ in pairs])
            ren = {lc: c for lc, _, c in pairs}
            return b.rename_columns([ren.get(c, c) for c in b.column_names])

        joined = joined.map_batches(attr_filter, batch_format="pyarrow")
        # the how='left' pad path maps left columns through lmap into the
        # POST-FILTER schema: attribute columns are unsuffixed there, and an
        # unmatched left row keeps ITS value (broadcast parity), not null
        lmap = {**lmap, **{c: c for c in on_attribute}}
    if how == "inner":
        return joined
    # --- how='left': pad unmatched left rows with null right attributes ---
    joined = joined.materialize()  # consumed twice (result + matched ids)
    lid_out = lmap[left_id]
    # distributed anti-join, no Python-per-group: tag matched ids 1, all
    # left ids 0, one native Sum aggregate; unmatched rows sum to 0
    matched = joined.groupby(lid_out).count()

    def tag_matched(b: pa.Table) -> pa.Table:
        return pa.table(
            {lid_out: b.column(lid_out), "__t": pa.array(np.ones(len(b), dtype=np.int64))}
        )

    # test probe: captured into a LOCAL here (workers re-import the module
    # and would see None if tag_left read the global directly)
    probe = _ANTI_JOIN_PROBE

    def tag_left(b: pa.Table) -> pa.Table:
        if probe is not None:
            probe.incr.remote(len(b))
        return pa.table(
            {lid_out: b.column(left_id), "__t": pa.array(np.zeros(len(b), dtype=np.int64))}
        )

    from ray.data.aggregate import Sum

    flags = (
        matched.map_batches(tag_matched, batch_format="pyarrow")
        .union(left.select_columns([left_id]).map_batches(tag_left, batch_format="pyarrow"))
        .groupby(lid_out)
        .aggregate(Sum("__t", alias_name="__s"))
    )
    # materialize BEFORE count(): `unmatched` is consumed twice (count here,
    # row pull below) and a lazy filter would re-execute the whole
    # tag+union+groupby exchange per consumer (r3 VERDICT defect #1)
    unmatched = flags.filter(expr="__s == 0").materialize()
    n_un = unmatched.count()
    if n_un == 0:
        return joined
    out_schema = joined.schema()
    out_types = dict(zip(out_schema.names, out_schema.types))

    def pad_batch(b: pa.Table) -> pa.Table:
        renamed = _rename(b, lmap)
        cols = {}
        for name in out_schema.names:
            if name in renamed.column_names:
                cols[name] = renamed.column(name)
            else:
                cols[name] = pa.nulls(len(b), out_types[name])
        return pa.table(cols)

    if n_un <= unmatched_broadcast_cap:
        # block-type-safe bounded pull (filter(expr=) can emit pandas blocks)
        from ..util import pull_table

        un_tbl = pull_table(unmatched, columns=[lid_out])
        un_ref = ray.put(un_tbl.column(lid_out).combine_chunks())

        def pad_filter(b: pa.Table) -> pa.Table:
            ids = ray.get(un_ref)
            m = pc.is_in(b.column(left_id), value_set=ids)
            return pad_batch(b.filter(m))

        pad = left.map_batches(pad_filter, batch_format="pyarrow")
    else:
        # huge unmatched tail: key-partitioned anti-join (groupby fallback)
        left_names = list(lschema.names)

        def tag_side(side):
            def f(b: pa.Table) -> pa.Table:
                n = len(b)
                base = {}
                for c in left_names:
                    if side == 0:
                        base[c] = b.column(c)
                    elif c == left_id:
                        base[c] = b.column(lid_out)
                    else:
                        base[c] = pa.nulls(n, ltypes[c])
                base["__side2"] = pa.array(np.full(n, side, dtype=np.int8))
                return pa.table(base)

            return f

        import pandas as pd

        nparts2 = shuffle_partitions or 64

        def add_part2(df: "pd.DataFrame") -> "pd.DataFrame":
            df = df.copy()
            df["__part2"] = pd.util.hash_array(df[left_id].to_numpy()) % nparts2
            return df

        def anti_part(df: "pd.DataFrame") -> "pd.DataFrame":
            # vectorized per-partition anti-join, not a map_groups per id
            hit = df.loc[df["__side2"] == 1, left_id]
            keep = (df["__side2"] == 0) & ~df[left_id].isin(hit)
            return df[keep].drop(columns=["__side2", "__part2"])

        lt_tagged = left.map_batches(tag_side(0), batch_format="pyarrow")
        m_tagged = matched.map_batches(tag_side(1), batch_format="pyarrow")
        miss_rows = (
            lt_tagged.union(m_tagged)
            .map_batches(add_part2, batch_format="pandas")
            .repartition(nparts2)
            .groupby("__part2")
            .map_groups(anti_part, batch_format="pandas")
        )
        pad = miss_rows.map_batches(
            lambda b: pad_batch(b), batch_format="pyarrow"
        )
    return joined.union(pad)
