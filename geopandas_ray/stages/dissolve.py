"""dissolve / union_all / grouped aggregation (SURVEY.md §2.5).

Reference: GeoDataFrame.dissolve (geodataframe.py:1325): group rows by
``by`` column(s), union each group's geometry (union_all, base.py:1982),
aggregate the remaining columns with ``aggfunc`` (default "first";
string / list / dict / callable, geodataframe.py:1343-1351), with
``dropna`` group-key handling (geodataframe.py:1365).

Physical plan: because geometry union is associative, every block first
pre-combines locally (one partial union row per key per batch - the
combiner that keeps hot groups from melting a single reducer), then one
hash-partition shuffle over the *partials* (``__part = hash(key) % n``)
and ONE vectorized pandas pass per partition for the final union +
attribute re-aggregation — never one Ray task per distinct key, so a
10M-key dissolve costs ~n tasks, not 10M. Attribute aggfuncs that cannot be
partial-combined (median, arbitrary callables) skip the pre-combine for
those columns and ship raw values (bounded: one row per key per block).

as_index is always False in the engine (keys stay ordinary columns - the
Ray data model has no index; SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..geom.union import union_wkb_values

_COMBINABLE = {"first", "last", "min", "max", "sum", "count", "mean"}


def _normalize_aggfunc(aggfunc, cols) -> dict[str, list[str]]:
    """-> {col: [funcs...]} like pandas agg dict, flattened."""
    if isinstance(aggfunc, str):
        return {c: [aggfunc] for c in cols}
    if isinstance(aggfunc, dict):
        out = {}
        for c, f in aggfunc.items():
            out[c] = [f] if isinstance(f, str) else list(f)
        return out
    if isinstance(aggfunc, list):
        return {c: list(aggfunc) for c in cols}
    raise TypeError(f"aggfunc {aggfunc!r} unsupported (str/list/dict)")


def _agg_frame(g: pd.DataFrame, spec: dict[str, list[str]], multi: bool) -> dict:
    out = {}
    for c, funcs in spec.items():
        for f in funcs:
            name = f"{c}_{f}" if (multi or len(funcs) > 1) else c
            s = g[c]
            if f == "first":
                out[name] = s.iloc[0] if len(s) else None
            elif f == "last":
                out[name] = s.iloc[-1] if len(s) else None
            elif f == "count":
                out[name] = int(s.count())
            else:
                out[name] = getattr(s, f)()
    return out


def dissolve(
    ds: ray.data.Dataset,
    by=None,
    aggfunc="first",
    geometry: str = "geometry",
    dropna: bool = True,
    pre_combine: bool = True,
    sort: bool = True,
    observed: bool = False,
    method: str = "unary",
    level=None,
    index_cols=None,
) -> ray.data.Dataset:
    """Grouped geometry union + attribute aggregation.

    ``by=None`` dissolves everything into one row (test_dissolve.py:150-162
    analog) - computed with the same partial+final pattern under a constant
    key.

    ``sort``/``observed`` follow geodataframe.py:1325 (pandas groupby
    semantics): ``sort=True`` orders the (small, one-row-per-group) result
    by the group keys; ``observed=False`` emits rows for unobserved
    categories of dict-encoded (categorical) key columns — each block's
    pandas partial carries the full category set, so unobserved groups
    surface with None geometry and NaN/0 aggregates exactly like pandas.
    ``as_index`` has no engine analog (Datasets have no index; keys are
    columns). ``method`` ('unary'|'coverage') is accepted for parity; see
    union_all — both route to the same exact union here.
    """
    if method not in ("unary", "coverage"):
        raise ValueError(f"method must be 'unary' or 'coverage', got {method!r}")
    # level= (geodataframe.py:1338): group by index level(s). In the
    # index-as-columns model an index level IS a column - a str level names
    # it directly; an int level is positional into ``index_cols`` (the
    # dataset's index-role columns, in index order).
    if level is not None:
        if by is not None:
            raise ValueError("pass `by` or `level`, not both")
        levels = [level] if isinstance(level, (str, int)) else list(level)
        by = []
        for lv in levels:
            if isinstance(lv, int):
                if index_cols is None:
                    raise ValueError(
                        "integer `level` needs `index_cols` (the dataset's "
                        "index-role column names, in index order)"
                    )
                by.append(index_cols[lv])
            else:
                by.append(lv)
    if by is None:
        by_cols: list[str] = []
    elif isinstance(by, str):
        by_cols = [by]
    else:
        by_cols = list(by)
    schema_names = ds.schema().names
    attr_cols = [c for c in schema_names if c != geometry and c not in by_cols]
    spec = _normalize_aggfunc(aggfunc, attr_cols)
    spec = {c: f for c, f in spec.items() if c in attr_cols}
    multi = any(len(f) > 1 for f in spec.values()) or isinstance(aggfunc, dict)

    GROUP_KEY = by_cols if by_cols else ["__g"]

    def add_const(batch: pa.Table) -> pa.Table:
        return batch.append_column("__g", pa.array(np.zeros(len(batch), dtype=np.int8)))

    work = ds if by_cols else ds.map_batches(add_const, batch_format="pyarrow")

    pre_ok = pre_combine and all(f in _COMBINABLE and f != "mean" for fs in spec.values() for f in fs)

    # canonical little-endian 2-D POINT WKB: union of one such row re-encodes
    # to the identical 21 bytes, so singleton point groups pass through
    _PT_HDR = b"\x01\x01\x00\x00\x00"

    def combine_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty_partial(df)
        needs_unobserved = not observed and any(
            isinstance(df[k].dtype, pd.CategoricalDtype) for k in GROUP_KEY
        )
        if needs_unobserved:
            # categorical observed=False: pandas must manufacture empty
            # groups per block — keep the per-group loop (category sets are
            # small by construction)
            rows = []
            for key, grp in df.groupby(GROUP_KEY, dropna=dropna, sort=False, observed=False):
                key = key if isinstance(key, tuple) else (key,)
                row = dict(zip(GROUP_KEY, key))
                row[geometry] = union_wkb_values(grp[geometry].tolist())
                row["__cnt"] = len(grp)
                row.update(_agg_frame(grp, spec, multi))
                rows.append(row)
            return pd.DataFrame(rows) if rows else _empty_partial(df)

        # vectorized partial: one block-wide WKB decode, per-key union ONLY
        # for groups that need it (multi-row, or non-point singletons)
        from ..geom.union import union_rows
        from ..geom.wkb import from_wkb

        df = df.reset_index(drop=True)
        gb = df.groupby(GROUP_KEY, dropna=dropna, sort=False, observed=True)
        gid = gb.ngroup().to_numpy()
        if (gid < 0).any():  # dropna=True null keys (normally pre-filtered)
            keep = gid >= 0
            df = df[keep].reset_index(drop=True)
            gid = gid[keep]
            gb = df.groupby(GROUP_KEY, dropna=dropna, sort=False, observed=True)
        ngrp = int(gid.max()) + 1 if len(gid) else 0
        if ngrp == 0:
            return _empty_partial(df)
        counts = np.bincount(gid, minlength=ngrp)
        idx = np.arange(len(gid))
        first_idx = np.empty(ngrp, dtype=np.int64)
        first_idx[gid[::-1]] = idx[::-1]
        last_idx = np.empty(ngrp, dtype=np.int64)
        last_idx[gid] = idx

        out = df.iloc[first_idx][GROUP_KEY].reset_index(drop=True)
        gvals = df[geometry].to_numpy()
        geos = np.empty(ngrp, dtype=object)
        single = counts == 1
        if single.any():
            sv = gvals[first_idx[single]]
            canon = np.fromiter(
                (w is not None and len(w) == 21 and w[:5] == _PT_HDR for w in sv),
                dtype=bool,
                count=len(sv),
            )
            tgt = np.nonzero(single)[0]
            geos[tgt[canon]] = sv[canon]
            slow = ~canon
        else:
            tgt = np.empty(0, dtype=np.int64)
            slow = np.empty(0, dtype=bool)
        need_union = np.zeros(ngrp, dtype=bool)
        need_union[~single] = True
        need_union[tgt[slow]] = True
        if need_union.any():
            G = from_wkb(gvals.tolist())
            order = np.argsort(gid, kind="stable")
            starts = np.searchsorted(gid[order], np.arange(ngrp))
            for gi in np.nonzero(need_union)[0]:
                sel = order[starts[gi] : starts[gi] + counts[gi]]
                geos[gi] = union_rows(G, sel)
        out[geometry] = geos
        out["__cnt"] = counts
        for c, funcs in spec.items():
            for f in funcs:
                name = f"{c}_{f}" if (multi or len(funcs) > 1) else c
                if f == "first":  # iloc[0]: NaN not skipped
                    out[name] = df[c].to_numpy()[first_idx]
                elif f == "last":
                    out[name] = df[c].to_numpy()[last_idx]
                elif f == "count":
                    out[name] = gb[c].count().to_numpy()
                else:  # sum/min/max — pandas skipna matches Series.agg
                    out[name] = gb[c].agg(f).to_numpy()
        return out

    def _empty_partial(df):
        cols = list(GROUP_KEY) + [geometry, "__cnt"] + [
            f"{c}_{f}" if (multi or len(fs) > 1) else c for c, fs in spec.items() for f in fs
        ]
        return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

    # (name, re-agg) per output column: min of mins, sum of sums, count->sum
    _REAGG = {"first": "first", "last": "last", "sum": "sum", "count": "sum", "min": "min", "max": "max"}
    agg_cols = [
        (f"{c}_{f}" if (multi or len(funcs) > 1) else c, f)
        for c, funcs in spec.items()
        for f in funcs
    ]

    def add_part(nparts):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            h = np.zeros(len(df), dtype=np.uint64)
            for k in GROUP_KEY:
                h = h * np.uint64(1000003) ^ pd.util.hash_pandas_object(
                    df[k], index=False
                ).to_numpy(dtype=np.uint64)
            df = df.copy()
            df["__part"] = (h % np.uint64(nparts)).astype(np.int64)
            return df

        return f

    def final_partition(df: pd.DataFrame) -> pd.DataFrame:
        """One vectorized pass per HASH PARTITION, not one task per key
        (a 10M-key dissolve melts on per-group map_groups overhead —
        CLAUDE.md pitfall). Attributes re-aggregate at C speed; geometry
        unions run only for keys whose partials span >1 block (singleton
        partials pass through untouched)."""
        df = df.drop(columns=["__part"]).reset_index(drop=True)
        gb = df.groupby(GROUP_KEY, sort=False, dropna=False, observed=True)
        gid = gb.ngroup().to_numpy()  # first-occurrence numbering (sort=False)
        ngrp = int(gid.max()) + 1 if len(gid) else 0
        counts = np.bincount(gid, minlength=ngrp)
        idx = np.arange(len(gid))
        first_idx = np.empty(ngrp, dtype=np.int64)
        first_idx[gid[::-1]] = idx[::-1]
        last_idx = np.empty(ngrp, dtype=np.int64)
        last_idx[gid] = idx

        out = df.iloc[first_idx][GROUP_KEY].reset_index(drop=True)
        # geometry: passthrough singletons, per-key union for the rest
        gvals = df[geometry].to_numpy()
        geos = np.empty(ngrp, dtype=object)
        m1 = counts == 1
        geos[m1] = gvals[first_idx[m1]]
        if not m1.all():
            order = np.argsort(gid, kind="stable")
            starts = np.searchsorted(gid[order], np.arange(ngrp))
            for g in np.nonzero(~m1)[0]:
                sel = order[starts[g] : starts[g] + counts[g]]
                geos[g] = union_wkb_values(gvals[sel].tolist())
        out[geometry] = geos
        for name, f in agg_cols:
            vals = df[name].to_numpy()
            if f == "first":  # iloc[0] semantics: NaN partials NOT skipped
                out[name] = vals[first_idx]
            elif f == "last":
                out[name] = vals[last_idx]
            else:
                out[name] = gb[name].agg(_REAGG[f]).to_numpy()
        return out.drop(columns=[c for c in ("__g",) if c in out.columns])

    def direct_group(df: pd.DataFrame) -> pd.DataFrame:
        row = {k: df[k].iloc[0] for k in GROUP_KEY}
        row[geometry] = union_wkb_values(df[geometry].tolist())
        row.update(_agg_frame(df, spec, multi))
        out = pd.DataFrame([row])
        return out.drop(columns=[c for c in ("__g",) if c in out.columns])

    if dropna and by_cols:

        def drop_null_keys(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = None
            for k in by_cols:
                m = pc.is_valid(batch.column(k))
                mask = m if mask is None else pc.and_(mask, m)
            return batch.filter(mask)

        work = work.map_batches(drop_null_keys, batch_format="pyarrow")

    if pre_ok:
        from ..util import default_shuffle_partitions

        nparts = default_shuffle_partitions()
        partials = work.map_batches(combine_partial, batch_format="pandas").map_batches(
            add_part(nparts), batch_format="pandas"
        )
        # groupby("__part") emits one reduce partition per PARTIAL block
        # (CLAUDE.md invariant), which tracks the input's block count: small
        # inputs reduce in one task, wide inputs fan out per block. No
        # forced repartition - on a 25-key dissolve it tripled wall time
        # (128-way shuffle of a 25-row table), and the vectorized reduce
        # makes even a single-task fallback a C-level pass, never
        # one Python task per key.
        out = partials.groupby("__part").map_groups(final_partition, batch_format="pandas")
    else:
        out = work.groupby(GROUP_KEY).map_groups(direct_group, batch_format="pandas")
        # unobserved categories cannot be manufactured by a per-observed-group
        # map; the partial path handles them (pandas emits full category sets
        # per block). Non-combinable aggfuncs + observed=False is untestable
        # against pandas otherwise, so be loud.
        if not observed and by_cols:
            import pyarrow.types as pt

            sch = ds.schema().base_schema if hasattr(ds.schema(), "base_schema") else None
            if sch is not None and any(
                pt.is_dictionary(sch.field(c).type) for c in by_cols if c in sch.names
            ):
                raise NotImplementedError(
                    "observed=False with categorical keys requires a combinable "
                    "aggfunc (the partial-union path); use observed=True or a "
                    "combinable aggfunc"
                )
    if sort and by_cols:
        out = out.sort(by_cols)
    return out


def union_all(
    ds: ray.data.Dataset, geometry: str = "geometry", method: str = "unary"
) -> bytes | None:
    """Global geometry union -> single WKB scalar (base.py:1982).

    ``method``: 'unary' | 'coverage' accepted for signature parity.
    'coverage' is a GEOS performance HINT for non-overlapping inputs; this
    engine's union is already linear for rect coverages (coordinate-grid
    region union) and handles overlap exactly otherwise, so both methods
    route to the same exact union.

    Partial per-block unions stream; the driver merges the (tiny) partials.
    """
    if method not in ("unary", "coverage"):
        raise ValueError(f"method must be 'unary' or 'coverage', got {method!r}")

    def partial(batch: pa.Table) -> pa.Table:
        w = union_wkb_values(batch.column(geometry).to_pylist())
        return pa.table({"g": pa.array([w], type=pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return union_wkb_values([r["g"] for r in parts])


def total_bounds(ds: ray.data.Dataset, geometry: str = "geometry") -> np.ndarray:
    """Global (minx, miny, maxx, maxy) via per-block partial bounds
    (base.py:4704)."""
    from ..geom import kernels as K
    from ..geom.wkb import from_wkb

    def partial(batch: pa.Table) -> pa.Table:
        tb = K.total_bounds(from_wkb(batch.column(geometry)))
        return pa.table(
            {"minx": [tb[0]], "miny": [tb[1]], "maxx": [tb[2]], "maxy": [tb[3]]}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not parts:
        return np.array([np.nan] * 4)
    import math

    return np.array(
        [
            min((p["minx"] for p in parts if not math.isnan(p["minx"])), default=np.nan),
            min((p["miny"] for p in parts if not math.isnan(p["miny"])), default=np.nan),
            max((p["maxx"] for p in parts if not math.isnan(p["maxx"])), default=np.nan),
            max((p["maxy"] for p in parts if not math.isnan(p["maxy"])), default=np.nan),
        ]
    )


def intersection_all(ds: ray.data.Dataset, geometry: str = "geometry") -> bytes | None:
    """Global geometry intersection -> single WKB scalar (base.py:2017).

    Intersection is associative, so per-block partial folds stream and the
    driver folds the (tiny, one per block) partials. Scope follows the
    pairwise kernel (stages/overlay.pair_intersection_wkb): general simple
    polygons via the slab sweep, point layers, line/polygon clip and
    line/line overlap+crossings; missing rows are skipped like union_all,
    an empty fold yields None.
    """
    import struct as _struct

    from ..geom.wkb import from_wkb as _fw
    from .overlay import pair_intersection_wkb

    EMPTY = _struct.pack("<BII", 1, 7, 0)  # GEOMETRYCOLLECTION EMPTY

    def fold(values: list) -> bytes | None:
        """None inputs (missing) are skipped; an empty intersection is the
        explicit EMPTY sentinel (kept distinct so block partials compose)."""
        acc = None
        seen = False
        for w in values:
            if w is None:
                continue
            if not seen:
                acc, seen = w, True
                continue
            if acc == EMPTY or w == EMPTY:
                acc = EMPTY
                break  # empty absorbs
            pair = _fw([acc, w])
            acc = pair_intersection_wkb(pair, 0, pair, 1) or EMPTY
        return acc if seen else None

    def partial(batch: pa.Table) -> pa.Table:
        w = fold(batch.column(geometry).to_pylist())
        return pa.table({"g": pa.array([w], type=pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return fold([r["g"] for r in parts])
