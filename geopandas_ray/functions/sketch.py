"""Mergeable cardinality sketches + exact vocabulary statistics.

The corpus-statistics primitives a 100-TB curation stack needs when an
exact ``COUNT(DISTINCT)`` shuffle is too expensive:

- ``kmv_distinct``: K-Minimum-Values (Bar-Yossef et al., RANDOM 2002) —
  keep the k smallest 64-bit hashes ever seen; the k-th smallest order
  statistic estimates cardinality as ``(k-1) / (h_k / 2^64)``. Exact
  below k distinct values (the sketch simply holds them all).
- ``hll_distinct``: HyperLogLog (Flajolet et al., AofA 2007) — 2**p
  max-rank registers with the standard small-range linear-counting
  correction.
- ``distinct_count_exact`` / ``vocab_stats``: the exact anchors (one
  hash shuffle), gate-checkable against SQL ``COUNT(DISTINCT)``.

Physical plan (both sketches): one streaming ``map_batches`` pass emits a
TINY partial sketch row per batch (k*8 bytes / 2**p bytes), a
``repartition(P)`` + per-block merge bounds the driver pull to P rows,
and the driver folds the last P sketches. No value ever shuffles; the
reduce payload is sketch-sized, independent of data volume.

Determinism: hashing is ``pd.util.hash_array`` (SipHash-1-3 with the
fixed default key — stable across processes and runs), merges are
order-independent (set-union / elementwise max), so estimates are
bit-reproducible for a given input set. Not SQL-reproducible (DuckDB
cannot compute SipHash) — sketch gates are rows-only; the exact anchors
gate hash-equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..util import default_shuffle_partitions


def _hash_values(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hashes of an object/string array."""
    return pd.util.hash_array(np.asarray(values, dtype=object)).astype(np.uint64)


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def _kmv_fold(hashes: np.ndarray, k: int) -> np.ndarray:
    """k smallest DISTINCT hashes (ascending uint64; shorter if fewer)."""
    u = np.unique(hashes)  # sorted ascending
    return u[:k]


def _kmv_estimate(sketch: np.ndarray, k: int) -> float:
    if len(sketch) < k:
        return float(len(sketch))  # saw fewer than k distinct: exact
    # (k-1)/x where x is the k-th order statistic of U(0,1) hashes
    return float(k - 1) * 18446744073709551616.0 / float(sketch[k - 1] + 1)


def kmv_partials(
    ds: ray.data.Dataset, col: str, k: int = 1024, concurrency=None
) -> ray.data.Dataset:
    """One (sketch: large_binary) row per batch: the k smallest distinct
    SipHash values of ``col``, little-endian uint64 bytes."""

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        sk = _kmv_fold(_hash_values(vals), k) if len(vals) else np.empty(0, np.uint64)
        return pa.table({"sketch": pa.array([sk.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)


def _kmv_merge_block(b: pa.Table, k: int) -> np.ndarray:
    views = [
        np.frombuffer(s.as_py(), dtype=np.uint64) for s in b.column("sketch")
    ]
    if not views:
        return np.empty(0, np.uint64)
    return _kmv_fold(np.concatenate(views), k)


def kmv_distinct(
    ds: ray.data.Dataset, col: str, k: int = 1024, concurrency=None
) -> pa.Table:
    """Distinct-count estimate of ``col``. Returns a one-row table
    (k, sketch_size, estimate)."""
    parts = kmv_partials(ds, col, k=k, concurrency=concurrency)
    nparts = default_shuffle_partitions()

    def merge(b: pa.Table) -> pa.Table:
        sk = _kmv_merge_block(b, k)
        return pa.table({"sketch": pa.array([sk.tobytes()], pa.large_binary())})

    folded = parts.repartition(nparts).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    final = _kmv_merge_block(
        pa.table(folded.take_batch(nparts + 1, batch_format="pyarrow")), k
    )
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "sketch_size": pa.array([len(final)], pa.int64()),
            "estimate": pa.array([_kmv_estimate(final, k)], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    bl = np.zeros(len(w), dtype=np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = w >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        w[mask] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def _hll_fold(hashes: np.ndarray, p: int) -> np.ndarray:
    """2**p uint8 max-rank registers from a hash batch."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes & np.uint64((1 << p) - 1)).astype(np.int64)
    w = hashes >> np.uint64(p)
    rho = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))  # linear counting
    return float(est)


def hll_partials(
    ds: ray.data.Dataset, col: str, p: int = 12, concurrency=None
) -> ray.data.Dataset:
    """One (sketch: large_binary) row per batch: 2**p max-rank registers."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in 4..18")

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        regs = _hll_fold(
            _hash_values(vals) if len(vals) else np.empty(0, np.uint64), p
        )
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)


def _hll_merge_block(b: pa.Table, p: int) -> np.ndarray:
    regs = np.zeros(1 << p, dtype=np.uint8)
    for s in b.column("sketch"):
        regs = np.maximum(regs, np.frombuffer(s.as_py(), dtype=np.uint8))
    return regs


def hll_distinct(
    ds: ray.data.Dataset, col: str, p: int = 12, concurrency=None
) -> pa.Table:
    """Distinct-count estimate of ``col``. Returns a one-row table
    (p, estimate); typical relative error ~1.04/sqrt(2**p)."""
    parts = hll_partials(ds, col, p=p, concurrency=concurrency)
    nparts = default_shuffle_partitions()

    def merge(b: pa.Table) -> pa.Table:
        regs = _hll_merge_block(b, p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.large_binary())})

    folded = parts.repartition(nparts).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    final = _hll_merge_block(
        pa.table(folded.take_batch(nparts + 1, batch_format="pyarrow")), p
    )
    return pa.table(
        {
            "p": pa.array([p], pa.int64()),
            "estimate": pa.array([_hll_estimate(final)], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# Exact anchors
# ---------------------------------------------------------------------------


def distinct_count_exact(ds: ray.data.Dataset, col: str) -> int:
    """Exact distinct count: per-batch local distinct partial, then ONE
    hash shuffle on the value (the cost the sketches avoid)."""

    def local_distinct(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(b.column(col).combine_chunks())
        return pa.table({col: u})

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .repartition(default_shuffle_partitions())  # groupby emits one
        .groupby(col)  # partition per INPUT block (CLAUDE.md invariant)
        .count()
        .count()
    )


def vocab_stats(
    ds: ray.data.Dataset, text_col: str = "text", doc_id_col: str = "doc_id"
) -> pa.Table:
    """Exact corpus vocabulary statistics over the tfidf tokenizer's
    ``[a-z0-9]+`` tokens: (distinct_tokens, total_tokens). The distinct
    pass pre-shrinks per batch before its one shuffle; total_tokens is a
    pure per-batch partial sum."""
    from .tfidf import tokenize_tf

    toks = tokenize_tf(ds, text_col=text_col, id_col=doc_id_col).materialize()
    distinct = distinct_count_exact(toks, "token")

    def tf_partial(b: pa.Table) -> pa.Table:
        tf = np.asarray(b.column("tf"), dtype=np.int64)
        return pa.table({"s": pa.array([int(tf.sum())], pa.int64())})

    total = sum(
        r["s"] for r in toks.map_batches(tf_partial, batch_format="pyarrow").take_all()
    )
    return pa.table(
        {
            "distinct_tokens": pa.array([distinct], pa.int64()),
            "total_tokens": pa.array([int(total)], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Exact quantiles of a bounded non-negative integer column
# ---------------------------------------------------------------------------


def _bincount_merge_block(b: pa.Table) -> np.ndarray:
    views = [np.frombuffer(s.as_py(), dtype=np.int64) for s in b.column("counts")]
    if not views:
        return np.zeros(1, dtype=np.int64)
    out = np.zeros(max(len(v) for v in views), dtype=np.int64)
    for v in views:
        out[: len(v)] += v
    return out


def int_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    concurrency=None,
) -> pa.Table:
    """EXACT discrete quantiles of a bounded non-negative integer column
    (doc token counts, span counts, ...) without any sort shuffle: per-
    batch ``np.bincount`` partials (one small counts row per batch),
    repartition(P) + per-block padded sums, driver fold of P rows. The
    quantile rule matches SQL ``quantile_disc`` / ``percentile_disc``:
    the smallest value whose cumulative count reaches ``ceil(q * n)``.
    Returns (q: float64, value: int64) rows."""
    nparts = default_shuffle_partitions()

    def partial(b: pa.Table) -> pa.Table:
        vals = np.asarray(b.column(col), dtype=np.int64)
        if len(vals) and vals.min() < 0:
            raise ValueError(f"int_quantiles requires non-negative {col!r}")
        counts = np.bincount(vals) if len(vals) else np.zeros(1, dtype=np.int64)
        return pa.table(
            {"counts": pa.array([counts.astype(np.int64).tobytes()], pa.large_binary())}
        )

    def merge(b: pa.Table) -> pa.Table:
        return pa.table(
            {"counts": pa.array([_bincount_merge_block(b).tobytes()], pa.large_binary())}
        )

    folded = (
        ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)
        .repartition(nparts)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    counts = _bincount_merge_block(
        pa.table(folded.take_batch(nparts + 1, batch_format="pyarrow"))
    )
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        target = max(1, int(np.ceil(q * n)))
        out_q.append(float(q))
        out_v.append(int(np.searchsorted(cum, target)))
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (mergeable summaries, Agarwal et al. PODS 2012)
# ---------------------------------------------------------------------------


def _mg_compress(tokens: np.ndarray, counts: np.ndarray, capacity: int):
    """Keep the top ``capacity`` entries after subtracting the
    (capacity+1)-th largest count from everyone (the mergeable-summary
    compression): every kept count underestimates truth by at most the
    sum of subtracted thresholds."""
    if len(tokens) <= capacity:
        return tokens, counts
    # threshold = (capacity+1)-th largest count
    thr = np.partition(counts, len(counts) - capacity - 1)[len(counts) - capacity - 1]
    adj = counts - thr
    keep = adj > 0
    return tokens[keep], adj[keep]


def mg_partials(
    ds: ray.data.Dataset, col: str, capacity: int = 1024, concurrency=None
) -> ray.data.Dataset:
    """One Misra-Gries summary row per batch: (tokens: list<string>,
    counts: list<int64>), at most ``capacity`` entries."""

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        if len(vals):
            toks, cnts = np.unique(np.asarray(vals, dtype=object), return_counts=True)
            toks, cnts = _mg_compress(toks, cnts.astype(np.int64), capacity)
        else:
            toks, cnts = np.empty(0, object), np.empty(0, np.int64)
        return pa.table(
            {
                "tokens": pa.array([list(toks)], pa.large_list(pa.string())),
                "counts": pa.array([cnts.tolist()], pa.large_list(pa.int64())),
                "n": pa.array(
                    [int(len(vals))], pa.int64()
                ),  # rows summarized (error bound denominator)
            }
        )

    return ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)


def _mg_merge_block(b: pa.Table, capacity: int):
    toks: list = []
    cnts: list = []
    n = 0
    for i in range(len(b)):
        toks.extend(b.column("tokens")[i].as_py())
        cnts.extend(b.column("counts")[i].as_py())
        n += b.column("n")[i].as_py()
    if not toks:
        return np.empty(0, object), np.empty(0, np.int64), n
    t = np.asarray(toks, dtype=object)
    c = np.asarray(cnts, dtype=np.int64)
    # sum duplicate tokens across summaries, then compress
    order = np.argsort(t, kind="stable")
    t, c = t[order], c[order]
    uniq, starts = np.unique(t, return_index=True)
    sums = np.add.reduceat(c, starts)
    ut, uc = _mg_compress(uniq, sums, capacity)
    return ut, uc, n


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    k: int = 20,
    capacity: int = 1024,
    concurrency=None,
) -> pa.Table:
    """Approximate top-k frequent values: Misra-Gries summaries per batch,
    repartition(P) + per-block merge, driver fold of P summaries — no
    value-keyed shuffle. Every value with true frequency > n/capacity is
    guaranteed present; reported counts underestimate truth by at most
    n/capacity (``max_undercount``). Returns (value, min_count) rows
    ordered by (min_count desc, value asc) plus the bound columns."""
    parts = mg_partials(ds, col, capacity=capacity, concurrency=concurrency)
    nparts = default_shuffle_partitions()

    def merge(b: pa.Table) -> pa.Table:
        t, c, n = _mg_merge_block(b, capacity)
        return pa.table(
            {
                "tokens": pa.array([list(t)], pa.large_list(pa.string())),
                "counts": pa.array([c.tolist()], pa.large_list(pa.int64())),
                "n": pa.array([n], pa.int64()),
            }
        )

    folded = parts.repartition(nparts).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    )
    t, c, n = _mg_merge_block(
        pa.table(folded.take_batch(nparts + 1, batch_format="pyarrow")), capacity
    )
    if len(t):
        order = np.lexsort((t, -c))[:k]
        t, c = t[order], c[order]
    return pa.table(
        {
            "value": pa.array(list(t), pa.string()),
            "min_count": pa.array(c.tolist() if len(t) else [], pa.int64()),
            "n": pa.array([n] * len(t), pa.int64()),
            "max_undercount": pa.array(
                [n // capacity] * len(t), pa.int64()
            ),
        }
    )


def top_values_exact(ds: ray.data.Dataset, col: str, k: int = 20) -> pa.Table:
    """Exact top-k frequent values (the heavy-hitter anchor): per-batch
    local count partials, one small groupby-sum shuffle, driver head-k
    with the (count desc, value asc) tie-break."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        if not len(vals):
            return pa.table(
                {"value": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        toks, cnts = np.unique(np.asarray(vals, dtype=object), return_counts=True)
        return pa.table(
            {
                "value": pa.array(list(toks), pa.string()),
                "c": pa.array(cnts.astype(np.int64)),
            }
        )

    nparts = default_shuffle_partitions()
    g = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(nparts)
        .groupby("value")
        .aggregate(Sum("c", alias_name="count"))
    )

    # each distinct value lands in exactly one post-groupby block, so a
    # per-block local head-k bounds the candidate stream to blocks*k rows
    # (to_pandas, not a fixed-size take_batch — Ray may split large
    # post-groupby blocks and a fixed bound would silently drop rows)
    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["count", "value"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = g.map_batches(local_topk, batch_format="pandas", batch_size=None).to_pandas()
    out = cand.sort_values(
        ["count", "value"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    return pa.table(
        {
            "value": pa.array(out["value"].tolist(), pa.string()),
            "count": pa.array(out["count"].astype(np.int64).tolist(), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Keyed sketches: per-group distinct counts
# ---------------------------------------------------------------------------


def kmv_distinct_by(
    ds: ray.data.Dataset,
    col: str,
    by: str,
    k: int = 256,
    concurrency=None,
) -> ray.data.Dataset:
    """Per-group distinct-count estimates: one KMV sketch per ``by`` key.
    Per batch emits one (by, sketch) row per key seen; the merge hash-
    partitions on the KEY and folds every key of a partition in ONE
    pandas pass (CLAUDE.md high-cardinality rule — never a per-key
    map_groups), so the shuffle payload is sketches, never values.
    Returns (by, sketch_size, estimate) rows."""
    from ..util import default_shuffle_partitions

    def partial(b: pa.Table) -> pa.Table:
        keys = b.column(by).to_numpy(zero_copy_only=False)
        vals = b.column(col).to_numpy(zero_copy_only=False)
        out_k: list = []
        out_s: list = []
        if len(keys):
            order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
            keys_s = np.asarray(keys, dtype=object)[order]
            h = _hash_values(vals)[order]
            uniq, starts = np.unique(keys_s, return_index=True)
            bounds_ = np.append(starts, len(keys_s))
            for i, key in enumerate(uniq):
                out_k.append(key)
                out_s.append(_kmv_fold(h[bounds_[i] : bounds_[i + 1]], k).tobytes())
        return pa.table(
            {
                by: pa.array(out_k, pa.string()),
                "sketch": pa.array(out_s, pa.large_binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", concurrency=concurrency)
    nparts = default_shuffle_partitions()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[by].to_numpy(object)) % nparts
        return df

    def merge_partition(df: pd.DataFrame) -> pd.DataFrame:
        out_k: list = []
        out_n: list = []
        out_e: list = []
        for key, grp in df.groupby(by, sort=True):
            views = [np.frombuffer(s, dtype=np.uint64) for s in grp["sketch"]]
            sk = _kmv_fold(np.concatenate(views), k) if views else np.empty(0, np.uint64)
            out_k.append(key)
            out_n.append(len(sk))
            out_e.append(_kmv_estimate(sk, k))
        return pd.DataFrame(
            {by: out_k, "sketch_size": np.int64(out_n), "estimate": out_e}
        )

    return (
        parts.map_batches(add_part, batch_format="pandas")
        .repartition(nparts)
        .groupby("__part")
        .map_groups(merge_partition, batch_format="pandas")
    )


def distinct_count_by_exact(
    ds: ray.data.Dataset, col: str, by: str
) -> ray.data.Dataset:
    """Exact per-group distinct counts (the keyed-sketch anchor): local
    distinct (by, col) pairs per batch, one pair shuffle, then per-group
    pair counts summed on the key. Returns (by, distinct) rows."""
    from ray.data.aggregate import Sum

    from ..util import default_shuffle_partitions

    def local_pairs(b: pa.Table) -> pa.Table:
        t = pa.table({by: b.column(by), col: b.column(col)})
        return t.group_by([by, col]).aggregate([]).select([by, col])

    nparts = default_shuffle_partitions()
    pairs = (
        ds.map_batches(local_pairs, batch_format="pyarrow")
        .repartition(nparts)
        .groupby([by, col])
        .count()
    )

    def per_key_partial(b: pa.Table) -> pa.Table:
        keys = b.column(by).to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table(
                {by: pa.array([], pa.string()), "d": pa.array([], pa.int64())}
            )
        uniq, counts = np.unique(np.asarray(keys, dtype=object), return_counts=True)
        return pa.table(
            {
                by: pa.array(list(uniq), pa.string()),
                "d": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        pairs.map_batches(per_key_partial, batch_format="pyarrow")
        .groupby(by)
        .aggregate(Sum("d", alias_name="distinct"))
    )
