"""Distributed k-means over an embedding column — the clustering
primitive behind semantic dedup, data-mixing buckets, and IVF coarse
quantizers (functions/knn.py trains its IVF list centers with the same
broadcast-assign/partial-sum shape; this module exposes it as a
first-class operator).

Scale shape (the canonical Ray pattern):
- centroids live in ONE object-store entry per iteration (``ray.put``),
  read by every task — never re-shipped per batch;
- each iteration is a single streaming pass: map_batches computes the
  argmin assignment and emits ONE partial row per batch (k x d vector
  sums + k counts), so the driver reduce is O(num_batches), not O(rows);
- assignment is vectorized ((x - c)^2 via the \|x\|^2 - 2 x.c + \|c\|^2
  expansion — one matmul per batch).

Determinism: init takes the k rows with the SMALLEST id (bounded
per-batch partial top-k + driver merge), so runs are reproducible up to
float summation order across batches (centroids equal to ~1e-12, exact
assignments once clusters separate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .knn import _stack_embeddings


def _init_centroids(
    ds: ray.data.Dataset, k: int, vec_col: str, id_col: str
) -> np.ndarray:
    """k rows with the smallest id: per-batch partial head-k, driver merge
    of the (num_batches x k)-bounded survivors."""

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {id_col: pa.array(ids[take]), vec_col: b.column(vec_col).take(take)}
        )

    small = ds.select_columns([id_col, vec_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    tb = pa.Table.from_pylist(small.take_all())
    order = np.argsort(tb.column(id_col).to_numpy(zero_copy_only=False), kind="stable")
    m = _stack_embeddings(tb.column(vec_col))
    c = m[order[:k]].copy()
    if len(c) < k:
        # fewer rows than clusters: pad with the last row — duplicates tie
        # to the first index in argmin, stay empty, and keep position
        c = np.vstack([c, np.tile(c[-1:], (k - len(c), 1))])
    return c


def _assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    d = m @ cents.T
    d *= -2.0
    d += (cents * cents).sum(axis=1)[None, :]
    # \|x\|^2 omitted: constant per row, argmin unaffected
    return np.argmin(d, axis=1)


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Lloyd iterations; returns the (k, dim) centroid matrix. The input
    plan executes once per iteration — pass a just-read or materialized
    dataset."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    vecs = ds.select_columns([vec_col]).materialize()
    cents = _init_centroids(ds, k, vec_col, id_col)
    dim = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            m = _stack_embeddings(b.column(vec_col))
            a = _assign(m, c)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k).astype(np.float64)
            return pa.table(
                {
                    "sums": pa.array([sums.ravel()]),
                    "counts": pa.array([counts]),
                }
            )

        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.float64)
        for b in vecs.map_batches(partials, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for i in range(b.num_rows):
                sums += np.asarray(b.column("sums")[i].as_py()).reshape(k, dim)
                counts += np.asarray(b.column("counts")[i].as_py())
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]  # empty clusters keep position

    return cents


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "cluster",
) -> ray.data.Dataset:
    """Append the nearest-centroid index (streaming; centroids broadcast
    once)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        a = _assign(_stack_embeddings(b.column(vec_col)), c)
        return b.append_column(out, pa.array(a.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


def kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out: str = "cluster",
) -> ray.data.Dataset:
    """fit + assign in one call."""
    cents = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    return kmeans_assign(ds, cents, vec_col=vec_col, out=out)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (Abbas et al. 2023, arXiv:2303.09540)
# ---------------------------------------------------------------------------


def _prefix_keep(v: np.ndarray, ids: np.ndarray, threshold: float, chunk: int) -> np.ndarray:
    """Kept-id subset of one cluster under the prefix rule: row ``i`` (ids
    ascending) survives iff NO row with a smaller id has cosine >=
    ``threshold`` to it — the NOT-EXISTS contract an SQL oracle can state.
    ``v`` must be L2-normalized. Chunked (chunk x n) matmuls, never the full
    n x n matrix."""
    order = np.argsort(ids, kind="stable")
    v = v[order]
    ids_sorted = ids[order]
    n = len(ids_sorted)
    keep = np.ones(n, dtype=bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sims = v[s:e] @ v[:e].T  # rows [s,e) vs every column j < e
        # mask columns j >= i (global): the sub-block's upper triangle
        # including the diagonal
        tri = np.triu_indices(e - s)
        sims[tri[0], s + tri[1]] = -np.inf
        keep[s:e] = sims.max(axis=1, initial=-np.inf) < threshold
    return ids_sorted[keep]


def _prune_cluster(
    v: np.ndarray,
    ids: np.ndarray,
    threshold: float,
    chunk: int,
    cap: int,
    seed: int,
    depth: int = 0,
) -> list[np.ndarray]:
    """Recursive hyperplane re-split above ``cap`` (same overflow pattern as
    knn.py's LSH buckets). A split can separate a true near-dup pair
    (approximate, documented); EXACT duplicates always land on the same
    side (identical vectors -> identical projection)."""
    if len(ids) > cap and depth <= 24:
        rng = np.random.RandomState((seed + depth * 7919) & 0x7FFFFFFF)
        plane = rng.normal(size=v.shape[1])
        side = (v - v.mean(axis=0)) @ plane > 0
        if side.any() and not side.all():
            return _prune_cluster(
                v[side], ids[side], threshold, chunk, cap, seed, depth + 1
            ) + _prune_cluster(v[~side], ids[~side], threshold, chunk, cap, seed, depth + 1)
    return [_prefix_keep(v, ids, threshold, chunk)]


def semantic_dedup(
    ds: ray.data.Dataset,
    threshold: float = 0.9,
    k: int | None = None,
    iters: int = 5,
    target_cluster: int = 4096,
    cluster_row_cap: int = 65536,
    chunk: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cluster_col: bool = False,
    seed: int = 42,
) -> ray.data.Dataset:
    """SemDeDup: k-means buckets the embedding space, then each cluster is
    pruned independently — row ``i`` is dropped iff some smaller-id row in
    the SAME cluster has cosine >= ``threshold``. Returns the surviving rows
    (all input columns).

    Scale shape: ``k`` defaults to ``ceil(n / target_cluster)`` so per-group
    work stays a bounded O(cluster^2 / chunk) matmul; the cluster id is the
    ONE shuffle key (repartition-before-groupby per the block-per-input-block
    quirk); per-group matmul is the documented heavy-group exception to the
    no-map_groups rule. Clusters over ``cluster_row_cap`` re-split by random
    hyperplanes (cross-split near-dups can be missed — same approximation
    contract as minhash/LSH; exact duplicates are never missed).

    Determinism: smallest-id k-means init + prefix-keep rule make the kept
    set reproducible; with ``k=1`` the result is exactly the SQL
    ``NOT EXISTS (earlier row with cosine >= t)`` relation (gate-checked).
    """
    ds = ds.materialize()  # fit reads it twice more below (CLAUDE.md rule)
    n = ds.count()
    if n == 0:
        return ds
    if k is None:
        k = max(1, int(np.ceil(n / max(target_cluster, 1))))
    cents = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = kmeans_assign(ds, cents, vec_col=vec_col, out="__sem_cluster")

    drop_cols = [] if keep_cluster_col else ["__sem_cluster"]

    def per_cluster(df):
        import pandas as pd

        v = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        ids = df[id_col].to_numpy().astype(np.int64)
        nn = np.linalg.norm(v, axis=1)
        nn[nn == 0] = 1.0
        kept_parts = _prune_cluster(
            v / nn[:, None], ids, threshold, chunk, cluster_row_cap, seed
        )
        kept = np.concatenate(kept_parts) if kept_parts else np.array([], dtype=np.int64)
        out = df[df[id_col].isin(pd.unique(kept))]
        return out.drop(columns=drop_cols) if drop_cols else out

    from ..util import default_shuffle_partitions

    nparts = default_shuffle_partitions()
    return (
        assigned.repartition(nparts)
        .groupby("__sem_cluster")
        .map_groups(per_cluster, batch_format="pandas")
    )
