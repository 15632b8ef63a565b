"""Distributed TF-IDF keyword extraction over a document table.

Pipeline shape (the corpus-statistics idiom every curation stack needs —
same posture as decontaminate.py's broadcast n-gram set):

1. ``tokenize``: map_batches emits (doc_id, token, tf) rows — per-doc
   term frequencies; a doc is one row, so tf is complete within its
   batch (no cross-batch combine needed).
2. document frequency: (doc, token) pairs are already distinct, so a
   per-batch partial count + one small ``groupby(token).sum`` yields df
   without a distinct pass.
3. idf join: the vocabulary is broadcast (``ray.put`` once, read per
   task) below ``broadcast_cap`` rows; above it the stage falls back to
   the partitioned ``stages.merge.hash_join`` — same plan-selection rule
   as pipelines/curation.py's drop-set.
4. top-k per doc: hash-partition on doc_id and run ONE vectorized pandas
   sort + ``groupby.head(k)`` per partition (never ``map_groups`` per
   doc — CLAUDE.md high-cardinality rule).

Determinism contract (gate-checked vs DuckDB): tokens are
``[a-z0-9]+`` runs of ``text.lower()``; the score is
``tf * (N / df)`` — raw-frequency idf, NO transcendentals — computed in
that exact association order, so doubles are bit-identical to the SQL
``tf * (CAST(n AS DOUBLE) / df)``. Ties rank by token ascending.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")


def tokenize_tf(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(doc_id, token, tf) rows — one per distinct token per doc."""

    def f(b: pa.Table) -> pa.Table:
        from collections import Counter

        ids: list = []
        toks: list[str] = []
        tfs: list[int] = []
        id_vals = b.column(id_col).to_pylist()
        for i, txt in enumerate(b.column(text_col).to_pylist()):
            if not txt:
                continue
            c = Counter(t for t in _TOKEN_SPLIT.split(txt.lower()) if t)
            ids.extend([id_vals[i]] * len(c))
            toks.extend(c.keys())
            tfs.extend(c.values())
        return pa.table(
            {
                id_col: pa.array(ids, type=b.schema.field(id_col).type),
                "token": pa.array(toks, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def document_frequency(toks: ray.data.Dataset, nparts: int | None = None):
    """token -> df. (doc, token) rows are distinct by construction, so a
    per-batch combiner + small groupby-sum gives exact df with one tiny
    shuffle (repartition first — Ray groupby emits one output partition
    per input block)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("token").to_pylist()
        vals, counts = np.unique(np.asarray(t, dtype=object), return_counts=True)
        return pa.table(
            {
                "token": pa.array(list(vals), type=pa.string()),
                "df_part": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        toks.map_batches(partial, batch_format="pyarrow")
        .repartition(int(nparts or 32))
        .groupby("token")
        .aggregate(Sum("df_part", alias_name="df"))
    )


def tfidf_top_terms(
    ds: ray.data.Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_cap: int = 5_000_000,
    nparts: int = 32,
) -> ray.data.Dataset:
    """Top-``k`` terms per document by ``tf * (N / df)``. Returns
    (doc_id, token, tf, df, score) — ``score`` is bit-reproducible (no
    transcendentals, fixed association order)."""
    ds = ds.materialize()  # two consumers (count + tokenize) — CLAUDE.md rule
    n_docs = ds.count()
    toks = tokenize_tf(ds, text_col=text_col, id_col=id_col).materialize()
    # ^ two consumers below (df pass + scoring join) — materialize once
    df_tab = document_frequency(toks, nparts=nparts).materialize()

    if df_tab.count() <= broadcast_cap:
        vocab = {}
        for b in df_tab.iter_batches(batch_format="pyarrow", batch_size=65536):
            vocab.update(
                zip(b.column("token").to_pylist(), b.column("df").to_pylist())
            )
        ref = ray.put(vocab)

        def score(b: pa.Table) -> pa.Table:
            v = ray.get(ref)
            dfs = np.fromiter(
                (v[t] for t in b.column("token").to_pylist()),
                dtype=np.float64,
                count=b.num_rows,
            )
            tf = b.column("tf").to_numpy().astype(np.float64)
            s = tf * (float(n_docs) / dfs)  # association order pinned
            b = b.append_column("df", pa.array(dfs.astype(np.int64)))
            return b.append_column("score", pa.array(s))

        scored = toks.map_batches(score, batch_format="pyarrow")
    else:
        from ..stages.merge import hash_join

        joined = hash_join(toks, df_tab, on="token")

        def score_joined(b: pa.Table) -> pa.Table:
            tf = b.column("tf").to_numpy().astype(np.float64)
            dfs = b.column("df").to_numpy().astype(np.float64)
            return b.append_column(
                "score", pa.array(tf * (float(n_docs) / dfs))
            )

        scored = joined.map_batches(score_joined, batch_format="pyarrow")

    # top-k per doc: hash-partition by doc id, one vectorized pandas pass
    def add_part(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        return b.append_column(
            "__part", pa.array((ids.astype(np.uint64) % np.uint64(nparts)).astype(np.int64))
        )

    def head_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [id_col, "score", "token"], ascending=[True, False, True], kind="stable"
        )
        out = df.groupby(id_col, sort=False).head(k)
        return out.drop(columns=["__part"])

    return (
        scored.map_batches(add_part, batch_format="pyarrow")
        .repartition(nparts)
        .groupby("__part")
        .map_groups(head_k, batch_format="pandas")
    )
