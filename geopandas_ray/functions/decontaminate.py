"""Benchmark decontamination for training corpora.

The standard LLM-data hygiene step (public practice since GPT-2/GPT-3 data
work): flag training documents that share word n-grams with an evaluation
benchmark so they can be dropped before training. Ray-Data shape:

- the benchmark side is SMALL by definition (eval sets) -> its distinct
  n-gram set is collected once, `ray.put` once, and read by every actor in
  its constructor (never re-shipped per batch);
- the corpus side STREAMS through a stateless-per-batch `map_batches` with
  vectorized n-gram extraction (exploded-token frame + per-row shift-join,
  C-level pandas isin against the broadcast set).

Counting is per DISTINCT matching n-gram per document (a repeated leaked
n-gram counts once), which keeps the metric SQL-reproducible for the
`decontaminate` correctness query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..util import default_pool

_SEP = "\x01"


def _doc_ngrams(s: pd.Series, n: int) -> pd.DataFrame:
    """(row, gram) frame of word n-grams per text row; vectorized: explode
    tokens, then n-1 groupby-shifts joined with a separator."""
    ex = s.str.split().explode().dropna()
    if not len(ex):
        return pd.DataFrame({"row": pd.Series(dtype=np.int64), "gram": pd.Series(dtype=object)})
    parts = [ex]
    g = ex.groupby(level=0)
    for k in range(1, n):
        parts.append(g.shift(-k))
    mask = parts[-1].notna()
    gram = parts[0][mask]
    for p in parts[1:]:
        gram = gram + _SEP + p[mask]
    return pd.DataFrame({"row": gram.index.values, "gram": gram.values})


def benchmark_ngram_set(texts, n: int = 3) -> np.ndarray:
    """Distinct word n-grams of a benchmark corpus (object ndarray of
    separator-joined token tuples)."""
    s = pd.Series(list(texts), dtype=object).fillna("")
    f = _doc_ngrams(s, n)
    return f["gram"].drop_duplicates().to_numpy()


class _ContaminationFlagger:
    """Actor stage: benchmark n-gram set fetched from the object store once
    per actor; per batch counts DISTINCT matching n-grams per document."""

    def __init__(self, bench_ref, n: int, text_col: str, prefix: str):
        bench = ray.get(bench_ref) if not isinstance(bench_ref, np.ndarray) else bench_ref
        self.bench = pd.Index(bench)  # hash-table membership, built once
        self.n = n
        self.text_col = text_col
        self.prefix = prefix

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("").reset_index(drop=True)
        f = _doc_ngrams(s, self.n).drop_duplicates()  # distinct per (row, gram)
        hit = f[f["gram"].isin(self.bench)]
        cnt = hit.groupby("row").size().reindex(s.index, fill_value=0).astype("int64")
        out = df.copy()
        out[f"n_{self.prefix}_ngrams"] = cnt.values
        out[self.prefix] = cnt.values > 0
        return out


def flag_contaminated(
    ds: ray.data.Dataset,
    benchmark_texts,
    n: int = 3,
    text_col: str = "text",
    prefix: str = "contaminated",
    concurrency=None,
) -> ray.data.Dataset:
    """Append ``n_contaminated_ngrams`` (distinct benchmark n-grams present)
    and ``contaminated`` (any hit) to every document row.

    ``benchmark_texts``: iterable of benchmark strings (small side). The
    derived n-gram set is broadcast via ``ray.put`` exactly once.
    """
    bench = benchmark_ngram_set(benchmark_texts, n=n)
    bench_ref = ray.put(bench)
    return ds.map_batches(
        _ContaminationFlagger,
        batch_format="pandas",
        fn_constructor_kwargs=dict(bench_ref=bench_ref, n=n, text_col=text_col, prefix=prefix),
        concurrency=default_pool(concurrency),
    )
