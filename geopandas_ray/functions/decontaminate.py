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


# ---------------------------------------------------------------------------
# Bloom-filter scale path (Bloom 1970): when the benchmark n-gram set is
# large (many eval suites x n-gram orders), broadcast ~10 bits per n-gram
# instead of the strings themselves. False POSITIVES only (over-removal —
# the safe direction for decontamination); never false negatives.
# ---------------------------------------------------------------------------

_BLOOM_KEY2 = "fedcba9876543210"  # second fixed SipHash key for double hashing


def _bloom_hashes(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(v).astype(np.uint64)
    h2 = pd.util.hash_array(v, hash_key=_BLOOM_KEY2).astype(np.uint64)
    h2 = h2 | np.uint64(1)  # odd step so probes cover the table
    return h1, h2


def build_bloom(values, fp_rate: float = 1e-4) -> dict:
    """Bloom filter over an iterable of hashable values: double hashing
    (Kirsch-Mitzenmatcher) over two fixed-key SipHashes, sized for
    ``fp_rate`` at len(values). Returns {'bits': uint64 array, 'm', 'h',
    'n'} — broadcast it with one ray.put."""
    vals = np.asarray(list(values), dtype=object)
    n = max(len(vals), 1)
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2.0) ** 2)))
    m = max(64, (m + 63) // 64 * 64)
    h = max(1, int(round(m / n * np.log(2.0))))
    bits = np.zeros(m // 64, dtype=np.uint64)
    if len(vals):
        h1, h2 = _bloom_hashes(vals)
        for i in range(h):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(bits, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
    return {"bits": bits, "m": m, "h": h, "n": len(vals)}


def bloom_contains(bloom: dict, values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (FP rate as
    sized), False = definitely absent."""
    if not len(values):
        return np.zeros(0, dtype=bool)
    bits, m, h = bloom["bits"], np.uint64(bloom["m"]), bloom["h"]
    h1, h2 = _bloom_hashes(values)
    out = np.ones(len(values), dtype=bool)
    for i in range(h):
        idx = (h1 + np.uint64(i) * h2) % m
        word = bits[(idx >> np.uint64(6)).astype(np.int64)]
        out &= (word >> (idx & np.uint64(63))) & np.uint64(1) != 0
    return out


class _BloomContaminationFlagger:
    """Actor stage: the bloom filter fetched once per actor; per batch
    counts DISTINCT possibly-matching n-grams per document."""

    def __init__(self, bloom_ref, n: int, text_col: str, prefix: str):
        self.bloom = ray.get(bloom_ref) if not isinstance(bloom_ref, dict) else bloom_ref
        self.n = n
        self.text_col = text_col
        self.prefix = prefix

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("").reset_index(drop=True)
        f = _doc_ngrams(s, self.n).drop_duplicates()
        if len(f):
            hitmask = bloom_contains(self.bloom, f["gram"].to_numpy())
            hit = f[hitmask]
        else:
            hit = f
        cnt = hit.groupby("row").size().reindex(s.index, fill_value=0).astype("int64")
        out = df.copy()
        out[f"n_{self.prefix}_ngrams"] = cnt.values
        out[self.prefix] = cnt.values > 0
        return out


def flag_contaminated_bloom(
    ds: ray.data.Dataset,
    benchmark_texts,
    n: int = 3,
    text_col: str = "text",
    prefix: str = "contaminated",
    fp_rate: float = 1e-4,
    concurrency=None,
) -> ray.data.Dataset:
    """Bloom-filter variant of flag_contaminated: the broadcast payload is
    ~-log2(fp_rate)*1.44 bits per benchmark n-gram instead of the n-gram
    strings (~10 bits vs ~200+ at fp_rate=1e-4). Flags are a SUPERSET of
    the exact path's (false positives over-remove at the sized rate;
    never false negatives)."""
    bloom = build_bloom(benchmark_ngram_set(benchmark_texts, n=n), fp_rate=fp_rate)
    bloom_ref = ray.put(bloom)
    return ds.map_batches(
        _BloomContaminationFlagger,
        batch_format="pandas",
        fn_constructor_kwargs=dict(
            bloom_ref=bloom_ref, n=n, text_col=text_col, prefix=prefix
        ),
        concurrency=default_pool(concurrency),
    )
