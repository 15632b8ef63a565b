"""Text-analysis stages for large-scale training-data pipelines.

All stages are stateless-or-actor `map_batches` transforms over the
``documents`` table shape (doc_id, text, lang, source, n_chars). Regexes and
tables are compiled once per actor in ``__init__`` (never per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..util import default_pool

_MOD = np.uint64((1 << 61) - 1)


def with_token_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Whitespace token count + char count per row.

    ``n_tokens`` matches ``len(text.split())`` == SQL
    ``array_length(string_split_regex(trim(text), '\\s+'))`` for non-empty
    text, 0 for empty/blank.
    """

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("")
        df = df.copy()
        df["n_tokens"] = s.str.split().str.len().astype("int64")
        df["n_chars_calc"] = s.str.len().astype("int64")
        return df

    return ds.map_batches(f, batch_format="pandas")


class QualityScorer:
    """Actor stage: cheap quality features (length / stopword / punct /
    mean-token-length ratios). Tables compiled once per actor."""

    STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"\S+")
        self.stop = set(self.STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("").reset_index(drop=True)
        toks = s.str.split()
        n = toks.str.len().astype("int64")
        # vectorized over the exploded token frame (C-level isin/str.len +
        # groupby-sum), no per-row Python lambdas on the hot text path
        ex = toks.explode()
        stop_hits = (
            ex.isin(self.stop).groupby(level=0).sum().reindex(s.index, fill_value=0).astype("int64")
        )
        total_len = ex.str.len().groupby(level=0).sum().reindex(s.index, fill_value=0.0)
        df = df.copy()
        df["n_tokens"] = n.values
        df["stopword_count"] = stop_hits.values
        df["mean_token_len"] = np.where(n.values > 0, total_len.values / n.clip(lower=1).values, 0.0)
        df["quality_ok"] = (n.values >= 10) & (stop_hits.values / n.clip(lower=1).values < 0.5)
        return df


def with_quality(ds: ray.data.Dataset, text_col: str = "text", concurrency=None) -> ray.data.Dataset:
    return ds.map_batches(
        QualityScorer,
        batch_format="pandas",
        fn_constructor_kwargs=dict(text_col=text_col),
        concurrency=default_pool(concurrency),
    )


class LangId:
    """Actor stage: n-gram/stopword-profile language heuristic.

    Profiles are tiny hand-rolled function-word sets (public knowledge);
    output is deterministic; this is the plumbing pattern for a real
    fastText-style model (load once per actor)."""

    PROFILES = {
        "en": {"the", "and", "of", "is", "to", "in", "that", "it"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein"},
        "fr": {"le", "la", "les", "et", "est", "une", "que"},
        "es": {"el", "la", "los", "y", "es", "una", "que", "de"},
        "zh": set(),  # non-latin scripts detected by codepoint range below
    }

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = {k: sorted(v) for k, v in sorted(self.PROFILES.items()) if v}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized: explode the first 200 lowercase tokens per row, count
        DISTINCT profile hits per (row, lang) with C-level isin + groupby,
        pick the alphabetically-first language with the max hit count
        (>0, else 'und'); CJK-codepoint rows short-circuit to 'zh'."""
        s = df[self.text_col].fillna("").reset_index(drop=True)
        zh = s.str.slice(0, 200).str.contains("[一-鿿]", regex=True)
        ex = s.str.lower().str.split().explode().dropna()
        if len(ex):
            pos = ex.groupby(level=0).cumcount()
            ex = ex[pos < 200]
            pairs = ex.reset_index()
            pairs.columns = ["row", "tok"]
            pairs = pairs.drop_duplicates()  # set() semantics per row
        else:
            pairs = pd.DataFrame({"row": pd.Series(dtype=np.int64), "tok": pd.Series(dtype=object)})
        counts = pd.DataFrame(index=s.index)
        for lang, prof in self.profiles.items():
            hit = pairs[pairs["tok"].isin(prof)].groupby("row").size()
            counts[lang] = hit.reindex(s.index, fill_value=0).astype("int64")
        best = counts.idxmax(axis=1)  # first (alphabetical) max, column order = sorted langs
        best = best.where(counts.max(axis=1) > 0, "und")
        best = best.where(~zh, "zh")
        df = df.copy()
        df[self.out_col] = best.values
        return df


def with_langid(ds: ray.data.Dataset, concurrency=None, **kw) -> ray.data.Dataset:
    return ds.map_batches(LangId, batch_format="pandas", fn_constructor_kwargs=kw, concurrency=default_pool(concurrency))


def _poly_hash_codes(codes: np.ndarray, base: np.uint64 = np.uint64(1099511628211)) -> np.uint64:
    h = np.uint64(1469598103934665603)
    for c in codes:  # bounded by text length; vectorize per-batch below
        h = (h * base + np.uint64(c)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return h


def with_fingerprint(ds: ray.data.Dataset, text_col: str = "text", out_col: str = "fingerprint") -> ray.data.Dataset:
    """Deterministic 64-bit FNV-style rolling hash per document (document
    fingerprinting; vectorized over the batch's concatenated byte buffer)."""

    def f(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        n = len(texts)
        base = np.uint64(1099511628211)
        h0 = np.uint64(1469598103934665603)
        max_len = max((len((t or "").encode("utf-8")) for t in texts), default=0)
        out = np.empty(n, dtype=np.uint64)
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the hash
            # powers of base mod 2^64 (uint64 wraps), highest first
            pows = np.empty(max_len + 1, dtype=np.uint64)
            pows[0] = 1
            for k in range(1, max_len + 1):
                pows[k] = pows[k - 1] * base
            for i, t in enumerate(texts):
                data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                L = len(data)
                # h0*base^L + sum(data[i]*base^(L-1-i)), all mod 2^64
                out[i] = h0 * pows[L] + (data * pows[L - 1 :: -1]).sum() if L else h0
        return b.append_column(out_col, pa.array(out.astype(np.int64)))

    return ds.map_batches(f, batch_format="pyarrow")


BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


class BpeTokenCounter:
    """Actor stage: GPT-2-style pre-tokenizer token count (the brief's
    "BPE-ish regex"). The pattern is the public GPT-2 split regex with the
    \\p{L}/\\p{N} classes narrowed to ASCII and the trailing-space
    lookahead dropped, keeping it RE2-compatible so a DuckDB
    regexp_extract_all oracle counts identically (verified row-exact).
    A real BPE merge table would consume these pieces; the SPLIT is the
    deterministic, oracle-checkable part. Regex compiled once per actor."""

    def __init__(self, text_col: str = "text", out: str = "n_bpe_tokens"):
        import re

        self.rx = re.compile(BPE_SPLIT_PATTERN)
        self.text_col = text_col
        self.out = out

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        s = df[self.text_col].fillna("")
        df = df.copy()
        # Series.str.count is a C-level loop over the compiled pattern
        df[self.out] = s.str.count(BPE_SPLIT_PATTERN).astype("int64")
        return df


def with_bpe_tokens(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    from ..util import default_pool

    return ds.map_batches(
        BpeTokenCounter,
        batch_format="pandas",
        concurrency=default_pool(),
        fn_constructor_kwargs=dict(text_col=text_col),
    )


def with_repetition_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    """Gopher/C4-style repetition + line-quality signals per document.

    Adds integer columns (all exactly reproducible in SQL, which is what
    lets the `repetition_stats` query carry a hash-exact DuckDB oracle):

    - ``n_lines``              lines after splitting on ``\\n``
    - ``n_dup_lines``          line instances beyond the first occurrence
    - ``n_dup_line_chars``     characters in those duplicate instances
    - ``n_nonterminal_lines``  lines not ending in ``. ! ? "`` (C4 rule)
    - ``n_bigrams``            adjacent whitespace-token pairs
    - ``top_bigram_count``     occurrences of the most frequent bigram
                               (Gopher top-2gram repetition signal)

    Entirely vectorized: exploded-frame groupbys (C-level), no per-row
    Python. Filter fractions (dup_line_frac = n_dup_lines / n_lines,
    top_bigram_frac = top_bigram_count / n_bigrams) are one arithmetic
    column away; the stage emits the integer numerators/denominators so
    the oracle comparison stays bit-exact.
    """

    def f(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col].fillna("").reset_index(drop=True)
        out = df.copy()

        # line stats: explode split lines, count per (row, line)
        ex = s.str.split("\n").explode()
        lf = pd.DataFrame({"row": ex.index.values, "line": ex.values})
        g = lf.groupby(["row", "line"], sort=False).size().reset_index(name="c")
        per_row = g.groupby("row")["c"].agg(n_lines="sum", n_distinct="size")
        dup_chars = ((g["c"] - 1) * g["line"].str.len()).groupby(g["row"]).sum()
        nonterm = (~lf["line"].str.endswith((".", "!", "?", '"'))).groupby(lf["row"]).sum()

        def col(v, fill=0):
            return v.reindex(s.index, fill_value=fill).astype("int64").values

        out["n_lines"] = col(per_row["n_lines"])
        out["n_dup_lines"] = col(per_row["n_lines"] - per_row["n_distinct"])
        out["n_dup_line_chars"] = col(dup_chars)
        out["n_nonterminal_lines"] = col(nonterm)

        # bigram stats: explode whitespace tokens, pair each with the next
        # token of the SAME row (groupby shift), count per (row, pair)
        tex = s.str.split().explode().dropna()
        nxt = tex.groupby(level=0).shift(-1)
        mask = nxt.notna()
        big = tex[mask] + "\x01" + nxt[mask]
        bf = pd.DataFrame({"row": big.index.values, "bg": big.values})
        bc = bf.groupby(["row", "bg"], sort=False).size()
        out["n_bigrams"] = col(bf.groupby("row").size())
        out["top_bigram_count"] = col(bc.groupby(level=0).max())
        return out

    return ds.map_batches(f, batch_format="pandas")


# --- PII scrubbing (training-data hygiene) ---------------------------------

# RE2 syntax on purpose: pyarrow's re2-backed kernels and DuckDB's re2
# regexp_replace give IDENTICAL semantics, which is what lets the
# pii_scrub query carry a hash-exact SQL oracle.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
)


def with_pii_scrub(
    ds: ray.data.Dataset, text_col: str = "text", out: str = "text_scrubbed"
) -> ray.data.Dataset:
    """Mask emails / IPv4s / E.164-ish phone numbers and count each class.

    Entirely pyarrow.compute (re2, C++): count_substring_regex for the
    per-class counts, replace_substring_regex chained in PII_PATTERNS order
    (email before ip so `user@10.0.0.1`-style strings scrub as one email,
    matching the SQL oracle's nesting). No Python touches a row."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(text_col), pa.large_string())
        for name, pat, repl in PII_PATTERNS:
            b = b.append_column(
                "n_" + name, pc.cast(pc.count_substring_regex(s, pat), pa.int64())
            )
        for name, pat, repl in PII_PATTERNS:
            s = pc.replace_substring_regex(s, pat, repl)
        return b.append_column(out, s)

    return ds.map_batches(f, batch_format="pyarrow")
