"""End-to-end training-data curation pipeline.

Composes the engine's text-hygiene stages into the canonical corpus-prep
flow (public practice: CCNet / Gopher / GPT-3 data work):

    language-ID -> quality filter -> PII scrub -> exact dedup
      -> benchmark decontamination -> (optional) MinHash near-dup removal

Every stage is a streaming map_batches / bounded-shuffle transform, so the
pipeline runs at corpus scale end to end. With ``near_dup=False`` the flow
is fully deterministic and SQL-expressible — the `curation` correctness
query runs it hash-exact against a DuckDB oracle; near-dup removal is
approximate by construction (MinHash banding) and therefore optional.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.dedup import cluster_min_label, exact_dedup, minhash_candidate_pairs
from ..functions.decontaminate import flag_contaminated
from ..functions.text import with_langid, with_pii_scrub, with_quality


def curate(
    ds: ray.data.Dataset,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_stop_ratio: float = 0.5,
    benchmark_texts=None,
    decontaminate_n: int = 3,
    near_dup: bool = False,
    near_dup_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    drop_broadcast_cap: int = 5_000_000,
) -> ray.data.Dataset:
    """Curated corpus: rows surviving every hygiene gate, ``text`` replaced
    by the PII-scrubbed form, one row (min id) per distinct scrubbed text.

    Column contract: input needs (id_col, text_col); output keeps
    (id_col, text_col, lang_pred, n_tokens).
    """
    lang_set = set(langs)

    ds = with_langid(ds, text_col=text_col)
    ds = with_quality(ds, text_col=text_col)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_tokens"].to_numpy()
        sw = df["stopword_count"].to_numpy()
        keep = (
            df["lang_pred"].isin(lang_set).to_numpy()
            & (n >= min_tokens)
            & (sw < max_stop_ratio * np.maximum(n, 1))
        )
        return df[keep]

    ds = ds.map_batches(gate, batch_format="pandas")

    # PII scrub: the scrubbed text BECOMES the text (training never sees raw)
    ds = with_pii_scrub(ds, text_col=text_col)

    def adopt_scrub(b: pa.Table) -> pa.Table:
        b = b.drop_columns([text_col, "n_email", "n_ip", "n_phone"])
        return b.rename_columns(
            [text_col if c == "text_scrubbed" else c for c in b.column_names]
        )

    ds = ds.map_batches(adopt_scrub, batch_format="pyarrow")

    ds = exact_dedup(ds, key_col=text_col, id_col=id_col)

    if benchmark_texts is not None:
        ds = flag_contaminated(ds, benchmark_texts, n=decontaminate_n, text_col=text_col)

        def drop_leaks(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = b.filter(pc.invert(b.column("contaminated")))
            return b.drop_columns(["contaminated", "n_contaminated_ngrams"])

        ds = ds.map_batches(drop_leaks, batch_format="pyarrow")

    if near_dup:
        # approximate: MinHash-LSH candidate pairs -> connected components ->
        # keep the minimum id of each near-dup cluster
        pairs = minhash_candidate_pairs(ds, sim_threshold=near_dup_threshold)
        labels = cluster_min_label(pairs, ds)  # (doc_id, cluster) per doc

        def dup_rows(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # docs that are NOT their cluster's minimum: the DROP set —
            # bounded by near-dup volume, unlike the keep set (≈ corpus)
            return b.filter(pc.invert(pc.equal(b.column(id_col), b.column("cluster"))))

        drop_ids = labels.map_batches(dup_rows, batch_format="pyarrow").select_columns([id_col])
        drop_ids = drop_ids.materialize()  # counted AND consumed
        if drop_ids.count() <= drop_broadcast_cap:
            # small drop set: one driver pull + ray.put broadcast, stateless
            # C-level isin per batch (typical near-dup volume)
            drop = set(r[id_col] for r in drop_ids.take_all())
            drop_ref = ray.put(drop)

            class _DropDups:
                def __init__(self, ref):
                    self.drop = ray.get(ref) if not isinstance(ref, set) else ref

                def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                    return df[~df[id_col].isin(self.drop)]

            from ..util import default_pool

            ds = ds.map_batches(
                _DropDups, batch_format="pandas", fn_constructor_kwargs=dict(ref=drop_ref),
                concurrency=default_pool(None),
            )
        else:
            # huge duplicate volume (boilerplate-heavy crawl): distributed
            # hash-partitioned anti-join — the drop set never lands on the
            # driver or in one object
            from ..util import default_shuffle_partitions

            nparts = default_shuffle_partitions()
            keep_cols = ds.schema().names

            def tag(side):
                def f(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.copy()
                    for c in keep_cols:  # pad the id-only side to one schema
                        if c not in df.columns:
                            df[c] = None
                    df = df[keep_cols]
                    # same hardening as merge.hash_join: an object-dtype id
                    # block (zero-row upstream upcast) hashes differently
                    # from int64, silently splitting matches across parts
                    df[id_col] = df[id_col].infer_objects()
                    df["__m"] = np.int8(side)
                    df["__part"] = pd.util.hash_array(df[id_col].to_numpy()) % nparts
                    return df

                return f

            def anti(df: pd.DataFrame) -> pd.DataFrame:
                bad = df.loc[df["__m"] == 1, id_col].unique()
                out = df[(df["__m"] == 0) & (~df[id_col].isin(bad))]
                return out[keep_cols]

            ds = (
                ds.map_batches(tag(0), batch_format="pandas")
                .union(drop_ids.map_batches(tag(1), batch_format="pandas"))
                .repartition(nparts)
                .groupby("__part")
                .map_groups(anti, batch_format="pandas")
            )

    def project(b: pa.Table) -> pa.Table:
        return b.select([id_col, text_col, "lang_pred", "n_tokens"])

    return ds.map_batches(project, batch_format="pyarrow")
