"""Distributed TF-IDF (functions/tfidf.py): tokenizer determinism, df
exactness, score bit-parity with DuckDB, top-k tie-breaks, broadcast vs
hash-join plan equivalence."""
from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from geopandas_ray.functions.tfidf import (
    document_frequency,
    tfidf_top_terms,
    tokenize_tf,
)

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog ate the cat food"),
    (2, "Cats and Dogs! cats & dogs?"),
    (3, ""),  # empty doc contributes nothing
    (4, "unique-token appears once"),
]


def _ds():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in DOCS]),
        "text": pa.array([d[1] for d in DOCS]),
    }))


def test_tokenize_and_df():
    toks = tokenize_tf(_ds()).to_pandas()
    row = toks[(toks.doc_id == 0) & (toks.token == "the")]
    assert row.tf.tolist() == [2]
    # punctuation/case fold: doc 2 has cats x2, dogs x2
    d2 = toks[toks.doc_id == 2].set_index("token").tf
    assert d2["cats"] == 2 and d2["dogs"] == 2 and d2["and"] == 1
    assert (toks.doc_id != 3).all()
    df = document_frequency(
        tokenize_tf(_ds()).materialize(), nparts=4
    ).to_pandas().set_index("token")["df"]
    assert df["the"] == 2 and df["cat"] == 2 and df["unique"] == 1


def _oracle(k):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in [(d[0], d[1].replace("'", "''")) for d in DOCS])
        + ") AS v(doc_id, text)"
    )
    return con.execute(
        "WITH toks AS (SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS tf"
        " FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t"
        " FROM documents) u WHERE t <> '' GROUP BY doc_id, t),"
        " dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY token),"
        " nn AS (SELECT count(*) AS n FROM documents),"
        " scored AS (SELECT toks.doc_id, toks.token, toks.tf, dfr.df,"
        " toks.tf * (CAST(nn.n AS DOUBLE) / dfr.df) AS score"
        " FROM toks JOIN dfr ON toks.token = dfr.token CROSS JOIN nn),"
        " ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id"
        " ORDER BY score DESC, token ASC) AS rk FROM scored)"
        f" SELECT doc_id, token, tf, df, score FROM ranked WHERE rk <= {k}"
        " ORDER BY doc_id, token"
    ).df()


def _norm(df):
    return df.sort_values(["doc_id", "token"]).reset_index(drop=True)


def test_top_terms_matches_duckdb_bit_exact():
    ours = _norm(tfidf_top_terms(_ds(), k=3, nparts=4).to_pandas())
    orc = _norm(_oracle(3))
    assert len(ours) == len(orc)
    assert ours.doc_id.tolist() == orc.doc_id.tolist()
    assert ours.token.tolist() == orc.token.tolist()
    assert ours.tf.tolist() == orc.tf.tolist()
    assert ours.df.tolist() == orc.df.tolist()
    # doubles bit-identical: no transcendentals, pinned association order
    assert np.array_equal(ours.score.values, orc.score.values)


def test_hash_join_plan_equivalent():
    a = _norm(tfidf_top_terms(_ds(), k=3, nparts=4).to_pandas())
    b = _norm(
        tfidf_top_terms(_ds(), k=3, nparts=4, broadcast_cap=0).to_pandas()
    )
    assert a.token.tolist() == b.token.tolist()
    assert np.array_equal(a.score.values, b.score.values)
