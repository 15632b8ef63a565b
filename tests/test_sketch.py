import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.functions.sketch import (
    _hash_values,
    _hll_estimate,
    _hll_fold,
    _kmv_estimate,
    _kmv_fold,
    distinct_count_exact,
    hll_distinct,
    kmv_distinct,
    vocab_stats,
)


def _token_ds(n_distinct, repeats=3, nblocks=4):
    toks = [f"tok{i:06d}" for i in range(n_distinct)] * repeats
    return ray.data.from_arrow(
        pa.table({"token": pa.array(toks, pa.string())})
    ).repartition(nblocks)


def test_kmv_merge_equals_whole():
    # sketch(merge of parts) == sketch(whole): the mergeability contract
    rng = np.random.RandomState(3)
    vals = np.array([f"v{i}" for i in rng.randint(0, 5000, size=20000)], dtype=object)
    h = _hash_values(vals)
    whole = _kmv_fold(h, 256)
    parts = [_kmv_fold(h[i::5], 256) for i in range(5)]
    merged = _kmv_fold(np.concatenate(parts), 256)
    assert np.array_equal(whole, merged)


def test_hll_merge_equals_whole():
    rng = np.random.RandomState(4)
    vals = np.array([f"v{i}" for i in rng.randint(0, 5000, size=20000)], dtype=object)
    h = _hash_values(vals)
    whole = _hll_fold(h, 10)
    merged = np.zeros(1 << 10, dtype=np.uint8)
    for i in range(5):
        merged = np.maximum(merged, _hll_fold(h[i::5], 10))
    assert np.array_equal(whole, merged)


def test_kmv_exact_below_k():
    ds = _token_ds(100)
    t = kmv_distinct(ds, "token", k=1024)
    assert t.column("estimate")[0].as_py() == 100.0
    assert t.column("sketch_size")[0].as_py() == 100


def test_estimates_within_error_bounds():
    n = 20_000
    ds = _token_ds(n, repeats=2, nblocks=6)
    kmv = kmv_distinct(ds, "token", k=1024).column("estimate")[0].as_py()
    hll = hll_distinct(ds, "token", p=12).column("estimate")[0].as_py()
    # theory: kmv ~1/sqrt(k)=3.1%, hll ~1.04/sqrt(2^12)=1.6%; generous margins
    assert abs(kmv - n) / n < 0.15, kmv
    assert abs(hll - n) / n < 0.08, hll
    # determinism: same input -> bit-identical estimates
    assert kmv == kmv_distinct(ds, "token", k=1024).column("estimate")[0].as_py()
    assert hll == hll_distinct(ds, "token", p=12).column("estimate")[0].as_py()


def test_distinct_count_exact():
    assert distinct_count_exact(_token_ds(777, repeats=4), "token") == 777


def test_hll_estimate_edge_cases():
    # empty registers -> linear counting of m/m -> 0
    assert _hll_estimate(np.zeros(16, dtype=np.uint8)) == 0.0
    # kmv of empty sketch
    assert _kmv_estimate(np.empty(0, np.uint64), 16) == 0.0
    with pytest.raises(ValueError, match="p must be"):
        from geopandas_ray.functions.sketch import hll_partials

        hll_partials(_token_ds(10), "token", p=2)


def test_vocab_stats_small():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["the cat the dog", "Cat! and fish-42", ""], pa.string()
                ),
            }
        )
    )
    t = vocab_stats(docs)
    # tokens: doc0 {the(x2), cat, dog}, doc1 {cat, and, fish, 42}
    assert t.column("distinct_tokens")[0].as_py() == 6  # the cat dog and fish 42
    assert t.column("total_tokens")[0].as_py() == 8


def test_int_quantiles_matches_duckdb():
    import duckdb

    rng = np.random.RandomState(9)
    vals = rng.randint(0, 60, size=1234)
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.int64())})
    ).repartition(5)
    from geopandas_ray.functions.sketch import int_quantiles

    got = int_quantiles(ds, "v", (0.0, 0.25, 0.5, 0.9, 0.99, 1.0))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (SELECT unnest(?) AS v)", [vals.tolist()]
    )
    for q, v in zip(got.column("q").to_pylist(), got.column("value").to_pylist()):
        dd = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert v == dd, (q, v, dd)


def test_int_quantiles_negative_raises():
    ds = ray.data.from_arrow(pa.table({"v": pa.array([1, -2, 3], pa.int64())}))
    from geopandas_ray.functions.sketch import int_quantiles

    with pytest.raises(Exception, match="non-negative"):
        int_quantiles(ds, "v")


def _zipf_ds(rng, n=30000, vocab=3000, nblocks=6):
    ranks = rng.zipf(1.3, size=n * 2)
    ranks = ranks[ranks <= vocab][:n]
    toks = np.array([f"w{r:05d}" for r in ranks], dtype=object)
    return toks, ray.data.from_arrow(
        pa.table({"token": pa.array(list(toks), pa.string())})
    ).repartition(nblocks)


def test_heavy_hitters_guarantees():
    from geopandas_ray.functions.sketch import heavy_hitters

    rng = np.random.RandomState(11)
    toks, ds = _zipf_ds(rng)
    cap = 256
    hh = heavy_hitters(ds, "token", k=30, capacity=cap).to_pandas()
    vals, cnts = np.unique(toks, return_counts=True)
    true = dict(zip(vals, cnts))
    n = len(toks)
    bound = n // cap
    assert (hh.max_undercount == bound).all() and (hh.n == n).all()
    # every reported min_count is a valid underestimate within the bound
    for v, mc in zip(hh.value, hh.min_count):
        assert mc <= true[v] <= mc + bound, (v, mc, true[v])
    # every TRUE heavy hitter (freq > n/capacity) must be present
    heavy = {v for v, c in true.items() if c > bound}
    assert heavy <= set(hh.value), heavy - set(hh.value)


def test_heavy_hitters_exact_below_capacity():
    from geopandas_ray.functions.sketch import heavy_hitters, top_values_exact

    rng = np.random.RandomState(12)
    toks, ds = _zipf_ds(rng, n=5000, vocab=200)
    hh = heavy_hitters(ds, "token", k=15, capacity=1024).to_pandas()
    exact = top_values_exact(ds, "token", k=15).to_pandas()
    assert hh.value.tolist() == exact.value.tolist()
    assert hh.min_count.tolist() == exact["count"].tolist()


def test_top_values_exact_matches_numpy():
    from geopandas_ray.functions.sketch import top_values_exact

    rng = np.random.RandomState(13)
    toks, ds = _zipf_ds(rng, n=8000, vocab=500)
    got = top_values_exact(ds, "token", k=12).to_pandas()
    vals, cnts = np.unique(toks, return_counts=True)
    order = np.lexsort((vals, -cnts))[:12]
    assert got.value.tolist() == list(vals[order])
    assert got["count"].tolist() == list(cnts[order].astype(int))


def test_kmv_distinct_by_exact_and_estimating():
    from geopandas_ray.functions.sketch import distinct_count_by_exact, kmv_distinct_by

    rng = np.random.RandomState(21)
    langs = np.array(["en", "de", "fr"], dtype=object)[rng.randint(0, 3, size=12000)]
    toks = np.array(
        [f"{l}_w{v}" for l, v in zip(langs, rng.randint(0, 900, size=12000))],
        dtype=object,
    )
    ds = ray.data.from_arrow(
        pa.table(
            {"lang": pa.array(list(langs), pa.string()), "token": pa.array(list(toks), pa.string())}
        )
    ).repartition(5)
    exact = (
        distinct_count_by_exact(ds, "token", "lang")
        .to_pandas()
        .set_index("lang")["distinct"]
    )
    truth = {
        l: len(np.unique(toks[langs == l])) for l in ("en", "de", "fr")
    }
    assert exact.to_dict() == truth
    # below-k regime: estimate equals exact
    sk = kmv_distinct_by(ds, "token", "lang", k=4096).to_pandas().set_index("lang")
    for l in truth:
        assert sk.loc[l, "estimate"] == float(truth[l])
    # estimating regime: within KMV error bounds (k=128 -> ~9% theory)
    sk2 = kmv_distinct_by(ds, "token", "lang", k=128).to_pandas().set_index("lang")
    for l in truth:
        assert abs(sk2.loc[l, "estimate"] - truth[l]) / truth[l] < 0.3, (
            l,
            sk2.loc[l, "estimate"],
            truth[l],
        )


def test_bloom_filter_properties():
    from geopandas_ray.functions.decontaminate import bloom_contains, build_bloom

    vals = np.array([f"gram{i}" for i in range(20_000)], dtype=object)
    b = build_bloom(vals, fp_rate=1e-4)
    assert bloom_contains(b, vals).all()  # never a false negative
    neg = np.array([f"other{i}" for i in range(100_000)], dtype=object)
    assert bloom_contains(b, neg).mean() < 1e-3  # sized 1e-4, margin 10x
    b2 = build_bloom(vals, fp_rate=1e-4)
    assert np.array_equal(b["bits"], b2["bits"])  # deterministic
    # empty filter rejects everything; empty probe returns empty
    be = build_bloom([], fp_rate=1e-4)
    assert not bloom_contains(be, neg[:50]).any()
    assert len(bloom_contains(b, np.empty(0, object))) == 0


def test_flag_contaminated_bloom_superset_of_exact():
    import pandas as pd

    from geopandas_ray.functions.decontaminate import (
        flag_contaminated,
        flag_contaminated_bloom,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a completely unrelated sentence about spark and ray",
        "the quick brown fox eats grapes all day long",
        "nothing in common here at all friends",
    ]
    bench = ["quick brown fox jumps over"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).materialize()
    e = flag_contaminated(ds, bench, n=3).to_pandas().set_index("doc_id")
    bl = flag_contaminated_bloom(ds, bench, n=3).to_pandas().set_index("doc_id")
    assert e.contaminated.tolist() == [True, False, True, False]
    # superset (here: equal — 3 benchmark 3-grams can't realistically FP)
    assert (bl.contaminated | ~e.contaminated).all()
    assert (bl.n_contaminated_ngrams >= e.n_contaminated_ngrams).all()


def test_sketch_partials_persist_and_merge_incrementally(tmp_path):
    # the incremental-corpus story: per-batch partials persist to parquet,
    # a later session reads BOTH corpora's partials back and merges — the
    # estimate equals sketching the union directly (no recompute)
    from geopandas_ray.functions.sketch import (
        _kmv_estimate,
        _kmv_fold,
        _kmv_merge_block,
        kmv_distinct,
        kmv_partials,
    )

    a = _token_ds(900, repeats=2, nblocks=3)
    b_vals = [f"tok{i:06d}" for i in range(600, 1500)] * 2  # overlaps a
    b = ray.data.from_arrow(
        pa.table({"token": pa.array(b_vals, pa.string())})
    ).repartition(3)
    k = 4096  # below-k regime -> exact, so equality is checkable
    pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
    kmv_partials(a, "token", k=k).write_parquet(pa_dir)
    kmv_partials(b, "token", k=k).write_parquet(pb_dir)
    merged_rows = ray.data.read_parquet(pa_dir).union(
        ray.data.read_parquet(pb_dir)
    )
    final = _kmv_merge_block(
        pa.table(merged_rows.take_batch(100, batch_format="pyarrow")), k
    )
    est = _kmv_estimate(final, k)
    assert est == 1500.0  # |union| exactly (900 + 900 - 300 overlap)
    # matches sketching the union directly
    direct = kmv_distinct(a.union(b), "token", k=k).column("estimate")[0].as_py()
    assert est == direct
