"""Deduplication stages: exact, MinHash+LSH, SimHash, embedding-cosine.

Ray-Data-first shapes (see the aggregation-at-scale pattern in the Ray
docs): content hash in a vectorized map_batches, ONE groupby on the hash
for exact dedup; MinHash signatures per batch -> band explode -> groupby
(band, band_hash) -> candidate pairs -> cluster by iterative min-label
propagation (a bounded number of groupby rounds, no driver union-find on
the big path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..util import default_pool

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, key_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one row (minimum id) per distinct key value.

    Hash-partition on the key: per-batch local dedup first (combiner), then
    one groupby on the key, per-group min-id row.
    """

    from ..util import default_shuffle_partitions

    nparts = default_shuffle_partitions()

    def local(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner, then hash-partition tag for the shuffle
        df = df.sort_values(id_col, kind="stable").drop_duplicates(key_col, keep="first")
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[key_col].to_numpy()) % nparts
        return df

    def first_part(df: pd.DataFrame) -> pd.DataFrame:
        # equal keys are co-partitioned: one vectorized pass per partition,
        # not a Python call per distinct key
        return (
            df.sort_values(id_col, kind="stable")
            .drop_duplicates(key_col, keep="first")
            .drop(columns="__part")
        )

    return (
        ds.map_batches(local, batch_format="pandas")
        .repartition(nparts)
        .groupby("__part")
        .map_groups(first_part, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor stage: text -> word-shingle set -> k minhashes -> b bands.

    Permutations ((a*h + b) mod p) are generated once per actor from a fixed
    seed; emits one row per (doc, band): [id, band, band_hash] plus the full
    signature for verification.
    """

    def __init__(
        self,
        text_col="text",
        id_col="doc_id",
        num_perm: int = 64,
        bands: int = 8,
        shingle: int = 3,
        seed: int = 42,
    ):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 31) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 31) - 1, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle = shingle
        self.text_col = text_col
        self.id_col = id_col

    def _shingle_hashes(self, text: str, cache: dict | None = None) -> np.ndarray:
        """UNIQUE k-gram hashes. Words are hashed once (optionally via a
        batch-level cache - vocabulary repeats heavily), the k-gram hash is
        a vectorized position-weighted mix of the word hashes (uint64
        wraparound): no per-gram Python string joins or crc calls."""
        words = text.split()
        k = self.shingle
        if not words:
            return np.zeros(1, dtype=np.uint64)
        if cache is None:
            hw = np.fromiter(
                (hash_str64(w) for w in words), dtype=np.uint64, count=len(words)
            )
        else:
            vals = []
            for w in words:
                h = cache.get(w)
                if h is None:
                    h = hash_str64(w)
                    cache[w] = h
                vals.append(h)
            hw = np.asarray(vals, dtype=np.uint64)
        kk = min(k, len(hw))
        g = _GRAM_MIX[0] * hw[: len(hw) - kk + 1]
        for d in range(1, kk):
            g = g + _GRAM_MIX[d] * hw[d : len(hw) - kk + 1 + d]
        return np.unique(g)

    def signature(self, text: str) -> np.ndarray:
        h = self._shingle_hashes(text or "")
        # (num_perm, n_shingles) via broadcasting, min over shingles.
        # a*h+b wraps mod 2^64 (plain uint64 overflow): the explicit
        # Mersenne % was the single hottest op in the whole minhash
        # pipeline and, applied to an ALREADY-wrapped product, added no
        # universal-hashing rigor anyway.
        vals = self.a[:, None] * h[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        ids = np.asarray(b.column(self.id_col))
        n = len(texts)
        cache: dict = {}
        grams = [self._shingle_hashes(t or "", cache) for t in texts]
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        # chunk docs so the (num_perm, total_shingles) matrix stays ~32MB,
        # then one broadcast multiply + minimum.reduceat per chunk instead
        # of a per-doc numpy round-trip
        i = 0
        budget = max(1, 4_000_000 // max(self.num_perm, 1))
        while i < n:
            j, total = i, 0
            while j < n and (j == i or total + len(grams[j]) <= budget):
                total += len(grams[j])
                j += 1
            H = np.concatenate(grams[i:j])
            offs = np.zeros(j - i, dtype=np.int64)
            np.cumsum([len(g) for g in grams[i : j - 1]], out=offs[1:])
            vals = self.a[:, None] * H[None, :] + self.b[:, None]  # wraps mod 2^64
            sigs[i:j] = np.minimum.reduceat(vals, offs, axis=1).T
            i = j
        r = self.rows_per_band
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_ids = np.repeat(ids, self.bands)
        band_hash = np.empty(n * self.bands, dtype=np.uint64)
        for bi in range(self.bands):
            seg = sigs[:, bi * r : (bi + 1) * r]
            # cheap mixing of the band's signature rows
            h = np.uint64(1469598103934665603) * np.ones(n, dtype=np.uint64)
            for c in range(r):
                h = h * np.uint64(1099511628211) + seg[:, c]
            band_hash[bi::self.bands] = h
        # signature column: each doc's row repeated once per band, built as
        # one flat buffer + offsets (a per-row Python list of arrays was a
        # measurable cost at 500k docs x 8 bands)
        flat = np.repeat(sigs.astype(np.int64), self.bands, axis=0).ravel()
        offs = np.arange(n * self.bands + 1, dtype=np.int32) * np.int32(self.num_perm)
        sig_col = pa.ListArray.from_arrays(pa.array(offs), pa.array(flat))
        return pa.table(
            {
                self.id_col: pa.array(doc_ids),
                "band": pa.array(band_ids),
                "band_hash": pa.array(band_hash.astype(np.int64)),
                "signature": sig_col,
            }
        )


_GRAM_MIX = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0xFF51AFD7ED558CCD,
     0xC4CEB9FE1A85EC53, 0x2545F4914F6CDD1D],
    dtype=np.uint64,
)  # position weights for the k-gram word-hash mix (k <= 8)


def hash_str64(s: str) -> np.uint64:
    """Deterministic 64-bit string hash at C speed (python hash() is salted;
    a per-character Python FNV loop was the minhash bottleneck). Two zlib
    crc32 passes (forward + salted) give 64 stable bits."""
    import zlib

    b = s.encode("utf-8")
    return np.uint64(zlib.crc32(b)) | (np.uint64(zlib.crc32(b, 0x9E3779B9)) << np.uint64(32))


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    text_col="text",
    id_col="doc_id",
    num_perm=64,
    bands=8,
    shingle=3,
    sim_threshold: float = 0.8,
    concurrency=None,
    pair_cap: int = 4096,
) -> ray.data.Dataset:
    """-> dataset of (id_a, id_b, est_jaccard) candidate near-dup pairs.

    est_jaccard = fraction of agreeing minhash positions, computed inside the
    band-bucket groupby; pairs below threshold dropped there (no extra pass).

    CONNECTIVITY-PRESERVING, NOT EXHAUSTIVE (ADVICE r3): identical-signature
    groups emit a STAR around their min-id member (m-1 pairs, not the m*(m-1)/2
    clique), and per-bucket pairwise comparison is capped at ``pair_cap``
    with oversized buckets recursively re-split. The pair set connects the
    same components the full clique would (the clustering consumer's
    contract) but callers counting pairs or scoring each pair without
    re-verification must not assume completeness — run
    ``verify_pairs_exact`` or widen ``pair_cap`` for per-pair analyses.
    """
    banded = ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle=shingle
        ),
        concurrency=default_pool(concurrency),
    )

    # Bounded pair emission (a boilerplate flood — one bucket of 10^6
    # identical docs — must NOT emit 10^12 pairs):
    # 1. identical-signature groups collapse to a STAR around the min-id
    #    member (m-1 pairs at est_jaccard=1.0, same connected component the
    #    full clique would produce — the consumer is connectivity clustering);
    # 2. the remaining one-representative-per-signature set is compared
    #    pairwise only up to PAIR_CAP reps; above that it re-splits
    #    recursively on signature columns OUTSIDE the bucket's own band
    #    (near-identical docs keep colliding — LSH logic), with a final
    #    lex-sorted chunk fallback so emission stays O(m * PAIR_CAP).
    PAIR_CAP = pair_cap

    _EMPTY_PAIRS = pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []}).astype(
        {"id_a": np.int64, "id_b": np.int64, "est_jaccard": np.float64}
    )

    def _pairwise(ids: np.ndarray, sigs: np.ndarray, out: list) -> None:
        o = np.argsort(ids)  # id_a < id_b invariant (band-level dedupe key)
        ids, sigs = ids[o], sigs[o]
        for i in range(len(ids)):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.nonzero(agree >= sim_threshold)[0]
            for k in hit:
                out.append((ids[i], ids[i + 1 + k], agree[k]))

    def _rep_pairs(ids, sigs, band, depth, out):
        if len(ids) < 2:
            return
        if len(ids) <= PAIR_CAP:
            _pairwise(ids, sigs, out)
            return
        num_perm_ = sigs.shape[1]
        r = num_perm_ // max(1, bands)
        if depth < num_perm_ - r:
            # split on a column outside this bucket's band (in-band columns
            # are equal across the whole bucket and would not split)
            col = (band * r + r + depth) % num_perm_
            vals = sigs[:, col]
            order = np.argsort(vals, kind="stable")
            sv = vals[order]
            cuts = np.concatenate([[0], np.nonzero(sv[1:] != sv[:-1])[0] + 1, [len(sv)]])
            if len(cuts) > 2:  # the column actually split the set
                for a, b in zip(cuts[:-1], cuts[1:]):
                    sel = order[a:b]
                    _rep_pairs(ids[sel], sigs[sel], band, depth + 1, out)
                return
            _rep_pairs(ids, sigs, band, depth + 1, out)
            return
        # columns exhausted and still huge: lex-sort signatures so
        # near-identical reps are adjacent, compare within fixed chunks
        order = np.lexsort(sigs.T[::-1])
        for a in range(0, len(ids), PAIR_CAP):
            sel = order[a : a + PAIR_CAP]
            _pairwise(ids[sel], sigs[sel], out)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY_PAIRS
        df = df.drop_duplicates(id_col).sort_values(id_col)
        if len(df) < 2:
            return _EMPTY_PAIRS
        ids = df[id_col].to_numpy()
        sigs = np.stack(df["signature"].to_numpy())
        band = int(df["band"].iloc[0])
        out: list = []
        # identical-signature stars
        uniq, first, inv, cnt = np.unique(
            sigs, axis=0, return_index=True, return_inverse=True, return_counts=True
        )
        if (cnt > 1).any():
            # rep = min id per signature group (ids sorted -> first member);
            # slice via one argsort of inv, never an O(m) scan per group
            order_g = np.argsort(inv, kind="stable")
            starts = np.searchsorted(inv[order_g], np.arange(len(cnt)))
            for gi in np.nonzero(cnt > 1)[0]:
                members = ids[order_g[starts[gi] : starts[gi] + cnt[gi]]]
                rep = members[0]
                for m in members[1:]:
                    out.append((rep, m, 1.0))
        rep_ids = ids[first]
        o = np.argsort(rep_ids)
        _rep_pairs(rep_ids[o], uniq[o], band, 0, out)
        if not out:
            return _EMPTY_PAIRS
        arr = np.array(out, dtype=object)
        return pd.DataFrame(
            {
                "id_a": arr[:, 0].astype(np.int64),
                "id_b": arr[:, 1].astype(np.int64),
                "est_jaccard": arr[:, 2].astype(np.float64),
            }
        )

    # Per-group python over EVERY bucket is death by overhead (most buckets
    # hold one doc). Count bucket sizes with the vectorized aggregate path
    # and prefilter the banded rows to collision buckets. The hot-key set is
    # SIZED IN THE CLUSTER first (r1 pulled it blindly): small sets broadcast
    # as numpy arrays with a vectorized np.isin membership test; a hot set
    # too big to broadcast skips the prefilter and relies on the per-group
    # early-exit instead of ever landing on the driver.
    from ray.data.aggregate import Count

    # banded feeds BOTH the sizing pass and the collision filter: pin it in
    # the (spillable) object store or the lazy plan recomputes every
    # MinHasher signature twice
    banded = banded.materialize()
    # the sizing pass must NOT shuffle the fat signature column (512B per
    # band row): project to the two key columns first - the full-width rows
    # then only move for the (few) collision buckets the prefilter keeps
    counts = (
        banded.select_columns(["band", "band_hash"])
        .groupby(["band", "band_hash"])
        .aggregate(Count(alias_name="n"))
    )
    hot = counts.filter(expr="n >= 2").materialize()  # counted AND fetched
    hot_n = hot.count()
    if hot_n == 0:
        import pyarrow as _pa

        return ray.data.from_arrow(
            _pa.table(
                {
                    "id_a": _pa.array([], type=_pa.int64()),
                    "id_b": _pa.array([], type=_pa.int64()),
                    "est_jaccard": _pa.array([], type=_pa.float64()),
                }
            )
        )
    BROADCAST_CAP = 5_000_000  # ~80MB of composite keys
    if hot_n <= BROADCAST_CAP:
        # block-type agnostic bounded pull (filter(expr=) can emit pandas
        # blocks; to_arrow_refs then hands back DataFrames)
        hot_df = hot.select_columns(["band", "band_hash"]).to_pandas()
        hot_band = hot_df["band"].to_numpy(np.int64)
        hot_hash = hot_df["band_hash"].to_numpy(np.int64)
        # composite (band, hash) -> single void view for one C-speed isin
        hot_keys = np.ascontiguousarray(
            np.column_stack([hot_band, hot_hash])
        ).view([("b", np.int64), ("h", np.int64)])
        hot_ref = ray.put(hot_keys)

        class _HotFilter:
            def __init__(self):
                self.keys = ray.get(hot_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                probe = np.ascontiguousarray(
                    np.column_stack(
                        [
                            df["band"].to_numpy(dtype=np.int64),
                            df["band_hash"].to_numpy(dtype=np.int64),
                        ]
                    )
                ).view([("b", np.int64), ("h", np.int64)])
                return df[np.isin(probe, self.keys).ravel()]

        collisions = banded.map_batches(
            _HotFilter, batch_format="pandas", concurrency=default_pool()
        )
    else:
        collisions = banded  # bucket_pairs early-exits singleton groups
    from ..util import default_shuffle_partitions

    pairs = (
        collisions.repartition(default_shuffle_partitions())
        .groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # a pair found in multiple bands appears multiple times (with the SAME
    # est_jaccard - it is computed from the full signatures): dedupe with a
    # hash-partitioned vectorized distinct, not a per-pair map_groups
    nparts = default_shuffle_partitions()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(
            (df["id_a"].to_numpy(np.int64) << np.int64(20)) ^ df["id_b"].to_numpy(np.int64)
        ) % nparts
        return df

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b", "est_jaccard"]]

    return (
        pairs.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(distinct_part, batch_format="pandas")
    )


def cluster_min_label(
    pairs: ray.data.Dataset, ids: ray.data.Dataset, id_col="doc_id", rounds: int = 4
) -> ray.data.Dataset:
    """Connected components by min-label propagation.

    Key scale fact: only nodes that APPEAR IN EDGES can change label - the
    edge set is the dedup output (bounded by duplicate volume), not the
    corpus. So labels are solved on the edge-node subgraph and joined back,
    never shuffling one label per corpus row per round:

    - edge set within ``edge_broadcast_cap``: EXACT vectorized min-label
      fixpoint on the driver (np.minimum.at passes until no change -
      converges fully, no 2^rounds chain limit), node->label broadcast via
      ray.put, one stateless map over ids;
    - larger edge sets: the distributed two-shuffle-per-round fixture over
      edge nodes only, then a broadcast/partitioned join back.
    Returns (doc_id, cluster) with cluster = min doc_id in the component.
    """
    from ..util import default_shuffle_partitions

    # undirected edges, both directions; consumed every round -> pin it
    edge_rows = pairs.map_batches(
        lambda df: pd.DataFrame(
            {
                "node": np.concatenate([df["id_a"].to_numpy(), df["id_b"].to_numpy()]),
                "peer": np.concatenate([df["id_b"].to_numpy(), df["id_a"].to_numpy()]),
            }
        ),
        batch_format="pandas",
    ).materialize()
    # every Ray all-to-all costs seconds regardless of size on a busy
    # cluster: size the partition count to the edge volume (label volume
    # is bounded by it) instead of always 4x CPUs
    n_edges = edge_rows.count()

    def _identity_then_patch(node_label_ref):
        """Stateless map over ids: label = patched value for edge nodes,
        own id otherwise (non-edge rows never change label)."""

        class _Patch:
            def __init__(self):
                nodes, labels = ray.get(node_label_ref)
                order = np.argsort(nodes)
                self.nodes = nodes[order]
                self.labels = labels[order]

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                ids_np = df[id_col].to_numpy(np.int64)
                pos = np.searchsorted(self.nodes, ids_np)
                pos = np.clip(pos, 0, max(len(self.nodes) - 1, 0))
                hit = (len(self.nodes) > 0) & (self.nodes[pos] == ids_np)
                lab = np.where(hit, self.labels[pos], ids_np)
                return pd.DataFrame({id_col: ids_np, "cluster": lab})

        return ids.map_batches(_Patch, batch_format="pandas", concurrency=default_pool())

    EDGE_BROADCAST_CAP = 5_000_000
    if n_edges == 0:
        return ids.map_batches(
            lambda df: pd.DataFrame(
                {id_col: df[id_col].to_numpy(np.int64), "cluster": df[id_col].to_numpy(np.int64)}
            ),
            batch_format="pandas",
        )
    if n_edges <= EDGE_BROADCAST_CAP:
        tbl = pa.concat_tables(ray.get(edge_rows.to_arrow_refs()), promote_options="default")
        u = np.asarray(tbl.column("node"), dtype=np.int64)
        v = np.asarray(tbl.column("peer"), dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: len(u)], inv[len(u) :]
        label = nodes.copy()
        # vectorized min-label fixpoint: O(E) per pass, passes = graph
        # diameter (duplicate clusters are tiny/dense); EXACT convergence
        for _ in range(64):
            new_lab = label.copy()
            np.minimum.at(new_lab, ui, label[vi])
            np.minimum.at(new_lab, vi, label[ui])
            # pointer-jump: label <- label[label-index] where labels are ids
            # of nodes; map via searchsorted (labels are node ids)
            pos = np.searchsorted(nodes, new_lab)
            new_lab = np.minimum(new_lab, label[pos])
            if np.array_equal(new_lab, label):
                break
            label = new_lab
        ref = ray.put((nodes, label))
        return _identity_then_patch(ref)

    nparts = max(8, min(default_shuffle_partitions(), n_edges // 100_000 + 8))

    def _part_by(df: pd.DataFrame, col: str) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(df[col].to_numpy(np.int64)) % nparts
        return df

    edges_tagged = edge_rows.map_batches(
        lambda df: _part_by(df, "peer"), batch_format="pandas"
    ).repartition(nparts).materialize()

    labels = ids.map_batches(
        lambda df: pd.DataFrame(
            {"node": df[id_col].to_numpy(np.int64), "label": df[id_col].to_numpy(np.int64)}
        ),
        batch_format="pandas",
    ).repartition(max(4, nparts // 2)).materialize()

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        # role 1 rows: (key=node, label); role 0 rows: (key=peer, node)
        lab = df[df["__role"] == 1][["__key", "label"]]
        edg = df[df["__role"] == 0][["__key", "node"]]
        if not len(edg) or not len(lab):
            return pd.DataFrame({"node": [], "label": []}).astype(np.int64)
        m = edg.merge(lab, on="__key", how="inner")
        return m[["node", "label"]].astype(np.int64)

    def min_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["label"].min().reset_index()
        return g.astype(np.int64)

    for _ in range(rounds):
        # ship each node's label to its neighbors: one hash shuffle on the
        # peer key with edges + labels co-partitioned, vectorized merge
        lab_tagged = labels.map_batches(
            lambda df: _part_by(
                pd.DataFrame(
                    {
                        "__key": df["node"].to_numpy(np.int64),
                        "node": np.int64(-1),
                        "label": df["label"].to_numpy(np.int64),
                        "__role": np.int64(1),
                    }
                ),
                "__key",
            ),
            batch_format="pandas",
        )
        e_tagged = edges_tagged.map_batches(
            lambda df: pd.DataFrame(
                {
                    "__key": df["peer"].to_numpy(np.int64),
                    "node": df["node"].to_numpy(np.int64),
                    "label": np.int64(-1),
                    "__role": np.int64(0),
                    "__part": df["__part"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )
        prop_labels = (
            e_tagged.union(lab_tagged)
            .groupby("__part")
            .map_groups(merge_part, batch_format="pandas")
        )
        # keep the min of (own label, every peer label): one more hash
        # shuffle on node, vectorized per-partition groupby-min
        # Ray groupby emits one output block per INPUT block (CLAUDE.md
        # invariant), and union stacks block lists - without the round-end
        # cap the label set gains ~2x blocks per round (16 -> 1216 by
        # round 4, 137s of pure task overhead for 500 rows). Inputs here
        # are already block-bounded (edges repartitioned once, labels
        # capped each round), so no mid-loop repartition: two all-to-alls
        # per round, not four.
        labels = (
            labels.union(prop_labels)
            .map_batches(lambda df: _part_by(df, "node"), batch_format="pandas")
            .groupby("__part")
            .map_groups(min_part, batch_format="pandas")
            .repartition(max(4, nparts // 2))
            .materialize()
        )
    return labels.map_batches(
        lambda df: df.rename(columns={"node": id_col, "label": "cluster"}), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor stage: 64-bit SimHash over word tokens."""

    def __init__(self, text_col="text", out_col="simhash"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b.column(self.text_col).to_pylist()
        out = np.zeros(len(texts), dtype=np.uint64)
        bits = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            words = (t or "").split()
            if not words:
                continue
            hs = np.fromiter((hash_str64(w) for w in words), dtype=np.uint64, count=len(words))
            bitcounts = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).sum(axis=0)
            vote = bitcounts * 2 > len(words)
            out[i] = np.sum(np.where(vote, np.uint64(1) << bits, np.uint64(0)))
        return b.append_column(self.out_col, pa.array(out.astype(np.int64)))


def with_simhash(ds: ray.data.Dataset, concurrency=None, **kw) -> ray.data.Dataset:
    return ds.map_batches(SimHasher, batch_format="pyarrow", fn_constructor_kwargs=kw, concurrency=default_pool(concurrency))


def simhash_candidate_pairs(
    ds: ray.data.Dataset,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 4,
    concurrency=None,
) -> ray.data.Dataset:
    """Near-duplicate pairs by SimHash banding (the Charikar/Manku web-dedup
    scheme): split the 64-bit hash into ``bands`` chunks - any pair within
    ``max_hamming`` (< bands) differs in at most bands-1 chunks, so it
    collides on at least one chunk. One groupby on (band, chunk_bits),
    exact popcount verification inside the bucket, cross-band distinct.
    Emits (id_a, id_b, hamming)."""
    from ..util import default_shuffle_partitions

    assert max_hamming < bands, "banding guarantee needs max_hamming < bands"
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    hashed = with_simhash(
        ds.select_columns([id_col, text_col]), concurrency=concurrency,
        text_col=text_col,
    )

    def explode_bands(b: pa.Table) -> pa.Table:
        h = np.asarray(b.column("simhash"), dtype=np.int64).astype(np.uint64)
        ids = np.asarray(b.column(id_col))
        n = len(h)
        band = np.tile(np.arange(bands, dtype=np.int32), n)
        chunk = np.empty(n * bands, dtype=np.int64)
        for bi in range(bands):
            chunk[bi::bands] = ((h >> np.uint64(bi * width)) & mask).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, bands)),
                "simhash": pa.array(np.repeat(h.astype(np.int64), bands)),
                "band": pa.array(band),
                "chunk": pa.array(chunk),
            }
        )

    banded = hashed.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
            )
        df = df.drop_duplicates(id_col)
        ids = df[id_col].to_numpy(np.int64)
        hs = df["simhash"].to_numpy(np.int64).astype(np.uint64)
        outs = []
        # chunked scan: never a dense |bucket|^2 matrix (the r1 knn_lsh
        # lesson) - each chunk allocates (chunk x |bucket|) only
        for s0 in range(0, len(ids), 2048):
            e = min(s0 + 2048, len(ids))
            x = hs[s0:e, None] ^ hs[None, :]
            bts = x.view(np.uint8).reshape(e - s0, len(ids), 8)
            ham = _POPCNT[bts].sum(axis=2).astype(np.int64)
            ai, bi = np.nonzero(
                (ham <= max_hamming) & (ids[s0:e, None] < ids[None, :])
            )
            if len(ai):
                outs.append((ids[s0 + ai], ids[bi], ham[ai, bi]))
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "hamming": np.int64}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate([o[0] for o in outs]),
                "id_b": np.concatenate([o[1] for o in outs]),
                "hamming": np.concatenate([o[2] for o in outs]),
            }
        )

    nparts = default_shuffle_partitions()
    pairs = (
        banded.repartition(nparts)
        .groupby(["band", "chunk"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__part"] = pd.util.hash_array(
            (df["id_a"].to_numpy(np.int64) << np.int64(20)) ^ df["id_b"].to_numpy(np.int64)
        ) % nparts
        return df

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(subset=["id_a", "id_b"])[["id_a", "id_b", "hamming"]]

    return (
        pairs.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(distinct_part, batch_format="pandas")
    )


_POPCNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity of two texts."""

    def grams(t):
        w = t.split()
        if len(w) < n:
            return {" ".join(w)} if w else set()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ga, gb = grams(a or ""), grams(b or "")
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


def verify_pairs_exact(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    sim_threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """EXACT n-gram Jaccard verification of near-dup CANDIDATE pairs —
    the standard candidate->verify shape: MinHash/SimHash propose, the
    exact measure disposes. Texts join onto the pair stream with two
    hash-partitioned joins (bounded by candidate volume, never a corpus
    broadcast); the per-pair Jaccard is genuinely per-pair work.

    Input: pairs(id_a, id_b, ...), docs(id_col, text_col).
    Output: (id_a, id_b, jaccard) for pairs with jaccard >= sim_threshold.
    """
    from ..stages.merge import hash_join

    slim = docs.select_columns([id_col, text_col])

    def as_a(b: pa.Table) -> pa.Table:
        return pa.table({"id_a": b.column(id_col), "__text_a": b.column(text_col)})

    def as_b(b: pa.Table) -> pa.Table:
        return pa.table({"id_b": b.column(id_col), "__text_b": b.column(text_col)})

    witha = hash_join(
        pairs.select_columns(["id_a", "id_b"]),
        slim.map_batches(as_a, batch_format="pyarrow"),
        on="id_a",
    )
    withb = hash_join(witha, slim.map_batches(as_b, batch_format="pyarrow"), on="id_b")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
                {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64}
            )
        j = np.fromiter(
            (
                ngram_jaccard(a, b, n)
                for a, b in zip(df["__text_a"].tolist(), df["__text_b"].tolist())
            ),
            dtype=np.float64,
            count=len(df),
        )
        out = df.loc[j >= sim_threshold, ["id_a", "id_b"]].copy()
        out["jaccard"] = j[j >= sim_threshold]
        return out

    return withb.map_batches(score, batch_format="pandas")
