"""Dedup operator tests: hash-family equivalence for MinHash, LSH
candidate recall, and the explicit skew bounds (hot-bucket /
stop-shingle guards) that keep the pair explosions bounded at scale."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2parquet_spark.functions.dedup import (
    embedding_near_dups,
    lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for i in range(30):
        rows.append((i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(20))))
    rows.append((100, base))            # exact dup pair
    rows.append((101, base))
    rows.append((102, base + " extra"))  # near dup
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sig_groups(sigs):
    """doc ids grouped by identical full signature."""
    cols = [c for c in sigs.columns if c.startswith("sig_")]
    rows = sigs.collect()
    groups: dict[tuple, set] = {}
    for r in rows:
        groups.setdefault(tuple(r[c] for c in cols), set()).add(r["doc_id"])
    return sorted((sorted(g) for g in groups.values() if len(g) > 1))


def test_minhash_families_agree_on_duplicates(docs):
    """xxhash64 (scale path) and md5 (oracle path) are different hash
    families; both must group exact duplicates (identical shingle sets
    -> identical signatures, deterministically) and keep the 30 distinct
    docs apart.  (Near-dups matching is probabilistic per family, so it
    is not asserted here — lsh recall is tested below.)"""
    for hash_fn in ("xxhash64", "md5"):
        groups = _sig_groups(minhash_signatures(docs, k=4, shingle=3,
                                                hash_fn=hash_fn))
        assert any(set(g) >= {100, 101} for g in groups), (hash_fn, groups)
        assert all(set(g) <= {100, 101, 102} for g in groups), \
            (hash_fn, groups)


def test_lsh_candidates_find_exact_and_near_dups(docs):
    sigs = minhash_signatures(docs, k=8, shingle=3)
    pairs = {(r["left_id"], r["right_id"])
             for r in lsh_candidates(sigs, bands=4, rows_per_band=2).collect()}
    assert (100, 101) in pairs
    assert (100, 102) in pairs or (101, 102) in pairs


def test_lsh_max_bucket_drops_hot_bucket(spark):
    """A boilerplate bucket above max_bucket must be dropped, not
    exploded quadratically."""
    rows = [(i, "same boilerplate text repeated everywhere ok")
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, k=8, shingle=3)
    assert lsh_candidates(sigs, max_bucket=10).count() == 0
    # raising the cap restores the pairs
    assert lsh_candidates(sigs, max_bucket=100).count() == 50 * 49 // 2


def test_ngram_stop_shingle_cap(spark):
    """Shingles above max_postings are dropped before the self-join;
    pairs sharing ONLY the hot shingle disappear, pairs with other
    overlap survive (with a conservative, never-higher score)."""
    rows = [(i, f"common unique{i} filler{i}") for i in range(20)]
    rows += [(100, "common shared alpha beta"), (101, "common shared alpha x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, n=1, threshold=0.0,
                                   max_postings=None)
    capped = ngram_jaccard_pairs(df, n=1, threshold=0.0, max_postings=10)
    # 'common' appears in 22 docs > 10 -> dropped; every pair that only
    # shared 'common' vanishes
    assert uncapped.count() == 22 * 21 // 2
    got = {(r["left_id"], r["right_id"]): r["n_common"]
           for r in capped.collect()}
    assert set(got) == {(100, 101)}
    assert got[(100, 101)] == 2  # 'shared', 'alpha' — 'common' excluded


def test_embedding_near_dups_max_bucket(spark):
    """A degenerate embedding cluster larger than max_bucket is dropped
    (the O((N/buckets)^2) guard); smaller clusters still pair up."""
    import math
    dim = 8
    rows = [(i, [1.0] + [0.0] * (dim - 1)) for i in range(30)]   # hot cluster
    rows += [(100, [0.0] * (dim - 1) + [1.0]),
             (101, [0.0] * (dim - 2) + [0.01, 1.0])]             # small pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_near_dups(df, threshold=0.5, n_planes=4, dim=dim,
                              max_bucket=10)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (100, 101) in pairs
    assert not any(a < 100 and b < 100 for a, b in pairs)
    # without the cap the hot cluster pairs explode
    full = embedding_near_dups(df, threshold=0.5, n_planes=4, dim=dim,
                               max_bucket=10_000)
    assert full.count() >= 30 * 29 // 2


def test_dedup_clusters_connected_components(spark):
    """Chain + triangle + isolated pair resolve to min-id components;
    a chain (diameter > 1) needs multiple propagation rounds."""
    from vcf2parquet_spark.functions.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),        # chain -> cluster 1
         (10, 11), (11, 12), (10, 12),          # triangle -> cluster 10
         (20, 21)],                             # pair -> cluster 20
        "left_id long, right_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    # representatives = rows where id == cluster_id
    reps = sorted(k for k, v in got.items() if k == v)
    assert reps == [1, 10, 20]


def test_dedup_clusters_chain_log_rounds(spark):
    """1000-node chain (diameter 999): the large-star/small-star
    contraction must converge in O(log d) rounds, not d — plain
    min-label propagation would need ~999 joins here."""
    import math

    from vcf2parquet_spark.functions.dedup import dedup_clusters
    n = 1000
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  "left_id long, right_id long")
    stats: dict = {}
    labels = dedup_clusters(pairs, max_iter=20, stats=stats)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert stats["converged"]
    assert stats["rounds"] <= math.ceil(math.log2(n - 1)) + 4


def test_dedup_clusters_raises_on_budget_exhausted(spark):
    """Silently returning unconverged labels under-merges; must raise."""
    import pytest

    from vcf2parquet_spark.functions.dedup import dedup_clusters
    pairs = spark.createDataFrame([(i, i + 1) for i in range(63)],
                                  "left_id long, right_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iter=1)


def test_spread_repartitions_small_scans_only(spark):
    """The pre-explode spread: a 1-split input gains a round-robin
    exchange (the expensive hash work must not serialize on one task
    slot), while an input already at >= defaultParallelism splits
    keeps its partitioning — no shuffle added at scale."""
    from vcf2parquet_spark.functions.dedup import minhash_signatures
    slots = spark.sparkContext.defaultParallelism
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {i}") for i in range(40)],
        "doc_id long, text string")

    def phys(df) -> str:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("simple"))

    narrow = docs.coalesce(1)
    sigs = minhash_signatures(narrow, k=4)
    assert "RoundRobinPartitioning" in phys(sigs)

    wide = docs.repartition(slots * 2)
    plan = phys(minhash_signatures(wide, k=4))
    # exactly the caller's one repartition — _spread added nothing
    assert plan.count("RoundRobinPartitioning") == 1
    # values are identical either way (spread is a pure plan change)
    a = {tuple(r) for r in sigs.collect()}
    b = {tuple(r) for r in minhash_signatures(wide, k=4).collect()}
    assert a == b
