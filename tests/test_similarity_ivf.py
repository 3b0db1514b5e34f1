"""IVF (inverted-file) ANN: coarse quantizer, Lloyd's refinement, and
probe-and-rerank search — the scale path next to brute-force cosine.

Mirrors the reference's deterministic-fixture style (SURVEY.md §5): all
centroids are closed-form seeded, so every assertion is exact.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2parquet_spark.functions.similarity import (
    cosine_topk, ivf_assign, ivf_seed_centroids, ivf_topk, ivf_train)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_seed_centroids_shape_and_determinism():
    c = ivf_seed_centroids(8, 64)
    assert len(c) == 8 and all(len(v) == 64 for v in c)
    assert c == ivf_seed_centroids(8, 64)
    assert c[0][0] == ((0 + 0) % 13) - 6
    assert c[3][5] == ((23 * 3 + 7 * 5) % 13) - 6


def test_ivf_assign_total_and_deterministic(spark, emb):
    a = ivf_assign(emb, n_centroids=8, dim=64)
    rows = {r["vec_id"]: (r["centroid_id"], r["dist"]) for r in a.collect()}
    assert len(rows) == emb.count()          # every vector exactly once
    b = ivf_assign(emb, n_centroids=8, dim=64)
    assert rows == {r["vec_id"]: (r["centroid_id"], r["dist"])
                    for r in b.collect()}
    assert all(0 <= cid < 8 for cid, _ in rows.values())


def test_ivf_assign_is_argmin(spark, emb):
    """Cross-check one vector's assignment against a numpy argmin."""
    import numpy as np
    v = np.array(emb.filter(F.col("vec_id") == 0)
                 .collect()[0]["embedding"], dtype=np.float64)
    cents = np.array(ivf_seed_centroids(8, 64), dtype=np.float64)
    dists = np.round(((cents - v) ** 2).sum(axis=1), 4)
    expect = int(np.argmin(dists))
    got = ivf_assign(emb.filter(F.col("vec_id") == 0)).collect()[0]
    assert got["centroid_id"] == expect
    assert got["dist"] == pytest.approx(dists[expect], abs=1e-4)


def test_ivf_train_reduces_quantization_error(spark, emb):
    """Lloyd's iterations must not increase total within-cluster
    distance (monotone convergence)."""
    def total_dist(cents):
        a = ivf_assign(emb, centroids=cents)
        return a.agg(F.sum("dist")).collect()[0][0]

    seed = [[float(x) for x in c] for c in ivf_seed_centroids(8, 64)]
    trained = ivf_train(emb, n_centroids=8, dim=64, iters=2)
    assert len(trained) == 8 and all(len(c) == 64 for c in trained)
    assert total_dist(trained) <= total_dist(seed) + 1e-6


def test_ivf_topk_scores_match_exact(spark, emb):
    """Every pair IVF returns must carry the exact brute-force cosine
    score, and per-query results are a subset of the probed lists."""
    queries = emb.filter(F.col("vec_id") < 3)
    ivf = ivf_topk(emb, queries, k=3, nprobe=2, n_centroids=8, dim=64)
    exact = cosine_topk(emb, queries, k=emb.count())
    escore = {(r["query_id"], r["neighbour_id"]): r["score"]
              for r in exact.collect()}
    rows = ivf.collect()
    assert len(rows) > 0
    for r in rows:
        assert escore[(r["query_id"], r["neighbour_id"])] == r["score"]
    # per query: at most k results, ranks contiguous from 1
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_ivf_assign_plan_is_map_only(spark, emb):
    """The centroid-literal argmin plans as a pure projection: no join
    of any kind and no exchange — one narrow scan at any corpus size."""
    plan = (ivf_assign(emb, n_centroids=8, dim=64)
            ._jdf.queryExecution().explainString(
                emb._sc._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("simple")))
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Window" not in plan
