"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — brute-force cosine top-k: exact baseline.  The
  dot product is a built-in higher-order expression (``aggregate`` +
  ``zip_with``) so the whole plan stays JVM-side; the query side is
  broadcast, making the "join" a map-only cross product — shuffle-free —
  followed by a per-query top-k window.
* :func:`lsh_buckets` — random-hyperplane LSH: the scale path.  Integer
  hyperplanes (deterministic, engine-portable) bucket vectors by the
  sign pattern of their projections; ANN search then only scans the
  query's bucket (an equi-join on the bucket key) instead of the full
  corpus — at 100 TB this is the difference between a full-scan cross
  product and a co-partitioned hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 3,
                vec_col: str = "embedding", key_col: str = "vec_id"
                ) -> DataFrame:
    """Exact top-k cosine neighbours of each query vector.

    ``queries`` is small (broadcast); returns (query_id, neighbour_id,
    score, rank) excluding self-matches.  Deterministic tiebreak on
    (rounded score desc, neighbour id asc).
    """
    q = queries.select(F.col(key_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = df.select(F.col(key_col).alias("neighbour_id"),
                  F.col(vec_col).alias("cvec"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbour_id") != F.col("query_id"))
              .withColumn(
                  "score",
                  F.round(
                      _dot(F.col("qvec").cast("array<double>"),
                           F.col("cvec").cast("array<double>"))
                      / (_norm(F.col("qvec").cast("array<double>"))
                         * _norm(F.col("cvec").cast("array<double>"))), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbour_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbour_id", "score", "rank"))


def hyperplane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic integer hyperplanes: w[j][i] = ((37j + 17i) mod 19) - 9.

    Integer weights are exactly representable in every engine, so the
    bucket assignment is reproducible across Spark / DuckDB / anything.
    """
    return [[((37 * j + 17 * i) % 19) - 9 for i in range(dim)]
            for j in range(n_planes)]


def lsh_buckets(df: DataFrame, n_planes: int = 8, dim: int = 64,
                vec_col: str = "embedding", key_col: str = "vec_id"
                ) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: the ANN scale path.

    bucket = sign bits of <v, h_j> for j < n_planes, as a bit string.
    Projections are rounded before the sign so near-zero float noise
    can't flip buckets between engines.
    """
    planes = hyperplane_weights(n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bits = [
        F.when(F.round(_dot(v, F.array(*[F.lit(float(w)) for w in plane])), 4)
               >= 0, "1").otherwise("0")
        for plane in planes
    ]
    return df.select(F.col(key_col), F.concat(*bits).alias("bucket"))
