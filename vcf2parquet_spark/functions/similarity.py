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


def ivf_seed_centroids(n_centroids: int, dim: int) -> list[list[int]]:
    """Deterministic integer seed centroids: c[j][i] = ((23j+7i) mod 13) - 6.

    Same rationale as :func:`hyperplane_weights` — integer coordinates
    are exactly representable in every engine, so list assignment is
    reproducible across Spark / DuckDB (the driver's oracle recomputes
    them with the same closed form).  On a real corpus these are the
    k-means *initialization*; :func:`ivf_train` refines them.
    """
    return [[((23 * j + 7 * i) % 13) - 6 for i in range(dim)]
            for j in range(n_centroids)]


def _centroid_literal(centroids: list[list[float]]):
    """``array<struct<centroid_id int, cvec array<double>>>`` literal —
    embeds the (tiny) coarse-quantizer centroids directly in the plan
    so per-row argmin/probe selection needs no join and no shuffle."""
    return F.array(*[
        F.struct(F.lit(j).alias("centroid_id"),
                 F.array(*[F.lit(float(x)) for x in c]).alias("cvec"))
        for j, c in enumerate(centroids)])


def _sqdist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def ivf_assign(df: DataFrame, centroids: list[list[float]] | None = None,
               n_centroids: int = 8, dim: int = 64,
               vec_col: str = "embedding", key_col: str = "vec_id"
               ) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    The centroids are embedded as an array LITERAL in the plan and the
    argmin is ``array_min`` over a per-row ``transform`` — genuinely
    map-only (one narrow scan, NO exchange; the former cross-join +
    per-vector window shuffled one row per vector per centroid).
    Distances are rounded before ranking so float noise can't flip
    assignments between engines; ties break on centroid_id.  The
    literal carries k×dim floats — fine for a coarse quantizer (k up
    to a few hundred).
    """
    cents = centroids or ivf_seed_centroids(n_centroids, dim)
    v = F.col(vec_col).cast("array<double>")
    # struct comparison orders by (dist, centroid_id) — array_min IS
    # the argmin with the documented tie-break, entirely in-row
    best = F.array_min(F.transform(
        _centroid_literal(cents),
        lambda s: F.struct(
            F.round(_sqdist(v, s["cvec"]), 4).alias("dist"),
            s["centroid_id"].alias("centroid_id"))))
    return df.select(F.col(key_col),
                     best["centroid_id"].alias("centroid_id"),
                     best["dist"].alias("dist"))


def ivf_train(df: DataFrame, n_centroids: int = 8, dim: int = 64,
              iters: int = 2, vec_col: str = "embedding",
              key_col: str = "vec_id") -> list[list[float]]:
    """Lloyd's k-means refinement of the seed centroids, fully in
    DataFrame ops: assign (broadcast argmin) → per-dimension mean
    (posexplode + groupBy + map-side partial aggregation) → new
    centroid table.  Each iteration is one shuffle of (centroid_id,
    dim_idx, partial sums) — size O(n_centroids × dim), independent of
    corpus row count, so iterations stay cheap at any scale.

    Returns plain Python centroids (driver-side list: n_centroids × dim
    floats — tiny) for feeding into :func:`ivf_assign` / :func:`ivf_topk`.
    """
    cents = [[float(x) for x in c]
             for c in ivf_seed_centroids(n_centroids, dim)]
    vecs = df.select(F.col(key_col),
                     F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(iters):
        assign = ivf_assign(vecs, centroids=cents, vec_col="v",
                            key_col=key_col)
        joined = vecs.join(assign, key_col)
        means = (joined.select("centroid_id", F.posexplode("v")
                               .alias("dim_idx", "val"))
                 .groupBy("centroid_id", "dim_idx")
                 .agg(F.avg("val").alias("mean")))
        rows = (means.groupBy("centroid_id")
                .agg(F.array_sort(F.collect_list(F.struct("dim_idx", "mean")))
                     .alias("pairs"))
                .select("centroid_id",
                        F.transform("pairs", lambda p: p["mean"])
                        .alias("cvec"))
                .collect())
        new = {r["centroid_id"]: list(r["cvec"]) for r in rows}
        # empty clusters keep their previous centroid (standard Lloyd's)
        cents = [new.get(j, cents[j]) for j in range(n_centroids)]
    return cents


def ivf_topk(df: DataFrame, queries: DataFrame,
             centroids: list[list[float]] | None = None,
             k: int = 3, nprobe: int = 2, n_centroids: int = 8,
             dim: int = 64, vec_col: str = "embedding",
             key_col: str = "vec_id") -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest centroid
    lists per query, exact cosine re-rank inside them.

    Scale path vs :func:`cosine_topk`: the corpus is scanned once to
    build the (broadcast-argmin, shuffle-free) inverted lists, then the
    search is an equi-join on ``centroid_id`` — candidates per query
    drop from |corpus| to |corpus|·nprobe/n_centroids, and the join
    co-partitions by list id instead of cross-producting.
    """
    cents = centroids or ivf_seed_centroids(n_centroids, dim)
    lists = ivf_assign(df, centroids=cents, vec_col=vec_col,
                       key_col=key_col).join(
        df.select(F.col(key_col).alias("neighbour_id"),
                  F.col(vec_col).alias("cvec")),
        F.col(key_col) == F.col("neighbour_id")).drop(key_col, "dist")

    qv = F.col(vec_col).cast("array<double>")
    # nprobe nearest centroids per query, in-row: sort the per-query
    # (qdist, centroid_id) structs and slice — no window, no shuffle
    probes = (queries.select(F.col(key_col).alias("query_id"),
                             qv.alias("qvec"))
              .withColumn("probe", F.explode(F.slice(F.array_sort(
                  F.transform(
                      _centroid_literal(cents),
                      lambda s: F.struct(
                          F.round(_sqdist(F.col("qvec"), s["cvec"]),
                                  4).alias("qdist"),
                          s["centroid_id"].alias("centroid_id")))),
                  1, nprobe)))
              .select("query_id", "qvec",
                      F.col("probe.centroid_id").alias("centroid_id")))

    scored = (lists.join(F.broadcast(probes), "centroid_id")
              .filter(F.col("neighbour_id") != F.col("query_id"))
              .withColumn(
                  "score",
                  F.round(_dot(F.col("qvec"),
                               F.col("cvec").cast("array<double>"))
                          / (_norm(F.col("qvec"))
                             * _norm(F.col("cvec").cast("array<double>"))),
                          6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbour_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
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
