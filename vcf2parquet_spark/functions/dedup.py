"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the part that matters at 100 TB):

* exact dedup is a hash ``groupBy`` — one shuffle on a 16-byte digest,
  map-side partial aggregation, no skew (hashes are uniform);
* MinHash signatures are per-row (narrow, codegen); LSH banding turns
  the quadratic all-pairs problem into an equi-join on (band, bucket) —
  the only shuffle is by bucket key, and hot buckets (boilerplate docs)
  are bounded by ``max_bucket`` before the pair explosion;
* SimHash is per-row bit voting via explode + groupBy on doc_id —
  shuffle proportional to token count, partial-aggregated map-side;
* n-gram Jaccard is the *verifier* for candidate pairs, run only on the
  LSH survivors, never all-pairs.

MinHash here uses lexicographic-min of seeded md5 hex digests — engine-
portable (identical in any SQL dialect) and exactly the Broder min-wise
scheme with the hash family h_i(x) = md5(seed_i || x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(col):
    return F.split(F.lower(col), r"\s+")


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per exact text; adds group size."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h)
    return (df
            .withColumn("dup_count", F.count("*").over(w))
            .withColumn("_rk", F.row_number().over(
                w.orderBy(F.col(key_col))))
            .filter(F.col("_rk") == 1)
            .drop("_rk"))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", k: int = 8,
                       shingle: int = 3) -> DataFrame:
    """MinHash signature per document over word shingles.

    signature_i = min over shingles of md5(i || shingle); k columns
    ``sig_0..sig_{k-1}``.  Pure built-ins: explode → groupBy(doc) with
    k min() partial aggregates (one shuffle on the doc key).
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0),
                     F.greatest(F.size(toks) - shingle, F.lit(0)))
    # per-row dedup before the explode: min() over duplicate shingles is
    # identical, so dropping them row-side shrinks the exploded volume
    # (and the k md5s per row) for free — no extra shuffle
    shingles = F.array_distinct(F.transform(idx, lambda i: F.array_join(
        F.slice(toks, i + 1, shingle), " ")))
    exploded = (df.select(key_col, F.explode(shingles).alias("shingle")))
    aggs = [F.min(F.md5(F.concat(F.lit(str(i) + "|"),
                                 F.col("shingle")))).alias(f"sig_{i}")
            for i in range(k)]
    return exploded.groupBy(key_col).agg(*aggs)


def lsh_candidates(sigs: DataFrame, key_col: str = "doc_id",
                   bands: int = 4, rows_per_band: int = 2,
                   max_bucket: int = 1000) -> DataFrame:
    """LSH banding over minhash signatures → candidate duplicate pairs.

    Each band hashes ``rows_per_band`` signature columns into a bucket;
    docs sharing any (band, bucket) become a candidate pair.  Buckets
    larger than ``max_bucket`` are dropped (boilerplate guard — the
    explicit skew bound; without it one mega-bucket explodes
    quadratically).
    """
    sig_cols = [c for c in sigs.columns if c.startswith("sig_")]
    assert len(sig_cols) >= bands * rows_per_band
    band_rows = []
    for b in range(bands):
        cols = sig_cols[b * rows_per_band:(b + 1) * rows_per_band]
        band_rows.append(sigs.select(
            F.col(key_col),
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("bucket")))
    buckets = band_rows[0]
    for extra in band_rows[1:]:
        buckets = buckets.unionByName(extra)
    sized = buckets.withColumn(
        "bsize", F.count("*").over(Window.partitionBy("band", "bucket")))
    small = sized.filter(F.col("bsize") <= max_bucket).drop("bsize")
    a = small.alias("a")
    b = small.alias("b")
    pairs = (a.join(b, ["band", "bucket"])
             .filter(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
             .select(F.col(f"a.{key_col}").alias("left_id"),
                     F.col(f"b.{key_col}").alias("right_id"))
             .distinct())
    return pairs


def simhash(df: DataFrame, text_col: str = "text",
            key_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-token hash bits vote ±1; sign per bit.

    Uses the first ``bits`` hex digits of md5(token) — digit >= 8 votes
    +1 (its high bit), else -1.  Returns ``simhash`` as a bit string.
    Explode → single groupBy with ``bits`` conditional-sum aggregates.
    """
    toks = _tokens(F.col(text_col))
    exploded = df.select(key_col, F.explode(toks).alias("tok")) \
                 .withColumn("h", F.md5(F.col("tok")))
    aggs = [
        F.when(
            F.sum(F.when(F.substring("h", i + 1, 1)
                         .isin(*list("89abcdef")), 1).otherwise(-1)) >= 0,
            "1").otherwise("0").alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = exploded.groupBy(key_col).agg(*aggs)
    return per_doc.select(
        key_col,
        F.concat(*[F.col(f"b{i}") for i in range(bits)]).alias("simhash"))


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame | None = None,
                        text_col: str = "text", key_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.0) -> DataFrame:
    """n-gram Jaccard similarity for candidate pairs (or all pairs of a
    *small* df if ``pairs`` is None — the verifier, not the scale path).

    Implemented as shingle explode + self-equi-join on shingle + count
    distinct intersections over union — no quadratic cross join.
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")))
    sh = df.select(F.col(key_col), F.explode(shingles).alias("sh"),
                   F.size(shingles).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, "sh")
             .filter(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
             .groupBy(F.col(f"a.{key_col}").alias("left_id"),
                      F.col(f"b.{key_col}").alias("right_id"),
                      F.col("a.n_sh").alias("n_left"),
                      F.col("b.n_sh").alias("n_right"))
             .agg(F.count("*").alias("n_common")))
    out = inter.withColumn(
        "jaccard",
        F.round(F.col("n_common")
                / (F.col("n_left") + F.col("n_right") - F.col("n_common")), 4))
    if pairs is not None:
        out = out.join(F.broadcast(pairs), ["left_id", "right_id"], "left_semi")
    return out.filter(F.col("jaccard") >= threshold) \
              .select("left_id", "right_id", "n_common", "jaccard")


def embedding_near_dups(df: DataFrame, threshold: float = 0.2,
                        n_planes: int = 6, dim: int = 64,
                        vec_col: str = "embedding", key_col: str = "vec_id"
                        ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    The quadratic all-pairs cosine is cut to within-bucket pairs by the
    hyperplane LSH of :func:`~vcf2parquet_spark.functions.similarity.
    lsh_buckets` (near-identical vectors share all sign bits, so true
    near-dups land in the same bucket); the only shuffle is the
    self-equi-join on the bucket key, and bucket sizes are bounded by
    2^n_planes fan-out.  Returns (id_a, id_b, score) with id_a < id_b,
    score = cosine rounded to 6.
    """
    from vcf2parquet_spark.functions.similarity import (
        _dot, _norm, lsh_buckets)

    buckets = lsh_buckets(df, n_planes=n_planes, dim=dim,
                          vec_col=vec_col, key_col=key_col)
    v = (df.select(F.col(key_col), F.col(vec_col).cast("array<double>")
                   .alias("_v"))
         .join(buckets, key_col))
    a = v.select(F.col(key_col).alias("id_a"), F.col("_v").alias("va"),
                 F.col("bucket"))
    b = v.select(F.col(key_col).alias("id_b"), F.col("_v").alias("vb"),
                 F.col("bucket"))
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("score",
                        F.round(_dot(F.col("va"), F.col("vb"))
                                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                                6))
            .filter(F.col("score") >= threshold)
            .select("id_a", "id_b", "score"))
