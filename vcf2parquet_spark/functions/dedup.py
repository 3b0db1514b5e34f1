"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the part that matters at 100 TB):

* exact dedup is a hash ``groupBy`` — one shuffle on a 16-byte digest,
  map-side partial aggregation, no skew (hashes are uniform);
* MinHash signatures are per-row (narrow, codegen); the default hash
  family hashes each shingle ONCE with ``xxhash64`` and derives the k
  signature lanes from that 64-bit value with fixed-width re-hashes —
  ~10x less hash work than k independent digests of the full shingle
  string.  ``hash_fn="md5"`` keeps the engine-portable digest family
  (bit-identical in any SQL dialect — used by the DuckDB oracle);
* LSH banding turns the quadratic all-pairs problem into ONE shuffle:
  groupBy (band, bucket) with a collect_set, pairs expanded narrowly
  from each bucket's sorted id array; hot buckets (boilerplate docs)
  are dropped by ``max_bucket`` before the pair explosion;
* SimHash is per-row bit voting via explode + groupBy on doc_id —
  shuffle proportional to token count, partial-aggregated map-side;
* n-gram Jaccard is the *verifier* for candidate pairs, run only on the
  LSH survivors, never all-pairs; shingles whose posting list exceeds
  ``max_postings`` are dropped via a broadcast stop-shingle anti-join
  (one boilerplate shingle would otherwise make the self-join
  quadratic);
* embedding near-dup is LSH-bucketed cosine with the same
  ``max_bucket`` hot-bucket guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(col):
    return F.split(F.lower(col), r"\s+")


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition BEFORE a high-amplification explode when
    the scan has fewer splits than the cluster has task slots.

    An explode multiplies row volume ~1000x (tokens/shingles per doc),
    so a scan whose parallelism is file-layout-bound (one small file =
    one task, however many cores are idle) serializes the expensive
    hash/agg work.  Shuffling the PRE-explode rows is cheap (they are
    the small side by the same factor).  At real scale this is a no-op:
    a 100 TB table has orders of magnitude more splits than slots, so
    the condition never fires and no shuffle is added.
    """
    if df.isStreaming:      # no .rdd on streaming plans; micro-batch
        return df           # parallelism is the source's business
    slots = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < slots:
        return df.repartition(slots)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text",
                key_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min key) per exact text; adds group size.

    Two window functions over the SAME window spec = one shuffle + one
    sort (Catalyst plans a single Window node); the groupBy+self-join
    alternative costs two shuffles unless the exchange is reused, and
    the group table is not broadcastable at scale.
    """
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
                       shingle: int = 3,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash signature per document over word shingles.

    k columns ``sig_0..sig_{k-1}``; pure built-ins: explode →
    groupBy(doc) with k min() partial aggregates (one shuffle on the
    doc key).

    ``hash_fn="xxhash64"`` (default, the scale path): each shingle is
    hashed ONCE; lane i is ``xxhash64(i, h)`` — a fixed-width (16-byte
    input) re-hash, so the per-row cost is one string hash + k cheap
    integer hashes instead of k full string digests.  This is the
    Broder min-wise scheme with the family h_i(x) = g_i(f(x)).
    ``hash_fn="md5"``: lexicographic-min of seeded md5 hex digests —
    engine-portable (identical in any SQL dialect; the DuckDB oracle
    uses this variant).  Both families agree on which documents share
    signatures (tested), they just emit different signature values.
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0),
                     F.greatest(F.size(toks) - shingle, F.lit(0)))
    # per-row dedup before the explode: min() over duplicate shingles is
    # identical, so dropping them row-side shrinks the exploded volume
    # (and the k hashes per row) for free — no extra shuffle
    shingles = F.array_distinct(F.transform(idx, lambda i: F.array_join(
        F.slice(toks, i + 1, shingle), " ")))
    exploded = (_spread(df)
                .select(key_col, F.explode(shingles).alias("shingle")))
    if hash_fn == "md5":
        aggs = [F.min(F.md5(F.concat(F.lit(str(i) + "|"),
                                     F.col("shingle")))).alias(f"sig_{i}")
                for i in range(k)]
        return exploded.groupBy(key_col).agg(*aggs)
    if hash_fn != "xxhash64":
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    hashed = exploded.select(key_col,
                             F.xxhash64("shingle").alias("_h"))
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"sig_{i}")
            for i in range(k)]
    return hashed.groupBy(key_col).agg(*aggs)


def lsh_candidates(sigs: DataFrame, key_col: str = "doc_id",
                   bands: int = 4, rows_per_band: int = 2,
                   max_bucket: int = 1000) -> DataFrame:
    """LSH banding over minhash signatures → candidate duplicate pairs.

    Each band hashes ``rows_per_band`` signature columns into a bucket;
    docs sharing any (band, bucket) become a candidate pair.  ONE wide
    shuffle: groupBy (band, bucket) collecting each bucket's (distinct,
    sorted) doc ids, then the pair list is expanded narrowly from the
    array — no self-join, no window.  Buckets larger than ``max_bucket``
    are dropped (boilerplate guard — the explicit skew bound; without
    it one mega-bucket explodes quadratically).  A final distinct()
    dedups pairs that collide in several bands.
    """
    sig_cols = [c for c in sigs.columns if c.startswith("sig_")]
    assert len(sig_cols) >= bands * rows_per_band
    # ONE scan of sigs: each row emits its `bands` (band, bucket)
    # structs from an in-codegen array explode.  (The union-of-selects
    # alternative plans `bands` branches — `bands` scans of the
    # upstream, or at best one exchange reused and the rest recomputed.)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*sig_cols[b * rows_per_band:
                                 (b + 1) * rows_per_band]).alias("bucket"))
        for b in range(bands)])
    buckets = (sigs.select(F.col(key_col), F.explode(band_structs)
                           .alias("bb"))
               .select(key_col, "bb.band", "bb.bucket"))
    # Pre-drop over-cap (band, bucket) keys with a distinct-count
    # aggregate + broadcast anti-join BEFORE collect_set, so a
    # boilerplate mega-bucket never materializes as one giant array in
    # a single aggregation buffer (a post-hoc size filter would bound
    # only the pair explosion, not executor memory).  Distinct-based —
    # not count(*) — because the guard's semantics are "more than
    # max_bucket distinct docs in the bucket": a caller passing sigs
    # with duplicate rows per doc must not get buckets dropped early.
    # approx_count_distinct (HLL++, rsd 5%) instead of exact
    # countDistinct: the guard only needs "roughly > cap", and the
    # exact form costs a second shuffle of every (band, bucket, key)
    # triple — at 100 TB that dedup pass IS a full-table shuffle.  The
    # sketch is map-side combinable in ONE aggregation pass.  Tolerance:
    # HLL++ counts small sets exactly (sparse mode covers any sane
    # max_bucket); in the large-count regime the ±5% relative error
    # moves the effective cap to max_bucket*(1±0.05), which only shifts
    # WHERE an already-degenerate mega-bucket is cut off.
    hot = (buckets.groupBy("band", "bucket")
           .agg(F.approx_count_distinct(key_col, rsd=0.05).alias("_n"))
           .filter(F.col("_n") > max_bucket)
           .select("band", "bucket"))
    buckets = buckets.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    grouped = (buckets.groupBy("band", "bucket")
               .agg(F.array_sort(F.collect_set(key_col)).alias("ks"))
               .filter(F.size("ks") >= 2))
    # narrow pair expansion: for each id at position i, pair it with
    # every later id — flatten(transform x transform) stays inside
    # whole-stage codegen, no join
    ks = F.col("ks")
    pairs_arr = F.flatten(F.transform(
        ks,
        lambda x, i: F.transform(
            F.slice(ks, i + 2, F.greatest(F.size(ks) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("left_id"), y.alias("right_id")))))
    return (grouped.select(F.explode(pairs_arr).alias("p"))
            .select("p.left_id", "p.right_id")
            .distinct())


def simhash(df: DataFrame, text_col: str = "text",
            key_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per-token hash bits vote ±1; sign per bit.

    Uses the first ``bits`` hex digits of md5(token) — digit >= 8 votes
    +1 (its high bit), else -1.  Returns ``simhash`` as a bit string.
    Explode → single groupBy with ``bits`` conditional-sum aggregates.
    """
    toks = _tokens(F.col(text_col))
    exploded = _spread(df).select(key_col, F.explode(toks).alias("tok")) \
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
                        n: int = 3, threshold: float = 0.0,
                        max_postings: int | None = 10_000) -> DataFrame:
    """n-gram Jaccard similarity for candidate pairs (or all pairs of a
    *small* df if ``pairs`` is None — the verifier, not the scale path).

    Implemented as shingle explode + self-equi-join on shingle + count
    distinct intersections over union — no quadratic cross join.

    ``max_postings`` bounds the self-join: shingles appearing in more
    than that many documents (stop-shingles / boilerplate) are removed
    via a broadcast anti-join before the pair expansion — one hot
    shingle would otherwise contribute O(postings²) join rows.  The
    stop-shingle list is tiny by construction (only pathological keys
    cross the cap), so it broadcasts.  Jaccard keeps the FULL shingle
    counts in the denominator, so dropped shingles can only lower a
    pair's score (a conservative bound), never raise it.
    """
    toks = _tokens(F.col(text_col))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingles = F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")))
    sh = _spread(df).select(F.col(key_col), F.explode(shingles).alias("sh"),
                            F.size(shingles).alias("n_sh"))
    if max_postings is not None:
        hot = (sh.groupBy("sh")
               .agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > max_postings)
               .select("sh"))
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    if pairs is not None:
        # restrict the self-join to DOCUMENTS that appear in a candidate
        # pair BEFORE expanding: the verifier's work must scale with the
        # LSH survivors, not the corpus (the pair-level semi-join below
        # would otherwise discard corpus-scale join output).  Per-doc
        # shingle counts (n_sh) are computed per row above, so the
        # Jaccard denominator is unaffected.
        cand = (pairs.select(F.col("left_id").alias(key_col))
                .union(pairs.select(F.col("right_id").alias(key_col)))
                .distinct())
        sh = sh.join(cand, key_col, "left_semi")
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


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., 'Connected Components in
    MapReduce and Beyond'): every node connects its strictly-LARGER
    neighbours to the minimum of its closed neighbourhood."""
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
    g = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    return (sym.join(g, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"),
                    F.least(F.col("src"), F.col("_mn")).alias("dst"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient each edge large→small, then every node
    connects its (all-smaller) neighbours AND itself to the minimum."""
    oriented = edges.select(F.greatest("src", "dst").alias("src"),
                            F.least("src", "dst").alias("dst"))
    g = oriented.groupBy("src").agg(F.min("dst").alias("_mn"))
    nbrs = (oriented.join(g, "src")
            .select(F.col("dst").alias("v"), F.col("_mn")))
    selfs = g.select(F.col("src").alias("v"), F.col("_mn"))
    return (nbrs.unionByName(selfs)
            .filter(F.col("v") != F.col("_mn"))
            .select(F.col("v").alias("src"), F.col("_mn").alias("dst"))
            .distinct())


def dedup_clusters(pairs: DataFrame, key_col: str = "doc_id",
                   max_iter: int = 25,
                   stats: dict | None = None) -> DataFrame:
    """Resolve candidate duplicate PAIRS into duplicate CLUSTERS:
    connected components with the minimum member id as the canonical
    representative.  Returns (key_col, cluster_id) for every id that
    appears in ``pairs``; keep rows where id == cluster_id to pick one
    representative per group.

    Algorithm: alternating large-star/small-star contraction (Kiveris
    et al. 2014) — each round is two groupBy+join passes, and the edge
    set contracts toward per-component stars in O(log d) rounds for
    diameter-d graphs (plain min-label propagation needs d rounds, so a
    chain-shaped duplicate graph would blow the iteration budget).
    Each round ``localCheckpoint``s the new edge set — a plain persist
    keeps the full logical plan, which doubles in size every round
    (union + two joins + distinct per star), so by round ~15 the plan
    string alone exceeds 2 GB and planning dominates; the checkpoint
    truncates lineage to the materialized blocks, keeping per-round
    planning O(1).  On a real cluster the same loop would use reliable
    ``checkpoint()`` to HDFS for fault tolerance; executor-local blocks
    are the right trade in a single-host session.  Superseded rounds'
    blocks are GC-reclaimed with their DataFrames (ContextCleaner); the
    loop additionally materializes only via the convergence-signature
    aggregate, one action per round.

    Raises :class:`RuntimeError` if ``max_iter`` rounds pass without
    convergence — silently returning unconverged labels would split one
    duplicate group into several and under-merge.  ``stats`` (optional
    dict) receives {"rounds": k, "converged": bool} for observability.
    """
    e = (pairs.select(F.col("left_id").alias("src"),
                      F.col("right_id").alias("dst"))
         .filter(F.col("src") != F.col("dst")))
    edges = e.distinct().localCheckpoint(eager=True)

    def sig(d: DataFrame) -> tuple:
        # bit_xor fold of per-edge hashes: commutative, duplicate-free
        # input (edges are distinct), and — unlike sum — cannot overflow
        # under ANSI mode
        r = d.agg(F.count("*").alias("n"),
                  F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"),
                             F.lit(0)).alias("h")).collect()[0]
        return (r["n"], r["h"])

    prev = None
    rounds = 0
    converged = False
    for _ in range(max_iter):
        rounds += 1
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = sig(edges)
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds — "
            "raise max_iter (log2(component diameter) + ~3 suffices)")
    # at convergence the edge set is a star forest: (member, root)
    roots = edges.select(F.col("dst").alias("src"),
                         F.col("dst").alias("dst")).distinct()
    return (edges.unionByName(roots)
            .select(F.col("src").alias(key_col),
                    F.col("dst").alias("cluster_id")))


def embedding_near_dups(df: DataFrame, threshold: float = 0.2,
                        n_planes: int = 6, dim: int = 64,
                        vec_col: str = "embedding", key_col: str = "vec_id",
                        max_bucket: int = 2000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    The quadratic all-pairs cosine is cut to within-bucket pairs by the
    hyperplane LSH of :func:`~vcf2parquet_spark.functions.similarity.
    lsh_buckets` (near-identical vectors share all sign bits, so true
    near-dups land in the same bucket); the only wide shuffle is the
    self-equi-join on the bucket key.  Buckets larger than
    ``max_bucket`` are dropped first via a broadcast anti-join on the
    (tiny) hot-bucket list — without the cap, a degenerate embedding
    cluster makes the within-bucket pair count O((N/2^planes)²) at
    scale.  Returns (id_a, id_b, score) with id_a < id_b, score =
    cosine rounded to 6.
    """
    from vcf2parquet_spark.functions.similarity import (
        _dot, _norm, lsh_buckets)

    buckets = lsh_buckets(df, n_planes=n_planes, dim=dim,
                          vec_col=vec_col, key_col=key_col)
    hot = (buckets.groupBy("bucket")
           .agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > max_bucket)
           .select("bucket"))
    buckets = buckets.join(F.broadcast(hot), "bucket", "left_anti")
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
