"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every implemented operator family (SURVEY.md §2 +
the training-pipeline additions) onto the driver's testdata tables;
``oracle_sql()`` gives the DuckDB-equivalent for each.  Column names
and types are aligned on both sides (aggregates aliased identically;
sums cast to BIGINT, floats rounded) so the driver's order-insensitive
value-hash comparison is exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _doc(spark: SparkSession, sf_dir: str, name: str = "documents") -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# §2 op 2/19 + added profiling: column statistics (the codec-selection input)
def q_profile_stats(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return (df.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("source").alias("n_sources"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 F.sum("n_chars").alias("sum_chars")))


# added op: dictionary-code projection (dict codec semantics)
def q_dict_codes(spark, sf_dir):
    df = _doc(spark, sf_dir)
    dict_df = (df.select("lang").distinct()
               .withColumn("lang_code",
                           F.dense_rank().over(
                               Window.orderBy("lang")) - 1))
    return (df.join(F.broadcast(dict_df), "lang")
            .select("doc_id", "lang", "lang_code"))


# added op: run-length structure (RLE codec semantics) over a sorted scan
def q_rle_runs(spark, sf_dir):
    df = _doc(spark, sf_dir)
    w = Window.partitionBy("source").orderBy("doc_id")
    runs = (df.select("source", "doc_id", "lang")
            .withColumn("prev", F.lag("lang").over(w))
            .withColumn("is_start",
                        F.when(F.col("prev").isNull()
                               | (F.col("prev") != F.col("lang")), 1)
                        .otherwise(0)))
    return (runs.groupBy("source")
            .agg(F.sum("is_start").cast("long").alias("n_runs"),
                 F.count("*").alias("n_rows")))


# §2 op 4: explode (one row per element)
def q_explode_tokens(spark, sf_dir):
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 20)
    return (df.select("doc_id",
                      F.explode(F.split("text", " ")).alias("token"))
            .groupBy("doc_id", "token")
            .agg(F.count("*").alias("n")))


# §2 op 6: array-index projection (element_at by declared position)
def q_element_projection(spark, sf_dir):
    df = _doc(spark, sf_dir, "embeddings")
    return df.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", 64).cast("double").alias("last_dim"),
        F.element_at("embedding", F.col("label") + 1).cast("double")
         .alias("label_dim"))


# §2 op 7: array-slice projection (keep [first, indexed] pair).  The
# slice is built as a real array column, then posexploded to scalar
# (pos, val) rows so the driver's canonicalizer can sort the output
# (list cells are unsortable in pandas — CORRECTNESS_r01).
def q_array_slice(spark, sf_dir):
    df = _doc(spark, sf_dir, "embeddings")
    pair = F.array(F.element_at("embedding", 1),
                   F.element_at("embedding", F.col("label") + 2)) \
            .cast("array<double>")
    return df.select("vec_id", F.posexplode(pair).alias("pos", "val"))


# §2 op 8: genotype-index projection — the reference's G-cardinality
# rule (name2data.rs:130-152): if len == n(n+1)/2 keep indices
# [0, (a^2+3a+2)/2, (a^2+5a+4)/2] for alt index a, else fall back.
# Exercised here with the embeddings table: len=64, a = label (0..9).
def q_g_projection(spark, sf_dir):
    df = _doc(spark, sf_dir, "embeddings")
    a = F.col("label")
    i1 = ((a * a + 3 * a + 2) / 2).cast("int")
    i2 = ((a * a + 5 * a + 4) / 2).cast("int")
    n = F.size("embedding")
    triangular = (n * (n + 1) / 2) % 1 == 0   # always true; mirrors shape
    proj = F.when(
        (i2 < n) & triangular,
        F.array(F.element_at("embedding", 1),
                F.element_at("embedding", i1 + 1),
                F.element_at("embedding", i2 + 1)).cast("array<double>")
    ).otherwise(F.array().cast("array<double>"))   # missing -> empty list
    # posexplode -> scalar rows (empty list = zero rows), sortable by the
    # driver's canonicalizer
    return df.select("vec_id", F.posexplode(proj).alias("pos", "val"))


def _corpus_df(spark, sf_dir):
    """THE corpus adapter: documents reshaped to the input_hint columns
    (repo, path, commit, lang, content).  Single definition — five
    roundtrip/source queries and their DuckDB oracles assume exactly
    this mapping, so it must never be edited in one site only."""
    return _doc(spark, sf_dir).select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"))


# §2 ops 1-3: compressed source scan + schema application + record parse.
# The documents table is reshaped to the corpus schema, written as
# gzip jsonl, read back through sources.read_corpus (explicit schema,
# Spark-native decompression), and aggregated; the oracle computes the
# same aggregate from the original table — any scan/parse corruption
# breaks the hash match.
def q_source_scan(spark, sf_dir):
    import tempfile

    from vcf2parquet_spark.sources import read_corpus, write_corpus
    d = tempfile.mkdtemp(prefix="vp_src_") + "/docs_jsonl"
    df = _corpus_df(spark, sf_dir)
    write_corpus(df, d, fmt="jsonl", compression="gzip")
    back = read_corpus(spark, d, fmt="jsonl")
    return back.groupBy("repo").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.length("content")).cast("long").alias("content_chars"),
        F.countDistinct("commit").alias("n_distinct_texts"))


# §2 ops 10+11: flag widening + missing-value defaulting (coalesce)
def q_flag_defaulting(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return df.select(
        "doc_id",
        F.coalesce(F.nullif(F.col("lang"), F.lit("en")), F.lit("_default_"))
         .alias("lang_or_default"),
        F.when(F.col("lang") == "en", True).otherwise(False).alias("is_en"))


# §2 op 12: bespoke per-element string rewrite (GT-recode analogue) via
# higher-order functions
def q_token_recode(spark, sf_dir):
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 50)
    toks = F.split(F.col("text"), " ")
    recoded = F.transform(
        toks, lambda x: F.when(x == F.element_at(toks, 1), F.lit("1"))
                         .otherwise(F.lit("0")))
    return df.select("doc_id", F.array_join(recoded, "").alias("recode"))


# §2 op 14: batching (rows -> fixed-size blocks)
def q_batching(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return (df.withColumn("block_idx", (F.col("doc_id") / 100).cast("long"))
            .groupBy("block_idx")
            .agg(F.count("*").alias("n_rows"),
                 F.sum("n_chars").alias("block_bytes")))


# added op: partition planning with hot-key fanout (skew salting)
def q_partition_plan(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return (df.groupBy("source")
            .agg(F.count("*").alias("n_rows"))
            .withColumn("fanout",
                        F.ceil(F.col("n_rows") / 100.0).cast("long")))


# added op: frame-of-reference / bit-pack width planning on int stats
def q_for_width(spark, sf_dir):
    df = _doc(spark, sf_dir)
    agg = (df.groupBy("source")
           .agg(F.min("n_chars").alias("ref"),
                F.max("n_chars").alias("max_val")))
    rng = F.col("max_val") - F.col("ref")
    return agg.select(
        "source", "ref", "max_val",
        F.when(rng == 0, 0)
         .otherwise(F.floor(F.log2(rng.cast("double"))) + 1)
         .cast("long").alias("bit_width"))


# added op: codec auto-selection (profile -> codec rule table, SQL-expressible
# slice: dict from cardinality, then long strings (mean length >= 256 B) to
# plain+brotli-9, short to FSST — mirrors select.py's round-4 default rules)
def q_codec_plan(spark, sf_dir):
    df = _doc(spark, sf_dir)
    stats = []
    for c in ("lang", "source", "text"):
        stats.append(df.agg(
            F.lit(c).alias("column"),
            F.count(c).alias("n"),
            F.countDistinct(c).alias("n_distinct"),
            F.round(F.avg(F.length(c)), 4).alias("avg_len")))
    prof = stats[0]
    for s in stats[1:]:
        prof = prof.unionByName(s)
    ratio = F.col("n_distinct") / F.col("n")
    return prof.select(
        "column", "n", "n_distinct", "avg_len",
        F.when((ratio <= 0.05) | (F.col("n_distinct") <= 256), "dict")
         .when(F.col("avg_len") >= 256, "plain+brotli9")
         .otherwise("fsst+zlib").alias("codec"))


# added op: float-column codec auto-selection (profile -> rule slice;
# mirrors select.py's float rules: low cardinality -> dict, else plain)
def q_float_codec_plan(spark, sf_dir):
    df = _doc(spark, sf_dir, "embeddings")
    cols = {"first_dim": F.element_at("embedding", 1).cast("double"),
            "label_f": F.col("label").cast("double")}
    stats = []
    for name, col in cols.items():
        stats.append(df.agg(
            F.lit(name).alias("column"),
            F.count(col).alias("n"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).alias("min_v"),
            F.max(col).alias("max_v")))
    prof = stats[0]
    for s in stats[1:]:
        prof = prof.unionByName(s)
    ratio = F.col("n_distinct") / F.col("n")
    return prof.select(
        "column", "n", "n_distinct", "min_v", "max_v",
        F.when((ratio <= 0.05) | (F.col("n_distinct") <= 256), "dict")
         .otherwise("plain").alias("codec"))


# ------------------------------------------------- training-pipeline ops
def q_dedup_exact(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return (df.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.count("*").alias("dup_count"),
                 F.min("doc_id").alias("keep_id"))
            .groupBy()
            .agg(F.count("*").alias("n_groups"),
                 F.sum(F.col("dup_count") - 1).cast("long").alias("n_redundant"),
                 F.max("dup_count").alias("max_group")))


def q_fingerprint(spark, sf_dir):
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 100)
    toks = F.array_sort(F.array_distinct(F.split(F.lower("text"), " ")))
    return df.select("doc_id", F.md5(F.array_join(toks, " ")).alias("fingerprint"))


def q_minhash_sig(spark, sf_dir):
    from vcf2parquet_spark.functions.dedup import minhash_signatures
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 100)
    # md5 family: engine-portable digests the DuckDB oracle reproduces
    # bit-identically (the default xxhash64 family is the scale path)
    return minhash_signatures(df, k=4, shingle=3, hash_fn="md5").select(
        "doc_id", "sig_0", "sig_1", "sig_2", "sig_3")


def q_simhash(spark, sf_dir):
    from vcf2parquet_spark.functions.dedup import simhash
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 100)
    return simhash(df, bits=8)


def q_ngram_jaccard(spark, sf_dir):
    from vcf2parquet_spark.functions.dedup import ngram_jaccard_pairs
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 40)
    return ngram_jaccard_pairs(df, n=2, threshold=0.05)


def q_dedup_clusters(spark, sf_dir):
    """Candidate pairs -> duplicate clusters (connected components, min
    member id as representative) — the dedup group-resolution step that
    turns pairwise LSH hits into keep/drop decisions."""
    from vcf2parquet_spark.functions.dedup import (
        dedup_clusters, ngram_jaccard_pairs)
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 40)
    pairs = ngram_jaccard_pairs(df, n=2, threshold=0.05) \
        .select("left_id", "right_id")
    return dedup_clusters(pairs)


def q_token_subwords(spark, sf_dir):
    """BPE-ish subword-count estimate (words + punctuation + digit
    groups) from functions.text.token_stats."""
    from vcf2parquet_spark.functions.text import token_stats
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 200)
    return token_stats(df).select("doc_id", "n_subwords")


def q_token_stats(spark, sf_dir):
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 200)
    toks = F.split(F.lower("text"), " ")
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"))


def q_quality(spark, sf_dir):
    df = _doc(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    diversity = F.size(F.array_distinct(toks)) / F.size(toks)
    return df.select(
        "doc_id",
        F.round(diversity, 4).alias("diversity"),
        (F.length("text") >= 100).alias("len_ok"))


def q_langid(spark, sf_dir):
    df = _doc(spark, sf_dir)
    toks = F.split(F.lower("text"), " ")
    markers = F.array(F.lit("the"), F.lit("value"), F.lit("data"),
                      F.lit("table"), F.lit("fast"))
    ratio = F.size(F.array_intersect(toks, markers)) / F.size(toks)
    return df.select(
        "doc_id",
        F.when(ratio >= 0.05, "en").otherwise("other").alias("pred_lang"))


def q_cosine_topk(spark, sf_dir):
    from vcf2parquet_spark.functions.similarity import cosine_topk
    emb = _doc(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return cosine_topk(emb, queries, k=3)


def q_ann_buckets(spark, sf_dir):
    from vcf2parquet_spark.functions.similarity import lsh_buckets
    emb = _doc(spark, sf_dir, "embeddings")
    return lsh_buckets(emb, n_planes=6, dim=64)


def q_embedding_near_dups(spark, sf_dir):
    from vcf2parquet_spark.functions.dedup import embedding_near_dups
    emb = _doc(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.2, n_planes=6, dim=64)


def q_ivf_assign(spark, sf_dir):
    from vcf2parquet_spark.functions.similarity import ivf_assign
    emb = _doc(spark, sf_dir, "embeddings")
    return ivf_assign(emb, n_centroids=8, dim=64)


def q_ivf_topk(spark, sf_dir):
    from vcf2parquet_spark.functions.similarity import ivf_topk
    emb = _doc(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    return ivf_topk(emb, queries, k=3, nprobe=2, n_centroids=8, dim=64)


def q_multimodal_meta(spark, sf_dir):
    df = _doc(spark, sf_dir)
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long")
         .alias("n_bytes"),
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("checksum"))


def _roundtrip_matched(df: DataFrame, decoded: DataFrame) -> DataFrame:
    """MULTISET compare of input vs decoded (repo, path, sha256(content))
    rows: per-key group counts on both sides, FULL-OUTER-joined; a key
    contributes its row count only when both sides agree EXACTLY, and
    any disagreeing key (dropped rows, over-emitted duplicates, or a
    spurious key on either side) contributes -1 — so the total can
    equal count(*)+1 only if the decoded multiset is identical to the
    input multiset.  (The round-4 inner-join + least(n_a, n_b) form
    detected drops but not over-emission: a decoder double-emitting an
    existing row still summed to the input count.)"""
    def counted(d, side):
        return (d.groupBy("repo", "path",
                          F.sha2("content", 256).alias("sha"))
                .agg(F.count("*").alias(side)))
    j = (counted(df, "n_a").join(counted(decoded, "n_b"),
                                 ["repo", "path", "sha"], "full_outer")
         .select(F.coalesce("n_a", F.lit(0)).alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).alias("n_b")))
    return j.agg(F.coalesce(
        F.sum(F.when(F.col("n_a") == F.col("n_b"), F.col("n_a"))
              .otherwise(F.lit(-1))), F.lit(0))
        .cast("long").alias("n_matched"))


def q_encode_roundtrip(spark, sf_dir):
    """Flagship: full encode + decode + per-row sha256 match count over
    the driver's own documents table (reshaped to corpus columns, the
    same adapter as q_source_scan) — plus one deliberately DUPLICATED
    row, so the multiset compare proves duplicates survive encode/decode
    as distinct rows.  Every row must survive the codec kernels
    bit-identically for n_matched to equal count(*) + 1 — which is
    exactly what the DuckDB oracle asserts, mirroring the reference's
    golden end-to-end (/root/reference/src/lib.rs:127-257)."""
    import tempfile

    from vcf2parquet_spark import encode
    from vcf2parquet_spark.decode import decode as dec

    out = tempfile.mkdtemp(prefix="vp_entry_") + "/blocks"
    df = _corpus_df(spark, sf_dir)
    df = df.unionByName(df.filter(F.col("path") == "0"))  # injected dup
    encode(spark, df, out, batch_size=1000, target_rows=1000)
    decoded = dec(spark, out)
    return _roundtrip_matched(df, decoded)


def q_clustered_roundtrip(spark, sf_dir):
    """Same end-to-end guarantee as q_encode_roundtrip, through the
    shuffle-free clustered path: the corpus-shaped documents table is
    materialized as a small-rowgroup parquet table (the physical layout
    an Iceberg partition would present), encoded by rowgroup range with
    encode_clustered — content bytes never transit the JVM — then
    decoded and sha256-matched as a MULTISET (one deliberately
    duplicated row included).  n_matched == count(*) + 1 iff every row
    survives bit-identically (reference golden end-to-end:
    /root/reference/src/lib.rs:127-257)."""
    import tempfile

    from vcf2parquet_spark import encode_clustered
    from vcf2parquet_spark.decode import decode as dec

    base = tempfile.mkdtemp(prefix="vp_entry_cl_")
    src, out = base + "/src_pq", base + "/blocks"
    df = _corpus_df(spark, sf_dir)
    df = df.unionByName(df.filter(F.col("path") == "0"))  # injected dup
    (df.repartition(4).write.mode("overwrite")
       .option("parquet.block.size", 256 * 1024).parquet(src))
    encode_clustered(spark, src, out, batch_size=1000, target_rows=1000)
    decoded = dec(spark, out)
    return _roundtrip_matched(spark.read.parquet(src), decoded)


def _entry_corpus_blocks(spark, sf_dir, prefix):
    """Shared adapter: documents reshaped to corpus columns, encoded to
    a fresh blocks table (the same shape q_encode_roundtrip proves
    bit-identical)."""
    import tempfile

    from vcf2parquet_spark import encode

    out = tempfile.mkdtemp(prefix=prefix) + "/blocks"
    df = _corpus_df(spark, sf_dir)
    encode(spark, df, out, batch_size=1000, target_rows=1000)
    return out


def q_datasource_read(spark, sf_dir):
    """The encoded table read back through the ``vcfblocks`` Spark data
    source (pyspark 4.1 Python Data Source API — datasource.py) with
    the ``columns`` option pruning the block read to (lang, content):
    per-lang row counts and total content chars must match DuckDB over
    the raw documents table, proving the format's plan + decode path
    end-to-end for any ``spark.read.format(...)`` consumer."""
    from vcf2parquet_spark.datasource import read_blocks

    out = _entry_corpus_blocks(spark, sf_dir, "vp_entry_ds_")
    ds = read_blocks(spark, out, columns=["lang", "content"])
    return (ds.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.length("content")).cast("long")
                  .alias("total_chars")))


def q_datasource_pushdown(spark, sf_dir):
    """Partition-filter pushdown through the data source: Catalyst
    hands the scan ``size_bytes > 300``; ``pushFilters`` prunes
    committed partitions via the manifest min/max bounds and Spark
    re-applies the exact predicate on decoded rows (partial pushdown —
    the Iceberg model), so the aggregate must equal DuckDB computing
    the same predicate from the raw text."""
    from vcf2parquet_spark.datasource import read_blocks

    out = _entry_corpus_blocks(spark, sf_dir, "vp_entry_dsf_")
    ds = read_blocks(spark, out, include_derived=True)
    return (ds.filter(F.col("size_bytes") > 300)
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("n_lines").cast("long").alias("total_lines")))


def q_datasource_write(spark, sf_dir):
    """The WRITE half of the data source: the corpus-shaped documents
    table (plus one deliberately duplicated row) written with
    ``df.write.format("vcfblocks").mode("append")`` — each task runs the
    same profile → codec-select → kernel pipeline as encode(), and the
    driver maps Spark's job-commit onto one snapshot — then decoded and
    sha256 MULTISET-matched.  n_matched == count(*) + 1 iff every row
    survives the standard-API write path bit-identically."""
    import tempfile

    from vcf2parquet_spark.datasource import register_data_source
    from vcf2parquet_spark.decode import decode as dec

    register_data_source(spark)
    out = tempfile.mkdtemp(prefix="vp_entry_dsw_") + "/blocks"
    df = _corpus_df(spark, sf_dir)
    df = df.unionByName(df.filter(F.col("path") == "0"))  # injected dup
    (df.repartition(4, "repo").write.format("vcfblocks")
       .option("batch_size", 1000).mode("append").save(out))
    return _roundtrip_matched(df, dec(spark, out))


def q_datasource_prune_ops(spark, sf_dir):
    """Round-5 pushdown breadth through the data source: Catalyst hands
    the scan ``repo IN (...) AND path LIKE '1%' AND lang IS NOT NULL``;
    ``pushFilters`` answers IN and the LIKE-prefix from the manifest
    min/max bounds and IS NOT NULL from the per-partition null counts,
    pruning committed partitions before any block byte is read, and
    Spark re-applies the exact predicates on decoded rows (partial
    pushdown, the Iceberg model) — so the aggregate must equal DuckDB
    computing the same predicate over the raw documents."""
    from vcf2parquet_spark.datasource import read_blocks

    out = _entry_corpus_blocks(spark, sf_dir, "vp_entry_dsp_")
    ds = read_blocks(spark, out)
    return (ds.filter(F.col("repo").isin("src1", "src7", "src12"))
            .filter(F.col("path").startswith("1"))
            .filter(F.col("lang").isNotNull())
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum(F.length("content")).cast("long")
                  .alias("total_chars")))


def q_datasource_stream(spark, sf_dir):
    """The STREAMING-source half of the data source: the encoded
    corpus-shaped documents table (one deliberately duplicated row)
    tailed with ``spark.readStream.format("vcfblocks")`` — offsets are
    snapshot ids, each micro-batch decodes the partitions new snapshots
    introduced — through an availableNow trigger into a memory sink,
    then sha256 MULTISET-matched against the input.  n_matched ==
    count(*) + 1 iff every row arrives through the streaming read path
    exactly once and bit-identical."""
    import tempfile
    import uuid

    from vcf2parquet_spark import encode
    from vcf2parquet_spark.datasource import register_data_source

    register_data_source(spark)
    base = tempfile.mkdtemp(prefix="vp_entry_dst_")
    out, cp = base + "/blocks", base + "/cp"
    df = _corpus_df(spark, sf_dir)
    df = df.unionByName(df.filter(F.col("path") == "0"))  # injected dup
    encode(spark, df, out, batch_size=1000, target_rows=1000)
    name = "vp_tail_" + uuid.uuid4().hex[:8]
    q = (spark.readStream.format("vcfblocks").load(out)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", cp)
         .trigger(availableNow=True).start())
    if not q.awaitTermination(600):
        # a timeout would leave the memory sink partially filled and
        # surface downstream as a value-hash mismatch that looks like a
        # decode-path bug; fail attributably instead
        q.stop()
        raise TimeoutError(
            "vcfblocks availableNow stream did not finish within 600s "
            "(throttled host?) — datasource_stream result would be "
            "partial")
    return _roundtrip_matched(df, spark.table(name))


def q_media_features(spark, sf_dir):
    """Feature-extraction pipeline, projected to scalar rows: the
    float32 histogram feature is de-normalized back to its exact
    integer byte count (round(f * n_bytes)) so the driver's value-hash
    compares integers, not float32-vs-float64 artifacts."""
    from vcf2parquet_spark.functions.multimodal import (
        extract_features, make_media_df)
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 50)
    media = make_media_df(spark, df, payload_col="text")
    feats = extract_features(media, dim=8)
    return (feats
            .select("media_id", "n_bytes", "checksum",
                    F.posexplode("feature").alias("dim_idx", "f"))
            .select("media_id", "n_bytes", "checksum", "dim_idx",
                    F.round(F.col("f") * F.col("n_bytes")).cast("long")
                     .alias("n_hits")))


def q_media_resize(spark, sf_dir):
    from vcf2parquet_spark.functions.multimodal import (
        make_media_df, resize_media)
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 50)
    media = make_media_df(spark, df, payload_col="text")
    return resize_media(media, width=8, height=8).select(
        "media_id", "width", "height",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("checksum"))


def q_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing, aggregated so DuckDB can oracle it with
    plain arithmetic (frame count + sampled-byte total per media)."""
    from vcf2parquet_spark.functions.multimodal import (
        make_media_df, sample_frames)
    df = _doc(spark, sf_dir).filter(F.col("doc_id") < 50)
    media = make_media_df(spark, df, payload_col="text")
    frames = sample_frames(media, every_n=4, frame_bytes=256)
    return (frames.groupBy("media_id")
            .agg(F.count("*").cast("long").alias("n_sampled"),
                 F.sum("n_bytes").alias("sampled_bytes")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: profile + codec plan."""
    return q_codec_plan(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_stats": q_profile_stats,
        "dict_codes": q_dict_codes,
        "rle_runs": q_rle_runs,
        "explode_tokens": q_explode_tokens,
        "element_projection": q_element_projection,
        "array_slice": q_array_slice,
        "g_projection": q_g_projection,
        "source_scan": q_source_scan,
        "flag_defaulting": q_flag_defaulting,
        "token_recode": q_token_recode,
        "batching": q_batching,
        "partition_plan": q_partition_plan,
        "for_width": q_for_width,
        "codec_plan": q_codec_plan,
        "float_codec_plan": q_float_codec_plan,
        "dedup_exact": q_dedup_exact,
        "fingerprint": q_fingerprint,
        "minhash_sig": q_minhash_sig,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_clusters": q_dedup_clusters,
        "token_stats": q_token_stats,
        "token_subwords": q_token_subwords,
        "quality": q_quality,
        "langid": q_langid,
        "cosine_topk": q_cosine_topk,
        "ann_buckets": q_ann_buckets,
        "embedding_near_dups": q_embedding_near_dups,
        "ivf_assign": q_ivf_assign,
        "ivf_topk": q_ivf_topk,
        "multimodal_meta": q_multimodal_meta,
        "encode_roundtrip": q_encode_roundtrip,
        "clustered_roundtrip": q_clustered_roundtrip,
        "datasource_read": q_datasource_read,
        "datasource_pushdown": q_datasource_pushdown,
        "datasource_prune_ops": q_datasource_prune_ops,
        "datasource_write": q_datasource_write,
        "datasource_stream": q_datasource_stream,
        "media_features": q_media_features,
        "media_resize": q_media_resize,
        "frame_sample": q_frame_sample,
    }


# SQL mirror of similarity.ivf_seed_centroids (same closed form) and of
# ivf_assign's rounded squared-L2 distance — shared by both IVF oracles.
_IVF_CENT_SQL = """
    SELECT CAST(j AS INT) AS centroid_id,
           list_transform(generate_series(0, 63),
             i -> CAST(((23*j + 7*i) % 13) - 6 AS DOUBLE)) AS cvec
    FROM (SELECT unnest(generate_series(0, 7)) AS j) t
"""
_IVF_DIST_SQL = """
    round(list_sum(list_transform(generate_series(1, 64),
      i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
         * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))), 4)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "profile_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   round(avg(n_chars), 4) AS avg_chars,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "dict_codes": """
            WITH d AS (
              SELECT lang, dense_rank() OVER (ORDER BY lang) - 1 AS lang_code
              FROM (SELECT DISTINCT lang FROM documents)
            )
            SELECT doc_id, documents.lang, CAST(d.lang_code AS INT) AS lang_code
            FROM documents JOIN d ON documents.lang = d.lang
        """,
        "rle_runs": """
            WITH r AS (
              SELECT source, doc_id, lang,
                     lag(lang) OVER (PARTITION BY source ORDER BY doc_id) AS prev
              FROM documents
            )
            SELECT source,
                   CAST(sum(CASE WHEN prev IS NULL OR prev <> lang
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
                   count(*) AS n_rows
            FROM r GROUP BY source
        """,
        "explode_tokens": """
            SELECT doc_id, token, count(*) AS n FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents WHERE doc_id < 20
            ) GROUP BY doc_id, token
        """,
        "element_projection": """
            SELECT vec_id,
                   CAST(embedding[1] AS DOUBLE) AS first_dim,
                   CAST(embedding[64] AS DOUBLE) AS last_dim,
                   CAST(embedding[label + 1] AS DOUBLE) AS label_dim
            FROM embeddings
        """,
        "array_slice": """
            SELECT vec_id, CAST(i - 1 AS INT) AS pos,
                   CASE WHEN i = 1 THEN CAST(embedding[1] AS DOUBLE)
                        ELSE CAST(embedding[label + 2] AS DOUBLE) END AS val
            FROM embeddings,
                 (SELECT unnest(generate_series(1, 2)) AS i) g
        """,
        "g_projection": """
            SELECT vec_id, CAST(i - 1 AS INT) AS pos,
                   CAST(embedding[
                     CASE WHEN i = 1 THEN 1
                          WHEN i = 2 THEN
                            CAST((label*label + 3*label + 2) / 2 AS INT) + 1
                          ELSE
                            CAST((label*label + 5*label + 4) / 2 AS INT) + 1
                     END] AS DOUBLE) AS val
            FROM embeddings,
                 (SELECT unnest(generate_series(1, 3)) AS i) g
            WHERE CAST((label*label + 5*label + 4) / 2 AS INT)
                  < len(embedding)
        """,
        "source_scan": """
            SELECT source AS repo, count(*) AS n_rows,
                   CAST(sum(length(text)) AS BIGINT) AS content_chars,
                   count(DISTINCT md5(text)) AS n_distinct_texts
            FROM documents GROUP BY source
        """,
        "flag_defaulting": """
            SELECT doc_id,
                   coalesce(nullif(lang, 'en'), '_default_') AS lang_or_default,
                   coalesce(lang = 'en', FALSE) AS is_en
            FROM documents
        """,
        "token_recode": """
            SELECT doc_id,
                   array_to_string(
                     list_transform(string_split(text, ' '),
                       x -> CASE WHEN x = string_split(text, ' ')[1]
                                 THEN '1' ELSE '0' END), '') AS recode
            FROM documents WHERE doc_id < 50
        """,
        "batching": """
            SELECT CAST(floor(doc_id / 100) AS BIGINT) AS block_idx,
                   count(*) AS n_rows,
                   CAST(sum(n_chars) AS BIGINT) AS block_bytes
            FROM documents GROUP BY 1
        """,
        "partition_plan": """
            SELECT source, count(*) AS n_rows,
                   CAST(ceil(count(*) / 100.0) AS BIGINT) AS fanout
            FROM documents GROUP BY source
        """,
        "for_width": """
            SELECT source, min(n_chars) AS ref, max(n_chars) AS max_val,
                   CAST(CASE WHEN max(n_chars) - min(n_chars) = 0 THEN 0
                        ELSE floor(log2(CAST(max(n_chars) - min(n_chars)
                                             AS DOUBLE))) + 1 END
                        AS BIGINT) AS bit_width
            FROM documents GROUP BY source
        """,
        "codec_plan": """
            WITH prof AS (
              SELECT 'lang' AS column, count(lang) AS n,
                     count(DISTINCT lang) AS n_distinct,
                     round(avg(length(lang)), 4) AS avg_len FROM documents
              UNION ALL
              SELECT 'source', count(source), count(DISTINCT source),
                     round(avg(length(source)), 4)
              FROM documents
              UNION ALL
              SELECT 'text', count(text), count(DISTINCT text),
                     round(avg(length(text)), 4) FROM documents
            )
            SELECT "column", n, n_distinct, avg_len,
                   CASE WHEN n_distinct / CAST(n AS DOUBLE) <= 0.05
                             OR n_distinct <= 256
                        THEN 'dict'
                        WHEN avg_len >= 256 THEN 'plain+brotli9'
                        ELSE 'fsst+zlib' END AS codec
            FROM prof
        """,
        "float_codec_plan": """
            WITH prof AS (
              SELECT 'first_dim' AS column,
                     count(CAST(embedding[1] AS DOUBLE)) AS n,
                     count(DISTINCT CAST(embedding[1] AS DOUBLE))
                       AS n_distinct,
                     min(CAST(embedding[1] AS DOUBLE)) AS min_v,
                     max(CAST(embedding[1] AS DOUBLE)) AS max_v
              FROM embeddings
              UNION ALL
              SELECT 'label_f', count(CAST(label AS DOUBLE)),
                     count(DISTINCT CAST(label AS DOUBLE)),
                     min(CAST(label AS DOUBLE)), max(CAST(label AS DOUBLE))
              FROM embeddings
            )
            SELECT "column", n, n_distinct, min_v, max_v,
                   CASE WHEN n_distinct / CAST(n AS DOUBLE) <= 0.05
                             OR n_distinct <= 256
                        THEN 'dict' ELSE 'plain' END AS codec
            FROM prof
        """,
        "dedup_exact": """
            WITH g AS (
              SELECT md5(text) AS text_hash, count(*) AS dup_count,
                     min(doc_id) AS keep_id
              FROM documents GROUP BY md5(text)
            )
            SELECT count(*) AS n_groups,
                   CAST(sum(dup_count - 1) AS BIGINT) AS n_redundant,
                   max(dup_count) AS max_group
            FROM g
        """,
        "fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(
                     list_sort(list_distinct(string_split(lower(text), ' '))),
                     ' ')) AS fingerprint
            FROM documents WHERE doc_id < 100
        """,
        "minhash_sig": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
              FROM documents WHERE doc_id < 100
            ), sh AS (
              SELECT doc_id,
                     array_to_string(t[i:i+2], ' ') AS shingle
              FROM toks,
                   (SELECT unnest(generate_series(1, 2000)) AS i) idx
              WHERE i <= greatest(len(t) - 2, 1)
            )
            SELECT doc_id,
                   min(md5('0|' || shingle)) AS sig_0,
                   min(md5('1|' || shingle)) AS sig_1,
                   min(md5('2|' || shingle)) AS sig_2,
                   min(md5('3|' || shingle)) AS sig_3
            FROM sh GROUP BY doc_id
        """,
        "simhash": """
            WITH tok AS (
              SELECT doc_id, md5(unnest(string_split_regex(lower(text), '\\s+'))) AS h
              FROM documents WHERE doc_id < 100
            )
            SELECT doc_id, concat(
              CASE WHEN sum(CASE WHEN substr(h,1,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,2,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,3,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,4,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,5,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,6,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,7,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END,
              CASE WHEN sum(CASE WHEN substr(h,8,1) IN
                ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) >= 0
                THEN '1' ELSE '0' END) AS simhash
            FROM tok GROUP BY doc_id
        """,
        "ngram_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
              FROM documents WHERE doc_id < 40
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS sh
              FROM toks,
                   (SELECT unnest(generate_series(1, 2000)) AS i) idx
              WHERE i <= greatest(len(t) - 1, 1)
            ), sized AS (
              SELECT doc_id, sh, count(*) OVER (PARTITION BY doc_id) AS n_sh
              FROM sh
            ), inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     a.n_sh AS n_left, b.n_sh AS n_right,
                     count(*) AS n_common
              FROM sized a JOIN sized b USING (sh)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4
            )
            SELECT left_id, right_id, n_common,
                   round(n_common / CAST(n_left + n_right - n_common AS DOUBLE),
                         4) AS jaccard
            FROM inter
            WHERE round(n_common / CAST(n_left + n_right - n_common AS DOUBLE),
                        4) >= 0.05
        """,
        "dedup_clusters": """
            WITH RECURSIVE toks AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
              FROM documents WHERE doc_id < 40
            ), sh AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+1], ' ') AS sh
              FROM toks,
                   (SELECT unnest(generate_series(1, 2000)) AS i) idx
              WHERE i <= greatest(len(t) - 1, 1)
            ), sized AS (
              SELECT doc_id, sh, count(*) OVER (PARTITION BY doc_id) AS n_sh
              FROM sh
            ), inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     a.n_sh AS n_left, b.n_sh AS n_right,
                     count(*) AS n_common
              FROM sized a JOIN sized b USING (sh)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4
            ), pairs AS (
              SELECT left_id, right_id FROM inter
              WHERE round(n_common / CAST(n_left + n_right - n_common AS DOUBLE),
                          4) >= 0.05
            ), sym AS (
              SELECT left_id AS u, right_id AS v FROM pairs
              UNION
              SELECT right_id, left_id FROM pairs
            ), r(id, lab) AS (
              SELECT DISTINCT u, u FROM sym
              UNION
              SELECT s.u, r.lab FROM sym s JOIN r ON r.id = s.v
            )
            SELECT id AS doc_id, min(lab) AS cluster_id FROM r GROUP BY id
        """,
        "token_subwords": """
            SELECT doc_id,
                   CAST(len(string_split_regex(lower(text), '\\s+'))
                        + length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                        + len(string_split_regex(text, '[0-9]+')) - 1
                        AS INT) AS n_subwords
            FROM documents WHERE doc_id < 200
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(lower(text), ' ')) AS INT)
                     AS n_tokens,
                   CAST(len(list_distinct(string_split(lower(text), ' ')))
                     AS INT) AS n_distinct_tokens
            FROM documents WHERE doc_id < 200
        """,
        "quality": """
            SELECT doc_id,
                   round(len(list_distinct(string_split(lower(text), ' ')))
                         / CAST(len(string_split(lower(text), ' ')) AS DOUBLE),
                         4) AS diversity,
                   (length(text) >= 100) AS len_ok
            FROM documents
        """,
        "langid": """
            SELECT doc_id,
                   CASE WHEN len(list_intersect(
                          string_split(lower(text), ' '),
                          ['the','value','data','table','fast']))
                        / CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
                        >= 0.05
                        THEN 'en' ELSE 'other' END AS pred_lang
            FROM documents
        """,
        "cosine_topk": """
            WITH scored AS (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbour_id,
                     round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) AS score
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
            )
            SELECT query_id, neighbour_id, score,
                   CAST(rank AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score DESC, neighbour_id) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "ann_buckets": None,           # filled programmatically below
        "embedding_near_dups": None,   # filled programmatically below
        "ivf_assign": f"""
            WITH cent AS ({_IVF_CENT_SQL}), d AS (
              SELECT e.vec_id, c.centroid_id,
                     {_IVF_DIST_SQL} AS dist
              FROM embeddings e CROSS JOIN cent c
            )
            SELECT vec_id, centroid_id, dist FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist, centroid_id) AS rn FROM d
            ) WHERE rn = 1
        """,
        "ivf_topk": f"""
            WITH cent AS ({_IVF_CENT_SQL}), d AS (
              SELECT e.vec_id, c.centroid_id,
                     {_IVF_DIST_SQL} AS dist
              FROM embeddings e CROSS JOIN cent c
            ), assign AS (
              SELECT vec_id AS neighbour_id, centroid_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, centroid_id) AS rn FROM d
              ) WHERE rn = 1
            ), probes AS (
              SELECT vec_id AS query_id, centroid_id FROM (
                SELECT *, row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist, centroid_id) AS rn
                FROM d WHERE vec_id < 3
              ) WHERE rn <= 2
            ), scored AS (
              SELECT p.query_id, a.neighbour_id,
                     round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(n.embedding AS DOUBLE[])), 6) AS score
              FROM probes p
              JOIN assign a ON a.centroid_id = p.centroid_id
              JOIN embeddings q ON q.vec_id = p.query_id
              JOIN embeddings n ON n.vec_id = a.neighbour_id
              WHERE a.neighbour_id <> p.query_id
            )
            SELECT query_id, neighbour_id, score,
                   CAST(rank AS INT) AS rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id
                ORDER BY score DESC, neighbour_id) AS rank
              FROM scored
            ) WHERE rank <= 3
        """,
        "multimodal_meta": """
            SELECT doc_id AS media_id,
                   CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
                   sha256(text) AS checksum
            FROM documents
        """,
        "frame_sample": """
            WITH c AS (
              SELECT doc_id AS media_id,
                     octet_length(CAST(text AS BLOB)) AS L,
                     CAST(greatest(ceil(octet_length(CAST(text AS BLOB))
                                        / 256.0), 1) AS BIGINT) AS n_frames
              FROM documents WHERE doc_id < 50
            )
            SELECT media_id,
                   CAST(ceil(n_frames / 4.0) AS BIGINT) AS n_sampled,
                   CAST((ceil(n_frames / 4.0) - 1) * 256 +
                        CASE WHEN 4 * (ceil(n_frames / 4.0) - 1) = n_frames - 1
                             THEN CASE WHEN L = 0 THEN 0
                                       WHEN L % 256 = 0 THEN 256
                                       ELSE L % 256 END
                             ELSE 256 END AS BIGINT) AS sampled_bytes
            FROM c
        """,
        # media_features / media_resize: the testdata text is pure ASCII
        # (verified), so the byte-level fake decode/resize kernels are
        # mirrored exactly with ord()/substr() arithmetic in DuckDB.
        "media_features": """
            WITH hits AS (
              SELECT doc_id AS media_id,
                     ord(substr(text, i, 1)) % 8 AS dim_idx,
                     count(*) AS n_hits
              FROM documents,
                   (SELECT unnest(generate_series(1, 2000)) AS i) g
              WHERE doc_id < 50 AND i <= length(text)
              GROUP BY 1, 2
            )
            SELECT d.doc_id AS media_id,
                   CAST(length(d.text) AS BIGINT) AS n_bytes,
                   sha256(d.text) AS checksum,
                   CAST(k AS INT) AS dim_idx,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
            FROM documents d
            CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS k) dims
            LEFT JOIN hits h ON h.media_id = d.doc_id AND h.dim_idx = k
            WHERE d.doc_id < 50
        """,
        "media_resize": """
            WITH s AS (
              SELECT doc_id AS media_id,
                     string_agg(
                       substr(text, (k * length(text)) // 64 + 1, 1),
                       '' ORDER BY k) AS sampled
              FROM documents,
                   (SELECT unnest(generate_series(0, 63)) AS k) g
              WHERE doc_id < 50
              GROUP BY doc_id
            )
            SELECT media_id, CAST(8 AS INT) AS width,
                   CAST(8 AS INT) AS height,
                   CAST(64 AS BIGINT) AS n_bytes,
                   sha256(sampled) AS checksum
            FROM s
        """,
        # encode_roundtrip's Spark side MULTISET-compares input vs
        # decoded (repo, path, sha256) group counts — n_matched equal to
        # count(*) + 1 (the + 1 is the deliberately injected duplicate
        # of doc 0) proves every row, duplicates included, round-tripped
        # bit-identically through the codec kernels
        "encode_roundtrip": """
            SELECT CAST(count(*) + 1 AS BIGINT) AS n_matched FROM documents
        """,
        # identical guarantee through the shuffle-free clustered path
        "clustered_roundtrip": """
            SELECT CAST(count(*) + 1 AS BIGINT) AS n_matched FROM documents
        """,
        # identical guarantee through df.write.format("vcfblocks") —
        # the standard-API write path (multiset, injected dup)
        "datasource_write": """
            SELECT CAST(count(*) + 1 AS BIGINT) AS n_matched FROM documents
        """,
        # datasource_stream MULTISET-compares the streamed rows vs the
        # input the same way; identical bound
        "datasource_stream": """
            SELECT CAST(count(*) + 1 AS BIGINT) AS n_matched FROM documents
        """,
        # vcfblocks data source read (columns-pruned): per-lang counts +
        # total chars recomputed from the raw text
        "datasource_read": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        # vcfblocks pushdown: size_bytes is the encoded table's derived
        # byte length (strlen in duckdb); n_lines = newline count + 1
        "datasource_pushdown": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(length(text)
                            - length(replace(text, chr(10), '')) + 1)
                        AS BIGINT) AS total_lines
            FROM documents WHERE strlen(text) > 300
        """,
        # vcfblocks pushdown breadth (round 5): IN + prefix + IS NOT
        # NULL answered from manifest stats; exact predicate re-applied
        "datasource_prune_ops": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM documents
            WHERE source IN ('src1', 'src7', 'src12')
              AND CAST(doc_id AS VARCHAR) LIKE '1%'
              AND lang IS NOT NULL
        """,
    } | {"ann_buckets": _ann_buckets_sql(),
         "embedding_near_dups": _near_dups_sql()}


def _ann_buckets_sql() -> str:
    """Generated SQL mirror of similarity.lsh_buckets (integer planes)."""
    from vcf2parquet_spark.functions.similarity import hyperplane_weights
    planes = hyperplane_weights(6, 64)
    bits = []
    for plane in planes:
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({w})"
            for i, w in enumerate(plane) if w != 0)
        bits.append(f"CASE WHEN round({terms}, 4) >= 0 THEN '1' ELSE '0' END")
    concat = ", ".join(bits)
    return f"SELECT vec_id, concat({concat}) AS bucket FROM embeddings"


def _near_dups_sql() -> str:
    """SQL mirror of dedup.embedding_near_dups: same LSH buckets, then
    within-bucket pairwise cosine >= threshold."""
    buckets = _ann_buckets_sql()
    return f"""
        WITH b0 AS ({buckets}), hot AS (
          -- mirror the Spark side's max_bucket=2000 hot-bucket drop
          -- (dedup.embedding_near_dups), so the two stay aligned on
          -- any data distribution, not just the current testdata
          SELECT bucket FROM b0 GROUP BY bucket HAVING count(*) > 2000
        ), b AS (
          SELECT * FROM b0 WHERE bucket NOT IN (SELECT bucket FROM hot)
        ), scored AS (
          SELECT a.vec_id AS id_a, c.vec_id AS id_b,
                 round(list_cosine_similarity(
                   CAST(ea.embedding AS DOUBLE[]),
                   CAST(ec.embedding AS DOUBLE[])), 6) AS score
          FROM b a
          JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
          JOIN embeddings ea ON ea.vec_id = a.vec_id
          JOIN embeddings ec ON ec.vec_id = c.vec_id
        )
        SELECT id_a, id_b, score FROM scored WHERE score >= 0.2
    """
