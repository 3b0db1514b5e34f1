"""The ``vcfblocks`` Python Data Source (pyspark 4.1 DataSource API):
the encoded table as a real format for every consumer —
``spark.read.format("vcfblocks").load(out)`` — with partition-filter
pushdown (pushFilters → manifest min/max pruning), explicit column
pruning (``columns`` option), and snapshot time travel.

VERDICT r4 "Next round" item 3.  The done-bar's automatic per-query
column pruning is NOT expressible in pyspark 4.1.2 (the Python DS API
has no pruneColumns hook — verified: a single-column plan's BatchScan
still outputs every schema column), so ``decode.sql()`` keeps that job
and the format provides the explicit hook; this file pins both halves.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vcf2parquet_spark.corpus import synth_corpus
from vcf2parquet_spark.datasource import (
    BlocksDataSource,
    BlocksReader,
    read_blocks,
    register_data_source,
)
from vcf2parquet_spark.decode import decode
from vcf2parquet_spark.encode import encode

N_ROWS = 3_000


@pytest.fixture(scope="module")
def blocks(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ds") / "blocks")
    df = synth_corpus(spark, N_ROWS, seed=7, partitions=4)
    job = encode(spark, df, out, batch_size=1_000, target_rows=500)
    register_data_source(spark)
    return out, job


def test_format_full_read_matches_decode(spark, blocks):
    out, job = blocks
    got = spark.read.format("vcfblocks").load(out)
    want = decode(spark, out)
    assert got.columns == want.columns
    assert got.count() == N_ROWS
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_columns_option_prunes_schema_and_values(spark, blocks):
    out, _ = blocks
    got = (spark.read.format("vcfblocks")
           .option("columns", "lang,repo").load(out))
    assert got.columns == ["lang", "repo"]
    want = decode(spark, out, columns=["lang", "repo"])
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_include_derived_option(spark, blocks):
    out, _ = blocks
    got = (spark.read.format("vcfblocks")
           .option("include_derived", "true").load(out))
    assert "size_bytes" in got.columns and "n_lines" in got.columns
    # derived values agree with a recomputation from content
    chk = (spark.read.format("vcfblocks")
           .option("columns", "content,size_bytes").load(out)
           .filter(F.octet_length("content") != F.col("size_bytes")))
    assert chk.count() == 0


def test_filter_pushdown_prunes_partitions(spark, blocks):
    """pushFilters → manifest min/max pruning: a selective predicate on
    a profiled column must shrink partitions(), and results stay exact
    because every filter is also re-evaluated by Spark."""
    from pyspark.sql.datasource import EqualTo, StringStartsWith

    out, job = blocks
    full = spark.read.format("vcfblocks").load(out)
    n_parts_total = job["n_partitions"]

    # unit level: a repo equality prunes to the partitions whose
    # manifest bounds may contain it (hot-repo salting can split one
    # repo across units, but never ALL units)
    ds = BlocksDataSource({"path": out})
    reader = ds.reader(full.schema)
    assert isinstance(reader, BlocksReader)
    a_repo = decode(spark, out).select("repo").first()["repo"]
    leftover = list(reader.pushFilters([EqualTo(("repo",), a_repo)]))
    assert len(leftover) == 1          # partial pushdown: Spark re-checks
    pruned = reader.partitions()
    assert 0 < len(pruned) < n_parts_total

    # non-prunable filters are passed through untouched and harmless
    from pyspark.sql.datasource import StringContains
    r2 = ds.reader(full.schema)
    lo2 = list(r2.pushFilters([StringContains(("repo",), "x")]))
    assert len(lo2) == 1
    assert len(r2.partitions()) == n_parts_total

    # end-to-end: values under a pushed filter match the decode path
    got = full.filter(F.col("repo") == a_repo)
    want = decode(spark, out, filters=[("repo", "==", a_repo)])
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0


def test_snapshot_time_travel_option(spark, blocks, tmp_path):
    out = str(tmp_path / "snap_blocks")
    df1 = synth_corpus(spark, 500, seed=1, partitions=2)
    job1 = encode(spark, df1, out, target_rows=250)
    extra = synth_corpus(spark, 700, seed=2, partitions=2) \
        .withColumn("repo", F.concat(F.lit("v2/"), F.col("repo")))
    encode(spark, extra, out, target_rows=250,
           part_id_offset=job1["next_part_id"])
    register_data_source(spark)
    now = spark.read.format("vcfblocks").load(out)
    assert now.count() == 1200
    asof = (spark.read.format("vcfblocks")
            .option("snapshot_id", job1["current_snapshot_id"]).load(out))
    assert asof.count() == 500
    assert asof.filter(F.col("repo").startswith("v2/")).count() == 0


def test_read_blocks_wrapper(spark, blocks):
    out, _ = blocks
    got = read_blocks(spark, out, columns=["path", "n_lines"],
                      include_derived=True)
    assert got.columns == ["path", "n_lines"]
    assert got.count() == N_ROWS


def test_errors(spark, blocks, tmp_path):
    from vcf2parquet_spark.errors import SchemaError, StorageError

    out, _ = blocks
    with pytest.raises(Exception) as ei:
        spark.read.format("vcfblocks") \
            .option("columns", "nope").load(out).schema
    assert "nope" in str(ei.value)
    with pytest.raises(Exception):
        spark.read.format("vcfblocks").load(str(tmp_path / "empty")).schema


def test_pushdown_in_null_and_prefix(spark, tmp_path):
    """Round-5 pruning breadth: IN / IS [NOT] NULL / prefix filters
    prune at the manifest level (value bounds + null counts), and
    results stay exact because Spark re-evaluates every filter."""
    from pyspark.sql.datasource import (
        In, IsNotNull, IsNull, StringStartsWith)

    out = str(tmp_path / "pf_blocks")
    a = spark.createDataFrame(
        [(f"aaa/r{i}", f"src/f{i}.py", "c0", None, f"print({i})")
         for i in range(200)],
        "repo string, path string, commit string, lang string, "
        "content string")
    b = spark.createDataFrame(
        [(f"zzz/r{i}", f"src/g{i}.py", "c1", "python", f"x = {i}")
         for i in range(200)],
        "repo string, path string, commit string, lang string, "
        "content string")
    job_a = encode(spark, a, out, target_rows=100)
    encode(spark, b, out, target_rows=100,
           part_id_offset=job_a["next_part_id"])
    register_data_source(spark)
    full = spark.read.format("vcfblocks").load(out)
    n_total = len(BlocksDataSource({"path": out})
                  .reader(full.schema).partitions())
    assert n_total >= 2

    def n_parts(*filters):
        r = BlocksDataSource({"path": out}).reader(full.schema)
        leftover = list(r.pushFilters(list(filters)))
        assert len(leftover) == len(filters)   # all re-checked by Spark
        return len(r.partitions())

    half = n_total // 2
    # IN: no listed repo can live in the aaa/* partitions' bounds
    # (r0/r99 straddle the zzz range split, so both zzz parts survive)
    assert n_parts(In(("repo",), ("zzz/r0", "zzz/r99"))) == half
    # a single value prunes below the bounds-only half too
    assert 1 <= n_parts(In(("repo",), ("zzz/r0",))) <= half
    assert n_parts(In(("repo",), ())) == 0     # empty IN matches nothing
    # IS NULL / IS NOT NULL via per-partition null counts
    assert n_parts(IsNull(("lang",))) == half
    assert n_parts(IsNotNull(("lang",))) == half
    # LIKE 'zzz%' prefix via string bounds
    assert n_parts(StringStartsWith(("repo",), "zzz")) == half
    assert n_parts(StringStartsWith(("repo",), "aaa")) == half
    assert n_parts(StringStartsWith(("repo",), "mmm")) == 0

    # end-to-end exactness through the format
    assert full.filter(F.col("lang").isNull()).count() == 200
    assert full.filter(F.col("repo").startswith("zzz")).count() == 200
    assert full.filter(F.col("repo").isin("zzz/r5", "aaa/r5")).count() == 2

    # the same ops through decode(filters=...) — shared _part_may_match
    assert decode(spark, out,
                  filters=[("lang", "isnull", None)]).count() == 200
    assert decode(spark, out,
                  filters=[("lang", "notnull", None)]).count() == 200
    assert decode(spark, out,
                  filters=[("repo", "startswith", "zzz")]).count() == 200
    assert decode(spark, out,
                  filters=[("repo", "in", ("zzz/r5", "aaa/r5"))]).count() == 2
    assert decode(spark, out, filters=[("repo", "in", ())]).count() == 0
