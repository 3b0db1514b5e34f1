"""``writeStream.format("vcfblocks")`` — the Structured Streaming sink
half of the data source (``DataSourceStreamArrowWriter``).

Exactly-once comes from deterministic final part ids assigned at epoch
commit — ``(batchId + 1) * EPOCH_STRIDE + task partition id`` — so a
replayed micro-batch atomically overwrites the same files instead of
appending duplicates (no dedupe bookkeeping needed); each epoch lands
as one ``stream_epoch`` snapshot.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.corpus import synth_corpus
from vcf2parquet_spark.datasource import register_data_source
from vcf2parquet_spark.decode import decode
from vcf2parquet_spark.streaming.encode_stream import EPOCH_STRIDE

SCHEMA = ("repo string, path string, commit string, "
          "lang string, content string")


@pytest.fixture(scope="module")
def reg(spark):
    register_data_source(spark)
    return spark


def _start(spark, src, out, cp):
    return (spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 4).parquet(src)
            .writeStream.format("vcfblocks")
            .option("checkpointLocation", cp)
            .outputMode("append")
            .start(out))


def test_stream_sink_epochs_and_exactly_once(reg, tmp_path):
    spark = reg
    src = str(tmp_path / "src")
    out = str(tmp_path / "blocks")
    cp = str(tmp_path / "cp")

    d1 = synth_corpus(spark, 600, seed=21, partitions=2)
    d1.write.parquet(src)

    q = _start(spark, src, out, cp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert decode(spark, out).count() == 600
    snaps = tbl.snapshots(out)
    assert snaps and all(s["operation"] == "stream_epoch" for s in snaps)
    # part ids live in the epoch namespace
    assert all(p >= EPOCH_STRIDE for p in tbl.committed_parts(out))
    # staging is drained: only this query's (empty) key dir remains
    staging = os.path.join(out, "_staging")
    keys = os.listdir(staging)
    assert len(keys) == 1
    assert os.listdir(os.path.join(staging, keys[0])) == []

    # second epoch: more files arrive, restart from the same checkpoint
    d2 = (synth_corpus(spark, 400, seed=22, partitions=2)
          .withColumn("repo", F.concat(F.lit("s2/"), F.col("repo"))))
    d2.write.mode("append").parquet(src)
    q = _start(spark, src, out, cp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = decode(spark, out)
    assert got.count() == 1000
    assert got.filter(F.col("repo").startswith("s2/")).count() == 400

    # exactly-once: a THIRD restart with nothing new must not re-append
    q = _start(spark, src, out, cp)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert decode(spark, out).count() == 1000

    # the table reads back through the batch data source too
    ds = spark.read.format("vcfblocks").load(out)
    assert ds.count() == 1000
    want = d1.unionByName(d2)
    assert ds.exceptAll(want).count() == 0
    assert want.exceptAll(ds).count() == 0


def test_stream_sink_distinct_queries_do_not_clobber(reg, tmp_path):
    """Two DIFFERENT streaming queries (fresh checkpoints) writing the
    same table get disjoint part-id regions: both see batchId=0, so ids
    derived from batchId alone would silently os.replace() the first
    query's committed files (code-review r5).  Replay-safety — same
    checkpoint recomputing the same ids — is per-query and covered by
    test_stream_sink_epochs_and_exactly_once."""
    import json as _json

    from vcf2parquet_spark.datasource import QUERY_STRIDE

    spark = reg
    out = str(tmp_path / "blocks")
    d1 = synth_corpus(spark, 300, seed=23, partitions=1)
    d2 = (synth_corpus(spark, 200, seed=24, partitions=1)
          .withColumn("repo", F.concat(F.lit("q2/"), F.col("repo"))))
    for i, (cp, d) in enumerate([("cp_a", d1), ("cp_b", d2)]):
        src = str(tmp_path / f"src{i}")
        d.write.parquet(src)
        q = _start(spark, src, out, str(tmp_path / cp))
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    got = decode(spark, out)
    assert got.count() == 500                 # nothing overwritten
    assert got.filter(F.col("repo").startswith("q2/")).count() == 200
    # the queries occupy disjoint QUERY_STRIDE regions, recorded in the
    # table's stream_bases registry keyed by checkpoint location
    bdir = os.path.join(out, "_stream_bases")
    bases = sorted(
        _json.load(open(os.path.join(bdir, n)))["base"]
        for n in os.listdir(bdir)
        if n.startswith("q-") and n.endswith(".json"))
    assert bases == [0, QUERY_STRIDE]
    regions = {p // QUERY_STRIDE for p in tbl.committed_parts(out)}
    assert regions == {0, 1}
