"""``readStream.format("vcfblocks")`` — the Structured Streaming source
half of the data source (``DataSourceStreamReader``).

The snapshot log is the offset axis: each micro-batch emits partitions
FIRST introduced by snapshots since the last committed offset.  Append
snapshots (``encode``/``append``/``stream_epoch``) carry new rows;
``compact`` snapshots are pure rewrites and are skipped.
"""

from __future__ import annotations

import pytest

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.corpus import synth_corpus
from vcf2parquet_spark.datasource import register_data_source
from vcf2parquet_spark.encode import encode
from vcf2parquet_spark.maintenance import compact


@pytest.fixture(scope="module")
def reg(spark):
    register_data_source(spark)
    return spark


def _tail(spark, out, cp, name, **options):
    r = spark.readStream.format("vcfblocks")
    for k, v in options.items():
        r = r.option(k, v)
    return (r.load(out)
            .writeStream.format("memory").queryName(name)
            .option("checkpointLocation", cp).start())


def _rows(spark, name):
    return {tuple(r) for r in
            spark.sql(f"select * from {name}").collect()}


def test_stream_reader_tails_appends_and_skips_compaction(reg, tmp_path):
    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    d1 = synth_corpus(spark, 800, seed=31)
    encode(spark, d1, out)

    q = _tail(spark, out, cp, "tail_a")
    try:
        q.processAllAvailable()
        got = _rows(spark, "tail_a")
        assert got == {tuple(r) for r in d1.collect()}   # value fidelity

        # an append via the batch writer arrives incrementally, once
        d2 = synth_corpus(spark, 250, seed=32)
        d2.write.format("vcfblocks").mode("append").save(out)
        q.processAllAvailable()
        got = _rows(spark, "tail_a")
        assert len(got) == 800 + 250
        assert {tuple(r) for r in d2.collect()} <= got

        # compaction rewrites already-emitted rows: nothing re-emitted
        compact(spark, out)
        assert [s["operation"] for s in tbl.snapshots(out)][-1] == "compact"
        q.processAllAvailable()
        assert len(_rows(spark, "tail_a")) == 800 + 250

        # an append AFTER compaction still flows (first-appearance
        # bookkeeping must survive the rewritten live set)
        d3 = synth_corpus(spark, 100, seed=33)
        d3.write.format("vcfblocks").mode("append").save(out)
        q.processAllAvailable()
        assert len(_rows(spark, "tail_a")) == 800 + 250 + 100
    finally:
        q.stop()


def test_stream_reader_starting_offsets_latest(reg, tmp_path):
    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    encode(spark, synth_corpus(spark, 500, seed=41), out)

    q = _tail(spark, out, cp, "tail_b", startingOffsets="latest")
    try:
        q.processAllAvailable()
        assert len(_rows(spark, "tail_b")) == 0      # history skipped
        d2 = synth_corpus(spark, 120, seed=42)
        d2.write.format("vcfblocks").mode("append").save(out)
        q.processAllAvailable()
        assert _rows(spark, "tail_b") == {tuple(r) for r in d2.collect()}
    finally:
        q.stop()


def test_stream_reader_column_pruning(reg, tmp_path):
    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    d1 = synth_corpus(spark, 300, seed=51)
    encode(spark, d1, out)

    q = _tail(spark, out, cp, "tail_c", columns="repo,lang")
    try:
        q.processAllAvailable()
        df = spark.sql("select * from tail_c")
        assert df.columns == ["repo", "lang"]
        assert _rows(spark, "tail_c") == \
            {tuple(r) for r in d1.select("repo", "lang").collect()}
    finally:
        q.stop()


def test_stream_reader_exactly_once_across_restart(reg, tmp_path):
    """Offsets live in the query checkpoint: a new query on the same
    checkpoint resumes after the last committed snapshot and emits only
    what arrived since (file sink — the memory sink can't recover)."""
    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    sink = str(tmp_path / "sink")

    def _run():
        q = (spark.readStream.format("vcfblocks").load(out)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    d1 = synth_corpus(spark, 600, seed=61)
    encode(spark, d1, out)
    _run()
    assert spark.read.parquet(sink).count() == 600

    d2 = synth_corpus(spark, 150, seed=62)
    d2.write.format("vcfblocks").mode("append").save(out)
    _run()
    got = spark.read.parquet(sink)
    assert got.count() == 600 + 150                  # no re-emission
    assert {tuple(r) for r in got.collect()} == \
        {tuple(r) for r in d1.collect()} | {tuple(r) for r in d2.collect()}

    _run()                                            # nothing new
    assert spark.read.parquet(sink).count() == 600 + 150


def test_stream_reader_raises_on_expired_offset(reg, tmp_path):
    """If expire_snapshots removed the snapshot at a reader's committed
    offset, restarting that reader must FAIL, not silently re-emit the
    whole live set as duplicates — the data files still exist, so
    nothing else would error (code-review r5)."""
    from vcf2parquet_spark.table import expire_snapshots

    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    sink = str(tmp_path / "sink")

    def _run():
        q = (spark.readStream.format("vcfblocks").load(out)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        q.awaitTermination(300)

    d1 = synth_corpus(spark, 400, seed=71)
    encode(spark, d1, out)                       # snapshot 0
    _run()                                       # offset -> snapshot 0
    assert spark.read.parquet(sink).count() == 400

    for seed in (72, 73):                        # snapshots 1, 2
        synth_corpus(spark, 100, seed=seed) \
            .write.format("vcfblocks").mode("append").save(out)
    expire_snapshots(out, keep_last=1)           # drops snapshots 0, 1
    assert [s["snapshot_id"] for s in tbl.snapshots(out)] == [2]

    from pyspark.errors.exceptions.captured import StreamingQueryException
    with pytest.raises(StreamingQueryException, match="expired"):
        _run()
    # nothing was re-emitted downstream
    assert spark.read.parquet(sink).count() == 400
