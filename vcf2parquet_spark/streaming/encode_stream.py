"""Structured Streaming ingest: continuously encode arriving corpus files.

``readStream`` over a corpus directory → ``foreachBatch`` → the same
batch ``encode`` pipeline, with each micro-batch's work units
namespaced after the already-committed partitions (monotone part ids).
Exactly-once per partition comes from the same manifest commit protocol
as batch mode: a re-delivered micro-batch re-plans the same rows but
every already-committed unit is skipped by the resume filter only if
ids are stable — so we namespace by the *epoch id*, which Spark
guarantees stable across replays of the same micro-batch.

This is the streaming face of the reference's one-pass pull pipeline
(/root/reference/src/record2chunk.rs:42-90 — batches pulled from a
stream until EOF); Spark's trigger loop replaces the pull loop.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from vcf2parquet_spark.encode import EncodeOptions, encode

EPOCH_STRIDE = 1_000_000  # part-id namespace per micro-batch epoch


def encode_stream(spark: SparkSession, input_dir: str, output: str,
                  schema: str = ("repo string, path string, commit string, "
                                 "lang string, content string"),
                  checkpoint: str | None = None,
                  target_rows: int = 100_000,
                  max_files_per_trigger: int = 16,
                  **encode_kwargs):
    """Start the streaming encode; returns the StreamingQuery.

    Drive synchronously in tests with ``q.processAllAvailable()``.
    """
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(input_dir))

    def sink(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        encode(batch_df.sparkSession, batch_df, output,
               EncodeOptions(target_rows=target_rows,
                             part_id_offset=(epoch_id + 1) * EPOCH_STRIDE,
                             **encode_kwargs))

    writer = (stream.writeStream
              .foreachBatch(sink)
              .outputMode("append"))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
