"""Structured Streaming ingest: continuously encode arriving corpus files.

``readStream`` over a corpus directory → ``foreachBatch`` → the same
batch ``encode`` pipeline, with each micro-batch's work units
namespaced after the already-committed partitions (monotone part ids).
Exactly-once per partition comes from the same manifest commit protocol
as batch mode: a re-delivered micro-batch re-plans the same rows but
every already-committed unit is skipped by the resume filter only if
ids are stable — so we namespace by the *epoch id* (stable across
replays of the same micro-batch) on top of a RUN BASE that clears
every previously committed id (epoch ids restart at 0 for a fresh or
absent checkpoint; without the base, a restarted run's units would
collide with the previous run's and be silently skipped).  With a
checkpoint the base is persisted inside it, so replays recompute the
same final ids.

This is the streaming face of the reference's one-pass pull pipeline
(/root/reference/src/record2chunk.rs:42-90 — batches pulled from a
stream until EOF); Spark's trigger loop replaces the pull loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from vcf2parquet_spark import table as tbl
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

    # Epoch ids restart at 0 whenever there is no checkpoint (or a
    # fresh one), so ids derived from the epoch alone would COLLIDE
    # with a previous run's committed partitions — and encode()'s
    # resume filter would silently skip the colliding units even
    # though they hold different rows.  Resolve a RUN BASE that clears
    # every committed id; with a checkpoint the base is persisted
    # inside it (written once), so replays of the same checkpoint
    # recompute the same final ids — the same design as the vcfblocks
    # stream writer's per-query base registry.
    def _fresh_base() -> int:
        committed = tbl.committed_parts(output)
        hi = max(committed) if committed else -1
        return ((hi // EPOCH_STRIDE) + 1) * EPOCH_STRIDE if hi >= 0 else 0

    if checkpoint:
        os.makedirs(checkpoint, exist_ok=True)
        base_file = os.path.join(checkpoint, "vcfblocks_base.json")
        if os.path.exists(base_file):
            with open(base_file) as f:
                base = int(json.load(f)["base"])
        else:
            base = _fresh_base()
            tbl.atomic_write_bytes(
                base_file, json.dumps({"base": base}).encode())
    else:
        base = _fresh_base()

    def sink(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        encode(batch_df.sparkSession, batch_df, output,
               EncodeOptions(target_rows=target_rows,
                             part_id_offset=(base + (epoch_id + 1)
                                             * EPOCH_STRIDE),
                             **encode_kwargs))

    writer = (stream.writeStream
              .foreachBatch(sink)
              .outputMode("append"))
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
