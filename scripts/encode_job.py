#!/usr/bin/env python
"""spark-submit entry point for the encode job (north-rule deploy path).

On a real cluster:

    zip -r engine.zip vcf2parquet_spark
    spark-submit --py-files engine.zip \
        [--master yarn --num-executors N ...] \
        scripts/encode_job.py --input s3://corpus --output s3://blocks \
        [--target-rows 250000] [--batch-size 100000] [--no-resume] \
        [--codec COL=CODEC ...]

The session is taken from spark-submit's own configuration (master,
executor count, memory) — the engine never hardcodes cluster shape; it
only sets its SQL-level knobs.  Locally the same file runs under plain
``python`` (falls back to local[*]).  Resume is on by default: re-submit
after any failure and only missing partitions are encoded (manifest
checkpoint); each run appends a snapshot (``history`` shows lineage).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# under spark-submit the package comes from --py-files; under plain
# ``python scripts/encode_job.py`` it comes from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--target-rows", type=int, default=250_000)
    ap.add_argument("--batch-size", type=int, default=100_000)
    ap.add_argument("--codec", action="append", metavar="COL=CODEC")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--clustered", action="store_true",
                    help="shuffle-free path: encode the input table's "
                         "physical rowgroup ranges in place (use when the "
                         "input is already laid out as wanted, e.g. an "
                         "Iceberg partition)")
    ap.add_argument("--arrow-cpu", type=int, default=2,
                    help="pyarrow threads per task worker; set ~= "
                         "spark.task.cpus")
    ap.add_argument("--verify", action="store_true",
                    help="decode + sha256 multiset check after encode")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    builder = (SparkSession.builder.appName("vcf2parquet_spark_encode")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.io.compression.codec", "zstd"))
    spark = builder.getOrCreate()   # master/executors come from spark-submit

    from vcf2parquet_spark.encode import encode, encode_clustered
    overrides = dict(kv.split("=", 1) for kv in (args.codec or []))
    common = dict(target_rows=args.target_rows, batch_size=args.batch_size,
                  codec_overrides=overrides, resume=not args.no_resume,
                  arrow_cpu=args.arrow_cpu)
    if args.clustered:
        job = encode_clustered(spark, args.input, args.output, **common)
    else:
        job = encode(spark, spark.read.parquet(args.input), args.output,
                     **common)
    print(json.dumps(job, indent=1))
    if args.verify:
        from vcf2parquet_spark.decode import verify
        res = verify(spark, spark.read.parquet(args.input), args.output)
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
