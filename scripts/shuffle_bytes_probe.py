#!/usr/bin/env python
"""Byte-budget evidence for shuffle_payload="packed": run the SAME
general-path encode twice (raw rows vs packed zstd-1 Arrow-IPC blobs)
and read the ACTUAL shuffle write volume from Spark's own task metrics
(REST API).  Wire bytes and the raw-side payload are measured exactly;
the packed-side LOGICAL payload is approximated by its wire bytes (see
the inline note).

Two distinct byte budgets matter, and the probe reports both:

* **on-wire** (`shuffle_bytes_*`): what the shuffle fabric/disk carries.
  Spark already lz4-compresses shuffle blocks, so packing changes this
  little (zstd-1 blobs ≈ lz4'd rows; measured ratio ~0.94).
* **logical** (`exchange_payload_*`): the UNCOMPRESSED volume that
  flows through row serialization, shuffle compress/decompress and
  spill memcpy, the reduce-side part_id sort, and the JVM→Python Arrow
  IPC — none of which Spark compresses.  Raw mode moves every content
  byte through all of those (~the corpus size); packed mode moves only
  the blob bytes (~the compressed size), an ~8-9x reduction on source
  text.  This, not the wire, is why packed wins wall-clock (measured
  2.5x at 8 cores / 200k rows).

Prints one JSON line with both budgets and the wall times.

Usage: python scripts/shuffle_bytes_probe.py [--rows 200000] [--cores 8]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
        return json.load(r)


def total_shuffle_write(spark) -> int:
    app = spark.sparkContext.applicationId
    stages = _rest(spark, f"applications/{app}/stages?status=complete")
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--target-rows", type=int, default=2500)
    args = ap.parse_args()

    import bench
    from vcf2parquet_spark.session import get_spark

    conf = bench.bench_conf()
    conf["spark.ui.enabled"] = "true"   # metrics source for this probe
    spark = get_spark(cores=args.cores, app_name="vp_shuffle_probe",
                      extra_conf=conf)
    corpus = bench.materialize_corpus(spark, args.rows)

    # warm-up (untimed): one small encode so every python worker
    # imports numpy/pyarrow and faults its pools before the first
    # measured leg — without it the raw leg (which runs first) absorbs
    # all cold-start cost and the packed/raw wall ratio is overstated
    # in packed's favor (code-review r5)
    warm = f"{bench.WORK_DIR}/probe_warm"
    if os.path.exists(warm):
        shutil.rmtree(warm)
    bench.bench_encode(spark,
                       bench.materialize_corpus(spark, args.cores * 500),
                       warm, target_rows=500)

    out = {}
    marks = [total_shuffle_write(spark)]
    walls = {}
    jobs = {}
    # pass both payloads explicitly: the engine default is "packed"
    # since round 4, so an empty kwargs leg would silently measure
    # packed twice
    for mode, kw in (("raw", {"shuffle_payload": "raw"}),
                     ("packed", {"shuffle_payload": "packed"})):
        dst = f"{bench.WORK_DIR}/probe_{mode}"
        if os.path.exists(dst):
            shutil.rmtree(dst)
        t0 = time.time()
        _, job = bench.bench_encode(spark, corpus, dst,
                                    target_rows=args.target_rows, **kw)
        walls[mode] = round(time.time() - t0, 3)
        jobs[mode] = job
        marks.append(total_shuffle_write(spark))
    spark.stop()

    sh_raw = marks[1] - marks[0]
    sh_packed = marks[2] - marks[1]
    # logical (uncompressed) exchange payload: raw mode serializes,
    # sorts and IPCs every row byte (the summed Arrow nbytes of the
    # reduce-side unit tables); packed mode moves only the blob bytes.
    # The packed LOGICAL payload is approximated by its measured
    # ON-WIRE bytes: already-zstd'd blobs are near-incompressible to
    # Spark's lz4 frame, so wire ≈ logical to within a few percent —
    # an approximation for this one term (the raw-side payload and
    # both wire numbers are exact), conservative in packed's favor
    # only by that margin.
    pay_raw = jobs["raw"]["raw_bytes"]
    pay_packed = sh_packed
    print(json.dumps({
        "rows": args.rows,
        "cores": args.cores,
        "raw_content_bytes": jobs["raw"]["raw_bytes"],
        "shuffle_bytes_raw": sh_raw,
        "shuffle_bytes_packed": sh_packed,
        "onwire_packed_over_raw":
            round(sh_packed / sh_raw, 4) if sh_raw else None,
        "exchange_payload_raw": pay_raw,
        "exchange_payload_packed": pay_packed,
        "payload_packed_over_raw":
            round(pay_packed / pay_raw, 4) if pay_raw else None,
        "wall_raw": walls["raw"],
        "wall_packed": walls["packed"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
