#!/usr/bin/env python
"""A/B probe in one window: encode stream vs grouped, clustered with vs
without Arrow CPU-thread pinning.  3 rounds interleaved, min + all."""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
WORK = "/tmp/vp_bench"
ROWS = 200_000


def main():
    from vcf2parquet_spark.session import get_spark
    from vcf2parquet_spark.encode import encode, encode_clustered

    spark = get_spark(cores=32, app_name="ab_probe",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    # the ONE materialization recipe lives in bench.py — probes must
    # measure the exact physical layout the headline benchmark uses
    from bench import materialize_corpus, materialize_rg_corpus
    corpus = materialize_corpus(spark, ROWS)
    rg = materialize_rg_corpus(spark, ROWS)

    def t(fn):
        out = f"{WORK}/ab_out"
        if os.path.exists(out):
            shutil.rmtree(out)
        t0 = time.time()
        fn(out)
        return round(time.time() - t0, 3)

    res = {}
    cfgs = {
        "cl_plain": lambda o: encode_clustered(
            spark, rg, o, target_rows=2500, read_mode="plain"),
        "cl_mmap": lambda o: encode_clustered(
            spark, rg, o, target_rows=2500, read_mode="mmap"),
        "cl_prebuf": lambda o: encode_clustered(
            spark, rg, o, target_rows=2500, read_mode="pre_buffer"),
        "stream": lambda o: encode(spark, spark.read.parquet(corpus), o,
                                   target_rows=2500, arrow_stream=True),
    }
    for rnd in range(4):
        for name, fn in cfgs.items():
            dt = t(fn)
            res.setdefault(name, []).append(dt)
            print(f"round {rnd} {name}: {dt}", flush=True)
    print(json.dumps({k: {"min": min(v), "all": v} for k, v in res.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
