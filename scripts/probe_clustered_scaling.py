#!/usr/bin/env python
"""One-off probe: clustered-encode scaling pair (local[N] vs local[4N]).

Materializes the 1.6M-row scaling corpus as a small-rowgroup parquet
table (the clustered path's unit quantum), then times encode_clustered
at both parallelism levels.  Not part of the driver contract — feeds
the decision of which engine path backs BENCH/BASELINE.md.
"""
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORK = "/tmp/vp_bench"
ROWS = int(os.environ.get("ROWS", "1600000"))
N = int(os.environ.get("N", "2"))
PAIRS = int(os.environ.get("PAIRS", "1"))
TARGET = int(os.environ.get("TARGET", "3000"))


def materialize_rg(spark, n_rows: int) -> str:
    # the ONE materialization recipe lives in bench.py — probes must
    # measure the exact physical layout the headline benchmark uses
    from bench import materialize_rg_corpus
    return materialize_rg_corpus(spark, n_rows)


def udf_seconds(out):
    total = 0.0
    for f in glob.glob(f"{out}/manifests/*.json"):
        with open(f) as fh:
            total += json.load(fh)["metrics"]["seconds"]
    return total


def run_one(cores, tag):
    from vcf2parquet_spark.session import get_spark
    from vcf2parquet_spark.encode import encode_clustered
    conf = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/sparktmp", exist_ok=True)
        conf["spark.local.dir"] = "/dev/shm/sparktmp"
    spark = get_spark(cores=cores, app_name=f"probe_{cores}_{tag}",
                      extra_conf=conf)
    src = materialize_rg(spark, ROWS)
    dry = f"{WORK}/probe_dry_src"
    if not os.path.exists(dry):
        spark.read.parquet(src).limit(100_000).write.mode("overwrite") \
            .option("parquet.block.size", 2 * 1024 * 1024).parquet(dry)
    shutil.rmtree(f"{WORK}/probe_dry_{cores}", ignore_errors=True)
    encode_clustered(spark, dry, f"{WORK}/probe_dry_{cores}",
                     target_rows=TARGET)
    best = None
    for _ in range(2):
        out = f"{WORK}/probe_{cores}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        job = encode_clustered(spark, src, out, target_rows=TARGET)
        dt = time.time() - t0
        if best is None or dt < best[0]:
            best = (dt, job, udf_seconds(out))
    spark.stop()
    dt, job, udf = best
    gbps = job["raw_bytes"] / 1e9 / dt
    print(f"local[{cores}] {tag}: wall={dt:.2f}s gbps={gbps:.4f} "
          f"udf={udf:.1f}s ovh={dt - udf / cores:.2f}s "
          f"units={job['n_partitions']}", flush=True)
    return dt, gbps


if __name__ == "__main__":
    os.makedirs(WORK, exist_ok=True)
    effs = []
    for i in range(PAIRS):
        dt2, g2 = run_one(N, f"p{i}")
        dt8, g8 = run_one(N * 4, f"p{i}")
        eff = (g8 / g2) / 4
        effs.append(eff)
        print(f"pair {i}: eff={eff:.4f}", flush=True)
    effs.sort()
    print(f"median eff: {effs[len(effs) // 2]:.4f}")
