"""Distributed encode pipeline: corpus DataFrame → encoded blocks + manifests.

Spark-first dataflow (SURVEY.md §3.4), designed for 1000-executor /
100 TB scale and exercised here on local[N]:

1. **Partition planning** (driver): ``groupBy(repo).count()`` — a tiny
   aggregate (#repos rows, map-side partials) — then deterministic
   assignment of work units: repos above ``target_rows`` are *salted*
   into ``ceil(rows/target)`` units (explicit skew handling for hot
   repos — the north rule requirement AQE alone can't give us, because
   each unit must be a durable, resumable manifest); small repos are
   bundled into shared units.  The plan is a small DataFrame that is
   **broadcast** — no shuffle of the big side for the join.
2. **Checkpoint filter**: committed partition ids (from the manifest
   dir) are anti-filtered out — exact resume; re-running after a crash
   encodes only missing partitions.
3. **One shuffle**: ``repartition('part_id')`` co-locates each work
   unit; ``applyInArrow`` then encodes each unit entirely in Arrow
   (zero pandas/Python-object materialization — the ``input_hint``'s
   "vectorized Arrow UDFs, no per-row Python").
4. **Inside the UDF** (executor, per partition): sort by (repo, path,
   commit, content) so block bytes are independent of shuffle
   nondeterminism; profile columns; auto-select codecs; derive integer
   columns (size_bytes, n_lines → bit-pack/FOR); encode in row batches
   of ``batch_size`` (default 100_000 — the reference's default,
   /root/reference/src/cli.rs:114-116); write the blocks parquet, then
   the manifest JSON, each tmp+atomic-rename (manifest last = commit).

Scale notes: executor-side file writes target shared storage (local FS
here; pyarrow.fs handles s3://... URIs identically on a real cluster —
or swap step 4's sink for an Iceberg ``writeTo`` once the runtime jar
is present).  The only shuffle moves each row exactly once, partition
sizes are bounded by construction (salting), and the small plan/
checkpoint tables are broadcast, so the job scales linearly with
executors until the shuffle fabric saturates.
"""

from __future__ import annotations

import hashlib
import json
import math
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, SparkSession, functions as F

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.kernels import encode_column
from vcf2parquet_spark.profile import profile_arrow
from vcf2parquet_spark.select import choose_codecs

DEFAULT_BATCH = 100_000          # rows per block (reference default batch size)
DEFAULT_TARGET_ROWS = 250_000    # rows per work unit before salting kicks in

SUMMARY_SCHEMA = ("part_id long, n_rows long, raw_bytes long, enc_bytes long, "
                  "n_blocks int, n_columns int, seconds double, status string")


@dataclass
class EncodeOptions:
    """Mirrors the reference's Python-binding kwargs where meaningful
    (/root/reference/python/src/lib.rs:35-44): batch_size default
    100_000; ``codec_overrides`` generalizes its single ``compression``
    enum to per-column choices; ``nullable`` mirrors ``info_optional``.
    """
    batch_size: int = DEFAULT_BATCH
    target_rows: int = DEFAULT_TARGET_ROWS
    codec_overrides: dict = field(default_factory=dict)
    residual: str = "zlib"    # general-purpose residual stage behind the
                              # auto-selected base codec: one of
                              # zlib/zstd/lz4/brotli/gzip — the breadth
                              # analogue of the reference's file-level
                              # codec enum (cli.rs:119-136)
    nullable: bool = True     # False = strict schema: any NULL in any
                              # input column raises SchemaError instead
                              # of encoding a validity bitmap (the
                              # reference's --info-optional flips INFO
                              # fields between nullable and required —
                              # cli.rs:69-71, schema.rs:86-124)
    resume: bool = True
    derived_columns: bool = True
    sort_columns: tuple = ("repo", "path", "commit", "content")
    # fold the deterministic sort into the shuffle's own sort: Spark must
    # sort by part_id before applyInArrow anyway, so sorting by
    # (part_id, *sort_columns) there costs one JVM sort total and lets
    # the UDF skip its pyarrow sort (a full table copy) entirely
    presort_in_shuffle: bool = True
    shuffle_oversub: int = 16  # shuffle partitions per core (see encode())
    snapshot: bool = True     # False: skip the snapshot commit (used by
                              # compaction, which commits its own swap)
    manifest_tags: dict = field(default_factory=dict)  # extra manifest
                              # fields (e.g. compaction's pending_rewrite
                              # marker, which excludes the partition from
                              # dangling-part adoption until the swap)
    part_id_offset: int = 0   # namespace for incremental/streaming appends
    parquet_version: str = "2.6"  # blocks container pages (ref: cli.rs:139-145)


def plan_partitions(counts: list[tuple[str, int]], target_rows: int,
                    offset: int = 0) -> tuple[list[dict], int]:
    """Deterministic work-unit plan from (repo, row_count) pairs.

    Returns (plan rows [{repo, base_part_id, fanout}], next free id).
    Hot repos (count > target) are salted across ``fanout`` units;
    small repos are packed first-fit into shared units.  ``offset``
    namespaces the ids (used by incremental/streaming appends).
    """
    # Fully vectorized planning (C-level sort + prefix sums): the
    # previous first-fit-decreasing scan was O(#small × #bins) driver
    # Python — a stall at 10^7+ repos; even Python-lambda sorts cost
    # seconds at 10^6.  NULL repo is a legal group (maps to the
    # empty-string sort slot with a null flag so mixed None/str keys
    # never TypeError on count ties).
    import numpy as np
    n_in = len(counts)
    if n_in == 0:
        return [], offset
    cnt = np.fromiter((c for _, c in counts), dtype=np.int64, count=n_in)
    nulls = np.fromiter((r is None for r, _ in counts), dtype=bool,
                        count=n_in)
    names = np.array([r or "" for r, _ in counts])
    # sort: count desc, then non-null-before-check, then repo asc
    order = np.lexsort((names, nulls, -cnt))
    cnt, nulls, names = cnt[order], nulls[order], names[order]
    hot_n = int(np.searchsorted(-cnt, -target_rows, side="left"))

    # hot repos: one salted unit range each, fanout = ceil(count/target)
    fanout = -(-cnt[:hot_n] // target_rows)
    hot_base = offset + np.concatenate(
        ([0], np.cumsum(fanout)[:-1])).astype(np.int64)
    next_id = offset + (int(fanout.sum()) if hot_n else 0)

    # small repos: shared units by prefix-sum chunking over the
    # size-descending order — unit = (rows before this repo) // target.
    # Row balance is exactly ceil(total/target) units of ~target rows
    # (a unit exceeds target by at most one small repo, < 2×target).
    small_cnt = cnt[hot_n:]
    starts = np.cumsum(small_cnt) - small_cnt
    unit = next_id + starts // target_rows

    # .tolist() first: per-element numpy scalar extraction inside the
    # comprehensions costs ~10x more than one bulk conversion
    nl, nm = nulls.tolist(), names.tolist()
    repos = [None if nl[i] else nm[i] for i in range(n_in)]
    hb, fo, un = hot_base.tolist(), fanout.tolist(), unit.tolist()
    plan = [{"repo": repos[i], "base_part_id": hb[i], "fanout": fo[i]}
            for i in range(hot_n)]
    plan += [{"repo": repos[hot_n + j], "base_part_id": un[j], "fanout": 1}
             for j in range(n_in - hot_n)]
    if n_in - hot_n:
        next_id = int(unit[-1]) + 1
    return plan, next_id


def anti_join_committed(spark: SparkSession, with_part: DataFrame,
                        committed: set[int]) -> DataFrame:
    """Drop rows of already-committed partitions via a broadcast
    left_anti join, NOT a literal ``isin``: a long-lived table has
    1e4-1e5 committed partitions, and inlining them as expression
    literals explodes the plan (and costs O(n) per row); the anti-join
    against a small broadcast side is O(1) per row and keeps the plan
    constant-size (SURVEY.md §2.12 prescription)."""
    committed_df = spark.createDataFrame(
        [(int(p),) for p in sorted(committed)], "part_id long")
    return with_part.join(F.broadcast(committed_df), "part_id", "left_anti")


def _derive_int_columns(t: pa.Table) -> pa.Table:
    """Derived integer columns -> exercises bit-pack / FOR (north rule)."""
    if "content" not in t.column_names:
        return t
    content = t.column("content")
    size_bytes = pc.binary_length(content.cast(pa.string())).cast(pa.int64())
    n_lines = pc.add(
        pc.count_substring(content.cast(pa.string()), "\n").cast(pa.int64()),
        1)
    t = t.append_column("size_bytes", size_bytes)
    t = t.append_column("n_lines", n_lines)
    return t


def _content_digest(t: pa.Table) -> str:
    """sha256 of the sorted content column (offsets + bytes) — the
    partition-level integrity check recorded in the manifest."""
    if "content" not in t.column_names:
        return ""
    from vcf2parquet_spark.kernels.codecs import str_buffers
    col = t.column("content").combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    data, offsets = str_buffers(col.cast(pa.string()))
    h = hashlib.sha256()
    h.update(offsets.tobytes())
    h.update(data.tobytes())
    return h.hexdigest()


def encode_partition(part_id: int, t: pa.Table, output: str,
                     opts: EncodeOptions, schema_columns: list[str],
                     already_sorted: bool = False) -> dict:
    """Encode one work unit (runs on an executor). Returns summary dict.

    ``already_sorted`` is set by :func:`encode` when the shuffle itself
    ordered rows by ``sort_columns`` (UTF-8 byte order with nulls LAST —
    matching pyarrow ``pc.sort_indices``' defaults exactly, so block
    bytes and the content digest are identical whichever path sorted).
    """
    t0 = time.time()
    if not opts.nullable:
        bad = {c: t.column(c).null_count for c in t.column_names
               if t.column(c).null_count}
        if bad:
            from vcf2parquet_spark.errors import SchemaError
            raise SchemaError(
                f"nullable=False but partition {part_id} has NULLs in "
                f"{sorted(bad)} (counts {bad})")
    sort_keys = [(c, "ascending") for c in opts.sort_columns
                 if c in t.column_names]
    if sort_keys and not already_sorted:
        t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    if opts.derived_columns:
        t = _derive_int_columns(t)
    profiles = {c: profile_arrow(t.column(c), c) for c in t.column_names}
    codecs = choose_codecs(profiles, opts.codec_overrides,
                           residual=opts.residual)

    rows: dict[str, list] = {k: [] for k in
                             ("part_id", "block_idx", "column", "codec",
                              "n_rows", "raw_bytes", "enc_bytes", "meta", "data")}
    n = t.num_rows
    n_blocks = 0
    raw_total = 0
    enc_total = 0
    for b, lo in enumerate(range(0, n, opts.batch_size)):
        chunk = t.slice(lo, opts.batch_size)
        for col in t.column_names:
            arr = chunk.column(col).combine_chunks()
            payload, meta = encode_column(arr, codecs[col])
            raw = int(profiles[col].get("raw_bytes", 0))
            rows["part_id"].append(part_id)
            rows["block_idx"].append(b)
            rows["column"].append(col)
            rows["codec"].append(codecs[col])
            rows["n_rows"].append(len(arr))
            rows["raw_bytes"].append(_raw_bytes(arr))
            rows["enc_bytes"].append(len(payload))
            rows["meta"].append(json.dumps(meta, sort_keys=True))
            rows["data"].append(payload)
            enc_total += len(payload)
        n_blocks += 1
    raw_total = sum(rows["raw_bytes"])

    blocks = pa.table(
        {k: pa.array(v, type=tbl.BLOCKS_SCHEMA.field(k).type)
         for k, v in rows.items()},
        schema=tbl.BLOCKS_SCHEMA)
    tbl.write_blocks_file(tbl.data_path(output, part_id), blocks,
                          parquet_version=opts.parquet_version)

    seconds = time.time() - t0
    manifest = {
        "part_id": part_id,
        "n_rows": n,
        "n_blocks": n_blocks,
        "schema_columns": schema_columns,
        "all_columns": list(t.column_names),
        "codecs": codecs,
        "profiles": profiles,
        "raw_bytes": raw_total,
        "enc_bytes": enc_total,
        "content_sha256": _content_digest(t),
        "sort_columns": list(opts.sort_columns),
        "metrics": {"seconds": seconds,
                    "rows_per_s": n / seconds if seconds > 0 else None},
        "status": "committed",
    }
    manifest.update(opts.manifest_tags)
    tbl.commit_manifest(output, part_id, manifest)
    return {"part_id": part_id, "n_rows": n, "raw_bytes": raw_total,
            "enc_bytes": enc_total, "n_blocks": n_blocks,
            "n_columns": len(t.column_names), "seconds": seconds,
            "status": "committed"}


def _raw_bytes(arr: pa.Array) -> int:
    t = arr.type
    n_vals = len(arr) - arr.null_count
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return int(pc.sum(pc.binary_length(arr.cast(pa.string()))).as_py() or 0)
    if pa.types.is_boolean(t):
        return n_vals
    if pa.types.is_float32(t):
        return 4 * n_vals
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        vals = arr.drop_null() if arr.null_count else arr
        return 8 * n_vals + (_raw_bytes(vals.flatten()) if len(vals) else 0)
    return 8 * n_vals


def encode(spark: SparkSession, df: DataFrame, output: str,
           opts: EncodeOptions | None = None, **kwargs) -> dict:
    """Encode ``df`` (corpus-shaped) into ``output``. Returns job summary.

    kwargs are EncodeOptions fields (batch_size=, codec_overrides=, ...).
    """
    opts = opts or EncodeOptions(**kwargs)
    tbl.init_layout(output)
    schema_columns = df.columns

    # 1. partition plan from the tiny repo-count aggregate
    counts = [(r["repo"], r["cnt"]) for r in
              df.groupBy("repo").agg(F.count("*").alias("cnt")).collect()]
    plan, n_parts = plan_partitions(counts, opts.target_rows,
                                    offset=opts.part_id_offset)
    plan_df = spark.createDataFrame(
        [(p["repo"], p["base_part_id"], p["fanout"]) for p in plan],
        "repo string, base_part_id long, fanout int")

    # 2. checkpoint: skip committed partitions (exact resume)
    committed = set(tbl.committed_parts(output)) if opts.resume else set()

    # 3. assign part ids: broadcast join + deterministic salt for hot
    # repos.  Null-SAFE on repo (still a BroadcastHashJoin — Spark
    # treats eqNullSafe as an equi-join key): a name-list join would
    # silently DROP every NULL-repo row from the encode.
    plan_r = plan_df.withColumnRenamed("repo", "_plan_repo")
    with_part = (
        df.join(F.broadcast(plan_r),
                F.col("repo").eqNullSafe(F.col("_plan_repo")))
        .drop("_plan_repo")
        .withColumn(
            "part_id",
            (F.col("base_part_id")
             + F.when(F.col("fanout") > 1,
                      F.pmod(F.xxhash64("path", "commit"), F.col("fanout")))
              .otherwise(F.lit(0))).cast("long"))
        .drop("base_part_id", "fanout"))
    if committed:
        with_part = anti_join_committed(spark, with_part, committed)

    # 4. shuffle once by part_id, encode each unit in Arrow on executors
    out_cols = schema_columns
    opts_b = opts

    presort = (opts.presort_in_shuffle
               and all(c in with_part.columns for c in opts.sort_columns))

    def _encode_group(key: tuple, t: pa.Table) -> pa.Table:
        import vcf2parquet_spark._alloc  # noqa: F401 (executor mallopt)
        pid = int(key[0].as_py())
        t = t.drop_columns(["part_id"])
        summary = encode_partition(pid, t, output, opts_b, list(out_cols),
                                   already_sorted=presort)
        return pa.Table.from_pylist([summary], schema=pa.schema([
            ("part_id", pa.int64()), ("n_rows", pa.int64()),
            ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
            ("n_blocks", pa.int32()), ("n_columns", pa.int32()),
            ("seconds", pa.float64()), ("status", pa.string())]))

    # Explicit shuffle width: work units hashed into only ~#cores buckets
    # make the largest bucket the wall clock (and AQE would coalesce
    # them further).  applyInArrow processes a whole shuffle partition's
    # groups serially, so the wall tail is the fullest BUCKET, not the
    # slowest unit; heavy oversubscription (default 16x cores, capped by
    # the unit count) pushes buckets toward one unit each and the tail
    # toward a single unit — this is what keeps the N->4N scaling
    # linear.  Extra near-empty tasks cost ~ms each.
    n_shuffle = max(1, min(n_parts - opts.part_id_offset,
                           spark.sparkContext.defaultParallelism
                           * opts.shuffle_oversub))
    shuffled = with_part.repartition(n_shuffle, "part_id")
    if presort:
        # asc_nulls_last matches pyarrow pc.sort_indices' default null
        # placement, so block bytes and content_sha256 are identical
        # whichever path sorted the rows (Spark's ascending default is
        # nulls-FIRST, which would break cross-path digest stability)
        shuffled = shuffled.sortWithinPartitions(
            F.col("part_id"),
            *[F.col(c).asc_nulls_last() for c in opts.sort_columns])
    summaries = (
        shuffled
        .groupBy("part_id")
        .applyInArrow(_encode_group, schema=SUMMARY_SCHEMA)
        .collect())

    # 5. table-level metadata + snapshot-log entry (time travel / lineage);
    # totals come from the snapshot's LIVE set (not every manifest on
    # disk — compaction leaves superseded partitions behind for time
    # travel until expire_snapshots reclaims them)
    if opts.snapshot:
        snap = tbl.commit_snapshot(output, operation="encode",
                                   wall_time=time.time())
    else:   # caller commits the snapshot; summarize without writing one
        live = tbl.live_parts(output)
        snap = {"snapshot_id": None,
                "summary": {"n_partitions": len(live),
                            "n_rows": sum(m["n_rows"] for m in live.values()),
                            "raw_bytes": sum(m["raw_bytes"]
                                             for m in live.values()),
                            "enc_bytes": sum(m["enc_bytes"]
                                             for m in live.values())}}
    job = {
        "current_snapshot_id": snap["snapshot_id"],
        "format": "vcf2parquet_spark.blocks.v1",
        "schema_columns": schema_columns,
        "n_partitions": n_parts,
        "n_committed": snap["summary"]["n_partitions"],
        "n_rows": snap["summary"]["n_rows"],
        "raw_bytes": snap["summary"]["raw_bytes"],
        "enc_bytes": snap["summary"]["enc_bytes"],
        "batch_size": opts.batch_size,
        "target_rows": opts.target_rows,
        "encoded_this_run": [s["part_id"] for s in summaries],
    }
    tbl.write_table_meta(output, job)
    return job
