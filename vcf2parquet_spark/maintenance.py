"""Table maintenance: compaction and snapshot expiry.

At 10^12-file scale, incremental/streaming appends accumulate small
partitions — the classic small-file problem.  ``compact`` is the
Iceberg ``rewrite_data_files`` analogue over our block layout: decode
the undersized partitions, re-encode them into full-size work units,
and commit a ``compact`` snapshot whose live set swaps the old
partitions for the new ones.  The superseded files stay on disk (time
travel to pre-compaction snapshots keeps working) until
``table.expire_snapshots`` reclaims them.

Crash safety (single-writer protocol):

* the inner re-encode runs with ``snapshot=False`` and tags every new
  manifest ``pending_rewrite`` — so NO intermediate snapshot ever
  contains both the small partitions and their rewritten copies, and
  ``table.live_parts``'s dangling-part adoption skips the pending
  partitions: any reader (or crash) between the re-encode and the
  final swap sees exactly the previous live set, never duplicates;
* the swap itself is the one new snapshot (one atomic rename);
* a re-run after a crash first deletes committed-but-unsnapshotted
  ``pending_rewrite`` partitions (they duplicate live rows and were
  never readable), so ``compact`` re-runs are idempotent at the row
  level — the multiset of rows in the live set never changes.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.decode import decode
from vcf2parquet_spark.encode import EncodeOptions, encode


def abandon_pending_rewrites(output: str,
                             ever: set[int] | None = None) -> list[int]:
    """Delete committed-but-unsnapshotted ``pending_rewrite`` partitions
    (the leftovers of a crashed compaction — duplicates of live rows
    that no snapshot references and no reader can see).  Returns the
    reclaimed part ids.  ``ever`` = the union of all snapshots'
    part_ids, passable by callers that already scanned the log (the
    scan is O(snapshots) — one file per streaming epoch)."""
    manifests = tbl.committed_parts(output)
    if ever is None:
        ever = set()
        for s in tbl.snapshots(output):
            ever.update(s["part_ids"])
    stale = sorted(p for p, m in manifests.items()
                   if m.get("pending_rewrite") and p not in ever)
    for p in stale:
        for path in (tbl.data_path(output, p), tbl.manifest_path(output, p)):
            if os.path.exists(path):
                os.remove(path)
    return stale


def compact(spark: SparkSession, output: str,
            target_rows: int = 250_000,
            min_fill: float = 0.5, **encode_kwargs) -> dict:
    """Rewrite partitions smaller than ``min_fill * target_rows`` into
    full-size ones.  Returns a summary; no-op if fewer than two
    undersized partitions exist (nothing to merge)."""
    ever: set[int] = set()
    for s in tbl.snapshots(output):
        ever.update(s["part_ids"])
    abandoned = abandon_pending_rewrites(output, ever=ever)
    live = tbl.live_parts(output)
    small = sorted(p for p, m in live.items()
                   if m["n_rows"] < target_rows * min_fill)
    if len(small) < 2:
        return {"operation": "compact", "status": "noop",
                "small_parts": small, "abandoned_parts": abandoned}
    # Compaction sources must be snapshot-referenced BEFORE the rewrite:
    # the compact snapshot marks its new partitions as rewrites of
    # already-delivered rows (``rewrite_ids``), so a log-tailing stream
    # reader skips them.  If any source is a dangling adopted partition
    # (crashed run: manifest committed, never snapshotted), its rows
    # were never delivered — adopt the live set with one ordinary
    # snapshot first so the tail emits them, then rewrite.
    if any(p not in ever for p in small):
        tbl.commit_snapshot(output, operation="append",
                            wall_time=time.time())

    df = decode(spark, output, part_ids=small)
    offset = max(tbl.committed_parts(output)) + 1
    opts = EncodeOptions(target_rows=target_rows,
                         part_id_offset=offset, resume=False,
                         snapshot=False,
                         manifest_tags={"pending_rewrite": True},
                         **encode_kwargs)
    encode(spark, df, output, opts)
    # the swap: ONE new snapshot whose live set drops the small parts
    # and adopts the rewrite — the only commit point of the whole op
    new_parts = [p for p in tbl.committed_parts(output) if p >= offset]
    keep = sorted((set(live) - set(small)) | set(new_parts))
    snap = tbl.commit_snapshot(
        output, operation="compact", wall_time=time.time(), part_ids=keep,
        extra={"rewrite_ids": sorted(new_parts)})
    meta = tbl.read_table_meta(output)
    meta.update({"current_snapshot_id": snap["snapshot_id"],
                 "n_partitions": snap["summary"]["n_partitions"],
                 "n_committed": snap["summary"]["n_partitions"],
                 "n_rows": snap["summary"]["n_rows"],
                 "raw_bytes": snap["summary"]["raw_bytes"],
                 "enc_bytes": snap["summary"]["enc_bytes"]})
    tbl.write_table_meta(output, meta)
    return {"operation": "compact", "status": "committed",
            "snapshot_id": snap["snapshot_id"],
            "rewritten_parts": small, "new_parts": sorted(new_parts),
            "abandoned_parts": abandoned,
            "n_rows": snap["summary"]["n_rows"]}
