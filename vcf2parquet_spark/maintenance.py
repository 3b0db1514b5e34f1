"""Table maintenance: compaction and snapshot expiry.

At 10^12-file scale, incremental/streaming appends accumulate small
partitions — the classic small-file problem.  ``compact`` is the
Iceberg ``rewrite_data_files`` analogue over our block layout: decode
the undersized partitions, re-encode them into full-size work units,
and commit a ``compact`` snapshot whose live set swaps the old
partitions for the new ones.  The superseded files stay on disk (time
travel to pre-compaction snapshots keeps working) until
``table.expire_snapshots`` reclaims them.

Crash safety: new partitions commit through the ordinary
data-then-manifest protocol; the swap happens only at the final
snapshot commit (one atomic rename).  A crash mid-compaction leaves
the previous snapshot live, plus some dangling-but-valid new
partitions... which the next ``commit_snapshot`` default-rule would
adopt — so ``compact`` re-runs are idempotent at the row level (the
multiset of rows in the live set never changes).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.decode import decode
from vcf2parquet_spark.encode import EncodeOptions, encode


def compact(spark: SparkSession, output: str,
            target_rows: int = 250_000,
            min_fill: float = 0.5, **encode_kwargs) -> dict:
    """Rewrite partitions smaller than ``min_fill * target_rows`` into
    full-size ones.  Returns a summary; no-op if fewer than two
    undersized partitions exist (nothing to merge)."""
    live = tbl.live_parts(output)
    small = sorted(p for p, m in live.items()
                   if m["n_rows"] < target_rows * min_fill)
    if len(small) < 2:
        return {"operation": "compact", "status": "noop",
                "small_parts": small}

    df = decode(spark, output, part_ids=small)
    offset = max(tbl.committed_parts(output)) + 1
    opts = EncodeOptions(target_rows=target_rows,
                         part_id_offset=offset, resume=False,
                         **encode_kwargs)
    encode(spark, df, output, opts)
    # encode() appended an 'encode' snapshot whose live set still holds
    # the small parts; the compact snapshot below performs the swap.
    new_parts = [p for p in tbl.committed_parts(output) if p >= offset]
    keep = sorted((set(live) - set(small)) | set(new_parts))
    snap = tbl.commit_snapshot(output, operation="compact",
                               wall_time=time.time(), part_ids=keep)
    return {"operation": "compact", "status": "committed",
            "snapshot_id": snap["snapshot_id"],
            "rewritten_parts": small, "new_parts": sorted(new_parts),
            "n_rows": snap["summary"]["n_rows"]}
