"""``vcfblocks`` — the encoded table as a real Spark data source.

pyspark 4.1's Python Data Source API makes the encoded blocks table a
first-class format for EVERY consumer (``spark.read.format("vcfblocks")
.load(out)``, temp views, BI tools), not just callers of
``decode.sql()``:

* **Partition-filter pushdown** (``DataSourceReader.pushFilters``,
  4.1.0): Catalyst hands the scan its conjunctive filters; bounds-
  checkable ones (``== < <= > >=`` on profiled columns) prune whole
  committed partitions via the manifest min/max bounds — the same
  Iceberg-style plan as :func:`vcf2parquet_spark.decode.
  plan_decode_parts` — before a single block byte is read.  All
  filters are returned to Spark for exact row-level re-evaluation
  (partial pushdown, the Iceberg model), so results are always exact.
* **Column pruning** via the ``columns`` option (comma-separated):
  the pyarrow block read materializes only those columns' block rows.
  NOTE pyspark 4.1.2's Python DS API has no ``pruneColumns`` hook —
  verified empirically: a ``SELECT one_col`` plan shows the BatchScan
  still outputting every schema column — so per-query AUTOMATIC
  pruning remains the job of :func:`vcf2parquet_spark.decode.sql`;
  this option is the explicit hook for everyone else.
* **Time travel** via the ``snapshot_id`` option (int), mirroring
  ``decode(snapshot_id=...)``.
* ``include_derived`` option ("true"/"false"): expose the derived
  integer columns (size_bytes, n_lines) alongside the input schema.

Parallelism = one input partition per committed blocks file (after
pruning), the same distribution as the decode path's file-list
``mapInArrow`` — zero shuffle, workers open their files directly with
pyarrow.  The reference has no reader analogue (its pipeline is
one-way, /root/reference/src/lib.rs:19-67); this is the Spark-native
surface an analytics engine needs on top.

Usage::

    from vcf2parquet_spark.datasource import register_data_source
    register_data_source(spark)
    df = (spark.read.format("vcfblocks")
          .option("columns", "lang,content").load(out))
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.decode import _SPARK_TYPES, _part_may_match

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

FORMAT_NAME = "vcfblocks"

# Filter dataclass -> the manifest bounds-check op it prunes with.
# Everything else (In, IsNull, StringStartsWith, Not, ...) is simply
# not prunable here and is left entirely to Spark's row-level pass.
_FILTER_OPS = {EqualTo: "==", GreaterThan: ">", GreaterThanOrEqual: ">=",
               LessThan: "<", LessThanOrEqual: "<="}


def _plan(options: dict) -> tuple[dict, list[str], list[str]]:
    """Resolve (manifests, base columns, all columns) for the table at
    ``options['path']``, honoring snapshot_id."""
    from vcf2parquet_spark.errors import StorageError

    path = options.get("path")
    if not path:
        raise StorageError("vcfblocks: .load(<table path>) is required")
    snapshot_id = options.get("snapshot_id")
    manifests = tbl.live_parts(path)
    if snapshot_id is not None:
        snaps = {s["snapshot_id"]: set(s["part_ids"])
                 for s in tbl.snapshots(path)}
        sid = int(snapshot_id)
        if sid not in snaps:
            raise StorageError(
                f"unknown snapshot {sid} under {path}; have {sorted(snaps)}")
        committed = tbl.committed_parts(path)
        manifests = {p: m for p, m in committed.items() if p in snaps[sid]}
    if not manifests:
        raise StorageError(f"no committed partitions under {path}")
    meta = tbl.read_table_meta(path)
    first = next(iter(manifests.values()))
    return manifests, list(meta["schema_columns"]), list(first["all_columns"])


def _option_columns(options: dict, base: list[str],
                    all_cols: list[str]) -> list[str]:
    from vcf2parquet_spark.errors import SchemaError

    include_derived = str(options.get("include_derived", "false")
                          ).lower() in ("true", "1", "yes")
    cols = all_cols if include_derived else base
    if options.get("columns"):
        want = [c.strip() for c in options["columns"].split(",") if c.strip()]
        bad = [c for c in want if c not in all_cols]
        if bad:
            raise SchemaError(
                f"vcfblocks: unknown columns {bad}; table has {all_cols}")
        cols = want
    return cols


class BlocksReader(DataSourceReader):
    """Plans one :class:`InputPartition` per committed blocks file
    (post-pruning); each task decodes its file's blocks directly with
    pyarrow — the same zero-shuffle shape as ``decode()``."""

    def __init__(self, schema, options: dict) -> None:
        self._options = dict(options)
        self._cols = [f.name for f in schema.fields]
        self._pruning: list[tuple[str, str, object]] = []

    def pushFilters(self, filters: list[Filter]) -> list[Filter]:
        """Record bounds-checkable filters for manifest-level partition
        pruning; every filter is returned (= still evaluated by Spark),
        so the pushdown is partition-granular and always exact.  Eager
        (not a generator): the side effect on self must happen even if
        the caller never iterates the leftovers."""
        for f in filters:
            op = _FILTER_OPS.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self._pruning.append((f.attribute[0], op, f.value))
        return list(filters)

    def partitions(self) -> Sequence[InputPartition]:
        manifests, _, _ = _plan(self._options)
        keep = [
            pid for pid, m in sorted(manifests.items())
            if all(_part_may_match(m, c, op, v)
                   for c, op, v in self._pruning)]
        path = self._options["path"]
        return [InputPartition(tbl.data_path(path, pid)) for pid in keep]

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        import vcf2parquet_spark._alloc  # noqa: F401 (worker mallopt)
        from vcf2parquet_spark.encode import _pin_arrow
        from vcf2parquet_spark.kernels import decode_column
        _pin_arrow(2)

        cols = self._cols
        t = pq.read_table(
            partition.value,
            columns=["block_idx", "column", "meta", "data"],
            filters=[("column", "in", cols)])
        bidx = t.column("block_idx").to_numpy()
        names = t.column("column").to_pylist()
        metas = t.column("meta").to_pylist()
        # zero-copy payload views (see decode._decode_files for the
        # large_binary-before-combine rationale)
        data_arr = t.column("data").cast(pa.large_binary()).combine_chunks()
        blocks: dict[int, dict] = {}
        for i in range(len(bidx)):
            blocks.setdefault(int(bidx[i]), {})[names[i]] = (
                memoryview(data_arr[i].as_buffer()), metas[i])
        for bi in sorted(blocks):
            by_col = blocks[bi]
            yield pa.record_batch(
                {c: decode_column(by_col[c][0], json.loads(by_col[c][1]))
                 for c in cols})


class BlocksDataSource(DataSource):
    """``spark.read.format("vcfblocks").load(out)`` — options:
    ``columns`` (comma-separated pruning), ``include_derived``
    ("true"), ``snapshot_id`` (int, time travel)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        manifests, base, all_cols = _plan(self.options)
        cols = _option_columns(self.options, base, all_cols)
        first = next(iter(manifests.values()))
        return ", ".join(
            f"`{c}` {_SPARK_TYPES[first['profiles'][c]['type']]}"
            for c in cols)

    def reader(self, schema) -> BlocksReader:
        return BlocksReader(schema, self.options)


def register_data_source(spark) -> None:
    """Idempotently register the ``vcfblocks`` format on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (a runtime
    SQL conf, default false in 4.1): with it off, Spark refuses any
    Python reader that implements ``pushFilters``."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BlocksDataSource)


def read_blocks(spark, output: str, columns: list[str] | None = None,
                include_derived: bool = False,
                snapshot_id: int | None = None):
    """Convenience wrapper: register + read as a DataFrame."""
    register_data_source(spark)
    r = spark.read.format(FORMAT_NAME)
    if columns:
        r = r.option("columns", ",".join(columns))
    if include_derived:
        r = r.option("include_derived", "true")
    if snapshot_id is not None:
        r = r.option("snapshot_id", int(snapshot_id))
    return r.load(output)
