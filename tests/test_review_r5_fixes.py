"""Round-5 code-review fixes, each pinned by a regression test:

1. ``table.snapshots()`` orders by NUMERIC id (lexicographic listdir
   misorders past snap-99999 — reachable by the streaming sink's
   one-snapshot-per-epoch cadence).
2. ``compact()`` + ``BlocksStreamReader``: partitions a compact
   snapshot ADOPTS (crashed-run output, rows never emitted) flow to a
   log-tailing stream; only its ``rewrite_ids`` are skipped.
3. ``BlocksStreamWriter``: a checkpoint deleted and recreated at the
   same location gets FRESH part-id space (the old incarnation's
   committed files are never overwritten).
4. ``BlocksStreamWriter.commit`` drains only ITS OWN staging dir —
   a second query's staged-but-uncommitted files survive.
5. A single string value past the 32-bit offset cap raises a clear
   ``SchemaError`` instead of pyarrow's ArrowInvalid deep in a worker.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest
from pyspark.sql.types import StringType, StructField, StructType

import sys

import vcf2parquet_spark.encode  # noqa: F401 (module object, see below)
from vcf2parquet_spark import table as tbl

# the package __init__ re-exports encode() the FUNCTION over the
# submodule name, so fetch the module object explicitly
enc = sys.modules["vcf2parquet_spark.encode"]
from vcf2parquet_spark.corpus import synth_corpus, synth_corpus_arrow
from vcf2parquet_spark.datasource import (
    QUERY_STRIDE,
    BlocksStreamWriter,
    register_data_source,
)
from vcf2parquet_spark.encode import EncodeOptions, encode
from vcf2parquet_spark.errors import SchemaError
from vcf2parquet_spark.maintenance import compact
from vcf2parquet_spark.streaming.encode_stream import EPOCH_STRIDE


@pytest.fixture(scope="module")
def reg(spark):
    register_data_source(spark)
    return spark


# --- 1. numeric snapshot ordering ------------------------------------------

def test_snapshots_numeric_order_past_5_digits(tmp_path):
    out = str(tmp_path / "t")
    tbl.init_layout(out)
    for sid, parts in ((99999, [1]), (100000, [1, 2])):
        tbl.atomic_write_bytes(
            tbl.snapshot_path(out, sid),
            json.dumps({"snapshot_id": sid, "parent_id": None,
                        "operation": "append", "part_ids": parts,
                        "summary": {}, "metrics": {}}).encode())
    got = [s["snapshot_id"] for s in tbl.snapshots(out)]
    assert got == [99999, 100000]          # lexicographic would flip these
    # the next snapshot continues from the true latest id
    snap = tbl.commit_snapshot(out, operation="append", part_ids=[])
    assert snap["snapshot_id"] == 100001
    assert [s["snapshot_id"] for s in tbl.snapshots(out)] == \
        [99999, 100000, 100001]


# --- 2. compact adoption vs stream tail ------------------------------------

def test_stream_reader_emits_compact_adopted_parts(reg, tmp_path):
    spark = reg
    out, cp = str(tmp_path / "blocks"), str(tmp_path / "cp")
    d1 = synth_corpus(spark, 300, seed=61)
    encode(spark, d1, out)                         # snapshotted
    # a crashed run: manifests committed, no snapshot (dangling)
    d2 = synth_corpus(spark, 200, seed=62)
    offset = max(tbl.committed_parts(out)) + 1
    encode(spark, d2, out, EncodeOptions(snapshot=False, resume=False,
                                         part_id_offset=offset))
    # compaction merges everything undersized — including, through the
    # adopt-first snapshot, the dangling run
    res = compact(spark, out, target_rows=250_000)
    assert res["status"] == "committed"
    snaps = tbl.snapshots(out)
    assert [s["operation"] for s in snaps][-2:] == ["append", "compact"]
    assert set(snaps[-1]["rewrite_ids"]) == set(res["new_parts"])

    q = (spark.readStream.format("vcfblocks").load(out)
         .writeStream.format("memory").queryName("tail_adopt")
         .option("checkpointLocation", cp).start())
    try:
        q.processAllAvailable()
        got = {tuple(r) for r in
               spark.sql("select * from tail_adopt").collect()}
    finally:
        q.stop()
    want = {tuple(r) for r in d1.collect()} | \
        {tuple(r) for r in d2.collect()}
    assert got == want                 # adopted rows arrive, exactly once


# --- 3+4. stream-writer id-space and staging isolation ---------------------

_SCHEMA = StructType([StructField(c, StringType())
                      for c in ("repo", "path", "commit", "lang",
                                "content")])


def _writer(out: str, cp: str) -> BlocksStreamWriter:
    return BlocksStreamWriter(
        _SCHEMA, {"path": out, "checkpointlocation": cp}, False)


def _stage(w: BlocksStreamWriter, n: int, seed: int):
    t = synth_corpus_arrow(n, seed=seed)
    return w.write(iter(t.to_batches()))


def test_stream_writer_recreated_checkpoint_gets_fresh_ids(tmp_path):
    out, cp = str(tmp_path / "t"), str(tmp_path / "cp")
    w1 = _writer(out, cp)
    w1.commit([_stage(w1, 50, seed=71)], batchId=0)
    w1.commit([_stage(w1, 60, seed=72)], batchId=1)
    first = dict(tbl.committed_parts(out))
    assert sorted(first) == [EPOCH_STRIDE, 2 * EPOCH_STRIDE]

    # a legitimate replay of the LAST batch reuses the same ids
    w1.commit([_stage(w1, 60, seed=72)], batchId=1)
    assert sorted(tbl.committed_parts(out)) == sorted(first)

    # checkpoint deleted + recreated: batchId restarts at 0 BELOW the
    # high-water mark -> fresh base, old files untouched
    w2 = _writer(out, cp)
    w2.commit([_stage(w2, 40, seed=73)], batchId=0)
    parts = tbl.committed_parts(out)
    new = set(parts) - set(first)
    assert new == {QUERY_STRIDE + EPOCH_STRIDE}
    for p, m in first.items():
        assert parts[p]["content_sha256"] == m["content_sha256"]
    bases = json.load(open(os.path.join(out, "stream_bases.json")))
    assert bases["_retired"] == [0]
    entry = bases[os.path.abspath(cp)]
    assert entry["base"] == QUERY_STRIDE and entry["last_batch"] == 0


def test_stream_writer_commit_spares_other_querys_staging(tmp_path):
    out = str(tmp_path / "t")
    wa = _writer(out, str(tmp_path / "cpA"))
    wb = _writer(out, str(tmp_path / "cpB"))
    ma = _stage(wa, 30, seed=81)
    mb = _stage(wb, 25, seed=82)
    wa.commit([ma], batchId=0)                    # must not touch B's files
    assert os.path.exists(mb.staged_data)
    wb.commit([mb], batchId=0)
    parts = sorted(tbl.committed_parts(out))
    assert len(parts) == 2 and parts[1] - parts[0] == QUERY_STRIDE
    n = sum(m["n_rows"] for m in tbl.committed_parts(out).values())
    assert n == 55


# --- 5. single value past the 32-bit offset cap ----------------------------

def test_single_giant_value_raises_schema_error(monkeypatch):
    monkeypatch.setattr(enc, "_I32_CAP", 100)
    big = pa.table({"content": pa.array(["x" * 200, "ok"],
                                        type=pa.large_string())})
    with pytest.raises(SchemaError, match="per-value limit"):
        enc._content_digest(big)
    with pytest.raises(SchemaError, match="content.*per-value limit"):
        enc._block_bounds(big, batch_size=10, block_bytes=50)
    # values under the cap still pass (the clamp itself is fine)
    ok = pa.table({"content": pa.array(["x" * 90, "y" * 90],
                                       type=pa.large_string())})
    assert enc._content_digest(ok)
    assert enc._block_bounds(ok, batch_size=10, block_bytes=50) == \
        [(0, 1), (1, 2)]
