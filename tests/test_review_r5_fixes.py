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


def _entry(out: str, w: BlocksStreamWriter) -> dict:
    p = os.path.join(out, "_stream_bases", f"q-{w._stage_key}.json")
    with open(p) as f:
        return json.load(f)


def test_stream_writer_recreated_checkpoint_hwm_fallback(tmp_path):
    """No checkpoint metadata readable -> the batch-counter high-water
    mark catches a recreation that restarts below the last batch."""
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
    entry = _entry(out, w2)
    assert entry["retired"] == [0]
    assert entry["base"] == QUERY_STRIDE and entry["last_batch"] == 0


def test_stream_writer_recreated_checkpoint_query_id(tmp_path):
    """The checkpoint metadata uuid catches the one-committed-batch
    recreation the batch counter alone cannot (batchId == last_batch
    == 0 both on a legit replay and on a recreation)."""
    out = str(tmp_path / "t")
    cp = tmp_path / "cp"
    cp.mkdir()
    (cp / "metadata").write_text(json.dumps({"id": "incarnation-a"}))
    w1 = _writer(out, str(cp))
    w1.commit([_stage(w1, 50, seed=74)], batchId=0)
    first = dict(tbl.committed_parts(out))
    assert _entry(out, w1)["query_id"] == "incarnation-a"

    # same id, same batch: a legitimate replay -> same final ids
    w1b = _writer(out, str(cp))
    w1b.commit([_stage(w1b, 50, seed=74)], batchId=0)
    assert sorted(tbl.committed_parts(out)) == sorted(first)

    # recreated checkpoint (new uuid), batchId 0 again -> fresh base
    (cp / "metadata").write_text(json.dumps({"id": "incarnation-b"}))
    w2 = _writer(out, str(cp))
    w2.commit([_stage(w2, 40, seed=75)], batchId=0)
    parts = tbl.committed_parts(out)
    assert set(parts) - set(first) == {QUERY_STRIDE + EPOCH_STRIDE}
    for p, m in first.items():
        assert parts[p]["content_sha256"] == m["content_sha256"]
    entry = _entry(out, w2)
    assert entry["query_id"] == "incarnation-b"
    assert entry["retired"] == [0] and entry["base"] == QUERY_STRIDE
    # allocation claims are on disk for both regions
    claims = sorted(n for n in os.listdir(
        os.path.join(out, "_stream_bases")) if n.endswith(".claim"))
    assert claims == ["b-0.claim", "b-1.claim"]


def test_stream_writer_counter_retire_does_not_keep_old_identity(
        tmp_path):
    """A counter-detected recreation with unreadable metadata must
    persist identity=None on the new base — stamping the OLD id there
    would fire a second, spurious retire once the metadata reads
    again."""
    out = str(tmp_path / "t")
    cp = tmp_path / "cp"
    cp.mkdir()
    (cp / "metadata").write_text(json.dumps({"id": "gen-1"}))
    w1 = _writer(out, str(cp))
    w1.commit([_stage(w1, 30, seed=76)], batchId=0)
    w1.commit([_stage(w1, 30, seed=77)], batchId=1)
    # recreation, metadata not yet readable: counter heuristic fires
    (cp / "metadata").unlink()
    w2 = _writer(out, str(cp))
    w2.commit([_stage(w2, 20, seed=78)], batchId=0)
    e = _entry(out, w2)
    assert e["base"] == QUERY_STRIDE and e["retired"] == [0]
    assert e["query_id"] is None          # NOT "gen-1"
    # metadata becomes readable: the new id is adopted, no new retire
    (cp / "metadata").write_text(json.dumps({"id": "gen-2"}))
    w3 = _writer(out, str(cp))
    w3.commit([_stage(w3, 20, seed=79)], batchId=1)
    e = _entry(out, w3)
    assert e["base"] == QUERY_STRIDE and e["retired"] == [0]
    assert e["query_id"] == "gen-2" and e["last_batch"] == 1


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


def test_expire_snapshots_reclaims_abandoned_staging(tmp_path):
    out = str(tmp_path / "t")
    tbl.init_layout(out)
    tbl.commit_snapshot(out, operation="append", part_ids=[])
    old = os.path.join(out, "_staging", "deadbeef00000000", "attempt1")
    slow = os.path.join(out, "_staging", "feedface00000000", "attempt3")
    fresh = os.path.join(out, "_staging", "cafebabe00000000", "attempt2")
    for d in (old, slow, fresh):
        os.makedirs(d)
        open(os.path.join(d, "x.parquet"), "w").close()
    ancient = 1_000_000_000.0                      # well past any grace
    os.utime(old, (ancient, ancient))
    os.utime(os.path.join(old, "x.parquet"), (ancient, ancient))
    # a slow epoch: the dir is ancient but a file landed just now —
    # the sweep keys on the NEWEST mtime in the tree, so it survives
    os.utime(slow, (ancient, ancient))
    res = tbl.expire_snapshots(out, keep_last=1)
    assert res["removed_staged"] == [
        os.path.join("deadbeef00000000", "attempt1")]
    assert not os.path.exists(os.path.dirname(old))   # empty key dir too
    assert os.path.exists(fresh) and os.path.exists(slow)


def test_expire_snapshots_sweeps_staging_without_snapshots(tmp_path):
    out = str(tmp_path / "t")
    tbl.init_layout(out)                   # no snapshot ever committed
    dead = os.path.join(out, "_staging", "0badc0de00000000", "attempt")
    os.makedirs(dead)
    p = os.path.join(dead, "x.parquet")
    open(p, "w").close()
    os.utime(dead, (1e9, 1e9))
    os.utime(p, (1e9, 1e9))
    res = tbl.expire_snapshots(out)
    assert res["expired_snapshots"] == [] and res["removed_parts"] == []
    assert res["removed_staged"] == [
        os.path.join("0badc0de00000000", "attempt")]
    assert not os.path.exists(dead)


# --- 5. single value past the 32-bit offset cap ----------------------------

def test_single_giant_value_raises_schema_error(monkeypatch):
    monkeypatch.setattr(enc, "_I32_CAP", 100)
    big = pa.table({"content": pa.array(["x" * 200, "ok"],
                                        type=pa.large_string())})
    with pytest.raises(SchemaError, match="per-value limit"):
        enc._content_digest(big)
    with pytest.raises(SchemaError, match="content.*framing limit"):
        enc._block_bounds(big, batch_size=10, block_bytes=50)
    # values under the cap still pass (the clamp itself is fine)
    ok = pa.table({"content": pa.array(["x" * 90, "y" * 90],
                                       type=pa.large_string())})
    assert enc._content_digest(ok)
    assert enc._block_bounds(ok, batch_size=10, block_bytes=50) == \
        [(0, 1), (1, 2)]


def test_block_bounds_caps_list_columns(monkeypatch):
    """List columns ride the same 32-bit framing as strings: child
    BYTES cut blocks, and child COUNT is capped for the kernels'
    checked int32 list offsets."""
    monkeypatch.setattr(enc, "_I32_CAP", 100)
    # child bytes: two rows of 60 child-bytes each must split
    t = pa.table({"toks": pa.array([["x" * 30, "y" * 30],
                                    ["z" * 60]])})
    assert enc._block_bounds(t, batch_size=10, block_bytes=10 ** 9) == \
        [(0, 1), (1, 2)]
    monkeypatch.setattr(enc, "_I32_ELEMS", 4)
    t2 = pa.table({"ids": pa.array([[1, 2, 3], [4, 5], [6]])})
    assert enc._block_bounds(t2, batch_size=10, block_bytes=10 ** 9) == \
        [(0, 1), (1, 3)]
    # a single row over the child-count cap is unencodable
    t3 = pa.table({"ids": pa.array([[1, 2, 3, 4, 5, 6]])})
    with pytest.raises(SchemaError, match="framing limit"):
        enc._block_bounds(t3, batch_size=10, block_bytes=10 ** 9)


def test_blocks_table_chunks_past_payload_cap(monkeypatch):
    """A work unit whose encoded payloads sum past the int32 cap builds
    the blocks table CHUNKED instead of raising ArrowCapacityError."""
    monkeypatch.setattr(enc, "_I32_CAP", 100)
    payloads = [b"a" * 60, b"b" * 60, b"c" * 60]
    rows = {"part_id": [1, 1, 1], "block_idx": [0, 1, 2],
            "column": ["content"] * 3, "codec": ["plain"] * 3,
            "n_rows": [5, 5, 5], "raw_bytes": [60, 60, 60],
            "enc_bytes": [60, 60, 60], "meta": ["{}"] * 3,
            "data": payloads}
    t = enc._blocks_table(rows)
    assert t.column("data").num_chunks > 1
    assert t.column("data").to_pylist() == payloads     # order preserved
    assert t.column("block_idx").to_pylist() == [0, 1, 2]
    # small units keep the single-chunk fast path
    small = {k: v[:1] for k, v in rows.items()}
    assert enc._blocks_table(small).column("data").num_chunks == 1


def test_encode_stream_fresh_checkpoint_never_collides(reg, tmp_path):
    """A restarted stream with a FRESH (or no) checkpoint replays its
    source with epoch ids restarting at 0; the run base must move its
    part ids past everything committed, or encode()'s resume filter
    silently skips the colliding units (r5 review)."""
    from vcf2parquet_spark.streaming import encode_stream
    spark = reg
    src = str(tmp_path / "src")
    out = str(tmp_path / "blocks")
    synth_corpus(spark, 400, seed=91).write.parquet(src)

    q = encode_stream(spark, src, out,
                      checkpoint=str(tmp_path / "cp1"), target_rows=200)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = set(tbl.committed_parts(out))
    from vcf2parquet_spark.decode import decode
    assert decode(spark, out).count() == 400

    # fresh checkpoint on the same table: the source replays everything
    # (standard Spark semantics); every replayed row must land in NEW
    # id space — the pre-fix behavior silently skipped colliding units
    q = encode_stream(spark, src, out,
                      checkpoint=str(tmp_path / "cp2"), target_rows=200)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    second = set(tbl.committed_parts(out)) - first
    assert second and min(second) > max(first)
    assert decode(spark, out).count() == 800   # full replay, no drops


def test_fake_resize_handles_trailing_empty_payload():
    import pandas as pd

    from vcf2parquet_spark.functions.multimodal import _fake_resize
    out = _fake_resize(pd.Series([b"abcdefgh", b""]), 4)
    assert len(out[0]) == 4 and out[1] == b"\x00" * 4
    assert _fake_resize(pd.Series([b""]), 4) == [b"\x00" * 4]
    # empties BETWEEN payloads stay zeroed too
    out = _fake_resize(pd.Series([b"", b"abcd", b""]), 2)
    assert out == [b"\x00\x00", b"ac", b"\x00\x00"]


def test_profile_arrow_chunked_list_over_cap(monkeypatch):
    """A chunked list<string> column past the int32-safe byte threshold
    must profile through large_list/large_string, not a bare
    combine_chunks (ArrowInvalid offset overflow)."""
    import vcf2parquet_spark.profile as prof
    monkeypatch.setattr(prof, "INT32_SAFE_BYTES", 8)
    arr = pa.chunked_array([pa.array([["aaaa"], ["bbbb"]]),
                            pa.array([["cc", "dd"]])])
    st = prof.profile_arrow(arr, "toks")
    assert st["n"] == 3 and st["type"].startswith("list<")


def test_long_string_routing_uses_bytes_not_codepoints():
    from vcf2parquet_spark.select import choose_codec
    base = {"type": "string", "n": 10_000, "n_nulls": 0, "avg_run": 1.0,
            "distinct_ratio": 1.0, "n_distinct": 10_000, "entropy": 4.0,
            "max_run": 1, "avg_len": 100.0, "max_len": 120}
    # 100 codepoints/value but 300 BYTES/value (multi-byte text): the
    # byte threshold routes it to the long-string path
    cjk = dict(base, raw_bytes=300 * 10_000)
    assert choose_codec(cjk, "zlib", "plain") == "plain+brotli9"
    ascii_ = dict(base, raw_bytes=100 * 10_000)
    assert choose_codec(ascii_, "zlib", "plain") == "fsst+zlib"


def test_str_from_buffers_rejects_offset_overflow():
    import numpy as np

    from vcf2parquet_spark.errors import CodecError
    from vcf2parquet_spark.kernels.codecs import str_from_buffers
    offsets = np.array([0, 10, (1 << 31) + 5], np.int64)
    with pytest.raises(CodecError, match="overflow int32"):
        str_from_buffers(np.zeros(16, np.uint8), offsets)
