"""Source formats (op 1 parity: compressed record-oriented inputs) and
the engine error taxonomy (op 22 parity)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from vcf2parquet_spark.corpus import synth_corpus
from vcf2parquet_spark.errors import CodecError, EngineError, SchemaError, StorageError
from vcf2parquet_spark.kernels import decode_column, encode_column
from vcf2parquet_spark.sources import read_corpus, write_corpus


@pytest.fixture(scope="module")
def small_corpus(spark):
    df = synth_corpus(spark, 500, seed=42, partitions=2)
    df.cache().count()
    return df


@pytest.mark.parametrize("fmt,codec", [
    ("parquet", None),
    ("jsonl", "gzip"),      # niffler-gzip analogue: .json.gz scan
    ("csv", "bzip2"),       # splittable compressed text scan
])
def test_source_roundtrip(spark, small_corpus, tmp_path, fmt, codec):
    p = str(tmp_path / f"c_{fmt}")
    write_corpus(small_corpus, p, fmt=fmt, compression=codec)
    back = read_corpus(spark, p, fmt=fmt)
    assert back.columns == ["repo", "path", "commit", "lang", "content"]
    assert back.count() == small_corpus.count()


def test_source_bad_format(spark, tmp_path):
    with pytest.raises(SchemaError):
        read_corpus(spark, str(tmp_path), fmt="avro")


def test_source_missing_columns(spark, tmp_path):
    p = str(tmp_path / "bad.parquet")
    spark.range(5).write.parquet(p)
    with pytest.raises(SchemaError, match="missing columns"):
        read_corpus(spark, p, fmt="parquet")


def test_codec_error_on_corrupt_payload():
    arr = pa.array(["hello", "world", "hello"])
    payload, meta = encode_column(arr, "fsst")
    with pytest.raises(CodecError):
        decode_column(payload[: len(payload) // 2], meta)
    assert issubclass(CodecError, EngineError)


def test_storage_error_is_filenotfound(spark):
    from vcf2parquet_spark.decode import decode
    with pytest.raises(StorageError):
        decode(spark, "/tmp/definitely/not/here")
    with pytest.raises(FileNotFoundError):
        decode(spark, "/tmp/definitely/not/here")


def test_source_xz_roundtrip(spark, small_corpus, tmp_path):
    """xz parity with the reference's niffler auto-detect (vcf2parquet.rs
    :24-27): jsonl.xz and csv.xz read via the binaryFile+lzma path,
    multiset-identical to the uncompressed read."""
    import lzma
    import os

    from pyspark.sql import functions as F

    for fmt in ("jsonl", "csv"):
        # jsonl carries the full adversarial fixture (NULs, control
        # chars); csv is limited by the CSV format itself, so that leg
        # tests the xz transport on control-char-free rows only — and
        # excludes empty strings, which Spark's CSV reader (and, for
        # parity, the .xz path) reads back as NULL (nullValue="")
        expect = (small_corpus if fmt == "jsonl" else small_corpus.filter(
            ~F.col("content").rlike("[\\x00-\\x08\\x0b-\\x1f]")
            & (F.length("content") > 0)))
        rows = expect.collect()
        d = tmp_path / f"xz_{fmt}"
        os.makedirs(d)
        # two files -> two file-parallel tasks, like .gz
        halves = [rows[: len(rows) // 2], rows[len(rows) // 2:]]
        for i, part in enumerate(halves):
            if fmt == "jsonl":
                import json
                body = "\n".join(json.dumps(r.asDict()) for r in part)
            else:
                import csv
                import io
                buf = io.StringIO()
                w = csv.writer(buf)
                w.writerow(["repo", "path", "commit", "lang", "content"])
                for r in part:
                    w.writerow([r[c] for c in
                                ("repo", "path", "commit", "lang", "content")])
                body = buf.getvalue()
            with lzma.open(d / f"part-{i}.{fmt}.xz", "wt") as f:
                f.write(body)
        back = read_corpus(spark, str(d), fmt=f"{fmt}.xz")
        assert back.columns == ["repo", "path", "commit", "lang", "content"]
        assert back.count() == expect.count()
        assert back.exceptAll(expect).count() == 0
        assert expect.exceptAll(back).count() == 0


def test_source_xz_bad_base_format(spark, tmp_path):
    with pytest.raises(SchemaError):
        read_corpus(spark, str(tmp_path), fmt="avro.xz")


def test_xz_streaming_chunked_parse(spark, small_corpus):
    """VERDICT r5 item 5: the .xz path must parse in bounded memory —
    lzma.LZMAFile streaming + chunked pandas parse, never a whole-file
    lzma.decompress.  Asserted at the chunk iterator level (chunk count
    and shape) and end-to-end (a small chunk_rows yields the same
    multiset through read_corpus)."""
    import json
    import lzma
    import math

    from vcf2parquet_spark.sources import _iter_xz_chunks

    rows = [{"repo": f"org/r{i % 3}", "path": f"f{i}.py",
             "commit": f"{i:040x}", "lang": "py",
             "content": f"line {i}\n" * 3} for i in range(10)]
    raw = lzma.compress(
        "\n".join(json.dumps(r) for r in rows).encode())

    for chunk_rows in (3, 4, 100):
        chunks = list(_iter_xz_chunks(raw, "jsonl", chunk_rows))
        assert len(chunks) == math.ceil(len(rows) / chunk_rows)
        assert all(len(c) <= chunk_rows for c in chunks)
        assert sum(len(c) for c in chunks) == len(rows)
        flat = [dict(zip(c.columns, vals))
                for c in chunks for vals in c.itertuples(index=False)]
        assert flat == rows

    # csv leg: header parsed once, chunks after it still aligned
    import csv
    import io
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["repo", "path", "commit", "lang", "content"])
    for r in rows:
        w.writerow([r[c] for c in
                    ("repo", "path", "commit", "lang", "content")])
    raw_csv = lzma.compress(buf.getvalue().encode())
    chunks = list(_iter_xz_chunks(raw_csv, "csv", 4))
    assert len(chunks) == 3 and sum(len(c) for c in chunks) == 10

    # end-to-end through Spark with a tiny chunk size: same multiset
    import os
    import tempfile
    d = tempfile.mkdtemp(prefix="vp_xz_chunk_")
    expect = small_corpus
    with lzma.open(os.path.join(d, "part-0.jsonl.xz"), "wt") as f:
        f.write("\n".join(json.dumps(r.asDict())
                          for r in expect.collect()))
    back = read_corpus(spark, d, fmt="jsonl.xz", xz_chunk_rows=2)
    assert back.count() == expect.count()
    assert back.exceptAll(expect).count() == 0
    assert expect.exceptAll(back).count() == 0


def test_source_csv_xz_null_parity(spark, tmp_path):
    """Empty CSV fields decode to NULL on BOTH the native Spark CSV
    path and the binaryFile+lzma .xz path (Spark's nullValue="" default
    vs pandas' keep_default_na) — same corpus, same nulls, regardless
    of compression extension.  Literal "NA" stays text on both."""
    import lzma
    import os

    body = ("repo,path,commit,lang,content\n"
            "org/r,a.py," + "c" * 40 + ",,x = 1\n"
            "org/r,b.py," + "d" * 40 + ",py,\n"
            "org/r,c.py," + "e" * 40 + ",NA,y = 2\n")
    d_plain = tmp_path / "plain"
    d_xz = tmp_path / "xz"
    os.makedirs(d_plain)
    os.makedirs(d_xz)
    (d_plain / "part-0.csv").write_text(body)
    with lzma.open(d_xz / "part-0.csv.xz", "wt") as f:
        f.write(body)
    a = read_corpus(spark, str(d_plain), fmt="csv")
    b = read_corpus(spark, str(d_xz), fmt="csv.xz")
    ra = sorted([tuple(r) for r in a.collect()])
    rb = sorted([tuple(r) for r in b.collect()])
    assert ra == rb
    assert ra[0][3] is None          # empty lang -> NULL on both
    assert ra[1][4] is None          # empty content -> NULL on both
    assert ra[2][3] == "NA"          # literal NA stays text on both


def test_list_offsets_int32_overflow_guard():
    """A list block whose child count exceeds 2^31-1 must raise, not
    silently wrap into corrupt offsets (ADVICE r2)."""
    import numpy as np

    from vcf2parquet_spark.kernels import _i32_offsets

    ok = _i32_offsets(np.array([0, 5, 9], dtype=np.int64))
    assert ok.dtype == np.int32 and list(ok) == [0, 5, 9]
    with pytest.raises(CodecError, match="overflows int32"):
        _i32_offsets(np.array([0, 2**31], dtype=np.int64))
