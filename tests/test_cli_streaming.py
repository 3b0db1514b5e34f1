"""CLI parity + streaming-encode tests (reference functional tests
analogue: /root/reference/tests/functional.rs — run the real entry
point, compare outputs; split == convert content-wise)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from vcf2parquet_spark import table as tbl
from vcf2parquet_spark.corpus import synth_corpus


@pytest.fixture(scope="module")
def corpus_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "corpus.parquet")
    synth_corpus(spark, 3000, seed=42).write.parquet(p)
    return p


def test_streaming_encode(spark, corpus_parquet, tmp_path):
    from pyspark.sql import functions as F
    from vcf2parquet_spark.decode import verify
    from vcf2parquet_spark.streaming import encode_stream

    out = str(tmp_path / "stream_blocks")
    q = encode_stream(spark, corpus_parquet, out,
                      checkpoint=str(tmp_path / "ckpt"),
                      target_rows=1000, max_files_per_trigger=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    parts = tbl.committed_parts(out)
    assert parts, "no partitions committed by the stream"
    df = spark.read.parquet(corpus_parquet)
    res = verify(spark, df, out)
    assert res["ok"], res


def test_cli_convert_verify_decode(spark, corpus_parquet, tmp_path, capsys):
    # drive the argparse surface in-process (same session reused via
    # getOrCreate; cli calls spark.stop() so re-create after)
    from vcf2parquet_spark import cli

    out = str(tmp_path / "blocks")
    rc = cli.main(["convert", "-i", corpus_parquet, "-o", out,
                   "-b", "1000", "--target-rows", "1500"])
    assert rc == 0
    job = json.loads(capsys.readouterr().out)
    assert job["n_committed"] >= 1

    rc = cli.main(["verify", "-i", corpus_parquet, "-o", out])
    res = json.loads(capsys.readouterr().out)
    assert rc == 0 and res["ok"]

    dest = str(tmp_path / "roundtrip.parquet")
    rc = cli.main(["decode", "-o", out, "--to", dest])
    assert rc == 0
    assert glob.glob(f"{dest}/*.parquet")


def test_cli_convert_clustered(spark, corpus_parquet, tmp_path, capsys):
    from vcf2parquet_spark import cli
    from vcf2parquet_spark.decode import verify

    out = str(tmp_path / "blocks_cl")
    rc = cli.main(["convert", "-i", corpus_parquet, "-o", out,
                   "--clustered", "-b", "1000", "--target-rows", "1500"])
    assert rc == 0
    job = json.loads(capsys.readouterr().out)
    assert job["n_committed"] >= 1
    df = spark.read.parquet(corpus_parquet)
    res = verify(spark, df, out)
    assert res["ok"], res


def test_cli_clustered_requires_parquet(spark, tmp_path):
    from vcf2parquet_spark import cli

    with pytest.raises(SystemExit):
        cli.main(["convert", "-i", str(tmp_path / "x.jsonl"),
                  "-o", str(tmp_path / "o"), "--clustered",
                  "-f", "jsonl"])


def test_cli_split_matches_convert(spark, corpus_parquet, tmp_path, capsys):
    """split (file-per-batch) decodes to the same multiset as convert —
    mirror of the reference's split-vs-convert functional test
    (/root/reference/tests/functional.rs:161-196)."""
    from vcf2parquet_spark import cli
    from vcf2parquet_spark.decode import decode
    from vcf2parquet_spark.session import get_spark

    out_c = str(tmp_path / "c")
    out_s = str(tmp_path / "s")
    assert cli.main(["convert", "-i", corpus_parquet, "-o", out_c]) == 0
    capsys.readouterr()
    assert cli.main(["split", "-i", corpus_parquet, "-o", out_s,
                     "-b", "500"]) == 0
    capsys.readouterr()
    s = get_spark(cores=4)
    a = decode(s, out_c)
    b = decode(s, out_s)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # split produced more, smaller partitions
    assert len(tbl.committed_parts(out_s)) > len(tbl.committed_parts(out_c))


def test_cli_codec_override(spark, corpus_parquet, tmp_path, capsys):
    from vcf2parquet_spark import cli

    out = str(tmp_path / "ov")
    rc = cli.main(["convert", "-i", corpus_parquet, "-o", out,
                   "-c", "content=plain+zlib", "-c", "lang=plain"])
    assert rc == 0
    m = next(iter(tbl.committed_parts(out).values()))
    assert m["codecs"]["content"] == "plain+zlib"
    assert m["codecs"]["lang"] == "plain"


def test_cli_history_no_spark(tmp_path, capsys, monkeypatch):
    """`history` is a pure metadata read: it must print the snapshot log
    without ever starting a SparkSession."""
    from vcf2parquet_spark import cli

    out = str(tmp_path / "blocks")
    tbl.init_layout(out)
    tbl.commit_manifest(out, 0, {"part_id": 0, "n_rows": 5,
                                 "raw_bytes": 10, "enc_bytes": 4})
    tbl.commit_snapshot(out, operation="encode")

    monkeypatch.setattr(
        "vcf2parquet_spark.session.get_spark",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("spark started")))
    rc = cli.main(["history", "-o", out])
    assert rc == 0
    snaps = json.loads(capsys.readouterr().out)
    assert [s["snapshot_id"] for s in snaps] == [0]
    assert snaps[0]["part_ids"] == [0]
    assert snaps[0]["summary"]["n_rows"] == 5


def test_streaming_then_compact(spark, corpus_parquet, tmp_path):
    """Micro-batch appends create small partitions; compact folds them
    into full-size units without changing the row multiset."""
    from pyspark.sql import functions as F
    from vcf2parquet_spark.decode import decode, verify
    from vcf2parquet_spark.maintenance import compact
    from vcf2parquet_spark.streaming import encode_stream

    out = str(tmp_path / "blocks")
    q = encode_stream(spark, corpus_parquet, out,
                      checkpoint=str(tmp_path / "ckpt"),
                      target_rows=500, max_files_per_trigger=1)
    q.processAllAvailable()
    q.stop()

    df = spark.read.parquet(corpus_parquet)
    n_live_before = len(tbl.live_parts(out))
    res = compact(spark, out, target_rows=df.count() + 1)
    assert res["status"] == "committed"
    assert len(tbl.live_parts(out)) < n_live_before
    assert verify(spark, df, out)["ok"]


def test_cli_dedup_clusters(spark, tmp_path, capsys):
    """`dedup` subcommand: documents parquet -> (doc_id, cluster_id)."""
    from vcf2parquet_spark.cli import main

    rows = [(i, f"unique document number {i} " +
             " ".join(f"tok{i}_{j}" for j in range(15))) for i in range(20)]
    rows += [(50, "duplicate body shared by two docs exactly"),
             (51, "duplicate body shared by two docs exactly")]
    docs_p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(docs_p)
    to = str(tmp_path / "clusters.parquet")
    rc = main(["dedup", "-i", docs_p, "--to", to])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_redundant"] >= 1
    got = {r["doc_id"]: r["cluster_id"]
           for r in spark.read.parquet(to).collect()}
    assert got[50] == got[51] == 50


def test_cli_convert_from_xz(spark, tmp_path, capsys):
    """`convert -f jsonl.xz` routes through the lzma source path."""
    import lzma

    from pyspark.sql import functions as F
    from vcf2parquet_spark.cli import main
    from vcf2parquet_spark.decode import decode

    df = synth_corpus(spark, 400, seed=9)
    d = tmp_path / "src"
    os.makedirs(d)
    body = "\n".join(json.dumps(r.asDict()) for r in df.collect())
    with lzma.open(d / "c.jsonl.xz", "wt") as f:
        f.write(body)
    out = str(tmp_path / "blocks")
    rc = main(["convert", "-i", str(d), "-f", "jsonl.xz", "-o", out,
               "--target-rows", "200"])
    assert rc == 0
    assert decode(spark, out).count() == 400
