"""Multimodal plumbing: binary payload columns with typed metadata,
mapInPandas decode/feature/resize/frame-sample — decode itself is
stubbed (no media libs in this container), the Spark-side schema,
batching, and 1→many row semantics are real and pinned here."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from vcf2parquet_spark.functions.multimodal import (
    decode_image, extract_features, make_media_df, resize_media,
    sample_frames)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .filter(F.col("doc_id") < 30)
    return make_media_df(spark, docs, payload_col="text")


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_extract_features_shape_and_determinism(spark, media):
    f1 = extract_features(media, dim=8).collect()
    f2 = extract_features(media, dim=8).collect()
    assert len(f1) == media.count()
    by_id = {r["media_id"]: r for r in f1}
    for r in f2:
        a = by_id[r["media_id"]]
        assert len(r["feature"]) == 8
        assert r["feature"] == a["feature"]
        assert r["checksum"] == a["checksum"]


def test_resize_media_fixed_size_and_deterministic(spark, media):
    out = resize_media(media, width=8, height=8).collect()
    assert len(out) == media.count()
    for r in out:
        assert len(r["payload"]) == 64
        assert (r["width"], r["height"]) == (8, 8)
    again = {r["media_id"]: r["payload"]
             for r in resize_media(media, width=8, height=8).collect()}
    for r in out:
        assert again[r["media_id"]] == r["payload"]


def test_sample_frames_counts_match_formula(spark, media):
    frames = sample_frames(media, every_n=4, frame_bytes=256)
    got = {r["media_id"]: (r["cnt"], r["total"]) for r in
           frames.groupBy("media_id")
           .agg(F.count("*").alias("cnt"), F.sum("n_bytes").alias("total"))
           .collect()}
    lens = {r["media_id"]: r["L"] for r in
            media.select("media_id",
                         F.octet_length("payload").alias("L")).collect()}
    assert set(got) == set(lens)
    for mid, L in lens.items():
        n_frames = max(1, math.ceil(L / 256))
        n_sampled = math.ceil(n_frames / 4)
        total = sum(min(256, L - fi * 256) for fi in range(0, n_frames, 4))
        assert got[mid] == (n_sampled, total), (mid, L)


def test_frame_indices_are_strided(spark, media):
    rows = sample_frames(media, every_n=3, frame_bytes=128).collect()
    assert all(r["frame_idx"] % 3 == 0 for r in rows)
    assert all(len(r["frame"]) == r["n_bytes"] <= 128 for r in rows)
