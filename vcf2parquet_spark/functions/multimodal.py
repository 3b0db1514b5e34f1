"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns with a
metadata struct.  The Spark-side plumbing here is real and tested —
schema, partition-friendly batch iteration, Arrow UDF signatures, and
deterministic fake feature extraction — while the actual media decode
is STUBBED (``decode_image``) because no image/audio libraries exist in
this container; a deployment swaps `_decode_stub` for PIL/ffmpeg calls
inside the same ``mapInPandas`` batch loop without touching the plan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), False),    # opaque bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

FEATURE_SCHEMA = ("media_id long, kind string, n_bytes long, "
                  "checksum string, feature array<float>")


def make_media_df(spark, df: DataFrame, payload_col: str = "content",
                  key_col: str = "doc_id") -> DataFrame:
    """Adapt a text table into the media shape (payload = utf-8 bytes) —
    the deterministic fake used by tests and the bench."""
    return df.select(
        F.col(key_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(payload_col), "utf-8").alias("payload"),
        F.lit(64).alias("width").cast("int"),
        F.lit(64).alias("height").cast("int"))


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — media decode is not available in this container.

    A real deployment replaces this with e.g. PIL.Image.open; the Spark
    plan (mapInPandas over binary batches) is unchanged.
    """
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "container; use extract_features(deterministic_fake=True)")


def _fake_decode(payload_series: pd.Series, dim: int) -> np.ndarray:
    """Deterministic fake 'decode + feature extraction': byte histogram
    folded to ``dim`` float32 features.  Fully vectorized per batch."""
    n = len(payload_series)
    out = np.zeros((n, dim), dtype=np.float32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    lens = payload_series.str.len().to_numpy(dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.frombuffer(b"".join(payload_series.tolist()), dtype=np.uint8)
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    np.add.at(out, (row_of, flat % dim), 1.0)
    denom = np.maximum(lens, 1).astype(np.float32)[:, None]
    return out / denom


def extract_features(df: DataFrame, dim: int = 16,
                     deterministic_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Batch shape: Arrow record batches of (media_id, kind, payload);
    output one feature row per media row.  The partitioning contract —
    narrow map, no shuffle, memory bounded by Arrow batch size — holds
    for the real decoder too.
    """
    import hashlib

    def op(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            if deterministic_fake:
                feats = _fake_decode(payloads, dim)
            else:  # pragma: no cover — needs media libs
                feats = np.stack([decode_image(p) for p in payloads])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.str.len(),
                "checksum": [hashlib.sha256(p).hexdigest() for p in payloads],
                "feature": list(feats),
            })

    cols = ["media_id", "kind", "payload"]
    return df.select(*cols).mapInPandas(op, schema=FEATURE_SCHEMA)
