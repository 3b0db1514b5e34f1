"""vcf2parquet_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the *capability* of natir/vcf2parquet
(reference: /root/reference, Rust — record-to-columnar encode pipeline,
``src/lib.rs:19-67``) as an idiomatic Spark engine over a corpus table of
source-code repositories ``(repo, path, commit, lang, content)``:

* profile per-column statistics (cardinality, run length, value range,
  byte entropy) inside vectorized Arrow/pandas UDFs — ``profile.py``;
* auto-select per-column lightweight codecs — dictionary, RLE, FSST,
  bit-packing, frame-of-reference — ``select.py`` + ``kernels/``;
* encode to columnar blocks + a codec-choice manifest in an
  Iceberg-style partition layout — ``encode.py`` + ``table.py``;
* decode bit-identically (sha256-verified) — ``decode.py``;
* handle skew explicitly (hot-repo salting + range partitioning) and
  resume exactly from per-partition checkpoint manifests.

Public API (mirrors the reference's Python binding surface,
``python/src/lib.rs:34-84`` — ``convert_vcf(input, output, batch_size,
compression, ...)`` — re-shaped for DataFrames):

    encode(spark, df, output, *, batch_size=100_000, codec=None, ...)
    decode(spark, output) -> DataFrame
    verify(spark, df, output) -> bool
"""

from __future__ import annotations

__version__ = "0.1.0"

__all__ = ["encode", "decode", "verify", "synth_corpus", "__version__"]


from vcf2parquet_spark.corpus import synth_corpus
from vcf2parquet_spark.encode import EncodeOptions, encode, encode_clustered
from vcf2parquet_spark.decode import decode, register_view, sql, verify
from vcf2parquet_spark.datasource import read_blocks, register_data_source

__all__ += ["EncodeOptions", "encode_clustered", "register_view", "sql",
            "read_blocks", "register_data_source"]
