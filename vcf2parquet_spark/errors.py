"""Engine error taxonomy — parity with the reference's exception tree.

Reference (/root/reference/src/error.rs:10-39 and its Python mapping
python/src/error.rs:34-107): NoConversion / Arrow / Parquet / Io /
NoodlesHeader / Niffler, all under one base.  Ours maps the same roles
onto the Spark engine's failure modes.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base for all vcf2parquet_spark errors (ref: error.rs:10)."""


class NoDataError(EngineError):
    """Input produced no partitions/rows (ref: NoConversion, error.rs:13)."""


class SchemaError(EngineError):
    """Input table shape unsupported (ref: NoodlesHeader, error.rs:28)."""


class CodecError(EngineError):
    """Codec kernel failure: unknown codec, corrupt payload, round-trip
    mismatch (ref: Arrow/Parquet wrapping, error.rs:16-23)."""


class StorageError(EngineError, FileNotFoundError):
    """Blocks/manifest IO failure or manifest-data mismatch
    (ref: Io, error.rs:25).  Also a FileNotFoundError so callers can
    handle missing tables generically."""


class ResumeError(EngineError):
    """Checkpoint state inconsistent with the input (no reference
    analogue — resume is an engine addition per the north rule)."""
