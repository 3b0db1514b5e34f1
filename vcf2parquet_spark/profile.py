"""Column statistics profiling — the input to codec auto-selection.

Two layers (SURVEY.md §2 "added operators" table):

* :func:`profile_arrow` — pure pyarrow/numpy stats for one partition's
  column, computed *inside* the encode UDF on executors (vectorized, no
  per-row Python).  These drive the per-partition codec choice and are
  recorded in the partition manifest.
* :func:`profile_df` — cluster-wide profile via built-in Catalyst
  aggregates (``approx_count_distinct``, min/max/avg-length): cheap,
  one shuffle-free scan + partial aggregation; used for plan reporting
  and exposed as a driver-contract query.

Stats per column: n, n_null, n_distinct, distinct_ratio, max/avg run
length, min/max (ints), avg/max byte length and a byte-entropy estimate
(strings, sampled) — exactly the profile inputs the north rule names
(cardinality, run-length, value range, string entropy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ENTROPY_SAMPLE_BYTES = 1 << 16
PRUNE_MAX_LEN = 256   # record string min/max bounds only below this length
# A combined string array with >= this many data bytes cannot be held in
# 32-bit offsets; profile it through large_string (64-bit offsets)
# instead.  profile_arrow sees the WHOLE work unit's column (encode
# blocks are byte-capped downstream, the profile input is not), so a
# unit whose content sums past 2 GiB must not go through
# combine_chunks()/cast(string) — the int32-offset failure class fixed
# in decode.py and encode._materialize.  Module constant so tests can
# lower it and exercise the large path without allocating 2 GiB.
INT32_SAFE_BYTES = (1 << 31) - (1 << 20)


def _run_stats(codes: np.ndarray) -> tuple[int, float]:
    """(max_run, avg_run) over an int code array."""
    n = len(codes)
    if n == 0:
        return 0, 0.0
    change = np.empty(n, dtype=bool)
    change[0] = True
    np.not_equal(codes[1:], codes[:-1], out=change[1:])
    n_runs = int(change.sum())
    starts = np.flatnonzero(change)
    lens = np.diff(np.append(starts, n))
    return int(lens.max()), float(n / n_runs)


def _byte_entropy(data: np.ndarray) -> float:
    """Shannon entropy (bits/byte) of a byte sample."""
    if len(data) == 0:
        return 0.0
    sample = data[: ENTROPY_SAMPLE_BYTES]
    counts = np.bincount(sample, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(sample)
    return float(-(p * np.log2(p)).sum())


def _entropy_sample(values: pa.Array) -> np.ndarray:
    """First ``ENTROPY_SAMPLE_BYTES`` of a string array's data buffer,
    materializing only the row prefix that covers the sample — never the
    whole column (whose data may exceed int32 offsets)."""
    from vcf2parquet_spark.kernels.codecs import str_buffers
    if len(values) == 0:
        return np.zeros(0, np.uint8)
    # rows needed to cover the sample: cumulative byte lengths
    lens = pc.binary_length(values).cast(pa.int64()) \
             .to_numpy(zero_copy_only=False)
    k = int(np.searchsorted(np.cumsum(lens), ENTROPY_SAMPLE_BYTES)) + 1
    prefix = values.slice(0, min(k, len(values)))
    if isinstance(prefix, pa.ChunkedArray):
        prefix = prefix.combine_chunks()
    data, _off = str_buffers(prefix)
    return data[:ENTROPY_SAMPLE_BYTES]


def profile_arrow(arr: pa.Array, name: str = "") -> dict:
    """Profile one column (null-aware). JSON-able output.

    The input is the WHOLE work unit's column (unlike encode blocks it
    is not byte-capped), so the string path must survive >2 GiB of
    data: combine/cast through large_string (64-bit offsets) when the
    payload is at/above ``INT32_SAFE_BYTES``, and sample entropy from a
    bounded row prefix instead of the full data buffer.
    """
    if isinstance(arr, pa.ChunkedArray):
        if ((pa.types.is_string(arr.type)
             or pa.types.is_large_string(arr.type))
                and arr.nbytes >= INT32_SAFE_BYTES):
            arr = arr.cast(pa.large_string()).combine_chunks()
        elif ((pa.types.is_list(arr.type)
               or pa.types.is_large_list(arr.type))
                and arr.nbytes >= INT32_SAFE_BYTES):
            # same overflow class one level down: combining chunked
            # lists concatenates the CHILD arrays, whose int32 offsets
            # (list and/or string child) overflow past 2 GiB — ride
            # 64-bit offsets at both levels (the list profile branch
            # below handles large_list/large_string transparently)
            child = arr.type.value_type
            if pa.types.is_string(child) or pa.types.is_large_string(child):
                child = pa.large_string()
            elif pa.types.is_binary(child) or pa.types.is_large_binary(child):
                child = pa.large_binary()
            arr = arr.cast(pa.large_list(child)).combine_chunks()
        else:
            arr = arr.combine_chunks()
    n = len(arr)
    n_null = arr.null_count
    stats: dict = {"column": name, "n": n, "n_nulls": int(n_null)}
    values = arr.drop_null() if n_null else arr

    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        stats["type"] = "string"
        values = values.cast(
            pa.large_string() if values.nbytes >= INT32_SAFE_BYTES
            else pa.string())
        denc = pc.dictionary_encode(values)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        n_distinct = len(denc.dictionary)
        lens = pc.utf8_length(values)
        raw_bytes = pc.binary_length(values)
        max_run, avg_run = _run_stats(codes)
        data = _entropy_sample(values)
        stats.update({
            "n_distinct": int(n_distinct),
            "distinct_ratio": float(n_distinct / max(1, len(values))),
            "max_run": max_run,
            "avg_run": avg_run,
            "avg_len": float(pc.mean(lens).as_py() or 0.0),
            "max_len": int(pc.max(lens).as_py() or 0),
            "raw_bytes": int(pc.sum(raw_bytes).as_py() or 0),
            "entropy": _byte_entropy(data),
        })
        # value bounds for manifest-level partition pruning (Iceberg-
        # style lower/upper bounds).  Only for short-string columns:
        # content-like columns would bloat every manifest for bounds
        # nobody filters on.
        if len(values) and stats["max_len"] <= PRUNE_MAX_LEN:
            stats["min"] = pc.min(values).as_py()
            stats["max"] = pc.max(values).as_py()
    elif pa.types.is_integer(arr.type):
        stats["type"] = "int64"
        v = values.cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_distinct = len(np.unique(v)) if len(v) else 0
        max_run, avg_run = _run_stats(v)
        if len(v) > 1:
            # width of FOR over consecutive deltas (sortedness signal)
            with np.errstate(over="ignore"):
                d = np.diff(v.view(np.uint64)).view(np.int64)
            delta_width = int(int(d.max()) - int(d.min())).bit_length()
        else:
            delta_width = 0
        stats.update({
            "n_distinct": int(n_distinct),
            "distinct_ratio": float(n_distinct / max(1, len(v))),
            "max_run": max_run,
            "avg_run": avg_run,
            "min": int(v.min()) if len(v) else 0,
            "max": int(v.max()) if len(v) else 0,
            "delta_width": delta_width,
            "raw_bytes": int(8 * len(v)),
        })
    elif pa.types.is_floating(arr.type):
        fdtype, udtype, width = (
            (np.float32, np.uint32, 4) if pa.types.is_float32(arr.type)
            else (np.float64, np.uint64, 8))
        stats["type"] = "float32" if width == 4 else "float64"
        v = values.to_numpy(zero_copy_only=False).astype(fdtype, copy=False)
        bits = np.ascontiguousarray(v).view(udtype)
        n_distinct = len(np.unique(bits)) if len(v) else 0
        max_run, avg_run = _run_stats(bits)
        stats.update({
            "n_distinct": int(n_distinct),
            "distinct_ratio": float(n_distinct / max(1, len(v))),
            "max_run": max_run,
            "avg_run": avg_run,
            "raw_bytes": int(width * len(v)),
            "entropy": _byte_entropy(
                np.ascontiguousarray(v).view(np.uint8)),
        })
        # value bounds for pruning, only when finite (JSON-safe)
        if len(v) and bool(np.isfinite(v).all()):
            stats["min"] = float(v.min())
            stats["max"] = float(v.max())
    elif pa.types.is_boolean(arr.type):
        stats["type"] = "bool"
        v = values.to_numpy(zero_copy_only=False).astype(np.uint8)
        max_run, avg_run = _run_stats(v)
        stats.update({
            "n_distinct": int(len(np.unique(v))) if len(v) else 0,
            "n_true": int(v.sum()),
            "max_run": max_run,
            "avg_run": avg_run,
            "raw_bytes": int(len(v)),
        })
    elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        lens = pc.list_value_length(values).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False) if len(values) else \
               np.zeros(0, np.int64)
        child = profile_arrow(values.flatten(), f"{name}[]") \
            if len(values) else {"type": _child_type_tag(arr.type),
                                 "n": 0, "n_nulls": 0, "raw_bytes": 0}
        stats.update({
            "type": f"list<{child['type']}>",
            "avg_len": float(lens.mean()) if len(lens) else 0.0,
            "max_len": int(lens.max()) if len(lens) else 0,
            "raw_bytes": int(8 * len(values) + child.get("raw_bytes", 0)),
            "child": child,
        })
    else:
        raise TypeError(f"unsupported column type: {arr.type}")
    return stats


def _child_type_tag(list_type: pa.DataType) -> str:
    t = list_type.value_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_integer(t):
        return "int64"
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_floating(t):
        return "float64"
    if pa.types.is_boolean(t):
        return "bool"
    raise TypeError(f"unsupported list element type: {t}")


def profile_table(tbl: pa.Table) -> dict[str, dict]:
    return {name: profile_arrow(tbl.column(name), name)
            for name in tbl.column_names}


def profile_df(df, columns: list[str] | None = None):
    """Cluster-wide profile via built-in aggregates.  Returns a small
    DataFrame: one row per column (column, n, n_nulls, approx_distinct,
    avg_len, max_len, raw_bytes).

    ONE scan regardless of column count: every column's aggregates run
    in a single ``df.agg()`` (map-side partial combine, no UDF), and the
    one-row result is unpivoted to rows via a struct-array explode —
    Catalyst does NOT share the scan across union branches, so the
    previous one-``agg``-per-column + ``unionByName`` shape re-read the
    table #columns times (at 100 TB, a 7-column profile was 7 passes)."""
    from pyspark.sql import functions as F

    # generated aliases embed the source column name; resolve them with
    # backtick-quoted references so a name containing '.' (or '`') is
    # one identifier, not a struct-field access path
    def _q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    cols = columns or [f.name for f in df.schema.fields
                       if types[f.name] in
                       ("string", "long", "integer", "double", "float",
                        "boolean")]
    aggs, structs = [], []
    for c in cols:
        typ = types[c]
        src = F.col(_q(c))
        if typ == "boolean":
            avg_e, max_e = F.avg(src.cast("int")), F.max(src.cast("int"))
            raw_e = F.lit(None).cast("long")
        elif typ == "string":
            avg_e, max_e = F.avg(F.length(src)), F.max(F.length(src))
            raw_e = F.sum(F.octet_length(src)).cast("long")
        else:
            avg_e, max_e = F.avg(src), F.max(src)
            raw_e = F.lit(None).cast("long")
        if typ == "string":   # empty/all-null table: 0 bytes, not NULL
            raw_e = F.coalesce(raw_e, F.lit(0).cast("long"))
        # n = TOTAL rows including nulls, matching profile_arrow's
        # convention (n - n_nulls = non-null values in BOTH layers)
        aggs += [F.count(F.lit(1)).alias(f"{c}__n"),
                 F.coalesce(
                     F.sum(F.when(src.isNull(), 1).otherwise(0))
                      .cast("long"), F.lit(0).cast("long"))
                  .alias(f"{c}__nn"),
                 F.approx_count_distinct(src).alias(f"{c}__ad"),
                 avg_e.cast("double").alias(f"{c}__avg"),
                 max_e.cast("double").alias(f"{c}__max"),
                 raw_e.alias(f"{c}__raw")]
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col(_q(f"{c}__n")).alias("n"),
            F.col(_q(f"{c}__nn")).alias("n_nulls"),
            F.col(_q(f"{c}__ad")).alias("approx_distinct"),
            F.col(_q(f"{c}__avg")).alias("avg_len"),
            F.col(_q(f"{c}__max")).alias("max_len"),
            F.col(_q(f"{c}__raw")).alias("raw_bytes")))
    return (df.agg(*aggs)
            .select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))
