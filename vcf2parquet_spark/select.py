"""Codec auto-selection: profile stats → per-column codec choice.

Deterministic rule table (the analogue of the reference's schema-mapping
rules, /root/reference/src/schema.rs:58-130 — there: VCF Type×Number →
Arrow field; here: column stats → codec), with documented thresholds:

int64:
  all-equal            → for      (frame-of-reference, width 0 = free)
  avg_run >= RLE_RUN   → rle
  delta_width < for_width → delta (sorted/clustered values: consecutive
                                   deltas pack narrower than FOR)
  min >= 0 & same width→ bitpack
  else                 → for

string:
  avg_run >= RLE_RUN                 → rle   (sorted commit runs)
  distinct_ratio <= DICT_RATIO
    or n_distinct <= DICT_MAX        → dict  (repo / lang)
  entropy >= HIGH_ENTROPY bits/byte  → plain+<residual> (incompressible
                                       by symbol tables; residual stage —
                                       documented fallback, SURVEY §7)
  mean BYTES/value >= LONG_STRING    → plain+brotli-9 (content: block-
                                       level residual beats FSST on both
                                       axes for long values — default
                                       since round 4; long_strings=
                                       "fsst" restores FSST routing)
  else                               → fsst+<residual> (path: FSST
                                       symbol table + residual)

float (codecs run on the exact IEEE bit pattern):
  all-equal / long runs  → rle
  low cardinality        → dict
  entropy < HIGH_ENTROPY → plain+<residual>
  else                   → plain   (random mantissas: nothing to find)

bool:
  avg_run >= BOOL_RLE_RUN → rle    (bitmap is already 1 bit/value)
  else                    → bitmap

list<T>: ``list:<child choice>`` — offsets are always delta+FOR; the
  rule recurses on the flattened child column's stats.

``choose_codecs`` applies the rules per column; ``overrides`` pins a
codec per column (the analogue of the reference's user-chosen ``-c``
codec, /root/reference/src/cli.rs:119-136 — there file-level, here
per-column).
"""

from __future__ import annotations

from vcf2parquet_spark.kernels.util import bit_width

RLE_RUN = 3.0        # mean run length that makes RLE worthwhile
BOOL_RLE_RUN = 16.0  # bitmap is already 1 bit/value; RLE must beat that
DICT_RATIO = 0.05    # distinct/n below this -> dictionary
DICT_MAX = 256       # small absolute dictionaries are always worth it
HIGH_ENTROPY = 7.3   # bits/byte; above -> symbol tables won't help

# default residual stage: zlib-6 measured best end-to-end on the bench
# corpus on BOTH axes (footprint 0.5131 vs zstd-9's 0.5166; encode wall
# 2.85 vs 3.35 s at local[32] — zstd-9's larger match windows fault more
# pages under this host's throttle).  zstd/lz4/brotli/gzip remain fully
# supported via EncodeOptions(residual=...) / CLI --residual; on corpora
# where zstd-9 wins (e.g. the documents fixture: ratio 1.24 vs 1.22 at
# 3x the compress speed) flip the default per job.
DEFAULT_RESIDUAL = "zlib"

# long_strings="plain" routing (the DEFAULT since round 4): for columns
# whose mean value length is above LONG_STRING bytes, a windowed
# block-level residual subsumes almost all of FSST's gain — measured on
# the bench corpus content column (mean 915 B): fsst+zlib ratio 12.64
# at 8.7 MB/s/core vs plain+brotli-9 ratio 15.33 at 28.3 MB/s/core —
# better on BOTH axes, so it is the default selector (the analogue of
# the reference simply riding its best default codec, snappy —
# /root/reference/src/cli.rs:134).  FSST remains the champion for
# short-string columns (path: per-value symbol tables + random access)
# and keeps them under either setting; long_strings="fsst" restores the
# round-1..3 behavior per job via EncodeOptions / CLI --long-strings.
LONG_STRING = 256        # mean bytes/value
# Round-5 re-probe at REAL block granularity (2500-row ≈ 2.3 MB blocks
# of bench content): zstd-15 compresses 2.9% smaller than brotli-9 but
# at 1.9x the encode cost (18.8 vs 36.4 MB/s/core); at whole-buffer
# granularity the gap misleadingly widens to 7.7% (window effects).  A
# ratio-for-speed trade, not a both-axes win, so brotli-9 stays the
# default; footprint-first jobs get it per column via
# ``codec_overrides={"content": "plain+zstd15"}``.
# Brotli QUALITY frontier on the same blocks (measured, per core):
# q7 ratio 14.14 @ 80 MB/s, q8 14.97 @ 54, q9 15.38 @ 39, q10 16.14 @
# 1.7 (q10 switches algorithms; never worth it here).  q9 is the knee:
# one level down buys 1.38x speed for 2.6% footprint — with the bench
# corpus at 0.446x of the snappy reference the headroom to the held
# 0.46 bar is ~1%, so the default stays q9; throughput-first jobs get
# ``codec_overrides={"content": "plain+brotli"}`` (unpinned = level 5).
LONG_RESIDUAL = "brotli9"  # level pinned in the name (deterministic bytes)


def choose_codec(stats: dict, residual: str = DEFAULT_RESIDUAL,
                 long_strings: str = "plain") -> str:
    """Pick a codec spec for one column from its profile stats."""
    if stats["type"].startswith("list<"):
        # offsets framing is fixed (delta+FOR); the choice recurses on
        # the flattened child column's own stats
        child = stats.get("child") or {}
        if not child or child.get("n", 0) == 0:
            return "list:plain"
        return "list:" + choose_codec(child, residual, long_strings)
    if stats["type"] in ("float32", "float64"):
        n_vals = stats["n"] - stats["n_nulls"]
        if n_vals == 0 or stats["n_distinct"] <= 1:
            return "rle"
        if stats["avg_run"] >= RLE_RUN:
            return "rle"
        if (stats["distinct_ratio"] <= DICT_RATIO
                or stats["n_distinct"] <= DICT_MAX):
            return "dict"
        # IEEE mantissa bytes are near-random: zlib only when the byte
        # entropy says there is structure to find
        if stats.get("entropy", 8.0) < HIGH_ENTROPY:
            return "plain+" + residual
        return "plain"
    if stats["type"] == "bool":
        n_vals = stats["n"] - stats["n_nulls"]
        if n_vals and stats["avg_run"] >= BOOL_RLE_RUN:
            return "rle"
        return "bitmap"
    if stats["type"] == "int64":
        n_vals = stats["n"] - stats["n_nulls"]
        if n_vals == 0 or stats["n_distinct"] <= 1:
            return "for"
        if stats["avg_run"] >= RLE_RUN:
            return "rle"
        for_width = bit_width(stats["max"] - stats["min"])
        if stats.get("delta_width", 64) < for_width:
            return "delta"        # sorted/clustered values
        if stats["min"] >= 0 and bit_width(stats["max"]) <= for_width:
            return "bitpack"
        return "for"
    if stats["type"] == "string":
        n_vals = stats["n"] - stats["n_nulls"]
        if n_vals == 0:
            return "plain"
        if stats["avg_run"] >= RLE_RUN:
            return "rle"
        if (stats["distinct_ratio"] <= DICT_RATIO
                or stats["n_distinct"] <= DICT_MAX):
            return "dict"
        if stats["entropy"] >= HIGH_ENTROPY:
            return "plain+" + residual
        # LONG_STRING is a BYTES threshold: derive mean bytes/value
        # from raw_bytes, not avg_len (utf8_length counts CODEPOINTS —
        # CJK/emoji-heavy text averages ~3x more bytes than codepoints
        # and would be misrouted off the measured long-string path)
        mean_bytes = (stats["raw_bytes"] / n_vals
                      if "raw_bytes" in stats
                      else stats.get("avg_len", 0.0))
        if long_strings == "plain" and mean_bytes >= LONG_STRING:
            return "plain+" + LONG_RESIDUAL
        return "fsst+" + residual
    raise TypeError(f"unsupported type: {stats['type']}")


def choose_codecs(profiles: dict[str, dict],
                  overrides: dict[str, str] | None = None,
                  residual: str = DEFAULT_RESIDUAL,
                  long_strings: str = "plain") -> dict[str, str]:
    out = {}
    for col, stats in profiles.items():
        if overrides and col in overrides:
            out[col] = overrides[col]
        else:
            out[col] = choose_codec(stats, residual, long_strings)
    return out
