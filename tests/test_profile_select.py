"""Profile → codec-selection tests (the analogue of the reference's
schema-mapping tests, /root/reference/src/schema.rs:385-423: every
input shape must map to the expected output choice — FIXTURES.md F3)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vcf2parquet_spark.corpus import synth_corpus_arrow
from vcf2parquet_spark.profile import profile_arrow, profile_table
from vcf2parquet_spark.select import choose_codec, choose_codecs


def test_profile_string_stats():
    arr = pa.array(["a", "a", "a", "b", "b", None, "c"])
    s = profile_arrow(arr, "x")
    assert s["n"] == 7 and s["n_nulls"] == 1
    assert s["n_distinct"] == 3
    assert s["max_run"] == 3
    assert s["avg_run"] == 2.0  # 6 values, 3 runs


def test_profile_int_stats():
    arr = pa.array([5, 5, 5, 5, 9, 1], type=pa.int64())
    s = profile_arrow(arr, "x")
    assert s["min"] == 1 and s["max"] == 9
    assert s["max_run"] == 4


def test_selection_rules_int():
    assert choose_codec({"type": "int64", "n": 10, "n_nulls": 0,
                         "n_distinct": 1, "avg_run": 10.0,
                         "min": 7, "max": 7}) == "for"
    assert choose_codec({"type": "int64", "n": 100, "n_nulls": 0,
                         "n_distinct": 5, "avg_run": 20.0,
                         "min": 0, "max": 4}) == "rle"
    assert choose_codec({"type": "int64", "n": 100, "n_nulls": 0,
                         "n_distinct": 90, "avg_run": 1.1,
                         "min": 0, "max": 100}) == "bitpack"
    assert choose_codec({"type": "int64", "n": 100, "n_nulls": 0,
                         "n_distinct": 90, "avg_run": 1.1,
                         "min": 1_000_000, "max": 1_000_100}) == "for"


def test_selection_rules_string():
    base = {"type": "string", "n": 10_000, "n_nulls": 0}
    assert choose_codec({**base, "n_distinct": 40, "distinct_ratio": 0.004,
                         "avg_run": 30.0, "entropy": 4.0}) == "rle"
    assert choose_codec({**base, "n_distinct": 40, "distinct_ratio": 0.004,
                         "avg_run": 1.2, "entropy": 4.0}) == "dict"
    assert choose_codec({**base, "n_distinct": 9_500, "distinct_ratio": 0.95,
                         "avg_run": 1.0, "entropy": 4.8}) == "fsst+zlib"
    assert choose_codec({**base, "n_distinct": 9_500, "distinct_ratio": 0.95,
                         "avg_run": 1.0, "entropy": 7.9}) == "plain+zlib"
    # residual stage is configurable (reference -c codec enum analogue)
    assert choose_codec({**base, "n_distinct": 9_500, "distinct_ratio": 0.95,
                         "avg_run": 1.0, "entropy": 4.8},
                        residual="zstd") == "fsst+zstd"


def test_selection_golden_on_corpus():
    """Pinned profile→choice mapping on the sorted synthetic corpus —
    the F3 'selection_golden' fixture: this is what the north rule
    promises (dict for repo/lang, RLE for commit runs, FSST for
    path/content, FOR/bitpack for derived ints)."""
    t = synth_corpus_arrow(20_000, seed=42)
    import pyarrow.compute as pc
    t = t.take(pc.sort_indices(
        t, sort_keys=[("repo", "ascending"), ("path", "ascending"),
                      ("commit", "ascending")]))
    profs = profile_table(t)
    codecs = choose_codecs(profs)
    assert codecs["repo"] == "rle"          # sorted -> giant runs
    assert codecs["lang"] == "dict"         # 20 values, short runs
    assert codecs["commit"] == "rle"        # commit runs within repo
    assert codecs["path"] in ("fsst+zlib",)  # near-unique structured strings
    # long values (mean ~900 B): block-level plain+brotli-9 beats FSST
    # on both axes (default since round 4); FSST routing still available
    assert codecs["content"] == "plain+brotli9"
    assert choose_codecs(profs, long_strings="fsst")["content"] == "fsst+zlib"
    # derived ints
    sb = pc.binary_length(t["content"]).cast(pa.int64())
    s = profile_arrow(sb, "size_bytes")
    assert choose_codec(s) in ("bitpack", "for", "delta")


def test_overrides_win():
    profs = {"x": {"type": "string", "n": 10, "n_nulls": 0, "n_distinct": 1,
                   "distinct_ratio": 0.1, "avg_run": 10.0, "entropy": 1.0}}
    assert choose_codecs(profs, {"x": "plain"})["x"] == "plain"


def test_long_strings_plain_routing():
    """The default routes only LONG string columns to plain+brotli-9;
    short-string columns keep FSST either way; long_strings="fsst"
    restores the pre-round-4 routing."""
    long_col = {"type": "string", "n": 1000, "n_nulls": 0,
                "n_distinct": 990, "distinct_ratio": 0.99, "avg_run": 1.0,
                "entropy": 4.8, "avg_len": 900.0}
    short_col = dict(long_col, avg_len=40.0)
    assert choose_codec(long_col) == "plain+brotli9"          # default
    assert choose_codec(long_col, long_strings="fsst") == "fsst+zlib"
    assert choose_codec(short_col) == "fsst+zlib"
    assert choose_codec(short_col, long_strings="fsst") == "fsst+zlib"


def test_brotli9_cascade_roundtrip():
    import pyarrow as pa
    from vcf2parquet_spark.kernels import decode_column, encode_column
    arr = pa.array([("line %d of source\n" % i) * 40 for i in range(200)]
                   + [None])
    for spec in ("plain+brotli9", "plain+zstd15"):
        p, m = encode_column(arr, spec)
        assert decode_column(p, m).equals(arr), spec


def test_profile_large_offset_path_matches_small(monkeypatch):
    """A string column at/over INT32_SAFE_BYTES is profiled through
    large_string (64-bit offsets) — same stats as the int32 path.
    Threshold monkeypatched down so the test doesn't allocate 2 GiB;
    the real constant only changes WHICH arrow representation carries
    the same bytes."""
    import vcf2parquet_spark.profile as prof

    chunks = pa.chunked_array([
        pa.array(["def main():", "def main():", None, "x" * 300]),
        pa.array(["import os", "import os", "import os"]),
    ])
    small = prof.profile_arrow(chunks, "content")

    monkeypatch.setattr(prof, "INT32_SAFE_BYTES", 1)
    large = prof.profile_arrow(chunks, "content")
    assert large == small
    # and a pre-combined large_string input under either threshold
    monkeypatch.undo()
    as_large = chunks.cast(pa.large_string()).combine_chunks()
    assert prof.profile_arrow(as_large, "content") == small


def test_entropy_sample_is_row_bounded(monkeypatch):
    """Entropy reads only the row prefix covering the sample budget —
    never the whole data buffer (which may exceed int32 offsets)."""
    import vcf2parquet_spark.profile as prof

    monkeypatch.setattr(prof, "ENTROPY_SAMPLE_BYTES", 8)
    calls = []
    orig = prof._entropy_sample

    def spy(values):
        out = orig(values)
        calls.append(len(out))
        return out

    monkeypatch.setattr(prof, "_entropy_sample", spy)
    arr = pa.array(["abcd", "efgh", "SHOULD-NOT-MATTER" * 100])
    s = prof.profile_arrow(arr, "x")
    assert calls == [8]          # exactly the sample budget, not nbytes
    assert s["entropy"] > 0
