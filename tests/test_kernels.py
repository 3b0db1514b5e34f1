"""Unit tests for the codec kernels — round trips, edge cases, golden sizes.

Mirrors the reference's builder-content tests (values *and* offsets
asserted exactly — /root/reference/src/name2data.rs:911-1020) and its
byte-identical golden parquet test (/root/reference/src/lib.rs:242-257):
every codec must round-trip bit-identically and encode deterministically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vcf2parquet_spark.kernels import decode_column, encode_column
from vcf2parquet_spark.kernels import codecs as C
from vcf2parquet_spark.kernels import fsst as F
from vcf2parquet_spark.kernels.util import (
    for_pack,
    for_unpack,
    pack_bits,
    unpack_bits,
)

RNG = np.random.default_rng(42)


# --------------------------------------------------------------- bit pack

@pytest.mark.parametrize("width", [0, 1, 3, 7, 8, 13, 31, 33, 64])
def test_pack_bits_roundtrip(width):
    n = 257
    if width == 64:
        vals = RNG.integers(0, 2**63, n).astype(np.uint64) * 2 + 1
    else:
        vals = RNG.integers(0, 2**width if width else 1, n).astype(np.uint64)
    out = unpack_bits(pack_bits(vals, width), width, n)
    np.testing.assert_array_equal(out, vals)


def test_for_full_int64_range():
    vals = np.array([np.iinfo(np.int64).min, -1, 0, np.iinfo(np.int64).max])
    p, m = for_pack(vals)
    np.testing.assert_array_equal(for_unpack(p, m), vals)


def test_for_constant_column_is_zero_bytes():
    p, m = for_pack(np.full(1000, 123456789))
    assert p == b"" and m["width"] == 0
    np.testing.assert_array_equal(for_unpack(p, m), np.full(1000, 123456789))


@given(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_for_hypothesis(xs):
    vals = np.array(xs, dtype=np.int64)
    p, m = for_pack(vals)
    np.testing.assert_array_equal(for_unpack(p, m), vals)


# ------------------------------------------------------------------- ints

@pytest.mark.parametrize("codec", ["plain", "bitpack", "for", "rle"])
def test_int_column_roundtrip(codec):
    vals = np.repeat(RNG.integers(0, 50, 40), RNG.integers(1, 20, 40))
    arr = pa.array(vals, type=pa.int64())
    payload, meta = encode_column(arr, codec)
    out = decode_column(payload, meta)
    assert out.equals(arr)


@pytest.mark.parametrize("codec", ["plain", "for", "rle", "for+zlib"])
def test_int_with_nulls(codec):
    vals = [1, None, 3, 3, 3, None, -7, 2**40, None, 0]
    arr = pa.array(vals, type=pa.int64())
    payload, meta = encode_column(arr, codec)
    assert decode_column(payload, meta).equals(arr)


def test_rle_int_compresses_runs():
    vals = np.repeat(np.arange(10, dtype=np.int64), 10_000)
    p, m = C.enc_rle_int(vals)
    assert len(p) < 200  # 10 runs -> tiny
    np.testing.assert_array_equal(C.dec_rle_int(p, m), vals)


# ---------------------------------------------------------------- strings

STR_EDGE = [
    "", "a", "hello world", "hello world", "",
    "tab\there", "nl\nhere", "unicode: héllo → 世界 🎉",
    "x" * 5000, "\x00byte", "repeat repeat repeat repeat",
]


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst",
                                   "fsst+zlib", "dict+zlib",
                                   # full residual-stage breadth (the
                                   # reference's codec enum analogue)
                                   "fsst+zstd", "fsst+lz4", "fsst+brotli",
                                   "fsst+gzip", "plain+zstd",
                                   # snappy: the reference's DEFAULT file
                                   # codec (cli.rs:134) as a residual
                                   "fsst+snappy", "plain+snappy"])
def test_string_roundtrip_edge_cases(codec):
    arr = pa.array(STR_EDGE, type=pa.string())
    payload, meta = encode_column(arr, codec)
    out = decode_column(payload, meta)
    assert out.equals(arr), codec


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
def test_string_with_nulls(codec):
    arr = pa.array(["a", None, "bb", None, None, "a", ""], type=pa.string())
    payload, meta = encode_column(arr, codec)
    assert decode_column(payload, meta).equals(arr)


@pytest.mark.parametrize("codec", ["plain", "dict", "rle", "fsst"])
def test_string_empty_and_allnull(codec):
    for arr in [pa.array([], type=pa.string()),
                pa.array([None, None], type=pa.string()),
                pa.array(["", "", ""], type=pa.string())]:
        payload, meta = encode_column(arr, codec)
        assert decode_column(payload, meta).equals(arr)


def test_dict_compresses_low_cardinality():
    arr = pa.array(["python", "rust", "go"] * 10_000)
    p, _ = encode_column(arr, "dict")
    raw = sum(len(s) for s in ["python", "rust", "go"]) * 10_000
    assert len(p) < raw / 10


def test_encode_deterministic():
    arr = pa.array(STR_EDGE * 3)
    a = encode_column(arr, "fsst")
    b = encode_column(arr, "fsst")
    assert a[0] == b[0] and a[1] == b[1]


# ------------------------------------------------------------------- FSST

def _code_like(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    kw = ["def ", "return ", "import ", "self.", "    ", "for i in range(",
          "class ", "(self, ", " = ", "np.array", "# comment\n"]
    return ["".join(rng.choice(kw, size=rng.integers(3, 40)).tolist())
            for _ in range(n)]


def test_fsst_compresses_code_like_text():
    vals = _code_like()
    arr = pa.array(vals, type=pa.string())
    payload, meta = encode_column(arr, "fsst")
    raw = sum(len(v.encode()) for v in vals)
    assert decode_column(payload, meta).equals(arr)
    ratio = raw / len(payload)
    assert ratio > 2.0, f"FSST ratio too low: {ratio:.2f}"


def test_fsst_high_entropy_falls_back_to_escapes():
    rng = np.random.default_rng(0)
    vals = [bytes(rng.integers(0, 256, 100).astype(np.uint8)).decode("latin1")
            for _ in range(50)]
    arr = pa.array(vals, type=pa.string())
    payload, meta = encode_column(arr, "fsst")
    assert decode_column(payload, meta).cast(pa.string()).equals(arr)


@given(st.lists(st.text(max_size=50), max_size=100))
@settings(max_examples=50, deadline=None)
def test_fsst_hypothesis_roundtrip(xs):
    arr = pa.array(xs, type=pa.string())
    payload, meta = encode_column(arr, "fsst")
    assert decode_column(payload, meta).equals(arr)


def test_fsst_table_determinism():
    vals = _code_like(500)
    arr = pa.array(vals)
    from vcf2parquet_spark.kernels.codecs import str_buffers
    data, offsets = str_buffers(arr)
    t1 = F.build_table(data, offsets)
    t2 = F.build_table(data, offsets)
    assert [t1.symbol(i) for i in range(t1.n_syms)] == \
           [t2.symbol(i) for i in range(t2.n_syms)]


def test_fsst_chunking_matches_unchunked(monkeypatch):
    vals = _code_like(800)
    arr = pa.array(vals)
    p1, m1 = F.enc_fsst(arr)
    monkeypatch.setattr(F, "CHUNK_BYTES", 1 << 10)
    p2, m2 = F.enc_fsst(arr)
    assert F.dec_fsst(p1, m1).equals(arr)
    assert F.dec_fsst(p2, m2).equals(arr)


# ------------------------------------------------------------------ delta

@pytest.mark.parametrize("codec", ["delta"])
def test_delta_roundtrip(codec):
    cases = [
        np.arange(1000, dtype=np.int64) * 7 + 3,           # sorted
        np.array([], dtype=np.int64),
        np.array([42], dtype=np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max]),
        RNG.integers(-1000, 1000, 500).astype(np.int64),   # unsorted
    ]
    for vals in cases:
        arr = pa.array(vals, type=pa.int64())
        p, m = encode_column(arr, codec)
        assert decode_column(p, m).equals(arr)


def test_delta_beats_for_on_sorted():
    vals = np.cumsum(RNG.integers(0, 4, 10_000)).astype(np.int64) + 10**12
    arr = pa.array(vals, type=pa.int64())
    p_delta, _ = encode_column(arr, "delta")
    p_for, _ = encode_column(arr, "for")
    assert len(p_delta) < len(p_for) / 3


def test_selection_prefers_delta_for_sorted():
    from vcf2parquet_spark.profile import profile_arrow
    from vcf2parquet_spark.select import choose_codec
    vals = np.cumsum(RNG.integers(1, 5, 5000)).astype(np.int64)
    s = profile_arrow(pa.array(vals, type=pa.int64()), "ts")
    assert choose_codec(s) == "delta"


# ---------------------------------------------------------------------------
# extended type coverage: float / bool / list kernels (the reference's seven
# physical shapes, /root/reference/src/columndata.rs:12-28)

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vcf2parquet_spark.kernels import decode_column, encode_column
from vcf2parquet_spark.profile import profile_arrow
from vcf2parquet_spark.select import choose_codec


def _bit_equal(a: pa.Array, b: pa.Array) -> bool:
    """Bit-exact equality: same nulls, and valid values byte-identical
    (NaN payloads and -0.0 must survive, which Array.equals hides)."""
    if len(a) != len(b) or a.null_count != b.null_count:
        return False
    if len(a) and not (np.asarray(a.is_null()) == np.asarray(b.is_null())).all():
        return False
    da, db = a.drop_null(), b.drop_null()
    if pa.types.is_list(a.type) or pa.types.is_large_list(a.type):
        if len(da) == 0:
            return len(db) == 0
        la = pc.list_value_length(da).cast(pa.int64()).to_pylist()
        lb = pc.list_value_length(db).cast(pa.int64()).to_pylist()
        return la == lb and _bit_equal(
            da.flatten(), db.flatten().cast(da.flatten().type))
    if pa.types.is_floating(a.type):
        return (np.asarray(da).tobytes()
                == np.asarray(db.cast(a.type)).tobytes())
    return da.equals(db.cast(da.type))


FLOAT_FIXTURE = pa.array(
    [1.5, -0.0, float("nan"), None, 2.5e300, 1e-310, -7.25] * 5,
    pa.float64())


@pytest.mark.parametrize("codec", ["plain", "rle", "dict", "plain+zlib",
                                   "rle+zlib", "dict+zlib", "plain+zstd",
                                   "rle+lz4"])
def test_float64_roundtrip(codec):
    out = decode_column(*encode_column(FLOAT_FIXTURE, codec))
    assert out.type == pa.float64()
    assert _bit_equal(FLOAT_FIXTURE, out)


def test_float32_roundtrip_preserves_width():
    arr = pa.array(np.float32([0.1, 0.1, float("nan"), 7.25, -0.0]),
                   pa.float32())
    for codec in ("plain", "rle", "dict"):
        out = decode_column(*encode_column(arr, codec))
        assert out.type == pa.float32()
        assert _bit_equal(arr, out)


@pytest.mark.parametrize("codec", ["bitmap", "rle"])
def test_bool_roundtrip(codec):
    arr = pa.array([True] * 30 + [False] * 30 + [None, True, False] * 3)
    out = decode_column(*encode_column(arr, codec))
    assert out.type == pa.bool_()
    assert _bit_equal(arr, out)


@pytest.mark.parametrize("arr", [
    pa.array([[1, 2], None, [], [3, 3, 3]], pa.list_(pa.int64())),
    pa.array([[1.5, float("nan")], [-0.0], None, []], pa.list_(pa.float64())),
    pa.array([["a", None, "bb"], [], None, ["ccc"]], pa.list_(pa.string())),
    pa.array([], pa.list_(pa.float32())),
    pa.array([None, None], pa.list_(pa.int64())),
], ids=["ints", "floats", "strings", "empty", "all-null"])
def test_list_roundtrip_auto_codec(arr):
    codec = choose_codec(profile_arrow(arr, "c"))
    assert codec.startswith("list:")
    out = decode_column(*encode_column(arr, codec))
    assert _bit_equal(arr, out)


@pytest.mark.parametrize("codec", ["list:plain", "list:dict", "list:rle",
                                   "list:fsst+zlib", "list:fsst+zstd"])
def test_list_string_codec_sweep(codec):
    arr = pa.array([["x", "x", "yy"], None, [], ["zzz", "x"] * 20],
                   pa.list_(pa.string()))
    out = decode_column(*encode_column(arr, codec))
    assert _bit_equal(arr, out)


def test_int_dict_codec_roundtrip():
    arr = pa.array([7, 7, -2, 7, None, 1000000, -2] * 10, pa.int64())
    out = decode_column(*encode_column(arr, "dict"))
    assert _bit_equal(arr, out)


def test_float_bool_list_codec_selection():
    """Selection rules for the new types are deterministic and sane."""
    runs = pa.array([1.0] * 100 + [2.0] * 100)
    assert choose_codec(profile_arrow(runs, "c")) == "rle"
    lowcard = pa.array(np.arange(20, dtype=np.float64)[
        np.arange(1000) % 20])
    assert choose_codec(profile_arrow(lowcard, "c")) == "dict"
    randomish = pa.array(np.frombuffer(
        np.random.default_rng(7).bytes(8 * 500), np.float64))
    assert choose_codec(profile_arrow(randomish, "c")).startswith("plain")
    flips = pa.array([bool(i % 2) for i in range(200)])
    assert choose_codec(profile_arrow(flips, "c")) == "bitmap"
    blocks = pa.array([True] * 100 + [False] * 100)
    assert choose_codec(profile_arrow(blocks, "c")) == "rle"
    tags = pa.array([["py", "py", "rs"]] * 50, pa.list_(pa.string()))
    assert choose_codec(profile_arrow(tags, "c")) == "list:dict"


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True, allow_infinity=True,
                                    width=64))))
def test_float_roundtrip_hypothesis(xs):
    arr = pa.array(xs, type=pa.float64())
    for codec in ("plain", "rle", "dict", "plain+zlib"):
        out = decode_column(*encode_column(arr, codec))
        assert _bit_equal(arr, out), codec


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.booleans())))
def test_bool_roundtrip_hypothesis(xs):
    arr = pa.array(xs, type=pa.bool_())
    for codec in ("bitmap", "rle"):
        out = decode_column(*encode_column(arr, codec))
        assert _bit_equal(arr, out), codec


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(
    st.none(),
    st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
             max_size=6)), max_size=30))
def test_list_int_roundtrip_hypothesis(xs):
    arr = pa.array(xs, type=pa.list_(pa.int64()))
    for codec in ("list:plain", "list:for", "list:rle", "list:dict"):
        out = decode_column(*encode_column(arr, codec))
        assert _bit_equal(arr, out), codec


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(st.text(max_size=8),
                                              max_size=5)), max_size=25))
def test_list_str_roundtrip_hypothesis(xs):
    arr = pa.array(xs, type=pa.list_(pa.string()))
    codec = choose_codec(profile_arrow(arr, "c"))
    out = decode_column(*encode_column(arr, codec))
    assert _bit_equal(arr, out), codec


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="abcz/", min_size=0, max_size=6),
                min_size=1, max_size=12),
       st.text(alphabet="abcz/", min_size=0, max_size=4))
def test_startswith_prune_never_drops_matches(values, prefix):
    """_part_may_match('startswith'): whenever the bounds check says
    'cannot match', NO value in the partition starts with the prefix
    (soundness — the side that loses rows).  The check is also exact
    w.r.t. bounds: if every value in [lo, hi] order COULD be there,
    a false only happens when no prefix-p string fits the interval."""
    from vcf2parquet_spark.decode import _part_may_match

    lo, hi = min(values), max(values)
    m = {"profiles": {"c": {"min": lo, "max": hi}}}
    may = _part_may_match(m, "c", "startswith", prefix)
    if not may:
        assert not any(v.startswith(prefix) for v in values)
    # exactness against the bounds themselves: construct a witness set
    # containing a prefix-p member inside [lo, hi] -> must stay True
    if lo <= prefix <= hi:
        assert may


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-50, max_value=50),
                min_size=1, max_size=12),
       st.lists(st.one_of(st.none(),
                          st.integers(min_value=-60, max_value=60)),
                max_size=4))
def test_in_prune_never_drops_matches(values, probe):
    from vcf2parquet_spark.decode import _part_may_match

    m = {"profiles": {"c": {"min": min(values), "max": max(values)}}}
    if not _part_may_match(m, "c", "in", tuple(probe)):
        assert not any(v in values for v in probe if v is not None)
