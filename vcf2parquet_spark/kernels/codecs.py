"""Lightweight column codecs: plain, dictionary, RLE, bit-pack, FOR, zlib.

Each codec is a pair of pure functions

    enc_<codec>(values) -> (payload: bytes, meta: dict)
    dec_<codec>(payload, meta) -> values

operating on *null-stripped* values: int columns as ``np.int64`` arrays,
string columns as null-free ``pa.StringArray`` (helpers convert to/from a
``(data: np.uint8[n_bytes], offsets: np.int64[n+1])`` pair).  Everything
is vectorized numpy / pyarrow-compute — no per-row Python anywhere
(``input_hint`` requirement).  Null handling / type tagging / cascade
compression live one layer up in ``kernels.__init__``.

These are the Spark-side analogue of the reference's per-column Arrow
builders (``/root/reference/src/columndata.rs:32-204``) — but where the
reference delegates compression to whole-file Parquet snappy
(``src/lib.rs:48-49``), these kernels implement the per-column
lightweight schemes the north rule names.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vcf2parquet_spark.kernels.util import (
    bit_width,
    for_pack,
    for_unpack,
    get_section,
    pack_bits,
    pack_sections,
    unpack_bits,
)

# ------------------------------------------------------------------ ints


def enc_bitpack(vals: np.ndarray) -> tuple[bytes, dict]:
    """Bit-pack non-negative ints at minimal width (no reference subtract)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    if len(v) and int(v.min()) < 0:
        raise ValueError("bitpack requires non-negative values; use 'for'")
    width = bit_width(int(v.max())) if len(v) else 0
    payload = pack_bits(v.view(np.uint64), width)
    return payload, {"width": width, "n": int(len(v))}


def dec_bitpack(payload: bytes, meta: dict) -> np.ndarray:
    return unpack_bits(payload, meta["width"], meta["n"]).astype(np.int64)


def enc_for(vals: np.ndarray) -> tuple[bytes, dict]:
    """Frame-of-reference: subtract min, bit-pack deltas."""
    return for_pack(np.asarray(vals, dtype=np.int64))


def dec_for(payload: bytes, meta: dict) -> np.ndarray:
    return for_unpack(payload, meta)


def enc_delta(vals: np.ndarray) -> tuple[bytes, dict]:
    """Delta + FOR: store first value, FOR-bit-pack consecutive diffs.

    Near-zero bits/value for sorted or clustered ints (timestamps,
    offsets, dict codes of sorted columns)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    if len(v) == 0:
        return b"", {"n": 0, "first": 0,
                     "deltas": {"ref": 0, "width": 0, "n": 0}}
    deltas = np.diff(v.view(np.uint64)).view(np.int64)  # wrapping-safe
    p, m = for_pack(deltas)
    return p, {"n": int(len(v)), "first": int(v[0]), "deltas": m}


def dec_delta(payload: bytes, meta: dict) -> np.ndarray:
    if meta["n"] == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(meta["n"], dtype=np.uint64)
    out[0] = np.int64(meta["first"]).astype(np.uint64)
    if meta["n"] > 1:
        deltas = for_unpack(payload, meta["deltas"]).view(np.uint64)
        with np.errstate(over="ignore"):
            np.cumsum(deltas, out=out[1:])
            out[1:] += out[0]
    return out.view(np.int64)


def enc_dict_int(vals: np.ndarray) -> tuple[bytes, dict]:
    """Dictionary encode ints: sorted-unique value dict (FOR-packed) +
    bit-packed codes.  Pays off for low-cardinality int64 (and for
    float bit-patterns routed through the int path, e.g. a column of
    repeated quality scores)."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    uniq, codes = (np.unique(v, return_inverse=True) if len(v)
                   else (np.zeros(0, np.int64), np.zeros(0, np.int64)))
    pc_, mc = enc_bitpack(codes.astype(np.int64))
    pu, mu = for_pack(uniq)
    payload, sections = pack_sections({"codes": pc_, "dict": pu})
    return payload, {"n": int(len(v)), "n_dict": int(len(uniq)),
                     "codes": mc, "dict": mu, "sections": sections}


def dec_dict_int(payload: bytes, meta: dict) -> np.ndarray:
    if meta["n"] == 0:
        return np.zeros(0, dtype=np.int64)
    codes = dec_bitpack(get_section(payload, meta["sections"], "codes"),
                        meta["codes"])
    uniq = for_unpack(get_section(payload, meta["sections"], "dict"),
                      meta["dict"])
    return uniq[codes]


def enc_rle_int(vals: np.ndarray) -> tuple[bytes, dict]:
    """Run-length encode ints: FOR-packed run values + run lengths."""
    v = np.ascontiguousarray(vals, dtype=np.int64)
    if len(v) == 0:
        return b"", {"n_runs": 0, "n": 0, "vals": {}, "lens": {}, "sections": {}}
    change = np.empty(len(v), dtype=bool)
    change[0] = True
    np.not_equal(v[1:], v[:-1], out=change[1:])
    starts = np.flatnonzero(change)
    run_vals = v[starts]
    run_lens = np.diff(np.append(starts, len(v)))
    pv, mv = for_pack(run_vals)
    pl, ml = for_pack(run_lens.astype(np.int64))
    payload, sections = pack_sections({"vals": pv, "lens": pl})
    return payload, {
        "n_runs": int(len(starts)),
        "n": int(len(v)),
        "vals": mv,
        "lens": ml,
        "sections": sections,
    }


def dec_rle_int(payload: bytes, meta: dict) -> np.ndarray:
    if meta["n"] == 0:
        return np.zeros(0, dtype=np.int64)
    run_vals = for_unpack(get_section(payload, meta["sections"], "vals"), meta["vals"])
    run_lens = for_unpack(get_section(payload, meta["sections"], "lens"), meta["lens"])
    return np.repeat(run_vals, run_lens)


# --------------------------------------------------------------- booleans


def enc_bool_bitmap(vals: np.ndarray) -> tuple[bytes, dict]:
    """Booleans as a 1-bit-per-value bitmap (the reference's Boolean
    builder analogue, /root/reference/src/columndata.rs:13)."""
    v = np.ascontiguousarray(vals).astype(np.uint64)
    return pack_bits(v, 1), {"n": int(len(v))}


def dec_bool_bitmap(payload: bytes, meta: dict) -> np.ndarray:
    return unpack_bits(payload, 1, meta["n"]).astype(bool)


# ---------------------------------------------------------------- strings


def str_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Extract (data uint8, offsets int64[n+1]) from a null-free string array.

    Normalizes the array-level offset so offsets[0] == 0.
    """
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    buffers = arr.buffers()  # [validity, offsets(int32), data]
    off32 = np.frombuffer(buffers[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data_all = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.zeros(0, np.uint8)
    )
    data = data_all[off32[0] : off32[-1]]
    offsets = (off32.astype(np.int64) - int(off32[0]))
    return data, offsets


def str_from_buffers(data: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Build a pa.StringArray from (data, offsets) with zero copies.

    Offsets past int32 cannot come from our own encoder (blocks are
    byte-capped), so an overflow here means a corrupt payload — raise
    CodecError per decode_column's contract instead of letting the
    unchecked int32 narrowing wrap into garbage strings (the sibling
    guard for list offsets is kernels._i32_offsets)."""
    from vcf2parquet_spark.errors import CodecError

    n = len(offsets) - 1
    if n >= 0 and int(offsets[-1]) > np.iinfo(np.int32).max:
        raise CodecError(
            f"corrupt payload: decoded string bytes ({int(offsets[-1]):,})"
            " overflow int32 offsets")
    off32 = offsets.astype(np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(off32.tobytes()), pa.py_buffer(data.tobytes())
    )


def enc_plain_str(arr: pa.Array) -> tuple[bytes, dict]:
    """Plain strings: FOR-bit-packed lengths + raw UTF-8 bytes."""
    data, offsets = str_buffers(arr)
    lens = np.diff(offsets).astype(np.int64)
    pl, ml = for_pack(lens)
    payload, sections = pack_sections({"lens": pl, "data": data.tobytes()})
    return payload, {"n": int(len(lens)), "lens": ml, "sections": sections}


def dec_plain_str(payload: bytes, meta: dict) -> pa.Array:
    lens = for_unpack(get_section(payload, meta["sections"], "lens"), meta["lens"])
    offsets = np.zeros(meta["n"] + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    data = np.frombuffer(get_section(payload, meta["sections"], "data"), dtype=np.uint8)
    return str_from_buffers(data, offsets)


def _factorize(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """First-occurrence factorize via pyarrow dictionary_encode (C++)."""
    denc = pc.dictionary_encode(arr)
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, denc.dictionary.cast(pa.string())


def enc_dict_str(arr: pa.Array) -> tuple[bytes, dict]:
    """Dictionary encode: first-occurrence value dict + bit-packed codes."""
    codes, uniq = _factorize(arr)
    pc_, mc = enc_bitpack(codes)
    pd_, md = enc_plain_str(uniq)
    payload, sections = pack_sections({"codes": pc_, "dict": pd_})
    return payload, {
        "n": int(len(codes)),
        "n_dict": int(len(uniq)),
        "codes": mc,
        "dict": md,
        "sections": sections,
    }


def dec_dict_str(payload: bytes, meta: dict) -> pa.Array:
    codes = dec_bitpack(get_section(payload, meta["sections"], "codes"), meta["codes"])
    uniq = dec_plain_str(get_section(payload, meta["sections"], "dict"), meta["dict"])
    return pc.take(uniq, pa.array(codes))


def enc_rle_str(arr: pa.Array) -> tuple[bytes, dict]:
    """RLE strings: factorize → run-length encode codes → dict of values.

    Ideal for sorted low-cardinality runs (e.g. ``commit`` within a repo
    — the north rule's "RLE for sorted commit runs").
    """
    codes, uniq = _factorize(arr)
    pr, mr = enc_rle_int(codes)
    pd_, md = enc_plain_str(uniq)
    payload, sections = pack_sections({"runs": pr, "dict": pd_})
    return payload, {"n": int(len(codes)), "runs": mr, "dict": md, "sections": sections}


def dec_rle_str(payload: bytes, meta: dict) -> pa.Array:
    codes = dec_rle_int(get_section(payload, meta["sections"], "runs"), meta["runs"])
    uniq = dec_plain_str(get_section(payload, meta["sections"], "dict"), meta["dict"])
    return pc.take(uniq, pa.array(codes))


# ------------------------------------------------------------------ zlib

ZLIB_LEVEL = 6  # fixed for deterministic bytes


def zlib_wrap(payload: bytes) -> bytes:
    return zlib.compress(payload, ZLIB_LEVEL)


def zlib_unwrap(payload: bytes) -> bytes:
    return zlib.decompress(payload)


# general-purpose residual stage behind the base codec — the analogue of
# the reference's file-level codec enum (uncompressed/snappy/gzip/lzo/
# brotli/lz4/zstd, /root/reference/src/cli.rs:119-136).  zlib streams
# stay bare (back-compat with already-written blocks); the pyarrow-backed
# algorithms carry an 8-byte LE uncompressed-length prefix because
# ``pa.Codec.decompress`` needs the output size up front.  Levels are
# pinned for deterministic bytes.
#
# Reference-enum parity: every member except lzo is available (snappy —
# the reference's DEFAULT file codec, cli.rs:134 — rides pa.Codec).
# lzo is omitted deliberately: neither pyarrow nor arrow-rs's parquet
# writer implements LZO (the reference would error on it at write time
# too), and the blocks *container* already offers the same breadth via
# parquet's own codec set.  "uncompressed" = just omit the residual.
CASCADES = ("zlib", "zstd", "lz4", "brotli", "gzip", "snappy",
            "brotli9", "zstd15")
_PA_LEVELS = {"zstd": 9, "brotli": 5, "gzip": 6, "lz4": None,
              "snappy": None, "brotli9": 9, "zstd15": 15}
# level-pinned aliases (brotli9, zstd15) exist so a SELECTOR rule can
# demand a specific strength deterministically — levels are part of the
# codec name, so block bytes stay reproducible across workers/sessions
_PA_BASE = {"brotli9": "brotli", "zstd15": "zstd"}


def _pa_codec(algo: str):
    level = _PA_LEVELS[algo]
    base = _PA_BASE.get(algo, algo)
    return (pa.Codec(base) if level is None
            else pa.Codec(base, compression_level=level))


def cascade_wrap(payload: bytes, algo: str) -> bytes:
    if algo == "zlib":
        return zlib_wrap(payload)
    body = _pa_codec(algo).compress(payload, asbytes=True)
    return len(payload).to_bytes(8, "little") + body


def cascade_unwrap(payload: bytes, algo: str) -> bytes:
    if algo == "zlib":
        return zlib_unwrap(bytes(payload))
    payload = memoryview(payload)
    n = int.from_bytes(payload[:8], "little")
    return _pa_codec(algo).decompress(payload[8:], n).to_pybytes()
