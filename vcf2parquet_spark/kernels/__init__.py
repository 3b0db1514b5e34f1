"""Codec registry + column-level framing (types, nulls, cascades).

``encode_column(arr, codec)`` / ``decode_column(payload, meta)`` are the
only entry points the engine uses.  A codec spec is a base codec name
optionally cascaded with ``+zlib`` (general-purpose residual stage for
high-entropy columns — the documented fallback, SURVEY.md §7):

    int64 :  plain | bitpack | for | rle | (+zlib)
    string:  plain | dict | rle | fsst | (+zlib)

Nulls are stripped into a validity bitmap section before the base codec
runs and re-inserted on decode — mirroring how the reference's builders
track nulls separately from values (``/root/reference/src/columndata.rs:92-103``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import vcf2parquet_spark._alloc  # noqa: F401  (mallopt tuning, side effect)
from vcf2parquet_spark.kernels import codecs as C
from vcf2parquet_spark.kernels import fsst as F
from vcf2parquet_spark.kernels.util import (
    get_section,
    pack_sections,
    pack_validity,
    unpack_validity,
)

# base-codec tables: name -> (encode, decode) per logical type
_INT_CODECS = {
    "plain": (
        lambda v: (np.ascontiguousarray(v, np.int64).tobytes(), {"n": int(len(v))}),
        lambda p, m: np.frombuffer(p, np.int64).copy(),
    ),
    "bitpack": (C.enc_bitpack, C.dec_bitpack),
    "for": (C.enc_for, C.dec_for),
    "delta": (C.enc_delta, C.dec_delta),
    "rle": (C.enc_rle_int, C.dec_rle_int),
}

_STR_CODECS = {
    "plain": (C.enc_plain_str, C.dec_plain_str),
    "dict": (C.enc_dict_str, C.dec_dict_str),
    "rle": (C.enc_rle_str, C.dec_rle_str),
    "fsst": (F.enc_fsst, F.dec_fsst),
}

STRING_CODECS = tuple(_STR_CODECS)
INT_CODECS = tuple(_INT_CODECS)


def _split_spec(codec: str) -> tuple[str, bool]:
    if codec.endswith("+zlib"):
        return codec[: -len("+zlib")], True
    return codec, False


def encode_column(arr: pa.Array, codec: str) -> tuple[bytes, dict]:
    """Encode one column block. Returns (payload, meta). Deterministic."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    base, cascade = _split_spec(codec)
    n = len(arr)
    null_count = arr.null_count
    sections: dict[str, bytes] = {}
    meta: dict = {"codec": codec, "n": n, "n_nulls": int(null_count)}

    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        meta["type"] = "string"
        values = arr.drop_null() if null_count else arr
        if null_count:
            valid = ~np.asarray(arr.is_null())
            sections["validity"] = pack_validity(valid)
        enc, dec = _STR_CODECS[base]
        body, bmeta = enc(values.cast(pa.string()))
    elif pa.types.is_integer(arr.type):
        meta["type"] = "int64"
        if null_count:
            valid = ~np.asarray(arr.is_null())
            sections["validity"] = pack_validity(valid)
            values = arr.drop_null()
        else:
            values = arr
        enc, dec = _INT_CODECS[base]
        body, bmeta = enc(values.cast(pa.int64()).to_numpy(zero_copy_only=False))
    else:
        raise TypeError(f"unsupported column type for codec kernels: {arr.type}")

    if cascade:
        body = C.zlib_wrap(body)
    sections["body"] = body
    payload, smeta = pack_sections(sections)
    meta["base"] = bmeta
    meta["sections"] = smeta
    return payload, meta


def decode_column(payload: bytes, meta: dict) -> pa.Array:
    """Inverse of :func:`encode_column` — bit-identical round trip.

    Raises CodecError on corrupt payloads (engine error taxonomy,
    mirroring the reference's Arrow/Parquet error wrapping,
    /root/reference/src/error.rs:16-23).
    """
    try:
        return _decode_column(payload, meta)
    except (IndexError, ValueError, KeyError) as e:
        from vcf2parquet_spark.errors import CodecError
        raise CodecError(
            f"corrupt or mismatched block payload "
            f"(codec={meta.get('codec')}, n={meta.get('n')}): {e}") from e
    except Exception as e:  # zlib.error etc.
        import zlib
        if isinstance(e, zlib.error):
            from vcf2parquet_spark.errors import CodecError
            raise CodecError(f"zlib stage failed: {e}") from e
        raise


def _decode_column(payload: bytes, meta: dict) -> pa.Array:
    base, cascade = _split_spec(meta["codec"])
    body = get_section(payload, meta["sections"], "body")
    if cascade:
        body = C.zlib_unwrap(body)
    n = meta["n"]
    n_nulls = meta["n_nulls"]

    if meta["type"] == "string":
        values = _STR_CODECS[base][1](body, meta["base"])
        if not n_nulls:
            return values
        valid = unpack_validity(get_section(payload, meta["sections"], "validity"), n)
        return _scatter_valid_str(values, valid)
    elif meta["type"] == "int64":
        vals = _INT_CODECS[base][1](body, meta["base"])
        if not n_nulls:
            return pa.array(vals, type=pa.int64())
        valid = unpack_validity(get_section(payload, meta["sections"], "validity"), n)
        out = np.zeros(n, dtype=np.int64)
        out[valid] = vals
        return pa.array(out, type=pa.int64(), mask=~valid)
    raise TypeError(f"unsupported type tag: {meta['type']}")


def _scatter_valid_str(values: pa.Array, valid: np.ndarray) -> pa.Array:
    """Re-insert nulls into a null-free string array per validity mask."""
    n = len(valid)
    if len(values) == 0:
        return pa.nulls(n, pa.string())
    idx = np.full(n, -1, dtype=np.int64)
    idx[valid] = np.arange(len(values), dtype=np.int64)
    take_idx = pa.array(np.where(valid, idx, 0), type=pa.int64())
    taken = values.take(take_idx)
    # apply mask: build with validity via pa.array of python-free route
    mask = pa.array(~valid)
    return pa.compute.if_else(mask, pa.scalar(None, pa.string()), taken)


def encoded_size(payload: bytes) -> int:
    return len(payload)
