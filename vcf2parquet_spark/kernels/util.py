"""Shared kernel plumbing: section container + bit packing primitives.

All kernels are pure numpy/pyarrow — no Spark imports — so they can run
inside vectorized UDFs on executors (``input_hint``: no per-row Python)
and be unit-tested without a JVM.

Payload layout: a block payload is the concatenation of named byte
sections; the meta dict (JSON-able) records ``sections: {name: [off, len]}``
plus codec-specific fields.  Mirrors the reference's "builder finish →
Arc<Array> slices" step (``/root/reference/src/columndata.rs:207-219``)
in spirit: typed buffers + explicit lengths, no self-describing framing.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- sections


def pack_sections(sections: dict[str, bytes]) -> tuple[bytes, dict]:
    """Concatenate named byte sections; return (payload, sections_meta)."""
    meta: dict[str, list[int]] = {}
    parts: list[bytes] = []
    off = 0
    for name, data in sections.items():
        meta[name] = [off, len(data)]
        parts.append(data)
        off += len(data)
    return b"".join(parts), meta


def get_section(payload: bytes, meta: dict, name: str) -> bytes:
    off, length = meta[name]
    return payload[off : off + length]


# ---------------------------------------------------------------- bit pack

def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (>=0). bit_width(0) == 0."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative input")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Bit-pack non-negative uint64 values at ``width`` bits each (MSB-first).

    Vectorized: expand to a (n, width) bit matrix then ``np.packbits``.
    width == 0 encodes a constant-zero column in zero bytes.
    """
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of length n."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def pack_validity(mask_valid: np.ndarray) -> bytes:
    """Validity bitmap (1 = valid), MSB-first packbits."""
    return np.packbits(mask_valid.astype(np.uint8)).tobytes()


def unpack_validity(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n).astype(bool)


# ------------------------------------------------- frame-of-reference ints

def for_pack(vals: np.ndarray) -> tuple[bytes, dict]:
    """Frame-of-reference + bit-pack for an int64 array (no nulls).

    ref = min(vals); deltas bit-packed at the minimal width.  Deltas use
    wrapping uint64 arithmetic so the full int64 range round-trips.
    The degenerate all-equal column packs to zero bytes (width 0).
    """
    v = np.ascontiguousarray(vals, dtype=np.int64)
    if len(v) == 0:
        return b"", {"ref": 0, "width": 0, "n": 0}
    ref = int(v.min())
    ref_u = np.int64(ref).astype(np.uint64)  # two's-complement view
    deltas = v.view(np.uint64) - ref_u       # wrapping: exact non-neg delta
    width = bit_width(int(deltas.max()))
    return pack_bits(deltas, width), {"ref": ref, "width": width, "n": int(len(v))}


def for_unpack(data: bytes, meta: dict) -> np.ndarray:
    deltas = unpack_bits(data, meta["width"], meta["n"])
    ref_u = np.int64(meta["ref"]).astype(np.uint64)
    return (deltas + ref_u).view(np.int64)
