"""Byte-golden codec fixtures (FIXTURES.md F2) — the analogue of the
reference's embedded golden parquet (/root/reference/src/lib.rs:132-240,
asserted byte-identical at :256).  Each codec's encoded payload for a
pinned input must hash to a pinned sha256; any format change must be
deliberate (regenerate with: python tests/test_golden.py regen)."""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pyarrow as pa

from vcf2parquet_spark.corpus import synth_corpus_arrow
from vcf2parquet_spark.kernels import encode_column

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "golden", "codecs.json")


def _cases() -> dict[str, tuple[pa.Array, str]]:
    t = synth_corpus_arrow(200, seed=42)  # 'tiny' fixture, edge rows 0-9
    import pyarrow.compute as pc
    t = t.take(pc.sort_indices(t, sort_keys=[("repo", "ascending"),
                                             ("path", "ascending"),
                                             ("commit", "ascending")]))
    ints = pc.binary_length(t["content"]).cast(pa.int64()).combine_chunks()
    return {
        "dict_lang": (t["lang"].combine_chunks(), "dict"),
        "rle_commit": (t["commit"].combine_chunks(), "rle"),
        "fsst_path": (t["path"].combine_chunks(), "fsst"),
        "fsst_zlib_content": (t["content"].combine_chunks(), "fsst+zlib"),
        # round 3: residual-stage breadth (zstd is an optional residual;
        # zlib remains the default — select.DEFAULT_RESIDUAL)
        "fsst_zstd_content": (t["content"].combine_chunks(), "fsst+zstd"),
        "plain_repo": (t["repo"].combine_chunks(), "plain"),
        "bitpack_size": (ints, "bitpack"),
        "for_size": (ints, "for"),
        "rle_int_size": (ints, "rle"),
        # extended type coverage (round 2): float / bool / list framing
        "float_dict_size": (pc.divide(ints.cast(pa.float64()), 4.0),
                            "dict"),
        "float_plain_zlib": (pc.multiply(ints.cast(pa.float64()), 0.0037),
                             "plain+zlib"),
        "bool_bitmap": (pc.equal(pc.bit_wise_and(ints, 1), 0), "bitmap"),
        "bool_rle": (pc.greater(ints, 40), "rle"),
        "list_str_dict": (pc.split_pattern(t["path"].combine_chunks(), "/"),
                          "list:dict"),
        "list_int_delta": (pa.ListArray.from_arrays(
            pa.array(range(0, 201), type=pa.int32()),
            pc.sort_indices(ints).cast(pa.int64())), "list:delta"),
    }


def _digest(payload: bytes, meta: dict) -> dict:
    return {
        "payload_sha256": hashlib.sha256(payload).hexdigest(),
        "payload_len": len(payload),
        "meta_sha256": hashlib.sha256(
            json.dumps(meta, sort_keys=True).encode()).hexdigest(),
        "codec": meta["codec"],
    }


def regen() -> None:
    os.makedirs(os.path.dirname(GOLDEN_FILE), exist_ok=True)
    out = {}
    for name, (arr, codec) in _cases().items():
        payload, meta = encode_column(arr, codec)
        out[name] = _digest(payload, meta)
    with open(GOLDEN_FILE, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_FILE}")


def test_golden_codec_bytes():
    with open(GOLDEN_FILE) as f:
        golden = json.load(f)
    cases = _cases()
    assert set(golden) == set(cases)
    for name, (arr, codec) in cases.items():
        payload, meta = encode_column(arr, codec)
        got = _digest(payload, meta)
        assert got == golden[name], (name, got, golden[name])


if __name__ == "__main__" and "regen" in sys.argv:
    regen()
