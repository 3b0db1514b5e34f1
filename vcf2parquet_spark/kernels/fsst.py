"""FSST — Fast Static Symbol Table string compression, vectorized in numpy.

From-scratch implementation of the scheme described in the public paper
"FSST: Fast Random Access String Compression" (Boncz, Neumann, Freitag,
VLDB 2020): a static table of up to 255 symbols of 1..8 bytes; each input
byte run is greedily replaced by the longest matching symbol's 1-byte
code; bytes with no match are escaped as (0xFF, literal).  Decode is a
code→symbol table lookup, i.e. random-access friendly per string.

What is novel here relative to the paper's scalar C++ is the *execution
strategy*, chosen for the Spark/Arrow context (kernels run inside
vectorized pandas/Arrow UDFs — per-row Python is banned):

* longest-match search is data-parallel and longest-first: length-1/2
  symbols via direct 256/65536-entry lookup tables; lengths 3..8 via a
  2-byte-prefix prefilter plus ``np.searchsorted`` probes over the
  (shrinking) still-unmatched candidate set — computed ONCE for every
  byte position of a chunk in full-width vectorized passes (matching
  inside the wavefront loop re-ran these ops on small frontiers, where
  fixed numpy call overhead dominated: measured 3-4x slower);
* the inherently sequential greedy parse (next position depends on the
  matched length) is recovered with a *per-string wavefront walk* over
  the precomputed step array: all strings advance one token per wave
  with active-set compaction — O(total tokens) gathers — with a
  pointer-doubling fallback for pathologically long strings;
* output assembly (codes, escapes, per-string offsets) is pure
  scatter/cumsum.

Symbols never cross string boundaries, so every encoded string is
independently decodable and per-string offsets are exact.

Role in the engine: the auto-selected codec for path/content-like string
columns (north rule: "FSST symbol-table compression for path/content
strings") — the slot where the reference simply lets Parquet snappy
compress whole pages (/root/reference/src/lib.rs:48-49).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from vcf2parquet_spark.kernels.codecs import str_buffers, str_from_buffers
from vcf2parquet_spark.kernels.util import for_pack, for_unpack, get_section, pack_sections

ESCAPE = 255          # code 255 = escape marker; codes 0..254 are symbols
MAX_SYMS = 255
MAX_LEN = 8
BUILD_ITERS = 5       # paper uses a small fixed number of refinement rounds
SAMPLE_TARGET = 1 << 16
CHUNK_BYTES = 1 << 23  # process ~8 MiB of string bytes per chunk: the
                       # match-all pass holds key8 (8x) + rem/ends (16x)
                       # per chunk, so this bounds transient memory to
                       # ~200 MB/worker while keeping full-width numpy
                       # passes (32 concurrent workers share one host)
WAVE_CAP = 1 << 14     # wavefront rounds before pointer-doubling fallback

_MASKS = np.array([0] + [(1 << (8 * L)) - 1 for L in range(1, 9)], dtype=np.uint64)
# _ALLOWED[r] = bitmask of symbol lengths 3..8 (bit L-3) that fit in a
# string with r bytes remaining (clamped at 8)
_ALLOWED = np.array([sum(1 << (L - 3) for L in range(3, 9) if r >= L)
                     for r in range(9)], dtype=np.uint8)


class SymbolTable:
    """Static symbol table: symbols[i] has code i; derived lookup indexes."""

    __slots__ = ("lens", "flat", "off", "byte_codes", "code2", "lut",
                 "prefbits", "n_syms")

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMS
        self.n_syms = len(symbols)
        self.lens = np.fromiter((len(s) for s in symbols), dtype=np.int64,
                                count=len(symbols))
        self.flat = np.frombuffer(b"".join(symbols), dtype=np.uint8)
        self.off = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(self.lens, out=self.off[1:])
        # length-1: byte value -> code; length-2: u16 (LE) -> code
        self.byte_codes = np.full(256, ESCAPE, dtype=np.uint8)
        self.code2 = np.full(1 << 16, ESCAPE, dtype=np.uint8)
        # lengths 3..8: sorted key arrays + ONE combined 2-byte-prefix
        # bitmask table (prefbits[u16] has bit L-3 set iff some length-L
        # symbol starts with those two bytes) — a single gather serves
        # all six lengths in the matcher's hot loop
        self.lut: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.prefbits = np.zeros(1 << 16, dtype=np.uint8)
        by_len: dict[int, list[tuple[int, int]]] = {}
        for code, s in enumerate(symbols):
            if len(s) == 1:
                self.byte_codes[s[0]] = code
            elif len(s) == 2:
                self.code2[int.from_bytes(s, "little")] = code
            else:
                by_len.setdefault(len(s), []).append(
                    (int.from_bytes(s, "little"), code))
        for L, pairs in by_len.items():
            pairs.sort()
            keys = np.array([k for k, _ in pairs], dtype=np.uint64)
            codes = np.array([c for _, c in pairs], dtype=np.uint8)
            self.lut[L] = (keys, codes)
            self.prefbits[(keys & np.uint64(0xFFFF)).astype(np.uint32)] |= \
                np.uint8(1 << (L - 3))

    def symbol(self, code: int) -> bytes:
        return self.flat[self.off[code] : self.off[code + 1]].tobytes()


def _window_keys(data: np.ndarray) -> np.ndarray:
    """key8[i] = little-endian uint64 of data[i:i+8], zero padded at end.

    Deliberately the single-pass element-wise copy: an 8-pass
    interleaved-aligned-view build (out[j::8] = padded[j:j+8m].view(u64))
    is 2.1x faster SINGLE-threaded but touches every output cache line
    8x, and with 16 concurrent workers on this one-bus host it measured
    1.6x SLOWER (0.104 vs 0.065 s/call) — the engine always runs many
    workers, so memory traffic wins over instruction count here."""
    n = len(data)
    padded = np.concatenate([data, np.zeros(MAX_LEN, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, MAX_LEN)[:n]
    return np.ascontiguousarray(win).view(np.uint64).ravel()


def _match_all(data: np.ndarray, offsets: np.ndarray, table: SymbolTable,
               key8: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Longest symbol match at EVERY byte position of ``data`` (which
    ``offsets`` must cover contiguously), in one set of full-width
    vectorized passes.  Returns (step, code) arrays over all positions.

    This is ~2.3x more raw match work than matching only at the
    positions the greedy parse visits — but it runs as a handful of
    array-length SEQUENTIAL numpy ops instead of thousands of
    frontier-sized gathers, which is faster end-to-end (measured both
    ways): a wave frontier of ~1 string-position per string makes every
    per-wave gather a cache-miss per element (~915 B apart on content),
    so wavefront matching is memory-latency-bound where these passes
    are bandwidth-bound.  The greedy parse then reduces to a
    gather-only walk (:func:`_walk`) over the precomputed step array.

    Two structural choices (round 5, measured 15-20% on content, output
    byte-identical):

    * string-boundary limits are SCATTERED over the <=7 tail bytes of
      each string (the only positions where a length is disallowed)
      instead of materializing a full-width ``rem`` array;
    * the length-3..8 probe loop runs on the compacted candidate subset
      (positions whose 2-byte prefix matches any symbol — ~40% on
      source text) so each round's bit-test/nonzero touches the subset,
      not the full width.
    """
    if key8 is None:
        key8 = _window_keys(data)
    n = len(data)
    step = np.ones(n, dtype=np.int8)   # 1..8 — narrow: this array is
    code = table.byte_codes[data]      # written/scanned at full width
    if n == 0:
        return step, code
    # low 16 bits of each LE key = first two bytes: a zero-copy strided
    # view beats two full-width passes (mask + cast) on 10^7 elements
    u16 = np.ascontiguousarray(key8.view(np.uint16)[::4]) \
        if key8.flags.c_contiguous \
        else (key8 & np.uint64(0xFFFF)).astype(np.uint32)
    ends = offsets[1:].astype(np.int64)
    starts = offsets[:-1].astype(np.int64)
    # length 2: direct 64K lookup, no search; rem >= 2 fails only at
    # the last byte of each string
    c2 = table.code2[u16]
    hit2 = c2 != ESCAPE
    last = ends - 1
    hit2[last[last >= starts]] = False
    if table.lut:
        # one combined-prefilter gather serves ALL lengths; the
        # per-length test is then a single uint8 bit-and + nonzero on
        # the candidate subset (direct ndarray methods: this is the
        # innermost loop and numpy wrapper layers are measurable)
        cand_bits = table.prefbits[u16]
        for tl in range(1, 8):                    # string-tail limits
            pos = ends - tl
            cand_bits[pos[pos >= starts]] &= _ALLOWED[tl]
        sub = cand_bits.nonzero()[0]
        sub_bits = cand_bits[sub]
        sub_k8 = key8[sub]
        for L in range(MAX_LEN, 2, -1):           # 8..3 longest-first
            ent = table.lut.get(L)
            if ent is None:
                continue
            idx = (sub_bits & np.uint8(1 << (L - 3))).nonzero()[0]
            if len(idx) == 0:
                continue
            keys, codes = ent
            kL = sub_k8[idx] & _MASKS[L]
            p = keys.searchsorted(kL)
            pc = np.minimum(p, len(keys) - 1)
            hit = keys[pc] == kL
            hc = idx[hit]
            g = sub[hc]
            step[g] = L
            code[g] = codes[p[hit]]
            sub_bits[hc] = 0                      # bar shorter matches
            hit2[g] = False                       # claimed by longer
    step[hit2] = 2
    code[hit2] = c2[hit2]
    return step, code


def _parse(data: np.ndarray, starts: np.ndarray, ends: np.ndarray,
           table: SymbolTable, key8: np.ndarray | None = None
           ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Greedy parse = match-all + wavefront walk.

    ``starts``/``ends`` must cover ``data`` contiguously (they define
    the string boundaries the matcher must not cross).  Returns (vis:
    visited token positions grouped by string, counts per string,
    codes at vis, steps at vis).
    """
    n_str = len(starts)
    counts = np.zeros(n_str, dtype=np.int64)
    if n_str == 0 or len(data) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, counts, z.astype(np.uint8), z
    offsets = np.append(starts.astype(np.int64), int(ends[-1]))
    step, code = _match_all(data, offsets, table, key8=key8)
    vis, counts = _walk(step, starts.astype(np.int64), ends.astype(np.int64))
    return vis, counts, code[vis], step[vis]


def _visit_slice(step: np.ndarray) -> np.ndarray:
    """Greedy-walk positions within one slice via pointer doubling —
    O(log n) rounds of vectorized gathers.  Fallback for huge strings."""
    n = len(step)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    jump = np.empty(n + 1, dtype=np.int64)
    np.minimum(np.arange(n, dtype=np.int64) + step, n, out=jump[:n])
    jump[n] = n
    visited = np.array([0], dtype=np.int64)
    while visited[-1] < n:
        nxt = jump[visited]
        visited = np.concatenate([visited, nxt])
        if visited[-1] >= n:
            break
        jump = jump[jump]
    return visited[visited < n]


def _walk(step: np.ndarray, starts: np.ndarray, ends: np.ndarray
          ) -> tuple[np.ndarray, np.ndarray]:
    """Token start positions of the greedy parse of every string.

    Per-string wavefront: all strings advance one token per wave;
    finished strings are compacted out, so total work is O(total tokens).
    ``starts``/``ends`` are absolute spans into ``step`` (subset, any
    order — same no-gather contract as ``_parse``).  Returns (vis:
    token positions grouped by string, counts aligned with ``starts``).
    """
    n_str = len(starts)
    counts = np.zeros(n_str, dtype=np.int64)
    if n_str == 0 or len(step) == 0:
        return np.zeros(0, dtype=np.int64), counts
    ends_s = ends.astype(np.int64)
    active_pos = starts.astype(np.int64)
    active_sid = np.arange(n_str, dtype=np.int64)
    alive = active_pos < ends_s
    active_pos, active_sid = active_pos[alive], active_sid[alive]
    waves: list[tuple[np.ndarray, np.ndarray]] = []
    w = 0
    # same tail switch as _parse: drained frontiers cost more in per-wave
    # overhead than one pointer-doubling walk per straggler (cap: the
    # walk is per-string python)
    tail_cut = max(32, min(len(active_pos) >> 4, 512))
    while len(active_pos) > tail_cut and w < WAVE_CAP:
        waves.append((active_pos, active_sid))
        counts[active_sid] += 1
        nxt = active_pos + step[active_pos]
        alive = nxt < ends_s[active_sid]
        active_pos, active_sid = nxt[alive], active_sid[alive]
        w += 1
    w_stop = w
    # pointer-doubling walk for tail / post-WAVE_CAP strings
    extras: list[tuple[int, np.ndarray]] = []
    for p0, sid in zip(active_pos.tolist(), active_sid.tolist()):
        ext = p0 + _visit_slice(step[p0 : ends_s[sid]])
        counts[sid] += len(ext)
        extras.append((sid, ext))
    out_start = np.zeros(n_str + 1, dtype=np.int64)
    np.cumsum(counts, out=out_start[1:])
    vis = np.empty(int(out_start[-1]), dtype=np.int64)
    for wi, (p, s) in enumerate(waves):
        vis[out_start[s] + wi] = p
    for sid, ext in extras:
        vis[out_start[sid] + w_stop : out_start[sid + 1]] = ext
    return vis, counts


def _encode_chunk(data: np.ndarray, offsets: np.ndarray,
                  table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Encode one contiguous run of strings (``offsets`` local to
    ``data``, starting at 0).  Returns (enc bytes, enc offsets)."""
    n_str = len(offsets) - 1
    if n_str == 0 or int(offsets[-1]) == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(n_str + 1, dtype=np.int64)
    vis, counts, vcode, _steps = _parse(data, offsets[:-1], offsets[1:],
                                        table)
    esc = vcode == ESCAPE
    emit = np.where(esc, 2, 1).astype(np.int64)
    out_pos = np.zeros(len(vis) + 1, dtype=np.int64)
    np.cumsum(emit, out=out_pos[1:])
    out = np.empty(int(out_pos[-1]), dtype=np.uint8)
    out[out_pos[:-1]] = vcode
    out[out_pos[:-1][esc] + 1] = data[vis[esc]]
    tok_bounds = np.zeros(n_str + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_bounds[1:])
    enc_offsets = out_pos[tok_bounds]
    return out, enc_offsets


def _decode_chunk(enc: np.ndarray, step_in: np.ndarray, starts: np.ndarray,
                  ends: np.ndarray, table: SymbolTable
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Decode one subset of encoded strings (absolute spans, no gather).
    ``step_in`` is the escape-step array over the WHOLE ``enc`` buffer
    (computed once by the caller).  Returns (out bytes in subset order,
    out offsets per subset string)."""
    n_str = len(starts)
    if n_str == 0 or int((ends - starts).sum()) == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(n_str + 1, dtype=np.int64)
    vis, counts = _walk(step_in, starts, ends)
    codes = enc[vis].astype(np.int64)
    esc = codes == ESCAPE
    lens_ext = np.ones(256, dtype=np.int64)
    lens_ext[: table.n_syms] = table.lens
    sym_lens = np.where(esc, 1, lens_ext[codes])
    out_pos = np.zeros(len(vis) + 1, dtype=np.int64)
    np.cumsum(sym_lens, out=out_pos[1:])
    out = np.empty(int(out_pos[-1]), dtype=np.uint8)
    # escapes: copy the literal byte
    out[out_pos[:-1][esc]] = enc[vis[esc] + 1]
    # symbols: grouped-arange gather from the flat symbol buffer
    ns = np.flatnonzero(~esc)
    if len(ns):
        idx = codes[ns]
        L = table.lens[idx]
        dst0 = out_pos[:-1][ns]
        src0 = table.off[idx]
        total = int(L.sum())
        cum = np.cumsum(L) - L
        r = np.arange(total, dtype=np.int64) - np.repeat(cum, L)
        out[np.repeat(dst0, L) + r] = table.flat[np.repeat(src0, L) + r]
    tok_bounds = np.zeros(n_str + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_bounds[1:])
    offsets = out_pos[tok_bounds]
    return out, offsets


# ------------------------------------------------------------ table build


def _gather_strings(data: np.ndarray, offsets: np.ndarray, idx: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Gather strings[idx] into a fresh (data, offsets) pair — grouped-
    arange, fully vectorized."""
    lens = np.diff(offsets)
    sel = lens[idx]
    new_off = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(sel, out=new_off[1:])
    total = int(new_off[-1])
    if total == 0:
        return np.zeros(0, np.uint8), new_off
    r = np.arange(total, dtype=np.int64) - np.repeat(new_off[:-1], sel)
    return data[np.repeat(offsets[:-1][idx], sel) + r], new_off


SAMPLE_MAXSTR = 512  # symbol stats saturate fast; long tails only add waves


def _sample(data: np.ndarray, offsets: np.ndarray,
            target: int = SAMPLE_TARGET) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic sample: evenly spaced strings totalling ~target
    bytes, each truncated to SAMPLE_MAXSTR bytes (wave count during the
    table-build parse is bounded by the longest sampled string)."""
    n_str = len(offsets) - 1
    lens = np.diff(offsets)
    total = int(offsets[-1])
    if total > target and n_str > 1:
        stride = max(1, int(np.ceil(total / target)))
        idx = np.arange(0, n_str, stride, dtype=np.int64)
    else:
        idx = np.arange(n_str, dtype=np.int64)
    sel = np.minimum(lens[idx], SAMPLE_MAXSTR)
    new_off = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(sel, out=new_off[1:])
    total_s = int(new_off[-1])
    if total_s == 0:
        return np.zeros(0, np.uint8), new_off
    r = np.arange(total_s, dtype=np.int64) - np.repeat(new_off[:-1], sel)
    return data[np.repeat(offsets[:-1][idx], sel) + r], new_off


def build_table(data: np.ndarray, offsets: np.ndarray,
                iters: int = BUILD_ITERS) -> SymbolTable:
    """Greedy iterative table construction on a sample (paper §4.4 style).

    Each round: encode the sample with the current table; count the gain
    (freq × length) of every seen symbol and of every concatenation of
    adjacent symbols (≤8 bytes, same string); keep the top-255.
    Deterministic: ties broken by (length, key).

    NOT worth caching across blocks: measured 0.034 s of a 7.5 s
    enc_fsst call on a 92 MB / 100k-row content block (0.5%) — the
    sample is budget-bounded (SAMPLE_TARGET) so build cost is constant
    per block while matching scales with block bytes.  A shared table
    would save nothing and cost per-block compression (later blocks
    encoded with another block's symbol distribution) plus cross-block
    coupling in the decode path, where each block payload is
    self-contained by design.
    """
    sdata, soffs = _sample(data, offsets)
    n = len(sdata)
    if n == 0:
        return SymbolTable([])
    key8 = _window_keys(sdata)
    table = SymbolTable([])
    for _ in range(iters):
        vis, counts, _codes, tok_len = _parse(
            sdata, soffs[:-1].astype(np.int64), soffs[1:].astype(np.int64),
            table, key8=key8)
        if len(vis) == 0:
            break
        sid = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        tok_key = key8[vis] & _MASKS[tok_len]
        cands_k = [tok_key]
        cands_l = [tok_len]
        # candidate pairs: adjacent tokens, same string, combined <= 8
        if len(vis) > 1:
            same = sid[:-1] == sid[1:]
            plen = tok_len[:-1] + tok_len[1:]
            ok = same & (plen <= MAX_LEN)
            if ok.any():
                pk = key8[vis[:-1][ok]] & _MASKS[plen[ok]]
                cands_k.append(pk)
                cands_l.append(plen[ok])
        ck = np.concatenate(cands_k)
        cl = np.concatenate(cands_l).astype(np.int64)
        # unique (key, len) + counts via lexsort (faster than structured
        # np.unique) — deterministic
        srt = np.lexsort((cl, ck))
        ks, ls = ck[srt], cl[srt]
        new = np.empty(len(ks), dtype=bool)
        if len(ks):
            new[0] = True
            np.logical_or(ks[1:] != ks[:-1], ls[1:] != ls[:-1], out=new[1:])
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(ks)))
        uk, ul = ks[starts], ls[starts]
        gain = counts * ul
        # top MAX_SYMS by gain desc, tie-break (len, key) asc — deterministic
        order = np.lexsort((uk, ul, -gain))[:MAX_SYMS]
        symbols = [
            int(k).to_bytes(8, "little")[:l]
            for k, l in zip(uk[order].tolist(), ul[order].tolist())
        ]
        table = SymbolTable(symbols)
    return table


# -------------------------------------------------------------- codec API


def _chunk_bounds(offsets: np.ndarray, chunk_bytes: int) -> list[tuple[int, int]]:
    """Split [0, n_str) into string-aligned chunks of ~chunk_bytes."""
    n_str = len(offsets) - 1
    bounds: list[tuple[int, int]] = []
    lo = 0
    while lo < n_str:
        target = int(offsets[lo]) + chunk_bytes
        hi = int(np.searchsorted(offsets, target, side="left"))
        hi = max(hi, lo + 1)
        hi = min(hi, n_str)
        bounds.append((lo, hi))
        lo = hi
    return bounds or [(0, 0)]


def enc_fsst(arr: pa.Array) -> tuple[bytes, dict]:
    data, offsets = str_buffers(arr)
    table = build_table(data, offsets)
    n_str = len(offsets) - 1
    # row-order contiguous chunks: the match-all pass is full-width
    # vectorized regardless of string-length mix (no length sorting
    # needed to keep a wavefront full — _walk's pointer-doubling tail
    # switch absorbs stragglers), each chunk's bytes are a zero-copy
    # view, and encoded output lands directly in row order.
    offs64 = offsets.astype(np.int64)
    enc_parts: list[np.ndarray] = []
    enc_offsets = np.zeros(n_str + 1, dtype=np.int64)
    base = 0
    for lo, hi in _chunk_bounds(offs64, CHUNK_BYTES):
        b0, b1 = int(offs64[lo]), int(offs64[hi])
        enc, eoffs = _encode_chunk(data[b0:b1], offs64[lo : hi + 1] - b0,
                                   table)
        enc_parts.append(enc)
        enc_offsets[lo : hi + 1] = eoffs + base
        base += len(enc)
    enc_all = (np.concatenate(enc_parts) if enc_parts
               else np.zeros(0, np.uint8))
    po, mo = for_pack(np.diff(enc_offsets).astype(np.int64))
    payload, sections = pack_sections({
        "tlens": table.lens.astype(np.uint8).tobytes(),
        "tflat": table.flat.tobytes(),
        "offs": po,
        "data": enc_all.tobytes(),
    })
    return payload, {
        "n": int(len(offsets) - 1),
        "n_syms": table.n_syms,
        "offs": mo,
        "sections": sections,
    }


def _table_from_payload(payload: bytes, meta: dict) -> SymbolTable:
    tlens = np.frombuffer(get_section(payload, meta["sections"], "tlens"), np.uint8)
    tflat = get_section(payload, meta["sections"], "tflat")
    syms: list[bytes] = []
    off = 0
    for L in tlens.tolist():
        syms.append(tflat[off : off + L])
        off += L
    return SymbolTable(syms)


def dec_fsst(payload: bytes, meta: dict) -> pa.Array:
    table = _table_from_payload(payload, meta)
    enc_lens = for_unpack(get_section(payload, meta["sections"], "offs"), meta["offs"])
    enc_offsets = np.zeros(meta["n"] + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=enc_offsets[1:])
    enc = np.frombuffer(get_section(payload, meta["sections"], "data"), dtype=np.uint8)
    n_str = meta["n"]
    if len(enc) < int(enc_offsets[-1]):
        raise ValueError(
            f"fsst payload truncated: data section has {len(enc)} bytes, "
            f"offsets expect {int(enc_offsets[-1])}")
    # same length-sorted, gather-free wavefront trick as encode
    enc_lens_i = np.diff(enc_offsets).astype(np.int64)
    order = np.argsort(enc_lens_i, kind="stable")
    soffs = np.zeros(n_str + 1, dtype=np.int64)
    np.cumsum(enc_lens_i[order], out=soffs[1:])
    all_starts = enc_offsets[:-1].astype(np.int64)
    all_ends = enc_offsets[1:].astype(np.int64)
    step_in = np.where(enc == ESCAPE, np.int8(2), np.int8(1))
    out_parts: list[np.ndarray] = []
    out_offsets_sorted = np.zeros(n_str + 1, dtype=np.int64)
    base = 0
    for lo, hi in _chunk_bounds(soffs, CHUNK_BYTES):
        idx = order[lo:hi]
        out, ooffs = _decode_chunk(enc, step_in, all_starts[idx],
                                   all_ends[idx], table)
        out_parts.append(out)
        out_offsets_sorted[lo : hi + 1] = ooffs + base
        base += len(out)
    out_sorted = (np.concatenate(out_parts) if out_parts
                  else np.zeros(0, np.uint8))
    rank = np.empty(n_str, dtype=np.int64)
    rank[order] = np.arange(n_str, dtype=np.int64)
    out_all, out_offsets = _gather_strings(out_sorted, out_offsets_sorted, rank)
    return str_from_buffers(out_all, out_offsets)
