"""Delta-gap + varbyte posting compression (SURVEY.md §2 C6/H9, §4 O4).

Reference anchor: the posdb 18→12→6-byte key prefix-compression scheme
(``Posdb.h`` key layout comment block; ``RdbList::addRecord`` posdb-aware
compression). The reference compresses by sharing key prefixes between
adjacent sorted 18-byte keys; the standard columnar equivalent is
delta-gap encoding of the sorted docid sequence + 7-bit varbyte bytes
(Manning/Raghavan/Schütze ch.5) — strictly better for our layout since
tf/doclen live in separate streams.

Everything is numpy-vectorized: encode loops at most ⌈64/7⌉ = 10 times
over *byte positions*, never over values; decode is loop-free except a
single ``bitwise_or.at`` scatter. No per-row Python (input_hint mandate).
"""

from __future__ import annotations

import numpy as np

_SEVEN = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def varbyte_encode(values: np.ndarray) -> bytes:
    """uint64 array → varbyte stream (7 data bits/byte, MSB = continue).

    Thin wrapper over the grouped kernel (one group spanning the whole
    array) so the bit-twiddling lives in exactly one place — round-4
    review fix: two copies of the scatter-encode loop meant every
    robustness fix had to be applied twice or the variants drift."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return varbyte_encode_grouped(
        v, np.array([0], dtype=np.int64), np.array([v.size], dtype=np.int64)
    )[0]


def varbyte_decode(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """varbyte stream → uint64 array. Raises ValueError on a stream
    whose final byte still has the continuation bit set (truncated
    write / disk corruption) — otherwise the shape math below dies in
    an opaque numpy IndexError/broadcast error deep in the read path."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if b[-1] & 0x80:
        raise ValueError(
            "corrupt varbyte stream: last byte has the continuation "
            "bit set (truncated value)"
        )
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    n = ends.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    # a uint64 never needs more than ⌈64/7⌉ = 10 varbyte bytes; a
    # longer run means a flipped continuation bit merged two values —
    # without this check the shift below reaches ≥ 64 bits, which is
    # C-undefined and decodes to silently wrong docids (round-4 review
    # fix: only end-truncation was detected before)
    if int(lens.max()) > 10:
        raise ValueError(
            "corrupt varbyte stream: value longer than 10 bytes "
            "(flipped continuation bit)"
        )
    pos_in_val = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lens)
    contribs = (b & 0x7F).astype(np.uint64) << (pos_in_val.astype(np.uint64) * _SEVEN)
    vid = np.repeat(np.arange(n, dtype=np.int64), lens)
    out = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(out, vid, contribs)
    return out


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """strictly-increasing int64/uint64 → gaps (first value kept as-is)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.uint64), dtype=np.uint64)


def pack_docids(sorted_docids: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(sorted_docids))


def unpack_docids(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))


def pack_ints(values: np.ndarray) -> bytes:
    """non-delta stream (tfs, doclens — small positive ints)."""
    return varbyte_encode(np.ascontiguousarray(values, dtype=np.uint64))


# --- grouped (segmented) encoders ----------------------------------------
# One vectorized encode over a whole partition's concatenated values,
# then per-group byte-range slices. The per-group-call form costs
# ~30 µs/group in numpy fixed overhead — at a real vocabulary's
# hundreds of thousands of (termid, bucket) groups per partition that
# dominated the pack stage; the grouped form pays the fixed cost once.


def _byte_lengths(v: np.ndarray) -> np.ndarray:
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> _SEVEN
    while tmp.any():
        nbytes += tmp > 0
        tmp >>= _SEVEN
    return nbytes


def varbyte_encode_grouped(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Encode ``values`` once; return one varbyte blob per
    [starts[i], ends[i]) group. Byte-identical to calling
    ``varbyte_encode`` per group (property-tested)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b"" for _ in range(len(starts))]
    nbytes = _byte_lengths(v)
    bends = np.cumsum(nbytes)
    out = np.zeros(int(bends[-1]), dtype=np.uint8)
    idx = bends - nbytes
    rem = v.copy()
    active = np.ones(v.size, dtype=bool)
    while active.any():
        byte = (rem & _MASK7).astype(np.uint8)
        rem >>= _SEVEN
        cont = rem > 0
        sel = active
        out[idx[sel]] = byte[sel] | (cont[sel].astype(np.uint8) << 7)
        idx = idx + 1
        active = active & cont
    bstarts = bends - nbytes  # byte offset where each VALUE starts
    return [
        out[bstarts[s]:bends[e - 1]].tobytes() if e > s else b""
        for s, e in zip(starts, ends)
    ]


def pack_docids_grouped(
    sorted_docids: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """Per-group delta-gap + varbyte: gaps computed globally, each
    group's first value kept absolute."""
    v = np.ascontiguousarray(sorted_docids, dtype=np.uint64)
    gaps = np.empty_like(v)
    if v.size:
        gaps[1:] = v[1:] - v[:-1]
        gaps[starts] = v[starts]
    return varbyte_encode_grouped(gaps, starts, ends)


def unpack_ints(buf: bytes) -> np.ndarray:
    return varbyte_decode(buf)


# --- per-posting position streams ------------------------------------------
# A block's positions blob concatenates every posting's within-doc
# token positions, delta-gap encoded with the gap RESET at each
# posting's first position (kept absolute). Lengths come from the tfs
# stream (a posting has exactly tf positions), so no separate length
# stream is stored — the reference packs wordPos into every posdb key;
# here one varbyte stream per block carries the same information.


def pack_positions_grouped(
    flat_positions: np.ndarray,
    posting_starts: np.ndarray,
    block_starts: np.ndarray,
    block_ends: np.ndarray,
) -> list[bytes]:
    """Delta-encode ``flat_positions`` with resets at every posting
    start, then emit one varbyte blob per [block_starts[i],
    block_ends[i]) byte-range (both in POSITION index space)."""
    v = np.ascontiguousarray(flat_positions, dtype=np.uint64)
    gaps = np.empty_like(v)
    if v.size:
        gaps[1:] = v[1:] - v[:-1]
        gaps[posting_starts] = v[posting_starts]
    return varbyte_encode_grouped(gaps, block_starts, block_ends)


def unpack_positions(buf: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(flat_abs_positions, posting_offsets): decode a block's
    positions blob back to absolute per-posting positions. ``tfs``
    gives each posting's position count; ``posting_offsets`` has
    len(tfs)+1 entries framing posting i's slice."""
    gaps = varbyte_decode(buf)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(tfs)))
    if gaps.size == 0:
        return gaps, offsets
    cs = np.cumsum(gaps, dtype=np.uint64)
    starts = offsets[:-1]
    base = cs[starts] - gaps[starts]  # cumulative mass before each posting
    flat = cs - np.repeat(base, tfs)
    return flat, offsets
