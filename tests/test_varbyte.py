"""Varbyte/delta codec round-trip + golden blobs (FIXTURES.md §4)."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_source_search_engine_spark.functions.varbyte import (
    pack_docids,
    pack_ints,
    unpack_docids,
    unpack_ints,
    varbyte_decode,
    varbyte_encode,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "varbyte.json")


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


def test_known_encodings():
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    # 128 = 0b1000_0000 → low 7 bits first with cont bit, then 1
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varbyte_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.sets(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_docid_pack_roundtrip(docids):
    arr = np.array(sorted(docids), dtype=np.uint64)
    assert np.array_equal(unpack_docids(pack_docids(arr)), arr)


def test_tf_pack_roundtrip():
    tfs = np.array([1, 1, 2, 7, 1, 130, 1], dtype=np.uint64)
    assert np.array_equal(unpack_ints(pack_ints(tfs)), tfs)


def test_compression_wins_on_dense_lists():
    """Dense termlists (head terms) must compress far below 8 B/docid —
    the reason the reference's 6-byte compressed keys exist."""
    docids = np.cumsum(np.random.default_rng(0).integers(1, 50, 100_000))
    packed = pack_docids(docids.astype(np.uint64))
    assert len(packed) < 100_000 * 2  # <2 bytes/doc vs 8 raw


def test_golden_blobs():
    golden = json.load(open(GOLDEN))
    for case in golden:
        arr = np.array(case["values"], dtype=np.uint64)
        assert pack_docids(arr).hex() == case["packed_hex"], case["name"]


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                 min_size=1, max_size=30),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=200, deadline=None)
def test_grouped_encode_matches_per_group(groups):
    """The one-pass grouped encoder is byte-identical to encoding each
    group separately (both plain and delta-gap forms)."""
    from open_source_search_engine_spark.functions.varbyte import (
        pack_docids_grouped,
        varbyte_encode,
        varbyte_encode_grouped,
    )

    flat = np.array([v for g in groups for v in g], dtype=np.uint64)
    lens = np.array([len(g) for g in groups])
    ends = np.cumsum(lens)
    starts = ends - lens
    got = varbyte_encode_grouped(flat, starts, ends)
    want = [varbyte_encode(np.array(g, dtype=np.uint64)) for g in groups]
    assert got == want

    sorted_groups = [np.sort(np.array(g, dtype=np.uint64)) for g in groups]
    flat_sorted = np.concatenate(sorted_groups)
    got_d = pack_docids_grouped(flat_sorted, starts, ends)
    want_d = [pack_docids(g) for g in sorted_groups]
    assert got_d == want_d


def test_decode_truncated_stream_raises_valueerror():
    """A stream whose final byte has the continuation bit set
    (truncated write, disk corruption) raises a clear ValueError, not
    an opaque numpy IndexError/broadcast error (round-4 review fix)."""
    import pytest

    for bad in (b"\x80\x81", b"\x05\x80", b"\x80"):
        with pytest.raises(ValueError, match="corrupt varbyte"):
            varbyte_decode(bad)


def test_decode_overlong_value_raises_valueerror():
    """A value spanning >10 bytes (a flipped continuation bit merging
    two values) raises instead of shifting >=64 bits — C-undefined —
    and decoding silently wrong docids (round-4 review fix). The
    legitimate maximum, uint64-max at exactly 10 bytes, still
    round-trips."""
    with pytest.raises(ValueError, match="longer than 10"):
        varbyte_decode(bytes([0x81] * 11 + [0x01]))
    v = np.array([2**64 - 1, 0, 1], dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()
