"""Property tests for the postings codec (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tesserae_ng_spark.index.codec import (
    decode_positions,
    delta_decode_ids,
    delta_encode_ids,
    encode_positions,
    to_u64,
    from_u64,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    arr = np.array(xs, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(
    st.sets(
        st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=0, max_size=400
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode_ids(delta_encode_ids(arr)), arr)


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_u64_mapping_roundtrip(x):
    a = np.array([x], dtype=np.int64)
    assert from_u64(to_u64(a))[0] == x


def test_u64_order_preserving():
    xs = np.array([-(2**63), -5, -1, 0, 1, 7, 2**63 - 1], dtype=np.int64)
    u = to_u64(xs)
    assert np.all(u[1:] > u[:-1])


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100000), min_size=1, max_size=30),
        max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_positions_roundtrip(pos_lists):
    pos_lists = [sorted(set(p)) or [0] for p in pos_lists]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    buf = encode_positions(pos_lists, tfs)
    out = decode_positions(buf, tfs)
    assert len(out) == len(pos_lists)
    for got, want in zip(out, pos_lists):
        assert got.tolist() == want


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=100000), min_size=1, max_size=30),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_split_varint_stream_roundtrip(pos_lists):
    from tesserae_ng_spark.index.codec import split_varint_stream

    pos_lists = [sorted(set(p)) or [0] for p in pos_lists]
    tfs = np.array([len(p) for p in pos_lists], dtype=np.int64)
    stream = encode_positions(pos_lists, tfs)
    chunks = split_varint_stream(stream, tfs)
    assert b"".join(chunks) == stream
    # each chunk independently decodes to its doc's positions
    for chunk, want in zip(chunks, pos_lists):
        got = np.cumsum(varint_decode(chunk).astype(np.int64)).tolist()
        assert got == want


def test_empty_everything():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0
    assert delta_decode_ids(b"").size == 0
    assert encode_positions([], np.empty(0)) == b""


# ---------------------------------------------------------------------------
# PForDelta (optional v2 codec; CODECS registry)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=300
    )
)
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(vals):
    from tesserae_ng_spark.index.codec import pfor_decode, pfor_encode

    v = np.array(vals, dtype=np.uint64)
    got = pfor_decode(pfor_encode(v))
    assert got.dtype == np.uint64
    assert np.array_equal(got, v)


@given(
    st.lists(st.integers(min_value=1, max_value=250), min_size=32, max_size=128)
)
@settings(max_examples=50, deadline=None)
def test_pfor_denser_than_varint_on_clustered_gaps(gaps):
    from tesserae_ng_spark.index.codec import pfor_encode

    v = np.array(gaps, dtype=np.uint64)
    # small clustered gaps (the posting-delta common case): PFor packs at
    # ~8 bits/value where LEB128 needs >=8 bits + per-value framing
    assert len(pfor_encode(v)) <= len(varint_encode(v)) + 16


def test_codec_registry_dispatch():
    from tesserae_ng_spark.index.codec import CODECS

    v = np.array([5, 0, 2**40, 17], dtype=np.uint64)
    for name, (enc, dec) in CODECS.items():
        assert np.array_equal(dec(enc(v)), v), name
