"""Posting payload codec: property-based round-trips (FIXTURES.md §2,
SURVEY.md §5.2 test 2: decode(encode(x)) == x, docIDs strictly increasing)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parser_indexer_py_spark.functions.varint import (
    decode_deltas,
    decode_varint,
    encode_deltas,
    encode_varint,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    out = decode_varint(encode_varint(arr), len(arr))
    assert (out == arr).all()


@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=500),
    st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(gaps, start):
    docs = start + np.cumsum(np.array(gaps, dtype=np.uint64))
    out = decode_deltas(encode_deltas(docs), len(docs))
    assert (out == docs).all()
    assert (np.diff(out.astype(np.int64)) > 0).all()  # strictly increasing


@given(st.data())
@settings(max_examples=150, deadline=None)
def test_deltas_grouped_resets_roundtrip(data):
    """Positional payload codec: per-entry delta resets + per-group byte
    slicing round-trips exactly (the .prx-analog invariant behind phrase
    queries)."""
    from parser_indexer_py_spark.functions.varint import (
        decode_deltas_resets,
        encode_deltas_grouped_resets,
    )

    n_entries = data.draw(st.integers(1, 25))
    lens = [data.draw(st.integers(1, 9)) for _ in range(n_entries)]
    pos = np.concatenate(
        [
            np.cumsum(
                np.array(
                    [data.draw(st.integers(0, 50))]
                    + [data.draw(st.integers(1, 50)) for _ in range(ln - 1)],
                    dtype=np.uint64,
                )
            )
            for ln in lens
        ]
    )
    starts = np.concatenate([[0], np.cumsum(lens[:-1])]).astype(np.int64)
    # group boundaries: random subset of entry starts, always containing 0
    sel = sorted(
        {0}
        | {
            data.draw(st.integers(0, n_entries - 1))
            for _ in range(data.draw(st.integers(0, 5)))
        }
    )
    gstarts = starts[np.array(sel)]
    bufs = encode_deltas_grouped_resets(pos, starts, gstarts)
    assert len(bufs) == len(gstarts)
    out = decode_deltas_resets(b"".join(bufs), int(len(pos)), starts)
    assert (out == pos).all()
    # each group payload is independently decodable (resets relative to it)
    gends = np.append(gstarts[1:], len(pos))
    for buf, gs, ge in zip(bufs, gstarts, gends):
        local_resets = starts[(starts >= gs) & (starts < ge)] - gs
        got = decode_deltas_resets(buf, int(ge - gs), local_resets)
        assert (got == pos[gs:ge]).all()


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


def test_count_mismatch_raises():
    import pytest

    with pytest.raises(ValueError):
        decode_varint(encode_varint(np.array([1, 2], dtype=np.uint64)), 3)


def test_truncated_stream_raises():
    """ADVICE r1 varint.py:59: corrupt/truncated buffers must raise a clear
    error instead of IndexError or silently dropping trailing values."""
    import pytest

    # a lone continuation byte: no value ever terminates
    with pytest.raises(ValueError, match="truncated"):
        decode_varint(b"\x80")
    # valid values followed by a non-terminated trailing value
    good = encode_varint(np.array([7, 300], dtype=np.uint64))
    with pytest.raises(ValueError, match="truncated"):
        decode_varint(good + b"\x95")
    # empty buffer but n values expected
    with pytest.raises(ValueError, match="expected 3"):
        decode_varint(b"", 3)
