"""Wire-codec robustness (litebase_spark/wire.py): arbitrary or
truncated bytes must fail with a bounded decode error — never hang,
never return a silently-wrong structure — and every well-formed value
must round-trip bit-exactly. The reference's decoder contract
(pkg/database/query_input.go, pkg/sqlite3/column.go) is length-prefixed
throughout, so every malformed input is detectable as a truncation or
a bad type tag."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from litebase_spark import wire

_DECODE_ERRORS = (ValueError, struct.error, UnicodeDecodeError, KeyError)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=256))
def test_decode_query_input_never_hangs_or_crashes_unbounded(data):
    try:
        out = wire.decode_query_input(data)
    except _DECODE_ERRORS:
        return
    # a successful parse must be the structured dict shape
    assert set(out) == {"id", "transaction_id", "statement", "parameters"}


@settings(max_examples=100, deadline=None)
@given(
    qid=st.text(max_size=20),
    txid=st.text(max_size=20),
    stmt=st.text(max_size=100),
    data=st.data(),
)
def test_query_input_round_trip_and_truncation(qid, txid, stmt, data):
    params = data.draw(
        st.lists(
            st.one_of(
                st.tuples(st.just("INTEGER"), st.integers(-(2**63), 2**63 - 1)),
                st.tuples(st.just("FLOAT"), st.floats(allow_nan=False)),
                st.tuples(st.just("TEXT"), st.text(max_size=40)),
                st.tuples(st.just("BLOB"), st.binary(max_size=40)),
                st.tuples(st.just("NULL"), st.none()),
            ),
            max_size=4,
        )
    )
    enc = wire.encode_query_input(
        qid, stmt, [{"type": t, "value": v} for t, v in params], txid
    )
    out = wire.decode_query_input(enc)
    assert out["id"] == qid and out["transaction_id"] == txid
    assert out["statement"] == stmt
    assert [(p["type"], p["value"]) for p in out["parameters"]] == [
        (t, v) for t, v in params
    ]
    # every strict prefix must raise a bounded decode error (or parse
    # to a structurally valid dict when the cut lands between fields —
    # never hang, never return garbage types)
    cut = data.draw(st.integers(0, max(0, len(enc) - 1)))
    try:
        partial = wire.decode_query_input(enc[:cut])
    except _DECODE_ERRORS:
        return
    assert set(partial) == {"id", "transaction_id", "statement", "parameters"}


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_frame_entries_bounded_on_garbage(data):
    # frame iteration over garbage must terminate and raise/stop cleanly
    try:
        entries = list(wire.iter_frame_entries(data))
    except _DECODE_ERRORS:
        return
    assert len(entries) <= len(data)


def test_read_message_truncation_raises_not_blocks():
    enc = wire.encode_message(wire.MSG_FRAME, b"\x01\x02\x03\x04")
    for cut in range(1, len(enc)):
        buf = [enc[:cut]]

        def read(n):
            if buf and buf[0]:
                out, buf[0] = buf[0][:n], buf[0][n:]
                return out
            return b""  # EOF

        with pytest.raises(ValueError):
            wire.read_message(read)


def test_read_message_clean_eof_returns_none():
    assert wire.read_message(lambda n: b"") is None
