"""Batch sessionization (operators/asof.py ts_sessionize): hand-built
event stream with known gaps — session numbering, boundary inclusion
(gap exactly 30:00 stays in-session; 30:00.000001 starts a new one),
duration and value math."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from litebase_spark.operators.asof import ts_sessionize


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sessionize")
    T = dt.datetime
    rows = [
        # user 1, session 1: 10:00, 10:20, 10:50 (gaps 20m, 30m exactly)
        (1, T(2024, 1, 1, 10, 0), 1, "click", 1.0, "{}"),
        (2, T(2024, 1, 1, 10, 20), 1, "click", 2.0, "{}"),
        (3, T(2024, 1, 1, 10, 50), 1, "click", 4.0, "{}"),
        # user 1, session 2: 11:20:00.000001 (gap 30m + 1us)
        (4, T(2024, 1, 1, 11, 20, 0, 1), 1, "purchase", 8.0, "{}"),
        # user 2: single event
        (5, T(2024, 1, 1, 9, 0), 2, "click", 0.5, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "events.parquet")
    )
    return str(d)


def test_sessionize_hand_case(spark, events_dir):
    rows = {
        (r["user_id"], r["session_no"]): r
        for r in ts_sessionize(spark, events_dir).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    s1 = rows[(1, 1)]
    # exactly-30-minute gap does NOT split (strict > threshold)
    assert s1["n_events"] == 3
    assert s1["duration_us"] == 50 * 60 * 1_000_000
    assert s1["session_value"] == 7.0
    s2 = rows[(1, 2)]
    assert s2["n_events"] == 1 and s2["duration_us"] == 0
    assert s2["session_value"] == 8.0
    assert rows[(2, 1)]["n_events"] == 1


def test_sessionize_single_exchange(spark, sf_dir):
    import contextlib
    import io

    df = ts_sessionize(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    final = buf.getvalue().split("== Initial Plan ==")[0]
    # lag window, running-sum window and the session aggregate all
    # cluster by user_id: ONE shuffle exchange in the executed plan
    import re

    # tree nodes only (the detail section sits after the Initial Plan
    # marker and is cut off); "Exchange (n)" is the shuffle node,
    # BroadcastExchange prints differently
    shuffles = len(re.findall(r"[+:]- Exchange \(\d+\)", final))
    assert shuffles == 1, f"expected 1 exchange, got {shuffles}:\n{final}"
