"""Structured Streaming operator tests: stream results must equal the
batch-mode (oracle-verified) twins on the same fixture."""

from __future__ import annotations

import litebase_spark.operators  # noqa: F401
from litebase_spark.catalog import REGISTRY
from litebase_spark.streaming.windows import (
    dedup_within_watermark,
    events_stream,
    run_available_now,
    session_aggregation,
    tumbling_counts,
)


def rows_set(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_tumbling_stream_equals_batch(spark, sf_dir):
    # complete mode emits every window including those still inside the
    # watermark horizon at end-of-stream (append would hold the last ~2h
    # back in state awaiting later data)
    stream_df = run_available_now(
        tumbling_counts(events_stream(spark, sf_dir)), output_mode="complete"
    )
    batch_df = REGISTRY["stream_tumbling_window"].builder(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert rows_set(stream_df, cols) == rows_set(batch_df, cols)


def test_session_stream_matches_batch_sessionization(spark, sf_dir):
    stream_df = run_available_now(
        session_aggregation(events_stream(spark, sf_dir)),
        output_mode="complete",
    )
    batch_df = REGISTRY["stream_session_window"].builder(spark, sf_dir)
    got = rows_set(stream_df, ["user_id", "session_start", "n_events"])
    want = rows_set(batch_df, ["user_id", "session_start", "n_events"])
    assert got == want


def test_dedup_within_watermark_keeps_one_per_key(spark, sf_dir):
    out = run_available_now(dedup_within_watermark(events_stream(spark, sf_dir)))
    batch_keys = REGISTRY["stream_dedup"].builder(spark, sf_dir)
    # one surviving event per (user_id, event_type); same key set as batch
    assert out.count() == out.select("user_id", "event_type").distinct().count()
    assert rows_set(out, ["user_id", "event_type"]) == rows_set(
        batch_keys, ["user_id", "event_type"]
    )
