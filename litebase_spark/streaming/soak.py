"""Live unbounded-source soak harness (SURVEY M4 hardening).

The window/stateful tests drive AvailableNow over a fixed fixture —
correct but bounded: every run sees a finite file list and a watermark
that only has to advance once. This harness runs the same operators
against a genuinely UNBOUNDED pipeline for N real micro-batches:

    rate source (continuous clock-driven rows)
      -> parquet archive (the ground truth, files landing in real time)
      -> file-source streams consumed WHILE the producer is writing:
         session windows (append + watermark), tumbling counts (update),
         applyInPandasWithState running totals (update)

The archive is the single source of truth: the consumers see exactly
the files the producer committed, so after a final watermark flush the
stream outputs must equal the batch computation over the archive —
while per-batch progress must show a monotonically advancing event-time
watermark (the live property AvailableNow replay cannot exercise).

The flush trick: appending one sentinel event far past max event time
advances the watermark beyond every open session, so APPEND-mode
session windows emit their complete final set — equality against the
batch session_window aggregation becomes exact, not subset-based.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOAK_SCHEMA = "ts timestamp, user_id bigint, value double"


def start_rate_producer(
    spark: SparkSession,
    archive_dir: str,
    checkpoint_dir: str,
    rows_per_second: int = 400,
    n_users: int = 7,
    trigger_ms: int = 500,
):
    """Continuous producer: rate source -> synthetic keyed events ->
    parquet archive. Returns the StreamingQuery."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    events = rate.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % n_users).alias("user_id"),
        (F.col("value") % 100).cast("double").alias("value"),
    )
    # foreachBatch plain-append, NOT the streaming parquet sink: the
    # sink's _spark_metadata log would become the authoritative file
    # list for any reader of the directory, hiding the sentinel flush
    # file (and any other non-sink write) from the downstream file
    # source. coalesce(1) keeps it to one file per micro-batch so the
    # consumers' maxFilesPerTrigger paces in real batches.
    def _append(batch_df, _batch_id):
        batch_df.coalesce(1).write.mode("append").parquet(archive_dir)

    return (
        events.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )


def archive_stream(spark: SparkSession, archive_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(SOAK_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(archive_dir)
    )


def wait_for_batches(query, n: int, timeout_s: float = 60.0) -> None:
    """Block until the query has committed >= n non-empty batches."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        done = [
            p
            for p in query.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        if len(done) >= n:
            return
        time.sleep(0.2)
    raise TimeoutError(
        f"query did not reach {n} non-empty batches in {timeout_s}s"
    )


def append_watermark_flush(
    spark: SparkSession, archive_dir: str, past_ts, horizon_s: int = 3600
) -> None:
    """Append one sentinel event far past `past_ts` so every pending
    watermark-held result flushes on the next micro-batch."""
    spark.createDataFrame(
        [(past_ts, -1, 0.0)], SOAK_SCHEMA
    ).withColumn(
        "ts", F.col("ts") + F.expr(f"INTERVAL {horizon_s} SECONDS")
    ).write.mode("append").parquet(archive_dir)


def watermarks_of(query) -> list[str]:
    """Non-empty event-time watermarks from the query's progress, in
    batch order (ISO strings sort chronologically)."""
    out = []
    for p in query.recentProgress:
        wm = (p.get("eventTime") or {}).get("watermark")
        if wm and not wm.startswith("1970"):
            out.append(wm)
    return out


def memory_query(df: DataFrame, mode: str, trigger_ms: int = 500):
    """Start df into a uniquely-named memory sink; returns (query, name)."""
    name = f"soak_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )
    return q, name


def archive_file_count(archive_dir: str) -> int:
    try:
        return sum(
            1 for f in os.listdir(archive_dir) if f.endswith(".parquet")
        )
    except FileNotFoundError:
        return 0
