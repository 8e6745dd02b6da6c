"""Batch-mode oracles for the streaming operators (SURVEY §2.B
"Streaming-only operators" — net-new surface; the reference has no stream
processing, only HTTP transport framing: pkg/http/query_stream_controller.go).

Each windowing semantic is implemented here as a batch DataFrame query so
the DuckDB oracle can verify it; litebase_spark.streaming wires the SAME
expressions into Structured Streaming (readStream + watermark), and tests
assert stream==batch on the events fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from litebase_spark.catalog import SQL_DSUM, dsum, load, query


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 10-minute event-time window per event type "
    "(streaming M4 analog; same F.window feeds readStream). 100 TB: "
    "partial agg collapses map-side; shuffle keyed by (window, type).",
    tags=("streaming",),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_window",
    oracle=f"""
    WITH expanded AS (
        SELECT u.ws AS window_start, value FROM events e,
        UNNEST([time_bucket(INTERVAL 5 MINUTE, e.ts),
                time_bucket(INTERVAL 5 MINUTE, e.ts) - INTERVAL 5 MINUTE])
            AS u(ws)
    )
    SELECT window_start, COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS sum_value
    FROM expanded GROUP BY 1
    """,
    description="Sliding window 10min/5min: each event lands in 2 windows "
    "(F.window with slideDuration). Oracle expands the two candidate "
    "window starts explicitly.",
    tags=("streaming",),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


SESSION_GAP_MIN = 30


@query(
    "stream_session_window",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR date_diff('second', LAG(ts) OVER w, ts)
                       > {SESSION_GAP_MIN * 60}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT)
               AS duration_sec
    FROM sessions
    GROUP BY user_id, session_no
    """,
    description="Sessionization with a 30-minute inactivity gap — batch "
    "gaps-and-islands form (lag + cumulative flag sum). The streaming "
    "twin uses F.session_window with the same gap (see "
    "litebase_spark.streaming); tests assert both agree on the fixture. "
    "100 TB: one shuffle on user_id; per-user ordering local to the "
    "partition.",
    tags=("streaming", "window"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ok = (
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ) > SESSION_GAP_MIN * 60
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | gap_ok, 1)
        .otherwise(0)
        .alias("new_session"),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session").over(wsum).alias("session_no"),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("duration_sec"),
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
        SELECT user_id, event_type, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    description="Stateful dedup analog: first event per (user, type) — "
    "batch twin of dropDuplicatesWithinWatermark (streaming module). ",
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "stream_late_data_policy",
    oracle=f"""
    WITH max_ts AS (SELECT MAX(ts) AS wm_base FROM events)
    SELECT time_bucket(INTERVAL 10 MINUTE, e.ts) AS window_start,
           COUNT(*) AS n_events,
           {SQL_DSUM('e.value')} AS sum_value
    FROM events e CROSS JOIN max_ts m
    WHERE e.ts >= m.wm_base - INTERVAL 2 HOUR
    GROUP BY 1
    """,
    description="Watermark/late-data policy in batch form: events older "
    "than (max event time - 2h) are dropped before windowing — exactly "
    "what withWatermark('ts', '2 hours') admits into state in the "
    "streaming twin.",
    tags=("streaming",),
)
def stream_late_data_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("wm_base"))
    return (
        e.crossJoin(F.broadcast(wm))
        .filter(F.col("ts") >= F.col("wm_base") - F.expr("INTERVAL 2 HOURS"))
        .groupBy(F.window("ts", "10 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_stateful_totals",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events GROUP BY user_id
    """,
    description="Custom stateful streaming operator "
    "(applyInPandasWithState): per-user running totals held in keyed state "
    "store, updated by Arrow-batched pandas across microbatches "
    "(streaming/stateful.py). Executed here with AvailableNow over the "
    "single-file fixture (one batch), so the final state equals the batch "
    "aggregate — which is the oracle. Multi-batch state carry-over is "
    "covered in tests/test_streaming.py.",
    tags=("streaming", "stateful"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from litebase_spark.streaming.stateful import running_user_totals
    from litebase_spark.streaming.windows import (
        _normalized_events,
        events_stream,
        run_available_now,
    )

    stream = _normalized_events(events_stream(spark, sf_dir))
    out = run_available_now(running_user_totals(stream), output_mode="update")
    return out.select(
        "user_id",
        "n_events",
        F.round(F.col("total_value").cast("decimal(18,4)").cast("double"), 2).alias(
            "total_value"
        ),
    )


@query(
    "stream_static_enrich",
    oracle=f"""
    SELECT time_bucket(INTERVAL 10 MINUTE, e.ts) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           {SQL_DSUM('e.value')} AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    description="Stream-static enrichment: the event stream joins the "
    "customer dimension (static broadcast — re-read per micro-batch in "
    "Structured Streaming, so dim updates are picked up without "
    "restarts) and aggregates revenue per 10-minute window x market "
    "segment. The streaming form is stateless on the join (no watermark "
    "state: the static side is a broadcast hash build per batch) and "
    "stateful only in the windowed agg — the canonical enrichment shape "
    "at 100 TB. Batch twin shares the exact expressions; "
    "tests/test_streaming.py asserts stream == batch.",
    tags=("streaming", "join"),
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey)
        .groupBy(F.window("ts", "10 minutes"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_left_outer_join",
    oracle="""
    WITH m AS (
        SELECT MIN(mx) - INTERVAL 2 HOUR AS wmk FROM (
            SELECT MAX(ts) AS mx FROM events
            WHERE event_type IN ('purchase', 'click') GROUP BY event_type)
    ),
    p AS (
        SELECT event_id AS p_event_id, user_id AS p_user, ts AS p_ts
        FROM events, m
        WHERE event_type = 'purchase' AND ts < m.wmk
    ),
    c AS (
        SELECT event_id AS c_event_id, user_id AS c_user, ts AS c_ts,
               value AS c_value
        FROM events WHERE event_type = 'click'
    )
    SELECT p.p_event_id, p.p_user, p.p_ts, c.c_event_id, c.c_ts, c.c_value
    FROM p LEFT JOIN c
      ON c.c_user = p.p_user
     AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
     AND c.c_ts < p.p_ts
    """,
    description="Batch twin of the stream-stream LEFT OUTER interval "
    "join (streaming/windows.py stream_stream_left_outer): every "
    "purchase with the same user's clicks in the preceding 30 minutes, "
    "NULL-extended when none. Restricted to purchases whose outer "
    "result is watermark-final: the streaming global watermark is the "
    "MIN across both sides' watermark nodes, i.e. "
    "min(max purchase ts, max click ts) - 2h — exactly the horizon the "
    "AvailableNow run evicts (and NULL-emits) unmatched purchases up "
    "to; tests/test_streaming.py asserts stream == batch on it.",
    tags=("streaming", "join"),
)
def stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wm = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("mx"))
        .agg((F.min("mx") - F.expr("INTERVAL 2 HOURS")).alias("wmk"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(wm))
        .filter(F.col("ts") < F.col("wmk"))
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    # r14: TIME-BUCKETED equi join (join_range_interval's shape) instead
    # of a plain user-keyed join with the interval as a residual — the
    # residual form compares every click of a user against every
    # purchase of that user, quadratic in per-user history (x100m warm
    # 17.6 s); the (user, 30-min bucket) key bounds candidates to one
    # hour of clicks per probe. Clicks fan out to buckets {b, b+1} (the
    # two a 30-min look-back from a later purchase can reach), purchases
    # stay at ONE row so LEFT OUTER still emits exactly one
    # NULL-extended row per matchless purchase; a matching pair meets
    # exactly one click copy (copy buckets are distinct, the key picks
    # the purchase's), so no dedup pass. Value-identical — the residual
    # range test is unchanged. x100m A/B in OPTIMIZATION_r14.md.
    _W = 1800
    pb = p.withColumn(
        "p_bkt", (F.unix_timestamp("p_ts") / _W).cast("long")
    )
    cb = c.withColumn(
        "c_bkt",
        F.explode(
            F.array(
                (F.unix_timestamp("c_ts") / _W).cast("long"),
                (F.unix_timestamp("c_ts") / _W).cast("long") + 1,
            )
        ),
    )
    return pb.join(
        cb,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_bkt") == F.col("p_bkt"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    ).select("p_event_id", "p_user", "p_ts", "c_event_id", "c_ts", "c_value")


@query(
    "stream_full_outer_join",
    oracle="""
    WITH m AS (
        SELECT MIN(mx) - INTERVAL 2 HOUR AS wmk FROM (
            SELECT MAX(ts) AS mx FROM events
            WHERE event_type IN ('purchase', 'click') GROUP BY event_type)
    ),
    p AS (
        SELECT event_id AS p_event_id, user_id AS p_user, ts AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT event_id AS c_event_id, user_id AS c_user, ts AS c_ts,
               value AS c_value
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.p_event_id, p.p_user, p.p_ts,
               c.c_event_id, c.c_user, c.c_ts, c.c_value
        FROM p FULL OUTER JOIN c
          ON c.c_user = p.p_user
         AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
         AND c.c_ts < p.p_ts
    )
    SELECT j.* FROM j, m
    WHERE (p_event_id IS NOT NULL AND c_event_id IS NOT NULL)
       OR (c_event_id IS NULL AND p_ts < m.wmk)
       OR (p_event_id IS NULL AND c_ts + INTERVAL 30 MINUTE < m.wmk)
    """,
    description="Batch twin of the stream-stream FULL OUTER interval "
    "join: matched pairs plus NULL-extended unmatched rows on both "
    "sides, each side restricted to its watermark-final horizon — "
    "purchases finalize when the global watermark (min over both "
    "sides' watermark nodes, 2h behind) passes p_ts; clicks when it "
    "passes c_ts + the 30-minute forward join window. "
    "tests/test_streaming.py asserts stream == batch on this set.",
    tags=("streaming", "join"),
)
def stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wm = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("mx"))
        .agg((F.min("mx") - F.expr("INTERVAL 2 HOURS")).alias("wmk"))
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    # r14: the FULL OUTER interval join decomposes into the bucketed
    # LEFT join (matched pairs + NULL-extended purchases; see
    # stream_left_outer_join for the bucket algebra) plus a bucketed
    # LEFT ANTI join for the click-unmatched rows — a full_outer over
    # the raw (user, range) predicate pairs every click of a user with
    # every purchase, quadratic in per-user history (x100m warm 18.6 s).
    # For the click-perspective joins the PURCHASE side fans out to
    # buckets {b-1, b} (the two a purchase's 30-min look-back spans), so
    # a click meets each in-range purchase exactly once and the anti
    # join drops exactly the clicks with >= 1 in-range purchase.
    # Watermark-horizon filters are applied per category exactly as the
    # old post-join filter did. x100m A/B in OPTIMIZATION_r14.md.
    _W = 1800
    rng = (
        F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")
    ) & (F.col("c_ts") < F.col("p_ts"))
    pb = p.withColumn(
        "p_bkt", (F.unix_timestamp("p_ts") / _W).cast("long")
    )
    cb = c.withColumn(
        "c_bkt",
        F.explode(
            F.array(
                (F.unix_timestamp("c_ts") / _W).cast("long"),
                (F.unix_timestamp("c_ts") / _W).cast("long") + 1,
            )
        ),
    )
    left = pb.join(
        cb,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_bkt") == F.col("p_bkt"))
        & rng,
        "left",
    )
    p_part = (
        left.crossJoin(F.broadcast(wm))
        .filter(
            F.col("c_event_id").isNotNull()
            | (F.col("p_ts") < F.col("wmk"))
        )
        .select(
            "p_event_id", "p_user", "p_ts", "c_event_id", "c_user",
            "c_ts", "c_value",
        )
    )
    pe = pb.withColumn(
        "pj_bkt",
        F.explode(F.array(F.col("p_bkt") - 1, F.col("p_bkt"))),
    )
    c_unmatched = c.join(
        pe,
        (F.col("c_user") == F.col("p_user"))
        & ((F.unix_timestamp("c_ts") / _W).cast("long")
           == F.col("pj_bkt"))
        & rng,
        "left_anti",
    )
    c_part = (
        c_unmatched.crossJoin(F.broadcast(wm))
        .filter(
            F.col("c_ts") + F.expr("INTERVAL 30 MINUTES") < F.col("wmk")
        )
        .select(
            F.lit(None).cast("long").alias("p_event_id"),
            F.lit(None).cast("long").alias("p_user"),
            F.lit(None).cast(c.schema["c_ts"].dataType).alias("p_ts"),
            "c_event_id", "c_user", "c_ts", "c_value",
        )
    )
    return p_part.unionByName(c_part)


from litebase_spark.operators.asof import SCD2_ORACLE  # noqa: E402


@query(
    "stream_scd2_apply",
    oracle=SCD2_ORACLE,
    description="Streaming CDC -> SCD-2: the ts_scd2_intervals batch "
    "operator re-expressed as a CUSTOM STATEFUL streaming operator "
    "(applyInPandasWithState, streaming/stateful.py:scd2_apply): keyed "
    "state holds (last_cents, open-interval start, version) per "
    "(user_id, event_type); each microbatch folds its events in event "
    "order, emitting closed intervals as changes arrive and the open "
    "interval in its current form (an upsert sink keyed by (entity, "
    "version) converges across batches). Executed here with "
    "AvailableNow over the single-file fixture (one batch), so the "
    "emitted set equals the batch operator's output — which is the "
    "oracle, the same SQL ts_scd2_intervals verifies against. State is "
    "4 scalars per key; the shuffle is the one key co-location any "
    "stateful operator pays.",
    tags=("streaming", "stateful", "cdc"),
)
def stream_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from litebase_spark.streaming.stateful import scd2_apply
    from litebase_spark.streaming.windows import (
        _normalized_events,
        events_stream,
        run_available_now,
    )

    stream = _normalized_events(events_stream(spark, sf_dir)).select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    return run_available_now(scd2_apply(stream), output_mode="update")


from litebase_spark.operators.dedup import _minhash_lsh_oracle  # noqa: E402


@query(
    "stream_dedup_minhash_lsh",
    oracle=_minhash_lsh_oracle(),
    description="Streaming MinHash-LSH near-dedup: the dedup_minhash_lsh "
    "batch scale path re-expressed as a CUSTOM STATEFUL streaming "
    "operator (applyInPandasWithState, streaming/stateful.py:"
    "minhash_lsh_pairs_stream). Arriving documents get signatures via "
    "the same Arrow mapInPandas kernel and band explosion as batch; "
    "keyed state per (band, bucket) holds the bucket posting list, and "
    "each new document compares ONLY against its bucket's seen docs — "
    "the incremental form of the band self-join, so ingestion cost per "
    "batch is O(new x bucket-local), never corpus-quadratic. Every "
    "unordered pair meets exactly once per shared band (when its later "
    "member arrives), so the cross-batch union of emissions equals the "
    "batch candidate set; est = matches/32 is exact. Executed here "
    "with AvailableNow + the upsert-by-(doc_a, doc_b) sink contract "
    "(dropDuplicates on the materialized sink), then the batch "
    "threshold/order — which makes the output identical to "
    "dedup_minhash_lsh and lets the SAME DuckDB oracle certify the "
    "streaming path. Cross-batch state-carry is pinned by a 4-file "
    "maxFilesPerTrigger=1 parity test (test_streaming.py).",
    tags=("streaming", "stateful", "dedup", "lsh", "llm"),
)
def stream_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from litebase_spark.operators.dedup import (
        N_BANDS,
        N_HASHES,
        band_signatures,
        minhash_signatures,
    )
    from litebase_spark.streaming.stateful import minhash_lsh_pairs_stream
    from litebase_spark.streaming.windows import (
        documents_stream,
        run_available_now,
    )

    stream = documents_stream(spark, sf_dir)
    sigs = minhash_signatures(stream)
    banded = band_signatures(sigs, N_BANDS, N_HASHES // N_BANDS)
    out = run_available_now(
        minhash_lsh_pairs_stream(banded), output_mode="update"
    )
    return (
        out.filter(F.col("est_jaccard") >= 0.4)
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


from litebase_spark.operators.relational import (  # noqa: E402
    PSI_ORACLE,
    psi_binned,
    psi_from_cells,
)


@query(
    "stream_drift_psi",
    oracle=PSI_ORACLE,
    description="Streaming population-stability drift gate: the "
    "stats_psi batch operator re-expressed as a CONTINUOUS monitor — "
    "arriving events fold into an update-mode streaming aggregation "
    "keyed by the same $5 value bin (per-bin reference/current "
    "counts; Spark keeps the running counts in keyed state, so "
    "per-microbatch cost is O(touched bins), never corpus-rescan), "
    "and the PSI reduction runs over the final bin cells. Because "
    "per-bin counts are MONOTONE non-decreasing across updates, the "
    "latest update per bin == max per bin, which makes the "
    "memory-sink materialization deterministic; AvailableNow replay "
    "converges the state to exactly the batch cell table, so the "
    "SAME DuckDB oracle certifies the streaming path, and the final "
    "arithmetic is literally shared code (relational.psi_from_cells "
    "— the two paths cannot drift numerically). Cross-batch "
    "state-carry is pinned by a 4-file maxFilesPerTrigger=1 parity "
    "test vs the batch operator (test_streaming.py). Completes the "
    "streaming twins: dedup (r9), novelty (r10 batch 1), and now "
    "the drift-gate family.",
    tags=("streaming", "stateful", "stats", "drift"),
)
def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from litebase_spark.streaming.windows import (
        _normalized_events,
        events_stream,
        run_available_now,
    )

    stream = _normalized_events(events_stream(spark, sf_dir))
    cells = (
        psi_binned(stream)
        .groupBy("bin")
        .agg(
            F.sum("refw").alias("c1"),
            F.sum(F.lit(1) - F.col("refw")).alias("c2"),
        )
    )
    sink = run_available_now(cells, output_mode="update")
    final = sink.groupBy("bin").agg(
        F.max("c1").alias("c1"), F.max("c2").alias("c2")
    )
    return psi_from_cells(final)
