"""Custom stateful streaming operator: applyInPandasWithState.

The reference has no stream processing (SURVEY §2.B streaming row); this
is north-star surface. Where windows.py uses built-in window/watermark
operators, this module shows the ARBITRARY-state path Spark provides for
operators the built-ins can't express: per-key state that survives
across microbatches, updated by Arrow-batched Python.

Scale notes: state lives in the state store keyed by user_id — one
shuffle to co-locate each key's events, O(keys) state, Arrow transfer in
vectorized batches (never per-row Python). Unbounded-state risk is the
operator author's contract: real deployments pair this with event-time
timeouts (GroupStateTimeout.EventTimeTimeout) to expire idle keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "cnt bigint, total double"


def _update_totals(key, pdf_iter, state: GroupState):
    """Accumulate per-user event count + value total across microbatches;
    emit the running totals once per batch the key appears in."""
    cnt, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [cnt], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# State API v2: transformWithStateInPandas (Spark 4)
# ---------------------------------------------------------------------------

def state_v2_available() -> bool:
    """transformWithStateInPandas needs google.protobuf in the Python
    workers (the state-server protocol is protobuf-framed). Absent in
    this container — the operator is gated, not stubbed: with protobuf
    installed it runs as-is (the pytest marks itself skipped here)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_peaks_v2(stream: DataFrame) -> DataFrame:
    """Per-user running (count, fixed-point total, peak value) on the
    Spark 4 state API v2: ValueState via a StatefulProcessor — the
    successor of applyInPandasWithState with typed state handles, timers,
    and TTL. Totals accumulate in integer cents so results are exact and
    order-independent (the portable fixed-point rule)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class UserPeaks(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("cnt", LongType()),
                        StructField("cents", LongType()),
                        StructField("peak_cents", LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timer_values):
            cnt, cents, peak = (
                tuple(self._st.get()) if self._st.exists() else (0, 0, 0)
            )
            for pdf in rows:
                cnt += len(pdf)
                c = (pdf["value"] * 100).round().astype("int64")
                cents += int(c.sum())
                if len(c):
                    peak = max(peak, int(c.max()))
            self._st.update((cnt, cents, peak))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [cnt],
                    "total_value": [cents / 100.0],
                    "peak_value": [peak / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        UserPeaks(),
        outputStructType=(
            "user_id bigint, n_events bigint, total_value double, "
            "peak_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# CDC changelog -> SCD-2 intervals, streaming form
# ---------------------------------------------------------------------------

SCD2_OUTPUT_SCHEMA = (
    "user_id bigint, event_type string, value double, version bigint,"
    " valid_from_us bigint, valid_to_us bigint, is_current boolean"
)
# last accepted change: cents for the exact-equality dedup, the raw
# value for emission, the open interval's start, and the version counter
SCD2_STATE_SCHEMA = (
    "last_cents bigint, last_value double, from_us bigint, version bigint"
)


def _us(series) -> "pd.Series":
    # dtype-agnostic timestamp -> epoch microseconds (datetime64[ns]
    # and datetime64[us] both divide exactly)
    return (series - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)


def _half_up_cents(value: float) -> int:
    """HALF_UP (half away from zero) cents, matching the batch twin's
    catalog.fp() (Spark F.round = HALF_UP) and the oracle's
    CAST(ROUND(value * 100, 0) AS BIGINT). Python's built-in round()
    is banker's (half-to-even) and would dedup a *.xx5 value
    differently in streaming vs batch."""
    import math

    scaled = value * 100.0
    return int(
        math.floor(scaled + 0.5) if scaled >= 0
        else math.ceil(scaled - 0.5)
    )


def _update_scd2(key, pdf_iter, state: GroupState):
    """Fold this key's events (chronological within the batch) into
    SCD-2 state: a value change closes the open interval (emitted with
    its valid_to) and opens the next version. The still-open interval is
    emitted once per batch with valid_to NULL / is_current true — a
    later batch that closes it re-emits the closed form, so an
    upsert-by-(key, version) sink converges (with AvailableNow over a
    single-file source there is exactly one batch and the output IS the
    batch operator's: see stream_scd2_apply's oracle)."""
    import pandas as pd  # noqa: F811 (worker-side import)

    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    if state.exists:
        last_cents, last_value, from_us, version = state.get
    else:
        last_cents, last_value, from_us, version = None, None, None, 0
    out = {c: [] for c in (
        "user_id", "event_type", "value", "version",
        "valid_from_us", "valid_to_us", "is_current",
    )}
    uid, etype = key
    ts_us = _us(rows["ts"])
    for value, t_us in zip(rows["value"], ts_us):
        cents = _half_up_cents(float(value))
        if last_cents is not None and cents == last_cents:
            continue  # unchanged value: no new version
        if last_cents is not None:
            # close the open interval at this change's timestamp
            out["user_id"].append(uid)
            out["event_type"].append(etype)
            out["value"].append(last_value)
            out["version"].append(version)
            out["valid_from_us"].append(from_us)
            out["valid_to_us"].append(int(t_us))
            out["is_current"].append(False)
        last_cents, last_value = cents, float(value)
        from_us, version = int(t_us), version + 1
    if last_cents is not None:
        state.update((last_cents, last_value, from_us, version))
        out["user_id"].append(uid)
        out["event_type"].append(etype)
        out["value"].append(last_value)
        out["version"].append(version)
        out["valid_from_us"].append(from_us)
        out["valid_to_us"].append(None)
        out["is_current"].append(True)
    yield pd.DataFrame(out)


def scd2_apply(stream: DataFrame) -> DataFrame:
    """Streaming twin of operators/asof.ts_scd2_intervals: per
    (user_id, event_type) SCD-2 version history maintained in keyed
    state across microbatches. One shuffle co-locates each key; state is
    O(keys) (4 scalars per key), emission is O(changes) — the CDC MERGE
    shape at 100 TB of changelog."""
    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _update_scd2,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming MinHash-LSH near-dedup (round-9: the batch/streaming
# asymmetry closer — batch dedup has minhash/simhash/SRP/SemDeDup;
# streaming previously had only exact-digest dedup_stream)
# ---------------------------------------------------------------------------

MINHASH_PAIR_SCHEMA = "doc_a bigint, doc_b bigint, est_jaccard double"
MINHASH_STATE_SCHEMA = "doc_ids array<bigint>, flat_sigs array<bigint>"


def _update_minhash_bucket(key, pdf_iter, state: GroupState):
    """Fold this (band, bucket)'s arriving signatures into bucket state
    and emit a candidate pair for every (new doc x previously-seen doc)
    collision — the incremental form of the batch band self-join: the
    union over batches of emitted pairs equals the batch operator's
    candidate set, because every unordered pair meets exactly once (when
    its later member arrives).  est = matches/len(sig) is a power-of-two
    division, bit-identical to both batch engines.  State per key is the
    bucket posting list (ids + flattened signatures); hot buckets carry
    the same cap/salt contract as the batch join (SURVEY §7.3) and real
    deployments add an event-time timeout to expire cold buckets."""
    import pandas as pd  # noqa: F811 (worker-side import)

    batches = [p for p in pdf_iter if len(p)]
    if not batches:
        # zero-row invocation (reachable the moment a timeout config is
        # ever set): leave the stored posting list UNTOUCHED — the old
        # path would pd.concat-raise, and a stride=0 rebuild would
        # state.update([]) and wipe the flattened signatures.
        yield pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "est_jaccard": pd.Series([], dtype="float64"),
            }
        )
        return
    rows = pd.concat(batches, ignore_index=True)
    rows = rows.sort_values("doc_id", kind="mergesort")
    if state.exists:
        ids, flat = state.get
        ids = list(ids)
        flat = list(flat)
    else:
        ids, flat = [], []
    stride = len(rows["sig"].iloc[0]) if len(rows) else 0
    sigs = (
        [flat[i * stride: (i + 1) * stride] for i in range(len(ids))]
        if stride
        else []
    )
    out_a: list = []
    out_b: list = []
    out_e: list = []
    for doc_id, sig in zip(rows["doc_id"], rows["sig"]):
        sig = [int(v) for v in sig]
        for oid, osig in zip(ids, sigs):
            if oid == doc_id:
                continue
            m = sum(1 for x, y in zip(sig, osig) if x == y)
            a, b = (oid, doc_id) if oid < doc_id else (doc_id, oid)
            out_a.append(int(a))
            out_b.append(int(b))
            out_e.append(m / stride)
        ids.append(int(doc_id))
        sigs.append(sig)
    state.update((ids, [v for s in sigs for v in s]))
    # explicit dtypes so an empty emission batch still carries typed
    # columns (object-dtype empties trip pandas' concat deprecation)
    yield pd.DataFrame(
        {
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "est_jaccard": pd.Series(out_e, dtype="float64"),
        }
    )


def minhash_lsh_pairs_stream(banded: DataFrame) -> DataFrame:
    """Streaming twin of operators/dedup.lsh_candidate_pairs: banded
    minhash signatures grouped by (band, bucket) with the bucket posting
    list in keyed state.  One shuffle co-locates each bucket — the same
    exchange the batch band join pays — and emission is incremental:
    only (new x seen) comparisons run per microbatch, never a batch x
    corpus or corpus x corpus recompare.  A pair colliding in several
    bands is emitted once per band; the sink contract is upsert by
    (doc_a, doc_b) (same role as the batch dropDuplicates)."""
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _update_minhash_bucket,
        outputStructType=MINHASH_PAIR_SCHEMA,
        stateStructType=MINHASH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
