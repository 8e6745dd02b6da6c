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
