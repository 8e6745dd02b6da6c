"""Time-bucket gap fill + LOCF (operators/asof.py ts_gapfill_locf):
hand-built fixture with a known 2-day gap — scaffold rows materialize,
counts go to zero, the carried-forward value is the LAST daily total,
and the scaffold is per-entity (no fabricated history)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from litebase_spark.operators.asof import ts_gapfill_locf


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("gapfill")
    T = dt.datetime
    rows = [
        # user 1: active Jan 1 (2 events) and Jan 4 -> gaps Jan 2, Jan 3
        (1, T(2024, 1, 1, 9), 1, "click", 10.0, "{}"),
        (2, T(2024, 1, 1, 15), 1, "click", 2.5, "{}"),
        (3, T(2024, 1, 4, 8), 1, "purchase", 7.0, "{}"),
        # user 2: single active day -> one row, no gaps
        (4, T(2024, 2, 10, 12), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "events.parquet")
    )
    return str(d)


def test_gapfill_locf_hand_case(spark, events_dir):
    rows = {
        (r["user_id"], r["day"]): r
        for r in ts_gapfill_locf(spark, events_dir).collect()
    }
    # user 1 spans exactly their own active range: Jan 1..4 (4 days)
    u1 = sorted(k[1] for k in rows if k[0] == 1)
    assert u1 == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert rows[(1, "2024-01-01")]["n_events"] == 2
    assert rows[(1, "2024-01-01")]["is_gap"] is False
    assert rows[(1, "2024-01-01")]["locf_value"] == 12.5
    for gap_day in ("2024-01-02", "2024-01-03"):
        g = rows[(1, gap_day)]
        assert g["n_events"] == 0 and g["is_gap"] is True
        assert g["locf_value"] == 12.5  # carried across the gap
    assert rows[(1, "2024-01-04")]["locf_value"] == 7.0  # fresh value
    # user 2: per-entity scaffold -> exactly one day, in February
    u2 = [k[1] for k in rows if k[0] == 2]
    assert u2 == ["2024-02-10"]
    assert len(rows) == 5
