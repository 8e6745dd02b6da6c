"""Property-based check of the as-of join: on arbitrary generated
frames, the union+window sweep must agree with pandas.merge_asof
(the reference semantics implementation everyone knows)."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from litebase_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=3)
TS = st.integers(min_value=0, max_value=50)


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(st.tuples(KEYS, TS), min_size=1, max_size=25, unique=True)
    )
    right = draw(
        st.lists(
            st.tuples(KEYS, TS, st.integers(0, 1000)),
            min_size=0,
            max_size=25,
            unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): match
            # determinism — duplicate right timestamps are ambiguous in
            # every as-of definition
        )
    )
    return left, right


_SPARK = []


@settings(max_examples=15, deadline=None)
@given(asof_case())
def test_asof_join_matches_pandas_merge_asof(case):
    # session-scoped fixture can't feed @given; memoize one session here
    if not _SPARK:
        from litebase_spark.session import get_spark

        _SPARK.append(get_spark("asof-prop", master="local[4]", shuffle_partitions=4))
    spark = _SPARK[0]
    left_rows, right_rows = case

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "key long, ts long, left_id long",
    )
    right = spark.createDataFrame(right_rows, "key long, ts long, payload long")

    got = (
        asof_join(
            left,
            right,
            on="key",
            left_ts="ts",
            right_ts="ts",
            right_payload=["ts", "payload"],
        )
        .orderBy("left_id")
        .toPandas()
    )

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["key", "ts", "left_id"],
    ).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(right_rows, columns=["key", "ts", "payload"])
        .astype({"key": "int64", "ts": "int64", "payload": "int64"})
        .sort_values("ts", kind="stable")
    )
    want = pd.merge_asof(
        lp, rp, on="ts", by="key", direction="backward", suffixes=("", "_r")
    ).sort_values("left_id")

    got_map = {r["left_id"]: r["r_payload"] for r in got.to_dict("records")}
    for rec in want.to_dict("records"):
        g_payload = got_map[rec["left_id"]]
        w_payload = rec["payload"]
        if pd.isna(w_payload):
            assert pd.isna(g_payload), (rec, g_payload)
        else:
            assert g_payload == w_payload, (rec, g_payload)
