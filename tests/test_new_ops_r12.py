"""Round-12 pinning tests.

Part 1: the round-11 ADVICE closures —
  - drift_report_multi column-name validation + backtick quoting
    (the ?cols= HTTP param must never reach F.expr as raw SQL text)
  - exact-median default drift split (partition-order invariant)
  - porter_stem_py bound-parameter query terms (quote-safe MATCH)
  - graph_k_core oracle unrolled to the Spark fixpoint bound (deep
    peels agree between engines, not just fixture-depth ones)
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# drift_report_multi: identifier hygiene (ADVICE medium)
# ---------------------------------------------------------------------------

def _drift_df(spark, names=("v1", "v2")):
    rows = [
        (f"2024-01-{d:02d} 00:00:00", float(d), float(d) * 2.0)
        for d in range(1, 31)
    ]
    df = spark.createDataFrame(rows, ["ts_s", *names])
    return df.selectExpr(
        "cast(ts_s as timestamp) as ts",
        *[f"`{n}`" for n in names],
    )


def test_drift_multi_rejects_unknown_cols(spark):
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark)
    with pytest.raises(ValueError, match="unknown column"):
        drift_report_multi(df, ["v1", "nope"], split="2024-01-16")


def test_drift_multi_rejects_injection_string(spark):
    """A crafted ?cols= value must die at validation, not reach
    F.expr: before the fix this interpolated raw into stack()."""
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark)
    evil = "v1 as double)) , (select java_method('java.lang.System'"
    with pytest.raises(ValueError, match="unknown column"):
        drift_report_multi(df, [evil], split="2024-01-16")


def test_drift_multi_backticks_odd_identifiers(spark):
    """A legitimate column name needing quoting (space) must work."""
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark, names=("my col", "v2"))
    rows = drift_report_multi(
        df, ["my col", "v2"], split="2024-01-16"
    ).collect()
    assert sorted(r["vcol"] for r in rows) == ["my col", "v2"]
    for r in rows:
        assert r["n_ref"] == 15 and r["n_cur"] == 15


def test_drift_rejects_unknown_ts_col(spark):
    from litebase_spark.operators.relational import drift_report

    df = _drift_df(spark)
    with pytest.raises(ValueError, match="unknown ts_col"):
        drift_report(df, value_col="v1", ts_col="not_there")


def test_drift_default_split_partition_invariant(spark):
    """The default (median) split must not move with partitioning —
    exact percentile(), not the order-sensitive approx sketch."""
    from litebase_spark.operators.relational import drift_report

    df = _drift_df(spark)
    a = drift_report(df.repartition(1), value_col="v1").collect()
    b = drift_report(df.repartition(7, "v2"), value_col="v1").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # 30 days: exact median micros sits between day 15 and 16, so the
    # "<" cut puts exactly 15 rows in the reference half
    assert a[0]["n_ref"] == 15


# ---------------------------------------------------------------------------
# porter_stem_py: bound parameter (ADVICE low)
# ---------------------------------------------------------------------------

def test_porter_stem_py_quote_safe():
    from litebase_spark.functions.porter import porter_stem_py

    # before the fix these broke the DuckDB statement outright
    assert porter_stem_py("don't") == porter_stem_py("DON'T")
    assert isinstance(porter_stem_py("o'clock"), str)
    assert porter_stem_py("'; drop table t; --") != ""
    # sanity: normal stemming still intact
    assert porter_stem_py("running") == "run"


# ---------------------------------------------------------------------------
# graph_k_core: oracle unrolled to the fixpoint bound (ADVICE low)
# ---------------------------------------------------------------------------

def test_kcore_oracle_depth_matches_fixpoint_bound():
    from litebase_spark.operators import graph

    assert graph._KCORE_ITERS == graph._KCORE_MAX_ROUNDS


def test_kcore_deep_peel_agrees_with_oracle(spark, tmp_path):
    """A pendant chain needing ~21 peel rounds (>> the old 8-round
    oracle unroll) hanging off a triangle: both engines must peel all
    the way down to the triangle. Before the fix the oracle stopped
    at 8 rounds and legitimately disagreed with the Spark fixpoint."""
    import duckdb

    from litebase_spark.operators.graph import (
        _kcore_oracle,
        graph_k_core,
    )

    # chain p0-...-p20 then p20-t100; triangle t100-t101-t102. Every
    # edge co-purchased in two orders so it survives the w>=2 gate.
    edges = [(i, i + 1) for i in range(20)] + [
        (20, 100), (100, 101), (100, 102), (101, 102),
    ]
    rows = []
    oid = 0
    for u, v in edges:
        for _ in range(2):
            rows.append((oid, u))
            rows.append((oid, v))
            oid += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        (r["part"], r["core_degree"])
        for r in graph_k_core(spark, str(tmp_path)).collect()
    }
    assert got == {(100, 2), (101, 2), (102, 2)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    oracle = {tuple(r) for r in con.execute(_kcore_oracle()).fetchall()}
    assert oracle == got
