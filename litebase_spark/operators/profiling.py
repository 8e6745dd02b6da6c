"""Table profiling — the ANALYZE/statistics surface, as one relational pass.

The reference exposes SQLite's ANALYZE (sqlite_stat1/stat4 histograms
feeding its planner; the engine accepts ANALYZE via
`Engine.sql("ANALYZE")`, engine.py). On Spark the planner consumes
catalog statistics (`ANALYZE TABLE ... COMPUTE STATISTICS`), but a data
engineer also needs the *profile itself* — per-column null rates,
cardinalities, ranges — for data-quality gates over a 100 TB corpus.

Scale design: ONE scan computes every per-column aggregate
simultaneously (a single agg node; count/min/max fold map-side). The
exact per-column DISTINCT counts make Catalyst plan an Expand (one
shuffled pass per distinct column fused into one stage) — exact is the
oracle-checkable form shipped here; at 100 TB you swap the exact
count_distinct for approx_count_distinct (HLL, one pass, mergeable —
see operators/skew.py) column-for-column. min/max involve no
summation, so doubles are engine-exact without fixed-point games; the
profile rows are unpivoted from the single aggregate row (no second
scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query

# (column, kind) — kind picks which min/max slot the values land in.
_COLS = (
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
)


def _oracle() -> str:
    aggs = ["COUNT(*) AS n_rows"]
    rows = []
    for c, kind in _COLS:
        aggs.append(f"COUNT({c}) AS cnt_{c}")
        aggs.append(f"COUNT(DISTINCT {c}) AS nd_{c}")
        if kind == "num":
            aggs.append(f"CAST(MIN({c}) AS DOUBLE) AS min_{c}")
            aggs.append(f"CAST(MAX({c}) AS DOUBLE) AS max_{c}")
        elif kind == "ts":
            aggs.append(f"CAST(epoch(MIN({c})) AS DOUBLE) AS min_{c}")
            aggs.append(f"CAST(epoch(MAX({c})) AS DOUBLE) AS max_{c}")
        else:
            aggs.append(f"MIN({c}) AS min_{c}")
            aggs.append(f"MAX({c}) AS max_{c}")
        min_num = f"min_{c}" if kind != "str" else "NULL"
        max_num = f"max_{c}" if kind != "str" else "NULL"
        min_str = f"min_{c}" if kind == "str" else "NULL"
        max_str = f"max_{c}" if kind == "str" else "NULL"
        rows.append(
            f"SELECT '{c}' AS column_name, n_rows,"
            f" n_rows - cnt_{c} AS n_null, nd_{c} AS n_distinct,"
            f" CAST({min_num} AS DOUBLE) AS min_num,"
            f" CAST({max_num} AS DOUBLE) AS max_num,"
            f" CAST({min_str} AS VARCHAR) AS min_str,"
            f" CAST({max_str} AS VARCHAR) AS max_str FROM a"
        )
    return (
        "WITH a AS (SELECT " + ", ".join(aggs) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY column_name"
    )


@query(
    "profile_lineitem_stats",
    oracle=_oracle(),
    description="Column profile of lineitem in ONE scan (the ANALYZE "
    "statistics surface as data): per column non-null/distinct counts "
    "and min/max (numeric + timestamp ranges as epoch doubles, string "
    "ranges lexicographic), unpivoted from a single aggregate row — no "
    "per-column rescans. Exact distincts keep it oracle-checkable; the "
    "100 TB swap is approx_count_distinct per column (skew.py HLL).",
    tags=("profile", "analyze", "quality"),
)
def profile_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _COLS:
        aggs.append(F.count(c).alias(f"cnt_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if kind == "ts":
            aggs.append(
                F.unix_timestamp(F.min(c)).cast("double").alias(f"min_{c}"))
            aggs.append(
                F.unix_timestamp(F.max(c)).cast("double").alias(f"max_{c}"))
        elif kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"min_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"max_{c}"))
        else:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
    one = li.agg(*aggs)
    # Unpivot by exploding an array of per-column structs over the ONE
    # aggregate row — a union of 11 projections would re-run the scan
    # per branch; this stays a single pass.
    entries = []
    for c, kind in _COLS:
        entries.append(F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col(f"cnt_{c}")).alias("n_null"),
            F.col(f"nd_{c}").alias("n_distinct"),
            (F.col(f"min_{c}") if kind != "str"
             else F.lit(None)).cast("double").alias("min_num"),
            (F.col(f"max_{c}") if kind != "str"
             else F.lit(None)).cast("double").alias("max_num"),
            (F.col(f"min_{c}") if kind == "str"
             else F.lit(None)).cast("string").alias("min_str"),
            (F.col(f"max_{c}") if kind == "str"
             else F.lit(None)).cast("string").alias("max_str"),
        ))
    return (
        one.select(F.explode(F.array(*entries)).alias("p"))
        .select("p.*")
        .orderBy("column_name")
    )
