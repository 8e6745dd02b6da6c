"""Table profiling — the ANALYZE/statistics surface, as one relational pass.

The reference exposes SQLite's ANALYZE (sqlite_stat1/stat4 histograms
feeding its planner; the engine accepts ANALYZE via
`Engine.sql("ANALYZE")`, engine.py). On Spark the planner consumes
catalog statistics (`ANALYZE TABLE ... COMPUTE STATISTICS`), but a data
engineer also needs the *profile itself* — per-column null rates,
cardinalities, ranges — for data-quality gates over a 100 TB corpus.

Scale design (round 4 — replaces the 11-branch union, which paid
44 exchanges = 11 branches x (partial, final) x 2-stage DISTINCT; this
plan has ~9 and runs as ONE job whose independent stages schedule
concurrently):

1. ONE scan computes every non-DISTINCT statistic (count, non-null
   count, typed min/max for all 11 columns) PLUS exact NDV for the
   eight bounded-cardinality columns via `size(collect_set(c))`.
   collect_set is a plain (non-DISTINCT) aggregate: map-side combined,
   no Expand, and for columns whose NDV is bounded (flags, enums,
   dates, small keys — here <= ~2.5k) the per-partition sets stay tiny.
   This is the exact-NDV analog of the HLL swap (operators/skew.py)
   a 100 TB run would use.
2. The three genuinely high-NDV columns (l_orderkey, l_partkey,
   l_extendedprice) each get their own single-DISTINCT aggregate
   branch — Catalyst's two-stage partial-dedup rewrite, no Expand.
   Three branches, not eleven: measured 0.49 s vs 2.3 s for the
   Expand route (11 count_distincts in one agg multiplies every row
   12x through one exchange) and vs 1.9 s for a stack/Generate
   unpivot (Generate breaks whole-stage codegen).
   NEVER mix DISTINCT and non-DISTINCT aggregates in one agg here:
   Catalyst drags every non-distinct partial through the Expand
   replicas (measured 16.3 s at sf0.1 for the fused version).
3. The 1-row stats and the 3-row distinct counts meet in a broadcast
   join; per-column slots are picked with a CASE over column_name.

min/max involve no summation, so doubles are engine-exact without
fixed-point games.
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

# Columns whose NDV is known-bounded (enums, flags, dates, small keys):
# exact NDV via collect_set inside the stats scan. The rest get a
# dedicated single-DISTINCT branch.
_BIG_NDV = ("l_orderkey", "l_partkey", "l_extendedprice")


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
    description="Column profile of lineitem (the ANALYZE statistics "
    "surface as data): per column non-null/distinct counts and min/max "
    "(numeric + timestamp ranges as epoch doubles, string ranges "
    "lexicographic) in ~9 exchanges / one job — a single typed-stats "
    "scan with collect_set exact NDV for bounded-cardinality columns, "
    "plus three single-DISTINCT branches for the high-NDV keys (no "
    "Expand anywhere). The 100 TB swap is approx_count_distinct per "
    "column (skew.py HLL), folding NDV into the stats scan.",
    tags=("profile", "analyze", "quality"),
)
def profile_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    # -- pass 1: counts, typed min/max, collect_set NDV for smalls ------
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _COLS:
        aggs.append(F.count(c).alias(f"cnt_{c}"))
        if kind == "ts":
            aggs.append(
                F.unix_timestamp(F.min(c)).cast("double").alias(f"mn_{c}")
            )
            aggs.append(
                F.unix_timestamp(F.max(c)).cast("double").alias(f"mx_{c}")
            )
        else:
            t = "double" if kind == "num" else "string"
            aggs.append(F.min(c).cast(t).alias(f"mn_{c}"))
            aggs.append(F.max(c).cast(t).alias(f"mx_{c}"))
        if c not in _BIG_NDV:
            aggs.append(
                F.size(F.collect_set(c)).cast("long").alias(f"nd_{c}")
            )
    stats = li.agg(*aggs)

    # -- pass 2: one single-DISTINCT branch per high-NDV column ---------
    nd_branches = []
    for c in _BIG_NDV:
        nd_branches.append(
            li.select(c)
            .agg(F.count_distinct(F.col(c)).alias("nd_big"))
            .select(F.lit(c).alias("nd_name"), "nd_big")
        )
    nd = nd_branches[0]
    for b in nd_branches[1:]:
        nd = nd.unionAll(b)

    # -- assemble: 11 literal rows x broadcast 1-row stats + 3-row nd ---
    names = spark.createDataFrame(
        [(c,) for c, _ in _COLS], "column_name string"
    )
    joined = (
        names.join(F.broadcast(stats))
        .join(
            F.broadcast(nd),
            F.col("column_name") == F.col("nd_name"),
            "left",
        )
    )

    def pick(prefix: str, kinds: tuple[str, ...], cast_to: str):
        expr = F.lit(None)
        for c, kind in _COLS:
            if kind in kinds:
                expr = F.when(
                    F.col("column_name") == c, F.col(f"{prefix}_{c}")
                ).otherwise(expr)
        return expr.cast(cast_to)

    n_null = F.lit(None)
    n_distinct = F.col("nd_big")
    for c, _ in _COLS:
        n_null = F.when(
            F.col("column_name") == c,
            F.col("n_rows") - F.col(f"cnt_{c}"),
        ).otherwise(n_null)
        if c not in _BIG_NDV:
            n_distinct = F.when(
                F.col("column_name") == c, F.col(f"nd_{c}")
            ).otherwise(n_distinct)

    return joined.select(
        "column_name",
        "n_rows",
        n_null.cast("long").alias("n_null"),
        n_distinct.cast("long").alias("n_distinct"),
        pick("mn", ("num", "ts"), "double").alias("min_num"),
        pick("mx", ("num", "ts"), "double").alias("max_num"),
        pick("mn", ("str",), "string").alias("min_str"),
        pick("mx", ("str",), "string").alias("max_str"),
    ).orderBy("column_name")
