"""Table profiling — the ANALYZE/statistics surface, as one relational pass.

The reference exposes SQLite's ANALYZE (sqlite_stat1/stat4 histograms
feeding its planner; the engine accepts ANALYZE via
`Engine.sql("ANALYZE")`, engine.py). On Spark the planner consumes
catalog statistics (`ANALYZE TABLE ... COMPUTE STATISTICS`), but a data
engineer also needs the *profile itself* — per-column null rates,
cardinalities, ranges — for data-quality gates over a 100 TB corpus.

Scale design (round 5; the audited plan has 5 shuffle-exchange nodes
(stats 1, sets 1, HLL 2, 11-row sort 1) + 3 broadcasts — round 4's paid
10 shuffle nodes and 2.62 s at the sf1 point; the recorded round-6
number is 1.31 s, see BENCH_SF1.md, with the three-pass structure
documented there as irreducible: a one-scan explode variant measured
within noise of the union because Generate breaks whole-stage codegen):

1. A CODEGEN stats scan: count, per-column non-null counts, numeric +
   timestamp min/max. No collect_set here — a single TypedImperative
   aggregate (collect_set) forces the WHOLE operator onto
   ObjectHashAggregate and off whole-stage codegen; splitting the
   aggregates into a codegen pass and a set pass measured 0.58 s vs
   0.94 s fused at the sf1 point. (1 exchange)
2. A SET scan: collect_set for the eight bounded-NDV columns (flags,
   enums, dates, small keys — exact NDV via size()), which also serves
   the STRING min/max as array_min/array_max of the sets: per-row
   UTF8String min/max aggregates measured 0.33 s/column at sf1, while
   the set-derived form is ~free on top of the sets the NDV already
   needs. (1 exchange)
3. The three genuinely high-NDV columns (l_orderkey, l_partkey,
   l_extendedprice) get the 100 TB answer this module's round-4
   docstring only promised: n_distinct is a deterministic PORTABLE
   HyperLogLog estimate (m=256, ~6.5% rsd — the ANALYZE idiom: SQLite
   stat4 samples, Spark ANALYZE uses HLL). The hash is the fast
   integer family (functions/portable.py h60_fast_steps — pure int64
   ops inside codegen, no md5), registers fold by MAX, and the
   estimate is bit-identical in Spark and DuckDB, so the oracle checks
   it EXACTLY. One union of three column-pruned scans feeds one
   (name, register) aggregation: 2 exchanges for all three columns,
   and the shuffle carries only 256 registers per name instead of the
   full distinct value stream an exact count would move. Exact NDV for
   these columns at 6M rows measured 1.2-1.9 s (the value shuffle is
   the floor); the HLL branch removes that shuffle entirely.
4. Assembly: 11 literal rows broadcast-join the 1-row stats, the 1-row
   sets, and the 3-row HLL estimates; per-column slots are picked with
   a CASE over column_name. ORDER BY on 11 rows (coalesce(1) before
   the sort measured 5.4 s — it serializes AQE's independent stage
   scheduling; the tiny range exchange is the right trade).

min/max involve no summation, so doubles are engine-exact without
fixed-point games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query
from litebase_spark.functions.portable import (
    MASK52,
    h60_fast_steps,
    hll_estimate_duck,
    hll_estimate_spark,
)

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
# exact NDV via collect_set inside the set scan. The high-NDV rest get
# the portable-HLL estimate.
_BIG_NDV = ("l_orderkey", "l_partkey", "l_extendedprice")

# hash input per big column, as (spark_expr, duck_expr): BIGINT,
# non-negative, identical values in both engines (prices go through
# the fixed-point cents mapping, round-half-up on exact-2-decimal data)
_BIG_X = {
    "l_orderkey": ("CAST(l_orderkey AS BIGINT)", "CAST(l_orderkey AS BIGINT)"),
    "l_partkey": ("CAST(l_partkey AS BIGINT)", "CAST(l_partkey AS BIGINT)"),
    "l_extendedprice": (
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)",
        "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)",
    ),
}

# rho on the aggregated register minimum, not per row: bit_length is
# monotonic, so MAX over rows of (53 - bit_length(low)) equals
# 53 - bit_length(MIN(low)). Aggregating MIN(h & MASK52) keeps the hot
# aggregate a pure LONG min (codegen); the bin() string allocation —
# measured +0.84 s at sf1 when run per-row over 18M rows — happens on
# the <=768 final register rows only.
_MRHO = (
    "CASE WHEN mlow = 0 THEN 53"
    " ELSE 53 - length(bin(mlow)) END"
)


def _oracle() -> str:
    small = [c for c, _ in _COLS if c not in _BIG_NDV]
    aggs = ["COUNT(*) AS n_rows"]
    rows = []
    for c, kind in _COLS:
        aggs.append(f"COUNT({c}) AS cnt_{c}")
        if c in small:
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
        # clamp the HLL estimate to the non-null count: the profile
        # invariant n_distinct <= n_rows must hold even when the ~6.5%
        # rsd overshoots (both engines clamp identically -> still exact)
        ndv = (
            f"nd_{c}"
            if c in small
            else f"LEAST((SELECT nd_big FROM nd WHERE nd_name = '{c}'),"
            f" cnt_{c})"
        )
        rows.append(
            f"SELECT '{c}' AS column_name, n_rows,"
            f" n_rows - cnt_{c} AS n_null, {ndv} AS n_distinct,"
            f" CAST({min_num} AS DOUBLE) AS min_num,"
            f" CAST({max_num} AS DOUBLE) AS max_num,"
            f" CAST({min_str} AS VARCHAR) AS min_str,"
            f" CAST({max_str} AS VARCHAR) AS max_str FROM a"
        )
    # int tag in the hot aggregation key (hashing a 12-char string per
    # row measurably drags the 18M-row partial agg); mapped back to the
    # column name on the 3 final rows
    nv = "\nUNION ALL ".join(
        f"SELECT {i} AS nd_tag, {_BIG_X[c][1]} AS x FROM lineitem"
        for i, c in enumerate(_BIG_NDV)
    )
    tag_case = (
        "CASE nd_tag "
        + " ".join(
            f"WHEN {i} THEN '{c}'" for i, c in enumerate(_BIG_NDV)
        )
        + " END"
    )
    # chained CTEs for the hash steps (linear, no expression blowup)
    steps = h60_fast_steps("x", "duck")
    step_ctes = []
    prev = "nv"
    carried = {
        "__h1": ["nd_tag", "__h1"],
        "__h2": ["nd_tag", "__h1", "__h2"],
        "__g": ["nd_tag", "__g"],
        "__h3": ["nd_tag", "__g", "__h3"],
        "h": ["nd_tag", "h"],
    }
    keep = ["nd_tag"]
    for i, (alias, expr) in enumerate(steps):
        step_ctes.append(
            f"s{i} AS (SELECT {', '.join(keep)}, {expr} AS {alias} "
            f"FROM {prev})"
        )
        prev = f"s{i}"
        keep = carried[alias]
    return (
        f"WITH nv AS ({nv}),\n"
        + ",\n".join(step_ctes)
        + f""",
reg0 AS (
  SELECT nd_tag, h >> 52 AS idx, MIN(h & {MASK52}) AS mlow
  FROM {prev} GROUP BY nd_tag, idx
), reg AS (
  SELECT nd_tag, idx, {_MRHO} AS mrho FROM reg0
), hagg AS (
  SELECT nd_tag,
         CAST(SUM(1::BIGINT << (53 - mrho)) AS BIGINT) AS sp,
         COUNT(*) AS nr
  FROM reg GROUP BY nd_tag
), nd AS (
  SELECT {tag_case} AS nd_name,
         CAST(FLOOR({hll_estimate_duck('sp', 'nr')}) AS BIGINT) AS nd_big
  FROM hagg
), a AS (SELECT """
        + ", ".join(aggs)
        + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY column_name"
    )


@query(
    "profile_lineitem_stats",
    oracle=_oracle(),
    description="Column profile of lineitem (the ANALYZE statistics "
    "surface as data): per column non-null counts, n_distinct and "
    "min/max (numeric + timestamp ranges as epoch doubles, string "
    "ranges lexicographic) in 5 audited shuffle-exchange nodes — a codegen "
    "stats scan (counts + numeric/ts min/max), a set scan (collect_set "
    "exact NDV for the eight bounded-cardinality columns, which also "
    "yields the string min/max), and ONE shared portable-HLL branch "
    "(m=256, bit-identical estimate in both engines, so oracle-EXACT) "
    "for the three high-NDV keys whose exact distinct-value shuffle is "
    "the 100 TB bottleneck; n_distinct for those three is the "
    "documented ~6.5%-rsd estimate, the ANALYZE idiom (SQLite stat4 "
    "samples, Spark ANALYZE uses HLL). No Expand, no ObjectHashAgg on "
    "the hot path, whole-stage codegen end to end.",
    tags=("profile", "analyze", "quality"),
)
def profile_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    small = [c for c, _ in _COLS if c not in _BIG_NDV]
    str_cols = [c for c, k in _COLS if k == "str"]

    # -- pass 1 (codegen): counts + numeric/ts min/max ------------------
    aggs1 = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in _COLS:
        aggs1.append(F.count(c).alias(f"cnt_{c}"))
        if kind == "ts":
            aggs1.append(
                F.unix_timestamp(F.min(c)).cast("double").alias(f"mn_{c}")
            )
            aggs1.append(
                F.unix_timestamp(F.max(c)).cast("double").alias(f"mx_{c}")
            )
        elif kind == "num":
            aggs1.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs1.append(F.max(c).cast("double").alias(f"mx_{c}"))
    stats = li.agg(*aggs1)

    # -- pass 2 (sets): exact NDV for bounded columns + string ranges ---
    aggs2 = []
    for c in small:
        aggs2.append(F.collect_set(c).alias(f"set_{c}"))
    sets = li.agg(*aggs2).select(
        *[
            F.size(f"set_{c}").cast("long").alias(f"nd_{c}")
            for c in small
        ],
        *[
            e
            for c in str_cols
            for e in (
                F.array_min(f"set_{c}").alias(f"mn_{c}"),
                F.array_max(f"set_{c}").alias(f"mx_{c}"),
            )
        ],
    )

    # -- pass 3: ONE portable-HLL branch for all high-NDV columns -------
    # ONE scan + explode (r14): the r5 receipt had the union of 3
    # column-pruned scans within noise of this shape because Generate
    # broke whole-stage codegen then; re-measured on Spark 4 at the
    # x100m point the explode wins every interleaved round (2.8-3.0 s
    # vs 3.7-4.6 s, identical rows asserted) — one pass over the table
    # instead of three now beats the codegen break.
    arms = ", ".join(
        f"struct({i} AS nd_tag, {_BIG_X[c][0]} AS x)"
        for i, c in enumerate(_BIG_NDV)
    )
    vals = li.select(
        F.explode(F.expr(f"array({arms})")).alias("s")
    ).select(
        F.col("s.nd_tag").alias("nd_tag"), F.col("s.x").alias("x")
    )
    hh = vals
    for alias, expr in h60_fast_steps("x", "spark"):
        hh = hh.withColumn(alias, F.expr(expr))
    reg = (
        hh.select(
            "nd_tag",
            F.expr("shiftrightunsigned(h, 52)").alias("idx"),
            F.expr(f"h & {MASK52}").alias("low"),
        )
        .groupBy("nd_tag", "idx")
        .agg(F.min("low").alias("mlow"))
        .select("nd_tag", "idx", F.expr(_MRHO).alias("mrho"))
    )
    tag_case = (
        "CASE nd_tag "
        + " ".join(
            f"WHEN {i} THEN '{c}'" for i, c in enumerate(_BIG_NDV)
        )
        + " END"
    )
    nd = (
        reg.groupBy("nd_tag")
        .agg(
            F.sum(F.expr("shiftleft(1L, 53 - mrho)")).alias("sp"),
            F.count(F.lit(1)).alias("nr"),
        )
        .select(
            F.expr(tag_case).alias("nd_name"),
            F.floor(F.expr(hll_estimate_spark("sp", "nr")))
            .cast("long")
            .alias("nd_big"),
        )
    )

    # -- assemble: 11 literal rows x broadcast stats/sets/nd ------------
    names = spark.createDataFrame(
        [(c,) for c, _ in _COLS], "column_name string"
    )
    joined = (
        names.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(sets))
        .join(
            F.broadcast(nd),
            F.col("column_name") == F.col("nd_name"),
            "left",
        )
    )

    def pick(prefix: str, cols, cast_to: str):
        expr = F.lit(None)
        for c in cols:
            expr = F.when(
                F.col("column_name") == c, F.col(f"{prefix}_{c}")
            ).otherwise(expr)
        return expr.cast(cast_to)

    n_null = F.lit(None)
    n_distinct = F.lit(None)
    for c, _ in _COLS:
        n_null = F.when(
            F.col("column_name") == c,
            F.col("n_rows") - F.col(f"cnt_{c}"),
        ).otherwise(n_null)
        if c in small:
            nd_c = F.col(f"nd_{c}")
        else:
            # clamp the HLL estimate to the non-null count (profile
            # invariant n_distinct <= n_rows; mirrored in the oracle)
            nd_c = F.least(F.col("nd_big"), F.col(f"cnt_{c}"))
        n_distinct = F.when(
            F.col("column_name") == c, nd_c
        ).otherwise(n_distinct)

    numts = [c for c, k in _COLS if k in ("num", "ts")]
    return joined.select(
        "column_name",
        "n_rows",
        n_null.cast("long").alias("n_null"),
        n_distinct.cast("long").alias("n_distinct"),
        pick("mn", numts, "double").alias("min_num"),
        pick("mx", numts, "double").alias("max_num"),
        pick("mn", str_cols, "string").alias("min_str"),
        pick("mx", str_cols, "string").alias("max_str"),
    ).orderBy("column_name")
