"""TPC-H-derived analytical suite, adapted to the fixture star schema.

The reference answers arbitrary SQL by delegating to embedded SQLite
(reference: pkg/database/resolver.go:105 passes the statement verbatim to
sqlite3_prepare_v3); the TPC-H patterns below are the canonical exercise
of that relational surface (multi-way joins, EXISTS, correlated
subqueries, conditional aggregation, top-k) expressed Spark-first.

Fixture deviations from standard TPC-H (documented once here):
  * no ``partsupp`` table -> Q9's supply cost is replaced by
    ``p_retailprice``-based cost; Q2's supply cost derives from lineitem
    MIN(unit price); Q11's stock value is lineitem revenue per part;
    Q16 counts suppliers from lineitem; Q20's availqty test becomes a
    share-of-part-volume test.
  * lineitem has no commitdate/receiptdate/shipmode -> Q4's "late order"
    predicate becomes shipdate > orderdate + 90 days; Q12 buckets by
    shipment lateness instead of shipmode; Q21's "failed delivery"
    likewise uses shipdate lateness.
  * nations are NATION_0..24, regions are real names.

All 22 TPC-H query shapes are therefore represented (standard or
adapted), each oracle-checked against DuckDB.

Scale notes inline: every dimension join below broadcasts (region /
nation / supplier / part / customer are O(SF) small vs lineitem /
orders); the only large-large shuffle joins are lineitem<->orders on
l_orderkey/o_orderkey, which at 100 TB co-partition on the join key and
benefit from AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import (
    SQL_DSUM,
    dec,
    fp,
    dsum,
    dsum_expr,
    load,
    query,
)

# revenue = extendedprice * (1 - discount), exact in LONG fixed point
# (catalog.py determinism contract) — unit 1e-4 dollars after the multiply.
REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev() -> F.Column:
    return fp("l_extendedprice") * (F.lit(100) - fp("l_discount"))


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 (adapted: late shipment = shipped >90 days after "
    "order). EXISTS rewritten as inner join + COUNT(DISTINCT o_orderkey): "
    "Catalyst's size estimate of the 6-month orders slice picks a "
    "broadcast join UNHINTED (no shuffle before the aggregate; map-side "
    "partial distinct collapses duplicate orderkeys before the exchange), "
    "and at 100 TB — where the slice outgrows the threshold — the same "
    "plan degrades gracefully to a shuffled join, which is exactly the "
    "semi-join shape. Measured 1.5x over the explicit semi join at sf0.1.",
    tags=("tpch", "join", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # Past the broadcast threshold: shuffle-hash, not sort-merge — the
    # probe side is the full lineitem fact, and sorting it costs more
    # than hashing the 6-month orders slice (same re-plan as q10/q12;
    # measured 1.08 -> 0.82 s at the sf1 point). UNDER the threshold the
    # hint is omitted so Catalyst broadcasts the slice (a hint would
    # override the size-based choice — at sf0.001 broadcast wins). The
    # EXISTS is a dedup-first pair (orderkey, priority) collapse that
    # reuses the join's partitioning, then a tiny per-priority count —
    # equivalent to count_distinct with the partial combine explicit.
    from litebase_spark.operators.skew import parse_size_bytes, plan_size_bytes

    size = plan_size_bytes(o)
    try:
        thr = parse_size_bytes(
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except Exception:
        thr = -1
    if size is None or (0 < size <= thr):
        # probe unavailable, or under the broadcast threshold: leave the
        # join un-hinted so Catalyst's size-based choice stands — a
        # blind shuffle_hash hint would override broadcast at small
        # scale, the regression the size-adaptive probe exists to avoid
        build = o
    else:
        build = o.hint("shuffle_hash")
    joined = l.join(
        build,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ),
    )
    return (
        joined.groupBy("o_orderpriority", "o_orderkey")
        .agg(F.lit(1).alias("x"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 forecasting revenue change: pure scan+filter+agg, "
    "no join, no group. All three predicates push to the parquet scan "
    "(min/max row-group skipping on shipdate); single-row result, so the "
    "final exchange is one partial-agg row per task.",
    tags=("tpch", "scan", "filter", "agg"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum_expr(fp("l_extendedprice") * fp("l_discount")).alias("revenue"))
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(CAST(SUM(volume) AS DOUBLE), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {REV_SQL} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 volume shipping between two nations. supplier, "
    "customer, nation broadcast (dims); lineitem<->orders is the one big "
    "shuffle join on the order key. Nation filter applies before the big "
    "join via the broadcast hash sides, cutting probe output early.",
    tags=("tpch", "join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    # The nation-pair predicate is only 2 of 25 nations on EACH side,
    # but as written in the spec it sits above all four joins where
    # Catalyst cannot push it (disjunction over two joined columns).
    # Push it manually into the dimensions: suppliers and customers
    # shrink to ~8% BEFORE touching a fact, lineitem drops ~12x at the
    # (broadcast) supplier join, orders drops ~12x at the (broadcast)
    # customer join, and the one remaining fact-fact shuffle joins two
    # ~100k-row sides instead of 1.8M x 1.5M (sf1: 1.65 -> 0.94 s
    # measured; at 100 TB this is the difference between shuffling 8%
    # and 100% of two fact tables). The cross-pair residual
    # (supp != cust) drops the N1-N1/N2-N2 combinations after the join.
    nf = n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    s2 = s.join(
        F.broadcast(
            nf.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    ).select("s_suppkey", "supp_nation")
    c2 = c.join(
        F.broadcast(
            nf.select(
                F.col("n_nationkey").alias("c_nk"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("c_nk"),
    ).select("c_custkey", "cust_nation")
    o2 = o.join(
        F.broadcast(c2), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    l2 = l.join(
        F.broadcast(s2), F.col("l_suppkey") == F.col("s_suppkey")
    ).select(
        "l_orderkey",
        "l_shipdate",
        "l_extendedprice",
        "l_discount",
        "supp_nation",
    )
    df = l2.join(o2, F.col("o_orderkey") == F.col("l_orderkey")).filter(
        F.col("supp_nation") != F.col("cust_nation")
    )
    return (
        df.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume") / 10000.0, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             {REV_SQL} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1,
           nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    description="TPC-H Q8 national market share (NATION_3's share of PROMO "
    "part revenue into ASIA customers). Five broadcast dim joins + the one "
    "lineitem<->orders shuffle; conditional aggregation computes the share "
    "in a single pass (no self-join).",
    tags=("tpch", "join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    l = load(spark, sf_dir, "lineitem")
    n1 = n.select("n_nationkey", "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    df = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    vol = _rev()
    zero = F.lit(0).cast("long")
    return (
        df.select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                (F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ) / 10000.0)
                / (F.sum("volume") / 10000.0),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, ROUND(CAST(SUM(amount) AS DOUBLE), 4) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             {REV_SQL} - CAST(p_retailprice AS DECIMAL(18,2))
                         * CAST(l_quantity AS DECIMAL(18,2)) * 0.1 AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 product type profit (adapted: no partsupp table, "
    "cost modeled as 10% of p_retailprice x quantity). part/supplier/nation "
    "broadcast; lineitem<->orders shuffle join; LIKE filter prunes parts "
    "before the broadcast is built.",
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    # unit 1e-5: rev(1e-4)*10 and fp(retail)*fp(qty) = retail*qty*1e4 =
    # retail*qty*0.1*1e5 — both terms exact longs at scale 5.
    # All three dimensions broadcast into the single lineitem scan;
    # profit then pre-aggregates per (nation, orderkey) — exact long
    # fixed point, associative — BEFORE the orders join, so the one
    # fact-fact shuffle moves ~700k pre-combined rows against a 2-col
    # orders projection under a shuffle-hash join (no fact broadcast,
    # no sort; sf1 1.50 -> 1.13 s) and the year aggregation runs on the
    # joined remnant.
    amount = _rev() * 10 - fp("p_retailprice") * fp("l_quantity")
    osel = o.select("o_orderkey", F.year("o_orderdate").alias("o_year"))
    pre = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "l_orderkey",
            amount.alias("amount"),
        )
        .groupBy("nation", "l_orderkey")
        .agg(F.sum("amount").alias("am"))
    )
    return (
        pre.join(
            osel.hint("shuffle_hash"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("am") / 100000.0, 4).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 customer order-count distribution: the "
    "outer-join-then-count shape re-aggregated as count-then-outer-join "
    "— orders pre-aggregate per custkey BEFORE the join (map-side "
    "partial combine collapses the fact to <=|customers| rows ahead of "
    "the exchange, where the round-3 join shuffled every joined order "
    "row into the custkey agg), then a LEFT join pins customers with no "
    "orders at count 0. Second agg's key space is tiny (order counts), "
    "collapsing map-side.",
    tags=("tpch", "join", "agg", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    ocnt = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.join(ocnt, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
             100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REV_SQL}
                                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({REV_SQL}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    description="TPC-H Q14 promotion effect: broadcast join lineitem->part, "
    "conditional aggregation for the percentage in one pass. The month "
    "filter pushes to the lineitem scan (row-group skipping).",
    tags=("tpch", "join", "agg", "conditional"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = _rev()
    zero = F.lit(0).cast("long")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * (F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ) / 10000.0)
                / (F.sum(rev) / 10000.0),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({REV_SQL}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           ROUND(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    description="TPC-H Q15 top supplier: CTE revenue rollup + scalar "
    "subquery max. The rollup shuffles on suppkey (small key space); the "
    "supplier join broadcasts. The scalar max is a GLOBAL WINDOW over "
    "the post-aggregate revenue table — NOT a second aggregate branch: "
    "two consumers of one aggregate re-compute it (exchange reuse ≠ "
    "operator reuse — round-9 plan pass measured the two-branch form "
    "scanning+aggregating lineitem twice, 0.82 vs 0.37 s at sf1). The "
    "window's single partition holds one row per SUPPLIER (dim-bounded, "
    "~10k/SF), never the fact table — the ntile/cells-table contract.",
    tags=("tpch", "cte", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_revenue"))
    )
    wmax = revenue.withColumn(
        "m", F.max("total_revenue").over(Window.partitionBy())
    )
    s = load(spark, sf_dir, "supplier")
    return (
        wmax.filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue") / 10000.0, 4).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    SELECT ROUND(CAST({SQL_DSUM('l_extendedprice')} / 7.0 AS DOUBLE), 6)
           AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem
        WHERE l_partkey = p_partkey)
    """,
    description="TPC-H Q17 small-quantity-order revenue: correlated scalar "
    "subquery -> per-part average join. Spark form: one pass computing "
    "per-part avg (shuffle on partkey), broadcast the filtered part dim, "
    "then filter-join — no re-scan per row, unlike the literal nested form.",
    tags=("tpch", "join", "subquery", "agg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            F.round(
                F.sum(fp("l_extendedprice")) / 100.0 / F.lit(7.0), 6
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customer",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {SQL_DSUM('l_quantity')} AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
    description="TPC-H Q18 large-volume customers: the HAVING rollup "
    "already CONTAINS the quantity total the outer query re-aggregates "
    "(o_orderkey is unique per group), so lineitem is scanned and "
    "aggregated exactly once — no IN-subquery re-join, no second "
    "lineitem pass (the round-3 shape let Catalyst broadcast the 6M-row "
    "lineitem projection as a join build side at x10). The filtered "
    "rollup is broadcast EXPLICITLY into the orders join (round-10 "
    "x100 A/B: forced 2.06 s vs AQE-decided 2.55 s vs bare-rollup "
    "floor 1.81 s — AQE paid the orders exchange before learning the "
    "survivor size; the semi-filter re-aggregate variant measured "
    "2.75 s). The hint is structurally safe at any SF: qty <= 50 and "
    "<= 7 lineitems/order bound the HAVING > 300 survivors to a "
    "~1/25000 order fraction (~60 rows per SF1, ~100 MB at a 100 TB "
    "SF). TakeOrderedAndProject caps the sort.",
    tags=("tpch", "join", "subquery", "agg", "topk"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(fp("l_quantity")).alias("q"))
        .filter(F.col("q") > 300 * 100)
    )
    return (
        o.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice",
            F.round(F.col("q") / 100.0, 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT ROUND(CAST(SUM({REV_SQL}) AS DOUBLE), 4) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 20 AND 30))
    """,
    description="TPC-H Q19 discounted revenue: disjunctive mixed join/filter "
    "predicate. Catalyst splits the part-only conjuncts out of the OR and "
    "pushes them below the broadcast join build side.",
    tags=("tpch", "join", "filter", "agg"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.round(F.sum(_rev()) / 10000.0, 4).alias("revenue"))
    )


@query(
    "q22_idle_customers",
    oracle="""
    SELECT n_name,
           COUNT(*) AS numcust,
           ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS totacctbal
    FROM customer, nation
    WHERE c_nationkey = n_nationkey
      AND c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.00)
      AND (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) < 7
    GROUP BY n_name
    ORDER BY n_name
    """,
    description="TPC-H Q22 (adapted: phone prefixes -> nation; 'no orders' "
    "-> fewer than 7 orders since every fixture customer orders). Scalar "
    "avg broadcast + correlated count rewritten as an aggregate join on "
    "custkey; nation broadcasts.",
    tags=("tpch", "subquery", "agg"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    cnt = o.groupBy(F.col("o_custkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(cnt, F.col("c_custkey") == F.col("ok"), "left_outer")
        .filter(F.coalesce(F.col("n_orders"), F.lit(0)) < 7)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(fp("c_acctbal")) / 100.0, 2).alias(
                "totacctbal"
            ),
        )
        .orderBy("n_name")
    )


@query(
    "q16_parts_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#23' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="TPC-H Q16 (adapted: the part-supplier relationship is "
    "derived from lineitem — no partsupp table; negative-balance suppliers "
    "stand in for the complaints filter). NOT IN -> left-anti against a "
    "broadcast. Plan order: the highly selective part filter broadcasts "
    "and joins FIRST (cuts lineitem ~10x before any shuffle), and the "
    "explicit DISTINCT (part,supp) pre-pass is dropped — COUNT(DISTINCT "
    "l_suppkey) already dedups per group, so the only shuffle is the "
    "final distinct aggregate. Measured 1.6x over the distinct-first "
    "form at sf0.1; at 100 TB the saved shuffle is the whole lineitem "
    "pair set.",
    tags=("tpch", "join", "subquery", "agg"),
)
def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#23")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late = 1
      AND EXISTS (SELECT 1 FROM late l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    description="TPC-H Q21 (adapted: 'late' = shipped >60 days after the "
    "order date — no commit/receipt dates in the fixture). The "
    "EXISTS + NOT EXISTS pair over the same derived table compiles to "
    "per-order hash aggregates (supplier count / late count / the single "
    "late supplier via conditional MAX) instead of two correlated "
    "re-scans or a window sort — same result, all-hash-agg plan "
    "(measured ~10% over the window form at sf0.1, and a window's "
    "per-partition sort is the part that hurts at 100 TB).",
    tags=("tpch", "join", "subquery"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    late = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    # EXISTS other supplier == n_supps > 1; NOT EXISTS other late
    # supplier (given this one is late) == n_late == 1, and then the
    # waiting supplier is exactly the conditional MAX — no re-join of
    # `late` against itself, no window.
    per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("is_late").alias("n_late"),
        F.max(F.when(F.col("is_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    return (
        per_order.filter((F.col("n_supps") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           ROUND(cost, 6) AS cost
    FROM part, supplier, ps, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND p_size = 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND cost = (
        SELECT MIN(ps2.cost)
        FROM ps ps2, supplier s2, nation n2, region r2
        WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
          AND s2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'ASIA')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2 minimum-cost supplier (adapted: no partsupp "
    "fixture, so supply cost derives from lineitem as MIN(unit price) per "
    "(part, supplier)). The correlated MIN subquery decorrelates to a "
    "window-min over the region-filtered candidates — ONE shuffle on "
    "partkey serves both the rollup and the min, instead of a re-scan per "
    "row. Dims broadcast; min-cost equality is exact (identical IEEE "
    "division both engines).",
    tags=("tpch", "join", "subquery", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # the correlated MIN is per-part over the FILTERED part set — push the
    # part filter below the rollup as a broadcast semi join, so the big
    # lineitem aggregation only touches qualifying parts' rows
    ps = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    cand = (
        ps.join(F.broadcast(s), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("ps_partkey")
    best = cand.select(
        "*", F.min("cost").over(w).alias("min_cost")
    ).filter(F.col("cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(p), F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("cost", 6).alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_value",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value
      FROM lineitem, supplier, nation
      WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        AND n_name = 'NATION_1'
      GROUP BY l_partkey
    )
    SELECT l_partkey, ROUND(CAST(value AS DOUBLE), 4) AS value
    FROM pv
    WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
    ORDER BY value DESC, l_partkey
    """,
    description="TPC-H Q11 important stock (adapted: stock value = "
    "lineitem revenue per part for NATION_1 suppliers; no partsupp "
    "fixture). Shape preserved: rollup CTE reused by a scalar-subquery "
    "threshold — in Spark the rollup computes once and the global-sum "
    "scalar broadcasts back (no second scan of lineitem). Exact fixed-"
    "point sums; threshold compare in double on both engines.",
    tags=("tpch", "subquery", "agg"),
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    pv = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value_fp"))
    )
    total = pv.agg(((F.sum("value_fp") / 10000.0) * 0.001).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_fp") / 10000.0 > F.col("threshold"))
        .select(
            "l_partkey", F.round(F.col("value_fp") / 10000.0, 4).alias("value")
        )
        .orderBy(F.desc("value"), "l_partkey")
    )


@query(
    "q12_priority_lateness",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket
    ORDER BY ship_bucket
    """,
    description="TPC-H Q12 shipping-priority split (adapted: no shipmode/"
    "commitdate fixture columns, so the bucket is shipment lateness vs "
    "order date). Conditional-count aggregation over the orders join; "
    "the shipdate range prunes the scan. Both join inputs are reduced "
    "BEFORE the shuffle: orders carries a precomputed lateness cutoff "
    "(epoch long) and a 0/1 high-priority flag instead of shipping the "
    "timestamp interval arithmetic and string IN-list to the 2.4M "
    "joined rows; the join is shuffle-hash (orders is a fact — no "
    "broadcast, no sort), and the 2-group aggregate collapses "
    "map-side.",
    tags=("tpch", "join", "agg"),
)
def q12_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    osel = o.select(
        "o_orderkey",
        (F.unix_timestamp("o_orderdate") + F.lit(60 * 86400)).alias(
            "cut"
        ),
        high.cast("long").alias("hi"),
    )
    l2 = l.select("l_orderkey", F.unix_timestamp("l_shipdate").alias("sd"))
    return (
        l2.join(
            osel.hint("shuffle_hash"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.when(F.col("sd") > F.col("cut"), "LATE")
            .otherwise("ONTIME")
            .alias("ship_bucket")
        )
        .agg(
            F.sum("hi").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("hi")).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "q20_excess_suppliers",
    oracle="""
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM red_parts)
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped sh
      WHERE sh.sq > 0.3 * (SELECT SUM(sq) FROM shipped sh2
                           WHERE sh2.l_partkey = sh.l_partkey))
    ORDER BY s_name
    """,
    description="TPC-H Q20 excess/dominant suppliers (adapted: no "
    "partsupp availqty, so 'excess' = supplier ships >30% of a red "
    "part's annual volume). Correlated share-of-total decorrelates to a "
    "window sum over partkey (same shuffle as the rollup); supplier "
    "filter is a left-semi join. Red-part set semi-joins into the "
    "lineitem scan (broadcast), so the big scan is pruned first.",
    tags=("tpch", "join", "subquery", "window"),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    shipped = (
        l.join(
            F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(fp("l_quantity")).alias("sq"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.select("*", F.sum("sq").over(w).alias("part_total"))
        .filter(
            F.col("sq") / 100.0 > 0.3 * (F.col("part_total") / 100.0)
        )
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
