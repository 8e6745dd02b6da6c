"""Recursive CTE coverage (SURVEY §2.B CTEs: WITH RECURSIVE).

Spark 3.x/4.x has no recursive CTE; litebase_spark.plans.recursive
provides the iterative fixpoint. The catalog query runs a transitive
closure over an edge relation derived from nation (edges n -> n+7 and
n -> n+11 where the target exists), reachability from node 0 — the same
query the DuckDB oracle expresses natively with WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query, register_views
from litebase_spark.plans.recursive import recursive_cte


@query(
    "cte_recursive",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT n_nationkey AS src, n_nationkey + 7 AS dst FROM nation
        WHERE n_nationkey + 7 <= (SELECT MAX(n_nationkey) FROM nation)
        UNION ALL
        SELECT n_nationkey, n_nationkey + 11 FROM nation
        WHERE n_nationkey + 11 <= (SELECT MAX(n_nationkey) FROM nation)
    ),
    reach(n) AS (
        SELECT 0
        UNION
        SELECT e.dst FROM edges e JOIN reach r ON e.src = r.n
    )
    SELECT r.n AS nationkey, nt.n_name
    FROM reach r JOIN nation nt ON nt.n_nationkey = r.n
    """,
    description="WITH RECURSIVE analog: iterative DataFrame fixpoint "
    "(semi-naive, UNION-distinct, depth-capped — the CanRecursive "
    "permission gate analog, reference "
    "pkg/database/database_connection.go:662-663).",
    tags=("cte", "recursive"),
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    max_key = n.agg(F.max("n_nationkey").alias("mk"))
    edges = (
        n.crossJoin(F.broadcast(max_key))
        .select(
            F.col("n_nationkey").alias("src"),
            F.explode(
                F.array(F.col("n_nationkey") + 7, F.col("n_nationkey") + 11)
            ).alias("dst"),
            "mk",
        )
        .filter(F.col("dst") <= F.col("mk"))
        .select("src", "dst")
    )
    base = spark.range(1).select(F.lit(0).cast("int").alias("n"))
    closure = recursive_cte(
        base,
        lambda frontier: frontier.join(
            edges, frontier.n == edges.src
        ).select(F.col("dst").alias("n")),
        max_iterations=30,
    )
    return closure.join(n, closure.n == n.n_nationkey).select(
        F.col("n").alias("nationkey").cast("int"), "n_name"
    )


@query(
    "cte_recursive_sql",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT (SELECT DATE_TRUNC('month', MIN(o_orderdate)) FROM orders)
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < (SELECT DATE_TRUNC('month', MAX(o_orderdate)) FROM orders)
    )
    SELECT CAST(m AS DATE) AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON DATE_TRUNC('month', o_orderdate) = m
    GROUP BY m ORDER BY m
    """,
    description="WITH RECURSIVE executed NATIVELY by Spark SQL (4.x "
    "implements recursive CTEs — SPARK-24497), closing the dialect gap "
    "the DataFrame fixpoint helper (plans/recursive.py) covers on older "
    "Sparks. Densifies the order-date calendar (months with zero orders "
    "included) — the classic gaps-filling recursion; the reference gates "
    "the same surface behind CanRecursive "
    "(pkg/database/database_connection.go:662-663).",
    tags=("cte", "recursive"),
)
def cte_recursive_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    # bounds resolved once up front: a scalar subquery inside the
    # recursion condition re-evaluates per iteration (one job each) —
    # 80 iterations x 2 subqueries is pure overhead
    lo, hi = spark.sql(
        "SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,"
        "       DATE_TRUNC('month', MAX(o_orderdate)) AS hi FROM orders"
    ).collect()[0]
    return spark.sql(
        f"""
        WITH RECURSIVE months(m) AS (
          SELECT TIMESTAMP '{lo}'
          UNION ALL
          SELECT m + INTERVAL 1 MONTH FROM months
          WHERE m < TIMESTAMP '{hi}'
        )
        SELECT CAST(m AS DATE) AS month_start, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders ON DATE_TRUNC('month', o_orderdate) = m
        GROUP BY m ORDER BY m
        """
    )
