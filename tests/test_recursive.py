"""Recursive CTE fixpoint helper tests (SURVEY §7.2 custom row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from litebase_spark.plans.recursive import recursive_cte


def test_integer_series(spark):
    # WITH RECURSIVE t(n) AS (SELECT 1 UNION SELECT n+1 FROM t WHERE n<20)
    base = spark.range(1, 2).select(F.col("id").cast("int").alias("n"))
    out = recursive_cte(
        base,
        lambda f: f.filter(F.col("n") < 20).select((F.col("n") + 1).alias("n")),
        max_iterations=25,
    )
    got = sorted(r.n for r in out.collect())
    assert got == list(range(1, 21))


def test_transitive_closure_dedup(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src int, dst int"
    )
    base = spark.createDataFrame([(0,)], "n int")
    out = recursive_cte(
        base,
        lambda f: f.join(edges, f.n == edges.src).select(
            F.col("dst").alias("n")
        ),
        max_iterations=10,
    )
    assert sorted(r.n for r in out.collect()) == [0, 1, 2, 3]  # cycle handled


def test_depth_cap_raises(spark):
    base = spark.range(1).select(F.col("id").cast("int").alias("n"))
    with pytest.raises(RecursionError):
        recursive_cte(
            base,
            lambda f: f.select((F.col("n") + 1).alias("n")),  # never converges
            max_iterations=5,
        )


def test_union_all_mode(spark):
    base = spark.range(1).select(F.lit(1).alias("n"))
    out = recursive_cte(
        base,
        lambda f: f.select((F.col("n") + 1).alias("n")).filter(F.col("n") <= 3),
        max_iterations=10,
        distinct=False,
    )
    assert sorted(r.n for r in out.collect()) == [1, 2, 3]
