"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over litebase_spark's query catalog: every operator declared
in SURVEY.md §2 registers a named query (Spark builder + DuckDB oracle
SQL) in ``litebase_spark.catalog.REGISTRY``; this module re-exports them
in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import litebase_spark.operators  # noqa: F401  (import registers all queries)
from litebase_spark.catalog import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return REGISTRY["q1_pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def make(name: str):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return REGISTRY[name].builder(spark, sf_dir)

        run.__name__ = f"query_{name}"
        run.__doc__ = REGISTRY[name].description
        return run

    return {name: make(name) for name in sorted(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    operators (driver records a rows-only check for those)."""
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }
