"""SparkSession builder tuned for the engine.

Scale stance: these configs are chosen for correctness locally and good
behavior on a real cluster — AQE handles runtime re-planning (skew joins,
partition coalescing), broadcast threshold keeps dimension joins
shuffle-free, and shuffle partitions default to a value that AQE coalesces
down on small inputs but that spreads on large ones.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _default_shuffle_partitions(cpus: str, env_override: str | None) -> int:
    """Default shuffle-partition count: MATCH parallelism, derived from
    the core-count env instead of a constant — the bench harness is also
    run at lower core counts to measure scaling, and a count tuned to
    one machine's cores is exactly the local-mode-constant anti-pattern.
    AQE coalesces below this on small shuffles, so it is an upper bound,
    not a tuning knob (measured neutral at sf0.1: 8 cores 37.5 s derived
    vs 37.8 s at the old fixed 32). Cluster deployments should override
    via $SPARK_GRAFT_SHUFFLE_PARTITIONS or the arg (rule of thumb: 2-3x
    total executor cores, or rely on AQE)."""
    if env_override is not None:
        try:
            return int(env_override)
        except ValueError:
            raise ValueError(
                "$SPARK_GRAFT_SHUFFLE_PARTITIONS must be an integer, "
                f"got {env_override!r}"
            ) from None
    # A local[N] core spec can legally be 'N,maxRetries' — parse the
    # leading integer so shuffle partitions stay coupled to the actual
    # parallelism instead of silently falling back to os.cpu_count().
    m = re.match(r"(\d+)", cpus)
    if m:
        return int(m.group(1))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "litebase_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if unset).
    On a real cluster, pass ``master=None`` with a pre-configured
    spark-submit environment; every config here is cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _default_shuffle_partitions(
            cpus, os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        )

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic timestamp semantics vs the DuckDB oracle: everything
        # is UTC. The fixtures carry naive timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, dynamic join-strategy switch. Essential at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Dimension tables (region/nation/customer/supplier/part — all
        # well under 3 MiB even at the x10 bench point) broadcast; FACT
        # tables must not: the broadcast BUILD (driver collect + one
        # hash relation per executor) mis-prices row count, and
        # broadcasting a 1.5M-row orders slice measured 1.37 s vs
        # 0.66 s for the shuffle join it displaced (q12, sf1 replica) —
        # and at cluster scale a fact never fits anyway, so the shuffle
        # plan is also the one that survives 100x. 8 MiB keeps every
        # true dim broadcast at every measured SF while pricing fact
        # slices (orders pruned ~12 MiB at the sf1 point) out.
        .config("spark.sql.autoBroadcastJoinThreshold", str(8 * 1024 * 1024))
        # Arrow for any pandas_udf / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet: vectorized reader + aggregate pushdown (min/max/count
        # straight from footers when possible).
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark cannot read
        # natively; read as long and convert (see catalog.load).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MiB split target — the same role as the reference's 16 MiB
        # range files (reference: pkg/storage/range.go:23), sized for
        # object-store throughput instead of page I/O.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
