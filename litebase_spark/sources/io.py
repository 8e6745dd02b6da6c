"""Source/sink connectors: format-agnostic table IO.

The reference's "sources" are its bespoke storage stack (VFS -> WAL ->
page logs -> ranges -> tiered S3; reference: pkg/vfs/vfs.go:245-634,
pkg/storage/tiered_file_system_driver.go:30-60) — machinery Spark
replaces wholesale with FileSystem connectors. What remains engine
surface is the FORMAT layer: reading and writing tables as
parquet / csv / json / orc with explicit schemas, partitioned layouts,
and write modes.

Scale contract:
  * Explicit schemas for csv/json (inference = a full extra scan at
    100 TB).
  * Partitioned writes land one directory per key value -> partition
    pruning serves point/range queries without an index (the Spark
    answer to the reference's B-tree index scan, SURVEY §2.B scans).
  * ``maxRecordsPerFile`` / pre-write repartition keep file sizes near
    the 128 MiB sweet spot; never coalesce(1) at scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")

# Scale-safe defaults per format (inference off; csv with header so
# round-trips keep column names).
_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "false"},
    "json": {},
    "parquet": {},
    "orc": {},
}
_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {"compression": "snappy"},
    "orc": {},
}


@dataclass
class TableSource:
    """A named external table: path + format + options (+ schema for
    text formats)."""

    name: str
    path: str
    format: str = "parquet"
    schema: StructType | str | None = None
    options: dict[str, str] = field(default_factory=dict)


def read_table(spark: SparkSession, src: TableSource) -> DataFrame:
    if src.format not in FORMATS:
        raise ValueError(f"unsupported format {src.format!r}; one of {FORMATS}")
    reader = spark.read.format(src.format)
    opts = {**_READ_DEFAULTS[src.format], **src.options}
    if opts:
        reader = reader.options(**opts)
    if src.schema is not None:
        reader = reader.schema(src.schema)
    elif src.format in ("csv", "json"):
        raise ValueError(
            f"{src.format} source {src.name!r} requires an explicit schema "
            "(inference is a full extra pass at scale)"
        )
    return reader.load(src.path)


def write_table(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> None:
    if format not in FORMATS:
        raise ValueError(f"unsupported format {format!r}; one of {FORMATS}")
    writer = df.write.format(format).mode(mode)
    opts = {**_WRITE_DEFAULTS[format], **(options or {})}
    if opts:
        writer = writer.options(**opts)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


class SourceRegistry:
    """Maps table names to external sources and exposes them to SQL —
    the engine-facing analog of the reference's per-database file
    catalog (databases/branches resolve to storage paths there;
    format+path here)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._sources: dict[str, TableSource] = {}

    def register(self, src: TableSource) -> DataFrame:
        df = read_table(self.spark, src)
        df.createOrReplaceTempView(src.name)
        self._sources[src.name] = src
        return df

    def get(self, name: str) -> TableSource:
        return self._sources[name]

    def names(self) -> list[str]:
        return sorted(self._sources)


def compact_table(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """OPTIMIZE/compaction analog of the reference's VACUUM (blocked from
    its query API and run as maintenance instead — reference:
    pkg/database/resolver.go:100-103, pkg/sqlite3/connection.go:370-384):
    rewrite a small-files table into ~target-sized files. Returns
    (files_before, files_after).

    The rewrite is a distributed job (repartition by computed file
    count); localCheckpoint breaks lineage so the overwrite of the SAME
    path is safe. On Delta this is `OPTIMIZE` and on Iceberg
    `rewrite_data_files` — swap points, same contract."""
    import math

    sc = spark.sparkContext
    jvm_path = sc._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = jvm_path.getFileSystem(sc._jsc.hadoopConfiguration())
    files = [
        f
        for f in fs.listStatus(jvm_path)
        if f.getPath().getName().endswith(f".{format}")
        or f.getPath().getName().startswith("part-")
    ]
    files_before = len(files)
    total_bytes = sum(f.getLen() for f in files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.format(format).load(path).repartition(n_out)
    df.localCheckpoint(eager=True).write.format(format).mode(
        "overwrite"
    ).save(path)
    files_after = len(
        [
            f
            for f in fs.listStatus(jvm_path)
            if f.getPath().getName().startswith("part-")
        ]
    )
    return files_before, files_after


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a BUCKETED managed table: rows hash-partitioned into
    `n_buckets` files per partition by `bucket_col`, optionally sorted
    within buckets.

    This is the Spark answer to 'pre-partition the fact tables on the
    join key': two tables bucketed the same way join with ZERO exchange
    (and with sortBy, zero sort) — the shuffle that normally dominates a
    100 TB fact-fact join happens once at write time and is amortized
    over every subsequent join/aggregation on that key. The reference
    has no analog (single-node B-tree; SURVEY §2.B scans).
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_cols: tuple[str, str] | None = None,
    format: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """OPTIMIZE [ZORDER BY (a, b)] analog: compact small files to
    ~target size and, when zorder_cols is given, cluster rows by the
    Morton key while doing it — after the rewrite each file covers a
    small rectangle of the (a, b) space, so parquet min/max footers
    prune on EITHER column (the Delta OPTIMIZE ZORDER contract; the
    reference's range-file layout plays this role,
    pkg/storage/range.go:15-24). Returns (files_before, files_after)."""
    import math

    sc = spark.sparkContext
    jvm_path = sc._jvm.org.apache.hadoop.fs.Path(path)  # type: ignore[union-attr]
    fs = jvm_path.getFileSystem(sc._jsc.hadoopConfiguration())

    def n_files() -> int:
        return len(
            [
                f
                for f in fs.listStatus(jvm_path)
                if f.getPath().getName().startswith("part-")
                or f.getPath().getName().endswith(f".{format}")
            ]
        )

    if zorder_cols is None:
        return compact_table(spark, path, format, target_file_bytes)
    files_before = n_files()
    total_bytes = sum(
        f.getLen()
        for f in fs.listStatus(jvm_path)
        if f.getPath().getName().startswith("part-")
        or f.getPath().getName().endswith(f".{format}")
    )
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    from litebase_spark.operators.layout import zorder_write

    df = spark.read.format(format).load(path).localCheckpoint(eager=True)
    zorder_write(df, zorder_cols, path, n_files=n_out)
    return files_before, n_files()
