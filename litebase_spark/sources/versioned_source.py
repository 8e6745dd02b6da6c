"""`format("versioned")` — a Spark 4 Python DataSource over the
VersionedStore manifest log.

Exposes version pinning / time travel through the STANDARD reader API
(the surface a reference user points BI tools and notebooks at):

    spark.dataSource.register(VersionedDataSource)
    spark.read.format("versioned")
         .option("root", "/path/to/store")
         .option("table", "events")
         .option("version", 3)          # or timestamp=<epoch seconds>
         .load()

Scale shape: `partitions()` returns ONE InputPartition per pinned data
file (the manifest IS the split list — no directory listing job), and
each task streams its file as Arrow RecordBatches, so a 100 TB table
fans out across the cluster exactly like the native parquet source.
The version resolution happens once on the driver from the few-KB
manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _resolve_files(options: dict) -> list[str]:
    root = options["root"]
    table = options["table"]
    ns = options.get("namespace", "main")
    log_path = os.path.join(root, "_log", ns, f"{table}.json")
    with open(log_path) as f:
        log = json.load(f)
    if "version" in options:
        v = int(options["version"])
        for entry in log:
            if entry["version"] == v:
                return entry["files"]
        raise LookupError(f"{ns}.{table} has no version {v}")
    if "timestamp" in options:
        ts = float(options["timestamp"])
        cands = [e for e in log if e["ts"] <= ts]
        if not cands:
            raise LookupError(f"no version of {ns}.{table} at {ts}")
        return cands[-1]["files"]
    return log[-1]["files"]


class VersionedReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.files = _resolve_files(options)

    def partitions(self):
        # one split per immutable data file: the manifest is the split
        # list, no FS listing; Spark schedules one task per file
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        # Arrow record batches stream straight into Spark's columnar
        # path; column pruning happens via the schema Spark passes down
        names = [f.name for f in self.schema_.fields]
        table = pq.read_table(partition.path, columns=names)
        yield from table.to_batches()


class VersionedDataSource(DataSource):
    """DataSource entry point (register with
    ``spark.dataSource.register(VersionedDataSource)``)."""

    @classmethod
    def name(cls) -> str:
        return "versioned"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _resolve_files(self.options)
        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return VersionedReader(schema, self.options)
