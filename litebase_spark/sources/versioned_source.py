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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
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


class _FilesCommit(WriterCommitMessage):
    def __init__(self, files: list[str]) -> None:
        self.files = files


class VersionedWriter(DataSourceWriter):
    """Write side: every task writes its rows to one immutable parquet
    file in a fresh transaction directory and reports the path as its
    commit message; the DRIVER's commit() appends exactly one version
    entry to the manifest log — the same two-phase commit the manifest
    design gives VersionedStore.write, now reachable through
    ``df.write.format("versioned")``. An aborted job leaves only
    unreferenced files (vacuum-able), never a torn manifest."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema_ = schema
        self.options = dict(options)
        self.overwrite = overwrite
        root, table = self.options["root"], self.options["table"]
        self.ns = self.options.get("namespace", "main")
        log_path = os.path.join(root, "_log", self.ns, f"{table}.json")
        prev = []
        if os.path.exists(log_path):
            with open(log_path) as f:
                prev = json.load(f)
        self.version = (prev[-1]["version"] + 1) if prev else 1
        self.prev_files = prev[-1]["files"] if prev else []
        self.txdir = os.path.join(
            root, "store", table, f"{self.ns}-tx{self.version:08d}"
        )
        os.makedirs(self.txdir, exist_ok=True)

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema_)
        names = [f.name for f in self.schema_.fields]
        rows = [[getattr(r, n) for n in names] for r in iterator]
        if not rows:
            return _FilesCommit([])
        cols = list(zip(*rows))
        table = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        path = os.path.join(self.txdir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, path)
        return _FilesCommit([path])

    def commit(self, messages):
        root, table = self.options["root"], self.options["table"]
        new_files = sorted(f for m in messages for f in m.files)
        files = new_files if self.overwrite else self.prev_files + new_files
        log_path = os.path.join(root, "_log", self.ns, f"{table}.json")
        log = []
        if os.path.exists(log_path):
            with open(log_path) as f:
                log = json.load(f)
        import time as _time

        log.append(
            {
                "version": self.version,
                "mode": "overwrite" if self.overwrite else "append",
                "ts": _time.time(),
                "files": files,
            }
        )
        os.makedirs(os.path.dirname(log_path), exist_ok=True)
        tmp = log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f)
        os.replace(tmp, log_path)

    def abort(self, messages):
        for m in messages:
            for f in getattr(m, "files", []):
                if os.path.exists(f):
                    os.remove(f)


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

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return VersionedWriter(schema, self.options, overwrite)
