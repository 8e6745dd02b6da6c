"""Snapshot/PITR (A21), batch queries (A24), statement cache (A6), and
introspection (A13/M3) tests."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from litebase_spark.catalog import load
from litebase_spark.engine import Engine
from litebase_spark.snapshots import SnapshotManager


@pytest.fixture()
def engine(spark):
    return Engine(spark=spark)


def test_snapshot_restore_roundtrip(spark, sf_dir, tmp_path):
    mgr = SnapshotManager(spark, str(tmp_path / "snaps"))
    nation = load(spark, sf_dir, "nation")

    s1 = mgr.snapshot({"nation": nation}, label="before-change")
    t_between = time.time()
    changed = nation.withColumn("n_name", F.upper("n_name"))
    s2 = mgr.snapshot({"nation": changed}, label="after-change")

    assert [s.snapshot_id for s in mgr.list_snapshots()] == [
        s1.snapshot_id,
        s2.snapshot_id,
    ]
    # point-in-time resolution: between the two snapshots -> s1
    assert mgr.snapshot_at(t_between).snapshot_id == s1.snapshot_id

    snap, restored = mgr.restore_at(t_between, "restored_ns")
    assert snap.snapshot_id == s1.snapshot_id and restored == ["nation"]
    back = spark.table("`restored_ns`.`nation`")
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in nation.collect()
    )
    spark.sql("DROP DATABASE IF EXISTS `restored_ns` CASCADE")


def test_snapshot_at_before_first_raises(spark, sf_dir, tmp_path):
    mgr = SnapshotManager(spark, str(tmp_path / "snaps2"))
    with pytest.raises(LookupError):
        mgr.snapshot_at(time.time())


def test_sql_batch_sequential(engine, spark, sf_dir):
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    results = engine.sql_batch(
        [
            "SELECT count(*) AS n FROM region",
            ("SELECT r_name FROM region WHERE r_regionkey = ? ", [0]),
        ]
    )
    assert results[0].rows[0]["n"] == 5
    assert results[1].row_count == 1


def test_prepared_statement_cache(engine, spark, sf_dir):
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    stmt = "SELECT count(*) AS n FROM region"
    df1 = engine.prepared(stmt)
    df2 = engine.prepared(stmt)
    assert df1 is df2  # same analyzed plan object reused
    with pytest.raises(ValueError):
        engine.prepared("DROP TABLE region")


def test_explain_and_describe(engine, spark, sf_dir):
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    plan = engine.explain(
        "SELECT n_name FROM nation WHERE n_nationkey = 3", mode="formatted"
    )
    assert "Physical Plan" in plan
    cols = {r["col_name"] for r in engine.describe("nation")}
    assert {"n_nationkey", "n_name", "n_regionkey"} <= cols


def test_multimodal_resize_and_frames(spark, sf_dir):
    from litebase_spark.operators.multimodal import (
        attach_media,
        resize_media,
        sample_frames,
    )

    media = attach_media(load(spark, sf_dir, "documents"))
    n_docs = media.count()

    resized = resize_media(media, 16, 8)
    rows = resized.limit(5).collect()
    assert all(len(r["media"]) == 16 * 8 for r in rows)
    assert all(
        r["meta"]["target_w"] == 16 and r["meta"]["n_bytes"] == 128 for r in rows
    )
    assert resized.count() == n_docs  # 1:1 contract

    frames = sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n_docs  # 1:N contract
    per_doc = frames.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [4]
