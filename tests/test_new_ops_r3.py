"""Hand-case semantics for the round-3 additions: dup-5gram fraction,
column profiling, COUNT(DISTINCT) OVER emulation, z-score anomalies."""

from __future__ import annotations

import pyspark.sql.functions as F

from litebase_spark.operators.profiling import profile_lineitem_stats
from litebase_spark.operators.relational import window_count_distinct
from litebase_spark.operators.text import text_dup_5gram_fraction


def test_profile_lineitem_stats_shape(spark, sf_dir):
    rows = {r["column_name"]: r for r in
            profile_lineitem_stats(spark, sf_dir).collect()}
    assert len(rows) == 11
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1  # one table, one row count
    for r in rows.values():
        assert 0 <= r["n_null"] <= r["n_rows"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]
    assert rows["l_discount"]["min_num"] >= 0.0
    assert rows["l_returnflag"]["min_str"] is not None
    assert rows["l_returnflag"]["min_num"] is None


def test_window_count_distinct_matches_groupby(spark, sf_dir):
    out = window_count_distinct(spark, sf_dir)
    from litebase_spark.catalog import load

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    expect = (
        li.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"),
             F.count_distinct("l_returnflag").alias("n_flags"))
    )
    joined = out.join(expect.withColumnRenamed("n_supp", "e_supp")
                      .withColumnRenamed("n_flags", "e_flags"), "l_orderkey")
    assert joined.filter(
        (F.col("n_supp") != F.col("e_supp"))
        | (F.col("n_flags") != F.col("e_flags"))).count() == 0


def test_dup_5gram_identical_docs_fully_duplicated(spark):
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "one two three four five unique words")],
        "doc_id long, text string",
    )
    # Re-run the operator body against a temp parquet dir so the
    # registered builder (which loads from sf_dir) is exercised as-is.
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in
               text_dup_5gram_fraction(spark, d).collect()}
    assert out[1]["dup_frac_e6"] == 1_000_000
    assert out[2]["dup_frac_e6"] == 1_000_000
    assert out[3]["dup_frac_e6"] == 0
    assert out[1]["n_grams"] == 4  # 8 tokens -> 4 5-grams


def test_ts_anomaly_flags_injected_spike(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(72):
        n = 10 if h != 60 else 400  # flat rate with one massive spike
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), "click"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, "
                                     "event_type string")
    import tempfile

    from litebase_spark.operators.asof import ts_anomaly_zscore

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = ts_anomaly_zscore(spark, d).collect()
    flagged = {r["hr"].hour + 24 * (r["hr"].day - 1) for r in out}
    assert 60 in flagged  # the spike
    # a flat series' other hours are not anomalies
    assert flagged == {60}


def test_incremental_minhash_flags_known_dup(spark):
    import tempfile

    from litebase_spark.operators.dedup import dedup_incremental_minhash

    shared = ("the quick brown fox jumps over the lazy dog and then "
              "runs far away into the deep green forest tonight")
    docs = spark.createDataFrame(
        [
            (3, shared),                        # index (3 % 5 != 0)
            (5, shared),                        # batch, dup of 3
            (10, "completely unrelated text about database engines "
                 "and storage formats with nothing shared at all"),
            (7, "another index document that matches nothing else"),
        ],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r["doc_id"]: r for r in
               dedup_incremental_minhash(spark, d).collect()}
    assert set(out) == {5, 10}          # only the batch is reported
    assert out[5]["is_dup"] and out[5]["dup_of"] == 3
    assert out[5]["est_jaccard"] == 1.0  # identical text
    assert not out[10]["is_dup"] and out[10]["dup_of"] is None


def test_knn_filtered_search_respects_predicate(spark, sf_dir):
    from litebase_spark.catalog import load
    from litebase_spark.operators.similarity import (
        TOP_K,
        knn_filtered_search,
    )

    out = knn_filtered_search(spark, sf_dir).collect()
    labels = {r["vec_id"]: r["label"] for r in
              load(spark, sf_dir, "embeddings").select(
                  "vec_id", "label").collect()}
    by_q = {}
    for r in out:
        assert r["label"] == labels[r["qid"]]  # pre-filter honored
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= TOP_K


def test_tfidf_keywords_shape(spark, sf_dir):
    from litebase_spark.operators.text import text_tfidf_keywords

    out = text_tfidf_keywords(spark, sf_dir).collect()
    assert out, "some doc below id 100 must yield keywords"
    by_doc = {}
    for r in out:
        assert r["doc_id"] < 100
        assert r["tfidf"] > 0  # df <= N/2 => ln(N/df) >= ln 2 > 0
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["tfidf"]))
    for pairs in by_doc.values():
        ranks = [p[0] for p in sorted(pairs)]
        scores = [p[1] for p in sorted(pairs)]
        assert ranks == list(range(1, len(ranks) + 1))
        assert scores == sorted(scores, reverse=True)
