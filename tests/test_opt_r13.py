"""Focused pins for the round-13 optimization re-plans.

Each test pins the VALUE contract of an operator whose internals changed
this round (the oracle gate checks the fixtures; these check the
edge/randomized cases the fixtures may not cover) or the PLAN contract
the optimization claims.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_cdf_median_round2_matches_percentile(spark):
    """agg_median_mode's r13 re-plan: the distributed-CDF median at
    round_digits=2 must agree with percentile(v, 0.5) (the old
    buffer-per-group plan) on randomized 2-decimal data, including
    even-n interpolation midpoints (x.xx5 rounding boundaries)."""
    import random

    from litebase_spark.operators.relational import _cdf_percentiles

    rng = random.Random(1313)
    rows = [
        (rng.choice("ABCDE"), round(rng.uniform(1, 9000), 2))
        for _ in range(5001)
    ] + [("A", 101.01), ("A", 101.02)]  # even-n .005 midpoint block
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r["m"]
        for r in _cdf_percentiles(
            df, "g", "v", [(0.5, "m")], round_digits=2
        ).collect()
    }
    want = {
        r["g"]: r["m"]
        for r in df.groupBy("g")
        .agg(F.round(F.percentile("v", F.lit(0.5)), 2).alias("m"))
        .collect()
    }
    assert got == want


def test_lsh_verified_post_filter_dedupe_unique(spark, sf_dir):
    """r13 moved the candidate dedupe AFTER the tau filter: the output
    must still be one row per (a, b) pair even though multi-band
    colliders are verified multiple times."""
    from litebase_spark.catalog import REGISTRY

    out = REGISTRY["dedup_embedding_lsh_verified"].builder(
        spark, sf_dir
    ).collect()
    pairs = [(r["vec_id_a"], r["vec_id_b"]) for r in out]
    assert len(pairs) == len(set(pairs)) and len(pairs) > 0


def test_kendall_tau_marginals_from_cells(spark):
    """r13 computes the tie marginals from the cell table instead of
    the zero-filled grid; zero cells contribute nothing, so tau_b must
    be unchanged. Hand-checkable 2x2-with-ties fixture:
    x=[1,1,2,2,3], y=[1,2,1,2,1] -> C=3, D=3, t1=2+2, t2=3*2+2*1(?)
    — pin against scipy-free closed form computed by brute force."""
    from itertools import combinations

    from litebase_spark.catalog import REGISTRY, load

    xs = [1, 1, 2, 2, 3]
    ys = [1, 2, 1, 2, 1]
    c = d = 0
    for (xa, ya), (xb, yb) in combinations(zip(xs, ys), 2):
        s = (xa - xb) * (ya - yb)
        c += s > 0
        d += s < 0
    n = len(xs)
    n0 = n * (n - 1) / 2
    from collections import Counter

    t1 = sum(v * (v - 1) / 2 for v in Counter(xs).values())
    t2 = sum(v * (v - 1) / 2 for v in Counter(ys).values())
    want = round((c - d) / ((n0 - t1) * (n0 - t2)) ** 0.5, 6)

    # drive the production builder through a temp-view twin of the
    # fixture shape it reads (lineitem.l_quantity / month(l_shipdate))
    import datetime as dt

    rows = [
        (float(x), dt.date(2020, y, 1)) for x, y in zip(xs, ys)
    ]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_shipdate date"
    )
    import litebase_spark.operators.relational as R

    orig_load = R.load
    try:
        R.load = lambda s, sf, name: df
        out = REGISTRY["stats_kendall_tau"].builder(spark, "ignored")
        row = out.collect()[0]
    finally:
        R.load = orig_load
    assert row["concordant"] == c and row["discordant"] == d
    assert row["tau_b"] == pytest.approx(want, abs=1e-6)


def test_phash_dedup_single_decode_stage(spark, sf_dir):
    """r13 materializes the (doc_id, phash) table once: the executed
    plan must contain NO Python decode stage (both band-join sides read
    the checkpointed rows)."""
    from litebase_spark.catalog import REGISTRY

    plan = _plan_of(
        REGISTRY["multimodal_phash_dedup"].builder(spark, sf_dir)
    )
    assert "MapInPandas" not in plan and "Scan ExistingRDD" in plan


def test_ngram_jaccard_sizes_ride_the_postings(spark, sf_dir):
    """r13 carries n_sh through the explode as a pair-aggregate
    grouping key: the plan must contain exactly ONE join (the pair
    join) — the two sizes join-backs, each of which re-inlined the
    tokenize+shingle corpus pass, are gone."""
    from litebase_spark.catalog import REGISTRY

    plan = _plan_of(
        REGISTRY["dedup_ngram_jaccard"].builder(spark, sf_dir)
    )
    main = plan.split("===== Subqueries")[0]
    joins = [
        ln for ln in main.splitlines()
        if "Join" in ln and ln.strip().startswith("(")
    ]
    assert len(joins) == 1, joins


def test_funnel_single_pass_boundary_semantics(spark, tmp_path):
    """r13 re-plans ts_funnel_steps from a 3-action interval-join
    cascade to one per-user ordered sweep. Pin the oracle's boundary
    semantics on a hand case: strict lower bounds (a click at the
    view's exact ts does not qualify; a purchase at the click's exact
    ts does not convert) and inclusive 1h upper bounds (exactly +1h
    qualifies, +1h+1us does not), with out-of-order event rows."""
    import os

    from litebase_spark.operators.asof import _funnel_counts

    rows = [
        # u1: clean chain well inside both windows
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:30:00", 1, "click"),
        (3, "2024-01-01 11:15:00", 1, "purchase"),
        # u2: click exactly +1h after view, purchase exactly +1h after
        # click -> both inclusive bounds qualify
        (4, "2024-01-01 10:00:00", 2, "view"),
        (5, "2024-01-01 11:00:00", 2, "click"),
        (6, "2024-01-01 12:00:00", 2, "purchase"),
        # u3: click at the view's exact ts -> strict bound, no qualify
        (7, "2024-01-01 10:00:00", 3, "view"),
        (8, "2024-01-01 10:00:00", 3, "click"),
        # u4: click with no view -> not even in n_viewed
        (9, "2024-01-01 10:00:00", 4, "click"),
        # u5: click 1 microsecond past the 1h window -> no qualify
        (10, "2024-01-01 10:00:00", 5, "view"),
        (11, "2024-01-01 11:00:00.000001", 5, "click"),
        # u6: qualifying click; purchases before the click and past +1h
        (12, "2024-01-01 10:00:00", 6, "view"),
        (13, "2024-01-01 10:30:00", 6, "click"),
        (14, "2024-01-01 10:20:00", 6, "purchase"),
        (15, "2024-01-01 11:31:00", 6, "purchase"),
        # u7: purchase rows straddling the click; the later one converts
        (16, "2024-01-01 10:00:00", 7, "view"),
        (17, "2024-01-01 10:05:00", 7, "purchase"),
        (18, "2024-01-01 10:10:00", 7, "click"),
        (19, "2024-01-01 10:15:00", 7, "purchase"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "value", F.lit(0.0)
    ).withColumn("props", F.lit("{}")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(str(tmp_path), "events.parquet"))

    got = _funnel_counts(spark, str(tmp_path)).collect()[0]
    assert (got["n1"], got["n2"], got["n3"]) == (6, 4, 3)


def test_funnel_counts_single_scan_plan(spark, sf_dir):
    """The funnel's one distributed job must stay single-pass: exactly
    one parquet scan and one user-keyed exchange before the aggregate
    (the final 1-row exchange is the only other one)."""
    from litebase_spark.operators.asof import _funnel_counts

    plan = _plan_of(_funnel_counts(spark, sf_dir))
    main = plan.split("===== Subqueries")[0]
    scans = [
        ln for ln in main.splitlines()
        if ln.strip().startswith("(") and "Scan parquet" in ln
    ]
    exchanges = [
        ln for ln in main.splitlines()
        if ln.strip().startswith("(") and "Exchange" in ln
    ]
    assert len(scans) == 1, scans
    assert len(exchanges) == 2, exchanges


def test_bigram_logppl_one_exchange_one_sort_for_both_windows(spark, sf_dir):
    """r13: the bigram-LM count c(w1 w2) and left marginal c(w1 .)
    windows must share one w1-keyed exchange and one (w1, b) sort
    (before: separate by-bigram and by-left-word exchanges + 2 sorts)."""
    from litebase_spark import operators  # noqa: F401  (registers queries)
    from litebase_spark.catalog import REGISTRY

    plan = _plan_of(REGISTRY["text_bigram_logppl"].builder(spark, sf_dir))
    main = plan.split("===== Subqueries")[0]

    def ops(kind):
        return [
            ln.strip() for ln in main.splitlines()
            if ln.strip().startswith("(")
            and ln.strip().split(None, 1)[0].rstrip(")").lstrip("(").isdigit()
            and ln.strip().split()[1] == kind
        ]

    assert len(ops("Window")) == 2
    assert len(ops("Sort")) == 1, ops("Sort")
    # doc rr + (doc,b) agg + w1 repartition + final doc agg
    assert len(ops("Exchange")) == 4, ops("Exchange")


def test_pii_scrub_counts_on_matching_corpus(spark, tmp_path):
    """r13: the PII patterns have zero capture groups, so
    regexp_extract_all MUST extract group 0 — Spark's default idx=1
    raised REGEX_GROUP_INDEX on the first matching row (latent at the
    oracle SFs because the fixture corpus is clean; fatal on the
    x100-mutated replica, which does contain matches)."""
    from litebase_spark import operators  # noqa: F401  (registers queries)
    from litebase_spark.catalog import REGISTRY

    rows = [
        (1, "contact bob@example.com or alice@test.org today", "a"),
        (2, "call +1 555-123-4567 now", "a"),
        (3, "server at 10.0.0.1 and 192.168.1.255 up", "b"),
        (4, "perfectly clean document text", "b"),
    ]
    d = tmp_path / "documents.parquet"
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(str(d))
    out = {
        r["doc_id"]: (r["emails"], r["phones"], r["ipv4s"])
        for r in REGISTRY["text_pii_scrub"].builder(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {1: (2, 0, 0), 2: (0, 1, 0), 3: (0, 0, 2)}
