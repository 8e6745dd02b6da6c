"""Round-8 batch 3: autocorrelation lags, Cramer's V effect size.

Oracle exactness is covered by tools/check_oracle.py; these tests pin
the SEMANTIC invariants (hand-recomputed ACF on a tiny series, the
perfect-association / independence anchor points of Cramer's V)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts")).withColumn(
        "props", F.lit("{}")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    return str(tmp_path)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def _acf_reference(xs, k):
    """The exact cross-multiplied identity the operator implements."""
    n, s = len(xs), sum(xs)
    d = [n * x - s for x in xs]
    num = sum(d[t] * d[t - k] for t in range(k, n))
    den = sum(v * v for v in d)
    return round(num / den, 6)


def test_acf_hand_model(spark, tmp_path):
    from litebase_spark.operators.asof import ts_acf_lags

    cents = [100, 300, 100, 300, 100, 300, 200, 400]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", c / 100.0)
        for i, c in enumerate(cents)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = ts_acf_lags(spark, sf).first()
    assert r["event_type"] == "click" and r["n_events"] == len(cents)
    for k in (1, 2, 3):
        assert r[f"acf_lag{k}"] == pytest.approx(
            _acf_reference(cents, k), abs=1e-9
        )
    # period-2 structure: lag-2 correlation dominates lag-1
    assert r["acf_lag2"] > 0 > r["acf_lag1"]


def test_acf_ordering_is_by_ts_not_event_id(spark, tmp_path):
    """Shuffled event_ids with inverted timestamps: the series must be
    ordered by ts (event_id only breaks ties), so ACF matches the
    ts-sorted reference, not the insertion order."""
    from litebase_spark.operators.asof import ts_acf_lags

    cents = [100, 200, 400, 800, 1600, 300]
    rows = [
        (99 - i, f"2024-01-01 00:{i:02d}:00", 1, "click", c / 100.0)
        for i, c in enumerate(cents)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = ts_acf_lags(spark, sf).first()
    assert r["acf_lag1"] == pytest.approx(
        _acf_reference(cents, 1), abs=1e-9
    )


def test_acf_fixture_bounds(spark):
    from litebase_spark.operators.asof import ts_acf_lags

    rows = ts_acf_lags(spark, SF).collect()
    assert rows
    for r in rows:
        for k in (1, 2, 3):
            v = r[f"acf_lag{k}"]
            assert v is not None and -1.0 - 1e-9 <= v <= 1.0 + 1e-9


def test_cramers_v_perfect_association(spark, tmp_path):
    from litebase_spark.operators.relational import stats_cramers_v

    rows = [
        (1, "aa", "en", "src0", 2),
        (2, "bb", "en", "src0", 2),
        (3, "cc", "fr", "src1", 2),
        (4, "dd", "fr", "src1", 2),
    ]
    r = stats_cramers_v(spark, _write_docs(spark, tmp_path, rows)).first()
    assert (r["n_total"], r["n_rows"], r["n_cols"]) == (4, 2, 2)
    # lang determines source exactly: chi2 = n, V = 1
    assert r["chi2"] == pytest.approx(4.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_independence(spark, tmp_path):
    from litebase_spark.operators.relational import stats_cramers_v

    rows = [
        (i, "t", lang, src, 1)
        for i, (lang, src) in enumerate(
            [(a, b) for a in ("en", "fr") for b in ("src0", "src1")] * 3
        )
    ]
    r = stats_cramers_v(spark, _write_docs(spark, tmp_path, rows)).first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-6)
    assert r["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_cramers_v_fixture_range(spark):
    from litebase_spark.operators.relational import stats_cramers_v

    r = stats_cramers_v(spark, SF).first()
    assert r["n_rows"] >= 2 and r["n_cols"] >= 2
    assert 0.0 <= r["cramers_v"] <= 1.0 + 1e-9


def test_welch_ttest_hand_model(spark, tmp_path):
    from litebase_spark.operators.relational import stats_welch_ttest

    clicks = [1.0, 2.0, 3.0, 4.0]
    purchases = [2.0, 4.0, 6.0, 8.0]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", v)
        for i, v in enumerate(clicks)
    ] + [
        (10 + i, f"2024-01-01 01:{i:02d}:00", 2, "purchase", v)
        for i, v in enumerate(purchases)
    ]
    r = stats_welch_ttest(spark, _write_events(spark, tmp_path, rows)).first()
    assert (r["n1"], r["n2"]) == (4, 4)
    assert r["mean_diff"] == pytest.approx(-2.5, abs=1e-6)
    # v1 = 5/3, v2 = 20/3, se^2 = 25/12 -> t = -2.5/sqrt(25/12) = -sqrt(3)
    assert r["t_stat"] == pytest.approx(-(3 ** 0.5), abs=1e-6)
    # Welch-Satterthwaite: (25/12)^2 / (((5/12)^2 + (20/12)^2)/3) = 75/17
    assert r["df_welch"] == pytest.approx(75 / 17, abs=1e-6)


def test_welch_ttest_symmetric_zero(spark, tmp_path):
    from litebase_spark.operators.relational import stats_welch_ttest

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", v)
        for i, v in enumerate([1.0, 3.0])
    ] + [
        (10 + i, f"2024-01-01 01:{i:02d}:00", 2, "purchase", v)
        for i, v in enumerate([3.0, 1.0])
    ]
    r = stats_welch_ttest(spark, _write_events(spark, tmp_path, rows)).first()
    assert r["mean_diff"] == pytest.approx(0.0, abs=1e-9)
    assert r["t_stat"] == pytest.approx(0.0, abs=1e-9)


def test_dedup_cluster_stats_hand_model(spark, tmp_path):
    from litebase_spark.operators.pipeline import (
        pipeline_dedup_cluster_stats,
    )

    docs = [
        (1, "aaa", "en", "s", 3),
        (2, "aaa", "en", "s", 3),
        (3, "aaa", "en", "s", 3),
        (4, "bbb", "en", "s", 3),
        (5, "bbb", "en", "s", 3),
        (6, "ccc", "en", "s", 3),
    ]
    rows = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_removable"])
        for r in pipeline_dedup_cluster_stats(
            spark, _write_docs(spark, tmp_path, docs)
        ).collect()
    }
    assert rows == {3: (1, 3, 2), 2: (1, 2, 1), 1: (1, 1, 0)}


def test_dedup_cluster_stats_matches_dedup_exact(spark):
    """n_removable summed over the histogram == rows dedup_exact drops."""
    from litebase_spark.operators.dedup import dedup_exact
    from litebase_spark.operators.pipeline import (
        pipeline_dedup_cluster_stats,
    )
    from litebase_spark.catalog import load

    hist = pipeline_dedup_cluster_stats(spark, SF).collect()
    removable = sum(r["n_removable"] for r in hist)
    total = load(spark, SF, "documents").count()
    kept = dedup_exact(spark, SF).count()
    assert removable == total - kept


def test_acf_int64_headroom_guard_fires_loudly(spark, tmp_path):
    """Round-8 verdict task 6: q = sum(c^2) is int64; past n*max(c)^2 >=
    2^62 it would wrap SILENTLY.  The assert_true guard must turn that
    into a loud failure instead.  value=3e8 -> c=3e10 cents, c^2=9e20 >
    2^62~4.6e18, so even 4 rows trip the bound."""
    from py4j.protocol import Py4JJavaError

    from litebase_spark.operators.asof import ts_acf_lags

    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", 3e8 + i)
        for i in range(4)
    ]
    sf = _write_events(spark, tmp_path, rows)
    with pytest.raises(Exception) as ei:
        ts_acf_lags(spark, sf).collect()
    assert "headroom" in str(ei.value)


def test_acf_guard_passes_and_stays_exact_below_bound(spark, tmp_path):
    """Just below the bound the guard is silent and values are still the
    exact hand-model numbers (the guard never perturbs the plan)."""
    from litebase_spark.operators.asof import ts_acf_lags

    cents = [100, 300, 100, 300, 100, 300, 200, 400]
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", c / 100.0)
        for i, c in enumerate(cents)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = ts_acf_lags(spark, sf).first()
    assert r["n_events"] == len(cents)
    assert r["acf_lag1"] == pytest.approx(
        _acf_reference(cents, 1), abs=1e-9
    )


def test_welch_int64_headroom_guard_fires_loudly(spark, tmp_path):
    """s1/s2 are int64 sums of cents: (n1+n2)*max|c| >= 2^62 must raise,
    not wrap.  value=5e16 -> c=5e18 cents crosses the bound alone."""
    from litebase_spark.operators.relational import stats_welch_ttest

    rows = (
        [(i, f"2024-01-01 00:00:{i:02d}", 1, "click", 5e16) for i in range(3)]
        + [(10 + i, f"2024-01-01 00:01:{i:02d}", 1, "purchase", 1.0)
           for i in range(3)]
    )
    sf = _write_events(spark, tmp_path, rows)
    with pytest.raises(Exception) as ei:
        stats_welch_ttest(spark, sf).collect()
    assert "headroom" in str(ei.value)
