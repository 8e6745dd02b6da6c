"""Round-9 operators: Levene variance test, Spearman rank correlation,
daily cross-correlation, quality-funnel attrition.

Oracle exactness is covered by tools/check_oracle.py; these pin the
SEMANTIC invariants — hand-recomputed statistics on tiny constructed
inputs, the anchor points (rho = ±1, xcorr = 1 on a shifted copy,
W ~ 0 on equal spreads), and the funnel monotonicity contract.
"""

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


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "l_quantity double, l_extendedprice double"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet")
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


def _levene_reference(a, b):
    """Mean-centered Levene W, straight from the definition."""
    za = [abs(x - sum(a) / len(a)) for x in a]
    zb = [abs(x - sum(b) / len(b)) for x in b]
    z1, z2 = sum(za) / len(za), sum(zb) / len(zb)
    n1, n2 = len(a), len(b)
    zg = (n1 * z1 + n2 * z2) / (n1 + n2)
    ssb = n1 * (z1 - zg) ** 2 + n2 * (z2 - zg) ** 2
    ssw = sum((z - z1) ** 2 for z in za) + sum((z - z2) ** 2 for z in zb)
    return (n1 + n2 - 2) * ssb / ssw


def test_levene_hand_model(spark, tmp_path):
    from litebase_spark.operators.relational import stats_levene_test

    a = [1.00, 2.00, 3.00, 4.00, 10.00]          # clicks: wide spread
    b = [5.00, 5.10, 4.90, 5.05, 4.95, 5.00]     # purchases: tight
    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, "click", v)
        for i, v in enumerate(a)
    ] + [
        (100 + i, f"2024-01-01 00:01:{i:02d}", 1, "purchase", v)
        for i, v in enumerate(b)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = stats_levene_test(spark, sf).first()
    assert (r["n1"], r["n2"]) == (len(a), len(b))
    want = _levene_reference([x * 100 for x in a], [x * 100 for x in b])
    assert r["w_stat"] == pytest.approx(want, rel=1e-6)
    # wide-vs-tight spread must register as a large W
    assert r["w_stat"] > 4


def test_levene_equal_spreads_near_zero(spark, tmp_path):
    from litebase_spark.operators.relational import stats_levene_test

    a = [1.0, 2.0, 3.0, 4.0]
    b = [11.0, 12.0, 13.0, 14.0]  # same spread, shifted mean
    rows = [
        (i, f"2024-01-01 00:00:{i:02d}", 1, "click", v)
        for i, v in enumerate(a)
    ] + [
        (100 + i, f"2024-01-01 00:01:{i:02d}", 1, "purchase", v)
        for i, v in enumerate(b)
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = stats_levene_test(spark, sf).first()
    # identical |deviation| profiles: between-group term is exactly 0
    assert r["w_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r["mad_1"] == pytest.approx(r["mad_2"], abs=1e-9)


def test_spearman_anchor_points(spark, tmp_path):
    from litebase_spark.operators.relational import stats_spearman_rho

    # perfectly monotone increasing -> rho = 1
    rows = [(float(q), 100.0 * q + 0.5) for q in range(1, 11)]
    r = stats_spearman_rho(spark, _write_lineitem(spark, tmp_path, rows))
    assert r.first()["rho"] == pytest.approx(1.0, abs=1e-9)
    # perfectly monotone decreasing -> rho = -1
    rows = [(float(q), 1000.0 - 10.0 * q) for q in range(1, 11)]
    r = stats_spearman_rho(
        spark, _write_lineitem(spark, tmp_path / "b", rows)
    )
    assert r.first()["rho"] == pytest.approx(-1.0, abs=1e-9)


def test_spearman_ties_hand_model(spark, tmp_path):
    from litebase_spark.operators.relational import stats_spearman_rho

    # qty has heavy ties; verify against a direct midrank computation
    qty = [1, 1, 2, 2, 2, 3]
    price = [10.00, 20.00, 15.00, 25.00, 30.00, 5.00]

    def midranks(vals):
        out = []
        for v in vals:
            lt = sum(1 for w in vals if w < v)
            eq = sum(1 for w in vals if w == v)
            out.append(lt + (eq + 1) / 2)
        return out

    rx, ry = midranks(qty), midranks([round(p * 100) for p in price])
    n = len(qty)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    want = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    rows = [(float(q), p) for q, p in zip(qty, price)]
    r = stats_spearman_rho(spark, _write_lineitem(spark, tmp_path, rows))
    assert r.first()["rho"] == pytest.approx(want, abs=1e-6)


def test_spearman_fixture_bounds(spark):
    from litebase_spark.operators.relational import stats_spearman_rho

    r = stats_spearman_rho(spark, SF).first()
    assert -1.0 <= r["rho"] <= 1.0 and r["n_rows"] > 0


def test_cross_correlation_shifted_copy(spark, tmp_path):
    from litebase_spark.operators.asof import ts_cross_correlation

    # purchases = clicks shifted forward one day -> xcorr peaks at lag 1
    click_daily = [10, 30, 20, 50, 40, 60, 25, 45]
    rows = []
    eid = 0
    for day, n in enumerate(click_daily):
        for i in range(n):
            rows.append(
                (eid, f"2024-01-{day + 1:02d} 06:00:00", 1, "click", 1.0)
            )
            eid += 1
    for day, n in enumerate(click_daily):
        for i in range(n):
            rows.append(
                (eid, f"2024-01-{day + 2:02d} 18:00:00", 2, "purchase",
                 1.0)
            )
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = {
        r["lag"]: r["xcorr"]
        for r in ts_cross_correlation(spark, sf).collect()
    }
    assert out[1] == pytest.approx(1.0, abs=1e-9)
    assert out[0] < out[1] and out[2] < out[1]


def test_quality_funnel_monotone_and_hand_case(spark, tmp_path):
    from litebase_spark.operators.pipeline import pipeline_quality_funnel

    long_text = ("lorem ipsum " * 40).strip()        # 40 tokens-ish, long
    digity = ("42 " * 120).strip()                   # long but all digits
    short = "tiny doc"
    rows = [
        (1, long_text, "en", "web", len(long_text)),
        (2, long_text, "en", "web", len(long_text)),   # exact dup of 1
        (3, digity, "en", "web", len(digity)),
        (4, short, "en", "web", len(short)),
        (5, long_text + " unique tail", "en", "web",
         len(long_text) + 12),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    r = pipeline_quality_funnel(spark, sf).first()
    assert r["source"] == "web"
    assert r["n_docs"] == 5
    # funnel invariant
    assert (
        r["n_docs"] >= r["n_len_ok"] >= r["n_tok_ok"]
        >= r["n_digit_ok"] >= r["n_kept"]
    )
    # hand: short fails length; digity fails digit cap; dup loses rank-1
    assert r["n_len_ok"] == 4
    assert r["n_tok_ok"] == 4
    assert r["n_digit_ok"] == 3
    assert r["n_kept"] == 2
    assert r["retention"] == pytest.approx(2 / 5, abs=1e-9)


def test_quality_funnel_fixture_invariant(spark):
    from litebase_spark.operators.pipeline import pipeline_quality_funnel

    for r in pipeline_quality_funnel(spark, SF).collect():
        assert (
            r["n_docs"] >= r["n_len_ok"] >= r["n_tok_ok"]
            >= r["n_digit_ok"] >= r["n_kept"] >= 0
        )
