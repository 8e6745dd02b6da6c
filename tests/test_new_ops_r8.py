"""Round-8 operators: winnowing fingerprints, Mann-Whitney U,
tokenizer fertility, frame-diff scene cuts.

Oracle exactness is covered by tools/check_oracle.py; these tests pin
the SEMANTIC invariants each operator promises, plus hand-models on
constructed fixtures where the math is small enough to recompute."""

from __future__ import annotations

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write_docs(spark, tmp_path, docs):
    rows = [
        (i, text, "en", "src", len(text)) for i, text in docs
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def test_winnowing_hand_model(spark, tmp_path):
    from litebase_spark.operators.text import (
        _WINNOW_W,
        text_winnowing_fingerprint,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    sf = _write_docs(spark, tmp_path, [(1, " ".join(words))])
    got = {
        (r["doc_id"], r["fp"]): r["n_sel"]
        for r in text_winnowing_fingerprint(spark, sf).collect()
    }
    grams = [
        _h60(" ".join(words[i : i + 3]))
        for i in range(len(words) - 2)
    ]
    exp: dict = {}
    for p in range(len(grams) - _WINNOW_W + 1):
        fp = min(grams[p : p + _WINNOW_W])
        exp[(1, fp)] = exp.get((1, fp), 0) + 1
    assert got == exp


def test_winnowing_window_count_invariant(spark):
    """Every doc's selected-fingerprint multiplicity sums to exactly
    its window count (n_grams - W + 1): no window unaccounted."""
    from litebase_spark.operators.text import (
        _WINNOW_W,
        text_winnowing_fingerprint,
        tokens,
    )
    from litebase_spark.catalog import load

    per_doc = (
        text_winnowing_fingerprint(spark, SF)
        .groupBy("doc_id")
        .agg(F.sum("n_sel").alias("selected"))
    )
    n_grams = load(spark, SF, "documents").select(
        "doc_id", (F.size(tokens("text")) - 2).alias("g")
    )
    joined = per_doc.join(n_grams, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["selected"] == r["g"] - (_WINNOW_W - 1), r["doc_id"]


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """The MOSS guarantee: two docs sharing a long verbatim run share
    at least one selected fingerprint."""
    from litebase_spark.operators.text import text_winnowing_fingerprint

    shared = "one two three four five six seven eight nine ten"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "prefix words here " + shared),
            (2, shared + " completely different tail tokens"),
        ],
    )
    rows = text_winnowing_fingerprint(spark, sf).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared 10-token run must share a fingerprint"


def _mw_hand(clicks, purchases):
    cents = sorted(
        [(round(v * 100), "a") for v in clicks]
        + [(round(v * 100), "b") for v in purchases]
    )
    n1, n2 = len(clicks), len(purchases)
    # midranks
    by_val: dict = {}
    for c, g in cents:
        by_val.setdefault(c, []).append(g)
    rank, r_a, tie_sum = 0, 0.0, 0
    for c in sorted(by_val):
        t = len(by_val[c])
        mid = rank + (t + 1) / 2.0
        r_a += mid * by_val[c].count("a")
        tie_sum += t * t * t - t
        rank += t
    u_a = r_a - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1) - tie_sum / (n * (n - 1.0)))
    z = (u_a - n1 * n2 / 2.0) / math.sqrt(var)
    return int(round(2 * u_a)), round(z, 6)


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


def test_mann_whitney_hand_model(spark, tmp_path):
    from litebase_spark.operators.relational import stats_mann_whitney_u

    clicks = [1.00, 2.00, 3.00]
    purchases = [2.00, 4.00]
    rows, eid = [], 0
    for v in clicks:
        rows.append((eid, "2024-01-01 00:00:00", 1, "click", v))
        eid += 1
    for v in purchases:
        rows.append((eid, "2024-01-01 00:00:00", 1, "purchase", v))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = stats_mann_whitney_u(spark, sf).first()
    u2, z = _mw_hand(clicks, purchases)
    assert r["n1"] == 3 and r["n2"] == 2
    assert r["u2_a"] == u2
    assert r["z_score"] == pytest.approx(z, abs=1e-6)


def test_mann_whitney_identical_groups_z_zero(spark, tmp_path):
    from litebase_spark.operators.relational import stats_mann_whitney_u

    rows, eid = [], 0
    for v in (1.0, 2.0, 3.0, 4.0):
        rows.append((eid, "2024-01-01 00:00:00", 1, "click", v))
        eid += 1
        rows.append((eid, "2024-01-01 00:00:00", 1, "purchase", v))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    r = stats_mann_whitney_u(spark, sf).first()
    # identical distributions: U == n1*n2/2 exactly -> z == 0
    assert r["u2_a"] == r["n1"] * r["n2"]
    assert r["z_score"] == pytest.approx(0.0, abs=1e-12)


def test_fertility_hand_model(spark, tmp_path):
    from litebase_spark.operators.pipeline import (
        pipeline_tokenizer_fertility,
    )

    sf = _write_docs(
        spark, tmp_path,
        [(1, "Hello world"), (2, "one two three")],
    )
    r = pipeline_tokenizer_fertility(spark, sf).first()
    nt = 2 + 3
    nb = len(b"Hello world") + len(b"one two three")
    assert r["n_docs"] == 2
    assert r["total_tokens"] == nt
    assert r["total_bytes"] == nb
    assert r["total_chars"] == 11 + 13
    assert r["tokens_per_byte_e6"] == nt * 1_000_000 // nb
    assert r["bytes_per_token_e6"] == nb * 1_000_000 // nt


def test_frame_diff_hand_model(spark):
    from litebase_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        frame_sad,
    )

    payloads = {
        1: bytes(range(128)),  # frame1 - frame0 = +64 each byte
        2: bytes(range(64)) * 3,  # 3 identical frames -> SAD 0
        3: b"x" * 100,  # only one complete frame -> dropped
    }
    rows = [
        (i, p, ("text", "video/raw", len(p), "src"))
        for i, p in payloads.items()
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        (r["doc_id"], r["frame_idx"]): (r["sad"], r["is_cut"])
        for r in frame_sad(df).collect()
    }
    assert got == {
        (1, 1): (64 * 64, 1),
        (2, 1): (0, 0),
        (2, 2): (0, 0),
    }


def test_asof_tolerance_nulls_stale_matches(spark, tmp_path):
    from litebase_spark.operators.asof import join_asof_tolerance

    rows = [
        # user 1: click 10 min before purchase -> within tolerance
        (1, "2024-01-01 10:00:00", 1, "click", 5.0),
        (2, "2024-01-01 10:10:00", 1, "purchase", 9.0),
        # user 2: click 20 min before purchase -> stale, NULLed
        (3, "2024-01-01 10:00:00", 2, "click", 7.0),
        (4, "2024-01-01 10:20:00", 2, "purchase", 9.0),
        # user 3: no click at all
        (5, "2024-01-01 10:00:00", 3, "purchase", 9.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["r_event_id"], r["r_value"])
        for r in join_asof_tolerance(spark, sf).collect()
    }
    assert got == {2: (1, 5.0), 4: (None, None), 5: (None, None)}


def test_seasonal_profile_hand_model(spark, tmp_path):
    from litebase_spark.operators.asof import ts_seasonal_profile

    rows = [
        (1, "2024-01-01 09:00:00", 1, "click", 1.00),
        (2, "2024-01-02 09:30:00", 1, "click", 3.00),
        (3, "2024-01-01 14:00:00", 1, "click", 2.00),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["hour"]): (
            r["n_events"], r["mean_value_e6"], r["is_peak_hour"]
        )
        for r in ts_seasonal_profile(spark, sf).collect()
    }
    # hour 9: n=2, mean = (100+300)*10000 // 2 = 2_000_000 (2.0), peak
    # hour 14: n=1, mean 2_000_000, not peak (tie broken by count)
    assert got == {
        ("click", 9): (2, 2_000_000, 1),
        ("click", 14): (1, 2_000_000, 0),
    }


def test_hll_intersect_identical_years(spark, tmp_path):
    """Same customer set in both years -> union registers == each
    year's -> est_intersect == est_a == est_b exactly (mergeable
    register algebra, no estimation error in the IDENTITY case)."""
    from litebase_spark.operators.skew import sketch_hll_intersect

    rows = []
    ok = 0
    for y in (1995, 1996):
        for c in range(1, 201):
            rows.append((ok, c, f"{y}-06-01", "O", 100.0, "1-URGENT"))
            ok += 1
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate string,"
        " o_orderstatus string, o_totalprice double,"
        " o_orderpriority string",
    ).withColumn(
        "o_orderdate", F.to_timestamp("o_orderdate")
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "orders.parquet")
    )
    r = sketch_hll_intersect(spark, str(tmp_path)).first()
    assert (r["year_a"], r["year_b"]) == (1995, 1996)
    assert r["est_a"] == r["est_b"] == r["est_union"] == r["est_intersect"]
    # 256-register HLL on 200 distinct: estimate within ~15%
    assert abs(r["est_a"] - 200) / 200 < 0.15


def test_hll_intersect_bounds_on_fixture(spark):
    from litebase_spark.operators.skew import sketch_hll_intersect

    rows = sketch_hll_intersect(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["year_b"] == r["year_a"] + 1
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-9
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9
        assert r["est_intersect"] <= min(r["est_a"], r["est_b"]) + 1e-9
