"""Round-9 batch 2: Kruskal-Wallis H, Kendall tau-b, n-gram novelty.

Oracle exactness is covered by tools/check_oracle.py; these pin the
SEMANTIC invariants against brute-force recomputations on tiny
constructed inputs — the pair-free tau-b must equal the O(n^2) pair
count, the cells-based H must equal the definitional midrank H, and
the novelty fractions must match hand-counted first occurrences.
"""

from __future__ import annotations

import math
import os
from collections import Counter

from pyspark.sql import functions as F

from litebase_spark.operators.pipeline import pipeline_ngram_novelty
from litebase_spark.operators.relational import (
    stats_kendall_tau,
    stats_kruskal_wallis,
)


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


def _write_lineitem_dates(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "l_quantity double, l_shipdate string"
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate")).coalesce(
        1
    ).write.mode("overwrite").parquet(
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


def _kruskal_reference(groups):
    """Tie-corrected H straight from the midrank definition."""
    allv = [v for g in groups for v in g]
    n = len(allv)
    cnt = Counter(allv)
    ranks, pos = {}, 1
    for v in sorted(cnt):
        t = cnt[v]
        ranks[v] = pos + (t - 1) / 2.0
        pos += t
    s = sum(
        (sum(ranks[v] for v in g)) ** 2 / len(g) for g in groups
    )
    h = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    ties = sum(t**3 - t for t in cnt.values())
    return h / (1.0 - ties / float(n**3 - n))


def _tau_b_reference(xs, ys):
    """Brute-force O(n^2) concordant/discordant pair count."""
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    t1 = sum(v * (v - 1) // 2 for v in Counter(xs).values())
    t2 = sum(v * (v - 1) // 2 for v in Counter(ys).values())
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - t1) * (n0 - t2))
    return c, d, tau


def test_kruskal_hand_model(spark, tmp_path):
    arms = {
        "click": [1.00, 2.00, 2.00, 5.00, 7.50],
        "view": [2.00, 3.00, 3.00, 3.00, 9.00, 11.00],
        "purchase": [0.50, 2.00, 6.00, 6.00],
    }
    rows, i = [], 0
    for et, vals in arms.items():
        for v in vals:
            rows.append((i, "2024-01-01 00:00:00", i, et, v))
            i += 1
    # noise arm the filter must drop
    rows.append((i, "2024-01-01 00:00:00", i, "error", 99.0))
    sf = _write_events(spark, tmp_path, rows)
    got = stats_kruskal_wallis(spark, sf).collect()[0]
    cents = {k: [int(round(v * 100)) for v in vs] for k, vs in arms.items()}
    exp = _kruskal_reference(
        [cents["click"], cents["view"], cents["purchase"]]
    )
    assert got.n1 == 5 and got.n2 == 6 and got.n3 == 4
    assert abs(got.h_stat - exp) < 1e-6
    # doubled rank sums must cover the full 1..N rank mass exactly
    nn = got.n1 + got.n2 + got.n3
    assert got.two_r1 + got.two_r2 + got.two_r3 == nn * (nn + 1)


def test_kendall_hand_model(spark, tmp_path):
    # quantities x months with ties on both axes and empty grid cells
    pts = [
        (1, "1994-01-15"), (1, "1994-03-02"), (2, "1994-01-20"),
        (3, "1994-02-11"), (3, "1994-02-28"), (3, "1994-05-09"),
        (5, "1994-03-17"), (5, "1994-05-30"), (7, "1994-01-01"),
        (7, "1994-05-21"), (2, "1994-05-04"), (4, "1994-02-14"),
    ]
    rows = [(float(q), d + " 00:00:00") for q, d in pts]
    sf = _write_lineitem_dates(spark, tmp_path, rows)
    got = stats_kendall_tau(spark, sf).collect()[0]
    xs = [q for q, _ in pts]
    ys = [int(d[:4]) * 12 + int(d[5:7]) for _, d in pts]
    c, d_, tau = _tau_b_reference(xs, ys)
    assert got.n_rows == len(pts)
    assert got.concordant == c
    assert got.discordant == d_
    assert abs(got.tau_b - tau) < 1e-6


def test_kendall_perfect_order(spark, tmp_path):
    # strictly increasing in both axes, no ties -> tau_b = +1
    rows = [
        (float(q), f"1995-{m:02d}-10 00:00:00")
        for q, m in zip(range(1, 9), range(1, 9))
    ]
    sf = _write_lineitem_dates(spark, tmp_path, rows)
    got = stats_kendall_tau(spark, sf).collect()[0]
    assert got.discordant == 0
    assert got.concordant == 8 * 7 // 2
    assert abs(got.tau_b - 1.0) < 1e-9


def test_ngram_novelty_hand_model(spark, tmp_path):
    docs = [
        (1, "a b c d", "en", "srcA", 7),     # grams: abc, bcd -> both novel
        (2, "a b c x", "en", "srcA", 7),     # abc seen, bcx novel -> 1/2
        (3, "a b c d", "en", "srcB", 7),     # both seen -> 0/2
        (4, "hi", "en", "srcB", 2),          # <3 tokens -> excluded
        (5, "p q p q p", "en", "srcB", 9),   # grams pqp,qpq,pqp,qpq ->
                                             # 2 DISTINCT, both novel
    ]
    sf = _write_docs(spark, tmp_path, docs)
    got = {
        r.source: r for r in pipeline_ngram_novelty(spark, sf).collect()
    }
    a, b = got["srcA"], got["srcB"]
    assert a.n_docs == 2 and a.total_grams == 4 and a.novel_grams == 3
    assert a.novelty_ppm == 750000
    assert a.mean_doc_novelty_e6 == (1000000 + 500000) // 2
    assert b.n_docs == 2  # doc 4 excluded, docs 3 and 5 remain
    assert b.total_grams == 4 and b.novel_grams == 2
    assert b.novelty_ppm == 500000
    assert b.mean_doc_novelty_e6 == (0 + 1000000) // 2


def test_kendall_randomized_parity(spark, tmp_path):
    """Pair-free grid tau-b == brute-force O(n^2) on randomized input.

    Deterministic LCG so the case is reproducible; 60 points across 6
    quantities x 8 months with heavy ties exercises every strict-
    inequality corner of the SW/NW prefix masses.
    """
    seed = 0x5EED
    pts = []
    for i in range(60):
        seed = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        q = 1 + (seed >> 33) % 6
        m = 1 + (seed >> 45) % 8
        pts.append((q, f"1996-{m:02d}-15"))
    rows = [(float(q), d + " 00:00:00") for q, d in pts]
    sf = _write_lineitem_dates(spark, tmp_path, rows)
    got = stats_kendall_tau(spark, sf).collect()[0]
    xs = [q for q, _ in pts]
    ys = [int(d[5:7]) for _, d in pts]
    c, d_, tau = _tau_b_reference(xs, ys)
    assert (got.concordant, got.discordant) == (c, d_)
    assert abs(got.tau_b - tau) < 1e-6


def test_kruskal_two_arm_matches_mann_whitney_direction(spark, tmp_path):
    """With a large location shift in one arm, H must be large and the
    rank mass must concentrate there (sanity anchor, not a p-value)."""
    rows, i = [], 0
    for v in (1.0, 2.0, 3.0, 4.0):
        rows.append((i, "2024-01-01 00:00:00", i, "click", v)); i += 1
        rows.append((i, "2024-01-01 00:00:00", i, "view", v)); i += 1
    for v in (100.0, 101.0, 102.0, 103.0):
        rows.append((i, "2024-01-01 00:00:00", i, "purchase", v)); i += 1
    sf = _write_events(spark, tmp_path, rows)
    got = stats_kruskal_wallis(spark, sf).collect()[0]
    # purchase holds the top 4 ranks of 12: 2R_3 = 2*(9+10+11+12) = 84
    assert got.two_r3 == 84
    exp = _kruskal_reference(
        [[100, 200, 300, 400], [100, 200, 300, 400],
         [10000, 10100, 10200, 10300]]
    )
    assert abs(got.h_stat - exp) < 1e-6


def test_ngram_novelty_order_invariance(spark, tmp_path):
    """First-occurrence credit follows MIN doc_id, not write order:
    writing the duplicate with the SMALLER id second must not flip
    novelty to the larger id."""
    docs = [
        (10, "x y z w", "en", "srcA", 7),
        (2, "x y z w", "en", "srcB", 7),   # same grams, smaller id
    ]
    sf = _write_docs(spark, tmp_path, docs)
    got = {r.source: r for r in pipeline_ngram_novelty(spark, sf).collect()}
    assert got["srcB"].novel_grams == 2 and got["srcB"].novelty_ppm == 1000000
    assert got["srcA"].novel_grams == 0 and got["srcA"].novelty_ppm == 0
