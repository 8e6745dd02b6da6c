"""Round-10 batch 1: int64 N^2-class headroom guards (verdict task 1).

The rank/moment partials across the stats family — doubled rank sums
(spearman/kruskal/mann-whitney, bounded by N*(N+1)), KS cross products
cuma*n2 (bounded by n1*n2) and chi2/cramers contingency products o*n /
rt*ct (bounded by N^2) — are int64: exact to N ~ 2.1e9 rows and
SILENTLY wrapping past that.  Round 10 sweeps the family with the loud
assert_true pattern acf/welch/levene already carry.

A real N^2 overflow needs ~2e9 rows, so the ceiling lives in the module
constant ``relational.N2_HEADROOM_BOUND`` and these tests monkeypatch
it DOWN: one notch below n*(n+1) proves the loud path fires with a
diagnosable message; one notch above proves the guard is silent and the
values are bit-identical to the unguarded plan (the guard never
perturbs results).  The kruskal/mann-whitney ties term ``sum(t^3 - t)``
has a REACHABLE int64 ceiling (a single >=2.1e6-way tie wraps t^3), so
that promotion to DECIMAL(38,0) is exercised with a genuinely
overflowing 2.1M-row tie, checked against an exact-integer Python
reference.
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


# ---------------------------------------------------------------------------
# loud-failure side: bound below n*(n+1) must raise, not wrap
# ---------------------------------------------------------------------------


def _events_two_arms(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, "click", float(v))
        for i, v in enumerate([1.0, 2.0, 3.0])
    ] + [
        (10 + i, f"2024-01-01 01:{i:02d}:00", 1, "purchase", float(v))
        for i, v in enumerate([2.0, 4.0, 6.0])
    ]
    return _write_events(spark, tmp_path, rows)


def _events_three_arms(spark, tmp_path):
    rows = [
        (i, f"2024-01-01 00:{i:02d}:00", 1, t, float(v))
        for i, (t, v) in enumerate(
            [("click", 1.0), ("click", 2.0), ("view", 2.0),
             ("view", 3.0), ("purchase", 4.0), ("purchase", 5.0)]
        )
    ]
    return _write_events(spark, tmp_path, rows)


@pytest.mark.parametrize(
    "opname,maker",
    [
        ("stats_spearman_rho", "lineitem"),
        ("stats_kruskal_wallis", "three"),
        ("stats_mann_whitney_u", "two"),
        ("stats_ks_test", "two"),
        ("stats_chi2_independence", "docs"),
        ("stats_cramers_v", "docs"),
    ],
)
def test_n2_guard_fires_loudly(spark, tmp_path, monkeypatch, opname, maker):
    """With the ceiling patched below n*(n+1) every swept op must fail
    LOUDLY with its own name in the message — the silent-wrap class the
    round-9 verdict flagged."""
    from litebase_spark.operators import relational

    if maker == "lineitem":
        sf = _write_lineitem(
            spark, tmp_path, [(float(i + 1), float(10 * i)) for i in range(6)]
        )
    elif maker == "three":
        sf = _events_three_arms(spark, tmp_path)
    elif maker == "two":
        sf = _events_two_arms(spark, tmp_path)
    else:
        sf = _write_docs(
            spark,
            tmp_path,
            [(i, "t", "en" if i % 2 else "fr", f"s{i % 3}", 1)
             for i in range(6)],
        )
    monkeypatch.setattr(relational, "N2_HEADROOM_BOUND", 6 * 7)
    with pytest.raises(Exception) as ei:
        getattr(relational, opname)(spark, sf).collect()
    msg = str(ei.value)
    assert "headroom" in msg and opname in msg


# ---------------------------------------------------------------------------
# still-exact side: bound one notch above n*(n+1) is silent & identical
# ---------------------------------------------------------------------------


def test_spearman_guard_silent_and_exact_below_bound(
    spark, tmp_path, monkeypatch
):
    from litebase_spark.operators import relational

    rows = [(float(i + 1), float(10 * i)) for i in range(6)]
    sf = _write_lineitem(spark, tmp_path, rows)
    base = relational.stats_spearman_rho(spark, sf).first()
    monkeypatch.setattr(relational, "N2_HEADROOM_BOUND", 6 * 7 + 1)
    near = relational.stats_spearman_rho(spark, sf).first()
    assert near["n_rows"] == base["n_rows"] == 6
    assert near["rho"] == base["rho"] == 1.0


def test_kruskal_guard_silent_and_exact_below_bound(
    spark, tmp_path, monkeypatch
):
    from litebase_spark.operators import relational

    sf = _events_three_arms(spark, tmp_path)
    base = relational.stats_kruskal_wallis(spark, sf).first()
    monkeypatch.setattr(relational, "N2_HEADROOM_BOUND", 6 * 7 + 1)
    near = relational.stats_kruskal_wallis(spark, sf).first()
    assert near.asDict() == base.asDict()
    assert near["n1"] == 2 and near["n2"] == 2 and near["n3"] == 2


def test_mwu_guard_silent_and_exact_below_bound(
    spark, tmp_path, monkeypatch
):
    from litebase_spark.operators import relational

    sf = _events_two_arms(spark, tmp_path)
    base = relational.stats_mann_whitney_u(spark, sf).first()
    monkeypatch.setattr(relational, "N2_HEADROOM_BOUND", 6 * 7 + 1)
    near = relational.stats_mann_whitney_u(spark, sf).first()
    assert near.asDict() == base.asDict()


# ---------------------------------------------------------------------------
# the REACHABLE ceiling: ties = sum(t^3 - t) on a 2.1M-way tie
# ---------------------------------------------------------------------------


def _kruskal_doubled_rank_reference(counters, order):
    """Exact-integer H via the same doubled-midrank algebra the
    operator and its oracle share (counters: arm -> Counter of cents,
    so a 2.1M-way tie never materializes as a list)."""
    n = {a: sum(counters[a].values()) for a in order}
    nn = sum(n.values())
    cells = sorted({c for v in counters.values() for c in v})
    cum, ties = 0, 0
    s = dict.fromkeys(order, 0)
    for c in cells:
        t = sum(counters[a][c] for a in order)
        two_r = 2 * cum + t + 1
        for a in order:
            s[a] += counters[a][c] * two_r
        ties += t * t * t - t
        cum += t
    h = (
        3.0 * sum(float(s[a] * s[a]) / n[a] for a in order)
        / (float(nn) * (nn + 1.0))
        - 3.0 * (nn + 1.0)
    )
    corr = 1.0 - float(ties) / (float(nn) ** 3 - nn)
    return n, s, h / corr


def test_kruskal_megatie_dec38_exact(spark, tmp_path):
    """A single 2.1e6-way tie makes t^3 - t = 9.26e18 > int64 max: the
    DECIMAL(38,0) ties accumulation must stay exact where the old int64
    expression would have wrapped (negative ties -> corr > 1 -> wrong
    h_stat).  Checked against an exact-integer Python reference."""
    big = 2_100_000  # big^3 = 9.261e18 > 2^63-1 = 9.223e18
    bulk = (
        spark.range(big)
        .select(
            F.col("id").alias("event_id"),
            F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    small = spark.createDataFrame(
        [
            (big + 1, "view", 2.0), (big + 2, "view", 3.0),
            (big + 3, "view", 4.0), (big + 4, "purchase", 2.0),
            (big + 5, "purchase", 5.0), (big + 6, "purchase", 6.0),
        ],
        "event_id long, event_type string, value double",
    ).select(
        "event_id",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    )
    bulk.unionByName(small).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )

    from collections import Counter

    from litebase_spark.operators.relational import stats_kruskal_wallis

    assert big**3 - big > 2**63 - 1  # the tie term genuinely overflows
    r = stats_kruskal_wallis(spark, str(tmp_path)).first()
    n, s, h = _kruskal_doubled_rank_reference(
        {
            "click": Counter({100: big}),
            "view": Counter([200, 300, 400]),
            "purchase": Counter([200, 500, 600]),
        },
        ["click", "view", "purchase"],
    )
    assert r["n1"] == n["click"] and r["n2"] == n["view"]
    assert r["two_r1"] == s["click"]
    assert r["two_r2"] == s["view"] and r["two_r3"] == s["purchase"]
    assert r["h_stat"] == pytest.approx(h, abs=1e-5)


# ---------------------------------------------------------------------------
# fp() exact HALF_UP on full-precision doubles (round-9 advice item)
# ---------------------------------------------------------------------------


def test_fp_exact_half_up_on_boundary_doubles(spark):
    """floor(|x|+0.5) alone over-rounds the '1 ulp below .5' class
    (0.49999999999999994 + 0.5 == 1.0); the repaired fp must agree with
    decimal ROUND_HALF_UP on every double, both signs, so the
    '<=digits-decimal inputs only' precondition is gone."""
    from decimal import ROUND_HALF_UP, Decimal

    from litebase_spark.catalog import fp

    vals = [
        0.49999999999999994, -0.49999999999999994, 0.5, -0.5, 1.5,
        2.5, -2.5, 0.4999999999999999, 1.4999999999999998, 0.0,
        123.456, -123.456, 7.499999999999999, -7.499999999999999,
        4503599627370495.5,
    ]
    rows = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["x"]: r["r"]
        for r in rows.select("x", fp("x", 0).alias("r")).collect()
    }
    for v in vals:
        want = int(
            Decimal(repr(v)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        assert got[v] == want, (v, got[v], want)


# ---------------------------------------------------------------------------
# stats_psi (round-10 drift gate)
# ---------------------------------------------------------------------------


def _psi_reference(ref_cents, cur_cents, width=500):
    """PSI from the definition, mirroring the op's per-bin round-9 and
    drop-one-sided-bins convention."""
    import math
    from collections import Counter

    b1 = Counter(c // width if c >= 0 else -((-c) // width) - (1 if (-c) % width else 0)
                 for c in ref_cents)
    b2 = Counter(c // width for c in cur_cents)
    n1, n2 = len(ref_cents), len(cur_cents)
    bins = set(b1) | set(b2)
    used = [b for b in bins if b1[b] > 0 and b2[b] > 0]
    psi = sum(
        round((b1[b] / n1 - b2[b] / n2)
              * math.log((b1[b] / n1) / (b2[b] / n2)), 9)
        for b in used
    )
    return len(used), len(bins) - len(used), round(psi, 6)


def _write_psi_events(spark, tmp_path, ref_vals, cur_vals):
    rows = [
        (i, "2024-01-05 00:00:00", 1, "click", float(v))
        for i, v in enumerate(ref_vals)
    ] + [
        (1000 + i, "2024-01-25 00:00:00", 1, "click", float(v))
        for i, v in enumerate(cur_vals)
    ]
    return _write_events(spark, tmp_path, rows)


def test_psi_identical_distributions_is_zero(spark, tmp_path):
    """Same distribution both windows -> every p == q -> psi == 0."""
    from litebase_spark.operators.relational import stats_psi

    vals = [1.0, 7.0, 12.0, 12.0, 20.0, 33.0]
    sf = _write_psi_events(spark, tmp_path, vals, vals)
    r = stats_psi(spark, sf).first()
    assert r["n_ref"] == r["n_cur"] == 6
    assert r["psi"] == 0.0 and r["n_bins_dropped"] == 0


def test_psi_hand_model_with_dropped_bins(spark, tmp_path):
    """A shifted current window: psi matches the definitional Python
    model bin-for-bin, and bins with one-sided support are counted in
    n_bins_dropped, not silently folded into the sum."""
    from litebase_spark.operators.relational import stats_psi

    ref = [1.0, 2.0, 6.0, 7.0, 11.0, 12.0, 12.5, 30.0]
    cur = [6.0, 7.0, 7.5, 11.0, 12.0, 26.0, 41.0, 41.5]  # 0-bin gone
    sf = _write_psi_events(spark, tmp_path, ref, cur)
    r = stats_psi(spark, sf).first()
    used, dropped, psi = _psi_reference(
        [round(v * 100) for v in ref], [round(v * 100) for v in cur]
    )
    assert r["n_bins_used"] == used
    assert r["n_bins_dropped"] == dropped and dropped > 0
    assert r["psi"] == pytest.approx(psi, abs=2e-6)
    assert r["psi"] > 0.1  # a real shift reads as 'moderate drift'


# ---------------------------------------------------------------------------
# pipeline_incremental_novelty (round-10 incremental twin)
# ---------------------------------------------------------------------------


def test_incremental_novelty_hand_model(spark, tmp_path):
    """Prefix split: max id 9 -> threshold 7 -> batch = {8, 9}.
    Doc 8 'a b c d': gram 'a b c' already in index doc 0 -> not novel;
    'b c d' unseen -> novel (nn=1, ng=2).  Doc 9 'b c d e': 'b c d'
    first occurs within the batch at doc 8 -> NOT novel for 9; 'c d e'
    novel (nn=1, ng=2).  A short batch doc (<3 tokens) produces no
    grams and no output row."""
    from litebase_spark.operators.pipeline import (
        pipeline_incremental_novelty,
    )

    docs = [
        (0, "a b c", "en", "s0", 5),
        (1, "x y z w", "en", "s0", 7),
        (2, "filler text here too", "en", "s1", 20),
        (3, "more filler text here", "en", "s1", 21),
        (4, "a b c", "en", "s0", 5),
        (7, "unrelated words entirely", "en", "s1", 24),
        (8, "a b c d", "en", "s0", 7),
        (9, "b c d e", "en", "s0", 7),
        (5, "hi", "en", "s1", 2),  # index, too short
        (6, "q r s", "en", "s1", 5),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in pipeline_incremental_novelty(spark, sf).collect()
    }
    assert set(out) == {8, 9}
    assert out[8]["total_grams"] == 2 and out[8]["novel_grams"] == 1
    assert out[9]["total_grams"] == 2 and out[9]["novel_grams"] == 1
    assert out[8]["novelty_e6"] == 500000
    assert out[9]["source"] == "s0"


def test_incremental_novelty_replay_identity(spark, tmp_path):
    """sum(novel_grams) over the batch == distinct grams the batch adds
    on top of the index — i.e. incremental scoring + the pre-ingested
    index reconstructs the full-corpus first-occurrence accounting
    (the oracle certifies the per-doc form of this; here the set form
    is pinned independently of DuckDB)."""
    from litebase_spark.operators.pipeline import (
        pipeline_incremental_novelty,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ws = words.split()
    docs = [
        (i, " ".join(ws[(i + j) % len(ws)] for j in range(4 + i % 3)),
         "en", f"s{i % 2}", 30)
        for i in range(8)
    ] + [
        # batch docs: partly recycled index vocabulary, partly new
        (8, "alpha beta gamma novelword8 fresh8", "en", "s0", 36),
        (9, "novelword8 fresh8 alone9 beta gamma delta", "en", "s1", 42),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    out = pipeline_incremental_novelty(spark, sf).collect()

    from litebase_spark.functions.portable import h60_spark
    from litebase_spark.operators.text import tokens

    d = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    tw = d.select("doc_id", tokens("text").alias("w"))
    gram = (
        "concat_ws(' ', element_at(w, i), element_at(w, i + 1),"
        " element_at(w, i + 2))"
    )
    g = tw.select(
        "doc_id",
        F.explode_outer(
            F.when(
                F.size("w") >= 3,
                F.expr(
                    f"transform(sequence(1, size(w) - 2),"
                    f" i -> {h60_spark(gram)})"
                ),
            )
        ).alias("h"),
    ).filter(F.col("h").isNotNull())
    thr = 9 * 4 // 5
    n_all = g.select("h").distinct().count()
    n_idx = g.filter(F.col("doc_id") <= thr).select("h").distinct().count()
    assert sum(r["novel_grams"] for r in out) == n_all - n_idx > 0
