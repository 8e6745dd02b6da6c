"""Per-operator behavior tests over the sf0.001 fixtures (mirrors the
reference's behavior-assertion style — SURVEY §5 — while the DuckDB
oracle corpus covers value-level correctness)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import litebase_spark.operators  # noqa: F401
from litebase_spark.catalog import REGISTRY, load


def run(name, spark, sf_dir):
    return REGISTRY[name].builder(spark, sf_dir)


def test_registry_complete(spark):
    # every registered query has a builder and description
    assert len(REGISTRY) >= 60
    for name, spec in REGISTRY.items():
        assert callable(spec.builder), name
        assert spec.description, name


def test_q1_shape_and_totals(spark, sf_dir):
    rows = run("q1_pricing_summary", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 6  # at most |returnflag| x |linestatus|
    total = sum(r.count_order for r in rows)
    expected = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .count()
    )
    assert total == expected
    for r in rows:
        assert r.avg_qty == pytest.approx(r.sum_qty / r.count_order, rel=1e-6)


def test_semi_anti_partition_customers(spark, sf_dir):
    # semi(with orders) + anti(without orders) partition the customer set
    c = load(spark, sf_dir, "customer").count()
    with_orders = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .count()
    )
    anti = run("join_anti", spark, sf_dir).count()
    assert with_orders + anti == c


def test_cross_join_cardinality(spark, sf_dir):
    n_r = load(spark, sf_dir, "region").count()
    n_n = load(spark, sf_dir, "nation").count()
    assert run("join_cross", spark, sf_dir).count() == n_r * n_n


def test_setops_algebra(spark, sf_dir):
    union = run("setop_union", spark, sf_dir).count()
    inter = run("setop_intersect", spark, sf_dir).count()
    a = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
        .count()
    )
    b = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert union == a + b - inter


def test_window_topk_bounds(spark, sf_dir):
    df = run("window_rank_topk", spark, sf_dir)
    rows = df.collect()
    per_nation: dict[str, int] = {}
    for r in rows:
        per_nation[r.n_name] = per_nation.get(r.n_name, 0) + 1
        assert r.rn <= 3 and r.rnk >= 1 and r.drnk <= r.rnk
    assert all(v <= 3 for v in per_nation.values())


def test_rollup_includes_grand_total(spark, sf_dir):
    rows = run("agg_rollup", spark, sf_dir).collect()
    grand = [r for r in rows if r.n_name is None and r.c_mktsegment is None]
    assert len(grand) == 1
    assert grand[0].n_customers == load(spark, sf_dir, "customer").count()


def test_limit_offset_window(spark, sf_dir):
    top15 = (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
        .collect()
    )
    got = run("orderby_limit_offset", spark, sf_dir).collect()
    assert [r.o_orderkey for r in got] == [r.o_orderkey for r in top15[5:15]]


def test_plans_use_broadcast_and_pushdown(spark, sf_dir):
    # scale checks: dimension joins broadcast; filters reach the scan
    plan = run("q3_shipping_priority", spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan" in plan or "PushedFilters" in plan
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln and "lineitem" in ln]
    assert scan_lines and "l_comment" not in scan_lines[0]  # column pruning


def test_distinct_projection_reads_two_columns(spark, sf_dir):
    plan = run("distinct_projection", spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln][0]
    assert "l_returnflag" in scan and "l_extendedprice" not in scan


def test_salted_join_matches_plain_join(spark, sf_dir):
    from litebase_spark.catalog import load
    from litebase_spark.operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = l.join(o, on="l_orderkey").count()
    salted = salted_join(l, o, on="l_orderkey", salt_from="l_orderkey")
    assert salted.count() == plain
    # every left row must land in exactly one salt bucket (no dup/loss)
    assert salted.select("l_orderkey", "l_quantity").count() == l.join(
        o, on="l_orderkey"
    ).count()


def test_salted_join_adaptive_broadcast_and_forced_skew(spark, sf_dir):
    """Adaptive demotion: below the broadcast threshold the operator
    must emit a broadcast hash join (no salt machinery); with the
    threshold off and a whale-key fixture, the salted shuffle plan must
    engage and still match the plain join row-for-row."""
    from litebase_spark.catalog import load
    from litebase_spark.operators.skew import salted_join

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    # orders at test SF is tiny -> adaptive path must broadcast
    plan = (
        salted_join(l, o, on="l_orderkey", salt_from="l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "__salt" not in plan

    # forced skew regime: one whale key owning 90% of the fact side,
    # broadcast disabled so the join must shuffle -> salted plan
    thr_key = "spark.sql.autoBroadcastJoinThreshold"
    old_thr = spark.conf.get(thr_key)
    spark.conf.set(thr_key, "-1")
    try:
        fact = spark.range(0, 20000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 7 ELSE id END AS k",
            "id AS payload",
        )
        dim = spark.range(0, 20000).selectExpr("id AS k", "id * 2 AS attr")
        salted = salted_join(fact, dim, on="k", salt_from="k")
        plan2 = salted._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan2
        assert "BroadcastHashJoin" not in plan2
        plain = fact.join(dim, on="k")
        assert salted.count() == plain.count()
        got = {
            (r["k"], r["payload"], r["attr"]) for r in salted.collect()
        }
        want = {(r["k"], r["payload"], r["attr"]) for r in plain.collect()}
        assert got == want

        # uniform keys above the broadcast threshold: the skew probe
        # must demote to a PLAIN shuffle join (no salt replication, no
        # broadcast) — salting uniform keys pays 8x for nothing
        uni = spark.range(0, 20000).selectExpr(
            "id AS k", "id AS payload"
        )
        plain_plan = (
            salted_join(uni, dim, on="k", salt_from="k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "__salt" not in plain_plan
        assert "BroadcastHashJoin" not in plain_plan
    finally:
        spark.conf.set(thr_key, old_thr)


def test_skew_probe_inconclusive_and_cached(spark):
    """An empty/near-empty sample must return None (inconclusive), not
    0.0 — a 0.0 would demote a whale key to a plain shuffle in exactly
    the no-stats regime salting exists for. And the probe decision is
    cached per (plan, key): the second call on the same frame must not
    launch another job."""
    from litebase_spark.operators import skew as S

    empty = spark.range(0, 0).selectExpr("id AS k")
    assert S._top_key_share(empty, "k") is None

    # tiny frame: sampled job may see ~0 rows; the bounded unsampled
    # retry must still produce a share
    tiny = spark.range(0, 10).selectExpr("CAST(7 AS BIGINT) AS k")
    share = S._top_key_share(tiny, "k")
    assert share == 1.0

    # cache: same plan + key -> one probe, second call hits the dict
    S._PROBE_CACHE.clear()
    df = spark.range(0, 1000).selectExpr("id % 5 AS k")
    s1 = S._cached_top_key_share(df, "k")
    assert len(S._PROBE_CACHE) == 1
    # poison the underlying probe: a cache hit never calls it
    orig = S._top_key_share
    S._top_key_share = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("probe re-ran on cached plan")
    )
    try:
        s2 = S._cached_top_key_share(
            spark.range(0, 1000).selectExpr("id % 5 AS k"), "k"
        )
    finally:
        S._top_key_share = orig
    assert s1 == s2


def test_approx_distinct_within_5pct(spark, sf_dir):
    """Builtin approx_count_distinct (HLL++, rsd=0.02) stays within 5%
    of exact; the portable-HLL query's own bound lives in
    test_dedup_similarity.test_portable_hll_estimates_within_5pct."""
    from litebase_spark.catalog import load

    o = load(spark, sf_dir, "orders")
    rows = (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("a"),
            F.countDistinct("o_custkey").alias("n"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["a"] - r["n"]) / r["n"] < 0.05, (
            r["o_orderpriority"],
            r["a"],
            r["n"],
        )


def test_groups_frame_semantics_hand_case(spark):
    """GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW on values [1,1,2,3,3]:
    peer groups are {1,1},{2},{3,3} -> sums 2,2,4,8,8 (SQLite semantics)."""
    from litebase_spark.operators.relational import groups_frame

    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate([1, 1, 2, 3, 3])],
        "part string, idx int, v int",
    )
    ranked, w = groups_frame(df, partition="part", order="v", preceding=1, following=0)
    got = {
        r["idx"]: r["s"]
        for r in ranked.select("idx", F.sum("v").over(w).alias("s")).collect()
    }
    assert got == {0: 2, 1: 2, 2: 4, 3: 8, 4: 8}


def test_stratified_sample_fractions(spark, sf_dir):
    got = {
        r["o_orderpriority"]: r["n_sampled"]
        for r in REGISTRY["sample_stratified"].builder(spark, sf_dir).collect()
    }
    totals = {
        r["o_orderpriority"]: r["n"]
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for k, n in totals.items():
        frac = got.get(k, 0) / n
        # Bernoulli draws at 20%: generous bound for small strata
        assert 0.08 <= frac <= 0.35, (k, frac)


def test_spatial_grid_join_matches_bruteforce(spark, sf_dir):
    from litebase_spark.operators import spatial

    grid = {
        r.s_suppkey: (r.n_points, r.min_custkey)
        for r in spatial.spatial_rtree_bbox_join(spark, sf_dir).collect()
    }
    p, b = spatial._points(spark, sf_dir), spatial._boxes(spark, sf_dir)
    brute = {
        r.s_suppkey: (r.n_points, r.min_custkey)
        for r in b.join(
            p,
            p.px.between(b.xmin, b.xmax) & p.py.between(b.ymin, b.ymax),
            "left",
        )
        .groupBy("s_suppkey")
        .agg(
            F.count("c_custkey").alias("n_points"),
            F.min("c_custkey").alias("min_custkey"),
        )
        .collect()
    }
    assert grid == brute and len(grid) > 0


def test_geopoly_ray_cast_known_points(spark):
    from litebase_spark.operators.spatial import geopoly_contains_point

    # L-shape: (100,100)-(600,100)-(600,300)-(350,300)-(350,650)-(100,650)
    pts = [
        (1, 200, 200, True),   # inside the bottom arm
        (2, 500, 200, True),   # inside the bottom arm, right end
        (3, 200, 500, True),   # inside the vertical arm
        (4, 500, 500, False),  # in the notch (outside the L)
        (5, 50, 50, False),    # fully outside
        (6, 700, 200, False),  # right of the polygon
    ]
    df = spark.createDataFrame(
        [(i, x, y) for i, x, y, _ in pts], "id int, px int, py int"
    )
    got = {
        r.id for r in df.filter(geopoly_contains_point("px", "py")).collect()
    }
    assert got == {i for i, _, _, inside in pts if inside}


def test_geopoly_overlap_matches_brute_force(spark, sf_dir):
    """Exact rectilinear overlap == brute-force point-grid reference
    (dense integer sampling of each box against a Python ray cast)."""
    from litebase_spark.catalog import REGISTRY, load
    from litebase_spark.operators.spatial import _POLY

    def py_inside(px, py):
        y = py + 0.5
        n = 0
        for (x1, y1), (x2, y2) in zip(_POLY, _POLY[1:] + _POLY[:1]):
            if (y1 > y) != (y2 > y) and px < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
                n += 1
        return n % 2 == 1

    got = {
        r["s_suppkey"]
        for r in REGISTRY["geopoly_area_overlap"].builder(spark, sf_dir).collect()
    }
    boxes = [
        (
            r["s_suppkey"],
            (r["s_suppkey"] * 53 + 3) % 1000,
            (r["s_suppkey"] * 29 + 17) % 1000,
            5 + r["s_suppkey"] % 20,
        )
        for r in load(spark, sf_dir, "supplier").select("s_suppkey").collect()
    ]
    want = set()
    for k, cx, cy, hw in boxes:
        # overlap iff some point of the CLOSED box is inside the closed
        # polygon: sample every integer point (hw <= 24 -> <= 49x49)
        if any(
            py_inside(x, y) or (x, y) in set(zip(*zip(*_POLY)))
            for x in range(cx - hw, cx + hw + 1)
            for y in range(cy - hw, cy + hw + 1)
        ):
            want.add(k)
    assert got == want


def test_parse_size_bytes_suffixes():
    """autoBroadcastJoinThreshold values with size suffixes ('10MB',
    '10485760b') must parse — bare int() silently disabled demotion."""
    from litebase_spark.operators.skew import parse_size_bytes

    assert parse_size_bytes("10485760") == 10 * 1024 * 1024
    assert parse_size_bytes("10485760b") == 10 * 1024 * 1024
    assert parse_size_bytes("10MB") == 10 * 1024 * 1024
    assert parse_size_bytes("10m") == 10 * 1024 * 1024
    assert parse_size_bytes(" 1g ") == 1024**3
    assert parse_size_bytes("-1") == -1
    assert parse_size_bytes(64 * 1024 * 1024) == 64 * 1024 * 1024
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_size_bytes("ten megabytes")
