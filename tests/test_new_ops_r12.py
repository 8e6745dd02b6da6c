"""Round-12 pinning tests.

Part 1: the round-11 ADVICE closures —
  - drift_report_multi column-name validation + backtick quoting
    (the ?cols= HTTP param must never reach F.expr as raw SQL text)
  - exact-median default drift split (partition-order invariant)
  - porter_stem_py bound-parameter query terms (quote-safe MATCH)
  - graph_k_core oracle unrolled to the Spark fixpoint bound (deep
    peels agree between engines, not just fixture-depth ones)
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# drift_report_multi: identifier hygiene (ADVICE medium)
# ---------------------------------------------------------------------------

def _drift_df(spark, names=("v1", "v2")):
    rows = [
        (f"2024-01-{d:02d} 00:00:00", float(d), float(d) * 2.0)
        for d in range(1, 31)
    ]
    df = spark.createDataFrame(rows, ["ts_s", *names])
    return df.selectExpr(
        "cast(ts_s as timestamp) as ts",
        *[f"`{n}`" for n in names],
    )


def test_drift_multi_rejects_unknown_cols(spark):
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark)
    with pytest.raises(ValueError, match="unknown column"):
        drift_report_multi(df, ["v1", "nope"], split="2024-01-16")


def test_drift_multi_rejects_injection_string(spark):
    """A crafted ?cols= value must die at validation, not reach
    F.expr: before the fix this interpolated raw into stack()."""
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark)
    evil = "v1 as double)) , (select java_method('java.lang.System'"
    with pytest.raises(ValueError, match="unknown column"):
        drift_report_multi(df, [evil], split="2024-01-16")


def test_drift_multi_backticks_odd_identifiers(spark):
    """A legitimate column name needing quoting (space) must work."""
    from litebase_spark.operators.relational import drift_report_multi

    df = _drift_df(spark, names=("my col", "v2"))
    rows = drift_report_multi(
        df, ["my col", "v2"], split="2024-01-16"
    ).collect()
    assert sorted(r["vcol"] for r in rows) == ["my col", "v2"]
    for r in rows:
        assert r["n_ref"] == 15 and r["n_cur"] == 15


def test_drift_rejects_unknown_ts_col(spark):
    from litebase_spark.operators.relational import drift_report

    df = _drift_df(spark)
    with pytest.raises(ValueError, match="unknown ts_col"):
        drift_report(df, value_col="v1", ts_col="not_there")


def test_drift_default_split_partition_invariant(spark):
    """The default (median) split must not move with partitioning —
    exact percentile(), not the order-sensitive approx sketch."""
    from litebase_spark.operators.relational import drift_report

    df = _drift_df(spark)
    a = drift_report(df.repartition(1), value_col="v1").collect()
    b = drift_report(df.repartition(7, "v2"), value_col="v1").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # 30 days: exact median micros sits between day 15 and 16, so the
    # "<" cut puts exactly 15 rows in the reference half
    assert a[0]["n_ref"] == 15


# ---------------------------------------------------------------------------
# porter_stem_py: bound parameter (ADVICE low)
# ---------------------------------------------------------------------------

def test_porter_stem_py_quote_safe():
    from litebase_spark.functions.porter import porter_stem_py

    # before the fix these broke the DuckDB statement outright
    assert porter_stem_py("don't") == porter_stem_py("DON'T")
    assert isinstance(porter_stem_py("o'clock"), str)
    assert porter_stem_py("'; drop table t; --") != ""
    # sanity: normal stemming still intact
    assert porter_stem_py("running") == "run"


# ---------------------------------------------------------------------------
# graph_k_core: oracle unrolled to the fixpoint bound (ADVICE low)
# ---------------------------------------------------------------------------

def test_kcore_oracle_depth_matches_fixpoint_bound():
    from litebase_spark.operators import graph

    assert graph._KCORE_ITERS == graph._KCORE_MAX_ROUNDS


def test_kcore_deep_peel_agrees_with_oracle(spark, tmp_path):
    """A pendant chain needing ~21 peel rounds (>> the old 8-round
    oracle unroll) hanging off a triangle: both engines must peel all
    the way down to the triangle. Before the fix the oracle stopped
    at 8 rounds and legitimately disagreed with the Spark fixpoint."""
    import duckdb

    from litebase_spark.operators.graph import (
        _kcore_oracle,
        graph_k_core,
    )

    # chain p0-...-p20 then p20-t100; triangle t100-t101-t102. Every
    # edge co-purchased in two orders so it survives the w>=2 gate.
    edges = [(i, i + 1) for i in range(20)] + [
        (20, 100), (100, 101), (100, 102), (101, 102),
    ]
    rows = []
    oid = 0
    for u, v in edges:
        for _ in range(2):
            rows.append((oid, u))
            rows.append((oid, v))
            oid += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {
        (r["part"], r["core_degree"])
        for r in graph_k_core(spark, str(tmp_path)).collect()
    }
    assert got == {(100, 2), (101, 2), (102, 2)}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{tmp_path}/lineitem.parquet/*.parquet')"
    )
    oracle = {tuple(r) for r in con.execute(_kcore_oracle()).fetchall()}
    assert oracle == got


# ---------------------------------------------------------------------------
# FTS5 trigram tokenizer (round-12 task 1)
# ---------------------------------------------------------------------------

def test_trigram_postings_hand_model(spark):
    from litebase_spark.operators.text_trigram import trigram_postings

    df = spark.createDataFrame(
        [(1, "AbCd"), (2, "ab"), (3, None), (4, "xyz")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["pos"], r["tri"])
        for r in trigram_postings(df).collect()
    }
    # case-folded, 0-based positions; <3-char and null text emit none
    assert got == {(1, 0, "abc"), (1, 1, "bcd"), (4, 0, "xyz")}
    cs = {
        (r["doc_id"], r["pos"], r["tri"])
        for r in trigram_postings(df, case_sensitive=True).collect()
    }
    assert (1, 0, "AbC") in cs and (1, 1, "bCd") in cs


def test_trigram_match_counts_overlapping_occurrences(spark):
    from litebase_spark.operators.text_trigram import match_trigram

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "xaaax"), (3, "aa"), (4, "bbb")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_occurrences"])
        for r in match_trigram(df, "aaa").collect()
    }
    # "aaaa" holds aaa at 0 AND 1 — overlapping phrase hits, like FTS5
    assert got == {(1, 2), (2, 1)}


def test_trigram_like_ordering_and_overlap(spark):
    from litebase_spark.operators.text_trigram import like_trigram

    df = spark.createDataFrame(
        [
            (1, "hash window sort"),
            (2, "sort window hash"),   # wrong order
            (3, "window hash"),        # missing run
            (4, "hashwindowsort"),     # adjacent runs, no separator
            (5, "abcabc"),
            (6, "abcbc"),              # 'abc','abc' would need overlap
        ],
        "doc_id long, text string",
    )
    ids = lambda pat: sorted(
        r["doc_id"] for r in like_trigram(df, pat).collect()
    )
    assert ids("%hash%window%sort%") == [1, 4]
    assert ids("%abc%abc%") == [5]
    assert ids("%HASH%") == [1, 2, 3, 4]  # LIKE folds case


def test_trigram_glob_case_sensitive(spark):
    from litebase_spark.operators.text_trigram import glob_trigram

    df = spark.createDataFrame(
        [(1, "Big Table"), (2, "big table")],
        "doc_id long, text string",
    )
    assert [
        r["doc_id"] for r in glob_trigram(df, "*Big*Table*").collect()
    ] == [1]
    assert sorted(
        r["doc_id"] for r in glob_trigram(df, "*big*table*").collect()
    ) == [2]


def test_trigram_refusals(spark):
    from litebase_spark.operators.text_trigram import (
        glob_trigram,
        like_trigram,
        match_trigram,
    )

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shorter than 3"):
        match_trigram(df, "ab")
    with pytest.raises(ValueError, match="shorter than 3"):
        like_trigram(df, "%abc%xy%")
    with pytest.raises(ValueError, match="wildcards are not"):
        like_trigram(df, "%a_c%")
    with pytest.raises(ValueError, match="wildcards are not"):
        glob_trigram(df, "*a?c*")
    with pytest.raises(ValueError, match="anchor-free"):
        like_trigram(df, "abc%def%")


def test_trigram_like_plan_never_scans_text(spark, sf_dir):
    """The verdict's plan assertion: the LIKE probe is posting
    algebra — no Contains/Like/RLike predicate over the corpus text
    anywhere in the physical plan."""
    from litebase_spark.catalog import REGISTRY

    for name in ("fts_like_trigram", "fts_glob_trigram",
                 "fts_match_trigram"):
        plan = (
            REGISTRY[name]
            .builder(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for bad in ("Contains(text", "LIKE", " RLIKE", "Like(text"):
            assert bad not in plan, f"{name}: {bad} in plan"


def test_trigram_materialized_index_probe_pushes_down(spark, tmp_path):
    """The 100 TB path: against a MATERIALIZED index table, the
    probe's trigram prune must reach the parquet scan as an In()
    pushed filter (reads matching row-groups, not the index)."""
    from litebase_spark.operators.text_trigram import (
        build_trigram_index,
        like_trigram,
    )

    docs = spark.createDataFrame(
        [(i, f"hash window sort {i}") for i in range(100)],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "tri_idx.parquet")
    build_trigram_index(docs).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    probe = like_trigram(None, "%window%", postings=idx)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(tri" in plan
    assert probe.count() == 100


def test_trigram_like_fuzz_vs_python_reference(spark):
    """Randomized differential: like_trigram == the regex semantics
    of anchor-free multi-run LIKE on a corpus-vocab random fixture."""
    import random
    import re

    from litebase_spark.operators.text_trigram import like_trigram

    rng = random.Random(12012)
    vocab = ["hash", "window", "sort", "big", "table", "scan",
             "query", "agg"]
    rows = [
        (i, " ".join(rng.choice(vocab)
                     for _ in range(rng.randint(1, 12))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for _ in range(6):
        k = rng.randint(1, 3)
        runs = [rng.choice(vocab) for _ in range(k)]
        pat = "%" + "%".join(runs) + "%"
        want = {
            i for i, t in rows
            if re.search(".*?".join(re.escape(r) for r in runs), t)
        }
        got = {
            r["doc_id"] for r in like_trigram(df, pat).collect()
        }
        assert got == want, f"pattern {pat}"


# ---------------------------------------------------------------------------
# fts5vocab col / instance modes (round-12 task 2)
# ---------------------------------------------------------------------------

def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_vocab_col_hand_model(spark, tmp_path):
    from litebase_spark.operators.text import fts_vocab_col

    sf = _write_docs(spark, tmp_path, [
        (1, "spark spark table", "spark"),
        (2, "table", "src"),
    ])
    got = {
        (r["term"], r["col"], r["n_docs"], r["n_occurrences"])
        for r in fts_vocab_col(spark, sf).collect()
    }
    # per-column doc and occurrence counts, fts5vocab('col') contract:
    # 'spark' in text of 1 doc (2 occurrences) AND in source of 1 doc
    assert got == {
        ("spark", "text", 1, 2),
        ("spark", "source", 1, 1),
        ("table", "text", 2, 2),
        ("src", "source", 1, 1),
    }


def test_vocab_instance_hand_model(spark, tmp_path):
    from litebase_spark.operators.text import fts_vocab_instance

    sf = _write_docs(spark, tmp_path, [
        (1, "spark table spark", "merge"),
        (2, "vector", "x"),
    ])
    got = {
        (r["term"], r["doc_id"], r["col"], r["off"])
        for r in fts_vocab_instance(spark, sf).collect()
    }
    # one row per instance, 0-based token offset WITHIN the column;
    # 'table' is outside the queried term set
    assert got == {
        ("spark", 1, "text", 0),
        ("spark", 1, "text", 2),
        ("merge", 1, "source", 0),
        ("vector", 2, "text", 0),
    }


def test_vocab_modes_consistent_with_row_mode(spark, sf_dir):
    """instance-mode cardinality per (term, col) == col-mode
    n_occurrences for the queried terms (the posting algebra must
    agree across the fts5vocab modes)."""
    from collections import Counter

    from litebase_spark.operators.text import (
        _VOCAB_INSTANCE_TERMS,
        fts_vocab_col,
        fts_vocab_instance,
    )

    inst = Counter(
        (r["term"], r["col"])
        for r in fts_vocab_instance(spark, sf_dir).collect()
    )
    colm = {
        (r["term"], r["col"]): r["n_occurrences"]
        for r in fts_vocab_col(spark, sf_dir).collect()
        if r["term"] in _VOCAB_INSTANCE_TERMS
    }
    assert dict(inst) == colm


# ---------------------------------------------------------------------------
# jsonb_* family via the dialect layer (round-12 task 3)
# ---------------------------------------------------------------------------

JSONB_CASES = [
    ("json('{\"b\": 2, \"a\":1}')", '{"a":1,"b":2}'),
    ("jsonb('{\"k\": 69}')", '{"k":69}'),
    ("jsonb_extract('{\"k\": 69}', '$.k')", "69"),
    ("json_extract('{\"a\":{\"b\":5}}', '$.a.b')", "5"),
    ("jsonb_set('{\"k\": 69}', '$.new', 138)", '{"k":69,"new":138}'),
    ("jsonb_set('{\"k\": 69}', '$.k', 'x')", '{"k":"x"}'),
    ("jsonb_insert('{\"k\": 69}', '$.k', 1)", '{"k":69}'),
    ("jsonb_insert('{\"k\": 69}', '$.z', 1)", '{"k":69,"z":1}'),
    ("jsonb_replace('{\"k\": 69}', '$.z', 1)", '{"k":69}'),
    ("jsonb_replace('{\"k\": 69}', '$.k', 1)", '{"k":1}'),
    ("jsonb_remove('{\"k\": 69}', '$.k')", "{}"),
    (
        "jsonb_patch('{\"a\":1,\"b\":2}', '{\"b\":null,\"c\":3}')",
        '{"a":1,"c":3}',
    ),
    ("jsonb_object('t', 'ev', 'n', 5)", '{"t":"ev","n":5}'),
    ("jsonb_array(1, 2, 3)", "[1,2,3]"),
    ("json_valid('nope')", False),
    ("json_valid('{\"a\":1}')", True),
    ("jsonb_array_length('[1,2,3]')", 3),
    (
        "jsonb_array_length('{\"a\": [1,2]}', '$.a')",
        2,
    ),
]


def test_jsonb_dialect_rewrites(spark):
    """Every jsonb_* spelling evaluates like its json_* twin (text
    output, typed values preserved through map<string,variant>)."""
    from litebase_spark.functions.dialect import (
        rewrite_sqlite_functions,
    )

    for src, want in JSONB_CASES:
        got = spark.sql(
            "SELECT " + rewrite_sqlite_functions(src) + " AS r"
        ).first()["r"]
        assert got == want, f"{src}: {got!r} != {want!r}"


def test_jsonb_unsupported_shapes_left_untouched():
    """Nested-path modify calls pass through unchanged so the
    resolver error names the original function (the dialect
    contract), instead of silently mis-editing the document."""
    from litebase_spark.functions.dialect import (
        rewrite_sqlite_functions,
    )

    for src in (
        "jsonb_set(x, '$.a.b', 1)",       # nested path
        "jsonb_set(x, p, 1)",             # non-literal path
        "jsonb_remove(x, '$[0]')",        # array path
    ):
        assert rewrite_sqlite_functions(src) == src


def test_jsonb_group_functions(spark):
    from litebase_spark.functions.dialect import (
        rewrite_sqlite_functions,
    )

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 30)],
        "g long, k string, v long",
    )
    df.createOrReplaceTempView("__jsonb_grp")
    rows = {
        r["g"]: (r["arr"], r["obj"])
        for r in spark.sql(
            rewrite_sqlite_functions(
                "SELECT g, jsonb_group_array(v) AS arr, "
                "jsonb_group_object(k, v) AS obj "
                "FROM __jsonb_grp GROUP BY g"
            )
        ).collect()
    }
    import json

    assert sorted(json.loads(rows[1][0])) == [10, 20]
    assert json.loads(rows[1][1]) == {"a": 10, "b": 20}
    assert json.loads(rows[2][1]) == {"c": 30}


def test_jsonb_through_engine_sql(spark, sf_dir):
    """The engine's SQL surface accepts the jsonb_* spellings
    end-to-end (rewrite applied by Engine.sql)."""
    from litebase_spark.engine import Engine

    eng = Engine(spark)
    eng.register_parquet_dir(sf_dir, ["events"])
    r = eng.sql(
        "SELECT jsonb_extract(props, '$.k') AS k, "
        "jsonb_set(props, '$.t', event_type) AS doc "
        "FROM events WHERE event_id = 1"
    )
    row = r.rows[0]
    import json

    doc = json.loads(row["doc"])
    assert doc["k"] == int(row["k"]) and "t" in doc


# ---------------------------------------------------------------------------
# agg_percentiles re-plan (round-12 x100 sweep finding)
# ---------------------------------------------------------------------------

def test_cdf_percentiles_match_sparks_percentile(spark):
    """The distributed-CDF exact percentile must agree with Spark's
    collect-based percentile() (the old plan) on a randomized 2-decimal
    fixture — including interpolation between ranks and duplicate
    values."""
    import random

    from pyspark.sql import functions as F

    from litebase_spark.operators.relational import _cdf_percentiles

    rng = random.Random(1212)
    rows = [
        (rng.choice("ABC"), round(rng.uniform(1, 5000), 2))
        for _ in range(4000)
    ] + [("A", 7.77)] * 25  # duplicate block: cum-count covering spans
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: (r["p50"], r["p90"], r["p99"], r["n"])
        for r in _cdf_percentiles(
            df, "g", "v", [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ).collect()
    }
    want = {
        r["g"]: (r["p50"], r["p90"], r["p99"], r["n"])
        for r in df.groupBy("g").agg(
            F.round(F.percentile("v", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("v", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("v", F.lit(0.99)), 6).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    assert got == want


def test_cdf_percentiles_tiny_group_edge(spark):
    """n=1 and n=2 groups: k0+2 exceeds the cell count, the vhi
    coalesce must fall back to vlo instead of nulling the result."""
    from pyspark.sql import functions as F

    from litebase_spark.operators.relational import _cdf_percentiles

    df = spark.createDataFrame(
        [("X", 5.0), ("Y", 1.0), ("Y", 2.0)], "g string, v double"
    )
    got = {
        r["g"]: (r["p50"], r["p99"])
        for r in _cdf_percentiles(
            df, "g", "v", [(0.5, "p50"), (0.99, "p99")]
        ).collect()
    }
    assert got["X"] == (5.0, 5.0)
    assert got["Y"] == (1.5, 1.99)


def test_fts_match_trigram_boolean_hand_model(spark):
    """Substring semantics on the boolean MATCH surface: 'que' must
    hit 'queue' AND 'query' (no word boundaries), NOT excludes, and
    n_matched counts hit terms."""
    from litebase_spark.operators.text import fts_match

    df = spark.createDataFrame(
        [
            (1, "the queue is long"),        # que, no tab -> out
            (2, "query the table"),          # que + tab -> in, n=2
            (3, "query the table merged"),   # merg -> out
            (4, "tabulate questions"),       # tab + que -> in, n=2
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["n_matched"])
        for r in fts_match(
            df, must=["que", "tab"], must_not=["merg"],
            tokenize="trigram",
        ).collect()
    }
    assert got == {(2, 2), (4, 2)}
    with pytest.raises(ValueError, match="shorter than 3"):
        fts_match(df, must=["ab"], tokenize="trigram")


def test_ntile_closed_form_matches_window_ntile(spark):
    """The distributed rank's closed-form NTILE/PERCENT_RANK/CUME_DIST
    must equal Spark's own window functions — including the uneven
    n % 4 bucket split — on sizes straddling the remainder cases."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from litebase_spark.operators.relational import window_ntile_dist

    rng = random.Random(44)
    for n in (1, 2, 3, 4, 5, 7, 101):
        rows = [
            (i, round(rng.uniform(900, 105000), 2)) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "o_orderkey long, o_totalprice double")
        df.write.mode("overwrite").parquet("/tmp/__ntile_probe/orders.parquet")
        got = {
            r["o_orderkey"]: (r["quartile"], r["pct_rank"], r["cume"])
            for r in window_ntile_dist(spark, "/tmp/__ntile_probe").collect()
        }
        w = Window.orderBy("o_totalprice", "o_orderkey")
        want = {
            r["o_orderkey"]: (r["q"], r["p"], r["c"])
            for r in df.select(
                "o_orderkey",
                F.ntile(4).over(w).alias("q"),
                F.round(F.percent_rank().over(w), 8).alias("p"),
                F.round(F.cume_dist().over(w), 8).alias("c"),
            ).collect()
        }
        assert got == want, f"n={n}"
