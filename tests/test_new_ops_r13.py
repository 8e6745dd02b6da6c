"""Round-13 pinning tests.

Part 1: the round-12 ADVICE closures in functions/dialect.py —
  - json_patch / jsonb_patch recursive RFC-7386 merge (nested-object
    patches merged, not wholesale-replaced; loud raise past the
    documented _PATCH_DEPTH bound)
  - json_set/insert/replace/remove on a non-object document return
    the document unchanged (SQLite's no-match behavior), not NULL
  - zero-arg json_array() -> '[]' / json_object() -> '{}'
    (_split_args('') == [''] normalization)
  - drift default split: exact median computed over the pre-aggregated
    distinct-timestamp domain, not a full-row percentile buffer

Every JSON case is a DIFFERENTIAL against the real SQLite via the
stdlib sqlite3 module (same methodology as the porter work) — the
expected value is computed at test time, not hand-copied.
"""

from __future__ import annotations

import json
import sqlite3

import pytest


# ---------------------------------------------------------------------------
# jsonb modify family: differential vs real SQLite (ADVICE medium + low x2)
# ---------------------------------------------------------------------------

_JSON_DIFF_CASES = [
    # flat modify (regression: round-12 behavior preserved)
    "json_set('{\"k\": 69}', '$.new', 138)",
    "json_set('{\"k\": 69}', '$.k', 'x')",
    "json_insert('{\"k\": 69}', '$.k', 1)",
    "json_replace('{\"k\": 69}', '$.k', 1)",
    "json_remove('{\"k\": 69}', '$.k')",
    # non-object documents: SQLite returns the doc unchanged for a
    # '$.key' path over an array/scalar; round 12 returned SQL NULL
    "json_set('[1,2]','$.a',5)",
    "json_set('3','$.a',5)",
    "json_insert('[1,2]','$.a',5)",
    "json_replace('[1,2]','$.a',5)",
    "json_remove('[1,2]','$.a')",
    # json_patch: flat (regression) + recursive merge (round 12
    # wholesale-replaced nested objects — silent RFC-7386 divergence)
    "json_patch('{\"a\":1,\"b\":2}', '{\"b\":null,\"c\":3}')",
    "json_patch('{\"a\":{\"x\":1}}','{\"a\":{\"y\":2}}')",
    "json_patch('{\"a\":1}','{\"a\":{\"y\":2,\"z\":null}}')",
    "json_patch('{\"a\":{\"x\":1}}','{\"a\":{\"y\":{\"q\":null,\"r\":1}}}')",
    "json_patch('{\"a\":{\"b\":{\"c\":{\"d\":1}}}}',"
    "'{\"a\":{\"b\":{\"c\":{\"e\":2}}}}')",
    "json_patch('{\"a\":{\"x\":[1,2]}}','{\"a\":{\"x\":[3]}}')",
    "json_patch('{}','{\"a\":{\"b\":null}}')",
    # json_patch: non-object operands + NULL propagation
    "json_patch('[1,2]','{\"a\":1}')",
    "json_patch('{\"a\":1}','[1,2]')",
    "json_patch('3','{\"a\":1}')",
    "json_patch('{\"a\":1}', NULL)",
    "json_patch(NULL, '{\"a\":1}')",
    # zero-arg constructors (dead-branch fix: _split_args('') == [''])
    "json_object()",
    "json_array()",
]


def _sqlite_eval(expr: str):
    con = sqlite3.connect(":memory:")
    try:
        return con.execute("select " + expr).fetchone()[0]
    finally:
        con.close()


def _canon(s):
    """Key order is a documented deviation (this engine canonicalizes,
    SQLite preserves insertion order) — compare value-identity."""
    if s is None:
        return None
    try:
        return json.dumps(
            json.loads(s), sort_keys=True, separators=(",", ":")
        )
    except (ValueError, TypeError):
        return s


@pytest.mark.parametrize("expr", _JSON_DIFF_CASES)
def test_json_dialect_differential_vs_sqlite(spark, expr):
    from litebase_spark.functions.dialect import rewrite_sqlite_functions

    want = _sqlite_eval(expr)
    got = spark.sql(
        rewrite_sqlite_functions(f"select {expr} as r")
    ).collect()[0][0]
    assert _canon(got) == _canon(want), f"{expr}: {got!r} != {want!r}"


@pytest.mark.parametrize("fn", ["json_patch", "jsonb_patch"])
def test_json_patch_depth_bound_raises_loudly(spark, fn):
    """Past _PATCH_DEPTH object levels the rewrite raises instead of
    silently wholesale-replacing (the stated leave-or-raise policy)."""
    from litebase_spark.functions.dialect import rewrite_sqlite_functions

    deep = '{"a":{"b":{"c":{"d":{"e":1}}}}}'
    sql = rewrite_sqlite_functions(
        f"select {fn}('{{}}', '{deep}') as r"
    )
    with pytest.raises(Exception, match="nesting deeper"):
        spark.sql(sql).collect()


def test_jsonb_spellings_match_json_twins(spark):
    """jsonb_* accepts the same shapes as json_* — spot the new
    branches through the b-spelling too."""
    from litebase_spark.functions.dialect import rewrite_sqlite_functions

    pairs = [
        ("jsonb_set('[1,2]','$.a',5)", "[1,2]"),
        ("jsonb_patch('{\"a\":{\"x\":1}}','{\"a\":{\"y\":2}}')",
         '{"a":{"x":1,"y":2}}'),
        ("jsonb_object()", "{}"),
        ("jsonb_array()", "[]"),
    ]
    exprs = ", ".join(f"{e} as c{i}" for i, (e, _) in enumerate(pairs))
    row = spark.sql(
        rewrite_sqlite_functions(f"select {exprs}")
    ).collect()[0]
    for i, (e, want) in enumerate(pairs):
        assert _canon(row[i]) == _canon(want), e


_JSON_VALUE_LIFT_CASES = [
    # the jsonb_set value is lifted via cast(v as variant) — pin the
    # type-preservation corners against SQLite
    "json_set('{}','$.a', 1.5)",
    "json_set('{}','$.a', 'str''ing')",
    "json_set('{}','$.a', NULL)",
    "json_set('{}','$.a', 0)",
    "json_set('{}','$.a', '[1,2]')",   # TEXT stays TEXT (needs json())
]


@pytest.mark.parametrize("expr", _JSON_VALUE_LIFT_CASES)
def test_json_set_value_lift_differential(spark, expr):
    from litebase_spark.functions.dialect import rewrite_sqlite_functions

    want = _sqlite_eval(expr)
    got = spark.sql(
        rewrite_sqlite_functions(f"select {expr} as r")
    ).collect()[0][0]
    assert _canon(got) == _canon(want), f"{expr}: {got!r} != {want!r}"


def test_json_patch_non_literal_patch_column(spark):
    """A column-valued patch takes the general recursive-merge path
    (the flat-literal fast path requires a literal); differential vs
    SQLite over a mixed batch of docs/patches."""
    from litebase_spark.functions.dialect import rewrite_sqlite_functions

    rows = [
        ('{"a":1,"b":2}', '{"b":null,"c":3}'),
        ('{"a":{"x":1}}', '{"a":{"y":2}}'),
        ("[1,2]", '{"a":1}'),
        ('{"a":1}', "[9]"),
    ]
    con = sqlite3.connect(":memory:")
    want = [
        con.execute("select json_patch(?, ?)", r).fetchone()[0]
        for r in rows
    ]
    con.close()
    spark.createDataFrame(rows, ["doc", "p"]).createOrReplaceTempView(
        "__patch_nl"
    )
    got = [
        r[0]
        for r in spark.sql(
            rewrite_sqlite_functions(
                "select json_patch(doc, p) as r from __patch_nl"
            )
        ).collect()
    ]
    assert [_canon(g) for g in got] == [_canon(w) for w in want]


# ---------------------------------------------------------------------------
# fts_match_phrase_prefix: posting probe, never a corpus regexp scan
# ---------------------------------------------------------------------------

def test_phrase_prefix_plan_never_scans_text(spark, sf_dir):
    """Round-12 verdict task 5: the phrase+prefix MATCH compiles to
    pruned posting algebra — no Contains/LIKE/RLIKE predicate over
    the corpus text anywhere in the physical plan (same assertion
    style as the trigram family's)."""
    import litebase_spark.operators  # noqa: F401 — populate REGISTRY
    from litebase_spark.catalog import REGISTRY

    plan = (
        REGISTRY["fts_match_phrase_prefix"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Contains(text", " LIKE ", " RLIKE ", "Like(text",
                "RLike(", "rlike"):
        assert bad not in plan, f"{bad} in plan"


def test_fts_phrase_prefix_hand_model(spark):
    """Adjacency + prefix semantics against a hand model: phrase
    words must be ADJACENT in order; prefix matches any token."""
    from litebase_spark.operators.text import fts_phrase_prefix

    rows = [
        (1, "the big table strict rows"),       # phrase + 'strict'
        (2, "big red table string"),            # non-adjacent phrase
        (3, "a big table here"),                # phrase, no str*
        (4, "strong big table bond"),           # phrase + 'strong'
        (5, "table big structure"),             # reversed phrase
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        r.doc_id
        for r in fts_phrase_prefix(df, ["big", "table"], "str").collect()
    )
    assert got == [1, 4]


# ---------------------------------------------------------------------------
# drift default split: bounded percentile buffer (ADVICE medium)
# ---------------------------------------------------------------------------

def test_drift_default_split_matches_explicit_median(spark):
    """The default (no split=) path must land on the same exact-median
    cut as before the re-plan — re-planned onto the pre-aggregated
    (distinct ts, weight) domain, same answer, bounded buffer."""
    from pyspark.sql import functions as F

    from litebase_spark.operators.relational import _drift_ref_cond

    # heavy duplication: 30 distinct timestamps x 64 rows each, so the
    # pre-aggregated domain (30) is far smaller than the row count
    rows = [
        (f"2024-01-{d:02d} 00:00:00", float(d))
        for d in range(1, 31)
        for _ in range(64)
    ]
    df = spark.createDataFrame(rows, ["ts_s", "v"]).selectExpr(
        "cast(ts_s as timestamp) as ts", "v"
    )
    cond = _drift_ref_cond(df, None, "ts", None)
    ref_n = df.where(cond).count()
    # exact median of days 1..30 is 15.5 -> days 1..15 are reference
    assert ref_n == 15 * 64

    # agreement with an explicitly supplied split at the same cut
    cond2 = _drift_ref_cond(df, None, "ts", "2024-01-16")
    assert df.where(cond2).count() == ref_n
