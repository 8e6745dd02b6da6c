"""unicode61 tokenizer options (remove_diacritics / tokenchars /
separators) — differential against Python stdlib sqlite3's REAL FTS5
unicode61 tokenizer, the porter-work methodology (test_porter.py):
expected values are computed from sqlite at test time, never
hand-copied."""

from __future__ import annotations

import sqlite3

import pytest

# mixed-script corpus: Latin diacritics (precomposed + combining),
# Greek (incl. final sigma), Cyrillic, CJK, fullwidth, digits,
# punctuation runs, option-relevant ASCII shapes
CORPUS = [
    "Café RÉSUMÉ naïve Übung søster straße",
    "école äb",            # combining marks
    "Ωμέγα ὀδυσσεύς ΣΤΙΓΜΑΣ",
    "здесь Москва ЁЛКА",
    "北京 tokyo 東京 a1b2c3",
    "foo-bar_baz.qux x'y O'Neil",
    "ＦＵＬＬｗｉｄｔｈ １２３",
    "ıİIi ſİ Ǆǅǆ",
    "mixed:PUNCT!!and..runs--here",
    "Ԩԩ Ѐѐ ҂҃҄",
]

OPTION_SETS = [
    "remove_diacritics 0",
    "remove_diacritics 1",
    "remove_diacritics 2",
    "remove_diacritics 1 tokenchars '-_'",
    "remove_diacritics 2 separators 'o'",
    "remove_diacritics 0 tokenchars '''.' separators 'x'",
]


def sqlite_tokens(text: str, opts: str) -> list[str]:
    con = sqlite3.connect(":memory:")
    con.execute(
        "CREATE VIRTUAL TABLE t USING fts5(x, "
        f"tokenize=\"unicode61 {opts}\")"
    )
    con.execute("INSERT INTO t(rowid, x) VALUES (1, ?)", (text,))
    con.execute("CREATE VIRTUAL TABLE tv USING fts5vocab(t, 'instance')")
    out = [
        r[0] for r in con.execute("SELECT term FROM tv ORDER BY offset")
    ]
    con.close()
    return out


@pytest.mark.parametrize("opts", OPTION_SETS)
def test_python_twin_matches_sqlite(opts):
    from litebase_spark.functions.unicode61 import (
        parse_unicode61_options,
        unicode61_tokens_py,
    )

    kw = parse_unicode61_options(opts)
    for text in CORPUS:
        want = sqlite_tokens(text, opts)
        got = unicode61_tokens_py(text, **kw)
        assert got == want, f"{opts!r} / {text!r}: {got} != {want}"


@pytest.mark.parametrize("opts", OPTION_SETS)
def test_spark_expression_matches_sqlite(spark, opts):
    from pyspark.sql import functions as F

    from litebase_spark.functions.unicode61 import (
        parse_unicode61_options,
        unicode61_tokens,
    )

    kw = parse_unicode61_options(opts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["i", "text"]
    )
    got = {
        r.i: list(r.toks)
        for r in df.select(
            "i", unicode61_tokens(F.col("text"), **kw).alias("toks")
        ).collect()
    }
    for i, text in enumerate(CORPUS):
        want = sqlite_tokens(text, opts)
        assert got[i] == want, f"{opts!r} / {text!r}: {got[i]} != {want}"


def test_fuzz_unicode61_vs_sqlite(spark):
    """Deterministic fuzz: mixed-script strings assembled from a
    codepoint pool, all three modes — Spark expression vs sqlite."""
    import random

    from pyspark.sql import functions as F

    from litebase_spark.functions.unicode61 import unicode61_tokens

    rng = random.Random(13)
    pool = (
        [chr(c) for c in range(0x20, 0x7F)]
        + [chr(c) for c in range(0xC0, 0x180)]
        + [chr(c) for c in range(0x370, 0x400) if chr(c).isprintable()]
        + [chr(c) for c in range(0x400, 0x460)]
        + ["́", "̈", "中", "文", "ﬂ", "ß"]
    )
    texts = [
        "".join(rng.choice(pool) for _ in range(rng.randint(5, 60)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    for mode in (0, 1, 2):
        got = {
            r.i: list(r.toks)
            for r in df.select(
                "i",
                unicode61_tokens(
                    F.col("text"), remove_diacritics=mode
                ).alias("toks"),
            ).collect()
        }
        bad = []
        for i, text in enumerate(texts):
            want = sqlite_tokens(text, f"remove_diacritics {mode}")
            if got[i] != want:
                bad.append((mode, text, got[i], want))
        assert not bad, f"{len(bad)} mismatches, first: {bad[0]}"


def test_option_parser_rejects_garbage():
    from litebase_spark.functions.unicode61 import parse_unicode61_options

    with pytest.raises(ValueError, match="unknown unicode61 option"):
        parse_unicode61_options("categories 'L*'")
    with pytest.raises(ValueError, match="remove_diacritics"):
        parse_unicode61_options("remove_diacritics 3")
    with pytest.raises(ValueError, match="name/value"):
        parse_unicode61_options("tokenchars")


def test_fts_match_with_separator_option(spark):
    """fts_match(tokenize=\"unicode61 separators 'e'\"): corpus and
    query terms fold through the same tokenizer — 'table' becomes the
    term 'tabl' on both sides."""
    from litebase_spark.operators.text import fts_match

    df = spark.createDataFrame(
        [
            (1, "table spark sort"),
            (2, "table spark scan"),
            (3, "spark sort"),
            (4, "tablet spark sort"),  # 'tablet' -> 'tabl','t' wait: 'tablet' splits at e -> ['tabl','t']
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.n_matched
        for r in fts_match(
            df,
            must=["table", "spark"],
            should=["sort"],
            must_not=["scan"],
            tokenize="unicode61 separators 'e'",
        ).collect()
    }
    # doc 1: tabl+spark+sort = 3 matched; doc 2 killed by scan;
    # doc 3 lacks 'tabl'; doc 4: 'tablet' also yields 'tabl' -> matches
    assert out == {1: 3, 4: 3}


def test_fts_match_multi_token_query_term_raises(spark):
    from litebase_spark.operators.text import fts_match

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="tokenizes to"):
        fts_match(
            df, must=["merge"], tokenize="unicode61 separators 'e'"
        ).collect()
