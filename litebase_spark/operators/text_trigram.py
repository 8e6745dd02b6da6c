"""FTS5 ``trigram`` tokenizer analog: positional 3-gram index, MATCH
substring retrieval, and LIKE/GLOB acceleration against the index.

Reference: litebase enables FTS5 wholesale (pkg/sqlite3/sqlite3.go:20);
SQLite's FTS5 ships four built-in tokenizers — ascii, unicode61,
porter, trigram (fts5_tokenize.c). The trigram tokenizer emits every
3-codepoint window of the raw text WITH its position. Positions are
the whole design: ``col MATCH 'abcd'`` is answered EXACTLY and purely
index-side as the phrase query "abc bcd" at consecutive positions (a
phrase hit over trigram positions IS a substring occurrence), and the
headline feature — LIKE/GLOB acceleration — compiles the pattern's
literal runs to trigram phrase probes (fts5 xPattern support), so a
``%x%y%`` predicate never evaluates LIKE over the row store.

Spark-first shape (and the 100 TB argument):

* The index is a plain DataFrame ``(id, pos, tri)`` built by ONE
  narrow pass over the corpus (codegen ``transform``/``posexplode``,
  no UDF). In the engine surface it is materialized once
  (``build_trigram_index`` -> parquet) and probed many times; the
  registry queries build it inline because fixture queries must be
  self-contained over the sf_dir.
* A probe filters the postings to the query's trigrams FIRST — an
  ``isin`` that reaches the scan (and, on a materialized index,
  the parquet reader as an In() pushed filter), so the shuffle
  carries only (doc, query-gram, pos) hits, never the corpus.
* Phrase adjacency is the anchor trick: a posting (doc, pos, tri)
  where the query needs ``tri`` at term-offset ``off`` votes for an
  occurrence anchored at ``pos - off``; an anchor with all
  ``len(term)-2`` distinct offsets present is an exact substring
  occurrence. One doc-keyed aggregate — no join chain, no text
  re-scan, no Contains/Like anywhere in the plan.
* Multi-run patterns (``%a%b%c%``) resolve ordering with a per-doc
  greedy fold over each run's sorted anchor list (earliest feasible
  end is optimal), entirely in scalar array expressions.

Deviations from SQLite, stated loudly rather than silently scanning:
runs shorter than 3 characters and ``_``/``?``/``[`` wildcards cannot
probe a trigram index — SQLite falls back to a full table scan there;
this engine raises ValueError instead (apply an explicit
``df.filter(col.like(...))`` when a scan is the intent). Patterns must
be anchor-free (leading + trailing wildcard): edge-anchored patterns
need row lengths, which live outside the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from litebase_spark.catalog import load, query, spread


def trigram_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    case_sensitive: bool = False,
) -> DataFrame:
    """Positional trigram index: one row per 3-codepoint window of
    (case-folded unless case_sensitive) text — (id, pos, tri), pos
    0-based. ``substring`` counts codepoints, matching FTS5's
    codepoint trigrams. Narrow map; the explode stays in the scan
    stage."""
    t = F.col(text_col) if case_sensitive else F.lower(F.col(text_col))
    src = docs.select(F.col(id_col), t.alias("__t"))
    # r14: explode the POSITION SEQUENCE (an int array) and compute the
    # trigram after the Generate, instead of materializing a
    # len-element array of 3-char strings per document before it. The
    # Generate and the substring/probe filter above it fuse into one
    # WholeStageCodegen span, so per-position work is one substring
    # call — the r13 shape additionally allocated the full trigram
    # array per doc (len x ~19-byte UTF8Strings) just to throw it into
    # the explode. Output identical: pos = i - 1 (0-based), tri =
    # substring(t, i, 3). x100m A/B in OPTIMIZATION_r14.md.
    idx = F.expr(
        "CASE WHEN char_length(__t) >= 3 THEN "
        "sequence(1, char_length(__t) - 2) "
        "ELSE cast(array() as array<int>) END"
    )
    return src.select(
        F.col(id_col), "__t", F.explode(idx).alias("i")
    ).select(
        F.col(id_col),
        (F.col("i") - 1).alias("pos"),
        F.expr("substring(__t, i, 3)").alias("tri"),
    )


# The engine's materialized-index surface: same build, written once.
build_trigram_index = trigram_postings


def _anchor_hits(
    postings: DataFrame, runs: list[str], id_col: str
) -> DataFrame:
    """Exact occurrence anchors for each literal run: (id, run, a)
    with `a` = 0-based character position where runs[run] occurs.

    isin(query trigrams) prunes the postings scan-side (pushes to
    parquet on a materialized index); the broadcast join fans each
    surviving posting out to the run-offsets wanting its trigram; an
    anchor holding ALL n distinct offsets of a run is an exact
    occurrence ((doc,pos) is unique per posting, so plain count ==
    distinct-offset count)."""
    spark = postings.sparkSession
    rows = []
    for j, r in enumerate(runs):
        n = len(r) - 2
        for off in range(n):
            rows.append((r[off : off + 3], j, off, n))
    qdf = spark.createDataFrame(
        rows, "tri string, run int, off int, n int"
    )
    grams = sorted({t for t, _, _, _ in rows})
    return (
        postings.filter(F.col("tri").isin(grams))
        .join(F.broadcast(qdf), "tri")
        .select(
            id_col,
            "run",
            "n",
            (F.col("pos") - F.col("off")).alias("a"),
        )
        .filter(F.col("a") >= 0)
        .groupBy(id_col, "run", "n", "a")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == F.col("n"))
        .select(id_col, "run", "a")
    )


def match_trigram(
    docs: DataFrame,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    case_sensitive: bool = False,
    postings: DataFrame | None = None,
) -> DataFrame:
    """``col MATCH 'term'`` under tokenize='trigram': exact substring
    retrieval with OVERLAPPING occurrence counts (anchor count == the
    number of positions where `term` starts — FTS5's phrase-hit
    count). Pass a prebuilt `postings` index to skip the inline
    build."""
    term = term if case_sensitive else term.lower()
    if len(term) < 3:
        raise ValueError(
            f"match_trigram: term {term!r} shorter than 3 chars "
            f"cannot probe a trigram index (SQLite returns no rows "
            f"for it too: sub-trigram terms are unindexable)"
        )
    p = (
        postings
        if postings is not None
        else trigram_postings(docs, id_col, text_col, case_sensitive)
    )
    return _anchor_hits(p, [term], id_col).groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def _pattern_runs(
    pattern: str, wildcard: str, forbidden: str, kind: str
) -> list[str]:
    for ch in forbidden:
        if ch in pattern:
            raise ValueError(
                f"{kind}_trigram: {ch!r} wildcards are not "
                f"index-evaluable (SQLite falls back to a full scan "
                f"here; this engine refuses — filter explicitly if "
                f"a scan is intended): {pattern!r}"
            )
    if not (
        pattern.startswith(wildcard) and pattern.endswith(wildcard)
    ):
        raise ValueError(
            f"{kind}_trigram: only anchor-free substring patterns "
            f"('{wildcard}lit{wildcard}...') probe the index — "
            f"edge-anchored matches need row lengths, which live "
            f"outside the postings: {pattern!r}"
        )
    runs = [r for r in pattern.split(wildcard) if r]
    if not runs:
        raise ValueError(
            f"{kind}_trigram: no literal run in {pattern!r}"
        )
    short = [r for r in runs if len(r) < 3]
    if short:
        raise ValueError(
            f"{kind}_trigram: runs shorter than 3 chars cannot "
            f"probe a trigram index: {short!r}"
        )
    return runs


def _runs_match(
    docs: DataFrame | None,
    runs: list[str],
    id_col: str,
    text_col: str,
    case_sensitive: bool,
    postings: DataFrame | None,
) -> DataFrame:
    runs = [r if case_sensitive else r.lower() for r in runs]
    p = (
        postings
        if postings is not None
        else trigram_postings(docs, id_col, text_col, case_sensitive)
    )
    occ = _anchor_hits(p, runs, id_col)
    per_doc = occ.groupBy(id_col).agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(F.col("run") == j, F.col("a"))
                )
            ).alias(f"a{j}")
            for j in range(len(runs))
        ]
    )
    # greedy leftmost fold: th_j = end of the earliest occurrence of
    # run j starting at/after th_{j-1}; an infeasible run empties the
    # filter -> array_min null -> null propagates to the final test.
    # (the threshold must close over a ONE-arg lambda: a second
    # python parameter would make pyspark emit a two-arg lambda whose
    # second argument is the array INDEX)
    def _at_or_after(t):
        return lambda x: x >= t

    th = F.lit(0)
    for j, r in enumerate(runs):
        th = F.array_min(
            F.filter(F.col(f"a{j}"), _at_or_after(th))
        ) + F.lit(len(r))
    return per_doc.filter(th.isNotNull()).select(id_col)


def like_trigram(
    docs: DataFrame | None,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """``col LIKE pattern`` evaluated against the trigram index —
    SQLite LIKE is case-insensitive, matching the default
    (case_sensitive=0) trigram index. Pass a prebuilt case-folded
    `postings` index to skip the inline build."""
    runs = _pattern_runs(pattern, "%", "_", "like")
    return _runs_match(
        docs, runs, id_col, text_col, False, postings
    )


def glob_trigram(
    docs: DataFrame | None,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """``col GLOB pattern`` against a case-SENSITIVE trigram index
    (SQLite: GLOB is case-sensitive, so its index acceleration needs
    tokenize='trigram case_sensitive 1')."""
    runs = _pattern_runs(pattern, "*", "?[]", "glob")
    return _runs_match(docs, runs, id_col, text_col, True, postings)


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

@query(
    "fts_match_trigram",
    oracle="""
    SELECT doc_id,
           CAST((length(lower(text))
                 - length(replace(lower(text), 'quer', ''))) // 4
                AS BIGINT) AS n_occurrences
    FROM documents
    WHERE contains(lower(text), 'quer')
    """,
    description="FTS5 MATCH under tokenize='trigram' "
    "(fts5_tokenize.c's fourth built-in tokenizer; the reference "
    "build enables FTS5 wholesale at pkg/sqlite3/sqlite3.go:20): "
    "docs MATCH 'quer' retrieves every document containing the "
    "4-char substring ANYWHERE — no word boundaries, the trigram "
    "index's whole point vs unicode61 — plus the occurrence count "
    "(phrase-hit anchors). Pure posting algebra: positional 3-gram "
    "postings (one narrow codegen pass), isin(query trigrams) prune "
    "reaching the scan, then ONE doc-keyed aggregate checks phrase "
    "adjacency via anchors (pos - term_offset); anchors holding all "
    "offsets are exact substring occurrences, counted overlapping "
    "(the oracle's replace() count agrees because 'quer' has no "
    "self-overlap). The plan contains NO Contains/LIKE over text — "
    "at 100 TB the probe reads a materialized index's matching "
    "row-groups, never the corpus.",
    tags=("text", "fts", "trigram"),
)
def fts_match_trigram(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    d = spread(d)
    return match_trigram(d, "quer")


@query(
    "fts_like_trigram",
    oracle="""
    SELECT doc_id FROM documents
    WHERE lower(text) LIKE '%hash%window%sort%'
    """,
    description="LIKE acceleration against the trigram index — "
    "SQLite FTS5 trigram's headline feature (the tokenizer's "
    "xPattern support compiles LIKE literals to trigram phrase "
    "probes so the predicate never scans the row store): "
    "text LIKE '%hash%window%sort%' as three exact-substring anchor "
    "sets from ONE pruned posting probe (run-tagged broadcast of the "
    "9 query trigrams), then a per-doc greedy fold over each run's "
    "sorted anchor array enforces the runs' left-to-right, "
    "non-overlapping order (earliest-feasible-end greedy — exact, "
    "not a heuristic). The plan has NO LIKE/Contains on the corpus "
    "text: the only corpus pass is the index build, which a real "
    "deployment materializes once (build_trigram_index) and this "
    "self-contained fixture query builds inline. Shuffle carries "
    "only query-gram hits.",
    tags=("text", "fts", "trigram"),
)
def fts_like_trigram(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    d = spread(d)
    return like_trigram(d, "%hash%window%sort%")


@query(
    "fts_glob_trigram",
    oracle="""
    SELECT doc_id FROM documents
    WHERE text GLOB '*big*table*'
    """,
    description="GLOB acceleration against a case-SENSITIVE trigram "
    "index (SQLite: LIKE folds case so the default index serves it; "
    "GLOB is case-sensitive and needs tokenize='trigram "
    "case_sensitive 1' — both variants of the index builder exist "
    "here as a flag). Same pruned-probe + greedy-anchor-fold plan "
    "as fts_like_trigram, unfolded text. The fixture corpus is "
    "lowercase so the row set equals the LIKE twin's on these runs; "
    "case sensitivity itself is pinned by unit test (mixed-case "
    "fixture).",
    tags=("text", "fts", "trigram"),
)
def fts_glob_trigram(spark, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    d = spread(d)
    return glob_trigram(d, "*big*table*")


@query(
    "fts_match_trigram_boolean",
    oracle="""
    SELECT doc_id,
           CAST((CASE WHEN contains(lower(text), 'que') THEN 1 ELSE 0 END)
              + (CASE WHEN contains(lower(text), 'tab') THEN 1 ELSE 0 END)
              + (CASE WHEN contains(lower(text), 'vect') THEN 1 ELSE 0 END)
              + (CASE WHEN contains(lower(text), 'strea') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_matched
    FROM documents
    WHERE contains(lower(text), 'que')
      AND contains(lower(text), 'tab')
      AND (contains(lower(text), 'vect')
           OR contains(lower(text), 'strea'))
      AND NOT contains(lower(text), 'merg')
    """,
    description="FTS5 boolean MATCH under tokenize='trigram' ('que "
    "AND tab (vect OR strea) NOT merg'): the full MATCH grammar over "
    "SUBSTRING predicates — FTS5's trigram tokenizer keeps the whole "
    "query syntax, each term matching anywhere in the text with no "
    "word boundaries (que hits query/queue, tab hits table). One "
    "pruned posting probe resolves ALL five terms' anchors "
    "(run-tagged broadcast), then the same must/should/not coverage "
    "aggregate as the unicode61/porter MATCH surface, keyed by term "
    "index. No Contains/LIKE over text in the plan; shuffle carries "
    "only query-gram hits.",
    tags=("text", "fts", "trigram"),
)
def fts_match_trigram_boolean(spark, sf_dir: str) -> DataFrame:
    from litebase_spark.operators.text import fts_match

    d = load(spark, sf_dir, "documents")
    d = spread(d)
    return fts_match(
        d,
        must=["que", "tab"],
        should=["vect", "strea"],
        must_not=["merg"],
        tokenize="trigram",
    )
