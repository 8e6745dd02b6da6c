"""Duplicate-cluster survivorship (operators/dedup.py
pipeline_survivorship): the keeper must be chosen by QUALITY (distinct
token ratio, then length, then id) — not by min doc_id — on a corpus
constructed so the two orderings disagree."""

from __future__ import annotations

import os

import pytest

from litebase_spark.operators.dedup import pipeline_survivorship

# Docs 1/2/3 are near-duplicates (high 3-gram Jaccard chain). Doc 1
# (lowest id) is the WORST copy: heavy token repetition lowers its
# distinct ratio. Doc 3 is the cleanest -> must be the keeper.
# Doc 7/8 are an unrelated duplicate pair with equal quality -> longer
# doc wins; 9 is a singleton (no pairs, must not appear).
_BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
_DOCS = [
    (1, _BASE + " extra extra extra extra extra extra"),
    (2, _BASE + " extra extra words here"),
    (3, _BASE + " with unique closing words"),
    (7, "completely different text about distributed query engines and columnar storage formats"),
    (8, "completely different text about distributed query engines and columnar storage formats plus tail"),
    (9, "a singleton document sharing no shingles with anything else at all zebra quartz"),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("survivorship")
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in _DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )
    return str(d)


def test_keeper_is_best_quality_not_min_id(spark, corpus_dir):
    rows = {
        r["component"]: r
        for r in pipeline_survivorship(spark, corpus_dir).collect()
    }
    # cluster of {1,2,3} is labeled by its min node (1) but KEPT doc is 3
    assert 1 in rows
    c = rows[1]
    assert c["n_members"] == 3 and c["n_dropped"] == 2
    assert c["keeper_doc_id"] == 3, (
        "survivorship must pick the highest-quality copy, got "
        f"{c['keeper_doc_id']}"
    )
    # equal-quality pair {7,8}: longer doc (8) wins
    assert 7 in rows
    assert rows[7]["keeper_doc_id"] == 8
    assert rows[7]["n_members"] == 2
    # singleton never appears (survivorship is O(dup docs), not O(corpus))
    assert all(r["keeper_doc_id"] != 9 for r in rows.values())
    assert len(rows) == 2
